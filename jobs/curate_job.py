#!/usr/bin/env python
"""`ray job submit` entry: learned-classifier corpus curation.

The DCLM / FineWeb-style pipeline end to end: score every page with the
fastText-shaped linear classifier (broadcast hashed-vocab model), find
the EXACT keep-quantile score cutoff (histogram descent — no sort, no
shuffle), and land the surviving docs as lang-partitioned Parquet.

The final filter pass RE-SCORES each batch locally with the same
broadcast model instead of materializing a kept-id set: the score is a
deterministic per-row function, so recomputing it is one cheap
vectorized pass and nothing corpus-sized ever rides to the driver or a
shuffle (an id set would be one int64 per kept doc — billions at corpus
scale).

Usage (cluster):
    ray job submit --working-dir . -- python jobs/curate_job.py \
        --input /data/pages --model /data/weights.parquet \
        --out /data/curated [--keep-quantile 0.8]

`--model` is a (term:string, weight:float64) Parquet file; omit it to
use a deterministic length/letter heuristic model derived from a corpus
sample (useful for smoke runs — a real deployment trains the weights
offline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet fragments")
    ap.add_argument("--model", help="(term, weight) parquet model file")
    ap.add_argument("--out", required=True, help="curated output directory")
    ap.add_argument("--keep-quantile", type=float, default=0.8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {}
        if os.environ.get("RAY_GRAFT_CPUS"):
            kw["num_cpus"] = int(os.environ["RAY_GRAFT_CPUS"])
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, **kw)

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from org_rdkit_lucene_ray.functions.analyze import (
        REGISTRY,
        tokenize_column,
    )
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash
    from org_rdkit_lucene_ray.stages.classifier import (
        linear_classifier_scores,
        score_tokens,
        sorted_model_arrays,
    )
    from org_rdkit_lucene_ray.stages.quantile import exact_quantiles

    docs = rd.read_parquet(args.input, columns=["url", "text", "lang"])

    def with_ids(t: pa.Table) -> pa.Table:
        # url is the pk; a stable int id keys the score rows
        ids = stable_term_hash(t["url"].combine_chunks()).view(np.int64)
        return t.append_column("doc_id", pa.array(ids, pa.int64()))

    docs = docs.map_batches(with_ids, batch_format="pyarrow")

    if args.model:
        weights = pq.read_table(args.model)
    else:
        sample = docs.limit(4000).to_pandas()
        vocab = sorted({w for x in sample["text"] for w in x.lower().split()})
        wv = [float((len(t) % 4) - 1.5 + (ord(t[0]) % 7) - 3.0) for t in vocab]
        weights = pa.table({"term": pa.array(vocab, pa.string()),
                            "weight": pa.array(wv, pa.float64())})

    scored = linear_classifier_scores(docs, weights).materialize()
    thr_val = exact_quantiles(
        scored, "score", [args.keep_quantile])["value"][0].as_py()
    if thr_val is None:
        raise SystemExit(f"no scorable documents under --input {args.input} "
                         "(empty glob, or every page tokenized to nothing)")
    thr = float(thr_val)

    model_ref = ray.put(sorted_model_arrays(weights))
    cfg = REGISTRY["standard"]

    def filter_batch(t: pa.Table) -> pa.Table:
        h_sorted, w_sorted = ray.get(model_ref)
        toks = tokenize_column(t["text"].combine_chunks(), cfg)
        score, counts = score_tokens(toks, h_sorted, w_sorted)
        return t.filter(pa.array((counts > 0) & (score >= thr)))

    out = docs.map_batches(filter_batch, batch_format="pyarrow") \
        .materialize()
    out.write_parquet(args.out, partition_cols=["lang"])
    print(json.dumps({"kept": int(out.count()), "threshold": thr,
                      "keep_quantile": args.keep_quantile,
                      "out": args.out}))
    ray.shutdown()


if __name__ == "__main__":
    main()

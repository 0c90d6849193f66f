#!/usr/bin/env python
"""`ray job submit` entry: RAG chunk-corpus export.

Turns a page corpus into a retrieval-ready chunk corpus: tokenize each
page, explode it into overlapping token windows
(:func:`stages.chunk.chunk_documents` — one vectorized ``map_batches``
pass, zero shuffles), and land (doc_id, chunk_id, n_tokens, chunk_text)
as Parquet partitioned by a doc-id range bucket so a re-run can skip
finished partitions and a downstream embedding stage can process range
shards independently.

Usage (cluster):
    ray job submit --working-dir . -- python jobs/chunk_job.py \
        --input /data/pages --out /data/chunks \
        [--window 128] [--stride 96] [--range-size 100000]
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
    ap.add_argument("--out", required=True, help="chunk output directory")
    ap.add_argument("--window", type=int, default=128)
    ap.add_argument("--stride", type=int, default=96)
    ap.add_argument("--id-column", default="doc_id")
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--range-size", type=int, default=100_000,
                    help="doc ids per output partition (resume granularity)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {}
        if os.environ.get("RAY_GRAFT_CPUS"):
            kw["num_cpus"] = int(os.environ["RAY_GRAFT_CPUS"])
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, **kw)

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from org_rdkit_lucene_ray.stages.chunk import chunk_documents

    docs = rd.read_parquet(args.input,
                           columns=[args.id_column, args.text_column])
    chunks = chunk_documents(docs, window=args.window, stride=args.stride,
                             text_column=args.text_column,
                             id_column=args.id_column, emit_text=True)

    def with_range(t: pa.Table) -> pa.Table:
        rng = pc.divide(t["doc_id"], args.range_size)
        return t.append_column("id_range", pc.cast(rng, pa.int64()))

    out = chunks.map_batches(with_range, batch_format="pyarrow") \
        .materialize()
    out.write_parquet(args.out, partition_cols=["id_range"])
    print(json.dumps({
        "n_chunks": int(out.count()),
        "total_chunk_tokens": int(out.sum("n_tokens")),
        "window": args.window, "stride": args.stride,
        "out": args.out,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""`ray job submit` entry: corpus deduplication.

The standard two-stage web-corpus cleaning pass: EXACT content dedup
(md5 fingerprint, keep each group's lowest id — the CCNet front step)
then MinHash-LSH NEAR dedup over the survivors (connected components of
verified Jaccard pairs, keep each component's min-id member), landing
the cleaned corpus as Parquet partitioned by an id-range bucket for
resumability. Every exchange in the chain is bucket-sorted (see
stages/dedup.py, stages/components.py); nothing corpus-sized touches
the driver except the drop-id vector (8 B per duplicate).

Usage (cluster):
    ray job submit --working-dir . -- python jobs/dedup_job.py \
        --input /data/pages --out /data/deduped \
        [--threshold 0.8] [--method minhash] [--range-size 100000]
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
    ap.add_argument("--out", required=True, help="cleaned output directory")
    ap.add_argument("--method", choices=("minhash", "simhash"),
                    default="minhash")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="minhash Jaccard keep threshold")
    ap.add_argument("--id-column", default="doc_id")
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--range-size", type=int, default=100_000)
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
    import pyarrow.compute as pc
    import ray.data as rd

    from org_rdkit_lucene_ray.stages.components import near_dedup
    from org_rdkit_lucene_ray.stages.dedup import _bcast, exact_dedup_groups

    docs = rd.read_parquet(args.input)
    n_in = docs.count()

    # stage 1: exact dedup — keep ids stream back as a sorted broadcast
    # vector (one int64 per DISTINCT content, the survivors)
    groups = exact_dedup_groups(docs, text_col=args.text_column,
                                id_col=args.id_column)
    keep_ids = np.sort(np.concatenate(
        [t[args.id_column].to_numpy(zero_copy_only=False).astype(np.int64)
         for t in groups.iter_batches(batch_format="pyarrow")] or
        [np.zeros(0, np.int64)]))
    keep_ref = ray.put(keep_ids)

    def keep_exact(t: pa.Table) -> pa.Table:
        ks = _bcast(keep_ref)
        if ks.size == 0:
            return t.slice(0, 0)
        ids = t[args.id_column].to_numpy(
            zero_copy_only=False).astype(np.int64)
        loc = np.searchsorted(ks, ids)
        loc_c = np.minimum(loc, ks.size - 1)
        return t.filter(pa.array(ks[loc_c] == ids))

    exact_kept = docs.map_batches(keep_exact, batch_format="pyarrow")

    # stage 2: near dedup over the exact survivors (the mass-duplication
    # guard in the LSH bands assumes stage 1 ran — see stages/dedup.py)
    kw2 = {"threshold": args.threshold} if args.method == "minhash" else {}
    cleaned = near_dedup(exact_kept, method=args.method,
                         id_col=args.id_column, text_col=args.text_column,
                         **kw2)

    def with_range(t: pa.Table) -> pa.Table:
        rng = pc.divide(t[args.id_column], args.range_size)
        return t.append_column("id_range", pc.cast(rng, pa.int64()))

    out = cleaned.map_batches(with_range, batch_format="pyarrow") \
        .materialize()
    out.write_parquet(args.out, partition_cols=["id_range"])
    n_out = out.count()
    print(json.dumps({
        "n_in": int(n_in), "n_exact_survivors": int(keep_ids.size),
        "n_out": int(n_out), "method": args.method,
        "threshold": args.threshold, "out": args.out,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

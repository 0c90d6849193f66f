#!/usr/bin/env python
"""`ray job submit` entry: semantic corpus sharding by k-means cluster.

The SemDeDup / curriculum-sharding layout step: fit the distributed
integer-quantized Lloyd's over the embedding column (`stages/cluster.py`
— zero shuffles, bit-reproducible under any partitioning), tag every row
with its nearest-centroid id, and land the corpus as cluster-partitioned
Parquet (one directory per cluster — the resumable layout the brief
requires, and the physical bucketing that makes within-cluster passes
like SemDeDup's pair scan read only matching partitions).

Usage (cluster):
    ray job submit --working-dir . -- python jobs/shard_by_cluster_job.py \
        --input /data/embeddings --out /data/shards [--k 64] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="embedding parquet dir")
    ap.add_argument("--out", required=True, help="sharded output directory")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--id-col", default="vec_id")
    ap.add_argument("--emb-col", default="embedding")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {}
        if os.environ.get("RAY_GRAFT_CPUS"):
            kw["num_cpus"] = int(os.environ["RAY_GRAFT_CPUS"])
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, **kw)

    import ray.data as rd

    from org_rdkit_lucene_ray.stages.cluster import (
        kmeans_assign_column,
        kmeans_fit,
    )

    # fit on the two pruned columns only; materialize so the iteration
    # passes re-read object-store blocks, not parquet
    fit_ds = rd.read_parquet(args.input,
                             columns=[args.id_col, args.emb_col])
    fit = kmeans_fit(fit_ds, k=args.k, iters=args.iters,
                     id_col=args.id_col, emb_col=args.emb_col)

    # export streams the FULL rows once, tagging each with its cluster
    full = rd.read_parquet(args.input)
    tagged = kmeans_assign_column(full, fit["centroids"],
                                  emb_col=args.emb_col)
    tagged.write_parquet(args.out, partition_cols=["cluster"])
    n = fit["profile"]["n"]
    print(json.dumps({
        "k": args.k, "iters": args.iters,
        "inertia": [float(x) for x in fit["inertia"]],
        "n_rows": int(n.sum()),
        "largest_cluster": int(n.max()), "empty_clusters": int((n == 0).sum()),
        "out": args.out,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

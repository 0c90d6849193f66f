#!/usr/bin/env python
"""`ray job submit` entry: distributed inverted-index build.

Usage (cluster):
    ray job submit --working-dir . -- python jobs/build_index_job.py \
        --input /data/pages --index /data/index [--resume]

The same script serves the sandbox two-parallelism scaling protocol:
    RAY_GRAFT_CPUS=8  python jobs/build_index_job.py --input ... --index ...
    RAY_GRAFT_CPUS=32 python jobs/build_index_job.py --input ... --index ...

Re-running after a crash with the same --index resumes from per-fragment
checkpoints (committed manifest rows) and completed segment chunks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="directory of pages parquet fragments")
    ap.add_argument("--index", required=True, help="output index directory")
    ap.add_argument("--docs-per-segment", type=int, default=1 << 20)
    ap.add_argument("--term-buckets", type=int, default=64)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--store-positions", action="store_true",
                    help="positional sidecar: phrase/proximity verify off "
                         "the index (pos_bytes streams; ~+55%% chunk bytes)")
    ap.add_argument("--chunk-format", choices=("parquet", "ipc"),
                    default="parquet",
                    help="ipc = uncompressed Arrow chunks, memory-mapped "
                         "zero-copy by searchers (serving tier); parquet = "
                         "zstd (build/archive tier, default)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {}
        if os.environ.get("RAY_GRAFT_CPUS"):
            kw["num_cpus"] = int(os.environ["RAY_GRAFT_CPUS"])
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, **kw)

    from org_rdkit_lucene_ray.config import IndexConfig
    from org_rdkit_lucene_ray.pipelines.build import build_index

    cfg = IndexConfig(docs_per_segment=args.docs_per_segment,
                      term_buckets=args.term_buckets,
                      store_positions=args.store_positions,
                      chunk_format=args.chunk_format)
    manifest = build_index(args.input, args.index, cfg=cfg,
                           dedup=not args.no_dedup)
    stats, tim = manifest["stats"], manifest["timings_sec"]
    print(json.dumps({
        "docs": stats["n_docs"],
        "postings": stats["n_postings"],
        "bytes_compressed": stats["bytes_compressed"],
        "total_secs": tim["total"],
        "docs_per_sec": round(stats["n_docs"] / max(tim["total"], 1e-9), 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

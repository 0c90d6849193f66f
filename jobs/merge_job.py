#!/usr/bin/env python
"""`ray job submit` entry: incremental add + log-structured segment merge.

    # append new fragments as a delta generation (url upserts tombstoned)
    python jobs/merge_job.py --index /data/index --add /data/new_pages

    # compact all live generations into one (drops tombstones, exact stats)
    python jobs/merge_job.py --index /data/index --merge
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--add", help="directory of new pages parquet fragments")
    ap.add_argument("--merge", action="store_true")
    args = ap.parse_args()
    if not args.add and not args.merge:
        ap.error("need --add and/or --merge")

    import ray

    if not ray.is_initialized():
        kw = {}
        if os.environ.get("RAY_GRAFT_CPUS"):
            kw["num_cpus"] = int(os.environ["RAY_GRAFT_CPUS"])
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, **kw)

    from org_rdkit_lucene_ray.pipelines.merge import add_documents, merge_generations

    out = {}
    if args.add:
        m = add_documents(args.index, args.add)
        out["add"] = {"generation": m["generation"],
                      "n_docs": m["stats"]["n_docs"],
                      "n_deletes": m["stats"].get("n_deletes", 0)}
    if args.merge:
        m = merge_generations(args.index)
        out["merge"] = {"generation": m["generation"],
                        "n_docs": m["stats"]["n_docs"],
                        "n_segments": m["stats"]["n_segments"],
                        "secs": round(m["timings_sec"]["total"], 2)}
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

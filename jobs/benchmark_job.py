#!/usr/bin/env python
"""`ray job submit` entry: the reference's `-benchmark` workflow from an
ini-style config file (S3+S4+S6 end-to-end).

    python jobs/benchmark_job.py --config /data/benchmark.ini

Config keys (Java-Properties style, `LuceneBenchmark.java:716-745` analog):
query_file, index_dir, result_csv (supports %key% and %time% placeholders),
first_row, last_row, k, thread_count, shuffle_seed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="ini-style benchmark config")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {}
        if os.environ.get("RAY_GRAFT_CPUS"):
            kw["num_cpus"] = int(os.environ["RAY_GRAFT_CPUS"])
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, **kw)

    from org_rdkit_lucene_ray.sources.query_file import run_benchmark_config

    out = run_benchmark_config(args.config,
                               time_stamp=time.strftime("%Y%m%d-%H%M%S"))
    print(json.dumps({"result_csv": out["config"]["result_csv"],
                      "result_files": out["result_files"]}))
    ray.shutdown()


if __name__ == "__main__":
    main()

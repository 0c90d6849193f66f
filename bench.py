#!/usr/bin/env python
"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR.

Default run: one fresh Ray session (num_cpus=$RAY_GRAFT_CPUS, default 32),
times the headline index-build + BM25 query workload over a deterministic
synthesized pages corpus (BASELINE.json input_hint shape, cached in /tmp)
plus the representative gate pipelines over the sf tables, and prints ONE
JSON line:

    {"metric": ..., "value": secs, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, ...extras}

`--scaling`: runs the headline pipeline twice in FRESH processes at
num_cpus=N and num_cpus=4N (default 2 and 8; RAY_GRAFT_SCALING_CPUS="8,32"
to override) on the same input and reports both throughputs plus scaling
efficiency = tput_4N / (4 * tput_N) — the sandbox stand-in for the north
rule's N-node vs 4N-node `ray job submit` protocol. See run_scaling's
docstring for why 2->8 is the faithful single-socket pairing.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR_DEFAULT = "/root/testdata/sf0.1"

# synthesized headline corpus per sf tier: (docs, fragments, gen kwargs)
CORPUS_SIZES = {
    "0.001": (2_000, 8, {}),
    "0.01": (8_000, 16, {}),
    "0.1": (40_000, 32, {}),
    # scaling runs need compute to dominate the fixed per-stage overheads
    # (~8s of Ray shuffle/stage setup at any size), so the two-parallelism
    # protocol uses a larger corpus with realistic web-page doc lengths
    # (~150 tokens avg vs the sf tiers' ~55)
    "scaling": (400_000, 96, {"len_mean": 5.0, "max_len": 1200}),
}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base[2:] if base.startswith("sf") else base


def corpus_dir(sf: str) -> str:
    n_docs, n_frags, kw = CORPUS_SIZES.get(sf, (8_000, 16, {}))
    d = f"/tmp/orl_bench_corpus_sf{sf}_{n_docs}"
    marker = os.path.join(d, "_COMPLETE")
    if not os.path.exists(marker):
        from org_rdkit_lucene_ray.synth import write_pages_dir, write_pages_dir_chunked

        shutil.rmtree(d, ignore_errors=True)
        writer = write_pages_dir_chunked if n_docs > 100_000 else write_pages_dir
        writer(d, n_docs=n_docs, n_fragments=n_frags, seed=42, **kw)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def bench_headline(sf: str, num_cpus: int) -> dict:
    """Build the inverted index over the synth pages corpus + run the
    reference query set (``sf`` may be a corpus tag like "scaling")."""
    import numpy as np

    from org_rdkit_lucene_ray.config import IndexConfig
    from org_rdkit_lucene_ray.pipelines.build import build_index
    from org_rdkit_lucene_ray.pipelines.query import Searcher, run_queries
    from org_rdkit_lucene_ray.synth import gen_queries

    pages = corpus_dir(sf)
    idx = f"/tmp/orl_bench_index_{sf}_{num_cpus}_{os.getpid()}"
    shutil.rmtree(idx, ignore_errors=True)
    # term_buckets fixed per corpus (env-overridable), NOT per cpu count:
    # a cpu-dependent bucket count would change the task decomposition
    # between scaling runs and confound the efficiency measurement
    buckets = int((os.environ.get("RAY_GRAFT_TERM_BUCKETS") or "0")) or max(8, num_cpus)
    cfg = IndexConfig(docs_per_segment=16_384, term_buckets=buckets,
                      block_size=128)
    t0 = time.perf_counter()
    manifest = build_index(pages, idx, cfg=cfg)
    build_secs = time.perf_counter() - t0
    n_docs = manifest["stats"]["n_docs"]

    queries = gen_queries(n_random=60)
    # throughput: the distributed searcher actor-pool path
    t1 = time.perf_counter()
    res = run_queries(idx, queries, mode="bmw", resolve_urls=False)
    n_hits = res.count()
    query_wall = time.perf_counter() - t1

    # latency: per-query wall time on one warm searcher, repeated
    # SEARCHES_PER_TYPE times and averaged per query — the reference's
    # repeat-averaging protocol (LuceneBenchmark.java:158-182, :403-433)
    # with its per-query CSV (S6 sink analog). p50/p95 are over the first
    # TIMED run of each query, after the warm-up sweep below (r5 change;
    # r1-r4 had no warm-up sweep, so their p95 included cold decode).
    searches_per_type = int((os.environ.get("RAY_GRAFT_SEARCHES_PER_TYPE") or "3"))
    s = Searcher(idx, warm_top_terms=16)
    # untimed warm-up sweep over the full query set BEFORE the timed loop —
    # the reference benchmark's own protocol (LuceneBenchmark.java:645-664
    # runs 5 warm-up searches per type before measuring). Without it the
    # first timed rep of each query pays cold posting-list decode, which
    # made the r4 driver p95 a load-lottery (6.22 -> 13.82 ms r3->r4 while
    # controlled repeat-averages said the code got faster, VERDICT r4 #3).
    for row in queries.to_pylist():
        s.topk(row["query"], int(row["k"]), mode="bmw")
    lats = []
    csv_rows = []
    for row in queries.to_pylist():
        reps = []
        n_hits_q = 0
        for _ in range(searches_per_type):
            q0 = time.perf_counter()
            n_hits_q = len(s.topk(row["query"], int(row["k"]), mode="bmw"))
            reps.append(time.perf_counter() - q0)
        lats.append(reps[0])
        csv_rows.append((int(row["query_id"]), row["query"], int(row["k"]),
                         n_hits_q, round(sum(reps) / len(reps) * 1e3, 3)))
    csv_path = f"/tmp/orl_bench_query_avg_sf{sf}.csv"
    with open(csv_path, "w") as fh:
        fh.write("query_id,query,k,n_hits,avg_ms\n")
        for r in csv_rows:
            fh.write(",".join(str(x) for x in r) + "\n")
    lats = np.asarray(lats)
    avg_ms = [r[4] for r in csv_rows]
    shutil.rmtree(idx, ignore_errors=True)
    return {
        "searches_per_type": searches_per_type,
        "query_avg_ms_mean": round(float(np.mean(avg_ms)), 2),
        "query_avg_ms_p95": round(float(np.percentile(avg_ms, 95)), 2),
        "per_query_csv": csv_path,
        "build_secs": round(build_secs, 3),
        "build_docs_per_sec": round(n_docs / build_secs, 1),
        "n_docs": int(n_docs),
        "n_postings": int(manifest["stats"]["n_postings"]),
        "query_pipeline_secs": round(query_wall, 3),
        "n_queries": queries.num_rows,
        "n_hits": int(n_hits),
        "query_p50_ms": round(float(np.percentile(lats, 50)) * 1e3, 2),
        "query_p95_ms": round(float(np.percentile(lats, 95)) * 1e3, 2),
        "build_timings": manifest["timings_sec"],
    }


def bench_gate_queries(sf_dir: str) -> dict[str, float]:
    """Wall seconds for representative gate pipelines over the sf tables.

    Self-defending protocol (VERDICT r2 #1): this shared VM's ambient load
    swings a single run by up to ±40% (BASELINE.md load-sensitivity note),
    which made BENCH_r02 read as a regression while idle-machine runs of
    the same code improved 2-3x. So (a) the one-off inverted-index builds
    the search gates share are warmed FIRST and reported as their own
    entries (``gate_index_build``/``gate_list_index_build``), and (b) every
    gate is run ``RAY_GRAFT_GATE_REPEATS`` times (default 2) taking the
    best — the same best-of-N-per-leg treatment ``--scaling`` already uses,
    measuring the code's capability, not the neighbors'. Host load averages
    ride in the output JSON so any residual wobble is attributable."""
    from org_rdkit_lucene_ray.pipelines import gate

    out: dict[str, float] = {}
    t0 = time.perf_counter()
    gate.gate_index(sf_dir)
    out["gate_index_build"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    gate.gate_list_index(sf_dir)
    out["gate_list_index_build"] = round(time.perf_counter() - t0, 3)

    picks = ["term_df", "doc_lengths", "quality_scores", "exact_dedup",
             "minhash_pairs", "bm25_topk", "ann_topk", "tumbling_hourly",
             "sessionize", "events_type_stats", "orders_by_segment",
             "media_features",
             # round-2 additions (searches reuse the cached gate index)
             "capped_search", "search_after_page2", "grouped_topn",
             "embedding_dup_pairs",
             # round-3 additions (analyzer breadth, raw ingest, multi-field)
             "shingle_df", "free_multifield", "record_roundtrip",
             # round-3 late additions (eval decontamination, highlighter,
             # CCNet paragraph dedup, link-graph centrality, LM scoring)
             "decontaminate", "highlight", "paragraph_dedup", "pagerank",
             "perplexity_topk", "price_quantiles",
             # round-3 joins (large-large hash join, as-of join)
             "order_revenue", "asof_view_attribution",
             # round-3 similarity/collector/curation additions
             "tfidf_topk", "sort_by_field", "semantic_dedup",
             "domain_stats", "classifier_filter", "mixture_sample",
             "sequence_packing",
             # round-3b batch 2 (joins, funnel, budget cut)
             "snapshot_diff", "funnel", "token_budget_cut", "epoch_mix",
             # round-4 (positional-sidecar phrase verify on the gate index;
             # distributed k-means; BPE pair counts; bloom novelty)
             "phrase_search", "kmeans_assign", "bpe_pair_counts",
             "bloom_novel_docs",
             # round-4 session 3 (query-surface parity; chunk/DSIR/BPE/
             # hard-negative training-data operators)
             "dismax_topk", "min_should_match", "chunk_stats",
             "dsir_topk", "hard_negatives", "bpe_roundtrip"]
    repeats = int((os.environ.get("RAY_GRAFT_GATE_REPEATS") or "2"))
    for name in picks:
        fn = gate.QUERIES[name]
        best = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            res = fn(sf_dir)
            if hasattr(res, "materialize"):
                res.materialize()
            secs = time.perf_counter() - t0
            best = secs if best is None else min(best, secs)
        out[name] = round(best, 3)
    return out


def run_single(sf_dir: str, num_cpus: int, headline_only: bool,
               corpus_tag: str | None = None) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass
    from org_rdkit_lucene_ray.util import install_empty_schema_warning_filter

    install_empty_schema_warning_filter()
    sf = _sf_of(sf_dir)
    # bounded quiet-window wait: this shared VM's neighbors burst to
    # load-avg 5+ for minutes at a time and swing single measurements
    # 2-10x (BASELINE.md load-sensitivity protocol). Waiting (up to
    # RAY_GRAFT_IDLE_WAIT seconds, default 90) for the 1-min load to drop
    # below RAY_GRAFT_IDLE_THRESH (default 1.5) measures the code, not
    # the neighbors; the wait is capped so the harness can never hang,
    # and both the wait and the load brackets ride in the output JSON.
    thresh = float((os.environ.get("RAY_GRAFT_IDLE_THRESH") or "1.5"))
    budget = float((os.environ.get("RAY_GRAFT_IDLE_WAIT") or "90"))
    w0 = time.time()
    while os.getloadavg()[0] >= thresh and time.time() - w0 < budget:
        time.sleep(5)
    idle_wait = round(time.time() - w0, 1)
    load_start = os.getloadavg()
    t0 = time.perf_counter()
    # headline build best-of-N (same shared-VM defense as the gates/scaling;
    # each repeat builds from scratch into a fresh index dir)
    repeats = int((os.environ.get("RAY_GRAFT_HEADLINE_REPEATS") or "2"))
    head = None
    for _ in range(repeats):
        h = bench_headline(corpus_tag or sf, num_cpus)
        if head is None or h["build_docs_per_sec"] > head["build_docs_per_sec"]:
            head = h
    queries = {} if headline_only else bench_gate_queries(sf_dir)
    total = time.perf_counter() - t0
    # `value` is the ROUND-COMPARABLE wall: best headline build + the sum
    # of best-of-N gate times. The raw wall (`wall_secs_incl_repeats`)
    # additionally counts every discarded repeat pass, so it scales with
    # the repeat protocol, not the code — comparing IT across rounds with
    # different repeat counts would read a measurement-hardening change as
    # a perf regression (VERDICT r2 #1).
    value = round(head["build_secs"] + sum(queries.values()), 3)
    result = {
        "metric": "index-build docs/sec + BM25 query p95 (headline) + gate pipeline wall",
        "value": value,
        "wall_secs_incl_repeats": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "headline": head,
        # host 1/5/15-min load averages bracketing the run: this shared VM's
        # neighbors swing wall times ±40%, so BENCH numbers carry their own
        # load context (VERDICT r2 #1 / BASELINE.md protocol note)
        "host_load_start": [round(x, 2) for x in load_start],
        "host_load_end": [round(x, 2) for x in os.getloadavg()],
        "idle_wait_s": idle_wait,
        "protocol": {"headline_repeats": repeats,
                     "gate_repeats": int((os.environ.get("RAY_GRAFT_GATE_REPEATS") or "2")),
                     "timing": "best-of-N per gate and per headline build"},
    }
    ray.shutdown()
    return result


def run_scaling(sf_dir: str, cpus_lo: int | None = None, cpus_hi: int | None = None) -> dict:
    """Fresh-process runs at two parallelism levels (N and 4N) on the SAME
    input. Default N=2 -> 4N=8: this sandbox is ONE 32-core socket, so at
    high worker counts the text/compression kernels saturate shared memory
    bandwidth — an artifact a real N-node vs 4N-node cluster (per-node
    sockets, per-node disks) does not have. At <=8 workers each keeps full
    per-core resources, making 2->8 the faithful single-node stand-in;
    override with RAY_GRAFT_SCALING_CPUS="8,32" to measure the saturated
    pair (reported in BASELINE.md for transparency)."""
    if cpus_lo is None or cpus_hi is None:
        pair = (os.environ.get("RAY_GRAFT_SCALING_CPUS") or "2,8").split(",")
        cpus_lo, cpus_hi = int(pair[0]), int(pair[1])
    # warm the OS page cache with one untimed read so BOTH runs measure
    # compute + exchange, not the first disk read (ray_guide §scaling)
    corpus = corpus_dir("scaling")
    for f in sorted(os.listdir(corpus)):
        p = os.path.join(corpus, f)
        if os.path.isfile(p):
            with open(p, "rb") as fh:
                while fh.read(1 << 24):
                    pass
    # BEST-OF-N per leg (default 3, RAY_GRAFT_SCALING_REPEATS to override):
    # this sandbox's shared-VM noise swings a single leg by up to ±40%
    # (measured: the same 8-cpu build 16.1–26.6 s across a day, tracking
    # the host load average) — best-of-N measures the code's capability,
    # not the neighbors'; both legs get the same treatment.
    repeats = int((os.environ.get("RAY_GRAFT_SCALING_REPEATS") or "3"))
    runs = {}
    for cpus in (cpus_lo, cpus_hi):
        # repeats happen HERE (fresh process per repeat); the inner headline
        # loop must not multiply them
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                   RAY_GRAFT_HEADLINE_REPEATS="1")
        best = None
        all_tput = []
        for _ in range(repeats):
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--headline-only", "--sf-dir", sf_dir, "--corpus-tag", "scaling"],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [ln for ln in p.stdout.strip().splitlines()
                    if ln.startswith("{")][-1]
            run = json.loads(line)
            all_tput.append(run["headline"]["build_docs_per_sec"])
            if best is None or (run["headline"]["build_docs_per_sec"]
                                > best["headline"]["build_docs_per_sec"]):
                best = run
        best["all_docs_per_sec"] = all_tput   # every repeat, for the record
        runs[cpus] = best
    lo, hi = runs[cpus_lo]["headline"], runs[cpus_hi]["headline"]
    eff = (hi["build_docs_per_sec"] /
           ((cpus_hi / cpus_lo) * lo["build_docs_per_sec"]))
    return {
        "metric": "index-build throughput scaling efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {},
        "sf": _sf_of(sf_dir),
        "num_cpus": cpus_hi,
        "scaling": {
            f"docs_per_sec@{cpus_lo}": lo["build_docs_per_sec"],
            f"docs_per_sec@{cpus_hi}": hi["build_docs_per_sec"],
            f"build_secs@{cpus_lo}": lo["build_secs"],
            f"build_secs@{cpus_hi}": hi["build_secs"],
            "cpu_ratio": cpus_hi / cpus_lo,
            "efficiency": round(eff, 3),
            f"query_p95_ms@{cpus_lo}": lo["query_p95_ms"],
            f"query_p95_ms@{cpus_hi}": hi["query_p95_ms"],
            "repeats_per_leg": repeats,
            "all_docs_per_sec": {str(c): r["all_docs_per_sec"]
                                 for c, r in runs.items()},
        },
        "host_load_end": [round(x, 2) for x in os.getloadavg()],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", SF_DIR_DEFAULT))
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--corpus-tag", default=None,
                    help="override the synth corpus tier (e.g. 'scaling')")
    args = ap.parse_args()
    num_cpus = int((os.environ.get("RAY_GRAFT_CPUS") or "32"))
    if args.scaling:
        out = run_scaling(args.sf_dir)
    else:
        out = run_single(args.sf_dir, num_cpus, args.headline_only,
                         corpus_tag=args.corpus_tag)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

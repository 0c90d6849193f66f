"""Query-file reader (S3), CSV results sink (S6), seeded shuffle (K4),
fielded search (J5)."""

from __future__ import annotations

import csv
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from org_rdkit_lucene_ray.sources.query_file import (
    read_query_file,
    write_results_csv,
)


@pytest.fixture()
def qfile(tmp_path):
    p = tmp_path / "queries.txt"
    p.write_text("baba cece\n\tdodi\tbaba  \n\nzezezeze\nfoo bar\nlast one\n")
    return str(p)


def test_read_query_file(ray_session, qfile):
    out = read_query_file(qfile).to_pandas().sort_values("query_id")
    # blank line dropped, tabs -> spaces, trimmed
    assert out["query"].tolist() == ["baba cece", "dodi baba", "zezezeze",
                                     "foo bar", "last one"]
    assert out["k"].tolist() == [10] * 5
    ranged = read_query_file(qfile, first_row=1, last_row=3).to_pandas()
    assert sorted(ranged["query_id"]) == [1, 2, 3]


def test_read_query_file_shuffle_seeded(ray_session, qfile):
    a = read_query_file(qfile, shuffle_seed=7).to_pandas()["query_id"].tolist()
    b = read_query_file(qfile, shuffle_seed=7).to_pandas()["query_id"].tolist()
    assert a == b                       # reproducible (unlike Math.random)
    assert sorted(a) == [0, 1, 2, 3, 4]


def test_write_results_csv(ray_session, tmp_path, built_index):
    import ray.data as rd

    from org_rdkit_lucene_ray.pipelines.query import run_queries

    idx, _ = built_index
    queries = pa.table({
        "query_id": pa.array([0, 1], pa.int32()),
        "query": pa.array(["baba", "cece dodi"], pa.string()),
        "k": pa.array([5, 5], pa.int32()),
    })
    res = run_queries(idx, queries, concurrency=2)
    out_dir = str(tmp_path / "results_csv")
    write_results_csv(res, out_dir)
    rows = []
    for f in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, f)) as fh:
            rows.extend(list(csv.DictReader(fh)))
    assert rows and {"query_id", "rank", "doc_id", "url", "score"} <= set(rows[0])
    assert any(r["query_id"] == "0" for r in rows)


def test_fielded_search(ray_session, pages_dir, tmp_path_factory):
    """J5: lang metadata indexed as `lang:xx` composite terms."""
    from org_rdkit_lucene_ray.config import IndexConfig
    from org_rdkit_lucene_ray.pipelines.build import build_index
    from org_rdkit_lucene_ray.pipelines.query import Searcher

    idx = str(tmp_path_factory.mktemp("fielded_idx"))
    cfg = IndexConfig(docs_per_segment=256, term_buckets=8, block_size=32,
                      field_columns=("lang",))
    build_index(pages_dir, idx, cfg=cfg)
    s = Searcher(idx)
    # expected doc set from the forward index
    fwd = pa.concat_tables([
        pq.read_table(p) for p in
        [os.path.join(s.gdir, "fwd", f) for f in sorted(os.listdir(os.path.join(s.gdir, "fwd")))]
    ])
    want_de = sorted(fwd.filter(pa.compute.equal(fwd["lang"], "de"))["doc_id"].to_pylist())
    got = sorted(s.search_or("lang:de").tolist())
    assert got == want_de and got
    # AND with a text term narrows the set
    both = set(s.search_and("lang:de baba").tolist())
    assert both <= set(want_de)
    assert both == set(want_de) & set(s.search_or("baba").tolist())
    # fielded clauses participate in BM25 ranking without breaking it
    hits = s.topk("lang:de baba", 5)
    assert hits and all(d in set(fwd["doc_id"].to_pylist()) for d, _ in hits)
    # unknown field prefix falls back to plain analysis (no crash)
    assert isinstance(s.search_or("nofield:xx baba").tolist(), list)
    # regexp expansion excludes fielded namespace terms (same contract
    # as suggest_complete): 'la.*' must not union lang:de postings
    assert any(":" in t for t in s._vocab().to_pylist())
    assert all(":" not in t for t in s.regexp_terms("la.*"))
    assert all(":" not in t for t in s.regexp_terms(".*"))

def test_benchmark_config_reader(tmp_path):
    """S4 ini analog: defaults layering + %key%/%time% substitution."""
    from org_rdkit_lucene_ray.sources.query_file import read_benchmark_config

    ini = tmp_path / "bench.ini"
    ini.write_text(
        "# comment\n"
        "! also a comment\n"
        "query_file = /data/queries.txt\n"
        "index_dir=/data/idx\n"
        "thread_count = 6\n"
        "result_csv = /out/run-%thread_count%t-%time%.csv\n"
    )
    cfg = read_benchmark_config(str(ini), time_stamp="20260817")
    assert cfg["thread_count"] == "6"
    assert cfg["searches_per_type"] == "1"        # default layered in
    assert cfg["result_csv"] == "/out/run-6t-20260817.csv"


def test_run_benchmark_config_end_to_end(ray_session, built_index, tmp_path):
    """ini -> query file -> searcher pool -> CSV sink, one call."""
    from org_rdkit_lucene_ray.sources.query_file import run_benchmark_config

    idx, _ = built_index
    qf = tmp_path / "queries.txt"
    qf.write_text("baba cece\ndodi\nbaba\tdodi cece\n")
    out = tmp_path / "results"
    ini = tmp_path / "bench.ini"
    ini.write_text(
        f"query_file = {qf}\nindex_dir = {idx}\nthread_count = 1\n"
        f"k = 5\nresult_csv = {out}\n"
    )
    r = run_benchmark_config(str(ini))
    assert r["result_files"] >= 1
    import glob

    import pandas as pd

    rows = pd.concat([pd.read_csv(f) for f in glob.glob(f"{out}/*.csv")])
    assert {"query_id", "rank", "doc_id", "score"} <= set(rows.columns)
    assert len(rows) > 0


def test_benchmark_config_missing_keys(tmp_path):
    """A config lacking required keys fails with a clear error naming them,
    not a bare KeyError."""
    import pytest

    from org_rdkit_lucene_ray.sources.query_file import run_benchmark_config

    ini = tmp_path / "bad.ini"
    ini.write_text("thread_count = 2\nindex_dir = /tmp/nowhere\n")
    with pytest.raises(ValueError, match="query_file"):
        run_benchmark_config(str(ini))


def test_record_files_roundtrip(ray_session, tmp_path):
    """S1/S2 raw ingest: pages -> record files (plain + gz) -> Dataset,
    byte-identical fields + per-file record provenance."""
    from org_rdkit_lucene_ray.sources.record_file import (
        read_record_files,
        write_record_files,
    )
    from org_rdkit_lucene_ray.synth import gen_pages

    t = gen_pages(120, seed=7)
    d = tmp_path / "recs"
    write_record_files(t, str(d), records_per_file=32)
    write_record_files(t, str(d / "gz"), records_per_file=32, gzip_files=True)
    paths = sorted(str(p) for p in d.rglob("*.rec*"))
    out = read_record_files(paths).to_pandas().sort_values(
        ["source_file", "record_no"]).reset_index(drop=True)
    assert len(out) == 2 * t.num_rows
    plain = out[~out.source_file.str.endswith(".gz")]
    gz = out[out.source_file.str.endswith(".gz")]
    for part in (plain, gz):
        assert part["url"].tolist() == t["url"].to_pylist()
        assert part["lang"].tolist() == t["lang"].to_pylist()
        assert [b for b in part["html"]] == t["html"].to_pylist()
        import pandas as pd

        want_ts = pd.to_datetime(t["warc_ts"].to_pandas()).tolist()
        assert pd.to_datetime(part["warc_ts"]).tolist() == want_ts
    assert plain["record_no"].tolist() == [i % 32 for i in range(t.num_rows)]


def test_build_from_records_end_to_end(ray_session, tmp_path):
    """Raw ingest loop: pages -> record files (gz) -> staging -> index; the
    resulting engine answers searches with the same url set as an index
    built from the Parquet pages directly."""
    from org_rdkit_lucene_ray import Engine, IndexConfig
    from org_rdkit_lucene_ray.sources.record_file import write_record_files
    from org_rdkit_lucene_ray.synth import gen_pages
    import pyarrow.parquet as pq

    t = gen_pages(300, seed=11)
    recs = tmp_path / "recs"
    write_record_files(t, str(recs), records_per_file=64, gzip_files=True)
    pages = tmp_path / "pages"
    pages.mkdir()
    pq.write_table(t, str(pages / "pages-00000.parquet"))

    cfg = IndexConfig(docs_per_segment=128, term_buckets=4, block_size=32)
    e_rec = Engine.build_from_records(
        sorted(str(p) for p in recs.glob("*.rec.gz")),
        str(tmp_path / "idx_rec"), cfg=cfg)
    e_dir = Engine.build(str(pages), str(tmp_path / "idx_dir"), cfg=cfg)
    assert e_rec.stats()["n_docs"] == e_dir.stats()["n_docs"]

    def urls(e, q):
        hits = e.topk(q, 10)
        return sorted(e.resolve_urls([d for d, _ in hits]).values())

    for q in ("baba dodi", "cece"):
        assert urls(e_rec, q) == urls(e_dir, q)


def test_curate_job_end_to_end(ray_session, tmp_path):
    """jobs/curate_job.py logic smoke (in-process): classifier score ->
    exact keep-quantile threshold -> streamed re-score filter keeps
    exactly the top (1-q) and partitions by lang."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from org_rdkit_lucene_ray.functions.analyze import (
        REGISTRY,
        tokenize_column,
    )
    from org_rdkit_lucene_ray.stages.classifier import (
        linear_classifier_scores,
        score_tokens,
        sorted_model_arrays,
    )
    from org_rdkit_lucene_ray.stages.quantile import exact_quantiles

    rng = np.random.RandomState(3)
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [" ".join(rng.choice(words, size=5)) for _ in range(200)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    weights = pa.table({"term": pa.array(words, pa.string()),
                        "weight": pa.array([1.0, -1.0, 0.5, -0.5],
                                           pa.float64())})
    scored = linear_classifier_scores(docs, weights).materialize()
    thr = float(exact_quantiles(scored, "score", [0.8])["value"][0].as_py())
    model = ray.put(sorted_model_arrays(weights))
    cfg = REGISTRY["standard"]

    def filt(t: pa.Table) -> pa.Table:
        h, w = ray.get(model)
        sc, counts = score_tokens(
            tokenize_column(t["text"].combine_chunks(), cfg), h, w)
        return t.filter(pa.array((counts > 0) & (sc >= thr)))

    kept = docs.map_batches(filt, batch_format="pyarrow").count()
    want = int((scored.to_pandas()["score"] >= thr).sum())
    assert kept == want
    assert kept <= 200 * 0.35   # top ~20% plus ties


def test_chunk_job_end_to_end(ray_session, tmp_path):
    """jobs/chunk_job.py logic smoke (in-process): chunk explosion ->
    id-range partitioned Parquet export; chunk-token totals conserved
    and every partition holds only its own id range."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from org_rdkit_lucene_ray.stages.chunk import chunk_documents

    texts = [" ".join(f"w{j % 11}" for j in range(i % 40)) for i in range(120)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(120), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)
    chunks = chunk_documents(docs, window=8, stride=6, emit_text=True)
    RANGE = 50

    def with_range(t: pa.Table) -> pa.Table:
        rng = pc.divide(t["doc_id"], RANGE)
        return t.append_column("id_range", pc.cast(rng, pa.int64()))

    out = chunks.map_batches(with_range, batch_format="pyarrow").materialize()
    outdir = str(tmp_path / "chunks")
    out.write_parquet(outdir, partition_cols=["id_range"])

    back = rd.read_parquet(outdir).to_pandas()
    assert len(back) == out.count() > 0
    # token conservation: sum of chunk n_tokens >= sum of doc tokens
    # (overlap re-counts), and every doc with >= 1 token appears
    n_tok_docs = sum(len(t.split()) for t in texts if t)
    assert back["n_tokens"].sum() >= n_tok_docs
    assert set(back["doc_id"]) == {i for i, t in enumerate(texts) if t}
    # partition dirs hold only their own ranges
    assert (back["doc_id"] // RANGE == back["id_range"].astype(int)).all()


def test_dedup_job_end_to_end(ray_session, tmp_path):
    """jobs/dedup_job.py logic smoke (in-process): exact keep-first ->
    near-dedup components -> export; planted exact and near duplicates
    are both dropped, keeping the lowest id of each group."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from org_rdkit_lucene_ray.stages.components import near_dedup
    from org_rdkit_lucene_ray.stages.dedup import exact_dedup_groups

    base = [f"doc {i} alpha beta gamma delta epsilon zeta {i}" +
            " filler" * (i % 4) for i in range(40)]
    texts = list(base)
    texts[7] = texts[3]                       # exact dup of 3
    texts[11] = base[5] + " tail"             # near dup of 5
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array(texts)})).repartition(4)

    keep = np.sort(np.concatenate(
        [t["doc_id"].to_numpy(zero_copy_only=False)
         for t in exact_dedup_groups(docs).iter_batches(
             batch_format="pyarrow")]))
    assert 3 in keep and 7 not in keep
    survivors = docs.filter(lambda r: r["doc_id"] in set(keep.tolist()))
    cleaned = near_dedup(survivors, method="minhash", threshold=0.5,
                         shingle=2)
    ids = set(cleaned.to_pandas()["doc_id"])
    assert 5 in ids and 11 not in ids
    assert 7 not in ids and len(ids) <= 38

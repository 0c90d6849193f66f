"""Distributed inverted-index build (the ``-index`` entry point rebuilt).

Reference lifecycle being re-expressed (SURVEY §3.1,
``LuceneBenchmark.index() :574-623`` -> ``ChemicalIndex.addSDFFileToIndex``):
single-threaded SDF loop -> canonicalize -> fingerprint -> addDocument.
Here the same computation is three Ray Data phases over Parquet pages:

Phase DEDUP (J6, upsert/delete-by-PK analog ``ChemicalIndex.java:801``):
    storage-partitioned like Phase B — per-fragment slim scans written
    bucketed by url hash, then per-bucket last-write-wins loser detection
    (one lexsort per bucket; real urls compared, so hash collisions are
    harmless). Tokenize workers anti-join against the loser files with
    row-group predicate pushdown — no Ray groupby, nothing rides the
    driver (SURVEY §2.4 J6).

Phase A (tokenize; the expensive, checkpointed pass):
    a Dataset of fragment descriptors -> ``map_batches(FragmentTokenizer)``
    actor pool. Each fragment: row-group-streamed pruned read ->
    ``extract_text(html)`` (byte-identity invariant verified against the
    shipped ``text`` column) -> vectorized tokenize -> postings
    ``(term, doc_id, tf, dl)`` + forward-index Parquet, written atomically,
    manifest row committed last (resume = skip committed fragments).
    doc_id = fragment base (prefix sum over path-sorted fragments) + row
    offset — deterministic across runs and resumes (SURVEY §7.4(1)).

Phase B (the wide step — a STORAGE-PARTITIONED exchange, no Ray groupby):
    Phase A wrote each fragment's postings sorted by
    ``(bucket = stable_hash(term) % term_buckets, term, doc_id)`` with one
    Parquet row group per bucket; fragments own contiguous doc-id ranges,
    so each ``(segment_id, bucket)`` encode task reads exactly its slice
    of the few overlapping fragment files via row-group pruning, re-sorts
    the (mostly sorted) concatenation, and writes one atomically-renamed
    chunk file (delta+varint + block-max, vectorized across all terms).
    The deterministic file layout IS the shuffle — it removed the 53 s
    all-to-all sort the ``groupby(term)`` variant cost at 160k docs, and
    makes resume = skip existing chunk files. Skew: a term's postings are
    pre-split by doc-id range (segment), so the widest task is bounded by
    ``docs_per_segment`` postings no matter how hot the head term is —
    salting-by-docID-range per SURVEY §7.1(6); sub-lists stay sorted and
    concatenable.

Phase C: global df table — per-bucket Arrow aggregates over that bucket's
    chunk files (a term lives in exactly one bucket, so this too needs no
    shuffle); one df Parquet per bucket (A4 corpus statistics).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from org_rdkit_lucene_ray.config import IndexConfig
from org_rdkit_lucene_ray.functions.analyze import postings_from_batch
from org_rdkit_lucene_ray.functions.html import extract_text
from org_rdkit_lucene_ray.state import checkpoint as ckpt
from org_rdkit_lucene_ray.state.segment import (
    SEGMENT_SCHEMA,
    SEGMENT_SCHEMA_POS,
    atomic_write_json,
    atomic_write_table,
    gen_name,
    segment_chunk_path,
    set_current_generation,
)


def _default_concurrency(n_units: int) -> int:
    """Actor-pool size: min(work units, cluster CPUs). Sized so the pool does
    not starve the read/write stages (ray_guide 'Stateful stages')."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, min(n_units, cpus))


_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def stable_term_hash(terms) -> np.ndarray:
    """Deterministic (cross-process, cross-run, library-version-independent)
    uint64 FNV-1a hash of a string array.

    Vectorized over the STRING COLUMN'S FLAT UTF-8 BUFFER: one numpy pass
    per byte position of the longest surviving string (gather + xor +
    multiply over the still-alive rows), zero-copy from Arrow — no
    ``to_pylist`` object materialization, no per-row Python. Replaces the
    r1 pandas ``hash_array`` path (object-ndarray round trip on the hot
    build path, VERDICT r1 #6). Bucket assignment is internal to an index
    generation; all generations of one index use the same function."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    if not isinstance(terms, pa.Array):
        terms = pa.array(list(terms), pa.string())
    elif terms.type != pa.string():
        terms = terms.cast(pa.string())
    n = len(terms)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    bufs = terms.buffers()
    offs = np.frombuffer(bufs[1], np.int32)[terms.offset: terms.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None \
        else np.zeros(0, np.uint8)
    starts = offs[:-1]
    lens = offs[1:] - starts
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    alive = np.flatnonzero(lens > 0)
    k = 0
    with np.errstate(over="ignore"):        # FNV wraps mod 2^64 by design
        while alive.size:
            idx = starts[alive] + k
            h[alive] = (h[alive] ^ data[idx].astype(np.uint64)) * _FNV_PRIME
            k += 1
            alive = alive[lens[alive] > k]
    return h


# --------------------------------------------------------------------- plan
def plan_fragments(input_paths: str | list[str], doc_id_base: int = 0) -> list[dict]:
    """Fragment descriptors with deterministic doc-id bases.

    Fragments are ordered by path (the canonical ordering pinned into the
    manifest, SURVEY §7.4(1)); bases are the prefix sum of Parquet footer
    row counts. Footer reads are metadata-only and cheap; at very large
    fragment counts this loop itself becomes a small Ray map over paths."""
    if isinstance(input_paths, str):
        root = input_paths
        paths = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".parquet")
        )
    else:
        paths = sorted(input_paths)
    if not paths:
        raise FileNotFoundError(f"no parquet fragments under {input_paths}")
    frags, base = [], doc_id_base
    for i, p in enumerate(paths):
        rows = pq.read_metadata(p).num_rows
        frags.append({"fragment_id": i, "path": p, "base": base, "rows": rows})
        base += rows
    return frags


# -------------------------------------------------------------------- dedup
def _dedup_bucket_count(total_rows: int, cfg: IndexConfig) -> int:
    """Data-sized bucket count (r3 verdict #2): one bucket per
    ~dedup_rows_per_bucket input rows, clamped to [16, 65536]. Deterministic
    given the fragment plan, so resumes re-derive the same layout."""
    import math

    b = math.ceil(max(1, total_rows) / max(1, cfg.dedup_rows_per_bucket))
    return int(min(max(16, b), 65536))


def _dedup_fragment_ranges(fragments: list[dict], buckets: int,
                           cfg: IndexConfig) -> list[tuple[int, int]]:
    """Split the fragment list into consecutive ranges so a wave-2
    (bucket, range) sub-task reads ≲ dedup_max_task_rows rows
    (≈ range_rows / buckets) and opens ≤ dedup_max_files_per_task files."""
    max_range_rows = cfg.dedup_max_task_rows * buckets
    ranges: list[tuple[int, int]] = []
    start, rows = 0, 0
    for i, fr in enumerate(fragments):
        if i > start and (rows + fr["rows"] > max_range_rows
                          or i - start >= cfg.dedup_max_files_per_task):
            ranges.append((start, i))
            start, rows = i, 0
        rows += fr["rows"]
    ranges.append((start, len(fragments)))
    return ranges


def _slim_bucketed_write(batch: pa.Table, *, slim_dir: str,
                         buckets: int) -> pa.Table:
    """Wave 1: per-fragment slim scan written sorted by (bucket, uh) with
    one row group per url-hash bucket — the dedup side of the
    storage-partitioned exchange (no Ray groupby anywhere in dedup)."""
    import uuid

    _pin_arrow_threads()
    out_rows = []
    for row in batch.to_pylist():
        t = pq.read_table(row["path"], columns=["url", "warc_ts"])
        n = t.num_rows
        uh = stable_term_hash(t["url"]).astype(np.int64)
        slim = pa.table({
            "bucket": pa.array((uh % buckets).astype(np.int32)),
            "uh": pa.array(uh),
            "url": t["url"],
            "warc_ts_us": pc.cast(t["warc_ts"], pa.int64()),
            "doc_id": pa.array(row["base"] + np.arange(n, dtype=np.int64)),
        })
        order = pc.sort_indices(slim, sort_keys=[("bucket", "ascending"),
                                                 ("uh", "ascending")])
        slim = slim.take(order)
        path = os.path.join(slim_dir, f"frag-{int(row['fragment_id']):06d}.parquet")
        tmp = os.path.join(slim_dir, f".tmp-{uuid.uuid4().hex}")
        bk = slim["bucket"].to_numpy()
        starts = np.concatenate([[0], np.flatnonzero(bk[1:] != bk[:-1]) + 1, [n]])
        with pq.ParquetWriter(tmp, slim.schema) as w:
            for i in range(len(starts) - 1):
                w.write_table(slim.slice(starts[i], starts[i + 1] - starts[i]))
        os.replace(tmp, path)
        out_rows.append({"fragment_id": int(row["fragment_id"]), "rows": n})
    return pa.Table.from_pylist(out_rows, schema=pa.schema(
        [("fragment_id", pa.int32()), ("rows", pa.int64())]))


def compute_dup_losers(fragments: list[dict], work_dir: str,
                       cfg: IndexConfig | None = None) -> str:
    """DEDUP phase -> directory of per-bucket loser doc_id Parquet files.

    Storage-partitioned, no shuffle (same trick as Phase B), with BOTH
    fan-in axes bounded (r3 verdict #2):

    - bucket count is DATA-sized (`_dedup_bucket_count`): ~2M input rows per
      url-hash bucket, so a bucket's slice never approaches corpus/16;
    - wave 1 (per fragment): slim (uh, url, warc_ts, doc_id) scan written
      sorted by url-hash bucket, one row group per bucket;
    - wave 2 (per bucket × fragment-range): consecutive fragments are packed
      into ranges (`_dedup_fragment_ranges`) so one sub-task reads
      ≲ dedup_max_task_rows rows and opens ≤ dedup_max_files_per_task files.
      Each sub-task lexsorts its slice, emits local last-write-wins LOSERS
      immediately and — when more than one range exists — its per-url local
      WINNER rows (one row per distinct url in the slice);
    - combine (per bucket, only when ranges > 1): fold the bucket's winner
      rows across ranges (≤ distinct-urls-per-range × ranges rows, tiny) and
      emit the sub-winners that lose globally. Last-write-wins is an
      associative per-url max, so the two-level fold is exact.

    Real urls are compared at every level, so a hash collision can never
    pick a wrong winner. Dup groups crossing buckets are impossible (same
    url -> same hash -> same bucket). `dedup_meta.json` records buckets,
    ranges and per-task rows-read so tests can assert the ceiling.
    """
    cfg = cfg or IndexConfig()
    total_rows = sum(int(f["rows"]) for f in fragments)
    buckets = _dedup_bucket_count(total_rows, cfg)
    ranges = _dedup_fragment_ranges(fragments, buckets, cfg)
    losers_dir = os.path.join(work_dir, "losers")
    done = os.path.join(losers_dir, "_SUCCESS")
    if os.path.exists(done):
        return losers_dir
    slim_dir = os.path.join(work_dir, "dedup_slim")
    winners_dir = os.path.join(work_dir, "dedup_winners")
    os.makedirs(slim_dir, exist_ok=True)
    os.makedirs(losers_dir, exist_ok=True)
    os.makedirs(winners_dir, exist_ok=True)
    multi_range = len(ranges) > 1

    ds = rd.from_items(fragments, override_num_blocks=len(fragments))
    ds.map_batches(
        _slim_bucketed_write, fn_kwargs=dict(slim_dir=slim_dir, buckets=buckets),
        batch_format="pyarrow", batch_size=None).take_all()

    def slim_path(frag: dict) -> str:
        return os.path.join(slim_dir, f"frag-{int(frag['fragment_id']):06d}.parquet")

    _task_schema = pa.schema([("bucket", pa.int32()), ("range_id", pa.int32()),
                              ("rows_read", pa.int64()), ("losers", pa.int64())])

    def losers_of_bucket_range(batch: pa.Table) -> pa.Table:
        _pin_arrow_threads()
        out = []
        for row in batch.to_pylist():
            b, rid = int(row["bucket"]), int(row["range_id"])
            lo, hi = ranges[rid]
            tabs = [pq.read_table(slim_path(fr),
                                  columns=["uh", "url", "warc_ts_us", "doc_id"],
                                  filters=[("bucket", "==", b)])
                    for fr in fragments[lo:hi]]
            t = pa.concat_tables(tabs)
            if t.num_rows == 0:
                continue
            losers = _last_write_wins_losers(t)
            if losers.size:
                atomic_write_table(
                    pa.table({"doc_id": pa.array(losers, pa.int64())}),
                    os.path.join(losers_dir, f"bucket-{b:05d}-range-{rid:04d}.parquet"))
            if multi_range:
                ids = t["doc_id"].to_numpy()
                win_mask = np.ones(len(ids), dtype=bool)
                if losers.size:
                    pos = np.searchsorted(losers, ids)
                    pos[pos >= losers.size] = losers.size - 1
                    win_mask = losers[pos] != ids
                atomic_write_table(
                    t.filter(pa.array(win_mask)),
                    os.path.join(winners_dir, f"bucket-{b:05d}-range-{rid:04d}.parquet"))
            out.append({"bucket": b, "range_id": rid,
                        "rows_read": int(t.num_rows), "losers": int(losers.size)})
        return pa.Table.from_pylist(out, schema=_task_schema)

    items = [{"bucket": b, "range_id": r}
             for b in range(buckets) for r in range(len(ranges))]
    task_rows = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        losers_of_bucket_range, batch_format="pyarrow", batch_size=1).take_all()

    if multi_range:
        def combine_bucket(batch: pa.Table) -> pa.Table:
            _pin_arrow_threads()
            out = []
            for row in batch.to_pylist():
                b = int(row["bucket"])
                tabs = [pq.read_table(os.path.join(winners_dir, f))
                        for f in sorted(os.listdir(winners_dir))
                        if f.startswith(f"bucket-{b:05d}-")]
                if not tabs:
                    continue
                t = pa.concat_tables(tabs)
                losers = _last_write_wins_losers(t)
                if losers.size:
                    atomic_write_table(
                        pa.table({"doc_id": pa.array(losers, pa.int64())}),
                        os.path.join(losers_dir, f"bucket-{b:05d}-final.parquet"))
                out.append({"bucket": b, "range_id": -1,
                            "rows_read": int(t.num_rows), "losers": int(losers.size)})
            return pa.Table.from_pylist(out, schema=_task_schema)

        bitems = [{"bucket": b} for b in range(buckets)]
        rd.from_items(bitems, override_num_blocks=len(bitems)).map_batches(
            combine_bucket, batch_format="pyarrow", batch_size=1).take_all()

    atomic_write_json(
        {"buckets": buckets, "ranges": len(ranges), "total_rows": total_rows,
         "max_task_rows": max((int(r["rows_read"]) for r in task_rows), default=0)},
        os.path.join(losers_dir, "dedup_meta.json"))
    with open(done, "w") as f:
        f.write("ok")
    return losers_dir


def _last_write_wins_losers(t: pa.Table) -> np.ndarray:
    """Doc ids losing the last-write-wins upsert within one url-hash bucket.

    Numeric (url-hash, ts, id) sort + vectorized Arrow string equality
    between neighbors — no url object array, no object lexsort (the r1
    hot spot of this wave). Hash collisions could interleave two urls
    inside one hash run; those runs (neighbors with equal hash but
    unequal url) are re-resolved with the exact object path (negligible
    at 64-bit, but correctness never rests on the hash)."""
    uh = t["uh"].to_numpy()
    ts = t["warc_ts_us"].to_numpy()
    ids = t["doc_id"].to_numpy()
    order = np.lexsort((ids, ts, uh))
    uh_s, ids_s, ts_s = uh[order], ids[order], ts[order]
    urls_s = t["url"].combine_chunks().take(pa.array(order))
    n = len(ids_s)
    if n < 2:
        return np.zeros(0, dtype=np.int64)
    same_uh = uh_s[1:] == uh_s[:-1]
    eq_url = pc.equal(urls_s.slice(1), urls_s.slice(0, n - 1)) \
        .to_numpy(zero_copy_only=False)
    fast_is_last = np.concatenate([~(same_uh & eq_url), [True]])
    collision = same_uh & ~eq_url
    if not collision.any():
        return np.sort(ids_s[~fast_is_last])
    # whole hash runs containing a collision go through the exact object
    # path; rows outside them keep the fast logic (bad runs cover entire
    # hashes, so good/bad neighbors always differ in uh)
    bad = np.isin(uh_s, np.unique(uh_s[:-1][collision]))
    losers_good = ids_s[~fast_is_last & ~bad]
    sub = np.flatnonzero(bad)
    u_obj = np.asarray(urls_s.take(pa.array(sub)).to_pylist(), dtype=object)
    o2 = np.lexsort((ids_s[sub], ts_s[sub], u_obj))
    u2, i2 = u_obj[o2], ids_s[sub][o2]
    last2 = np.concatenate([u2[1:] != u2[:-1], [True]])
    return np.sort(np.concatenate([losers_good, i2[~last2]]))


def _read_losers_in_range(losers_dir: str | None, lo: int, hi: int) -> np.ndarray:
    if not losers_dir or not os.path.isdir(losers_dir):
        return np.zeros(0, dtype=np.int64)
    flt = [("doc_id", ">=", lo), ("doc_id", "<", hi)]
    tabs = []
    for f in os.listdir(losers_dir):
        if f.endswith(".parquet"):
            tabs.append(pq.read_table(os.path.join(losers_dir, f), filters=flt))
    if not tabs:
        return np.zeros(0, dtype=np.int64)
    out = pa.concat_tables(tabs)
    return np.sort(out["doc_id"].to_numpy()) if out.num_rows else np.zeros(0, dtype=np.int64)


# ------------------------------------------------------------------ phase A
class FragmentTokenizer:
    """Actor-pool stage: one __call__ processes one fragment descriptor.

    Reference analog T1: heavyweight per-worker state (RDKit native-lib
    activation, ``bin/RDKit.activate:114-189``) is built once per actor in
    ``__init__`` — here the analyzer config and compiled regex state.
    Per-record error tolerance mirrors M12 (``ChemicalIndex.java:280-292``):
    extraction mismatches are counted per fragment, not fatal.
    """

    def __init__(self, work_dir: str, fwd_dir: str, cfg: IndexConfig,
                 losers_dir: str | None, use_html: bool, text_column: str,
                 url_column: str | None, ts_column: str | None,
                 lang_column: str | None, id_column: str | None,
                 verify_extraction: bool, max_extract_errors: int | None = 100):
        self.work_dir = work_dir
        self.fwd_dir = fwd_dir
        self.cfg = cfg
        self.analyzer = cfg.index_analyzer
        self.losers_dir = losers_dir
        self.use_html = use_html
        self.text_column = text_column
        self.url_column = url_column
        self.ts_column = ts_column
        self.lang_column = lang_column
        self.id_column = id_column
        self.verify_extraction = verify_extraction
        # M12 analog (ChemicalIndex.java:280-292 / :236-237): tolerate
        # per-record errors, abort the job past a threshold
        self.max_extract_errors = max_extract_errors

    def _columns(self) -> list[str]:
        cols = []
        if self.use_html:
            cols.append("html")
        if not self.use_html or self.verify_extraction:
            cols.append(self.text_column)
        for c in (self.url_column, self.ts_column, self.lang_column, self.id_column):
            if c:
                cols.append(c)
        cols.extend(self.cfg.field_columns)
        return list(dict.fromkeys(cols))

    def _field_postings(self, t: pa.Table, doc_ids: np.ndarray,
                        dl: pa.Array) -> pa.Table | None:
        """J5 fielded terms: ``col:value`` postings per metadata column
        (dl = the doc's TEXT length so fielded clauses score with the same
        normalization — Lucene analog: per-field terms, shared doc).

        Scalar columns emit one posting per doc (tf=1). LIST-typed columns
        are MULTI-VALUED fields (the reference's ``name`` synonym field,
        ``ChemicalIndex.java:828-833``, searched at ``:538-554``): one
        ``col:value`` term per element, tf = the value's multiplicity in
        the list (Lucene multi-valued tf semantics)."""
        if not self.cfg.field_columns:
            return None
        parts = []
        dl_np = np.asarray(dl)
        for col in self.cfg.field_columns:
            arr = t[col].combine_chunks()
            if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
                flat = pc.utf8_lower(pc.cast(arr.values, pa.string()))
                parents = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
                terms = pc.binary_join_element_wise(
                    pa.array([col] * len(flat)), flat, ":")
                pairs = pa.table({
                    "term": terms,
                    "doc_id": pa.array(doc_ids[parents], pa.int64()),
                    "dl": pa.array(dl_np[parents], pa.int32()),
                })
                g = pairs.group_by(["doc_id", "term", "dl"]).aggregate(
                    [("term", "count")])
                parts.append(pa.table({
                    "term": g["term"],
                    "doc_id": pc.cast(g["doc_id"], pa.int64()),
                    "tf": pc.cast(g["term_count"], pa.int32()),
                    "dl": g["dl"],
                }))
            else:
                vals = pc.utf8_lower(pc.cast(arr, pa.string()))
                terms = pc.binary_join_element_wise(
                    pa.array([col] * len(doc_ids)), vals, ":")
                # join produces "col" + ":" + value via separator-last
                # semantics: binary_join_element_wise(a, b, sep) = a sep b
                parts.append(pa.table({
                    "term": terms,
                    "doc_id": pa.array(doc_ids, pa.int64()),
                    "tf": pa.array(np.ones(len(doc_ids), np.int32)),
                    "dl": dl,
                }))
        return pa.concat_tables(parts)

    def _process_fragment(self, frag: dict) -> dict:
        fid, path, base, rows = (
            int(frag["fragment_id"]), frag["path"], int(frag["base"]), int(frag["rows"])
        )
        existing = ckpt.load_fragment_manifest(self.work_dir, fid)
        if existing is not None:
            existing["resumed_skip"] = True
            return existing
        # fresh processing below; marked in the lineage row

        sw = ckpt.Stopwatch()
        losers = _read_losers_in_range(self.losers_dir, base, base + rows)
        pf = pq.ParquetFile(path)
        post_parts, fwd_parts = [], []
        offset = 0
        mismatches = 0
        for rg in range(pf.num_row_groups):
            t = pf.read_row_group(rg, columns=self._columns())
            n = t.num_rows
            if self.id_column:
                doc_ids = t[self.id_column].to_numpy().astype(np.int64)
                # CONSTRAINT: id_column is an assertion of positional
                # identity, not a free mapping. Segment routing (Phase B) and
                # dedup-loser ids are derived from the fragment's positional
                # range [base, base+rows); out-of-position ids would be
                # silently dropped from the index, so fail loudly instead.
                expect = base + offset + np.arange(n, dtype=np.int64)
                if not np.array_equal(doc_ids, expect):
                    bad = int(np.flatnonzero(doc_ids != expect)[0])
                    raise ValueError(
                        f"fragment {fid} ({path}) row-group {rg}: id_column "
                        f"'{self.id_column}' must equal the positional doc id "
                        f"(fragment base + row offset); row {bad} has "
                        f"{int(doc_ids[bad])}, expected {int(expect[bad])}. "
                        "Drop id_column to use positional ids, or renumber "
                        "the input so ids are the global row index.")
            else:
                doc_ids = base + offset + np.arange(n, dtype=np.int64)
            offset += n
            if self.use_html:
                text = extract_text(t["html"].combine_chunks())
                if self.verify_extraction and self.text_column in t.column_names:
                    golden = t[self.text_column].combine_chunks()
                    mismatches += int(
                        pc.sum(pc.cast(pc.not_equal(text, golden), pa.int64())).as_py() or 0
                    )
            else:
                text = t[self.text_column].combine_chunks()
            if losers.size:
                keep = ~np.isin(doc_ids, losers, assume_unique=False)
                if not keep.all():
                    idx = np.flatnonzero(keep)
                    doc_ids = doc_ids[idx]
                    text = text.take(pa.array(idx))
                    t = t.take(pa.array(idx))
            postings, doclens = postings_from_batch(
                doc_ids, text, self.analyzer,
                positions=self.cfg.store_positions)
            post_parts.append(postings)
            fielded = self._field_postings(t, doc_ids, doclens["dl"].combine_chunks())
            if fielded is not None:
                if self.cfg.store_positions:
                    # fielded "col:value" terms carry NO positions (they are
                    # whole-value terms, not text tokens) — null sidecar rows
                    fielded = fielded.append_column(
                        "pos_bytes", pa.nulls(fielded.num_rows, pa.binary()))
                post_parts.append(fielded)
            fwd_cols = {"doc_id": pa.array(doc_ids, pa.int64()), "dl": doclens["dl"]}
            if self.url_column:
                fwd_cols["url"] = t[self.url_column].combine_chunks()
            else:
                fwd_cols["url"] = pc.binary_join_element_wise(
                    pa.array(["doc://"] * len(doc_ids)),
                    pc.cast(pa.array(doc_ids), pa.string()), "")
            if self.ts_column:
                fwd_cols["warc_ts"] = t[self.ts_column].combine_chunks()
            if self.lang_column:
                fwd_cols["lang"] = t[self.lang_column].combine_chunks()
            fwd_parts.append(pa.table(fwd_cols))

        if (self.max_extract_errors is not None
                and mismatches > self.max_extract_errors):
            raise RuntimeError(
                f"fragment {fid} ({path}): {mismatches} extraction mismatches "
                f"exceed max_extract_errors={self.max_extract_errors} — input "
                "corpus and extractor disagree (M12 abort-threshold analog)")
        postings_tbl = pa.concat_tables(post_parts) if post_parts else None
        fwd_tbl = pa.concat_tables(fwd_parts)
        nbytes = 0
        post_path = os.path.join(self.work_dir, "postings", f"frag-{fid:06d}.parquet")
        if postings_tbl is not None and postings_tbl.num_rows:
            nbytes += _write_bucketed_postings(postings_tbl, post_path,
                                              self.cfg.term_buckets)
        # url bloom in the fragment footer -> lookup_pk opens O(1) files
        # instead of every fwd fragment (J1 at web scale, state/bloom.py)
        from org_rdkit_lucene_ray.state.bloom import attach_url_bloom

        nbytes += atomic_write_table(attach_url_bloom(fwd_tbl),
                                     os.path.join(self.fwd_dir, f"frag-{fid:06d}.parquet"))
        row = {
            "input_fragment": path,
            "base": base,
            "input_rows": rows,
            "docs": int(fwd_tbl.num_rows),
            "postings": int(postings_tbl.num_rows if postings_tbl is not None else 0),
            "sum_dl": int(pc.sum(fwd_tbl["dl"]).as_py() or 0),
            "dedup_dropped": int(rows - fwd_tbl.num_rows),
            "extract_mismatches": mismatches,
            "bytes": int(nbytes),
            "seconds": sw.secs(),
            "resumed_skip": False,
        }
        return ckpt.commit_fragment_manifest(self.work_dir, fid, row)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._process_fragment(f) for f in batch.to_pylist()]
        keys = ["fragment_id", "input_fragment", "base", "input_rows", "docs",
                "postings", "sum_dl", "dedup_dropped", "extract_mismatches",
                "bytes", "seconds", "docs_per_sec", "postings_per_sec",
                "resumed_skip"]
        return pa.table({k: [r.get(k) for r in rows] for k in keys})


# Task-pool wrapper with per-worker-process state cache: a cluster-wide actor
# pool costs ~10s of startup at 32 CPUs (measured) before the first batch;
# a task fn reuses Ray's warm worker processes and builds the (light)
# tokenizer state once per process. A genuinely heavy analyzer (model
# weights) should instead pass ``tokenizer_mode="actors"`` to build_index —
# the T1 actor-pool path.
_TOKENIZER_STATE: dict[tuple, FragmentTokenizer] = {}


def _pin_arrow_threads() -> None:
    """One Arrow thread per Ray worker: each worker process otherwise sizes
    Arrow's internal pool to ALL cores, so 32 workers x 32 threads thrash
    (tokenize stage measured at ~30% CPU utilization before this)."""
    try:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
    except Exception:
        pass


def _tokenize_fragments_task(batch: pa.Table, *, ctor_kwargs: dict) -> pa.Table:
    _pin_arrow_threads()
    key = (ctor_kwargs["work_dir"], ctor_kwargs["fwd_dir"])
    tok = _TOKENIZER_STATE.get(key)
    if tok is None:
        tok = _TOKENIZER_STATE[key] = FragmentTokenizer(**ctor_kwargs)
    return tok(batch)


def _write_bucketed_postings(postings: pa.Table, path: str, buckets: int) -> int:
    """Write a fragment's postings clustered by bucket with ONE ROW GROUP
    PER BUCKET — the write side of the storage-partitioned exchange that
    replaces the groupby-term shuffle (encode tasks read one bucket via
    row-group statistics pruning). Atomic: temp + rename.

    Within a bucket, rows are ordered by (term-HASH, doc_id), not by the
    term string: bucket contiguity is all the layout contract requires
    (encode re-sorts its slice by (term, doc_id) anyway, and same-term
    rows stay adjacent under the hash), while a 3-key numeric np.lexsort
    is ~4x faster than the Arrow string sort it replaces."""
    import uuid

    # hash the DICTIONARY (distinct terms, ~2 orders of magnitude fewer
    # than posting rows), then scatter through the indices
    td = pc.dictionary_encode(postings["term"].combine_chunks())
    idx = td.indices.to_numpy(zero_copy_only=False)
    h = stable_term_hash(td.dictionary)[idx]
    bucket = (h % buckets).astype(np.int32)
    postings = postings.append_column("bucket", pa.array(bucket))
    order = np.lexsort((postings["doc_id"].to_numpy(), h, bucket))
    postings = postings.take(pa.array(order))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = os.path.join(os.path.dirname(path), f".tmp-{uuid.uuid4().hex}")
    bk = postings["bucket"].to_numpy()
    starts = np.concatenate([[0], np.flatnonzero(bk[1:] != bk[:-1]) + 1, [len(bk)]])
    with pq.ParquetWriter(tmp, postings.schema, compression="zstd") as w:
        for i in range(len(starts) - 1):
            w.write_table(postings.slice(starts[i], starts[i + 1] - starts[i]))
    size = os.path.getsize(tmp)
    os.replace(tmp, path)
    return size


# ------------------------------------------------------------------ phase B
def _existing_chunks(gdir: str) -> set[tuple[int, int]]:
    out = set()
    seg_root = os.path.join(gdir, "segments")
    if not os.path.isdir(seg_root):
        return out
    for seg in os.listdir(seg_root):
        if not seg.startswith("seg="):
            continue
        sid = int(seg.split("=")[1])
        for f in os.listdir(os.path.join(seg_root, seg)):
            if f.startswith("bucket-") and f.endswith((".parquet", ".arrow")):
                from org_rdkit_lucene_ray.state.segment import chunk_bucket_of

                out.add((sid, chunk_bucket_of(f)))
    return out


def _binary_from_offsets(buf: bytes, offsets: np.ndarray) -> pa.Array:
    """Zero-copy binary array: value i = buf[offsets[i]:offsets[i+1]]."""
    return pa.Array.from_buffers(
        pa.binary(), len(offsets) - 1,
        [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(buf)],
    )


def _term_position_streams(pos_col, term_starts: np.ndarray,
                           n_rows: int) -> pa.Array:
    """Fold the per-POSTING position blobs (already in (term, doc) order)
    into one stream per TERM, zero-copy: each posting's blob is a
    self-contained delta+varint run, so a term's stream is the byte
    concatenation of its postings' blobs — per-term offsets into the SAME
    values buffer, no bytes moved. Null per-posting blobs (fielded
    ``col:value`` terms carry no positions) yield a NULL term stream; text
    and fielded terms never mix under one term (fielded terms contain
    ``:``, analyzer tokens cannot)."""
    arr = pos_col.combine_chunks()
    arr = pc.fill_null(arr, b"")        # null offsets -> well-defined empties
    offs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset: arr.offset + n_rows + 1].astype(np.int64)
    bounds = np.concatenate([term_starts, [n_rows]])
    term_offs = offs[bounds]
    lengths = np.diff(term_offs)
    validity = np.packbits((lengths > 0).astype(np.uint8), bitorder="little")
    n_null = int((lengths == 0).sum())
    data_buf = arr.buffers()[2] or pa.py_buffer(b"")
    return pa.Array.from_buffers(
        pa.large_binary(), term_starts.size,
        [pa.py_buffer(validity.tobytes()),
         pa.py_buffer(term_offs.astype(np.int64).tobytes()),
         data_buf],
        null_count=n_null).cast(pa.binary())


def encode_chunk_table(sorted_postings: pa.Table, gdir: str, sid: int,
                       bucket: int, cfg: IndexConfig, avgdl: float) -> dict:
    """Encode one (segment, bucket) postings slice (already sorted by
    (term, doc_id)) into its chunk file — one vectorized pass over ALL
    terms (encode_posting_block), no per-term Python loop."""
    from org_rdkit_lucene_ray.functions.codec import encode_posting_block

    g = sorted_postings
    term_dict = pc.dictionary_encode(g["term"].combine_chunks())
    idx = term_dict.indices.to_numpy(zero_copy_only=False)
    docs = g["doc_id"].to_numpy()
    tfs = g["tf"].to_numpy()
    dls = g["dl"].to_numpy()
    starts = np.concatenate([[0], np.flatnonzero(idx[1:] != idx[:-1]) + 1])
    enc = encode_posting_block(docs, tfs, dls, starts, avgdl=avgdl,
                               bm25=cfg.bm25, block_size=cfg.block_size)
    terms = term_dict.dictionary.take(pa.array(idx[starts])).cast(pa.string())
    boff = pa.array(enc["block_offsets"].astype(np.int32), pa.int32())
    cols = {
        "term": terms,
        "df_chunk": pa.array(enc["df_chunk"], pa.int32()),
        "doc_bytes": _binary_from_offsets(enc["doc_buf"], enc["doc_off"]),
        "tf_bytes": _binary_from_offsets(enc["tf_buf"], enc["tf_off"]),
        "dl_bytes": _binary_from_offsets(enc["dl_buf"], enc["dl_off"]),
        "bm_first_doc": pa.ListArray.from_arrays(
            boff, pa.array(enc["bm_first_doc"], pa.int64())),
        "bm_last_doc": pa.ListArray.from_arrays(
            boff, pa.array(enc["bm_last_doc"], pa.int64())),
        "bm_max_tfn": pa.ListArray.from_arrays(
            boff, pa.array(enc["bm_max_tfn"], pa.float32())),
    }
    schema = SEGMENT_SCHEMA
    if "pos_bytes" in g.column_names:
        cols["pos_bytes"] = _term_position_streams(
            g["pos_bytes"], starts, g.num_rows)
        schema = SEGMENT_SCHEMA_POS
    chunk = pa.table(cols).cast(schema)
    # chunk files are sorted by term -> row-group stats allow term pruning
    # (parquet); ipc chunks are mmap'd whole, pruning happens at the bucket
    from org_rdkit_lucene_ray.state.segment import atomic_write_chunk

    path = segment_chunk_path(gdir, sid, bucket, cfg.chunk_format)
    nbytes = atomic_write_chunk(chunk, path, row_group_size=8192)
    return {"segment_id": sid, "bucket": bucket, "terms": chunk.num_rows,
            "postings": int(docs.size), "bytes_compressed": int(nbytes)}


_CHUNK_ROW_SCHEMA = pa.schema([
    ("segment_id", pa.int32()), ("bucket", pa.int32()), ("terms", pa.int64()),
    ("postings", pa.int64()), ("bytes_compressed", pa.int64()),
])


def encode_segments(work_dir: str, gdir: str, cfg: IndexConfig, avgdl: float) -> list[dict]:
    """Phase B driver — storage-partitioned exchange, NO Ray groupby.

    Tokenize wrote each fragment's postings sorted by (bucket, term, doc_id)
    with one row group per bucket; fragments own contiguous doc-id ranges,
    so ``(segment, bucket)`` -> the bucket row groups of the few fragments
    overlapping that segment's doc range. Each encode task reads exactly its
    slice via Parquet row-group pruning + doc-range predicate — the
    "shuffle" is the deterministic file layout, which (a) removes the
    all-to-all sort the groupby did (53s of a 70s sf-scaling build), and
    (b) makes Phase B resume = skip existing chunk files, no recompute.
    Skew: a head term's postings are still split by doc range exactly as
    before (segment = docID-range salt, SURVEY §7.1(6))."""
    post_dir = os.path.join(work_dir, "postings")
    done = _existing_chunks(gdir)
    B = cfg.term_buckets
    D = cfg.docs_per_segment

    seg_files: dict[int, list[str]] = {}
    for m in ckpt.list_fragment_manifests(work_dir):
        path = os.path.join(post_dir, f"frag-{int(m['fragment_id']):06d}.parquet")
        if not os.path.exists(path):
            continue          # fragment produced no postings
        base, rows = int(m["base"]), int(m["input_rows"])
        for sid in range(base // D, (base + rows - 1) // D + 1):
            seg_files.setdefault(sid, []).append(path)

    tasks = [
        {"sid": sid, "bucket": b, "files": files}
        for sid, files in sorted(seg_files.items())
        for b in range(B)
        if (sid, b) not in done
    ]
    if not tasks:
        return _chunk_rows_from_disk(gdir)

    read_cols = ["term", "doc_id", "tf", "dl"]
    if cfg.store_positions:
        read_cols.append("pos_bytes")

    def encode_task(batch: pa.Table) -> pa.Table:
        _pin_arrow_threads()
        out = []
        for row in batch.to_pylist():
            sid, b = int(row["sid"]), int(row["bucket"])
            lo, hi = sid * D, (sid + 1) * D
            tabs = [
                pq.read_table(
                    f, columns=read_cols,
                    filters=[("bucket", "==", b), ("doc_id", ">=", lo),
                             ("doc_id", "<", hi)],
                )
                for f in row["files"]
            ]
            t = pa.concat_tables(tabs)
            if t.num_rows == 0:
                continue
            # per-fragment slices are hash-grouped (same-term rows adjacent,
            # term order scrambled); one Arrow sort restores (term, doc_id)
            order = pc.sort_indices(t, sort_keys=[("term", "ascending"),
                                                  ("doc_id", "ascending")])
            out.append(encode_chunk_table(t.take(order), gdir, sid, b, cfg, avgdl))
        if not out:
            return _CHUNK_ROW_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=_CHUNK_ROW_SCHEMA)

    ds = rd.from_items(tasks, override_num_blocks=len(tasks))
    rows = ds.map_batches(encode_task, batch_format="pyarrow",
                          batch_size=1).take_all()
    if done:      # resumed build: merge in the already-encoded chunks' stats
        have = {(r["segment_id"], r["bucket"]) for r in rows}
        rows.extend(r for r in _chunk_rows_from_disk(gdir)
                    if (r["segment_id"], r["bucket"]) not in have)
    return rows


def _chunk_rows_from_disk(gdir: str) -> list[dict]:
    from org_rdkit_lucene_ray.state.segment import (
        list_chunk_files,
        list_segment_ids,
        read_chunk_table,
    )

    rows = []
    for sid in list_segment_ids(gdir):
        for path in list_chunk_files(gdir, sid):
            from org_rdkit_lucene_ray.state.segment import chunk_bucket_of

            t = read_chunk_table(path, columns=["df_chunk"])
            rows.append({"segment_id": sid, "bucket": chunk_bucket_of(path),
                         "terms": t.num_rows,
                         "postings": int(pc.sum(t["df_chunk"]).as_py() or 0),
                         "bytes_compressed": os.path.getsize(path)})
    return rows


# ------------------------------------------------------------------ phase C
def build_df_table(gdir: str) -> int:
    """Global (term, df) table (A4) — NO shuffle: the bucket partitioning
    already co-locates every term's chunks (term -> one bucket across all
    segments), so df is a per-bucket Arrow aggregate over that bucket's
    chunk files; one task per bucket, one output file per bucket."""
    seg_root = os.path.join(gdir, "segments")
    by_bucket: dict[int, list[str]] = {}
    for seg in sorted(os.listdir(seg_root)):
        if not seg.startswith("seg="):
            continue
        d = os.path.join(seg_root, seg)
        for f in sorted(os.listdir(d)):
            if f.startswith("bucket-") and f.endswith((".parquet", ".arrow")):
                from org_rdkit_lucene_ray.state.segment import chunk_bucket_of

                by_bucket.setdefault(chunk_bucket_of(f), []) \
                    .append(os.path.join(d, f))

    out_dir = os.path.join(gdir, "df")
    os.makedirs(out_dir, exist_ok=True)

    def df_of_bucket(batch: pa.Table) -> pa.Table:
        _pin_arrow_threads()
        counts = []
        for row in batch.to_pylist():
            from org_rdkit_lucene_ray.state.segment import read_chunk_table

            b = int(row["bucket"])
            tabs = [read_chunk_table(p, columns=["term", "df_chunk"])
                    for p in row["files"]]
            t = pa.concat_tables(tabs)
            g = t.group_by("term").aggregate([("df_chunk", "sum")])
            out = pa.table({"term": g["term"],
                            "df": pc.cast(g["df_chunk_sum"], pa.int64())})
            atomic_write_table(out, os.path.join(out_dir, f"bucket-{b:05d}.parquet"))
            counts.append({"bucket": b, "n_terms": out.num_rows})
        return pa.Table.from_pylist(counts, schema=pa.schema(
            [("bucket", pa.int32()), ("n_terms", pa.int64())]))

    items = [{"bucket": b, "files": fs} for b, fs in sorted(by_bucket.items())]
    if not items:
        return 0
    rows = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        df_of_bucket, batch_format="pyarrow", batch_size=1).take_all()
    return int(sum(r["n_terms"] for r in rows))


# -------------------------------------------------------------------- driver
def build_index(
    input_paths: str | list[str],
    index_dir: str,
    *,
    cfg: IndexConfig | None = None,
    work_dir: str | None = None,
    use_html: bool | None = None,
    text_column: str = "text",
    url_column: str | None = "url",
    ts_column: str | None = "warc_ts",
    lang_column: str | None = "lang",
    id_column: str | None = None,
    dedup: bool = True,
    verify_extraction: bool = True,
    concurrency: int | tuple[int, int] | None = None,
    doc_id_base: int = 0,
    tokenizer_mode: str = "tasks",
    max_extract_errors: int | None = 100,
) -> dict:
    """End-to-end build. Idempotent/resumable: re-running after a crash skips
    committed fragments (Phase A) and committed chunk files (Phase B)."""
    cfg = cfg or IndexConfig()
    work_dir = work_dir or os.path.join(index_dir, "work")
    os.makedirs(work_dir, exist_ok=True)

    # pin the target generation so resumes land in the same directory
    build_cfg_path = os.path.join(work_dir, "build_config.json")
    if os.path.exists(build_cfg_path):
        import json
        with open(build_cfg_path) as f:
            target_gen = json.load(f)["target_gen"]
    else:
        target_gen = gen_name(0)
        atomic_write_json({"target_gen": target_gen, "config": cfg.manifest_dict()}, build_cfg_path)
    gdir = os.path.join(index_dir, target_gen)
    fwd_dir = os.path.join(gdir, "fwd")
    os.makedirs(fwd_dir, exist_ok=True)

    t0 = time.perf_counter()
    fragments = plan_fragments(input_paths, doc_id_base=doc_id_base)
    if use_html is None:
        use_html = "html" in pq.read_schema(fragments[0]["path"]).names

    losers_dir = compute_dup_losers(fragments, work_dir, cfg=cfg) if dedup else None
    t_dedup = time.perf_counter()

    frag_ds = rd.from_items(fragments, override_num_blocks=len(fragments))
    ctor_kwargs = dict(
        work_dir=work_dir, fwd_dir=fwd_dir, cfg=cfg, losers_dir=losers_dir,
        use_html=use_html, text_column=text_column, url_column=url_column,
        ts_column=ts_column, lang_column=lang_column, id_column=id_column,
        verify_extraction=verify_extraction, max_extract_errors=max_extract_errors,
    )
    if tokenizer_mode == "actors":
        mani_ds = frag_ds.map_batches(
            FragmentTokenizer,
            fn_constructor_kwargs=ctor_kwargs,
            batch_format="pyarrow",
            batch_size=1,
            concurrency=concurrency or _default_concurrency(len(fragments)),
        )
    else:
        mani_ds = frag_ds.map_batches(
            _tokenize_fragments_task,
            fn_kwargs=dict(ctor_kwargs=ctor_kwargs),
            batch_format="pyarrow",
            batch_size=1,
        )
    frag_rows = mani_ds.take_all()  # one row per fragment — small
    t_tokenize = time.perf_counter()

    n_docs = sum(r["docs"] for r in frag_rows)
    sum_dl = sum(r["sum_dl"] for r in frag_rows)
    n_postings = sum(r["postings"] for r in frag_rows)
    avgdl = (sum_dl / n_docs) if n_docs else 0.0

    chunk_rows = encode_segments(work_dir, gdir, cfg, avgdl)
    t_encode = time.perf_counter()
    n_terms_global = build_df_table(gdir)
    t_df = time.perf_counter()

    manifest = {
        "generation": target_gen,
        "config": cfg.manifest_dict(),
        "stats": {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": avgdl,
            "n_postings": n_postings,
            "n_terms": n_terms_global,
            "n_fragments": len(fragments),
            "n_segments": len({r["segment_id"] for r in chunk_rows}),
            "bytes_compressed": sum(r["bytes_compressed"] for r in chunk_rows),
            "dedup_dropped": sum(r["dedup_dropped"] for r in frag_rows),
            "extract_mismatches": sum(r["extract_mismatches"] for r in frag_rows),
        },
        "timings_sec": {
            "dedup": t_dedup - t0,
            "tokenize": t_tokenize - t_dedup,
            "encode_shuffle": t_encode - t_tokenize,
            "df_table": t_df - t_encode,
            "total": t_df - t0,
        },
        "fragments": frag_rows,
        "chunks": chunk_rows,
    }
    atomic_write_json(manifest, os.path.join(gdir, "manifest.json"))
    set_current_generation(index_dir, target_gen)
    return manifest

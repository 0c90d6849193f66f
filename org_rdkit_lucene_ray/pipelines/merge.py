"""Incremental adds + log-structured segment merges — fully distributed.

Reference analog: Lucene's ``IndexWriter.addDocument`` with delete-by-PK
upsert (J6, ``ChemicalIndex.java:798-853``) and background segment merges
awaited by ``close(true)`` (``ChemicalIndex.java:344``). Here both are
explicit, scheduled Ray Data jobs over immutable generations:

- :func:`add_documents` builds a DELTA generation holding only the new
  fragments (own segment set; doc ids start at the previous generation's
  doc-id ceiling aligned up to a segment boundary so segment ids never
  collide). Urls already present in the parent generations become
  **tombstones** (``deletes.parquet``): exactly Lucene's delete-by-term(pk)
  before add (`:801`). Like Lucene, deleted docs still count in df/avgdl
  until a merge physically drops them. Tombstone discovery is a
  ``map_batches`` over the parent forward-index fragments against the
  ``ray.put``-broadcast delta-url set — the driver never reads the corpus.
- :func:`merge_generations` compacts all live generations into one fresh
  generation. Because segment doc-id ranges are DISJOINT across generations
  (the ceiling alignment above), every ``(segment, bucket)`` chunk file
  belongs to exactly one generation — so the merge is embarrassingly
  parallel per file, with **zero shuffle**: one map task per chunk file
  (decode -> drop tombstoned postings -> re-encode with the recomputed
  avgdl via the vectorized multi-term ``encode_posting_block``) and one map
  task per forward-index fragment (filter tombstones, rewrite). All writes
  are atomic temp+rename, so a crashed merge resumes by skipping existing
  outputs. Doc ids are preserved (stable external references; Lucene
  renumbers internally but keeps the pk — we keep both).

A generation manifest lists ``includes`` (itself + parents) and
``deletes``; the searcher unions the included segment sets and masks
tombstones, so readers see a consistent snapshot the moment CURRENT is
swapped — no writer/searcher locks (T2/T3 analog).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from org_rdkit_lucene_ray.config import AnalyzerConfig, BM25Params, IndexConfig
from org_rdkit_lucene_ray.functions.codec import encode_posting_block, varint_decode
from org_rdkit_lucene_ray.state.segment import (
    SEGMENT_SCHEMA,
    SEGMENT_SCHEMA_POS,
    atomic_write_json,
    check_format,
    atomic_write_table,
    current_generation,
    gen_name,
    list_chunk_files,
    list_segment_ids,
    read_manifest,
    segment_chunk_path,
    set_current_generation,
)


def _cfg_from_manifest(m: dict) -> IndexConfig:
    check_format(m)   # never graft a new generation onto a foreign-hash index
    c = m["config"]
    mk = lambda d: AnalyzerConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in d.items()})
    return IndexConfig(
        docs_per_segment=c["docs_per_segment"],
        term_buckets=c["term_buckets"],
        block_size=c["block_size"],
        bm25=BM25Params(**c["bm25"]),
        index_analyzer=mk(c["index_analyzer"]),
        query_analyzer=mk(c["query_analyzer"]),
        field_columns=tuple(c.get("field_columns", ())),
        store_positions=bool(c.get("store_positions", False)),
        chunk_format=c.get("chunk_format", "parquet"),
    )


def live_generations(index_dir: str, gen: str | None = None) -> list[str]:
    """Generations whose segments are visible under ``gen`` (itself last)."""
    m = read_manifest(index_dir, gen)
    return list(m.get("includes", [m["generation"]]))


def read_deletes(index_dir: str, gen: str | None = None) -> np.ndarray:
    g = gen or current_generation(index_dir)
    path = os.path.join(index_dir, g, "deletes.parquet")
    if not os.path.exists(path):
        return np.zeros(0, dtype=np.int64)
    return pq.read_table(path)["doc_id"].to_numpy()


def _doc_ceiling(index_dir: str, gens: list[str], docs_per_segment: int) -> int:
    """Smallest segment-aligned doc id above every existing doc id."""
    hi = -1
    for g in gens:
        gdir = os.path.join(index_dir, g)
        for sid in list_segment_ids(gdir):
            hi = max(hi, (sid + 1) * docs_per_segment - 1)
    return ((hi // docs_per_segment) + 1) * docs_per_segment if hi >= 0 else 0


def _fwd_files(gdir: str) -> list[str]:
    fwd = os.path.join(gdir, "fwd")
    if not os.path.isdir(fwd):
        return []
    return [os.path.join(fwd, f) for f in sorted(os.listdir(fwd))
            if f.endswith(".parquet")]


def _find_tombstones(parent_fwd_files: list[str], delta_urls: pa.Array) -> np.ndarray:
    """Doc ids of parent docs whose url reappears in the delta — a
    broadcast-small-side anti-join: the (bounded) delta-url set goes to the
    object store ONCE via ``ray.put``; each map task scans one parent
    forward fragment with ``pc.is_in``. Nothing corpus-sized touches the
    driver (ADVICE r1 / VERDICT next-round #1a)."""
    import ray

    if not parent_fwd_files or len(delta_urls) == 0:
        return np.zeros(0, dtype=np.int64)
    url_ref = ray.put(delta_urls)

    def scan(batch: pa.Table) -> pa.Table:
        vs = ray.get(url_ref)
        outs = []
        for p in batch["path"].to_pylist():
            t = pq.read_table(p, columns=["doc_id", "url"])
            m = pc.is_in(t["url"], value_set=vs)
            outs.append(pa.table({"doc_id": pc.cast(t.filter(m)["doc_id"], pa.int64())}))
        return pa.concat_tables(outs)

    rows = (
        rd.from_items([{"path": p} for p in parent_fwd_files],
                      override_num_blocks=len(parent_fwd_files))
        .map_batches(scan, batch_format="pyarrow")
        .take_all()
    )  # tombstones are bounded by the delta's url count x duplicity — small
    return np.asarray([r["doc_id"] for r in rows], dtype=np.int64)


def add_documents(
    index_dir: str,
    input_paths: str | list[str],
    *,
    work_dir: str | None = None,
    **build_kw,
) -> dict:
    """Build a delta generation from new fragments; tombstone upserted urls."""
    from org_rdkit_lucene_ray.pipelines.build import build_index

    base_gen = current_generation(index_dir)
    if base_gen is None:
        return build_index(input_paths, index_dir, **build_kw)
    base_manifest = read_manifest(index_dir, base_gen)
    cfg = _cfg_from_manifest(base_manifest)
    parents = live_generations(index_dir, base_gen)
    base = _doc_ceiling(index_dir, parents, cfg.docs_per_segment)

    new_gen = gen_name(int(base_gen.split("-")[1]) + 1)
    delta_dir = os.path.join(index_dir, f".delta-{new_gen}")
    manifest = build_index(
        input_paths, delta_dir, cfg=cfg,
        work_dir=work_dir or os.path.join(delta_dir, "work"),
        doc_id_base=base, **build_kw,
    )
    # graft the delta generation dir into the index under its new name
    src = os.path.join(delta_dir, current_generation(delta_dir))
    dst = os.path.join(index_dir, new_gen)
    os.replace(src, dst)

    # delta urls (the SMALL side — bounded by the delta itself)
    url_tabs = [pq.read_table(f, columns=["url"]) for f in _fwd_files(dst)]
    delta_urls = pc.unique(pa.concat_tables(url_tabs)["url"].combine_chunks()) \
        if url_tabs else pa.array([], pa.string())
    parent_fwd = [p for g in parents for p in _fwd_files(os.path.join(index_dir, g))]
    dead = _find_tombstones(parent_fwd, delta_urls)
    prior_dead = read_deletes(index_dir, base_gen)
    all_dead = np.unique(np.concatenate([prior_dead, dead])) \
        if (dead.size or prior_dead.size) else np.zeros(0, np.int64)
    if all_dead.size:
        atomic_write_table(pa.table({"doc_id": pa.array(all_dead, pa.int64())}),
                           os.path.join(dst, "deletes.parquet"))

    # combined stats; like Lucene, df/avgdl still include tombstoned docs
    bs, ds_ = base_manifest["stats"], manifest["stats"]
    combined = {
        "n_docs": bs["n_docs"] + ds_["n_docs"],
        "sum_dl": bs["sum_dl"] + ds_["sum_dl"],
        "n_postings": bs["n_postings"] + ds_["n_postings"],
        "n_deletes": int(all_dead.size),
    }
    combined["avgdl"] = combined["sum_dl"] / combined["n_docs"] if combined["n_docs"] else 0.0
    out = {
        "generation": new_gen,
        "includes": parents + [new_gen],
        "config": base_manifest["config"],
        "stats": {**ds_, **combined},
        "delta_stats": ds_,
        "parent": base_gen,
        "doc_id_base": base,
    }
    atomic_write_json(out, os.path.join(dst, "manifest.json"))
    set_current_generation(index_dir, new_gen)
    import shutil

    shutil.rmtree(delta_dir, ignore_errors=True)
    return out


def delete_by_query(index_dir: str, query: str, *, mode: str = "or") -> dict:
    """Lucene ``IndexWriter.deleteDocuments(Query)`` analog
    (``ChemicalIndex.java:798-853`` deletes by PK term; Lucene's writer
    generalizes to any query): tombstone every current match of ``query``
    in a new **delete-only generation** — a generation with no segments of
    its own (``includes`` = the parent generations' segments, cumulative
    ``deletes.parquet`` alongside).

    Immutable-generation semantics are preserved: readers on the old
    CURRENT never observe a half-applied delete, the swap is one rename,
    and concurrent :func:`add_documents` / :func:`merge_generations` chain
    off the new generation exactly as they do off a delta. Like Lucene,
    deleted docs still count in df/avgdl until a merge physically drops
    them.

    ``mode``: ``"or"`` | ``"and"`` (term sets), ``"boolean"``
    (+MUST/-MUST_NOT grammar), ``"parser"`` (full query-string grammar) —
    the same search surfaces, so anything findable is deletable.
    """
    from org_rdkit_lucene_ray.pipelines.query import Searcher

    base_gen = current_generation(index_dir)
    if base_gen is None:
        raise ValueError(f"{index_dir} has no CURRENT generation to delete from")
    manifest = read_manifest(index_dir, base_gen)
    s = Searcher(index_dir)          # opens base_gen; validates format
    if mode == "or":
        hits = s.search_or(query)
    elif mode == "and":
        hits = s.search_and(query)
    elif mode == "boolean":
        hits = s.search_boolean(query)
    elif mode == "parser":
        hits = s.search_query(query)
    else:
        raise ValueError(f"unknown delete_by_query mode {mode!r} "
                         "(expected or|and|boolean|parser)")
    hits = np.asarray(hits, dtype=np.int64)
    prior = read_deletes(index_dir, base_gen)
    all_dead = np.unique(np.concatenate([prior, hits])) \
        if (hits.size or prior.size) else np.zeros(0, np.int64)

    new_gen = gen_name(int(base_gen.split("-")[1]) + 1)
    gdir = os.path.join(index_dir, new_gen)
    os.makedirs(gdir, exist_ok=True)
    if all_dead.size:
        atomic_write_table(pa.table({"doc_id": pa.array(all_dead, pa.int64())}),
                           os.path.join(gdir, "deletes.parquet"))
    parents = live_generations(index_dir, base_gen)
    out = {
        "generation": new_gen,
        "includes": parents,         # delete-only: no segments of its own
        "config": manifest["config"],
        "stats": {**manifest["stats"], "n_deletes": int(all_dead.size)},
        "parent": base_gen,
        "n_new_deletes": int(hits.size),
    }
    atomic_write_json(out, os.path.join(gdir, "manifest.json"))
    set_current_generation(index_dir, new_gen)
    return out


# --------------------------------------------------------------------- merge
def _decode_chunk_flat(t: pa.Table) -> tuple[pa.Array, np.ndarray, np.ndarray,
                                             np.ndarray, np.ndarray]:
    """One chunk table -> (terms, counts, docs, tfs, dls), fully vectorized.

    The binary columns' data buffers ARE the concatenation of the per-term
    varint streams (LEB128 is self-delimiting), so the whole column decodes
    in ONE :func:`varint_decode` call; per-term doc-id cumsums are recovered
    from the global cumsum by subtracting the run-start offsets (delta
    encoding resets at each term start). No per-term Python loop."""
    counts = t["df_chunk"].to_numpy().astype(np.int64)
    total = int(counts.sum())
    bounds = np.concatenate([[0], np.cumsum(counts)])

    def col_stream(name: str) -> np.ndarray:
        arr = t[name].combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], np.int32)[arr.offset: arr.offset + len(arr) + 1]
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        return varint_decode(data[offs[0]:offs[-1]], total)

    deltas = col_stream("doc_bytes")
    G = np.cumsum(deltas.astype(np.int64))
    run_base = np.concatenate([[0], G[bounds[1:-1] - 1]]) if len(counts) > 1 \
        else np.zeros(1, np.int64)
    docs = G - np.repeat(run_base, counts)
    tfs = col_stream("tf_bytes").view(np.int64)
    dls = col_stream("dl_bytes").view(np.int64)
    return t["term"].combine_chunks(), counts, docs, tfs, dls


def _reencode_chunk(src_path: str, out_path: str, deletes: np.ndarray,
                    cfg: IndexConfig, avgdl: float) -> dict | None:
    """Decode one chunk file, drop tombstoned postings, re-encode with the
    recomputed avgdl (vectorized across ALL terms via encode_posting_block)
    and write atomically. Returns the chunk stats row, or None if every
    posting was deleted."""
    from org_rdkit_lucene_ray.functions.codec import (
        decode_position_streams,
        encode_position_streams,
    )
    from org_rdkit_lucene_ray.pipelines.build import _binary_from_offsets

    from org_rdkit_lucene_ray.state.segment import (
        atomic_write_chunk,
        read_chunk_table,
    )

    t = read_chunk_table(src_path)
    terms, counts, docs, tfs, dls = _decode_chunk_flat(t)
    # positional sidecar (store_positions layouts): null term streams are
    # fielded terms (no positions); valid streams hold one delta+varint run
    # per posting (run i length = tf_i), concatenated in posting order, so
    # the whole chunk's positions decode in ONE call over the valid
    # postings' tf counts (null streams contribute zero bytes in between).
    has_pos = "pos_bytes" in t.column_names
    pos_flat = posting_valid = valid_term = None
    if has_pos:
        parr = t["pos_bytes"].combine_chunks()
        valid_term = ~np.asarray(pc.is_null(parr))
        posting_valid = np.repeat(valid_term, counts)
        filled = pc.fill_null(parr, b"")
        offs = np.frombuffer(filled.buffers()[1], np.int32)[
            filled.offset: filled.offset + len(filled) + 1]
        data = np.frombuffer(filled.buffers()[2] or b"", np.uint8)
        pos_flat = decode_position_streams(
            data[offs[0]:offs[-1]], tfs[posting_valid])
    if deletes.size:
        keep = ~np.isin(docs, deletes)
        if not keep.all():
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            new_counts = np.add.reduceat(keep.astype(np.int64), starts)
            # reduceat on an empty run start would misbehave, but counts>0
            # always (chunk rows never hold empty posting lists)
            if has_pos:
                flat_keep = np.repeat(keep[posting_valid], tfs[posting_valid])
                pos_flat = pos_flat[flat_keep]
                posting_valid = posting_valid[keep]
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
            alive = new_counts > 0
            terms = terms.filter(pa.array(alive))
            counts = new_counts[alive]
    if docs.size == 0:
        return None
    term_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    enc = encode_posting_block(docs, tfs, dls, term_starts, avgdl=avgdl,
                               bm25=cfg.bm25, block_size=cfg.block_size)
    boff = pa.array(enc["block_offsets"].astype(np.int32), pa.int32())
    cols = {
        "term": terms.cast(pa.string()),
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
    if has_pos:
        v_tfs = tfs[posting_valid]
        v_starts = np.concatenate([[0], np.cumsum(v_tfs)[:-1]]).astype(np.int64)
        buf, p_offs = encode_position_streams(pos_flat, v_starts)
        # posting index -> count of valid postings before it -> byte offset
        vcum = np.concatenate([[0], np.cumsum(posting_valid)])
        term_bounds = np.concatenate([term_starts, [docs.size]])
        term_offs = p_offs[vcum[term_bounds]].astype(np.int64)
        lengths = np.diff(term_offs)
        validity = np.packbits((lengths > 0).astype(np.uint8),
                               bitorder="little")
        cols["pos_bytes"] = pa.Array.from_buffers(
            pa.large_binary(), int(counts.size),
            [pa.py_buffer(validity.tobytes()),
             pa.py_buffer(term_offs.tobytes()),
             pa.py_buffer(buf)],
            null_count=int((lengths == 0).sum())).cast(pa.binary())
        schema = SEGMENT_SCHEMA_POS
    chunk = pa.table(cols).cast(schema)
    nbytes = atomic_write_chunk(chunk, out_path, row_group_size=8192)
    return {"terms": chunk.num_rows, "postings": int(docs.size),
            "bytes_compressed": int(nbytes)}


def merge_generations(index_dir: str, *, concurrency: int | None = None) -> dict:
    """Compact all live generations into one fresh generation — NO shuffle.

    Segment doc-id ranges are disjoint across generations (delta doc ids
    start at the parent ceiling), so each ``(segment, bucket)`` chunk file
    is self-contained: the merge is one map task per chunk file and one per
    forward fragment. Two waves (fwd first, because re-encode needs the
    recomputed post-tombstone avgdl), both resumable by skip-if-exists:

    1. fwd rewrite: filter tombstones per fragment -> new generation's fwd
       dir; per-task (n_docs, sum_dl) partials -> exact global avgdl;
    2. chunk re-encode: decode -> drop tombstones -> vectorized
       ``encode_posting_block`` with the new avgdl -> atomic write.

    Replaces the r1 design (driver-side fwd rewrite + Ray groupby over
    decoded flat postings + per-term re-encode loop) per VERDICT #1.
    """
    import ray

    base_gen = current_generation(index_dir)
    manifest = read_manifest(index_dir, base_gen)
    cfg = _cfg_from_manifest(manifest)
    gens = live_generations(index_dir, base_gen)
    deletes = np.sort(read_deletes(index_dir, base_gen))

    new_gen = gen_name(int(base_gen.split("-")[1]) + 1)
    gdir = os.path.join(index_dir, new_gen)
    new_fwd = os.path.join(gdir, "fwd")
    os.makedirs(new_fwd, exist_ok=True)
    t0 = time.perf_counter()
    del_ref = ray.put(deletes)

    # -- wave 1: forward-index rewrite (map task per fragment file)
    fwd_items = [
        {"src": p, "out": os.path.join(new_fwd, f"frag-{i:06d}.parquet")}
        for i, p in enumerate(
            p for g in gens for p in _fwd_files(os.path.join(index_dir, g)))
    ]

    def rewrite_fwd(batch: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.state.bloom import attach_url_bloom

        dels = ray.get(del_ref)
        out = []
        for src, dst in zip(batch["src"].to_pylist(), batch["out"].to_pylist()):
            if os.path.exists(dst):                      # resumed merge
                t = pq.read_table(dst, columns=["dl"])
                out.append({"n_docs": t.num_rows,
                            "sum_dl": int(pc.sum(t["dl"]).as_py() or 0)})
                continue
            t = pq.read_table(src)
            if dels.size:
                keep = ~np.isin(t["doc_id"].to_numpy(), dels)
                t = t.filter(pa.array(keep))
            if t.num_rows:
                # re-derive the url bloom for the post-tombstone url set
                atomic_write_table(attach_url_bloom(t), dst)
            out.append({"n_docs": t.num_rows,
                        "sum_dl": int(pc.sum(t["dl"]).as_py() or 0)})
        return pa.Table.from_pylist(out, schema=pa.schema(
            [("n_docs", pa.int64()), ("sum_dl", pa.int64())]))

    fwd_rows = rd.from_items(fwd_items, override_num_blocks=max(1, len(fwd_items))) \
        .map_batches(rewrite_fwd, batch_format="pyarrow").take_all()
    n_docs = sum(r["n_docs"] for r in fwd_rows)
    sum_dl = sum(r["sum_dl"] for r in fwd_rows)
    avgdl = sum_dl / n_docs if n_docs else 0.0
    t_fwd = time.perf_counter()

    # -- wave 2: chunk re-encode (map task per chunk file; no shuffle)
    chunk_items = []
    for g in gens:
        src_dir = os.path.join(index_dir, g)
        for sid in list_segment_ids(src_dir):
            for f in list_chunk_files(src_dir, sid):
                from org_rdkit_lucene_ray.state.segment import chunk_bucket_of

                chunk_items.append({"src": f, "sid": sid,
                                    "bucket": chunk_bucket_of(f)})

    def reencode(batch: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.pipelines.build import _pin_arrow_threads

        _pin_arrow_threads()
        dels = ray.get(del_ref)
        out = []
        for row in batch.to_pylist():
            from org_rdkit_lucene_ray.state.segment import read_chunk_table

            sid, bucket = int(row["sid"]), int(row["bucket"])
            dst = segment_chunk_path(gdir, sid, bucket, cfg.chunk_format)
            if os.path.exists(dst):                      # resumed merge
                dtab = read_chunk_table(dst, columns=["df_chunk"])
                out.append({"segment_id": sid, "bucket": bucket,
                            "terms": dtab.num_rows,
                            "postings": int(pc.sum(dtab["df_chunk"]).as_py() or 0),
                            "bytes_compressed": os.path.getsize(dst)})
                continue
            stats = _reencode_chunk(row["src"], dst, dels, cfg, avgdl)
            if stats is not None:
                out.append({"segment_id": sid, "bucket": bucket, **stats})
        schema = pa.schema([
            ("segment_id", pa.int32()), ("bucket", pa.int32()),
            ("terms", pa.int64()), ("postings", pa.int64()),
            ("bytes_compressed", pa.int64())])
        return pa.Table.from_pylist(out, schema=schema)

    chunk_rows = rd.from_items(chunk_items, override_num_blocks=max(1, len(chunk_items))) \
        .map_batches(reencode, batch_format="pyarrow", batch_size=4).take_all()
    t_enc = time.perf_counter()

    from org_rdkit_lucene_ray.pipelines.build import build_df_table

    n_terms = build_df_table(gdir)
    out = {
        "generation": new_gen,
        "includes": [new_gen],
        "config": manifest["config"],
        "stats": {
            "n_docs": n_docs,
            "sum_dl": sum_dl,
            "avgdl": avgdl,
            "n_postings": sum(r["postings"] for r in chunk_rows),
            "n_terms": n_terms,
            "n_segments": len({r["segment_id"] for r in chunk_rows}),
            "bytes_compressed": sum(r["bytes_compressed"] for r in chunk_rows),
            "n_deletes": 0,
            "merged_from": gens,
        },
        "timings_sec": {
            "fwd_rewrite": t_fwd - t0,
            "chunk_reencode": t_enc - t_fwd,
            "df_table": time.perf_counter() - t_enc,
            "total": time.perf_counter() - t0,
        },
        "chunks": chunk_rows,
    }
    atomic_write_json(out, os.path.join(gdir, "manifest.json"))
    set_current_generation(index_dir, new_gen)
    return out

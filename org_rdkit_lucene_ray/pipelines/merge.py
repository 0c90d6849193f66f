"""Incremental adds + log-structured segment merges.

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
  until a merge physically drops them.
- :func:`merge_generations` k-way-merges all live generations into one
  fresh generation: decode chunk rows -> drop tombstoned postings ->
  re-encode (delta+varint + block-max recomputed) -> exact recomputed
  corpus stats. Doc ids are preserved (stable external references; Lucene
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
from org_rdkit_lucene_ray.functions.codec import encode_posting_list, varint_decode
from org_rdkit_lucene_ray.state.segment import (
    SEGMENT_SCHEMA,
    atomic_write_json,
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
        sub_salt=c.get("sub_salt", 1),
        field_columns=tuple(c.get("field_columns", ())),
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

    # tombstones: every OLD doc whose url reappears in the delta (last write
    # wins). Broadcast-small-side: delta urls -> pushdown scan of parent fwd.
    new_urls = set()
    for f in sorted(os.listdir(os.path.join(dst, "fwd"))):
        if f.endswith(".parquet"):
            new_urls.update(pq.read_table(
                os.path.join(dst, "fwd", f), columns=["url"])["url"].to_pylist())
    dead: list[int] = []
    for g in parents:
        fwd = os.path.join(index_dir, g, "fwd")
        for f in sorted(os.listdir(fwd)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(fwd, f), columns=["doc_id", "url"])
            m = pc.is_in(t["url"], value_set=pa.array(sorted(new_urls), pa.string()))
            dead.extend(t.filter(m)["doc_id"].to_pylist())
    prior_dead = read_deletes(index_dir, base_gen)
    all_dead = np.unique(np.concatenate([prior_dead, np.asarray(dead, np.int64)])) \
        if (len(dead) or prior_dead.size) else np.zeros(0, np.int64)
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


# --------------------------------------------------------------------- merge
class _MergeEncode:
    """Re-encode one (segment_id, bucket) group of decoded postings."""

    def __init__(self, gdir: str, cfg: IndexConfig, avgdl: float):
        self.gdir = gdir
        self.cfg = cfg
        self.avgdl = avgdl

    def __call__(self, group: pa.Table) -> pa.Table:
        sid = int(group["segment_id"][0].as_py())
        bucket = int(group["bucket"][0].as_py())
        order = pc.sort_indices(group, sort_keys=[("term", "ascending"),
                                                  ("doc_id", "ascending")])
        g = group.take(order)
        terms = np.asarray(g["term"].to_pylist(), dtype=object)
        docs = g["doc_id"].to_numpy()
        tfs = g["tf"].to_numpy()
        dls = g["dl"].to_numpy()
        uniq, starts = np.unique(terms, return_index=True)
        starts = np.sort(starts)
        bounds = np.concatenate([starts, [len(terms)]])
        rows = {k: [] for k in ("term", "df_chunk", "doc_bytes", "tf_bytes",
                                "dl_bytes", "bm_first_doc", "bm_last_doc",
                                "bm_max_tfn")}
        for i in range(len(starts)):
            s, e = bounds[i], bounds[i + 1]
            enc = encode_posting_list(
                docs[s:e], tfs[s:e], dls[s:e], avgdl=self.avgdl,
                bm25=self.cfg.bm25, block_size=self.cfg.block_size)
            rows["term"].append(terms[s])
            for k in ("df_chunk", "doc_bytes", "tf_bytes", "dl_bytes",
                      "bm_first_doc", "bm_last_doc", "bm_max_tfn"):
                rows[k].append(enc[k])
        chunk = pa.table({
            "term": pa.array(rows["term"], pa.string()),
            "df_chunk": pa.array(rows["df_chunk"], pa.int32()),
            "doc_bytes": pa.array(rows["doc_bytes"], pa.binary()),
            "tf_bytes": pa.array(rows["tf_bytes"], pa.binary()),
            "dl_bytes": pa.array(rows["dl_bytes"], pa.binary()),
            "bm_first_doc": pa.array([np.asarray(x) for x in rows["bm_first_doc"]], pa.list_(pa.int64())),
            "bm_last_doc": pa.array([np.asarray(x) for x in rows["bm_last_doc"]], pa.list_(pa.int64())),
            "bm_max_tfn": pa.array([np.asarray(x) for x in rows["bm_max_tfn"]], pa.list_(pa.float32())),
        }).cast(SEGMENT_SCHEMA)
        nbytes = atomic_write_table(chunk, segment_chunk_path(self.gdir, sid, bucket),
                                    row_group_size=8192)
        return pa.table({
            "segment_id": pa.array([sid], pa.int32()),
            "bucket": pa.array([bucket], pa.int32()),
            "terms": pa.array([chunk.num_rows], pa.int64()),
            "postings": pa.array([int(docs.size)], pa.int64()),
            "bytes_compressed": pa.array([nbytes], pa.int64()),
        })


def _decode_chunk_batch(batch: pa.Table, deletes: np.ndarray) -> pa.Table:
    """Chunk rows -> flat postings (term, doc_id, tf, dl), tombstones dropped."""
    out_t, out_d, out_tf, out_dl = [], [], [], []
    for i in range(batch.num_rows):
        n = batch["df_chunk"][i].as_py()
        deltas = varint_decode(np.frombuffer(batch["doc_bytes"][i].as_buffer(), np.uint8), n)
        docs = np.cumsum(deltas.astype(np.int64))
        tfs = varint_decode(np.frombuffer(batch["tf_bytes"][i].as_buffer(), np.uint8), n).astype(np.int64)
        dls = varint_decode(np.frombuffer(batch["dl_bytes"][i].as_buffer(), np.uint8), n).astype(np.int64)
        if deletes.size:
            keep = ~np.isin(docs, deletes)
            docs, tfs, dls = docs[keep], tfs[keep], dls[keep]
        if docs.size == 0:
            continue
        out_t.append(np.full(docs.size, batch["term"][i].as_py(), dtype=object))
        out_d.append(docs)
        out_tf.append(tfs)
        out_dl.append(dls)
    if not out_d:
        return pa.table({"term": pa.array([], pa.string()),
                         "doc_id": pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int32()),
                         "dl": pa.array([], pa.int32())})
    return pa.table({
        "term": pa.array(np.concatenate(out_t), pa.string()),
        "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
        "tf": pa.array(np.concatenate(out_tf).astype(np.int32), pa.int32()),
        "dl": pa.array(np.concatenate(out_dl).astype(np.int32), pa.int32()),
    })


def merge_generations(index_dir: str, *, concurrency: int | None = None) -> dict:
    """K-way merge of all live generations into one fresh generation.

    Shape: Dataset of chunk files -> decode+tombstone-filter map_batches ->
    groupby(segment_id, bucket) -> re-encode -> new generation + exact stats.
    Doc-id ranges of different source segments are disjoint, so the groupby
    simply co-locates same-term chunks; sorted order is restored per group.
    """
    import ray

    base_gen = current_generation(index_dir)
    manifest = read_manifest(index_dir, base_gen)
    cfg = _cfg_from_manifest(manifest)
    gens = live_generations(index_dir, base_gen)
    deletes = read_deletes(index_dir, base_gen)

    new_gen = gen_name(int(base_gen.split("-")[1]) + 1)
    gdir = os.path.join(index_dir, new_gen)
    os.makedirs(gdir, exist_ok=True)
    t0 = time.perf_counter()

    chunk_files = []
    for g in gens:
        src = os.path.join(index_dir, g)
        for sid in list_segment_ids(src):
            chunk_files.extend(list_chunk_files(src, sid))
    del_ref = ray.put(deletes)

    B = cfg.docs_per_segment
    TB = cfg.term_buckets

    def decode_file(batch: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

        dels = ray.get(del_ref)
        outs = []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path)
            flat = _decode_chunk_batch(t, dels)
            if flat.num_rows == 0:
                continue
            seg = pa.array((flat["doc_id"].to_numpy() // B).astype(np.int32))
            bucket = pa.array((stable_term_hash(flat["term"]) % TB).astype(np.int32))
            outs.append(flat.append_column("segment_id", seg)
                            .append_column("bucket", bucket))
        if not outs:
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int32()),
                             "dl": pa.array([], pa.int32()),
                             "segment_id": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int32())})
        return pa.concat_tables(outs)

    files_ds = rd.from_items([{"path": p} for p in chunk_files],
                             override_num_blocks=max(1, len(chunk_files)))
    flat = files_ds.map_batches(decode_file, batch_format="pyarrow")

    # exact post-merge stats from the surviving forward index
    fwd_tabs = []
    new_fwd = os.path.join(gdir, "fwd")
    os.makedirs(new_fwd, exist_ok=True)
    n_docs = 0
    sum_dl = 0
    fi = 0
    for g in gens:
        fwd = os.path.join(index_dir, g, "fwd")
        for f in sorted(os.listdir(fwd)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(fwd, f))
            if deletes.size:
                keep = ~np.isin(t["doc_id"].to_numpy(), deletes)
                t = t.filter(pa.array(keep))
            if t.num_rows:
                atomic_write_table(t, os.path.join(new_fwd, f"frag-{fi:06d}.parquet"))
                n_docs += t.num_rows
                sum_dl += int(pc.sum(t["dl"]).as_py() or 0)
                fi += 1
    avgdl = sum_dl / n_docs if n_docs else 0.0

    enc = _MergeEncode(gdir, cfg, avgdl)
    chunk_rows = (
        flat.groupby(["segment_id", "bucket"])
        .map_groups(lambda g: enc(g), batch_format="pyarrow")
    ).take_all()

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
        "timings_sec": {"total": time.perf_counter() - t0},
        "chunks": chunk_rows,
    }
    atomic_write_json(out, os.path.join(gdir, "manifest.json"))
    set_current_generation(index_dir, new_gen)
    return out

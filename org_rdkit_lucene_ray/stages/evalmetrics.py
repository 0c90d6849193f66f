"""Retrieval-evaluation metrics: ranked results × relevance judgments.

The TREC-style eval harness (Buckley & Voorhees 2000) a search engine
ships alongside its scorer: given a ranked top-k result set and a qrels
relation of (query, relevant doc) pairs, emit per-query precision /
reciprocal-rank statistics. The reference repo evaluates by timing and
hit counts only (`LuceneBenchmark.java` CSVs); a trainable-retrieval
pipeline needs graded relevance metrics, so this is a
beyond-the-reference component like the dedup/curation stages.

Shape: the ranked results are tiny (queries × k rows) and BROADCAST
sorted; the qrels side — potentially one row per (query, relevant doc)
over the whole corpus — STREAMS through one ``map_batches`` pass whose
partials are per-query relevant counts plus the result slots that
matched (≤ |results| rows per batch, usually far fewer). The driver
fold is over partial rows, never qrels rows. Everything stays in the
integer domain except ``rr`` (one IEEE division — bit-identical in
DuckDB, so the gate hashes exactly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def _void16(d: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(d).view(np.dtype((np.void, 16))).ravel()


def retrieval_metrics(results: pa.Table, qrels: rd.Dataset, *,
                      query_col: str = "query_id", doc_col: str = "doc_id",
                      rank_col: str = "rank",
                      query_ids: list[int] | None = None) -> pa.Table:
    """Per-query metrics of a ranked result table against a relevance
    Dataset: ``(query_id, n_rel, n_rel_topk, first_rel_rank, rr)``.

    - ``results``: (query_id, rank [0-based], doc_id) — the top-k table
      the searcher emits; (query, doc) pairs must be unique.
    - ``qrels``: Dataset of RELEVANT (query_id, doc_id) rows (binary
      relevance; graded judgments reduce to this per threshold).
      Duplicate pairs within a block are deduped in the partial;
      pairs duplicated ACROSS blocks must be removed upstream (TREC
      qrels are distinct by construction — run them through
      ``stages.dedup.exact_dedup`` first if provenance is unclear).
    - ``query_ids``: the query universe — pass explicitly so queries
      with zero result rows (no matching terms) still get a metrics row.

    ``first_rel_rank`` is 1-based, 0 when no relevant doc was retrieved;
    ``rr`` = 1/first_rel_rank (0.0 when none) — the per-query MRR term.
    ``n_rel_topk`` is the precision@k numerator.
    """
    rq = results[query_col].to_numpy().astype(np.int64)
    rd_ = results[doc_col].to_numpy().astype(np.int64)
    rr_ = results[rank_col].to_numpy().astype(np.int64)
    qids = sorted(set(int(x) for x in (query_ids if query_ids is not None
                                       else rq)))
    pairs = _void16(np.stack([rq, rd_], axis=1))
    order = np.argsort(pairs)
    sorted_pairs = pairs[order]
    slot_rank = rr_[order]                 # rank of each sorted slot
    slot_qid = rq[order]
    ref = ray.put({"pairs": sorted_pairs, "qids": np.array(qids, np.int64)})

    def partial(t: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.stages.dedup import _bcast

        st = _bcast(ref)
        q = t[query_col].to_numpy().astype(np.int64)
        d = t[doc_col].to_numpy().astype(np.int64)
        # Dedup (query, doc) pairs WITHIN the block so repeated qrels
        # rows don't inflate n_rel while hit slots stay set-deduped.
        # Cross-block duplicates must be removed upstream (see docstring).
        keys, kidx = np.unique(_void16(np.stack([q, d], axis=1)),
                               return_index=True)
        q, d = q[kidx], d[kidx]
        # per-query relevant-count partials (qid rows, slot = -1)
        uq, cnt = np.unique(q, return_counts=True)
        # which broadcast result slots this batch's qrels hit
        loc = np.searchsorted(st["pairs"], keys)
        loc_c = np.minimum(loc, max(st["pairs"].size - 1, 0))
        hit = (st["pairs"].size > 0) & (st["pairs"][loc_c] == keys)
        slots = np.unique(loc_c[hit])
        return pa.table({
            "qid": pa.array(np.concatenate([uq, np.full(slots.size, -1)]),
                            pa.int64()),
            "slot": pa.array(np.concatenate(
                [np.full(uq.size, -1), slots]), pa.int64()),
            "n": pa.array(np.concatenate(
                [cnt.astype(np.int64), np.ones(slots.size, np.int64)]),
                pa.int64()),
        })

    rows = qrels.map_batches(partial, batch_format="pyarrow").take_all()
    n_rel = {q: 0 for q in qids}
    hit_slots: set[int] = set()
    for r in rows:
        if r["slot"] < 0:
            if r["qid"] in n_rel:
                n_rel[r["qid"]] += r["n"]
        else:
            hit_slots.add(r["slot"])
    n_topk = {q: 0 for q in qids}
    first = {q: 0 for q in qids}
    for s in hit_slots:
        q = int(slot_qid[s])
        n_topk[q] += 1
        rk = int(slot_rank[s]) + 1         # 1-based
        if first[q] == 0 or rk < first[q]:
            first[q] = rk
    return pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "n_rel": pa.array([n_rel[q] for q in qids], pa.int64()),
        "n_rel_topk": pa.array([n_topk[q] for q in qids], pa.int64()),
        "first_rel_rank": pa.array([first[q] for q in qids], pa.int64()),
        "rr": pa.array([1.0 / first[q] if first[q] else 0.0 for q in qids],
                       pa.float64()),
    })


def hard_negatives(results: pa.Table, qrels: rd.Dataset, *,
                   n_per_query: int, query_col: str = "query_id",
                   doc_col: str = "doc_id",
                   rank_col: str = "rank") -> pa.Table:
    """Hard-negative mining for retrieval training (the DPR / sentence-
    transformers recipe, Karpukhin et al. 2020 §3.2: the highest-ranked
    NON-relevant retrieved docs are the hardest negatives): per query,
    the first ``n_per_query`` result docs absent from qrels, re-ranked
    densely (``neg_rank`` 0-based) in retrieval order.

    Same scale shape as :func:`retrieval_metrics`: the ranked results
    broadcast sorted; qrels STREAM through one ``map_batches`` pass whose
    partials are only the result slots that matched (bounded by
    |results|, never qrels volume)."""
    rq = results[query_col].to_numpy().astype(np.int64)
    rd_ = results[doc_col].to_numpy().astype(np.int64)
    rr_ = results[rank_col].to_numpy().astype(np.int64)
    pairs = _void16(np.stack([rq, rd_], axis=1))
    order = np.argsort(pairs)
    sorted_pairs = pairs[order]
    ref = ray.put(sorted_pairs)

    def slot_hits(t: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.stages.dedup import _bcast

        sp = _bcast(ref)
        if sp.size == 0:          # no results at all -> no slot can match
            return pa.table({"slot": pa.array([], pa.int64())})
        q = t[query_col].to_numpy().astype(np.int64)
        d = t[doc_col].to_numpy().astype(np.int64)
        keys = _void16(np.stack([q, d], axis=1))
        loc = np.searchsorted(sp, keys)
        loc_c = np.minimum(loc, sp.size - 1)
        hit = sp[loc_c] == keys
        return pa.table({"slot": pa.array(np.unique(loc_c[hit]), pa.int64())})

    hit_rows = qrels.map_batches(slot_hits, batch_format="pyarrow").take_all()
    rel_slots = np.zeros(len(results), bool)
    for r in hit_rows:
        rel_slots[r["slot"]] = True
    # back to original row order; keep non-relevant, densify per query
    rel_orig = np.zeros(len(results), bool)
    rel_orig[order] = rel_slots
    keep = ~rel_orig
    kq, kd, kr = rq[keep], rd_[keep], rr_[keep]
    by = np.lexsort((kr, kq))
    kq, kd = kq[by], kd[by]
    starts = np.concatenate([[True], kq[1:] != kq[:-1]]) if kq.size else \
        np.zeros(0, bool)
    seg_first = np.flatnonzero(starts)
    seg_id = np.cumsum(starts) - 1
    neg_rank = np.arange(kq.size) - seg_first[seg_id] if kq.size else kq
    m = neg_rank < n_per_query
    return pa.table({
        "query_id": pa.array(kq[m], pa.int64()),
        "neg_rank": pa.array(neg_rank[m], pa.int64()),
        "doc_id": pa.array(kd[m], pa.int64()),
    })

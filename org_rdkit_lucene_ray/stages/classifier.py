"""fastText-shaped linear text-classifier inference (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification"): a document's score is
the MEAN of its tokens' learned weights — the 1-D analog of fastText's
averaged bag-of-words embedding feeding a linear layer. This is the
CCNet / DCLM-style learned quality-classifier filter stage: score every
doc, keep ``score >= threshold``.

Distribution shape (the 100-TB contract):
- the weight table is the MODEL: ``ray.put`` once, fetched once per task
  process, never re-shipped per batch;
- vocabulary lookup is fastText-faithful token HASHING — tokens and vocab
  are both hashed with the index's ``stable_term_hash`` (FNV-1a) and
  matched by one vectorized ``searchsorted`` per batch against the
  hash-sorted vocab (the broadcast-sorted membership pattern of
  :mod:`stages.decontaminate`); out-of-vocabulary tokens weigh 0;
- scoring is one ``np.add.reduceat`` per batch — no per-row loop, nothing
  rides a shuffle (embarrassingly parallel map).

Float contract: with weights that are exact multiples of 2^-k (the gate
uses halves) the per-doc sum is EXACT in float64 regardless of
summation order, so ``sum/n`` is bit-comparable against a SQL oracle.
Arbitrary learned weights stay deterministic per doc (ascending token
position order) but are then only rank-comparable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from org_rdkit_lucene_ray.functions.analyze import REGISTRY, tokenize_column


def sorted_model_arrays(weights: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(hash-sorted vocab hashes, matching weights) ready to broadcast.
    Raises on a vocabulary hash collision (two terms, one FNV-1a bucket)
    — at real vocab sizes (~10^6) the 64-bit odds are ~10^-7, and
    fastText itself buckets by hash."""
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

    vh = stable_term_hash(weights["term"].combine_chunks())
    order = np.argsort(vh)
    vh = vh[order]
    if vh.size and (vh[1:] == vh[:-1]).any():
        raise ValueError("vocabulary hash collision in weight table")
    return vh, weights["weight"].to_numpy().astype(np.float64)[order]


def score_tokens(toks, h_sorted: np.ndarray,
                 w_sorted: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(mean token weight, token count) per row of a tokenized list
    column. Rows with zero tokens score 0 (callers decide their fate via
    the count). One searchsorted + one reduceat — no per-row loop."""
    import pyarrow.compute as pc

    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

    counts = pc.list_value_length(toks) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    fh = stable_term_hash(flat) if len(flat) else np.zeros(0, np.uint64)
    if h_sorted.size and fh.size:
        idx = np.clip(np.searchsorted(h_sorted, fh), 0, h_sorted.size - 1)
        w = np.where(h_sorted[idx] == fh, w_sorted[idx], 0.0)
    else:
        w = np.zeros(fh.size, np.float64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    nz = counts > 0
    sums = np.zeros(counts.size, np.float64)
    if w.size and nz.any():
        sums[nz] = np.add.reduceat(w, starts[nz])
    score = np.divide(sums, counts, out=np.zeros(counts.size, np.float64),
                      where=nz)
    return score, counts


def linear_classifier_scores(
    docs: rd.Dataset,
    weights: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.0,
    analyzer: str = "standard",
) -> rd.Dataset:
    """-> (doc_id, n_tokens, score, keep) for every doc with >= 1 token.

    ``weights`` is a (term:string, weight:float64) model table.
    """
    cfg = REGISTRY[analyzer]
    model = ray.put(sorted_model_arrays(weights))
    thr = float(threshold)

    def score_batch(t: pa.Table) -> pa.Table:
        h_sorted, w_sorted = ray.get(model)
        toks = tokenize_column(t[text_col].combine_chunks(), cfg)
        score, counts = score_tokens(toks, h_sorted, w_sorted)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep_rows = counts > 0
        return pa.table({
            "doc_id": pa.array(ids[keep_rows], pa.int64()),
            "n_tokens": pa.array(counts[keep_rows], pa.int64()),
            "score": pa.array(score[keep_rows], pa.float64()),
            "keep": pa.array((score[keep_rows] >= thr).astype(np.int64),
                             pa.int64()),
        })

    return docs.map_batches(score_batch, batch_format="pyarrow")

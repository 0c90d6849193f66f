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

    ``weights`` is a (term:string, weight:float64) model table. Hash
    collisions (two vocab terms on one FNV-1a bucket) raise — at real
    vocab sizes (~10^6) the 64-bit collision odds are ~10^-7, and
    fastText itself buckets by hash.
    """
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

    cfg = REGISTRY[analyzer]
    vh = stable_term_hash(weights["term"].combine_chunks())
    order = np.argsort(vh)
    vh = vh[order]
    if vh.size and (vh[1:] == vh[:-1]).any():
        raise ValueError("vocabulary hash collision in weight table")
    vw = weights["weight"].to_numpy().astype(np.float64)[order]
    model = ray.put((vh, vw))
    thr = float(threshold)

    def score_batch(t: pa.Table) -> pa.Table:
        h_sorted, w_sorted = ray.get(model)
        toks = tokenize_column(t[text_col].combine_chunks(), cfg)
        counts = pa.compute.list_value_length(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pa.compute.list_flatten(toks)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep_rows = counts > 0
        if not keep_rows.any():
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "keep": pa.array([], pa.int64()),
            })
        fh = stable_term_hash(flat) if len(flat) else np.zeros(0, np.uint64)
        idx = np.searchsorted(h_sorted, fh)
        np.clip(idx, 0, max(h_sorted.size - 1, 0), out=idx)
        found = h_sorted.size > 0
        w = np.where(found & (h_sorted[idx] == fh), w_sorted[idx], 0.0) \
            if h_sorted.size else np.zeros(fh.size, np.float64)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])[keep_rows]
        sums = np.add.reduceat(w, starts) if w.size else np.zeros(0)
        n = counts[keep_rows]
        score = sums / n
        return pa.table({
            "doc_id": pa.array(ids[keep_rows], pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "score": pa.array(score, pa.float64()),
            "keep": pa.array((score >= thr).astype(np.int64), pa.int64()),
        })

    return docs.map_batches(score_batch, batch_format="pyarrow")

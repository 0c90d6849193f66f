"""Deterministic stratified sampling — training-mix construction.

LLM corpora are mixed by per-source / per-language sampling weights (C4's
language splits, The Pile's per-subset epochs). The operator here is the
distributed primitive both need: keep each row with a per-stratum
probability, decided by a DETERMINISTIC hash of the row's primary key so

- the sample is reproducible across runs, partitionings and cluster sizes
  (no RNG state, no per-worker seeds),
- membership can be re-derived row-locally (a resumed / re-run job keeps
  the same docs without any saved state),
- an ANSI-SQL oracle can compute the identical sample.

Keep rule: ``mix32(pk, seed) < floor(rate * 2^32)`` where ``mix32`` is a
Knuth multiplicative hash reduced mod 2^32. All arithmetic stays within
int64 (pk folded mod 2^31 first) so numpy and SQL BIGINT agree bit-exactly
— the threshold compare is integer-only, no float in the decision path.

Reference analog: the benchmark harness's seeded random task-order shuffle
(K4, ``LuceneBenchmark.java:418``) — seeded determinism over a workload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_FOLD = 2_147_483_648          # 2^31: pk folded first so int64 never overflows
_MULT = 2_654_435_761          # Knuth 2^32 / phi
_MOD = 4_294_967_296           # 2^32


def _mix32(pk: np.ndarray, seed: int) -> np.ndarray:
    return ((pk % _FOLD) * _MULT + seed) % _MOD


def stratified_sample(ds: rd.Dataset, *, rates: dict[str, float],
                      stratum_col: str, id_col: str = "doc_id",
                      seed: int = 12345) -> rd.Dataset:
    """Filter ``ds`` to a deterministic per-stratum sample.

    ``rates`` maps stratum value -> keep probability in [0, 1]; strata not
    listed are dropped (rate 0). Pure ``map_batches`` filter — no shuffle,
    no state, embarrassingly parallel at any scale.
    """
    thresholds = {k: int(np.floor(v * _MOD)) for k, v in rates.items()}

    def keep(t: pa.Table) -> pa.Table:
        pk = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mix32(pk, seed)
        strata = t[stratum_col].to_numpy(zero_copy_only=False)
        thr = np.zeros(len(pk), np.int64)
        for val, th in thresholds.items():
            thr[strata == val] = th
        return t.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def sql_sample_predicate(rates: dict[str, float], *, stratum_col: str,
                         id_col: str = "doc_id", seed: int = 12345) -> str:
    """The identical keep rule as a DuckDB boolean expression."""
    cases = " ".join(
        f"WHEN '{k}' THEN {int(np.floor(v * _MOD))}"
        for k, v in rates.items())
    return (f"(({id_col} % {_FOLD}) * {_MULT} + {seed}) % {_MOD} < "
            f"(CASE {stratum_col} {cases} ELSE 0 END)")


def epoch_mix(ds: rd.Dataset, *, weights: dict[str, float],
              stratum_col: str, id_col: str = "doc_id",
              seed: int = 12345) -> rd.Dataset:
    """Training-mix construction with epochs > 1 (The Pile's per-subset
    epoch factors; the UPSAMPLING side of :func:`stratified_sample`):
    each row is replicated ``floor(w)`` times plus one more with
    probability ``frac(w)``, decided by the same deterministic
    integer-hash rule — so a weight of 2.25 means every row appears
    twice and every fourth (by hash) appears a third time. Emits the
    input columns plus ``copy`` (0-based replica index). Reproducible
    across runs, partitionings and cluster sizes; strata not listed get
    weight 0 (dropped). Pure ``map_batches`` row fan-out — no shuffle."""
    import math

    whole = {k: int(math.floor(v)) for k, v in weights.items()}
    fthr = {k: int(np.floor((v - math.floor(v)) * _MOD))
            for k, v in weights.items()}

    def expand(t: pa.Table) -> pa.Table:
        pk = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mix32(pk, seed)
        strata = t[stratum_col].to_numpy(zero_copy_only=False)
        n = np.zeros(len(pk), np.int64)
        for val, w in whole.items():
            m = strata == val
            n[m] = w + (h[m] < fthr[val]).astype(np.int64)
        idx = np.repeat(np.arange(len(pk)), n)
        out = t.take(pa.array(idx, pa.int64()))
        copy = np.arange(idx.size) - np.repeat(
            np.concatenate([[0], np.cumsum(n)[:-1]]), n)
        return out.append_column("copy", pa.array(copy, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def group_sample(ds: rd.Dataset, *, k: int, group_col: str,
                 id_col: str = "doc_id", seed: int = 12345) -> rd.Dataset:
    """Deterministic k-per-group sample WITHOUT replacement (the
    fixed-quota companion to :func:`stratified_sample`'s rate rule —
    "give me exactly k eval docs per language"): keep each group's k
    rows with the smallest ``mix32(pk)`` hash (tie -> smaller id).

    Hash-ordered selection is a uniform without-replacement draw that is
    reproducible across runs / partitionings / cluster sizes and needs
    no RNG state; the heavy lifting reuses the partial-top-n exchange
    (:func:`stages.window.grouped_topn` on the negated hash), so at most
    k x groups x batches rows ride the shuffle. Emits the input columns
    plus ``rank`` (0-based position in the group's hash order)."""
    from org_rdkit_lucene_ray.stages.window import grouped_topn

    def hashed(t: pa.Table) -> pa.Table:
        pk = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "neg_h", pa.array(-_mix32(pk, seed), pa.int64()))

    top = grouped_topn(ds.map_batches(hashed, batch_format="pyarrow"),
                       n=k, key_col=group_col, value_col="neg_h",
                       id_col=id_col)
    return top.map_batches(lambda t: t.drop_columns(["neg_h"]),
                           batch_format="pyarrow")


def sql_group_sample(k: int, *, group_col: str, table: str = "documents",
                     id_col: str = "doc_id", seed: int = 12345) -> str:
    """The identical k-per-group draw in DuckDB."""
    return f"""
WITH h AS (SELECT {group_col}, {id_col},
             (({id_col} % {_FOLD}) * {_MULT} + {seed}) % {_MOD} AS hv
           FROM {table}),
r AS (SELECT {group_col}, {id_col},
        row_number() OVER (PARTITION BY {group_col}
                           ORDER BY hv, {id_col}) - 1 AS rank FROM h)
SELECT {group_col}, {id_col}, rank::BIGINT AS rank FROM r
WHERE rank < {k} ORDER BY 1, 3
"""

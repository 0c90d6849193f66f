"""Approximate distinct-count sketch (HyperLogLog) as a Ray Data aggregate.

The reference has no sketches (SURVEY §2.5 — its approximate layer is the
fingerprint screen); a 100 TB corpus pipeline needs cardinality estimates
(distinct terms / urls / shingles) without a full ``groupby``. HyperLogLog
(Flajolet, Fusy, Gandouet & Meunier, AofA 2007) with the linear-counting
small-range correction fits the partial+final shape perfectly:

- partial (``map_batches``): ONE register array (2^p bytes) per batch —
  vectorized ``np.maximum.at`` over the batch's 64-bit FNV hashes; the
  shuffle payload is 2^p bytes per batch regardless of batch size;
- final: registers merge by elementwise max (associative + commutative +
  idempotent), so any combine tree — including Ray's nondeterministic
  aggregation order — yields the identical estimate. The merged register
  count is bounded by the BATCH count, so the driver-side fold is tiny.

Determinism: the hash is the engine's seeded FNV-1a (``stable_term_hash``),
so the estimate is a pure function of the input multiset — which is what
lets a correctness gate pin its quantized verdict.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_P_DEFAULT = 12                    # 4096 registers, ~1.6% standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(hashes: np.ndarray, p: int = _P_DEFAULT) -> np.ndarray:
    """uint64 hashes -> register array (uint8, length 2^p): register
    ``h >> (64-p)`` keeps the max over ``1 + leading-zeros`` of the
    remaining ``64-p`` bits. Fully vectorized."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if hashes.size == 0:
        return regs
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)   # pad low bits
    # rank = leading zeros of the top 64-p bits, +1; the pad guarantees a
    # set bit so the loop below terminates within 64-p steps
    rank = np.ones(h.size, dtype=np.uint8)
    mask = np.uint64(1) << np.uint64(63)
    alive = np.flatnonzero((rest & mask) == 0)
    shift = 62
    while alive.size:
        rank[alive] += 1
        alive = alive[((rest[alive] >> np.uint64(shift)) & np.uint64(1)) == 0]
        shift -= 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the linear-counting small-range correction
    (the original paper's regime switch at 2.5m)."""
    m = regs.size
    est = _alpha(m) * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)
    return float(est)


def distinct_count_hll(ds: rd.Dataset, col: str, *, p: int = _P_DEFAULT,
                       tokenize: bool = False) -> float:
    """Approximate distinct count of ``col`` (or, with ``tokenize=True``,
    of the analyzer terms inside a text column) over a Dataset.

    One register row per batch rides back to the driver (2^p bytes each,
    bounded by batch count); the fold is elementwise max."""
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

    def partial(t: pa.Table) -> pa.Table:
        if tokenize:
            from org_rdkit_lucene_ray.functions.analyze import (
                REGISTRY,
                tokenize_column,
            )

            vals = pc.list_flatten(
                tokenize_column(t[col].combine_chunks(), REGISTRY["standard"]))
            # hash the dictionary (distinct per batch), not every occurrence
            vals = pc.unique(vals)
        else:
            vals = pc.unique(pc.cast(t[col].combine_chunks(), pa.string()))
        regs = hll_registers(stable_term_hash(vals), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << p, dtype=np.uint8)
    for r in rows:
        merged = np.maximum(merged, np.frombuffer(r["regs"], np.uint8))
    return hll_estimate(merged)


# ------------------------------------------------------------- count-min
# multiply-shift row hashes (Dietzfelbinger et al. 1997): seeded odd
# multipliers -> deterministic, partition-independent
_CMS_MULT = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0xD6E8FEB86659FD93,
                      0xA5A5A5A5A5A5A5A5 | 1, 0x27D4EB2F165667C5],
                     dtype=np.uint64)


def _cms_rows(hashes: np.ndarray, depth: int, log2w: int) -> np.ndarray:
    """(depth, n) int64 bucket indices for uint64 hashes."""
    with np.errstate(over="ignore"):
        return np.stack([
            ((hashes * _CMS_MULT[d]) >> np.uint64(64 - log2w)).astype(np.int64)
            for d in range(depth)])


def cms_sketch(ds: rd.Dataset, col: str, *, depth: int = 4,
               log2w: int = 14, tokenize: bool = False) -> dict:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of the value (or
    analyzer-term) OCCURRENCE multiset of ``col``: one fixed
    ``depth x 2^log2w`` int64 matrix per batch rides back to the driver
    and partials merge by elementwise ADD — exact integer arithmetic, so
    the merged sketch is a pure function of the input multiset regardless
    of partitioning or combine order. Point estimates never undercount;
    overcount <= e/width x total occurrences with high probability.
    Returns ``{"counts": (depth, width) int64, "total": int}``."""
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

    if depth > len(_CMS_MULT):
        raise ValueError(f"depth <= {len(_CMS_MULT)}")
    width = 1 << log2w

    def partial(t: pa.Table) -> pa.Table:
        if tokenize:
            from org_rdkit_lucene_ray.functions.analyze import (
                REGISTRY,
                tokenize_column,
            )

            vals = pc.list_flatten(
                tokenize_column(t[col].combine_chunks(), REGISTRY["standard"]))
        else:
            vals = pc.cast(t[col].combine_chunks(), pa.string())
        # hash the dictionary once, count occurrences per distinct value,
        # then scatter the counts — occurrences never hash individually
        enc = pc.dictionary_encode(vals)
        dh = stable_term_hash(enc.dictionary)
        occ = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(enc.dictionary)).astype(np.int64)
        m = np.zeros((depth, width), np.int64)
        rows = _cms_rows(dh, depth, log2w)
        for d in range(depth):
            np.add.at(m[d], rows[d], occ)
        return pa.table({"m": pa.array([m.tobytes()], pa.binary()),
                         "n": pa.array([int(occ.sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros((depth, width), np.int64)
    total = 0
    for r in parts:
        merged += np.frombuffer(r["m"], np.int64).reshape(depth, width)
        total += int(r["n"])
    return {"counts": merged, "total": total, "log2w": log2w, "depth": depth}


def cms_query(sketch: dict, terms: pa.Array | list[str]) -> np.ndarray:
    """Point-estimate occurrence counts for ``terms`` (int64, vectorized:
    min over the depth rows)."""
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

    arr = terms if isinstance(terms, pa.Array) else pa.array(terms, pa.string())
    h = stable_term_hash(arr)
    rows = _cms_rows(h, sketch["depth"], sketch["log2w"])
    ests = np.stack([sketch["counts"][d][rows[d]]
                     for d in range(sketch["depth"])])
    return ests.min(axis=0).astype(np.int64)


def grouped_distinct_hll(ds: rd.Dataset, group_col: str, col: str, *,
                         p: int = _P_DEFAULT,
                         tokenize: bool = False) -> dict[str, float]:
    """Per-group HLL distinct estimates (one sketch per group value —
    the GROUP BY form of :func:`distinct_count_hll`). Each batch emits
    one (group, 2^p-byte register blob) row per group PRESENT in the
    batch; a ``groupby(group).map_groups`` elementwise-max fold merges
    them, so the exchange carries ``groups x batches`` fixed-size blobs
    and the merge is order-independent (identical estimate under any
    combine tree). Intended for low-cardinality dimensions (lang,
    source); a high-cardinality group column would be better served by
    exact groupby-count."""
    from org_rdkit_lucene_ray.pipelines.build import stable_term_hash

    def partial(t: pa.Table) -> pa.Table:
        groups, blobs = [], []
        gv = t[group_col].to_numpy(zero_copy_only=False)
        for g in np.unique(gv):
            sel = t.filter(pa.array(gv == g))
            if tokenize:
                from org_rdkit_lucene_ray.functions.analyze import (
                    REGISTRY,
                    tokenize_column,
                )

                vals = pc.unique(pc.list_flatten(tokenize_column(
                    sel[col].combine_chunks(), REGISTRY["standard"])))
            else:
                vals = pc.unique(pc.cast(sel[col].combine_chunks(),
                                         pa.string()))
            groups.append(str(g))
            blobs.append(hll_registers(stable_term_hash(vals), p).tobytes())
        return pa.table({"grp": pa.array(groups, pa.string()),
                         "regs": pa.array(blobs, pa.binary())})

    def merge(g: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for b in g["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(b, np.uint8))
        return pa.table({"grp": g["grp"][:1],
                         "est": pa.array([hll_estimate(regs)], pa.float64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("grp").map_groups(merge, batch_format="pyarrow"))
    return {r["grp"]: r["est"] for r in out.take_all()}

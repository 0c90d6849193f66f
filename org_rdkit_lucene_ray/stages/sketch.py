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


# ------------------------------------------------------------------- bloom
# Distributed Bloom filter + the bloom-screened incremental-crawl novelty
# filter. Same OR-foldable shape as the HLL registers: per-batch partials
# are SET-BIT POSITION blobs pre-split into bit-range slices (k positions
# per key, ~4*8 B per row — occurrence-sized bitmaps never ride the
# exchange), a groupby(slice).map_groups ORs each slice's bitmap, and the
# driver only concatenates the slices. Bit order is little-endian
# (np.packbits bitorder="little") so position p lives at
# byte p>>3, bit p&7. Reference analog: the per-fragment url blooms in
# the segment footers (state/bloom.py) — this is the corpus-level,
# fold-built variant a snapshot-over-snapshot pipeline needs.

_BLOOM_SLICE_BITS = 5              # 32 fold slices
_BLOOM_K = 4
_BLOOM_BITS_PER_KEY = 16           # ~0.24% false-positive rate at k=4
_BLOOM_CAND_LIMIT = 5_000_000      # broadcastable verify-candidate ceiling


def _bloom_positions(d: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """(n, 2) int64 md5 words -> (n, k) uint64 bit positions via
    Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m), m a power of 2."""
    d0 = d[:, 0].view(np.uint64)
    d1 = d[:, 1].view(np.uint64) | np.uint64(1)   # odd stride hits all bits
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return (d0[:, None] + i[None, :] * d1[:, None]) & np.uint64(n_bits - 1)


def bloom_build(ds: rd.Dataset, col: str, *, n_bits: int,
                k: int = _BLOOM_K) -> np.ndarray:
    """Build one Bloom bitmap (uint8, little-endian bit order) over the
    md5 fingerprints of a string column, fully distributed. ``n_bits``
    must be a power of two. The bitmap must fit a driver/worker heap —
    size it to the OLD side's cardinality (16 bits/key ~ 2 GB per 10^9
    keys); past broadcastable sizes, use the per-partition blooms of
    ``state/bloom.py`` instead (documented split)."""
    from org_rdkit_lucene_ray.util import md5_digest64_column

    if n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two, got {n_bits}")
    n_slices = 1 << _BLOOM_SLICE_BITS
    slice_bits = n_bits >> _BLOOM_SLICE_BITS
    shift = np.uint64(int(np.log2(n_bits)) - _BLOOM_SLICE_BITS)

    def partial(t: pa.Table) -> pa.Table:
        d = md5_digest64_column(t[col])
        pos = np.unique(_bloom_positions(d, k, n_bits).ravel())
        skey = (pos >> shift).astype(np.int64)
        edges = np.searchsorted(skey, np.arange(n_slices + 1))
        keys, blobs = [], []
        for s in range(n_slices):
            lo, hi = int(edges[s]), int(edges[s + 1])
            if hi > lo:
                keys.append(s)
                blobs.append(pos[lo:hi].tobytes())
        return pa.table({"skey": pa.array(keys, pa.int64()),
                         "pos": pa.array(blobs, pa.large_binary())})

    def fold(g: pa.Table) -> pa.Table:
        skey = g["skey"][0].as_py()
        base = np.uint64(skey * slice_bits)
        bits = np.zeros(slice_bits, bool)
        for b in g["pos"]:
            bits[np.frombuffer(b.as_py(), np.uint64) - base] = True
        return pa.table({
            "skey": pa.array([skey], pa.int64()),
            "bmp": pa.array([np.packbits(bits, bitorder="little").tobytes()],
                            pa.large_binary())})

    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("skey").map_groups(fold, batch_format="pyarrow")
            .take_all())
    bitmap = np.zeros(n_bits >> 3, np.uint8)
    for r in rows:
        s = r["skey"]
        chunk = np.frombuffer(r["bmp"], np.uint8)
        bitmap[s * (slice_bits >> 3): (s + 1) * (slice_bits >> 3)] = chunk
    return bitmap


def bloom_member(bitmap: np.ndarray, d: np.ndarray,
                 k: int = _BLOOM_K) -> np.ndarray:
    """Vectorized membership test: (n, 2) int64 md5 words -> bool mask.
    No false negatives; false positives at the documented rate."""
    n_bits = bitmap.size << 3
    pos = _bloom_positions(d, k, n_bits)
    byte = bitmap[(pos >> np.uint64(3)).astype(np.int64)]
    bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    return bit.all(axis=1)


def _void16(d: np.ndarray) -> np.ndarray:
    """(n, 2) int64 -> void-16 view (memcmp order — consistent sort +
    equality for exact 128-bit digest membership)."""
    return np.ascontiguousarray(d).view(np.dtype((np.void, 16))).ravel()


def bloom_novel_docs(new: rd.Dataset, old: rd.Dataset, *,
                     text_col: str = "text", id_col: str = "doc_id",
                     bits_per_key: int = _BLOOM_BITS_PER_KEY,
                     k: int = _BLOOM_K) -> pa.Table:
    """Incremental-crawl novelty: ids of ``new`` docs whose content md5
    does NOT appear anywhere in ``old`` — EXACT output (SQL anti-join
    parity) at bloom cost:

    1. build the bloom over ``old``'s fingerprints (fold above);
    2. screen ``new`` once — bloom misses are DEFINITELY novel (no false
       negatives) and never enter a join;
    3. verify the hits (true overlap + ~0.2% false positives) with one
       more streamed pass over ``old``: the candidates' full 128-bit
       digests broadcast sorted, membership via one searchsorted per
       batch (the decontaminate shape). Zero shuffles anywhere.

    The candidate set must broadcast (``_BLOOM_CAND_LIMIT`` guard): this
    operator targets low-overlap workloads (novelty detection, eval
    decontamination); for crawl updates where most content persists, the
    fingerprint JOIN of `snapshot_diff` is the right tool (documented
    split)."""
    from org_rdkit_lucene_ray.util import md5_digest64_column

    n_old = old.count()
    n_bits = 1 << max(13, int(np.ceil(np.log2(max(1, n_old) * bits_per_key))))
    bitmap = bloom_build(old, text_col, n_bits=n_bits, k=k)
    import ray

    bmp_ref = ray.put(bitmap)

    def screen(t: pa.Table) -> pa.Table:
        from org_rdkit_lucene_ray.stages.dedup import _bcast

        bmp = _bcast(bmp_ref)
        d = md5_digest64_column(t[text_col])
        hit = bloom_member(bmp, d, k=k)
        ids = pc.cast(t[id_col], pa.int64())
        return pa.table({
            id_col: ids,
            "hit": pa.array(hit),
            "d0": pa.array(d[:, 0], pa.int64()),
            "d1": pa.array(d[:, 1], pa.int64()),
        })

    screened = new.map_batches(screen, batch_format="pyarrow").materialize()
    cand = screened.filter(expr="hit == True").select_columns(
        [id_col, "d0", "d1"]).take_all()
    if len(cand) > _BLOOM_CAND_LIMIT:
        raise ValueError(
            f"bloom_novel_docs: {len(cand)} bloom-hit candidates "
            f"(> {_BLOOM_CAND_LIMIT}) — overlap-dominated input; use the "
            "snapshot_diff fingerprint join instead")
    novel_ids = [r[id_col] for r in
                 screened.filter(expr="hit == False")
                 .select_columns([id_col]).take_all()]
    if cand:
        cd = np.array([[r["d0"], r["d1"]] for r in cand], np.int64)
        # dedupe digests: candidates can SHARE content (dup pages in the
        # new crawl) — the broadcast set must hold unique digests and each
        # candidate maps to its digest's slot, or searchsorted marks only
        # the first of an equal run as seen
        uniq_cv, slot_of = np.unique(_void16(cd), return_inverse=True)
        ref = ray.put(uniq_cv)

        def verify(t: pa.Table) -> pa.Table:
            from org_rdkit_lucene_ray.stages.dedup import _bcast

            cands = _bcast(ref)
            d = _void16(md5_digest64_column(t[text_col]))
            loc = np.searchsorted(cands, d)
            loc_c = np.minimum(loc, cands.size - 1)
            seen = np.unique(loc_c[cands[loc_c] == d])
            return pa.table({"slot": pa.array(seen.astype(np.int64),
                                              pa.int64())})

        seen_rows = old.map_batches(verify, batch_format="pyarrow").take_all()
        seen_slots = set(r["slot"] for r in seen_rows)
        cand_ids = np.array([r[id_col] for r in cand], np.int64)
        novel_ids.extend(int(cand_ids[i]) for i in range(len(cand))
                         if int(slot_of[i]) not in seen_slots)
    novel_ids.sort()
    return pa.table({id_col: pa.array(novel_ids, pa.int64())})

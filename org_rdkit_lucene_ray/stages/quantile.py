"""Exact distributed quantiles by order-statistic selection — no sort, no
shuffle, bounded driver state.

The reference computes only means over its benchmark results
(``LuceneBenchmark.java:158-182``); a 100 TB curation pipeline needs exact
percentiles of quality scores / doc lengths / prices to derive filter
thresholds, and a distributed ``sort`` for one scalar per quantile is the
wrong tool (an all-to-all over the whole corpus).  This stage selects the
exact k-th order statistics with the classic histogram-descent trick over
the IEEE-754 total order:

- every float64 maps to a **monotone uint64 key** (sign-flip trick: flip
  the sign bit for positives, all bits for negatives), so order statistics
  over doubles become order statistics over unsigned integers;
- each pass streams the column once through ``map_batches``, emitting one
  fixed ``2^log2_buckets``-cell int64 histogram of the keys' next
  ``log2_buckets`` bits per batch (partials merge by elementwise ADD —
  exact integers, any combine order).  The driver folds the tiny
  histograms, locates the bucket containing each target rank, and narrows
  that target's key prefix;
- once every unresolved target's bucket population is under
  ``gather_limit``, ONE final pass gathers just the keys inside the
  surviving prefix ranges (output size known in advance from the
  histograms) and the driver picks the exact ranks from the small sorted
  array.

Worst case (adversarially equal high bits) is ``64/log2_buckets`` passes,
after which a still-oversized bucket IS a single exact key; typical
numeric data resolves in 2 passes (histogram + gather).  Every pass is a
streaming projection — at 100 TB each pass ships
``batches x 2^log2_buckets x 8`` bytes of histogram, never data rows.

Rank convention matches DuckDB's ``quantile_disc`` (verified empirically):
``rank(q) = max(0, ceil(q*n) - 1)`` over the null-free ascending order.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_SIGN = np.uint64(0x8000000000000000)


@ray.remote
def _block_pass(fn, block: pa.Table, kwargs: dict) -> pa.Table:
    return fn(block, **kwargs)


def _pass_tables(blocks: list, fn, **kwargs) -> list[pa.Table]:
    """Apply a per-batch histogram/gather closure to every cached block as
    a raw Ray task. The descent runs 2-4 passes over the SAME materialized
    single-column projection; as ``map_batches``+``take_all`` Dataset
    executions each pass paid ~0.4 s fixed executor overhead (the r4
    ``price_quantiles`` bench wobble) — as task fan-outs over
    ``to_arrow_refs`` blocks they cost dispatch only. ``fn`` is
    cloudpickled per task (bytes-sized closures)."""
    return ray.get([_block_pass.remote(fn, b, kwargs) for b in blocks])


def _pass_rows(blocks: list, fn, **kwargs) -> list[dict]:
    rows: list[dict] = []
    for t in _pass_tables(blocks, fn, **kwargs):
        rows.extend(t.to_pylist())
    return rows


def _f64_to_key(vals: np.ndarray) -> np.ndarray:
    """float64 -> order-preserving uint64 (IEEE-754 total order; -0.0 sorts
    just below +0.0, which cannot change any quantile VALUE since they
    compare equal)."""
    bits = np.ascontiguousarray(vals, dtype=np.float64).view(np.int64)
    u = bits.view(np.uint64)
    return np.where(bits >= 0, u ^ _SIGN, ~u)


def _key_to_f64(key: int) -> float:
    """Inverse of :func:`_f64_to_key` for one key (driver-side)."""
    k = np.uint64(key)
    i = (k ^ _SIGN) if (k & _SIGN) else ~k
    v = float(np.array([i], dtype=np.uint64).view(np.float64)[0])
    return 0.0 if v == 0.0 else v     # normalize -0.0


def _valid_keys(t: pa.Table, col: str) -> np.ndarray:
    if col not in t.column_names:     # zero-column empty block (map_groups
        return np.empty(0, np.uint64)  # emits them for empty sort splits)
    arr = t[col].combine_chunks()
    if arr.type != pa.float64():
        arr = pc.cast(arr, pa.float64())
    arr = arr.filter(pc.and_kleene(pc.is_valid(arr),
                                   pc.invert(pc.is_nan(arr))))
    return _f64_to_key(arr.to_numpy(zero_copy_only=False))


def exact_quantiles(ds: rd.Dataset, col: str, qs: list[float], *,
                    log2_buckets: int = 16,
                    gather_limit: int = 4_000_000) -> pa.Table:
    """Exact ``quantile_disc``-convention quantiles of ``ds[col]`` (nulls
    and NaNs ignored, like SQL aggregates).  Returns a table
    ``(q: float64, value: float64)`` sorted by q.

    ``ds`` is projected to the single column and materialized once so the
    2-4 descent passes don't re-execute upstream stages (every consumer of
    a lazy Dataset re-runs its whole pipeline); one float64 column is the
    cheapest possible resident — at 100 TB the object store spills it, or
    callers pass a plain ``read_parquet`` dataset whose re-read per pass
    is itself just the pruned column."""
    if not qs:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    proj = ds.select_columns([col]).materialize()
    blocks = proj.to_arrow_refs()
    bits = log2_buckets
    n_b = 1 << bits

    def _hist(t: pa.Table, *, shift: int, prefixes: list[int]) -> pa.Table:
        """One (len(prefixes) x 2^bits) histogram row of the keys' bits
        [shift, shift+bits) restricted to keys matching each prefix
        (prefix = key >> (shift+bits))."""
        keys = _valid_keys(t, col)
        top = shift + bits
        hi = keys >> np.uint64(top) if top < 64 else np.zeros(keys.size, np.uint64)
        out = np.zeros((len(prefixes), n_b), np.int64)
        for i, p in enumerate(prefixes):
            sel = keys[hi == np.uint64(p)]
            b = ((sel >> np.uint64(shift)) & np.uint64(n_b - 1)).astype(np.int64)
            out[i] = np.bincount(b, minlength=n_b)
        return pa.table({"h": pa.array([out.tobytes()], pa.binary()),
                         "n": pa.array([int(keys.size)], pa.int64())})

    # pass 1: total count + top-level histogram
    shift = 64 - bits
    rows = _pass_rows(blocks, _hist, shift=shift, prefixes=[0])
    n = sum(int(r["n"]) for r in rows)
    if n == 0:
        return pa.table({"q": pa.array(sorted(qs), pa.float64()),
                         "value": pa.array([None] * len(qs), pa.float64())})
    hist = np.zeros(n_b, np.int64)
    for r in rows:
        hist += np.frombuffer(r["h"], np.int64)

    def _narrow(h: np.ndarray, lrank: int) -> tuple[int, int, int]:
        """bucket, new local rank, bucket count."""
        cum = np.cumsum(h)
        b = int(np.searchsorted(cum, lrank + 1))
        before = int(cum[b - 1]) if b else 0
        return b, lrank - before, int(h[b])

    # per-target state: (q, prefix, pshift, local_rank, count) where
    # prefix = key >> pshift for every key in the target's range
    state = []
    for q in sorted(qs):
        rank = max(0, math.ceil(q * n) - 1)
        b, lr, cnt = _narrow(hist, rank)
        state.append((q, b, shift, lr, cnt))

    while True:
        unresolved = [s for s in state if s[4] > gather_limit and s[2] > 0]
        if not unresolved:
            break
        shift -= bits
        prefixes = sorted({s[1] for s in unresolved})
        rows = _pass_rows(blocks, _hist, shift=shift, prefixes=prefixes)
        hists = np.zeros((len(prefixes), n_b), np.int64)
        for r in rows:
            hists += np.frombuffer(r["h"], np.int64).reshape(len(prefixes), n_b)
        nxt = []
        for q, p, ps, lr, cnt in state:
            if cnt <= gather_limit or ps == 0:
                nxt.append((q, p, ps, lr, cnt))
                continue
            b, nlr, ncnt = _narrow(hists[prefixes.index(p)], lr)
            nxt.append((q, (p << bits) | b, shift, nlr, ncnt))
        state = nxt

    out_vals: dict[float, float] = {}
    # fully-descended oversized buckets are a single exact key (all 64 bits
    # pinned): the order statistic is that key, no gather needed
    for q, p, ps, _lr, cnt in state:
        if cnt > gather_limit and ps == 0:
            out_vals[q] = _key_to_f64(p)
    gather = [s for s in state if s[0] not in out_vals]
    if gather:
        # half-open key ranges [lo, hi] (inclusive) per surviving prefix
        ranges = sorted({(s[1] << s[2],
                          ((s[1] + 1) << s[2]) - 1) for s in gather})
        lo = np.asarray([r[0] for r in ranges], np.uint64)
        hi = np.asarray([r[1] for r in ranges], np.uint64)

        def _gather(t: pa.Table) -> pa.Table:
            keys = _valid_keys(t, col)
            m = np.zeros(keys.size, bool)
            for a, b in zip(lo, hi):
                m |= (keys >= a) & (keys <= b)
            return pa.table({"k": pa.array(keys[m].view(np.int64),
                                           pa.int64())})

        parts = [t["k"].to_numpy().view(np.uint64)
                 for t in _pass_tables(blocks, _gather) if t.num_rows]
        keys = np.sort(np.concatenate(parts)) if parts else \
            np.zeros(0, np.uint64)
        for q, p, ps, lr, _cnt in gather:
            start = int(np.searchsorted(keys, np.uint64(p << ps), "left"))
            out_vals[q] = _key_to_f64(int(keys[start + lr]))

    qs_sorted = sorted(qs)
    return pa.table({"q": pa.array(qs_sorted, pa.float64()),
                     "value": pa.array([out_vals[q] for q in qs_sorted],
                                       pa.float64())})


def exact_quantiles_by(ds: rd.Dataset, col: str, by: str, qs: list[float], *,
                       log2_buckets: int = 16,
                       gather_limit: int = 4_000_000,
                       max_groups: int = 64) -> pa.Table:
    """Per-group exact ``quantile_disc`` quantiles — the same histogram
    descent as :func:`exact_quantiles`, one independent descent state per
    group, still no sort and no data-row shuffle.

    Groups are discovered in the first pass; driver state is
    ``groups x 2^log2_buckets x 8`` bytes per pass, so the group count is
    capped (``max_groups``, explicit error) — this operator is for LOW
    cardinality dimensions (language, split, return-flag). For
    high-cardinality keys use a hash-bucket ``map_groups`` with an
    in-group ``np.partition`` instead (the whole group must then fit a
    worker, which is the opposite trade-off).

    Returns ``(group: string, q: float64, value: float64)`` sorted by
    (group, q); null/NaN measures and null group keys are dropped before
    grouping (SQL aggregate semantics), so every emitted group has at
    least one value.
    """
    if not qs:
        return pa.table({"group": pa.array([], pa.string()),
                         "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    proj = ds.select_columns([col, by]).materialize()
    blocks = proj.to_arrow_refs()
    bits = log2_buckets
    n_b = 1 << bits

    def _group_keys(t: pa.Table) -> tuple[np.ndarray, list[str], np.ndarray]:
        """(uint64 keys, group values, per-key group index) with
        null/NaN measures dropped (null group values become 'None'-less:
        rows with a null group are dropped too, matching SQL GROUP BY
        over non-null dimensions; the testdata has none)."""
        if by not in t.column_names:   # zero-column empty block
            return (np.empty(0, np.uint64), [], np.empty(0, np.int64))
        g = t[by].combine_chunks().cast(pa.string())
        v = t[col].combine_chunks()
        if v.type != pa.float64():
            v = pc.cast(v, pa.float64())
        keep = pc.and_kleene(
            pc.and_kleene(pc.is_valid(v), pc.invert(pc.is_nan(v))),
            pc.is_valid(g))
        g, v = g.filter(keep), v.filter(keep)
        uniq = pc.unique(g)
        idx = pc.index_in(g, uniq).to_numpy(zero_copy_only=False)
        keys = _f64_to_key(v.to_numpy(zero_copy_only=False))
        return keys, uniq.to_pylist(), idx.astype(np.int64)

    def _hist_by(t: pa.Table, *, shift: int,
                 targets: list[tuple[str, int]] | None) -> pa.Table:
        """targets=None: one top-level histogram per group present.
        Otherwise one histogram per requested (group, prefix)."""
        keys, groups, gidx = _group_keys(t)
        top = shift + bits
        hi = keys >> np.uint64(top) if top < 64 else np.zeros(keys.size, np.uint64)
        out_g, out_h, out_n = [], [], []
        if targets is None:
            for i, gname in enumerate(groups):
                sel = keys[gidx == i]
                b = ((sel >> np.uint64(shift)) & np.uint64(n_b - 1)).astype(np.int64)
                out_g.append(gname)
                out_h.append(np.bincount(b, minlength=n_b).tobytes())
                out_n.append(int(sel.size))
        else:
            pos = {gname: i for i, gname in enumerate(groups)}
            for gname, p in targets:
                i = pos.get(gname)
                if i is None:
                    continue
                sel = keys[(gidx == i) & (hi == np.uint64(p))]
                b = ((sel >> np.uint64(shift)) & np.uint64(n_b - 1)).astype(np.int64)
                out_g.append(f"{gname}\x00{p}")
                out_h.append(np.bincount(b, minlength=n_b).tobytes())
                out_n.append(int(sel.size))
        return pa.table({"g": pa.array(out_g, pa.string()),
                         "h": pa.array(out_h, pa.binary()),
                         "n": pa.array(out_n, pa.int64())})

    def _fold(rows) -> dict[str, tuple[np.ndarray, int]]:
        acc: dict[str, tuple[np.ndarray, int]] = {}
        for r in rows:
            h = np.frombuffer(r["h"], np.int64)
            if r["g"] in acc:
                acc[r["g"]] = (acc[r["g"]][0] + h, acc[r["g"]][1] + r["n"])
            else:
                acc[r["g"]] = (h.copy(), int(r["n"]))
        return acc

    shift = 64 - bits
    folded = _fold(_pass_rows(blocks, _hist_by, shift=shift, targets=None))
    if len(folded) > max_groups:
        raise ValueError(
            f"exact_quantiles_by: {len(folded)} groups exceeds max_groups="
            f"{max_groups}; use a map_groups quantile for high-cardinality keys")
    qs_sorted = sorted(qs)

    # per-(group, q) state: (prefix, pshift, local_rank, count)
    state: dict[tuple[str, float], tuple[int, int, int, int]] = {}
    group_n: dict[str, int] = {g: n for g, (_h, n) in folded.items()}
    for g, (h, n) in folded.items():
        cum = np.cumsum(h)
        for q in qs_sorted:
            rank = max(0, math.ceil(q * n) - 1)
            b = int(np.searchsorted(cum, rank + 1))
            before = int(cum[b - 1]) if b else 0
            state[(g, q)] = (b, shift, rank - before, int(h[b]))

    while True:
        unresolved = {(g, q): s for (g, q), s in state.items()
                      if s[3] > gather_limit and s[1] > 0}
        if not unresolved:
            break
        shift -= bits
        targets = sorted({(g, s[0]) for (g, _q), s in unresolved.items()})
        folded_p = _fold(_pass_rows(blocks, _hist_by, shift=shift,
                                    targets=targets))
        for (g, q), (p, ps, lr, cnt) in state.items():
            if cnt <= gather_limit or ps == 0:
                continue
            h = folded_p[f"{g}\x00{p}"][0]
            cum = np.cumsum(h)
            b = int(np.searchsorted(cum, lr + 1))
            before = int(cum[b - 1]) if b else 0
            state[(g, q)] = ((p << bits) | b, shift, lr - before, int(h[b]))

    out: dict[tuple[str, float], float | None] = {}
    for (g, q), (p, ps, lr, cnt) in state.items():
        if group_n[g] == 0:
            out[(g, q)] = None
        elif cnt > gather_limit and ps == 0:
            out[(g, q)] = _key_to_f64(p)
    gather = [(g, q, *s) for (g, q), s in state.items() if (g, q) not in out]
    if gather:
        ranges = sorted({(g, p << ps, ((p + 1) << ps) - 1)
                         for g, _q, p, ps, _lr, _cnt in gather})

        def _gather(t: pa.Table) -> pa.Table:
            keys, groups, gidx = _group_keys(t)
            pos = {gname: i for i, gname in enumerate(groups)}
            gs, ks = [], []
            for gname, lo, hi in ranges:
                i = pos.get(gname)
                if i is None:
                    continue
                sel = keys[(gidx == i) & (keys >= np.uint64(lo))
                           & (keys <= np.uint64(hi))]
                gs.extend([gname] * sel.size)
                ks.append(sel)
            flat = (np.concatenate(ks) if ks
                    else np.zeros(0, np.uint64)).view(np.int64)
            return pa.table({"g": pa.array(gs, pa.string()),
                             "k": pa.array(flat, pa.int64())})

        per_group: dict[str, list[np.ndarray]] = {}
        for b in _pass_tables(blocks, _gather):
            if not b.num_rows:
                continue
            ga = np.asarray(b["g"].to_pylist(), dtype=object)
            ks = b["k"].to_numpy(zero_copy_only=False).view(np.uint64)
            for gname in np.unique(ga):
                per_group.setdefault(gname, []).append(ks[ga == gname])
        sorted_keys = {g: np.sort(np.concatenate(parts))
                       for g, parts in per_group.items()}
        for g, q, p, ps, lr, _cnt in gather:
            keys = sorted_keys[g]
            start = int(np.searchsorted(keys, np.uint64(p << ps), "left"))
            out[(g, q)] = _key_to_f64(int(keys[start + lr]))

    groups_sorted = sorted(group_n)
    return pa.table({
        "group": pa.array([g for g in groups_sorted for _ in qs_sorted],
                          pa.string()),
        "q": pa.array(qs_sorted * len(groups_sorted), pa.float64()),
        "value": pa.array([out[(g, q)] for g in groups_sorted
                           for q in qs_sorted], pa.float64()),
    })


def exact_weighted_quantiles(ds: rd.Dataset, col: str, weight_col: str,
                             qs: list[float], *, log2_buckets: int = 16,
                             gather_limit: int = 4_000_000) -> pa.Table:
    """Exact WEIGHTED quantiles — order statistics over the multiset in
    which each row appears ``weight`` times (integer weights >= 0), by
    the same histogram descent as :func:`exact_quantiles` with weight
    sums in the histogram cells. The selection rule is
    ``smallest v with cumweight(<= v) >= ceil(q * W)`` — quantile_disc's
    convention applied to the expanded multiset, and exactly the
    token-budget curation cut ("the score threshold above which ~ (1-q)
    of all TOKENS live").

    Same scale contract as the unweighted descent: every pass ships only
    fixed histograms; the final gather is bounded by ``gather_limit``
    weighted rows per unresolved target."""
    if not qs:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    proj = ds.select_columns([col, weight_col]).materialize()
    blocks = proj.to_arrow_refs()
    bits = log2_buckets
    n_b = 1 << bits

    def _pairs(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        if col not in t.column_names:  # zero-column empty block
            return np.empty(0, np.uint64), np.empty(0, np.int64)
        arr = t[col].combine_chunks()
        if arr.type != pa.float64():
            arr = pc.cast(arr, pa.float64())
        wcol = t[weight_col].combine_chunks()
        # a null in EITHER column drops the row (SQL-aggregate semantics);
        # a null weight surviving the filter would round-trip through
        # float64-with-NaN and poison the int64 histogram
        ok = pc.and_kleene(
            pc.and_kleene(pc.is_valid(arr), pc.invert(pc.is_nan(arr))),
            pc.is_valid(wcol))
        arr = arr.filter(ok)
        w = pc.cast(wcol.filter(ok), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return _f64_to_key(arr.to_numpy(zero_copy_only=False)), w

    def _hist(t: pa.Table, *, shift: int, prefixes: list[int]) -> pa.Table:
        keys, w = _pairs(t)
        top = shift + bits
        hi = keys >> np.uint64(top) if top < 64 else np.zeros(keys.size, np.uint64)
        out = np.zeros((len(prefixes), n_b), np.int64)
        for i, p in enumerate(prefixes):
            sel = hi == np.uint64(p)
            b = ((keys[sel] >> np.uint64(shift)) & np.uint64(n_b - 1)) \
                .astype(np.int64)
            np.add.at(out[i], b, w[sel])
        return pa.table({"h": pa.array([out.tobytes()], pa.binary()),
                         "n": pa.array([int(w.sum())], pa.int64())})

    shift = 64 - bits
    rows = _pass_rows(blocks, _hist, shift=shift, prefixes=[0])
    W = sum(int(r["n"]) for r in rows)
    if W == 0:
        return pa.table({"q": pa.array(sorted(qs), pa.float64()),
                         "value": pa.array([None] * len(qs), pa.float64())})
    hist = np.zeros(n_b, np.int64)
    for r in rows:
        hist += np.frombuffer(r["h"], np.int64)

    def _narrow(h: np.ndarray, lrank: int) -> tuple[int, int, int]:
        cum = np.cumsum(h)
        b = int(np.searchsorted(cum, lrank + 1))
        before = int(cum[b - 1]) if b else 0
        return b, lrank - before, int(h[b])

    state = []
    for q in sorted(qs):
        rank = max(0, math.ceil(q * W) - 1)      # weighted rank
        b, lr, cnt = _narrow(hist, rank)
        state.append((q, b, shift, lr, cnt))

    while True:
        unresolved = [s for s in state if s[4] > gather_limit and s[2] > 0]
        if not unresolved:
            break
        shift -= bits
        prefixes = sorted({s[1] for s in unresolved})
        rows = _pass_rows(blocks, _hist, shift=shift, prefixes=prefixes)
        hists = np.zeros((len(prefixes), n_b), np.int64)
        for r in rows:
            hists += np.frombuffer(r["h"], np.int64).reshape(len(prefixes), n_b)
        nxt = []
        for q, p, ps, lr, cnt in state:
            if cnt <= gather_limit or ps == 0:
                nxt.append((q, p, ps, lr, cnt))
                continue
            b, nlr, ncnt = _narrow(hists[prefixes.index(p)], lr)
            nxt.append((q, (p << bits) | b, shift, nlr, ncnt))
        state = nxt

    out_vals: dict[float, float] = {}
    for q, p, ps, _lr, cnt in state:
        if cnt > gather_limit and ps == 0:
            out_vals[q] = _key_to_f64(p)
    gather = [s for s in state if s[0] not in out_vals]
    if gather:
        ranges = sorted({(s[1] << s[2],
                          ((s[1] + 1) << s[2]) - 1) for s in gather})
        lo = np.asarray([r[0] for r in ranges], np.uint64)
        hi = np.asarray([r[1] for r in ranges], np.uint64)

        def _gather(t: pa.Table) -> pa.Table:
            keys, w = _pairs(t)
            m = np.zeros(keys.size, bool)
            for a, b in zip(lo, hi):
                m |= (keys >= a) & (keys <= b)
            return pa.table({"k": pa.array(keys[m].view(np.int64), pa.int64()),
                             "w": pa.array(w[m], pa.int64())})

        ks, ws = [], []
        for b in _pass_tables(blocks, _gather):
            if not b.num_rows:
                continue
            ks.append(b["k"].to_numpy().view(np.uint64))
            ws.append(b["w"].to_numpy())
        keys = np.concatenate(ks) if ks else np.zeros(0, np.uint64)
        wts = np.concatenate(ws) if ws else np.zeros(0, np.int64)
        order = np.argsort(keys, kind="stable")
        keys, wts = keys[order], wts[order]
        cum = np.cumsum(wts)
        for q, p, ps, lr, _cnt in gather:
            start = int(np.searchsorted(keys, np.uint64(p << ps), "left"))
            base = int(cum[start - 1]) if start else 0
            i = int(np.searchsorted(cum[start:], base + lr + 1)) + start
            out_vals[q] = _key_to_f64(int(keys[i]))

    qs_sorted = sorted(qs)
    return pa.table({"q": pa.array(qs_sorted, pa.float64()),
                     "value": pa.array([out_vals[q] for q in qs_sorted],
                                       pa.float64())})

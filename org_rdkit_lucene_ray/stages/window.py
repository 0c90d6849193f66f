"""Stream-shaped operators over the ordered ``events`` log.

Ray Data has no event-time watermarks (SURVEY §2.9 notes the reference has
no streaming concerns either); windows are expressed batch-first per the
ray_guide pattern: tumbling windows as partial-aggregate ``map_batches`` +
a small ``groupby`` combine; sessionization as ``groupby(key).map_groups``
over ts-sorted groups. Ordering assumption: rows of one key fit one group
and are sorted inside the group fn — at 100 TB the key-partitioned shuffle
provides exactly that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def tumbling_window_agg(events: rd.Dataset, width_secs: int = 3600,
                        ts_col: str = "ts", key_col: str = "event_type",
                        value_col: str = "value",
                        value_decimals: int | None = None) -> rd.Dataset:
    """count/sum/min/max of ``value`` per (key, window). Pre-aggregated per
    batch before the groupby so the shuffle moves one row per (key, window,
    batch), not one per event.

    ``value_decimals``: when the value column is a d-dp decimal stored as
    float, sum in exact int64 fixed-point (10^d) so the result is
    order-independent (float sums wobble in the last ulp across Ray's
    aggregation-tree orders — the orders_by_segment lesson). min/max are
    selections and need no such treatment."""
    scale = 10 ** value_decimals if value_decimals is not None else None

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        win = ts_us.to_numpy() // (width_secs * 1_000_000)
        vals = t[value_col]
        if scale is not None:
            vals = pa.array(np.round(
                t[value_col].to_numpy(zero_copy_only=False) * scale).astype(np.int64))
        g = (
            pa.table({key_col: t[key_col], "window": pa.array(win.astype(np.int64)),
                      value_col: vals})
            .group_by([key_col, "window"])
            .aggregate([(value_col, "count"), (value_col, "sum"),
                        (value_col, "min"), (value_col, "max")])
        )
        return pa.table({
            key_col: g[key_col],
            "window": g["window"],
            "n_part": pc.cast(g[f"{value_col}_count"], pa.int64()),
            "sum_part": g[f"{value_col}_sum"],
            "min_part": g[f"{value_col}_min"],
            "max_part": g[f"{value_col}_max"],
        })

    combined = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("sum_part", alias_name="sum_value"),
            Min("min_part", alias_name="min_value"),
            Max("max_part", alias_name="max_value"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        sums = t["sum_value"].to_numpy(zero_copy_only=False)
        if scale is not None:
            sums = sums.astype(np.float64) / scale
            mins = t["min_value"].to_numpy(zero_copy_only=False).astype(np.float64) / scale
            maxs = t["max_value"].to_numpy(zero_copy_only=False).astype(np.float64) / scale
        else:
            sums = np.round(sums, 4)
            mins = t["min_value"]
            maxs = t["max_value"]
        return pa.table({
            key_col: t[key_col],
            "window_start": pc.cast(pc.multiply(t["window"], width_secs * 1_000_000),
                                    pa.timestamp("us")),
            "n_events": t["n_events"],
            "sum_value": pa.array(sums),
            "min_value": pa.array(mins) if scale is not None else mins,
            "max_value": pa.array(maxs) if scale is not None else maxs,
        })

    return combined.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(events: rd.Dataset, width_secs: int = 3600,
                       hop_secs: int = 900, ts_col: str = "ts",
                       key_col: str = "event_type", value_col: str = "value",
                       value_decimals: int | None = None) -> rd.Dataset:
    """Hopping (sliding) windows: count/sum/min/max of ``value`` per
    (key, window) where windows of ``width_secs`` start every ``hop_secs``
    — each event lands in ``width/hop`` windows. Tumbling is the
    ``hop == width`` special case (see :func:`tumbling_window_agg`).

    Same partial+final shape: events explode into their covering window
    ids INSIDE ``map_batches`` (a vectorized ``np.repeat``), pre-aggregate
    per (key, window) per batch, tiny ``groupby`` combine — the shuffle
    moves one row per (key, window, batch), so the width/hop expansion
    factor never rides the exchange. Exact fixed-point sums via
    ``value_decimals`` (the orders_by_segment lesson)."""
    if width_secs % hop_secs:
        raise ValueError("width_secs must be a multiple of hop_secs")
    n_w = width_secs // hop_secs
    hop_us = hop_secs * 1_000_000
    scale = 10 ** value_decimals if value_decimals is not None else None

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                        pa.int64()).to_numpy()
        slot = ts_us // hop_us           # last window START slot covering ts
        vals = t[value_col].to_numpy(zero_copy_only=False)
        if scale is not None:
            vals = np.round(vals * scale).astype(np.int64)
        keys = t[key_col].combine_chunks()
        # explode: window start slots [slot - n_w + 1, slot]
        rep = pa.array(np.repeat(np.arange(len(ts_us)), n_w))
        win = (np.repeat(slot, n_w)
               - np.tile(np.arange(n_w - 1, -1, -1), len(ts_us)))
        g = (
            pa.table({key_col: keys.take(rep),
                      "window": pa.array(win.astype(np.int64)),
                      value_col: pa.array(np.repeat(vals, n_w))})
            .group_by([key_col, "window"])
            .aggregate([(value_col, "count"), (value_col, "sum"),
                        (value_col, "min"), (value_col, "max")])
        )
        return pa.table({
            key_col: g[key_col],
            "window": g["window"],
            "n_part": pc.cast(g[f"{value_col}_count"], pa.int64()),
            "sum_part": g[f"{value_col}_sum"],
            "min_part": g[f"{value_col}_min"],
            "max_part": g[f"{value_col}_max"],
        })

    combined = (
        events.select_columns([key_col, ts_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window"])
        .aggregate(
            Sum("n_part", alias_name="n_events"),
            Sum("sum_part", alias_name="sum_value"),
            Min("min_part", alias_name="min_value"),
            Max("max_part", alias_name="max_value"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        sums = t["sum_value"].to_numpy(zero_copy_only=False)
        if scale is not None:
            sums = sums.astype(np.float64) / scale
            mins = pa.array(t["min_value"].to_numpy(zero_copy_only=False)
                            .astype(np.float64) / scale)
            maxs = pa.array(t["max_value"].to_numpy(zero_copy_only=False)
                            .astype(np.float64) / scale)
        else:
            sums = np.round(sums, 4)
            mins = t["min_value"]
            maxs = t["max_value"]
        return pa.table({
            key_col: t[key_col],
            "window_start": pc.cast(pc.multiply(t["window"], hop_us),
                                    pa.timestamp("us")),
            "n_events": t["n_events"],
            "sum_value": pa.array(sums),
            "min_value": mins,
            "max_value": maxs,
        })

    return combined.map_batches(finish, batch_format="pyarrow")


def sessionize(events: rd.Dataset, gap_secs: int = 1800,
               key_col: str = "user_id", ts_col: str = "ts") -> rd.Dataset:
    """Per-key session stats: a new session starts when the gap from the
    previous event exceeds ``gap_secs``. groupby(key) -> sorted map_groups.

    Arrow-native throughout (no per-group pandas conversion), and only
    (key, ts) rides the shuffle — the other event columns are projected
    away before the groupby."""

    def per_user(g: pa.Table) -> pa.Table:
        ts = pc.cast(g[ts_col], pa.timestamp("us")).combine_chunks()
        # compare gaps in MICROSECONDS: the SQL oracle's epoch keeps
        # fractional seconds, so flooring to whole seconds here could flip
        # a session boundary for a gap in (gap_secs, gap_secs + 1)
        ts_us = np.sort(ts.cast(pa.int64()).to_numpy())
        n_sessions = 1 + int(
            (np.diff(ts_us) > gap_secs * 1_000_000).sum()) if ts_us.size else 0
        return pa.table({
            key_col: g[key_col].slice(0, 1).combine_chunks(),
            "n_events": pa.array([ts_us.size], pa.int64()),
            "n_sessions": pa.array([n_sessions], pa.int64()),
            "first_ts": pa.array([ts_us[0]], pa.int64()).cast(pa.timestamp("us")),
            "last_ts": pa.array([ts_us[-1]], pa.int64()).cast(pa.timestamp("us")),
        })

    return (events.select_columns([key_col, ts_col])
            .groupby(key_col).map_groups(per_user, batch_format="pyarrow"))


def grouped_topn(events: rd.Dataset, n: int = 2, key_col: str = "event_type",
                 value_col: str = "value", id_col: str = "event_id") -> rd.Dataset:
    """Top-n rows per group by (value desc, id asc) — the K1/K2 bounded-PQ
    comparator applied to a generic grouped table.

    A PARTIAL top-n runs inside ``map_batches`` before the shuffle (the
    same partial+final shape as ``tumbling_window_agg``): at most
    n x keys x batches rows reach the groupby instead of every event —
    a batch row outside its batch's per-key top-n can't be in the global
    top-n. The final per-group top-n is Arrow-native."""

    def keep_topn(t: pa.Table, is_final: bool) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[
            (key_col, "ascending"), (value_col, "descending"),
            (id_col, "ascending")])
        t = t.take(order)
        kidx = pc.dictionary_encode(
            t[key_col].combine_chunks()).indices.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate([[True], kidx[1:] != kidx[:-1]])) if len(kidx) \
            else np.zeros(0, np.int64)
        bounds = np.concatenate([starts, [len(kidx)]])
        rank = np.arange(len(kidx)) - np.repeat(starts, np.diff(bounds))
        keep = rank < n
        t = t.filter(pa.array(keep))
        if is_final:
            t = t.append_column("rank", pa.array(rank[keep].astype(np.int32)))
        return t

    partial = events.map_batches(
        lambda t: keep_topn(t, False), batch_format="pyarrow")
    # final fold rides a 64-int bucket sort (hash-partition by key), not a
    # sort-shuffle over the key domain — keep_topn already segments
    # multiple keys per block, so whole-key bucket groups fold correctly
    from org_rdkit_lucene_ray.util import append_bucket_column

    return (partial.map_batches(
        lambda t: append_bucket_column(t, key_col), batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(lambda g: keep_topn(g.drop_columns(["_bkt"]), True),
                    batch_format="pyarrow"))


def funnel_steps(events: rd.Dataset, steps: list[str], *,
                 key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 id_col: str = "event_id") -> rd.Dataset:
    """Funnel analysis: how far each user progresses through an ORDERED
    step sequence (view -> click -> purchase). A user completes step k
    iff events of the step types exist at strictly increasing
    (ts, id) positions — the same ordered-subsequence problem as phrase
    search, decided greedily (earliest match per step, which is exact
    for subsequence existence).

    Scale shape: one ``groupby(key)`` exchange of the (key, ts, id,
    type) projection; each group folds locally (sort by (ts, id), one
    ``searchsorted`` per step). Emits ``(user_id, steps_completed)``;
    callers aggregate the per-step conversion counts (a K-row table).
    """
    step_list = list(steps)

    def fold(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g, sort_keys=[(ts_col, "ascending"),
                                              (id_col, "ascending")])
        types = g[type_col].take(order)
        pos_of = {
            st: pc.indices_nonzero(pc.equal(types, st)).to_numpy()
            for st in set(step_list)
        }
        p = 0
        done = 0
        for st in step_list:
            arr = pos_of[st]
            i = int(np.searchsorted(arr, p, side="left"))
            if i >= arr.size:
                break
            p = int(arr[i]) + 1
            done += 1
        return pa.table({
            key_col: g[key_col][:1],          # key type preserved verbatim
            "steps_completed": pa.array([done], pa.int64()),
        })

    proj = events.select_columns([key_col, ts_col, id_col, type_col])
    return proj.groupby(key_col).map_groups(fold, batch_format="pyarrow")

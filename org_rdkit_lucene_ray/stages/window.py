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
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def tumbling_window_agg(events: rd.Dataset, width_secs: int = 3600,
                        ts_col: str = "ts", key_col: str = "event_type",
                        value_col: str = "value") -> rd.Dataset:
    """count/sum/min/max of ``value`` per (key, window). Pre-aggregated per
    batch before the groupby so the shuffle moves one row per (key, window,
    batch), not one per event."""

    def partial(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        win = ts_us.to_numpy() // (width_secs * 1_000_000)
        g = (
            t.append_column("window", pa.array(win.astype(np.int64)))
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
        return pa.table({
            key_col: t[key_col],
            "window_start": pc.cast(pc.multiply(t["window"], width_secs * 1_000_000),
                                    pa.timestamp("us")),
            "n_events": t["n_events"],
            "sum_value": pa.array(np.round(t["sum_value"].to_numpy(zero_copy_only=False), 4)),
            "min_value": t["min_value"],
            "max_value": t["max_value"],
        })

    return combined.map_batches(finish, batch_format="pyarrow")


def sessionize(events: rd.Dataset, gap_secs: int = 1800,
               key_col: str = "user_id", ts_col: str = "ts") -> rd.Dataset:
    """Per-key session stats: a new session starts when the gap from the
    previous event exceeds ``gap_secs``. groupby(key) -> sorted map_groups."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        # compare gaps in MICROSECONDS: the SQL oracle's epoch(ts) keeps
        # fractional seconds, so flooring to whole seconds here could flip a
        # session boundary for a gap in (gap_secs, gap_secs + 1)
        ts_us = g[ts_col].astype("int64").to_numpy()
        new_session = np.concatenate(
            [[1], (np.diff(ts_us) > gap_secs * 1_000_000).astype(np.int64)])
        return pd.DataFrame({
            key_col: [g[key_col].iloc[0]],
            "n_events": [len(g)],
            "n_sessions": [int(new_session.sum())],
            "first_ts": [g[ts_col].min()],
            "last_ts": [g[ts_col].max()],
        })

    return events.groupby(key_col).map_groups(per_user, batch_format="pandas")


def grouped_topn(events: rd.Dataset, n: int = 2, key_col: str = "event_type",
                 value_col: str = "value", id_col: str = "event_id") -> rd.Dataset:
    """Top-n rows per group by (value desc, id asc) — the K1/K2 bounded-PQ
    comparator applied to a generic grouped table."""

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col, id_col], ascending=[False, True]).head(n)
        g = g.copy()
        g["rank"] = np.arange(len(g), dtype=np.int32)
        return g

    return events.groupby(key_col).map_groups(topn, batch_format="pandas")

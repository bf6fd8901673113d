"""Windowed aggregates over the events stream table.

Ray Data is a (streaming-executed) batch engine with no event-time
watermarks (SURVEY.md §2.9: the reference is strictly batch too); windows
are computed as grouped aggregates over a derived window-bucket column.
Tumbling windows = ``groupby(key, floor(epoch/size))``; per-batch partial
pre-aggregation keeps the shuffle small.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Min, Sum


def add_window_bucket(ds, window_s: int = 3600, ts_col: str = "ts"):
    """Append ``window_start`` (epoch seconds, floored to the window)."""
    def f(t: pa.Table) -> pa.Table:
        ts_us = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (ts_us // 1_000_000) // window_s * window_s
        return t.append_column("window_start",
                               pa.array(bucket, type=pa.int64()))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def tumbling_window_counts(events_ds, window_s: int = 3600):
    """events -> (user_id, window_start, n_events, max_value)."""
    with_bucket = add_window_bucket(events_ds, window_s)
    return (with_bucket.groupby(["user_id", "window_start"])
            .aggregate(Count(alias_name="n_events"),
                       Max("value", alias_name="max_value")))


def sessionize(events_ds, gap_s: int = 1800):
    """events -> (user_id, session_id, session_start, session_end, n_events).

    Session windows (gap-based) need ordered per-user state: implemented as
    ``groupby(user_id).map_groups`` with a per-group sort — the partitioning
    assumption is that one user's events fit in one group (true for web-scale
    event data; a single pathological user is capped upstream).
    """
    import pandas as pd

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts").reset_index(drop=True)
        ts_s = g["ts"].astype("int64") // 1_000_000
        new_session = (ts_s.diff().fillna(gap_s + 1) > gap_s).cumsum()
        out = g.groupby(new_session).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        ).reset_index(drop=True)
        out["session_id"] = (
            out["user_id"].astype("int64").astype(str) + "_" +
            out["session_start"].astype("int64").astype(str))
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return events_ds.groupby("user_id").map_groups(
        per_user, batch_format="pandas")

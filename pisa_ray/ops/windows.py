"""Windowed aggregates over an ordered event table.

Ray Data has no event-time windowing; tumbling windows are expressed as a
computed window-start column + grouped aggregate (the batch-engine
equivalent).  Sliding/session windows go through
``groupby(key).map_groups`` over ts-sorted groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(ds, *, ts_col: str = "ts", key_col: str = "event_type",
                    value_col: str = "value", window: str = "1h"):
    """→ (key, window_start, n, sum_value): tumbling count+sum.

    The groupby shuffles per-batch partials (one row per key×window per
    batch), not raw events."""
    from ray.data.aggregate import Count, Sum

    unit = {"1h": "hour", "1d": "day", "1m": "minute"}[window]

    def add_window(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=unit)
        g = pa.TableGroupBy(
            pa.table({key_col: batch[key_col], "window_start": w,
                      value_col: batch[value_col]}),
            [key_col, "window_start"],
        ).aggregate([(value_col, "count"), (value_col, "sum")])
        return pa.table({
            key_col: g.column(key_col),
            "window_start": g.column("window_start"),
            "n_part": g.column(f"{value_col}_count"),
            "sum_part": g.column(f"{value_col}_sum"),
        })

    partials = ds.map_batches(add_window, batch_format="pyarrow")
    agg = partials.groupby([key_col, "window_start"]).aggregate(
        Sum("n_part", alias_name="n"), Sum("sum_part", alias_name="sum_value"))
    return agg.map_batches(
        lambda t: pa.table({
            key_col: t[key_col],
            "window_start": t["window_start"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_value": pc.round(t["sum_value"], 6, round_mode="half_towards_infinity"),
        }),
        batch_format="pyarrow",
    )


def session_windows(ds, *, ts_col: str = "ts", key_col: str = "user_id",
                    gap_seconds: int = 1800):
    """→ per-key session windows (session = events separated by < gap).
    groupby(key).map_groups over ts-sorted groups."""
    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].astype("datetime64[us]")
        gaps = ts.diff().dt.total_seconds().fillna(np.inf)
        sess = (gaps >= gap_seconds).cumsum()
        out = g.groupby(sess).agg(
            session_start=(ts_col, "min"), session_end=(ts_col, "max"),
            n_events=(ts_col, "count"))
        out[key_col] = g[key_col].iloc[0]
        return out.reset_index(drop=True)[
            [key_col, "session_start", "session_end", "n_events"]]

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")

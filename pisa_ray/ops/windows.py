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
    from pisa_ray.utils import round_half_away

    # pc.round leaves ULP noise (23.330000000000002 where SQL ROUND yields
    # the nearest double to 23.33); round_half_away is bit-identical to
    # DuckDB/ANSI ROUND, the repo-wide convention for SQL-visible floats.
    return agg.map_batches(
        lambda t: pa.table({
            key_col: t[key_col],
            "window_start": t["window_start"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_value": pa.array(round_half_away(
                t["sum_value"].to_numpy(zero_copy_only=False), 6)),
        }),
        batch_format="pyarrow",
    )


def session_windows(ds, *, ts_col: str = "ts", key_col: str = "user_id",
                    gap_seconds: int = 1800, num_groups: int = 64):
    """→ per-key session windows (session = events separated by < gap).

    Scale shape: group by ``hash(key) % num_groups`` (COARSE groups — one
    Python call per group, not per user; ``map_groups`` per key would be a
    call-per-user storm at 10⁹ users), then vectorize inside the group:
    lexsort by (key, ts), session breaks where the key changes or the gap
    ≥ threshold, run-length aggregates from the break positions.  Size
    ``num_groups`` ∝ data so a group fits a worker's heap."""
    def add_group(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        if keys.dtype.kind in "iu":
            g = (keys.astype(np.uint64) * np.uint64(2654435761)) \
                % np.uint64(num_groups)
        else:  # string keys: stable vectorized hash
            from pisa_ray.ops.dedup import _stable_u64_column

            g = _stable_u64_column(batch[key_col]) % np.uint64(num_groups)
        return batch.append_column("_g", pa.array(g.astype(np.int64)))

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        keys = g[key_col].to_numpy()
        order = np.lexsort((ts, keys))
        ts, keys = ts[order], keys[order]
        n = len(ts)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (keys[1:] != keys[:-1]) | \
            ((ts[1:] - ts[:-1]) >= gap_seconds * 1_000_000)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], n] - 1
        return pd.DataFrame({
            key_col: keys[starts],
            "session_start": ts[starts].astype("datetime64[us]"),
            "session_end": ts[ends].astype("datetime64[us]"),
            "n_events": np.diff(np.r_[starts, n]).astype(np.int64),
        })

    return (ds.map_batches(add_group, batch_format="pyarrow")
            .groupby("_g").map_groups(sessions, batch_format="pandas"))

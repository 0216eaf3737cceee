"""Windowed aggregates over event streams (batch semantics).

Ray Data has no event-time watermarks; the reference is strictly batch
too (SURVEY.md §2.10). These operators implement the window shapes a
training-data/events pipeline needs over an ordered log:

- tumbling_window: fixed-size buckets of event time per key — a pure
  vectorized bucket-groupby (SQL-expressible, oracle-checkable).
- session_windows: gap-based sessions per key — sort-within-group +
  vectorized gap split inside ``groupby(key).map_groups`` (the ordering
  assumption is per-key, satisfied by the hash groupby).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from graph_data_science_ray.context import configure_ray_data, shuffle_partitions_for


def tumbling_window(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_s: int = 3600,
    num_partitions: int | None = None,
) -> Dataset:
    """Per (key, window) aggregate: n, sum, mean, min, max of value.
    Window start = floor(epoch_seconds / window_s) * window_s (int64)."""
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()

    def bucket(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            secs = pc.divide(pc.cast(ts, pa.int64()), 1_000_000)
        else:
            secs = pc.cast(ts, pa.int64())
        win = pc.multiply(pc.floor(pc.divide(pc.cast(secs, pa.float64()), window_s)), window_s)
        return pa.table(
            {
                key_col: t.column(key_col),
                "window_start": pc.cast(win, pa.int64()),
                value_col: t.column(value_col),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"], num_partitions=num_partitions)
        .aggregate(
            Count(alias_name="n"),
            Sum(value_col, alias_name="sum_value"),
            Mean(value_col, alias_name="mean_value"),
            Min(value_col, alias_name="min_value"),
            Max(value_col, alias_name="max_value"),
        )
    )


def hopping_window(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_s: int = 7200,
    hop_s: int = 3600,
    num_partitions: int | None = None,
) -> Dataset:
    """Hopping (sliding) windows: each event contributes to every window
    [w, w+window_s) with w ≡ 0 (mod hop_s) that covers its timestamp —
    exactly ``window_s // hop_s`` windows per event. Per (key,
    window_start): n, sum_value. ``window_s`` must be a multiple of
    ``hop_s``. The explode is a vectorized per-batch np.repeat (k× rows
    into the same groupby-aggregate shuffle tumbling_window uses), so
    cost scales with the overlap factor k, not with window length."""
    configure_ray_data()
    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    k = window_s // hop_s
    num_partitions = num_partitions or shuffle_partitions_for()

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            secs = pc.divide(pc.cast(ts, pa.int64()), 1_000_000).to_numpy(zero_copy_only=False)
        else:
            secs = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        last = (secs // hop_s) * hop_s  # latest covering window start
        starts = (last[:, None] - np.arange(k, dtype=np.int64)[None, :] * hop_s).ravel()
        keys = np.repeat(t.column(key_col).to_numpy(zero_copy_only=False), k)
        vals = np.repeat(t.column(value_col).to_numpy(zero_copy_only=False), k)
        return pa.table(
            {
                key_col: pa.array(keys),
                "window_start": pa.array(starts, pa.int64()),
                value_col: pa.array(vals),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"], num_partitions=num_partitions)
        .aggregate(
            Count(alias_name="n"),
            Sum(value_col, alias_name="sum_value"),
        )
    )


def session_windows(
    ds: Dataset,
    key_col: str,
    ts_col: str,
    gap_s: int = 1800,
    num_partitions: int | None = None,
) -> Dataset:
    """Gap-based sessions: one output row per (key, session) with
    session_start/session_end (epoch seconds) and n_events. A new session
    starts when the gap to the previous event of the same key > gap_s."""
    configure_ray_data()
    num_partitions = num_partitions or shuffle_partitions_for()

    def sessions(g: pa.Table) -> pa.Table:
        ts = g.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            secs = pc.divide(pc.cast(ts, pa.int64()), 1_000_000).to_numpy(zero_copy_only=False)
        else:
            secs = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        secs = np.sort(secs)
        if secs.shape[0] == 0:
            return pa.table(
                {
                    key_col: pa.array([], g.column(key_col).type),
                    "session_start": pa.array([], pa.int64()),
                    "session_end": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        new = np.empty(secs.shape[0], dtype=bool)
        new[0] = True
        new[1:] = (secs[1:] - secs[:-1]) > gap_s
        sid = np.cumsum(new) - 1
        n_sessions = sid[-1] + 1
        starts = secs[new]
        ends = np.zeros(n_sessions, dtype=np.int64)
        np.maximum.at(ends, sid, secs)
        counts = np.bincount(sid, minlength=n_sessions)
        key_val = g.column(key_col)[0].as_py()
        return pa.table(
            {
                key_col: pa.array([key_val] * n_sessions, g.column(key_col).type),
                "session_start": pa.array(starts, pa.int64()),
                "session_end": pa.array(ends, pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    return ds.groupby(key_col, num_partitions=num_partitions).map_groups(
        sessions, batch_format="pyarrow"
    )

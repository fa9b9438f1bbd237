"""Windowed aggregates + sessionization over an ordered event log.

Ray Data has no event-time window primitive (SURVEY.md §2.10: the reference is
strictly batch too); windows are expressed per the Ray guide's
streaming-shaped pattern — a derived window key + ``groupby``/``aggregate``
for tumbling windows, and ``groupby(key).map_groups`` over ts-sorted groups
for gap sessionization.  Ordering assumption: sessionize sorts each user's
events by (ts, event_id) inside the group fn, so input order is irrelevant.

Money-style values aggregate as integer cents so results are bit-exact
against the DuckDB oracle (float sums are order-dependent).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum


def tumbling_window_agg(
    events: Dataset, window_sec: int = 3600, key: str = "event_type"
) -> Dataset:
    """(ts, key, value) -> per (key, window) event count + exact value-cents sum.

    window_start = floor(epoch(ts) / window_sec) * window_sec (int64 seconds).
    """

    def prep(t: pa.Table) -> pa.Table:
        # pure integer arithmetic (exact, matches the SQL oracle's `//`):
        # window_start_sec = (epoch_us // 1e6) // window_sec * window_sec
        epoch_us = np.asarray(pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False))
        win = (epoch_us // 1_000_000) // window_sec * window_sec
        cents = np.asarray(
            pc.round(pc.multiply(t["value"], 100.0)).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                key: t[key],
                "window_start": pa.array(win, pa.int64()),
                "value_cents": pa.array(cents, pa.int64()),
            }
        )

    return (
        events.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_cents"))
    )


def sessionize(events: Dataset, gap_sec: int = 1800) -> Dataset:
    """Gap-based session windows per user.

    A new session starts when the time since the user's previous event exceeds
    ``gap_sec``.  Output: (user_id, session_id (0-based per user), n_events,
    session_start, session_end) — deterministic via (ts, event_id) ordering.
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        gaps = np.diff(ts).astype("timedelta64[us]").astype(np.int64)
        new_session = np.concatenate([[True], gaps > gap_sec * 1_000_000])
        sid = np.cumsum(new_session) - 1
        out = g.assign(session_id=sid)
        agg = out.groupby("session_id", sort=True).agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        agg = agg.reset_index()
        agg.insert(0, "user_id", g["user_id"].iloc[0])
        return agg

    return events.select_columns(["event_id", "ts", "user_id"]).groupby("user_id").map_groups(
        per_user, batch_format="pandas"
    )

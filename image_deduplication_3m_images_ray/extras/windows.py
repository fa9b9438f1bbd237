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

    One hash-sharded exchange on ``user_id`` with ONE vectorized Python call
    per shard (``util.sharded_group_map``) — not one call per user, which at
    10^8 users would mean 10^8 pandas-group invocations (the round-1 design).
    Inside a shard, session boundaries for ALL users fall out of a single
    sorted segmented pass.
    """
    gap_us = gap_sec * 1_000_000

    def shard_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        n = len(g)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gaps = np.zeros(n, dtype=np.int64)
        if n > 1:
            gaps[1:] = (ts[1:] - ts[:-1]).astype("timedelta64[us]").astype(np.int64)
        new_session = new_user | (gaps > gap_us)
        sess_global = np.cumsum(new_session) - 1
        seg_id = np.cumsum(new_user) - 1
        first_sess_of_user = sess_global[np.nonzero(new_user)[0]]
        session_id = sess_global - first_sess_of_user[seg_id]
        s_idx = np.nonzero(new_session)[0]
        ends = np.append(s_idx[1:], n) - 1
        return pd.DataFrame(
            {
                "user_id": uid[s_idx],
                "session_id": session_id[s_idx],
                "n_events": (np.append(s_idx[1:], n) - s_idx).astype(np.int64),
                "session_start": ts[s_idx],
                "session_end": ts[ends],
            }
        )

    from ..util import sharded_group_map

    return sharded_group_map(
        events.select_columns(["event_id", "ts", "user_id"]),
        ["user_id"],
        shard_fn,
        batch_format="pandas",
    )

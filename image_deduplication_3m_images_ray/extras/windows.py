"""Windowed aggregates + sessionization over an ordered event log.

Ray Data has no event-time window primitive (SURVEY.md §2.10: the reference is
strictly batch too); windows are expressed per the Ray guide's
streaming-shaped pattern — a derived window key + ``groupby``/``aggregate``
for tumbling windows, and ``groupby(key).map_groups`` over ts-sorted groups
for gap sessionization.  Ordering assumption: sessionize sorts each user's
events by (ts, event_id) inside the group fn, so input order is irrelevant.

Money-style values aggregate as integer cents so results are bit-exact
against the DuckDB oracle (float sums are order-dependent).  The cents
conversion is ``floor(v * 100 + 0.5)`` — an explicitly pinned tie convention
(half-up) used verbatim in the SQL oracles, because pyarrow ``pc.round``
(half-to-even) and DuckDB ``round`` (half away from zero) disagree on exact
.5 products.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Sum


def _cents(value_col) -> np.ndarray:
    """float dollars -> int64 cents with the pinned half-up tie convention
    (``floor(v*100 + 0.5)`` — matches the SQL oracles verbatim; see module
    docstring)."""
    v = np.asarray(pc.cast(value_col, pa.float64()).to_numpy(zero_copy_only=False))
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


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
        cents = _cents(t["value"])
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


def sliding_window_agg(
    events: Dataset,
    window_sec: int = 3600,
    hop_sec: int = 900,
    key: str = "event_type",
) -> Dataset:
    """Sliding (hopping) window aggregate: per (key, window) count + cents sum.

    Windows start at every multiple of ``hop_sec`` and span ``window_sec``
    (which must be a multiple of ``hop_sec``); an event at epoch-second ``t``
    therefore lands in exactly ``window_sec / hop_sec`` windows.  The fan-out
    happens inside ``map_batches`` with one ``np.repeat`` (a constant,
    known-at-plan-time expansion — no per-row loop), and the aggregation is
    the same single ``groupby`` exchange as the tumbling case, so the shuffle
    volume is (fan-out x) the PRE-aggregated per-batch rows, not raw events.
    """
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec")
    nwin = window_sec // hop_sec

    def prep(t: pa.Table) -> pa.Table:
        epoch_us = np.asarray(pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False))
        base = (epoch_us // 1_000_000) // hop_sec * hop_sec
        cents = _cents(t["value"])
        n = len(t)
        idx = np.repeat(np.arange(n, dtype=np.int64), nwin)
        offs = np.tile(np.arange(nwin, dtype=np.int64) * hop_sec, n)
        return pa.table(
            {
                key: pc.take(t[key], pa.array(idx, pa.int64())),
                "window_start": pa.array(np.repeat(base, nwin) - offs, pa.int64()),
                "value_cents": pa.array(np.repeat(cents, nwin), pa.int64()),
            }
        )

    return (
        events.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="sum_cents"))
    )


def asof_join_latest(
    left: Dataset,
    right: Dataset,
    by: str = "user_id",
    on: str = "ts",
    payload: dict | None = None,
    tiebreak: str = "event_id",
    num_shards: int = 64,
) -> Dataset:
    """As-of join: attach to each left row the LATEST right row at-or-before it.

    For every left row, find the right row with the same ``by`` key and the
    greatest ``on`` value satisfying ``right.on <= left.on`` (inclusive); ties
    on ``on`` break to the largest ``tiebreak``.  ``payload`` maps right
    columns to output names (values are carried as float64 — exact for
    doubles and for integers < 2^53); a ``lag_us`` column (microseconds
    between the matched right row and the left row) is always added.
    Unmatched left rows keep -1 / 0.0 fillers so the output schema is
    null-free and deterministic.

    Ray Data has no as-of primitive, so this is the documented custom-operator
    composition (task brief "custom operators"): ONE tagged-union exchange
    hash-sharded on ``by`` (rows with equal keys co-locate;
    ``util.sharded_group_map``), then one vectorized pass per shard — sort by
    (by, on, side) with right rows first at equal ``on``, take a global
    running-maximum of right-row indices, and reject carries that cross a
    ``by``-segment boundary.  No per-group Python calls, no driver
    materialization; the partitioning assumption is only that a single key's
    rows fit in one shard task (same as any equi-join on ``by``).
    """
    payload = payload or {}

    ls = left.schema()
    lcols = list(ls.names)
    ltypes = dict(zip(ls.names, ls.types))
    out_payload = list(payload.values())

    def filler(n: int, typ) -> pa.Array:
        # numeric filler is 0 (not null) so the pandas group format keeps
        # integer dtypes intact (nulls degrade int64 -> float64)
        if not isinstance(typ, pa.DataType):  # Ray may report numpy dtypes
            typ = pa.from_numpy_dtype(typ)
        if pa.types.is_integer(typ) or pa.types.is_floating(typ):
            return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()), typ)
        if pa.types.is_timestamp(typ):
            return pa.array(np.zeros(n, dtype=np.int64), pa.int64()).cast(typ)
        return pa.nulls(n, type=typ)

    def prep_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in lcols}
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8), pa.int8())
        cols["__tb"] = pa.array(np.zeros(len(t), dtype=np.int64), pa.int64())
        for out in out_payload:
            cols[f"__p_{out}"] = pa.array(np.zeros(len(t)), pa.float64())
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in lcols:
            cols[c] = t[c] if c in (by, on) else filler(len(t), ltypes[c])
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        cols["__tb"] = pc.cast(t[tiebreak], pa.int64())
        for src, out in payload.items():
            cols[f"__p_{out}"] = pc.cast(t[src], pa.float64())
        return pa.table(cols)

    lt = left.map_batches(prep_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns(
        sorted({by, on, tiebreak, *payload.keys()})
    ).map_batches(prep_right, batch_format="pyarrow", zero_copy_batch=True)

    def shard_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([by, on, "__side", "__tb"], kind="mergesort")
        key = g[by].to_numpy()
        ts = g[on].to_numpy()
        side = g["__side"].to_numpy()
        n = len(g)
        is_right = side == 0
        r = np.where(is_right, np.arange(n), -1)
        last_right = np.maximum.accumulate(r) if n else r
        new_key = np.ones(n, dtype=bool)
        new_key[1:] = key[1:] != key[:-1]
        seg_starts = np.nonzero(new_key)[0]
        seg_id = np.cumsum(new_key) - 1
        seg_start_of_row = seg_starts[seg_id] if n else np.zeros(0, dtype=np.int64)
        lmask = ~is_right
        li = np.nonzero(lmask)[0]
        match = last_right[li]
        valid = match >= seg_start_of_row[li]
        out = {c: g[c].to_numpy()[li] for c in lcols}
        lag = np.full(len(li), -1, dtype=np.int64)
        if len(li):
            m = match[valid]
            lag[valid] = (
                (ts[li[valid]] - ts[m]).astype("timedelta64[us]").astype(np.int64)
            )
        for outc in out_payload:
            vals = g[f"__p_{outc}"].to_numpy()
            col = np.zeros(len(li), dtype=np.float64)
            col[valid] = vals[match[valid]]
            out[outc] = col
        ref = np.full(len(li), -1, dtype=np.int64)
        if len(li):
            ref[valid] = g["__tb"].to_numpy()[match[valid]]
        out["ref_" + tiebreak] = ref
        out["lag_us"] = lag
        return pd.DataFrame(out)

    from ..util import sharded_group_map

    return sharded_group_map(
        lt.union(rt), [by], shard_fn, num_shards=num_shards, batch_format="pandas"
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


def rolling_agg(
    events: Dataset,
    key: str = "user_id",
    window_rows: int = 4,
    num_shards: int = 64,
) -> Dataset:
    """Per-key rolling row-window aggregate (trailing ``window_rows`` rows).

    For each event, the sum of integer cents and the row count over the
    current row plus the ``window_rows - 1`` preceding rows of the SAME key,
    ordered by (ts, event_id) — SQL ``ROWS BETWEEN n PRECEDING AND CURRENT
    ROW``.  Integer-exact (cents), so the DuckDB oracle hash-matches.

    One ``key``-sharded exchange; inside a shard ALL keys resolve in a single
    sorted pass: one global cumulative sum, per-row window start =
    max(row - window_rows + 1, segment start), rolling value = one gather
    difference.  No per-key Python, no per-row loop.
    """

    def prep(t: pa.Table) -> pa.Table:
        cents = _cents(t["value"])
        return pa.table(
            {
                "event_id": t["event_id"],
                key: t[key],
                "ts": t["ts"],
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def shard_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, "ts", "event_id"], kind="mergesort").reset_index(drop=True)
        k = g[key].to_numpy()
        cents = g["cents"].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        new[1:] = k[1:] != k[:-1]
        seg_starts = np.nonzero(new)[0]
        seg_id = np.cumsum(new) - 1
        seg_start_of_row = seg_starts[seg_id] if n else np.zeros(0, np.int64)
        i = np.arange(n, dtype=np.int64)
        j = np.maximum(i - window_rows + 1, seg_start_of_row)
        cum = np.concatenate(([0], np.cumsum(cents, dtype=np.int64)))
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                key: k,
                "ts": g["ts"],
                "roll_sum_cents": cum[i + 1] - cum[j],
                "roll_n": (i + 1 - j).astype(np.int64),
            }
        )

    from ..util import sharded_group_map

    prepped = events.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_group_map(
        prepped, [key], shard_fn, num_shards=num_shards, batch_format="pandas"
    )

"""Small Dataset helpers shared across stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

_U64 = np.uint64
_MIX_P = _U64(0x9E3779B97F4A7C15)


def rename_columns(ds: Dataset, mapping: dict) -> Dataset:
    """Rename columns by NAME (not position) via a zero-copy batch map."""

    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sharded_group_map(
    ds: Dataset,
    key_cols: list,
    fn,
    num_shards: int = 64,
    batch_format: str = "numpy",
) -> Dataset:
    """Group-by-key with ONE Python call per hash shard instead of per group.

    ``ds.groupby(key).map_groups(fn)`` invokes ``fn`` once per group — ruinous
    when groups number in the millions (LSH buckets, candidate pairs).  Rows
    with equal keys land in the same shard (shard = mix(keys) % num_shards),
    so ``fn`` receives WHOLE groups and can do vectorized segmented processing
    (lexsort + boundaries + reduceat) across all of its groups at once.

    ``key_cols`` must be integer-typed columns.  ``num_shards`` bounds
    per-task group size: pick ~ dataset_rows / target_rows_per_task at scale.
    ``fn`` receives the shard without the helper's shard column and must not
    depend on row order.
    """
    from .functions.hashing import splitmix64

    def add_shard(t: pa.Table) -> pa.Table:
        h = np.zeros(len(t), dtype=_U64)
        for c in key_cols:
            v = np.asarray(t[c].to_numpy(zero_copy_only=False)).astype(_U64)
            h = splitmix64(h * _MIX_P ^ v)
        return t.append_column(
            "__shard", pa.array((h % _U64(num_shards)).astype(np.int32), pa.int32())
        )

    def strip(group):
        if isinstance(group, dict):
            group = {k: v for k, v in group.items() if k != "__shard"}
        elif isinstance(group, pa.Table):  # batch_format="pyarrow"
            group = group.drop_columns(["__shard"])
        else:  # pandas
            group = group.drop(columns="__shard")
        return fn(group)

    sharded = ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    return sharded.groupby("__shard").map_groups(strip, batch_format=batch_format)


def shard_attach(
    left: Dataset,
    right: Dataset,
    key: str,
    payload: dict,
    num_shards: int = 64,
    how: str = "inner",
) -> Dataset:
    """Hash-partitioned equi-join: attach ``right``'s payload columns to ``left``.

    ``key`` is an integer column present in both sides; ``right`` must be
    unique on it (a profile/dimension table).  ``payload`` maps right-column
    -> output-column names.  Implemented as a tagged union + one sort-based
    shard groupby + per-shard vectorized ``searchsorted`` mapping — measured
    several times cheaper than the actor-based ``Dataset.join`` at
    small-to-medium scale while hash-partitioning the same way at large scale
    (SURVEY.md §2.4 J1 "repartition join").
    """
    def as_arrow_type(t):
        # Ray reports Python types for pandas-backed blocks (str -> object)
        if isinstance(t, pa.DataType):
            return t
        if t in (str, object):
            return pa.string()
        if t is bytes:
            return pa.binary()
        if t is int:
            return pa.int64()
        if t is float:
            return pa.float64()
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    ls = left.schema()
    rs = right.schema()
    left_cols = list(ls.names)
    left_types = {n: as_arrow_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: as_arrow_type(t) for n, t in zip(rs.names, rs.types)}
    payload_types = {out: rtypes[src] for src, out in payload.items()}

    def filler(n: int, typ: pa.DataType) -> pa.Array:
        # numeric filler must be 0, not null: a numeric column with nulls
        # degrades to float64 in the numpy group format, corrupting uint64 ids
        if pa.types.is_integer(typ) or pa.types.is_floating(typ):
            return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()), typ)
        return pa.nulls(n, type=typ)

    def prep_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in left_cols}
        for out, typ in payload_types.items():
            cols[out] = filler(len(t), typ)
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in left_cols:
            cols[c] = t[key] if c == key else filler(len(t), left_types[c])
        for src, out in payload.items():
            cols[out] = t[src]
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    lt = left.map_batches(prep_left, batch_format="pyarrow", zero_copy_batch=True)
    rt = right.select_columns([key, *payload.keys()]).map_batches(
        prep_right, batch_format="pyarrow", zero_copy_batch=True
    )
    out_payload = list(payload.values())

    def join_shard(g: dict) -> dict:
        side = np.asarray(g["__side"], dtype=np.int8)
        keys = np.asarray(g[key]).astype(np.uint64)
        prof = side == 0
        pk = keys[prof]
        order = np.argsort(pk, kind="stable")
        pk = pk[order]
        lmask = ~prof
        lk = keys[lmask]
        if len(pk):
            idx_c = np.minimum(np.searchsorted(pk, lk), len(pk) - 1)
            matched = pk[idx_c] == lk
        else:
            idx_c = np.zeros(len(lk), dtype=np.int64)
            matched = np.zeros(len(lk), dtype=bool)
        if how == "inner":
            take_left = np.nonzero(lmask)[0][matched]
            gather = order[idx_c[matched]] if len(pk) else np.empty(0, dtype=np.int64)
        else:  # left_outer: unmatched keep the filler values from left prep
            take_left = np.nonzero(lmask)[0]
            gather = np.where(matched, order[idx_c] if len(pk) else -1, -1)
        out = {}
        for c in left_cols:
            out[c] = np.asarray(g[c])[take_left]
        prof_rows = np.nonzero(prof)[0]
        for c in out_payload:
            vals = np.asarray(g[c])
            if how == "inner":
                out[c] = vals[prof_rows[gather]]
            else:
                col = np.asarray(g[c])[take_left]  # nulls from left prep
                hit = gather >= 0
                col[hit] = vals[prof_rows[gather[hit]]]
                out[c] = col
        return out

    return sharded_group_map(lt.union(rt), [key], join_shard, num_shards=num_shards)


def segment_bounds(sorted_keys: np.ndarray) -> np.ndarray:
    """Start indices of each equal-key run in a sorted array, plus the end."""
    n = len(sorted_keys)
    if n == 0:
        return np.zeros(1, dtype=np.int64)
    change = np.nonzero(sorted_keys[1:] != sorted_keys[:-1])[0] + 1
    return np.concatenate([[0], change, [n]]).astype(np.int64)


def filter_out_ids(
    ds: Dataset,
    drops: Dataset,
    id_col: str = "doc_id",
    drops_col: str = "doc_id",
    broadcast_max_drops: int = 5_000_000,
    num_shards: int = 64,
    batch_size: int = 1024,
) -> Dataset:
    """Anti-semi-join on an integer id: drop every ``ds`` row whose ``id_col``
    appears in ``drops``'s ``drops_col`` (which must be DISTINCT and
    uint64-castable).

    The size-gated two-plan contract shared by :func:`dedup_ops.subtract_corpus`
    and :func:`setsim.fuzzy_subtract`: up to ``broadcast_max_drops`` the drop
    set broadcasts ONCE as a sorted uint64 array (8 B/drop, an object-store
    object — not driver-heap-bounded state) and each batch filters map-side
    with a searchsorted membership test; above it, a hash-sharded marker
    attach (:func:`shard_attach`) reshuffles ``ds`` once instead.  ``drops``
    is materialized here (it is counted AND consumed)."""
    import pyarrow.compute as pc
    import ray as _ray

    pinned = drops.materialize()
    n_drops = pinned.count()
    if n_drops == 0:
        return ds
    if n_drops <= broadcast_max_drops:
        parts = [
            np.asarray(t[drops_col].to_numpy(zero_copy_only=False), dtype=_U64)
            for t in _ray.get(pinned.to_arrow_refs())
            if t.num_rows
        ]
        drop_ids = np.sort(np.concatenate(parts))
        dref = _ray.put(drop_ids)

        def keep(t: pa.Table) -> pa.Table:
            ids = np.asarray(
                pc.cast(t[id_col], pa.uint64()).to_numpy(zero_copy_only=False),
                dtype=_U64,
            )
            d = _ray.get(dref)
            pos = np.searchsorted(d, ids)
            pos[pos == len(d)] = 0
            return t.filter(pa.array(d[pos] != ids))

        return ds.map_batches(
            keep, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
    # scale path: hash-sharded marker attach, then filter
    marked = pinned.map_batches(
        lambda t: pa.table(
            {
                "__sid": pc.cast(t[drops_col], pa.uint64()),
                "dropped": pa.array(np.ones(len(t), np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def add_key_col(t: pa.Table) -> pa.Table:
        return t.append_column("__sid", pc.cast(t[id_col], pa.uint64()))

    keyed = ds.map_batches(add_key_col, batch_format="pyarrow", zero_copy_batch=True)
    out = shard_attach(
        keyed,
        marked,
        key="__sid",
        payload={"dropped": "dropped"},
        num_shards=num_shards,
        how="left_outer",
    )
    return out.map_batches(
        lambda t: t.filter(pc.equal(t["dropped"], 0)).drop_columns(
            ["__sid", "dropped"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

"""Relational custom operators the brief names explicitly: grouped top-k and
a (fixed-width) range join.

Both follow the repo's standard scale shape: a per-batch vectorized partial
pass (combiner) where semantics allow, then ONE hash-sharded exchange with one
vectorized Python call per shard (``util.sharded_group_map``) — never one call
per group, never a driver-side materialization.  Reference analogs: O2/O3
top-k selection (/root/reference/modules/deduplication.py best-of-cluster
selection) and the J1 key->features lookup family (SURVEY.md §2.4), extended
to inequality predicates as the task brief's "range join" custom operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.hashing import _ranges, hash_tokens
from ..util import segment_bounds, sharded_group_map


def _topk_select(
    kcode: np.ndarray,
    value: np.ndarray,
    tiebreak: np.ndarray,
    k: int,
    ascending: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Row indices of the top-``k`` rows per key (value desc — or asc with
    ``ascending`` — then tiebreak asc), plus each kept row's 1-based rank.
    One lexsort, no per-group loop.  Descending negates the value, so it
    requires an int64-safe numeric; ascending sorts the raw values and is
    safe for full-range uint64 (hash) keys."""
    if not ascending:
        if np.issubdtype(value.dtype, np.unsignedinteger):
            value = value.astype(np.int64)
        value = -value
    order = np.lexsort((tiebreak, value, kcode))
    ks = kcode[order]
    n = len(ks)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    starts = segment_bounds(ks)
    is_start = np.zeros(n, dtype=bool)
    is_start[starts[:-1]] = True
    seg_id = np.cumsum(is_start) - 1
    rank = np.arange(n, dtype=np.int64) - starts[:-1][seg_id]
    keep = rank < k
    return order[keep], rank[keep] + 1


def group_topk(
    ds: Dataset,
    key: str,
    value: str,
    k: int,
    tiebreak: str,
    num_shards: int = 64,
    ascending: bool = False,
) -> Dataset:
    """Top-``k`` rows per ``key`` group by ``value`` desc (``tiebreak`` asc).

    Equivalent to SQL ``row_number() OVER (PARTITION BY key ORDER BY value
    DESC, tiebreak ASC) <= k``; the output keeps the input columns and adds
    the 1-based ``rank``.  ``value`` and ``tiebreak`` must be numeric and
    NaN-free (ordering with NaN is undefined); ``key`` may be string or int.

    Scale shape: a vectorized per-batch partial top-k first (each batch
    forwards at most ``k`` rows per key it contains — a valid combiner because
    the global top-k is a subset of the union of per-batch top-ks under the
    same total order), so the single ``key``-sharded exchange moves
    O(k * n_keys) rows, not the whole table.
    """
    def add_kcode(t: pa.Table) -> pa.Table:
        col = t[key]
        if pa.types.is_integer(col.type):
            kc = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)
        else:
            kc = hash_tokens(
                np.asarray(col.to_numpy(zero_copy_only=False), dtype=object)
            ).astype(np.int64)
        return t.append_column("__k", pa.array(kc, pa.int64()))

    def partial(t: pa.Table) -> pa.Table:
        t = add_kcode(t)
        _, kc = np.unique(
            np.asarray(t[key].to_numpy(zero_copy_only=False)), return_inverse=True
        )
        val = np.asarray(t[value].to_numpy(zero_copy_only=False))
        tb = np.asarray(t[tiebreak].to_numpy(zero_copy_only=False))
        keep, _ = _topk_select(kc, val, tb, k, ascending)
        return t.take(np.sort(keep))

    def final_shard(g: pd.DataFrame) -> pd.DataFrame:
        # group by the REAL key values, not the shard hash — a 64-bit hash
        # collision must co-locate keys (same shard), never merge them
        _, kc = np.unique(g[key].to_numpy(), return_inverse=True)
        val = g[value].to_numpy()
        tb = g[tiebreak].to_numpy()
        keep, rank = _topk_select(kc, val, tb, k, ascending)
        out = g.iloc[keep].drop(columns="__k").reset_index(drop=True)
        out["rank"] = rank
        return out

    pruned = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_group_map(
        pruned, ["__k"], final_shard, num_shards=num_shards, batch_format="pandas"
    )


def range_join_window(
    left: Dataset,
    right: Dataset,
    by: str = "user_id",
    on: str = "ts",
    width_sec: int = 3600,
    left_id: str = "event_id",
    right_id: str = "event_id",
    num_shards: int = 64,
) -> Dataset:
    """Fixed-width range join: ALL (left, right) pairs with the same ``by`` key
    and ``right.on <= left.on <= right.on + width_sec`` (a trailing window).

    Unlike :func:`asof_join_latest` (latest match only), this emits every
    match — SQL ``l JOIN r ON l.by = r.by AND r.on <= l.on AND l.on <= r.on +
    width``.  Output: (left_id, by, ``ts_us`` = left epoch microseconds,
    ``ref_<right_id>``, ``offset_us`` = microseconds since the matched right
    row).

    One ``by``-sharded exchange; per shard, both sides are encoded into a
    single int64 key (user-code * span + relative-time) so BOTH window bounds
    resolve with two global ``searchsorted`` calls and the matches emit with
    one ``np.repeat`` — no per-user loop.  The encode needs
    n_keys_in_shard * (time_span + width) < 2**63 us; a shard that exceeds it
    raises (pick a larger ``num_shards``) rather than silently truncating.
    """
    width_us = width_sec * 1_000_000

    def prep(side: int):
        id_col = left_id if side else right_id

        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__id": pc.cast(t[id_col], pa.int64()),
                    by: t[by],
                    "__ts": pc.cast(pc.cast(t[on], pa.timestamp("us")), pa.int64()),
                    "__side": pa.array(np.full(len(t), side, dtype=np.int8), pa.int8()),
                }
            )

        return fn

    lt = left.map_batches(prep(1), batch_format="pyarrow", zero_copy_batch=True)
    rt = right.map_batches(prep(0), batch_format="pyarrow", zero_copy_batch=True)

    def shard_fn(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["__id"].to_numpy()
        key = g[by].to_numpy()
        ts = g["__ts"].to_numpy().astype(np.int64)
        side = g["__side"].to_numpy()
        _, kcode = np.unique(key, return_inverse=True)
        t0 = int(ts.min()) if len(ts) else 0
        trel = ts - t0 + width_us  # >= width so the low bound never bleeds
        span = int(trel.max()) + 1 if len(ts) else 1
        n_keys = int(kcode.max()) + 1 if len(ts) else 1
        if n_keys * span >= 2**62:
            raise ValueError(
                f"range_join_window shard too wide to encode "
                f"({n_keys} keys x {span} us span); raise num_shards"
            )
        enc = kcode.astype(np.int64) * span + trel
        is_r = side == 0
        rorder = np.argsort(enc[is_r], kind="stable")
        renc = enc[is_r][rorder]
        rids = ids[is_r][rorder]
        rts = ts[is_r][rorder]
        li = np.nonzero(~is_r)[0]
        lo = np.searchsorted(renc, enc[li] - width_us, side="left")
        hi = np.searchsorted(renc, enc[li], side="right")
        counts = hi - lo
        pos = counts > 0  # _ranges requires strictly positive counts
        take_l = np.repeat(li[pos], counts[pos])
        take_r = np.repeat(lo[pos], counts[pos]) + _ranges(counts[pos])
        return pd.DataFrame(
            {
                left_id: ids[take_l],
                by: key[take_l],
                "ts_us": ts[take_l],
                f"ref_{right_id}": rids[take_r],
                "offset_us": ts[take_l] - rts[take_r],
            }
        )

    return sharded_group_map(
        lt.union(rt), [by], shard_fn, num_shards=num_shards, batch_format="pandas"
    )


def latest_by_key(
    ds: Dataset,
    keys: list[str],
    order_col: str,
    tiebreak: str,
    num_shards: int = 64,
) -> Dataset:
    """Keep the single latest row per composite key (recrawl dedup).

    The web-pipeline "keep the newest crawl of each URL" operator: for every
    distinct ``keys`` tuple, keep the row with the greatest ``order_col``
    (a timestamp or numeric), ties broken by greatest ``tiebreak`` (a
    NaN-free numeric — typically the row id).  Equivalent to SQL
    ``row_number() OVER (PARTITION BY keys ORDER BY order_col DESC,
    tiebreak DESC) = 1``; output keeps exactly the input columns.

    Reference analog: the already-processed filter / first-wins grouping the
    reference applies per blob path (/root/reference/modules/
    deduplication.py:240-249) — here generalized to LAST-wins by an explicit
    ordering column.  Scale shape = :func:`group_topk`'s: a per-batch
    vectorized argmax combiner forwards <= 1 row per key per batch, then one
    key-sharded exchange finishes; both stages code keys EXACTLY (batch- or
    shard-local factorize of the real values) so a 64-bit hash collision can
    only co-locate keys, never merge them.
    """

    def key_codes_exact(cols: list[np.ndarray]) -> np.ndarray:
        """Collision-free batch-local codes for the key tuple: factorize each
        column, then mixed-radix combine the (small) per-column code spaces."""
        code = np.zeros(len(cols[0]) if cols else 0, dtype=np.int64)
        for c in cols:
            _, inv = np.unique(c, return_inverse=True)
            n = int(inv.max()) + 1 if len(inv) else 1
            code = code * n + inv
        return code

    def neg_order(vals: np.ndarray) -> np.ndarray:
        v = np.asarray(vals)
        if np.issubdtype(v.dtype, np.datetime64):
            v = v.astype("int64")
        return v

    def partial(t: pa.Table) -> pa.Table:
        cols = [np.asarray(t[k].to_numpy(zero_copy_only=False)) for k in keys]
        kc = key_codes_exact(cols)
        val = neg_order(t[order_col].to_numpy(zero_copy_only=False))
        tb = -np.asarray(t[tiebreak].to_numpy(zero_copy_only=False), dtype=np.int64)
        keep, _ = _topk_select(kc, val, tb, 1)
        # shard key: hash-mix the key columns (collisions co-locate only)
        h = np.zeros(len(t), dtype=np.uint64)
        for c in cols:
            if np.issubdtype(c.dtype, np.integer):
                hv = c.astype(np.uint64)
            else:
                hv = hash_tokens(c.astype(object))
            h = _mix_u64(h, hv)
        out = t.append_column("__k", pa.array(h.astype(np.int64), pa.int64()))
        return out.take(np.sort(keep))

    def final_shard(g: pd.DataFrame) -> pd.DataFrame:
        cols = [g[k].to_numpy() for k in keys]
        kc = key_codes_exact(cols)
        val = neg_order(g[order_col].to_numpy())
        tb = -g[tiebreak].to_numpy().astype(np.int64)
        keep, _ = _topk_select(kc, val, tb, 1)
        return g.iloc[np.sort(keep)].drop(columns="__k").reset_index(drop=True)

    pruned = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_group_map(
        pruned, ["__k"], final_shard, num_shards=num_shards, batch_format="pandas"
    )


def _mix_u64(h: np.ndarray, v: np.ndarray) -> np.ndarray:
    from ..functions.hashing import splitmix64

    return splitmix64(h * np.uint64(0x9E3779B97F4A7C15) ^ v.astype(np.uint64))


def _md5_id_column(t: pa.Table, id_col: str) -> np.ndarray:
    """Content hash of the stringified id — equals DuckDB
    ``md5_number_lower(CAST(id AS VARCHAR))``, so every sampling decision
    built on it is exactly SQL-checkable (and stable across runs, machines
    and partitionings, unlike a seeded RNG over nondeterministic row order)."""
    from ..functions.hashing import md5_u64

    ids = pc.cast(t[id_col], pa.string()).to_pylist()
    return md5_u64(ids)


def sample_uniform(ds: Dataset, id_col: str = "doc_id", mod: int = 10, keep: int = 3) -> Dataset:
    """Deterministic ``keep``/``mod`` uniform sample: keep rows whose id-hash
    residue mod ``mod`` is < ``keep``.

    Embarrassingly parallel (one stateless map_batches, no shuffle, no
    driver state) and exactly reproducible — the property a 100 TB curation
    pipeline needs for resumable / auditable sampling.
    """

    def fn(t: pa.Table) -> pa.Table:
        h = _md5_id_column(t, id_col)
        return t.filter(pa.array(h % np.uint64(mod) < np.uint64(keep)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def importance_sample(
    ds: Dataset, weight_col: str, id_col: str = "doc_id"
) -> Dataset:
    """Deterministic per-row Bernoulli(weight) keep: a row survives iff
    ``md5(id) mod 2^63, as a [0, 1) double, < weight``.

    The quality-weighted soft-filtering step (keep high-quality docs with
    probability ~1, low-quality with probability ~w) with every property a
    resumable 100 TB pipeline needs: stateless, shuffle-free, and the SAME
    rows survive on every run, machine and partitioning — plus SQL-exact
    (the uint63 -> double cast rounds identically in numpy and DuckDB, and
    dividing by 2^63 is exact).  Weights outside [0, 1] behave as clamped:
    w <= 0 never keeps, w >= 1 always keeps.
    """

    def fn(t: pa.Table) -> pa.Table:
        h = (_md5_id_column(t, id_col) % np.uint64(2**63)).astype(
            np.float64
        ) / float(2**63)
        w = np.asarray(
            t[weight_col].to_numpy(zero_copy_only=False), dtype=np.float64
        )
        return t.filter(pa.array(h < w))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def hash_split(
    ds: Dataset,
    fractions: dict,
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> Dataset:
    """Deterministic train/val/test assignment by id-hash bucket.

    ``fractions`` maps split name -> fraction (must sum to 1.0 within 1e-9);
    each row's bucket is ``md5(id) % buckets`` and splits own contiguous
    bucket ranges in dict order, cut at ``round(cum_fraction * buckets)``.
    Embarrassingly parallel, no shuffle, no driver state: the same row lands
    in the same split on every run, machine, and partitioning — the property
    a 100 TB corpus needs so a later re-run (or a different engine) can
    reproduce the exact eval holdout.  Rounding note: a fraction smaller
    than ``1/buckets`` can round to an empty range — raise ``buckets``
    for fine splits.

    Output: the input columns plus ``bucket`` (int64) and ``split`` (string).
    Reference analog: the reference's deterministic test-path routing
    predicate (/root/reference/modules/blob_manager.py) generalized to
    proportional holdout assignment.
    """
    if not fractions:
        raise ValueError("hash_split: fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"hash_split: fractions sum to {total}, expected 1.0")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("hash_split: fractions must be >= 0")
    names = list(fractions)
    cum = 0.0
    cuts = []  # exclusive upper bucket bound per split
    for n in names:
        cum += fractions[n]
        cuts.append(int(round(cum * buckets)))
    cuts[-1] = buckets  # guard float drift on the last edge
    bounds = np.asarray(cuts, dtype=np.int64)
    name_arr = pa.array(names, pa.string())

    def fn(t: pa.Table) -> pa.Table:
        b = (_md5_id_column(t, id_col) % np.uint64(buckets)).astype(np.int64)
        idx = np.searchsorted(bounds, b, side="right")
        t = t.append_column("bucket", pa.array(b, pa.int64()))
        return t.append_column("split", name_arr.take(pa.array(idx, pa.int64())))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_per_group(
    ds: Dataset, key: str, k: int, id_col: str = "doc_id", num_shards: int = 64
) -> Dataset:
    """Deterministic stratified sample: the ``k`` rows with the smallest
    id-hash per ``key`` group (+ 1-based ``rank`` in hash order).

    A hash-ordered top-k is a uniform-without-replacement sample per group
    (each id's rank is a fixed pseudo-random draw), so this reuses
    :func:`group_topk`'s combiner + single sharded exchange verbatim —
    ascending over the full-range uint64 hash.
    """

    def add_h(t: pa.Table) -> pa.Table:
        return t.append_column("__h", pa.array(_md5_id_column(t, id_col), pa.uint64()))

    withh = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    out = group_topk(
        withh, key=key, value="__h", k=k, tiebreak=id_col,
        num_shards=num_shards, ascending=True,
    )

    def drop_h(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__h"])

    return out.map_batches(drop_h, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: Dataset, n: int, weight_col: str, id_col: str = "doc_id"
) -> Dataset:
    """Deterministic weighted sampling WITHOUT replacement: the exact-size
    counterpart of :func:`importance_sample` (whose Bernoulli keep gives a
    random-size sample).

    Efraimidis & Spirakis (IPL 2006) exponential keys with hash-derived
    uniforms: row i gets ``skey = ln(u_i) / w_i`` where ``u_i`` is the same
    ``md5(id) mod 2^63 -> [0,1)`` double as ``importance_sample``, and the
    ``n`` largest keys win — a distribution-exact weighted draw, yet a pure
    function of (data, n), so resumable, auditable and SQL-checkable.
    Rows with ``w <= 0`` (or the measure-zero ``u == 0``) are never sampled.

    Scale shape: one stateless scan computes keys and keeps only each
    block's top-``n`` (ordered exactly like the global criterion:
    skey desc, id asc — so no global candidate is ever dropped), then a
    final sort+limit over the <= n x n_blocks survivors.  ``n`` is assumed
    driver-small (a sample, not a partition of the corpus).

    Output: input columns + ``skey`` (float64) + ``rank`` (int64, 1-based
    by descending key).
    """
    if n <= 0:
        raise ValueError("weighted_sample: n must be > 0")

    def partial(t: pa.Table) -> pa.Table:
        u = (_md5_id_column(t, id_col) % np.uint64(2**63)).astype(
            np.float64
        ) / float(2**63)
        w = np.asarray(t[weight_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        ok = (w > 0) & (u > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            key = np.where(ok, np.log(np.where(ok, u, 1.0)) / np.where(ok, w, 1.0), -np.inf)
        t = t.append_column("skey", pa.array(key, pa.float64()))
        t = t.filter(pa.array(np.isfinite(key)))
        if t.num_rows > n:
            ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
            k = np.asarray(t["skey"].to_numpy(zero_copy_only=False))
            order = np.lexsort((ids, -k))[:n]
            t = t.take(pa.array(np.sort(order)))
        return t

    survivors = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    top = survivors.sort(["skey", id_col], descending=[True, False]).limit(n)

    def add_rank(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False))
        k = np.asarray(t["skey"].to_numpy(zero_copy_only=False))
        order = np.lexsort((ids, -k))
        t = t.take(pa.array(order))
        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64), pa.int64())
        )

    return top.repartition(1).map_batches(
        add_rank, batch_format="pyarrow", zero_copy_batch=True
    )


def weighted_sample_per_group(
    ds: Dataset,
    key: str,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    num_shards: int = 64,
) -> Dataset:
    """Per-group exact-size weighted sampling without replacement: the ``k``
    largest Efraimidis-Spirakis keys (same ``skey = ln(u)/w`` construction
    as :func:`weighted_sample`) within every ``key`` group — e.g. "draw 5
    docs per domain, weighted by quality", the stratified mixture cut.

    Reuses :func:`group_topk`'s combiner + single sharded exchange verbatim
    (descending over skey, ties to smallest id).  ``id_col`` must be numeric
    (the tiebreak contract of group_topk); rows with ``w <= 0`` are never
    sampled.  Output: input columns + ``skey`` + 1-based ``rank``.
    """
    if k <= 0:
        raise ValueError("weighted_sample_per_group: k must be > 0")

    def add_key(t: pa.Table) -> pa.Table:
        u = (_md5_id_column(t, id_col) % np.uint64(2**63)).astype(
            np.float64
        ) / float(2**63)
        w = np.asarray(t[weight_col].to_numpy(zero_copy_only=False), dtype=np.float64)
        ok = (w > 0) & (u > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            skey = np.where(
                ok, np.log(np.where(ok, u, 1.0)) / np.where(ok, w, 1.0), -np.inf
            )
        t = t.append_column("skey", pa.array(skey, pa.float64()))
        return t.filter(pa.array(np.isfinite(skey)))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True)
    return group_topk(
        keyed, key=key, value="skey", k=k, tiebreak=id_col,
        num_shards=num_shards, ascending=False,
    )


def resample_to_mixture(
    ds: Dataset,
    key: str,
    weights: dict,
    total: int,
    id_col: str = "doc_id",
) -> Dataset:
    """Deterministic domain-mixture construction: keep exactly
    ``floor(weights[g] * total)`` rows per ``key`` group, chosen in id-hash
    order (a uniform without-replacement draw per group).

    The "rebalance sources to a target mixture" step of a training-data
    pipeline (DoReMi-style weights, recomputed elsewhere, applied here).
    Groups absent from ``weights`` are dropped; a group smaller than its
    cap keeps all its rows (the caller can renormalize and re-run if exact
    totals matter).  Reuses :func:`group_rank` (ONE distributed sort on
    ``(key, hash, id)``; ``key`` must be low-cardinality, the same contract)
    rather than :func:`sample_per_group` because caps differ per group.
    The hash is reduced mod 2**63 so the rank order is identical in int64
    and in the SQL oracle's UBIGINT — full-width uint64 would reorder
    around the sign bit.

    Output: (id_col, key, rank) for kept rows, rank 1..cap in hash order.
    """
    if total < 0:
        raise ValueError("resample_to_mixture: total must be >= 0")
    if any(w < 0 for w in weights.values()):
        raise ValueError("resample_to_mixture: weights must be >= 0")
    caps = {g: int(w * total) for g, w in weights.items()}

    def add_h(t: pa.Table) -> pa.Table:
        h = (_md5_id_column(t, id_col) % np.uint64(2**63)).astype(np.int64)
        t = t.select([id_col, key])
        return t.append_column("__h", pa.array(h, pa.int64()))

    withh = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    ranked = group_rank(withh, key=key, value="__h", id_col=id_col,
                        descending=False, ntile=1)

    def keep(t: pa.Table) -> pa.Table:
        kv = np.asarray(t[key].to_numpy(zero_copy_only=False), dtype=object)
        ug, inv = np.unique(kv, return_inverse=True)
        cap = np.fromiter((caps.get(g, 0) for g in ug), np.int64, len(ug))[inv]
        rk = np.asarray(t["rank"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return t.filter(pa.array(rk <= cap)).select([id_col, key, "rank"])

    return ranked.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def group_quantiles(
    ds: Dataset,
    key: str,
    value: str,
    qs: tuple = (0.25, 0.5, 0.9, 0.99),
    num_shards: int = 64,
) -> Dataset:
    """Exact per-group discrete quantiles (+ count) of a numeric column.

    Discrete (type-1) quantiles — the element at sorted index
    ``ceil(q*n) - 1`` — match DuckDB ``quantile_disc`` exactly: the result
    is always an ELEMENT of the input, so there is no float-interpolation
    hazard on either integer or float64 columns (``quantile_cont`` differs
    from numpy in final-bit rounding; ``quantile_disc`` does not — see
    memory note on DuckDB oracle exactness).  Exact quantiles are not
    combinable, so the single ``key``-sharded exchange ships the (key, value)
    pairs — two 8-byte columns, nothing else; per shard one lexsort + one
    vectorized gather per q computes every group at once.  The approximate
    mergeable variant ``extras.sketches.group_quantiles_sketch`` (DDSketch,
    alpha-relative error, fixed bytes per group) replaces this where shipping
    the value column is too dear; exactness is the contract here and this
    operator is the sketch's test oracle.
    """

    def prep(t: pa.Table) -> pa.Table:
        col = t[key]
        if pa.types.is_integer(col.type):
            kc = np.asarray(col.to_numpy(zero_copy_only=False), dtype=np.int64)
        else:
            kc = hash_tokens(
                np.asarray(col.to_numpy(zero_copy_only=False), dtype=object)
            ).astype(np.int64)
        # float columns stay float64 (type-1 quantiles are exact gathers);
        # everything else keeps the original int64 contract
        vtype = pa.float64() if pa.types.is_floating(t[value].type) else pa.int64()
        return pa.table(
            {
                key: col,
                "__k": pa.array(kc, pa.int64()),
                value: pc.cast(t[value], vtype),
            }
        )

    def shard_fn(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[key].to_numpy()
        # segment by the REAL key values (hash collisions must never merge)
        _, kc = np.unique(keys, return_inverse=True)
        vals = g[value].to_numpy()
        order = np.lexsort((vals, kc))
        kc, keys, vals = kc[order], keys[order], vals[order]
        starts = segment_bounds(kc)
        lo, hi = starts[:-1], starts[1:]
        n = (hi - lo).astype(np.int64)
        out = {key: keys[lo], "n_rows": n}
        for q in qs:
            idx = lo + np.maximum(np.ceil(q * n).astype(np.int64) - 1, 0)
            out[f"p{int(q * 100)}"] = vals[idx]
        return pd.DataFrame(out)

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_group_map(
        prepped, ["__k"], shard_fn, num_shards=num_shards, batch_format="pandas"
    )


def pivot_counts(
    ds: Dataset, row_key: str, col_key: str, columns: list | None = None
) -> Dataset:
    """Pivot: one row per ``row_key``, one count column per ``col_key`` value.

    ``columns`` fixes the output schema; when omitted it is discovered with
    one tiny ``unique()`` pass (the column set must be small — a pivot with
    unbounded columns is a different operator).  The heavy pass is a single
    ``groupby(row_key)`` over per-batch 0/1 indicator columns summed
    vectorized — count aggregation pushes into the combiner, so the exchange
    ships one partial row per (batch, row_key), not raw events.
    """
    from ray.data.aggregate import Sum

    if columns is None:
        columns = sorted(ds.unique(col_key))
    cols = list(columns)

    def prep(t: pa.Table) -> pa.Table:
        vals = np.asarray(t[col_key].to_numpy(zero_copy_only=False), dtype=object)
        out = {row_key: t[row_key]}
        for c in cols:
            out[f"n_{c}"] = pa.array((vals == c).astype(np.int64), pa.int64())
        return pa.table(out)

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(row_key)
        .aggregate(*[Sum(f"n_{c}", alias_name=f"n_{c}") for c in cols])
    )


def group_rank(
    ds: Dataset,
    key: str,
    value: str,
    id_col: str = "doc_id",
    descending: bool = True,
    ntile: int = 4,
    max_offset_entries: int = 1_000_000,
) -> Dataset:
    """Global per-group ``row_number`` and ``NTILE`` — rank every row of a
    group against the WHOLE group, not a shard of it.

    The quality-tiering primitive ("which quartile of its language does this
    doc's length fall in?").  Unlike :func:`sharded_group_map` operators,
    ranking cannot assume a group fits one task: a language holds billions of
    docs at corpus scale.  Shape: ONE distributed sort on
    ``(key, value, id_col)`` (the only exchange; ``id_col`` makes the order —
    and so the rank — total and deterministic), then per-block group COUNTS
    (scalars) come back to the driver, an exclusive prefix sum per group is
    computed over O(blocks x groups-per-block) integers (gated by
    ``max_offset_entries`` — this operator is for LOW-cardinality group keys;
    rank-within-high-cardinality-keys is `group_topk`'s shape instead), and
    per-block tasks attach ``rank = group_offset + local position`` plus the
    SQL-``NTILE(q)`` bucket computed from the group total.  Block payloads
    travel by object ref; the driver only ever holds counts.

    Output: the input columns plus ``rank`` (1-based ``row_number`` per SQL
    ``PARTITION BY key ORDER BY value [DESC], id_col``) and ``tile``
    (``NTILE(ntile)`` over the same order: the first ``n % q`` buckets take
    ``ceil(n/q)`` rows — bit-exact with the SQL oracle).
    """
    import ray

    if ntile < 1:
        raise ValueError("group_rank: ntile must be >= 1")
    sort_cols, sort_desc = [key], [False]
    if value not in sort_cols:
        sort_cols.append(value)
        sort_desc.append(descending)
    if id_col not in sort_cols:
        sort_cols.append(id_col)
        sort_desc.append(False)
    sorted_ds = ds.sort(sort_cols, descending=sort_desc)
    pinned = sorted_ds.materialize()
    refs = pinned.to_arrow_refs()
    if not refs or pinned.count() == 0:
        # keep the output contract on legitimately-empty input
        import ray.data

        schema = pinned.schema()
        cols = {}
        if schema is not None:
            for name, typ in zip(schema.names, schema.types):
                if not isinstance(typ, pa.DataType):
                    typ = pa.string() if typ in (str, object) else pa.int64()
                cols[name] = pa.array([], typ)
        cols["rank"] = pa.array([], pa.int64())
        cols["tile"] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))

    @ray.remote
    def block_counts(t: pa.Table):
        if t.num_rows == 0:  # a zero-row block may even lack the schema
            return [], []
        kv = np.asarray(t[key].to_numpy(zero_copy_only=False), dtype=object)
        starts = segment_bounds(kv)
        return list(kv[starts[:-1]]), list(np.diff(starts).astype(np.int64))

    per_block = ray.get([block_counts.remote(r) for r in refs])
    n_entries = sum(len(keys) for keys, _ in per_block)
    if n_entries > max_offset_entries:
        raise ValueError(
            f"group_rank: {n_entries} (block, group) offset entries exceed "
            f"max_offset_entries={max_offset_entries}; this operator is for "
            "low-cardinality group keys"
        )
    totals: dict = {}
    offsets = []  # per block: {group: exclusive prefix}
    for keys, counts in per_block:
        offsets.append({g: int(totals.get(g, 0)) for g in keys})
        for g, c in zip(keys, counts):
            totals[g] = int(totals.get(g, 0)) + int(c)

    @ray.remote
    def attach(t: pa.Table, off: dict, tot: dict):
        kv = np.asarray(t[key].to_numpy(zero_copy_only=False), dtype=object)
        n = len(kv)
        if n == 0:
            return t.append_column("rank", pa.array([], pa.int64())).append_column(
                "tile", pa.array([], pa.int64())
            )
        starts = segment_bounds(kv)
        seg_start = np.repeat(starts[:-1], np.diff(starts))
        base = np.repeat(
            np.asarray([off[g] for g in kv[starts[:-1]]], dtype=np.int64),
            np.diff(starts),
        )
        rank = base + (np.arange(n, dtype=np.int64) - seg_start) + 1
        ng = np.repeat(
            np.asarray([tot[g] for g in kv[starts[:-1]]], dtype=np.int64),
            np.diff(starts),
        )
        # SQL NTILE(q): with n = q*s + r, the first r buckets take s+1 rows
        q = np.int64(ntile)
        s, r = ng // q, ng % q
        cut = r * (s + 1)  # rows covered by the size-(s+1) buckets
        in_big = rank <= cut
        tile = np.where(
            in_big,
            (rank - 1) // np.maximum(s + 1, 1) + 1,
            r + (rank - cut - 1) // np.maximum(s, 1) + 1,
        ).astype(np.int64)
        return t.append_column("rank", pa.array(rank, pa.int64())).append_column(
            "tile", pa.array(tile, pa.int64())
        )

    out_refs = [
        attach.remote(r, off, totals) for r, off in zip(refs, offsets)
    ]
    import ray.data

    return ray.data.from_arrow_refs(out_refs)


def winsorize_by_group(
    ds: Dataset,
    key: str,
    value: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    num_shards: int = 64,
    max_groups: int = 1_000_000,
) -> Dataset:
    """Winsorize: clip ``value`` to its group's [``p_lo``, ``p_hi``] discrete
    quantiles — the standard per-stratum outlier cap before aggregate stats.

    Bounds come from :func:`group_quantiles` (type-1 / ``quantile_disc``
    parity, exact on int64 and float64), so the clip is bit-exact against
    the SQL oracle.  The bounds table is one row per group — broadcast via
    ``ray.put`` (gated by ``max_groups``, raising) and applied map-side; the
    only exchange is the quantile computation's own.

    Output: the input columns plus ``{value}_w`` (the clipped value).
    """
    import ray

    if not (0.0 < p_lo <= p_hi < 1.0):
        raise ValueError("winsorize_by_group: need 0 < p_lo <= p_hi < 1")
    lo_col, hi_col = f"p{int(p_lo * 100)}", f"p{int(p_hi * 100)}"
    if lo_col == hi_col and p_lo != p_hi:
        raise ValueError(
            "winsorize_by_group: p_lo and p_hi collide on the same "
            "integer-percent column name; choose distinct percents"
        )
    q = group_quantiles(ds, key, value, qs=(p_lo, p_hi), num_shards=num_shards)
    try:
        rows = q.take_all(limit=max_groups)
    except ValueError as e:
        raise ValueError(
            f"winsorize_by_group: more than max_groups={max_groups} groups"
        ) from e
    bounds = {r[key]: (r[lo_col], r[hi_col]) for r in rows}
    bref = ray.put(bounds)

    def clip(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        kv = np.asarray(t[key].to_numpy(zero_copy_only=False), dtype=object)
        vtype = pa.float64() if pa.types.is_floating(t[value].type) else pa.int64()
        v = np.asarray(pc.cast(t[value], vtype).to_numpy(zero_copy_only=False))
        uk, inv = np.unique(kv, return_inverse=True) if len(kv) else (kv, kv)
        if len(kv):
            lo = np.asarray([b[x][0] for x in uk], dtype=v.dtype)
            hi = np.asarray([b[x][1] for x in uk], dtype=v.dtype)
            v = np.clip(v, lo[inv.astype(np.int64)], hi[inv.astype(np.int64)])
        return t.append_column(f"{value}_w", pa.array(v, vtype))

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)


def histogram(
    ds: Dataset,
    value: str,
    lo: int,
    hi: int,
    n_bins: int,
    by: str | None = None,
) -> Dataset:
    """Fixed-width histogram of an integer column — the distribution
    diagnostic a curation run reads before picking filter thresholds
    (doc-length, quality-score and cluster-size profiles at corpus scale).

    Bin ``i`` covers ``[lo + i*(hi-lo)/n_bins, lo + (i+1)*(hi-lo)/n_bins)``;
    out-of-range values CLAMP into the edge bins so total mass is preserved
    (the bin index is ``min((clamp(v, lo, hi) - lo) * n_bins // (hi - lo),
    n_bins - 1)`` — pure int64 arithmetic, so the SQL oracle is bit-exact;
    the clamp also bounds the multiply at ``(hi-lo)*n_bins``, far from
    overflow).  Float columns must be pinned to integers upstream (the
    repo's cents convention, see ``extras/windows.py``).

    Scale shape: one per-batch ``np.unique`` combiner emits at most one
    partial row per (batch, group, bin); ONE tiny groupby sums them — the
    value column itself never shuffles.  Empty bins are absent from the
    output (GROUP BY semantics); ``by`` adds a group column.
    """
    from ray.data.aggregate import Sum

    lo, hi = int(lo), int(hi)
    if n_bins <= 0:
        raise ValueError("histogram: n_bins must be positive")
    if hi <= lo:
        raise ValueError("histogram: need lo < hi")
    span = hi - lo

    def prep(t: pa.Table) -> pa.Table:
        v = np.asarray(
            pc.cast(t[value], pa.int64()).to_numpy(zero_copy_only=False), np.int64
        )
        b = np.minimum((np.clip(v, lo, hi) - lo) * n_bins // span, n_bins - 1)
        if by is None:
            ub, cn = np.unique(b, return_counts=True)
            return pa.table(
                {"bin": pa.array(ub, pa.int64()), "n": pa.array(cn, pa.int64())}
            )
        if t[by].null_count:
            # np.unique over an object array mixing None and str raises an
            # opaque TypeError mid-task — enforce the non-null contract here
            raise ValueError(
                f"histogram: null values in the '{by}' group column are not "
                "supported; filter or fill them first"
            )
        kv = np.asarray(t[by].to_numpy(zero_copy_only=False), dtype=object)
        uk, kinv = np.unique(kv, return_inverse=True)
        comp = kinv.astype(np.int64) * n_bins + b
        uc, cn = np.unique(comp, return_counts=True)
        return pa.table(
            {
                by: pa.array(uk[uc // n_bins]),
                "bin": pa.array(uc % n_bins, pa.int64()),
                "n": pa.array(cn, pa.int64()),
            }
        )

    part = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    keys = ["bin"] if by is None else [by, "bin"]
    return part.groupby(keys).aggregate(Sum("n", alias_name="n"))

"""Report stage: docs x clusters -> final report with Best/Duplicate/Unique.

Reference analog: Stage 5 quality organization + CSV report
(/root/reference/modules/deduplication.py:1353-1458 best selection,
:1611-1672 report writer — columns Image Path / Quality Score / Group ID /
Group Size / Status).  Best per cluster = max quality with deterministic url
tie-break (:1385-1390); every input row appears exactly once
(/root/reference/main.py:96-101 verifies zero missing records).

Tail shape (round-5 rework): statuses are assigned MAP-SIDE.  Only rows that
can belong to a non-singleton cluster — cluster-map hits, exact-copy members,
and exact-copy representatives — ship through one compact per-cluster meta
exchange that folds (cluster_id, cluster_size, best_doc_id); the meta table
(one row per non-singleton cluster, ~= dup docs, far below the corpus) is
then broadcast and every doc row computes its own status in the scan.  The
previous plan exchanged the FULL doc table (urls included) through a
status groupby before the final sort; now the only full-row exchange left in
the tail is the report sort itself.  Singleton rows never leave their block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.bloom import BloomFilter, SortedIdSet, build_bloom_distributed
from ..util import shard_attach, sharded_group_map


def _meta_fold(g: pd.DataFrame) -> pd.DataFrame:
    """All-clusters-in-shard fold -> (cluster_id, cluster_size, best_doc_id).

    Same best semantics as the reference: max quality, url ascending as the
    deterministic tie-break (reference deduplication.py:1385-1390).
    """
    out = g.sort_values(
        ["cluster_id", "quality", "url"], ascending=[True, False, True], kind="mergesort"
    ).reset_index(drop=True)
    cid = out["cluster_id"].to_numpy()
    first = np.ones(len(out), dtype=bool)
    if len(out) > 1:
        first[1:] = cid[1:] != cid[:-1]
    starts = np.nonzero(first)[0]
    sizes = np.diff(np.append(starts, len(out)))
    res = out.loc[first, ["cluster_id", "doc_id"]].copy()
    res.columns = ["cluster_id", "best_doc_id"]
    res["cluster_size"] = sizes.astype(np.int64)
    return res


def _cluster_meta(shipped: Dataset, cfg: DedupConfig) -> Dataset:
    """shipped(cluster_id, doc_id, quality, url) -> one meta row per cluster."""
    return sharded_group_map(
        shipped, ["cluster_id"], _meta_fold, num_shards=cfg.group_shards,
        batch_format="pandas",
    )


def _apply_meta(
    base: Dataset, meta: Dataset, cfg: DedupConfig, broadcast_max_entries: int
) -> Dataset:
    """Attach (cluster_size, best_doc_id) by cluster_id and assign statuses.

    Broadcast lookup below the gate (the common case — one meta row per
    non-singleton cluster); hash-sharded left-outer attach above it.  Rows
    whose cluster has no meta row are singletons: size 1, status Unique.
    """
    import ray as _ray

    pinned = meta.materialize()

    def statuses(cid, did, size, best):
        status = np.full(len(cid), "Duplicate", dtype=object)
        status[size == 1] = "Unique"
        status[(size > 1) & (did == best)] = "Best"
        return status

    if pinned.count() <= broadcast_max_entries:
        parts = [t for t in _ray.get(pinned.to_arrow_refs()) if t.num_rows]
        if parts:
            tbl = pa.concat_tables(parts).combine_chunks()
            mc = np.asarray(tbl["cluster_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            mb = np.asarray(tbl["best_doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            ms = np.asarray(tbl["cluster_size"].to_numpy(zero_copy_only=False), dtype=np.int64)
            order = np.argsort(mc, kind="stable")
            mc, mb, ms = mc[order], mb[order], ms[order]
        else:
            mc = np.empty(0, np.uint64)
            mb = np.empty(0, np.uint64)
            ms = np.empty(0, np.int64)
        ref = _ray.put((mc, mb, ms))

        def attach(t: pa.Table) -> pa.Table:
            mc_, mb_, ms_ = _ray.get(ref)
            cid = np.asarray(t["cluster_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            size = np.ones(len(cid), np.int64)
            best = did.copy()  # a singleton is its own best
            if len(mc_) and len(cid):
                pos = np.searchsorted(mc_, cid)
                pos[pos == len(mc_)] = len(mc_) - 1
                hit = mc_[pos] == cid
                size[hit] = ms_[pos[hit]]
                best[hit] = mb_[pos[hit]]
            return pa.table(
                {
                    "url": t["url"],
                    "doc_id": t["doc_id"],
                    "cluster_id": t["cluster_id"],
                    "cluster_size": pa.array(size, pa.int64()),
                    "quality": t["quality"],
                    "status": pa.array(statuses(cid, did, size, best), pa.string()),
                }
            )

        return base.map_batches(
            attach, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
        )

    j = shard_attach(
        base,
        pinned,
        key="cluster_id",
        payload={"cluster_size": "cluster_size", "best_doc_id": "best_doc_id"},
        num_shards=cfg.group_shards,
        how="left_outer",
    )

    def finish(t: pa.Table) -> pa.Table:
        cid = np.asarray(t["cluster_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        size = np.asarray(t["cluster_size"].to_numpy(zero_copy_only=False), dtype=np.int64)
        best = np.asarray(t["best_doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        miss = size == 0  # left-outer numeric filler: no meta row -> singleton
        size = np.where(miss, 1, size)
        best = np.where(miss, did, best)
        return pa.table(
            {
                "url": t["url"],
                "doc_id": t["doc_id"],
                "cluster_id": t["cluster_id"],
                "cluster_size": pa.array(size, pa.int64()),
                "quality": t["quality"],
                "status": pa.array(statuses(cid, did, size, best), pa.string()),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _gated_cluster_lookup(
    clusters: Dataset, key: str, broadcast_max_entries: int
):
    """clusters(key, cluster_id) -> (sorted key array, cluster array) ref, or
    None above the gate (callers fall back to a sharded attach).

    The cluster map holds one row per doc that appears in a VERIFIED pair —
    the dup fraction of the corpus, usually far below the broadcast bound —
    16 B/entry in the broadcast object; missing keys take sentinel 0.
    """
    import ray as _ray

    pinned = clusters.materialize()
    if pinned.count() > broadcast_max_entries:
        return None, pinned
    parts = [t for t in _ray.get(pinned.to_arrow_refs()) if t.num_rows]
    if parts:
        tbl = pa.concat_tables(parts).combine_chunks()
        ids = np.asarray(tbl[key].to_numpy(zero_copy_only=False), dtype=np.uint64)
        cids = np.asarray(
            tbl["cluster_id"].to_numpy(zero_copy_only=False), dtype=np.uint64
        )
        order = np.argsort(ids, kind="stable")
        ids, cids = ids[order], cids[order]
    else:
        ids = np.empty(0, np.uint64)
        cids = np.empty(0, np.uint64)
    return _ray.put((ids, cids)), pinned


def _lookup_u64(ids_: np.ndarray, vals_: np.ndarray, keys: np.ndarray):
    """searchsorted lookup: (hit mask, value-or-0)."""
    out = np.zeros(len(keys), np.uint64)
    if len(ids_) and len(keys):
        pos = np.searchsorted(ids_, keys)
        pos[pos == len(ids_)] = len(ids_) - 1
        hit = ids_[pos] == keys
        out[hit] = vals_[pos[hit]]
        return hit, out
    return np.zeros(len(keys), dtype=bool), out


def _dup_rep_membership(docs_rep: Dataset, cfg: DedupConfig, gate: int):
    """Membership over rep_ids of exact-copy groups with >= 2 members.

    Exact :class:`SortedIdSet` below the gate; a distributed-built
    :class:`BloomFilter` above it — a false positive only ships one extra
    singleton row into the meta exchange (its meta row says size 1, which
    maps back to the same Unique status), never a wrong report row.
    """
    import ray as _ray

    def block_reps(t: pa.Table) -> pa.Table:
        rid = np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        return pa.table({"rep_id": pa.array(np.unique(rid[rid != did]), pa.uint64())})

    parts = docs_rep.map_batches(
        block_reps, batch_format="pyarrow", zero_copy_batch=True
    )

    def uniq_shard(g: dict) -> dict:
        return {"rep_id": np.unique(np.asarray(g["rep_id"], dtype=np.uint64))}

    dd = sharded_group_map(parts, ["rep_id"], uniq_shard, num_shards=cfg.group_shards).materialize()
    n = dd.count()
    if n == 0:
        return SortedIdSet(np.empty(0, np.uint64))
    if n <= gate:
        arrs = [
            np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            for t in _ray.get(dd.to_arrow_refs())
            if t.num_rows and "rep_id" in t.schema.names
        ]
        return SortedIdSet(np.sort(np.concatenate(arrs)) if arrs else np.empty(0, np.uint64))
    m_bits = BloomFilter.size_bits(n, cfg.attach_bloom_bits_per_id, cfg.attach_bloom_max_bits)
    return build_bloom_distributed(
        dd,
        lambda t: np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64),
        m_bits,
        cfg.attach_bloom_hashes,
    )


def report_stage(
    docs: Dataset,
    clusters: Dataset,
    cfg: DedupConfig,
    broadcast_max_entries: int = 5_000_000,
) -> Dataset:
    """docs(doc_id,url,n_chars) x clusters(doc_id,cluster_id) -> report.

    Left-outer semantics (clusters cover only docs that appear in verified
    pairs); a doc without a cluster row is a singleton whose cluster is
    itself.  Without an exact pre-pass every non-singleton member IS a
    cluster-map hit, so the meta exchange ships exactly the mapped rows.
    """
    import ray as _ray

    base = docs.select_columns(["doc_id", "url", "n_chars"])
    ref, pinned = _gated_cluster_lookup(clusters, "doc_id", broadcast_max_entries)
    if ref is None:
        # scale fallback: one sharded attach, then the same meta plan
        j = shard_attach(
            base, pinned, key="doc_id",
            payload={"cluster_id": "cluster_id"},
            num_shards=cfg.group_shards, how="left_outer",
        ).materialize()

        def project(t: pa.Table) -> pa.Table:
            cid = np.asarray(t["cluster_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "url": t["url"],
                    "quality": pc.cast(t["n_chars"], pa.float64()),
                    "cluster_id": pa.array(np.where(cid == 0, did, cid), pa.uint64()),
                    "__ship": pa.array(cid != 0),
                }
            )

        tagged = j.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def project(t: pa.Table) -> pa.Table:
            ids_, cids_ = _ray.get(ref)
            did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            hit, cid = _lookup_u64(ids_, cids_, did)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "url": t["url"],
                    "quality": pc.cast(t["n_chars"], pa.float64()),
                    "cluster_id": pa.array(np.where(hit, cid, did), pa.uint64()),
                    "__ship": pa.array(hit),
                }
            )

        tagged = base.map_batches(
            project, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
        )
    return _finish_tagged(tagged, cfg, broadcast_max_entries)


def report_stage_from_reps(
    docs_rep: Dataset,
    rep_clusters: Dataset,
    cfg: DedupConfig,
    broadcast_max_entries: int = 5_000_000,
) -> Dataset:
    """Exact-prepass report: every doc reaches its cluster through its exact
    representative (cluster(doc) = label(rep(doc)) or rep(doc)).

    Ship-to-meta condition: cluster-map hit (verified-pair member), OR
    ``rep_id != doc_id`` (exact copy), OR ``doc_id`` in the dup-rep
    membership (the representative of an exact-copy group, which must reach
    the meta fold so its group's size and best include it).
    """
    import ray as _ray

    base = docs_rep.select_columns(["doc_id", "url", "n_chars", "rep_id"])
    ref, pinned = _gated_cluster_lookup(rep_clusters, "doc_id", broadcast_max_entries)
    dup_reps = _dup_rep_membership(docs_rep, cfg, broadcast_max_entries)
    dref = _ray.put(dup_reps)
    if ref is None:
        from ..util import rename_columns

        rc = rename_columns(pinned, {"doc_id": "rep_id", "cluster_id": "rep_cluster"})
        j = shard_attach(
            base, rc, key="rep_id",
            payload={"rep_cluster": "rep_cluster"},
            num_shards=cfg.group_shards, how="left_outer",
        )

        def project(t: pa.Table) -> pa.Table:
            m = _ray.get(dref)
            did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            rid = np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            rcid = np.asarray(t["rep_cluster"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            hit = rcid != 0
            ship = hit | (rid != did) | m.contains(did)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "url": t["url"],
                    "quality": pc.cast(t["n_chars"], pa.float64()),
                    "cluster_id": pa.array(np.where(hit, rcid, rid), pa.uint64()),
                    "__ship": pa.array(ship),
                }
            )

        tagged = j.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    else:

        def project(t: pa.Table) -> pa.Table:
            ids_, cids_ = _ray.get(ref)
            m = _ray.get(dref)
            did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            rid = np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            hit, cid = _lookup_u64(ids_, cids_, rid)
            ship = hit | (rid != did) | m.contains(did)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "url": t["url"],
                    "quality": pc.cast(t["n_chars"], pa.float64()),
                    # unmatched reps fall back to rep_id (not doc_id) so an
                    # unclustered exact-copy group still collapses to one cluster
                    "cluster_id": pa.array(np.where(hit, cid, rid), pa.uint64()),
                    "__ship": pa.array(ship),
                }
            )

        tagged = base.map_batches(
            project, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
        )
    return _finish_tagged(tagged, cfg, broadcast_max_entries)


def _finish_tagged(tagged: Dataset, cfg: DedupConfig, broadcast_max_entries: int) -> Dataset:
    """tagged(doc_id,url,quality,cluster_id,__ship) -> final report rows.

    ``tagged`` is scanned twice (meta pass over the shipped subset, then the
    full status pass) — pin it so the upstream attach doesn't re-execute.
    """
    pinned = tagged.materialize()

    def shipped_rows(t: pa.Table) -> pa.Table:
        t = t.filter(t["__ship"])
        return t.select(["cluster_id", "doc_id", "quality", "url"])

    shipped = pinned.map_batches(shipped_rows, batch_format="pyarrow", zero_copy_batch=True)
    meta = _cluster_meta(shipped, cfg)
    base = pinned.map_batches(
        lambda t: t.drop_columns(["__ship"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return _apply_meta(base, meta, cfg, broadcast_max_entries)

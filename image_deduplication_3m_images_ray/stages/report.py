"""Report stage: docs x clusters -> final report with Best/Duplicate/Unique.

Reference analog: Stage 5 quality organization + CSV report
(/root/reference/modules/deduplication.py:1353-1458 best selection,
:1611-1672 report writer — columns Image Path / Quality Score / Group ID /
Group Size / Status).  Best per cluster = max quality with deterministic url
tie-break (:1385-1390); every input row appears exactly once
(/root/reference/main.py:96-101 verifies zero missing records).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig
from ..util import shard_attach, sharded_group_map


def _fill_singletons(t: pa.Table) -> pa.Table:
    # 0 is shard_attach's no-match sentinel (see pipelines.dedup._expand_clusters)
    cid = np.asarray(t["cluster_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    filled = np.where(cid == 0, did, cid)
    return t.set_column(
        t.column_names.index("cluster_id"), "cluster_id", pa.array(filled, pa.uint64())
    )


def _assign_status_shard(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized status assignment across ALL clusters in a shard.

    Sort by (cluster_id, -quality, url); the first row of each cluster run is
    Best (or Unique for singletons) — one C-level pass, no per-cluster calls.
    """
    out = g.sort_values(
        ["cluster_id", "quality", "url"], ascending=[True, False, True], kind="mergesort"
    ).reset_index(drop=True)
    sizes = out.groupby("cluster_id", sort=False)["cluster_id"].transform("size")
    out["cluster_size"] = sizes.astype(np.int64)
    cid = out["cluster_id"].to_numpy()
    first = np.ones(len(out), dtype=bool)
    if len(out) > 1:
        first[1:] = cid[1:] != cid[:-1]
    status = np.full(len(out), "Duplicate", dtype=object)
    status[first & (sizes.to_numpy() == 1)] = "Unique"
    status[first & (sizes.to_numpy() > 1)] = "Best"
    out["status"] = status
    return out


def _finish_report(j: Dataset, cfg: DedupConfig) -> Dataset:
    j = j.map_batches(_fill_singletons, batch_format="pyarrow", zero_copy_batch=True)
    j = j.map_batches(
        lambda t: t.append_column("quality", pc.cast(t["n_chars"], pa.float64())).drop_columns(
            ["n_chars"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rep = sharded_group_map(
        j, ["cluster_id"], _assign_status_shard, num_shards=cfg.group_shards, batch_format="pandas"
    )
    return rep.select_columns(["url", "doc_id", "cluster_id", "cluster_size", "quality", "status"])


def _gated_cluster_attach(
    base: Dataset,
    clusters: Dataset,
    key: str,
    cfg: DedupConfig,
    broadcast_max_entries: int = 5_000_000,
) -> Dataset:
    """Attach ``cluster_id`` to ``base`` by ``key`` — map-side broadcast
    lookup when the cluster map fits, hash-sharded attach above the bound
    (the ``exact_rep_stage`` size-gated two-plan contract, stages/exact.py).

    The cluster map holds one row per doc that appears in a VERIFIED pair —
    the dup fraction of the corpus, usually far below the broadcast bound —
    so the common case removes one of the report tail's serial exchanges
    (16 B/entry in the broadcast object; missing keys take sentinel 0, the
    same contract ``shard_attach(how="left_outer")`` fills).
    """
    import ray as _ray

    pinned = clusters.materialize()
    if pinned.count() > broadcast_max_entries:
        return shard_attach(
            base,
            pinned,
            key=key,
            payload={"cluster_id": "cluster_id"},
            num_shards=cfg.group_shards,
            how="left_outer",
        )
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
    ref = _ray.put((ids, cids))

    def attach(t: pa.Table) -> pa.Table:
        ids_, cids_ = _ray.get(ref)
        kv = np.asarray(t[key].to_numpy(zero_copy_only=False), dtype=np.uint64)
        cid = np.zeros(len(kv), np.uint64)
        if len(ids_) and len(kv):
            pos = np.searchsorted(ids_, kv)
            pos[pos == len(ids_)] = len(ids_) - 1
            hit = ids_[pos] == kv
            cid[hit] = cids_[pos[hit]]
        return t.append_column("cluster_id", pa.array(cid, pa.uint64()))

    return base.map_batches(
        attach, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
    )


def report_stage(docs: Dataset, clusters: Dataset, cfg: DedupConfig) -> Dataset:
    """docs(doc_id,url,n_chars) x clusters(doc_id,cluster_id) -> report.

    Left-outer join (clusters cover only docs that appear in verified
    pairs); sentinel cluster_id 0 means a singleton whose cluster is itself.
    """
    base = docs.select_columns(["doc_id", "url", "n_chars"])
    j = _gated_cluster_attach(base, clusters, "doc_id", cfg)
    return _finish_report(j, cfg)


def report_stage_from_reps(docs_rep: Dataset, rep_clusters: Dataset, cfg: DedupConfig) -> Dataset:
    """Exact-prepass report in ONE attach: every doc reaches its cluster through
    its exact representative (cluster(doc) = label(rep(doc)) or rep(doc)).

    Unmatched reps fall back to ``rep_id`` (not ``doc_id``) so an unclustered
    exact-copy group still collapses to one cluster.
    """
    from ..util import rename_columns

    base = docs_rep.select_columns(["doc_id", "url", "n_chars", "rep_id"])
    rc = rename_columns(rep_clusters, {"doc_id": "rep_id", "cluster_id": "cluster_id"})
    j = _gated_cluster_attach(base, rc, "rep_id", cfg)

    def fallback(t: pa.Table) -> pa.Table:
        cid = np.asarray(t["cluster_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        rid = np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        filled = np.where(cid == 0, rid, cid)
        out = t.set_column(
            t.column_names.index("cluster_id"), "cluster_id", pa.array(filled, pa.uint64())
        )
        return out.drop_columns(["rep_id"])

    j = j.map_batches(fallback, batch_format="pyarrow", zero_copy_batch=True)
    return _finish_report(j, cfg)

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
from ..util import sharded_group_map


def _fill_singletons(t: pa.Table) -> pa.Table:
    cid = t["cluster_id"]
    if isinstance(cid, pa.ChunkedArray):
        cid = cid.combine_chunks()
    filled = pc.coalesce(cid, t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"])
    return t.set_column(t.column_names.index("cluster_id"), "cluster_id", filled.cast(pa.uint64()))


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


def report_stage(docs: Dataset, clusters: Dataset, cfg: DedupConfig) -> Dataset:
    """docs(doc_id,url,n_chars) x clusters(doc_id,cluster_id) -> report.

    Left-outer hash join (clusters cover only docs that appear in verified
    pairs); a null cluster_id means a singleton whose cluster is itself.
    """
    base = docs.select_columns(["doc_id", "url", "n_chars"])
    j = base.join(
        clusters, join_type="left_outer", num_partitions=cfg.join_num_buckets, on=("doc_id",)
    )
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

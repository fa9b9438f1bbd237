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
from ..util import rename_columns


def _fill_singletons(t: pa.Table) -> pa.Table:
    cid = t["cluster_id"]
    if isinstance(cid, pa.ChunkedArray):
        cid = cid.combine_chunks()
    filled = pc.coalesce(cid, t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"])
    return t.set_column(t.column_names.index("cluster_id"), "cluster_id", filled.cast(pa.uint64()))


def _assign_status(g: pd.DataFrame) -> pd.DataFrame:
    n = len(g)
    out = g.copy()
    out["cluster_size"] = np.int64(n)
    if n == 1:
        out["status"] = "Unique"
        return out
    order = out.sort_values(["quality", "url"], ascending=[False, True], kind="mergesort").index
    out["status"] = "Duplicate"
    out.loc[order[0], "status"] = "Best"
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
    rep = j.groupby("cluster_id").map_groups(_assign_status, batch_format="pandas")
    return rep.select_columns(["url", "doc_id", "cluster_id", "cluster_size", "quality", "status"])

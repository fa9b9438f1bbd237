"""Clustering: verified pairs -> connected components via min-label propagation.

Reference analog: union-find over similar pairs
(/root/reference/modules/deduplication.py:284-363) and its BFS component
variants (:1256-1282).  The reference's parent/rank lists live in driver
memory; at 10^12-doc scale the label table must stay distributed, so the
algorithm is iterative *min-label propagation with pointer jumping*
(SURVEY.md §2.5 G2): each round attaches current labels to both edge
endpoints, sends min(label) to the node, its neighbor AND both labels' own
rows (the pointer-jumping step that makes convergence O(log n) rounds), then
re-minimizes per node.  The driver holds only a per-round convergence checksum
— an order-independent XOR fold of splitmix64(node * C ^ label) — never the
labels themselves.

Per-round ``materialize()`` is deliberate and bounded: the label table covers
only nodes that appear in verified pairs (dup docs), which is a small fraction
of the corpus; without it each lazy round would re-execute every prior round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import U64, splitmix64
from ..util import rename_columns

_CHECK_C = U64(0x9E3779B97F4A7C15)


def _label_checksum(labels: Dataset) -> int:
    def partial(t: pa.Table) -> pa.Table:
        node = np.asarray(t["node"].to_numpy(zero_copy_only=False), dtype=U64)
        lab = np.asarray(t["label"].to_numpy(zero_copy_only=False), dtype=U64)
        x = splitmix64(node * _CHECK_C ^ lab)
        acc = np.bitwise_xor.reduce(x) if len(x) else U64(0)
        return pa.table({"c": pa.array([int(acc)], pa.uint64())})

    parts = labels.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    acc = 0
    for row in parts:
        acc ^= int(row["c"])
    return acc


def _init_labels(t: pa.Table) -> pa.Table:
    a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), dtype=U64)
    b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), dtype=U64)
    m = np.minimum(a, b)
    return pa.table(
        {
            "node": pa.array(np.concatenate([a, b]), pa.uint64()),
            "label": pa.array(np.concatenate([m, m]), pa.uint64()),
        }
    )


def _messages(t: pa.Table) -> pa.Table:
    a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), dtype=U64)
    b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), dtype=U64)
    la = np.asarray(t["lab_a"].to_numpy(zero_copy_only=False), dtype=U64)
    lb = np.asarray(t["lab_b"].to_numpy(zero_copy_only=False), dtype=U64)
    m = np.minimum(la, lb)
    return pa.table(
        {
            "node": pa.array(np.concatenate([a, b, la, lb]), pa.uint64()),
            "label": pa.array(np.concatenate([m, m, m, m]), pa.uint64()),
        }
    )


def _min_per_node(group: dict) -> dict:
    return {
        "node": np.asarray(group["node"], dtype=U64)[:1],
        "label": np.asarray(group["label"], dtype=U64).min(keepdims=True),
    }


def cluster_stage(verified: Dataset, cfg: DedupConfig) -> Dataset:
    """verified_pairs -> clusters(doc_id, cluster_id = min doc_id in component)."""
    edges = verified.select_columns(["doc_a", "doc_b"]).materialize()
    if edges.count() == 0:
        return _empty_clusters()
    labels = (
        edges.map_batches(_init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .map_groups(_min_per_node, batch_format="numpy")
        .materialize()
    )
    checksum = _label_checksum(labels)
    for _ in range(cfg.cluster_max_rounds):
        lab_a = rename_columns(labels, {"node": "doc_a", "label": "lab_a"})
        lab_b = rename_columns(labels, {"node": "doc_b", "label": "lab_b"})
        el = edges.join(
            lab_a, join_type="inner", num_partitions=cfg.join_num_buckets, on=("doc_a",)
        ).join(lab_b, join_type="inner", num_partitions=cfg.join_num_buckets, on=("doc_b",))
        msgs = el.map_batches(_messages, batch_format="pyarrow", zero_copy_batch=True)
        labels = (
            msgs.union(labels)
            .groupby("node")
            .map_groups(_min_per_node, batch_format="numpy")
            .materialize()
        )
        new_checksum = _label_checksum(labels)
        if new_checksum == checksum:
            break
        checksum = new_checksum
    return rename_columns(labels, {"node": "doc_id", "label": "cluster_id"})


def _empty_clusters() -> Dataset:
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.uint64()), "cluster_id": pa.array([], pa.uint64())})
    )

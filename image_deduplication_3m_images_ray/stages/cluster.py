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

import os

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import U64, splitmix64
from ..util import rename_columns, sharded_group_map

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


def _min_per_node_shard(group: dict) -> dict:
    """Vectorized per-shard min(label) per node: lexsort + segmented reduceat."""
    node = np.asarray(group["node"], dtype=U64)
    label = np.asarray(group["label"], dtype=U64)
    order = np.lexsort((label, node))
    node, label = node[order], label[order]
    first = np.ones(len(node), dtype=bool)
    if len(node) > 1:
        first[1:] = node[1:] != node[:-1]
    starts = np.nonzero(first)[0]
    return {"node": node[starts], "label": np.minimum.reduceat(label, starts)}


def _min_labels(ds: Dataset, cfg: DedupConfig) -> Dataset:
    return sharded_group_map(ds, ["node"], _min_per_node_shard, num_shards=cfg.group_shards)


def _driver_union_find(edges: Dataset) -> Dataset:
    """Small-edge-set fast path: collect pairs, union-find in numpy on the driver.

    Legitimate only because the edge count was just checked against the
    configured bound (verified pairs cover dup docs only, a small fraction of
    the corpus); the distributed label-propagation loop below is the scale
    path and stays exercised by tests with the bound set to 0.
    """
    import ray
    import ray.data

    # some blocks can be empty with a degenerate (column-less) schema — skip
    blocks = [b for b in ray.get(edges.to_arrow_refs()) if b.num_rows and b.num_columns]
    if not blocks:
        return _empty_clusters()
    t = pa.concat_tables(blocks)
    a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), dtype=U64)
    b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), dtype=U64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    # Vectorized min-label propagation with pointer jumping: labels are node
    # INDICES (nodes is sorted, so min index == min doc_id); each round every
    # node takes min(own, neighbors' labels, label-of-label).  Labels only
    # decrease and stay inside the component, so the fixpoint is the
    # component-min index in O(log n) rounds of O(E) numpy work.
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(label[ia], label[ib])
        new = label.copy()
        np.minimum.at(new, ia, m)
        np.minimum.at(new, ib, m)
        new = np.minimum(new, new[new])
        if np.array_equal(new, label):
            break
        label = new
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(nodes, pa.uint64()),
                "cluster_id": pa.array(nodes[label], pa.uint64()),
            }
        )
    )


def cluster_stage(
    verified: Dataset, cfg: DedupConfig, round_checkpoint_dir: str | None = None
) -> Dataset:
    """verified_pairs -> clusters(doc_id, cluster_id = min doc_id in component).

    ``round_checkpoint_dir`` persists the label table after every propagation
    round (``round_<i>/`` + ``round_<i>.done`` marker); a rerun resumes from
    the last completed round instead of restarting the loop (SURVEY.md §7.4
    "label propagation at scale ... correctness under resume mid-loop" —
    label propagation is monotone, so resuming from ANY completed round's
    labels converges to the identical fixpoint).
    """
    import ray.data

    edges = verified.select_columns(["doc_a", "doc_b"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty_clusters()
    if n_edges <= cfg.cluster_driver_max_edges:
        return _driver_union_find(edges)

    start_round = 0
    labels = None
    if round_checkpoint_dir:
        os.makedirs(round_checkpoint_dir, exist_ok=True)
        done = sorted(
            int(f.split("_")[1].split(".")[0])
            for f in os.listdir(round_checkpoint_dir)
            if f.endswith(".done")
        )
        if done:
            start_round = done[-1] + 1
            labels = ray.data.read_parquet(
                os.path.join(round_checkpoint_dir, f"round_{done[-1]}")
            ).materialize()
    if labels is None:
        labels = _min_labels(
            edges.map_batches(_init_labels, batch_format="pyarrow", zero_copy_batch=True), cfg
        ).materialize()
    checksum = _label_checksum(labels)
    for rnd in range(start_round, cfg.cluster_max_rounds):
        lab_a = rename_columns(labels, {"node": "doc_a", "label": "lab_a"})
        lab_b = rename_columns(labels, {"node": "doc_b", "label": "lab_b"})
        el = edges.join(
            lab_a, join_type="inner", num_partitions=cfg.join_num_buckets, on=("doc_a",)
        ).join(lab_b, join_type="inner", num_partitions=cfg.join_num_buckets, on=("doc_b",))
        msgs = el.map_batches(_messages, batch_format="pyarrow", zero_copy_batch=True)
        labels = _min_labels(msgs.union(labels), cfg).materialize()
        if round_checkpoint_dir:
            rdir = os.path.join(round_checkpoint_dir, f"round_{rnd}")
            os.makedirs(rdir, exist_ok=True)
            labels.write_parquet(rdir)
            with open(os.path.join(round_checkpoint_dir, f"round_{rnd}.done"), "w") as f:
                f.write("ok")
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

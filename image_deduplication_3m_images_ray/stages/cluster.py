"""Clustering: verified pairs -> connected components, contraction + propagation.

Reference analog: union-find over similar pairs
(/root/reference/modules/deduplication.py:284-363) and its BFS component
variants (:1256-1282).  The reference's parent/rank lists live in driver
memory; at 10^12-doc scale the label table must stay distributed.  The
algorithm here is a two-phase hybrid sized to how near-dup graphs actually
look (dense near-cliques per duplicate cluster, rare long threads):

**Phase 1 — min-label contraction** (``cluster_contract_rounds`` rounds, in
the family of Kiveris et al., "Connected Components in MapReduce and
Beyond").  Each round r over the current edge set ``E_r``:

1. **m-step** (one exchange, key = node): every node u computes
   ``m_r(u) = min(u, min(neighbors))``; the shard emits u's map row
   (u -> m_r(u)) plus, for each incident half-edge (u, v), a message row
   keyed by v carrying ``m_r(u)``.
2. **contract** (one exchange, key = node): each edge (u, v) becomes
   ``(m_r(u), m_r(v))`` — dropped when equal (the pair merged this round),
   deduplicated per shard.  ``E_{r+1}`` is the contracted edge set.

A duplicate cluster's clique contracts to NOTHING in one round (every member
maps to the min), so for the flagship workload the loop usually ends here
with E empty after round 1 — two exchanges total, versus re-joining the full
edge set every round.  Contraction alone is NOT O(log n) on path graphs (a
chain shifts by one node per round — measured, not guessed), hence:

**Phase 2 — min-label propagation with pointer jumping** on the residual
``E_k`` (usually empty or tiny): each round attaches current labels to both
edge endpoints, sends min(label) to the node, its neighbor AND both labels'
own rows (the pointer-jumping step that makes convergence O(log n) rounds),
then re-minimizes per node.  The driver holds only a per-round convergence
checksum — an order-independent XOR fold of splitmix64(node * C ^ label) —
never the labels themselves.

Final labels compose the per-round maps back-to-front:
``label(v) = lp(m_{k-1}(... m_0(v)))`` — k-1 small hash-join exchanges over
geometrically-shrinking map tables.

Per-round ``materialize()`` is deliberate and bounded: the map/label tables
cover only nodes that appear in verified pairs (dup docs), a small fraction
of the corpus; without it each lazy round would re-execute every prior round.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import U64, splitmix64
from ..util import rename_columns, segment_bounds, shard_attach, sharded_group_map

_CHECK_C = U64(0x9E3779B97F4A7C15)
_KIND_MAP = 0  # node -> m(node) rows
_KIND_MSG = 1  # neighbor message rows


# --------------------------- phase 1: contraction ---------------------------


def _half_rows(t: pa.Table) -> pa.Table:
    a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), dtype=U64)
    b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), dtype=U64)
    return pa.table(
        {
            "node": pa.array(np.concatenate([a, b]), pa.uint64()),
            "other": pa.array(np.concatenate([b, a]), pa.uint64()),
        }
    )


def _mstep_shard(g: dict) -> dict:
    """Per node u: m(u) = min(u, min neighbors); emit map + message rows.

    Message rows carry ``dir`` = (u < v) so the contract step emits each
    contracted edge from exactly one of its two half-edges.
    """
    node = np.asarray(g["node"], dtype=U64)
    other = np.asarray(g["other"], dtype=U64)
    order = np.lexsort((other, node))
    node, other = node[order], other[order]
    bounds = segment_bounds(node)
    starts = bounds[:-1]
    u = node[starts]
    m = np.minimum(u, np.minimum.reduceat(other, starts)) if len(starts) else u
    # per-row m(u) via segment ids
    seg = np.zeros(len(node), dtype=np.int64)
    if len(starts):
        seg[starts] = 1
        seg = np.cumsum(seg) - 1
    m_row = m[seg] if len(node) else np.empty(0, U64)
    return {
        "node": np.concatenate([u, other]),
        "m": np.concatenate([m, m_row]),
        "kind": np.concatenate(
            [np.full(len(u), _KIND_MAP, np.int8), np.full(len(other), _KIND_MSG, np.int8)]
        ),
        "dir": np.concatenate(
            [np.zeros(len(u), np.int8), (node < other).astype(np.int8)]
        ),
    }


def _contract_shard(g: dict) -> dict:
    """Per node v: pair each canonical message m(u) with the local m(v);
    emit distinct contracted edges (min, max) where they differ."""
    empty = {"doc_a": np.empty(0, U64), "doc_b": np.empty(0, U64)}
    node = np.asarray(g["node"], dtype=U64)
    m = np.asarray(g["m"], dtype=U64)
    kind = np.asarray(g["kind"], dtype=np.int8)
    dirf = np.asarray(g["dir"], dtype=np.int8)
    map_i = np.nonzero(kind == _KIND_MAP)[0]
    msg_i = np.nonzero((kind == _KIND_MSG) & (dirf == 1))[0]
    if len(msg_i) == 0 or len(map_i) == 0:
        return empty
    mk = node[map_i]
    order = np.argsort(mk, kind="stable")
    mk, mv = mk[order], m[map_i][order]
    keys = node[msg_i]
    loc = np.minimum(np.searchsorted(mk, keys), len(mk) - 1)
    matched = mk[loc] == keys
    msg_i, loc = msg_i[matched], loc[matched]
    mu = m[msg_i]
    mvv = mv[loc]
    a = np.minimum(mu, mvv)
    b = np.maximum(mu, mvv)
    keep = a != b
    a, b = a[keep], b[keep]
    if len(a) == 0:
        return empty
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    first = np.ones(len(a), dtype=bool)
    first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    return {"doc_a": a[first], "doc_b": b[first]}


def _round_once(edges: Dataset, cfg: DedupConfig) -> tuple[Dataset, Dataset]:
    """One contraction round: edges -> (map m_r, contracted edges E_{r+1})."""
    halves = edges.map_batches(_half_rows, batch_format="pyarrow", zero_copy_batch=True)
    mstep = sharded_group_map(
        halves, ["node"], _mstep_shard, num_shards=cfg.group_shards
    ).materialize()

    def only_map(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = t.filter(pc.equal(t["kind"], _KIND_MAP))
        return pa.table({"node": keep["node"], "label": keep["m"]})

    mapping = mstep.map_batches(only_map, batch_format="pyarrow", zero_copy_batch=True)
    contracted = sharded_group_map(
        mstep, ["node"], _contract_shard, num_shards=cfg.group_shards
    ).materialize()
    return mapping, contracted


def _compose_maps(maps: list, cfg: DedupConfig) -> Dataset:
    """label(v) = last_map(... m_0(v)): fold the per-round maps back-to-front.

    Each fold is one hash-partitioned attach over round r's map (maps shrink
    geometrically with r, so the first fold over M_0 dominates).  A label
    missing from the later table is already a component root and keeps its
    value (0 is the attach's no-match sentinel — a real node id of 0 requires
    a doc whose 64-bit url hash is exactly 0, negligible, and consistent with
    pipelines.dedup._expand_clusters).
    """
    def with_hit(t: pa.Table) -> pa.Table:
        # explicit match flag: a LABEL of 0 is a legal value (the min doc id
        # of a component), so the attach's numeric-0 no-match sentinel cannot
        # disambiguate on the label column itself
        return t.append_column("hit", pa.array(np.ones(len(t), np.int8), pa.int8()))

    L = maps[-1]
    for M in reversed(maps[:-1]):
        j = shard_attach(
            rename_columns(M, {"label": "mid"}),
            rename_columns(L, {"node": "mid", "label": "final"}).map_batches(
                with_hit, batch_format="pyarrow", zero_copy_batch=True
            ),
            key="mid",
            payload={"final": "final", "hit": "hit"},
            num_shards=cfg.group_shards,
            how="left_outer",
        )

        def fill(t: pa.Table) -> pa.Table:
            final = np.asarray(t["final"].to_numpy(zero_copy_only=False), dtype=U64)
            mid = np.asarray(t["mid"].to_numpy(zero_copy_only=False), dtype=U64)
            hit = np.asarray(t["hit"].to_numpy(zero_copy_only=False), dtype=np.int8)
            lab = np.where(hit == 0, mid, final)
            return pa.table({"node": t["node"], "label": pa.array(lab, pa.uint64())})

        L = j.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True).materialize()
    return L


# ---------------------- phase 2: label propagation ----------------------


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


def _label_prop_loop(
    edges: Dataset,
    cfg: DedupConfig,
    round_checkpoint_dir: str | None,
    round_offset: int,
    start_labels: Dataset | None = None,
    start_round: int = 0,
) -> Dataset:
    """Residual edges -> labels(node, label) via propagation with pointer
    jumping.  ``round_offset`` numbers checkpoint rounds after the contraction
    rounds; ``start_labels``/``start_round`` resume a half-finished loop."""
    labels = start_labels
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
            rdir = os.path.join(round_checkpoint_dir, f"round_{round_offset + rnd}")
            os.makedirs(os.path.join(rdir, "labels"), exist_ok=True)
            labels.write_parquet(os.path.join(rdir, "labels"))
            with open(
                os.path.join(round_checkpoint_dir, f"round_{round_offset + rnd}.done"), "w"
            ) as f:
                f.write(json.dumps({"phase": "lp", "lp_round": rnd}))
        new_checksum = _label_checksum(labels)
        if new_checksum == checksum:
            break
        checksum = new_checksum
    return labels


# ------------------------------- fast path -------------------------------


def _driver_union_find(edges: Dataset) -> Dataset:
    """Small-edge-set fast path: collect pairs, union-find in numpy on the driver.

    Legitimate only because the edge count was just checked against the
    configured bound (verified pairs cover dup docs only, a small fraction of
    the corpus); the distributed contraction + propagation path is the scale
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


# ------------------------------- the stage -------------------------------


def cluster_stage(
    verified: Dataset, cfg: DedupConfig, round_checkpoint_dir: str | None = None
) -> Dataset:
    """verified_pairs -> clusters(doc_id, cluster_id = min doc_id in component).

    ``round_checkpoint_dir`` persists each round (contraction rounds:
    ``round_<i>/map`` + ``round_<i>/edges``; propagation rounds:
    ``round_<i>/labels``; each with a ``round_<i>.done`` JSON marker); a
    rerun resumes from the last completed round instead of restarting the
    loop (SURVEY.md §7.4 "label propagation at scale ... correctness under
    resume mid-loop" — each contraction round is a deterministic function of
    the previous round's edges, and label propagation is monotone, so
    resuming from ANY completed round converges to the identical fixpoint).
    """
    import ray.data

    edges = verified.select_columns(["doc_a", "doc_b"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty_clusters()
    if n_edges <= cfg.cluster_driver_max_edges:
        return _driver_union_find(edges)

    maps: list[Dataset] = []
    contract_done = 0
    lp_labels = None
    lp_start = 0
    if round_checkpoint_dir:
        os.makedirs(round_checkpoint_dir, exist_ok=True)
        done = sorted(
            int(f.split("_")[1].split(".")[0])
            for f in os.listdir(round_checkpoint_dir)
            if f.endswith(".done")
        )
        lp_dir = None
        edges_dir = None
        for r in done:
            with open(os.path.join(round_checkpoint_dir, f"round_{r}.done")) as f:
                info = json.loads(f.read() or "{}")
            rdir = os.path.join(round_checkpoint_dir, f"round_{r}")
            if info.get("phase") == "lp":
                # only the LAST completed propagation round's labels matter;
                # record the path and load once after the loop instead of
                # materializing every round's full label table
                lp_dir = os.path.join(rdir, "labels")
                lp_start = info.get("lp_round", 0) + 1
            else:
                maps.append(ray.data.read_parquet(os.path.join(rdir, "map")))
                contract_done = r + 1
                n_edges = info.get("edges", 0)
                if n_edges:
                    edges_dir = os.path.join(rdir, "edges")
        # load only the LAST checkpointed edge set / label table (earlier
        # rounds' files are superseded; loading them all was dead startup work)
        if edges_dir is not None and n_edges:
            edges = ray.data.read_parquet(edges_dir).materialize()
        if lp_dir is not None:
            lp_labels = ray.data.read_parquet(lp_dir).materialize()

    for rnd in range(contract_done, cfg.cluster_contract_rounds):
        if n_edges == 0 or lp_labels is not None:
            break
        mapping, contracted = _round_once(edges, cfg)
        maps.append(mapping)
        edges = contracted
        n_edges = edges.count()
        if round_checkpoint_dir:
            rdir = os.path.join(round_checkpoint_dir, f"round_{rnd}")
            os.makedirs(os.path.join(rdir, "map"), exist_ok=True)
            mapping.materialize().write_parquet(os.path.join(rdir, "map"))
            if n_edges:
                os.makedirs(os.path.join(rdir, "edges"), exist_ok=True)
                edges.write_parquet(os.path.join(rdir, "edges"))
            with open(os.path.join(round_checkpoint_dir, f"round_{rnd}.done"), "w") as f:
                f.write(json.dumps({"phase": "contract", "edges": int(n_edges)}))
        contract_done = rnd + 1

    if n_edges > 0:
        # residual after contraction: tiny for near-dup workloads (cliques
        # contract to nothing); pathological shapes (long threads) fall to
        # the driver fast path when small enough, else to the O(log n)
        # propagation loop
        if lp_labels is None and n_edges <= cfg.cluster_driver_max_edges:
            residual = rename_columns(
                _driver_union_find(edges), {"doc_id": "node", "cluster_id": "label"}
            )
        else:
            residual = _label_prop_loop(
                edges,
                cfg,
                round_checkpoint_dir,
                round_offset=contract_done,
                start_labels=lp_labels,
                start_round=lp_start,
            )
        maps.append(residual)

    if not maps:
        return _empty_clusters()
    labels = _compose_maps(maps, cfg)
    return rename_columns(labels, {"node": "doc_id", "label": "cluster_id"})


def _empty_clusters() -> Dataset:
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.uint64()), "cluster_id": pa.array([], pa.uint64())})
    )

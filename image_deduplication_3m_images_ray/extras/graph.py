"""Graph centrality over an edge-list Dataset — PageRank for web-scale
corpus curation (host/page authority as a quality prior, or centrality over
the semantic k-NN graph for data selection à la representativeness scoring).

Brin & Page 1998 power iteration with damping and uniform dangling-mass
redistribution: ``r' = (1-d)/N + d * (A^T (r/deg) + dangling_mass/N)``.

Scale shape (the ``dsir_weights`` fold pattern): the edge list is pinned
(``materialize()``) ONCE and scanned once per iteration; each block
contributes a COMPACT (dst_index, partial_sum) table (bounded by the block's
distinct destinations, never the node count), folded deterministically on the
driver; ranks + the node index are ``ray.put`` broadcast per iteration
(8 B/node + 8 B/node once — a cluster-scale shared object, zero-copy in every
task).  Driver-resident state is O(nodes) and size-gated by
``broadcast_max_nodes`` with an explicit raise — above it a real deployment
runs the textbook BSP variant (contributions re-sharded by dst each
iteration, ~16 B/edge/iteration); that exchange-per-iteration plan is the
documented alternative, not implemented here because every corpus this engine
targets (10^8-10^9 hosts) fits the broadcast bound.

Determinism: per-block partials are concatenated and lexsorted by
(dst, value) before the fold, so the float addition order is canonical
regardless of block arrival order; repeated runs produce bit-identical ranks.

Parallel edges are honored as multi-edges (each contributes its full share);
pre-``distinct`` the edge list for simple-graph semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

_I64 = np.int64
_F64 = np.float64


def pagerank(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    damping: float = 0.85,
    n_iters: int = 10,
    broadcast_max_nodes: int = 50_000_000,
    batch_size: int = 65536,
) -> pa.Table:
    """PageRank over a directed edge list -> (node_col, rank) Arrow table.

    Nodes are the union of sources and destinations; ranks sum to 1.0 (up to
    float rounding).  ``n_iters`` fixed power iterations (no convergence
    test — deterministic output, matching the unrolled SQL oracle).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")

    pinned = edges.materialize()

    # ---- node universe + out-degree (one scan of per-block distinct partials)
    def degree_partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t[src_col].to_numpy(zero_copy_only=False), dtype=_I64)
        dst = np.asarray(t[dst_col].to_numpy(zero_copy_only=False), dtype=_I64)
        u_src, cnt = np.unique(src, return_counts=True)
        u_dst = np.unique(dst)
        v = np.concatenate([u_src, u_dst])
        n = np.concatenate([cnt.astype(_I64), np.zeros(len(u_dst), _I64)])
        return pa.table({"v": pa.array(v, pa.int64()), "n": pa.array(n, pa.int64())})

    parts = pinned.map_batches(
        degree_partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    vs, ns = [], []
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=2**20):
        vs.append(np.asarray(b["v"].to_numpy(zero_copy_only=False), dtype=_I64))
        ns.append(np.asarray(b["n"].to_numpy(zero_copy_only=False), dtype=_I64))
    if not vs:
        return pa.table({node_col: pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
    all_v = np.concatenate(vs)
    all_n = np.concatenate(ns)
    nodes = np.unique(all_v)
    n_nodes = len(nodes)
    if n_nodes > broadcast_max_nodes:
        raise ValueError(
            f"node count ({n_nodes}) exceeds broadcast_max_nodes "
            f"({broadcast_max_nodes}); run the BSP exchange-per-iteration plan"
        )
    deg = np.zeros(n_nodes, _I64)
    np.add.at(deg, np.searchsorted(nodes, all_v), all_n)
    dangling = deg == 0

    nodes_ref = ray.put(nodes)
    deg_ref = ray.put(deg.astype(_F64))

    # ---- power iterations: one pinned-edge scan each, compact block partials
    d = float(damping)
    ranks = np.full(n_nodes, 1.0 / n_nodes, _F64)
    for _ in range(n_iters):
        ranks_ref = ray.put(ranks)

        def contrib(t: pa.Table) -> pa.Table:
            nd = ray.get(nodes_ref)
            dg = ray.get(deg_ref)
            rk = ray.get(ranks_ref)
            src = np.searchsorted(nd, np.asarray(t[src_col].to_numpy(zero_copy_only=False), dtype=_I64))
            dst = np.searchsorted(nd, np.asarray(t[dst_col].to_numpy(zero_copy_only=False), dtype=_I64))
            w = rk[src] / dg[src]
            order = np.argsort(dst, kind="stable")
            dst_s, w_s = dst[order], w[order]
            new = np.ones(len(dst_s), dtype=bool)
            new[1:] = dst_s[1:] != dst_s[:-1]
            b = np.nonzero(new)[0]
            return pa.table(
                {
                    "i": pa.array(dst_s[b], pa.int64()),
                    "s": pa.array(np.add.reduceat(w_s, b) if len(b) else w_s[:0], pa.float64()),
                }
            )

        agg = np.zeros(n_nodes, _F64)
        pi, ps = [], []
        for b in pinned.map_batches(
            contrib, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=2**20):
            pi.append(np.asarray(b["i"].to_numpy(zero_copy_only=False), dtype=_I64))
            ps.append(np.asarray(b["s"].to_numpy(zero_copy_only=False), dtype=_F64))
        if pi:
            fi = np.concatenate(pi)
            fs = np.concatenate(ps)
            order = np.lexsort((fs, fi))  # canonical float addition order
            np.add.at(agg, fi[order], fs[order])
        dm = float(ranks[dangling].sum())
        ranks = (1.0 - d) / n_nodes + d * (agg + dm / n_nodes)

    return pa.table({node_col: pa.array(nodes, pa.int64()), "rank": pa.array(ranks, pa.float64())})


def graph_components(
    edges: Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    cfg=None,
) -> Dataset:
    """Connected components over an UNDIRECTED view of an edge list ->
    (node_col, component_id = min node id in the component).

    The generic-graph face of the flagship's cluster machinery
    (:func:`stages.cluster.cluster_stage`): min-label contraction rounds
    collapse dense components, label propagation with pointer jumping
    finishes the residual, and edge sets small enough take the exact driver
    union-find — all size-gated by the shared :class:`DedupConfig` knobs.
    Nodes are the edge endpoints (an isolated node needs a self-loop row to
    appear).  Edge direction is ignored; parallel edges are harmless.
    """
    from ..config import DedupConfig
    from ..stages.cluster import cluster_stage

    cfg = cfg or DedupConfig()

    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": t[src_col].cast(pa.int64()),
                "doc_b": t[dst_col].cast(pa.int64()),
            }
        )

    labels = cluster_stage(
        edges.map_batches(to_pairs, batch_format="pyarrow", zero_copy_batch=True), cfg
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({node_col: t["doc_id"], "component_id": t["cluster_id"]})

    return labels.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)

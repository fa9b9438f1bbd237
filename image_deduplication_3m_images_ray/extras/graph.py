"""Graph centrality over an edge-list Dataset — PageRank for web-scale
corpus curation (host/page authority as a quality prior, or centrality over
the semantic k-NN graph for data selection à la representativeness scoring).

Brin & Page 1998 power iteration with damping and uniform dangling-mass
redistribution: ``r' = (1-d)/N + d * (A^T (r/deg) + dangling_mass/N)``.

Two size-selected plans behind one ``pagerank()`` entry point:

- **broadcast** (below ``broadcast_max_nodes``, the ``dsir_weights`` fold
  pattern): the edge list is pinned (``materialize()``) ONCE and scanned once
  per iteration; each block contributes a COMPACT (dst_index, partial_sum)
  table (bounded by the block's distinct destinations, never the node count),
  folded deterministically on the driver; ranks + the node index are
  ``ray.put`` broadcast per iteration (8 B/node + 8 B/node once — a
  cluster-scale shared object, zero-copy in every task).  Driver-resident
  state is O(nodes), which every host-graph corpus this engine targets
  (10^8-10^9 hosts) fits.
- **bsp** (above the gate, or ``plan="bsp"``): the textbook BSP /
  Pregel-style variant for page-level graphs (10^12 nodes).  Per iteration,
  TWO hash exchanges and zero O(nodes) driver state: (1) edges union the
  live (deg>0) rank rows, keyed by ``hash(src)`` — each shard looks up
  rank/deg for its srcs with one ``searchsorted`` and folds per-dst
  contribution partials; (2) those partials union the static (node, deg)
  table, keyed by ``hash(node)`` — each shard folds its nodes' inbound sums
  and emits the new (node, rank, deg) state rows.  Exchange volume is
  ~16 B/edge + ~24 B/node per iteration; dangling mass is a scalar fold
  (gathered node-sorted below ``dangling_gather_max`` dangling nodes, a
  tiny per-shard partial exchange above it).

Determinism (both plans): every float fold happens in a canonical order —
per-dst contributions are summed ascending-by-value within ascending dst
(``lexsort`` + sequential ``np.add.at``), shard contents are deterministic
functions of the key hash — so repeated runs produce bit-identical ranks.
The two plans fold through *different reduction trees* (driver fold of
per-block partials vs. per-shard fold of per-src-shard partials), so ranks
agree across plans to ~1e-13 after 10 damped iterations, not bitwise;
``tests/test_graph.py::test_bsp_matches_broadcast`` pins the bound, six
decimal orders inside the oracle's 1e-6 rounding quantum.

Parallel edges are honored as multi-edges (each contributes its full share);
pre-``distinct`` the edge list for simple-graph semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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
    plan: str = "auto",
    num_shards: int = 64,
    dangling_gather_max: int = 10_000_000,
) -> Dataset:
    """PageRank over a directed edge list -> (node_col, rank) Dataset.

    Nodes are the union of sources and destinations; ranks sum to 1.0 (up to
    float rounding).  ``n_iters`` fixed power iterations (no convergence
    test — deterministic output, matching the unrolled SQL oracle).

    ``plan``: ``"auto"`` (broadcast below ``broadcast_max_nodes``, BSP
    above), ``"broadcast"`` (raise above the gate), or ``"bsp"``.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if n_iters < 1:
        raise ValueError("n_iters must be >= 1")
    if plan not in ("auto", "broadcast", "bsp"):
        raise ValueError(f"unknown plan {plan!r}")
    if plan == "bsp":
        return _pagerank_bsp(
            edges, src_col, dst_col, node_col, damping, n_iters,
            num_shards, dangling_gather_max,
        )

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
        return _empty_ranks(node_col)
    all_v = np.concatenate(vs)
    all_n = np.concatenate(ns)
    nodes = np.unique(all_v)
    n_nodes = len(nodes)
    if n_nodes > broadcast_max_nodes:
        if plan == "broadcast":
            raise ValueError(
                f"node count ({n_nodes}) exceeds broadcast_max_nodes "
                f"({broadcast_max_nodes}); use plan='bsp' (or 'auto')"
            )
        return _pagerank_bsp(
            pinned, src_col, dst_col, node_col, damping, n_iters,
            num_shards, dangling_gather_max,
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

    import ray.data as _rd

    return _rd.from_arrow(
        pa.table({node_col: pa.array(nodes, pa.int64()), "rank": pa.array(ranks, pa.float64())})
    )


def _empty_ranks(node_col: str) -> Dataset:
    import ray.data as _rd

    return _rd.from_arrow(
        pa.table({node_col: pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
    )


def _pagerank_bsp(
    edges: Dataset,
    src_col: str,
    dst_col: str,
    node_col: str,
    damping: float,
    n_iters: int,
    num_shards: int,
    dangling_gather_max: int,
) -> Dataset:
    """Exchange-per-iteration PageRank: no O(nodes) driver state, ever.

    State between iterations is a pinned (v, rank, deg) Dataset.  Each
    iteration runs two :func:`util.sharded_group_map` exchanges:

    1. CONTRIB — edges union the live (deg>0) state rows, keyed by
       ``hash(src)``.  A shard holds every edge whose src hashes to it plus
       those srcs' (rank, deg) rows; one ``searchsorted`` lookup gives each
       edge its ``rank/deg`` share, and the shard folds per-dst partials in
       the canonical (dst asc, value asc) sequential order.
    2. APPLY — the partials union the static (v, deg) node table, keyed by
       ``hash(v)``.  A shard owns each of its nodes exactly once, folds the
       node's inbound partials (again (v asc, value asc) sequential), and
       emits ``rank' = (1-d)/N + d*(agg + dm/N)`` with the carried deg.

    Dangling mass ``dm`` is the only scalar crossing the driver: below
    ``dangling_gather_max`` dangling nodes their (v, rank) rows are gathered
    and summed node-sorted (bit-identical to the broadcast plan's
    ``ranks[dangling].sum()`` ordering); above it, per-shard partials are
    folded in min-v order (deterministic, last-ulp different rounding).

    Shard contents are deterministic functions of the key hash and every
    fold order is canonical, so output is bit-reproducible run-to-run
    regardless of physical block boundaries.
    """
    import ray.data as _rd

    from ..util import sharded_group_map

    d = float(damping)
    pinned = edges.materialize()

    # ---- distributed node table: (v, deg) via one keyed exchange of compact
    # per-block (v, n) partials — never gathered to the driver
    def degree_partial(t: pa.Table) -> pa.Table:
        src = np.asarray(t[src_col].to_numpy(zero_copy_only=False), dtype=_I64)
        dst = np.asarray(t[dst_col].to_numpy(zero_copy_only=False), dtype=_I64)
        u_src, cnt = np.unique(src, return_counts=True)
        u_dst = np.unique(dst)
        v = np.concatenate([u_src, u_dst])
        n = np.concatenate([cnt.astype(_I64), np.zeros(len(u_dst), _I64)])
        return pa.table({"v": pa.array(v, pa.int64()), "n": pa.array(n, pa.int64())})

    def sum_deg_shard(g: dict) -> dict:
        v = np.asarray(g["v"], dtype=_I64)
        n = np.asarray(g["n"], dtype=_I64)
        order = np.lexsort((n, v))
        v, n = v[order], n[order]
        first = np.ones(len(v), dtype=bool)
        if len(v) > 1:
            first[1:] = v[1:] != v[:-1]
        starts = np.nonzero(first)[0]
        deg = np.add.reduceat(n, starts) if len(starts) else np.empty(0, _I64)
        return {"v": v[starts], "deg": deg.astype(_F64)}

    node_table = sharded_group_map(
        pinned.map_batches(degree_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["v"],
        sum_deg_shard,
        num_shards=num_shards,
    ).materialize()
    n_nodes = node_table.count()
    if n_nodes == 0:
        return _empty_ranks(node_col)
    nf = float(n_nodes)

    def count_dangling(t: pa.Table) -> pa.Table:
        c = pc.sum(pc.cast(pc.equal(t["deg"], 0.0), pa.int64())).as_py() or 0
        return pa.table({"c": pa.array([c], pa.int64())})

    n_dangling = sum(
        b["c"].to_pylist()[0]
        for b in node_table.map_batches(
            count_dangling, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )

    r0 = 1.0 / nf

    def init_state(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": t["v"],
                "rank": pa.array(np.full(len(t), r0, _F64), pa.float64()),
                "deg": t["deg"],
            }
        )

    state = node_table.map_batches(
        init_state, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # tagged-union preps (uniform schema: src, dst, rank, deg, side)
    def prep_edges(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "src": t[src_col].cast(pa.int64()),
                "dst": t[dst_col].cast(pa.int64()),
                "rank": pa.array(np.zeros(n, _F64), pa.float64()),
                "deg": pa.array(np.zeros(n, _F64), pa.float64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        )

    edges_prepped = pinned.map_batches(
        prep_edges, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def prep_live_state(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["deg"], 0.0))
        n = len(t)
        return pa.table(
            {
                "src": t["v"],
                "dst": pa.array(np.zeros(n, _I64), pa.int64()),
                "rank": t["rank"],
                "deg": t["deg"],
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    def contrib_shard(g: dict) -> dict:
        side = np.asarray(g["side"], dtype=np.int8)
        src = np.asarray(g["src"], dtype=_I64)
        is_state = side == 0
        sv = src[is_state]
        order = np.argsort(sv, kind="stable")
        sv = sv[order]
        rk = np.asarray(g["rank"], dtype=_F64)[is_state][order]
        dg = np.asarray(g["deg"], dtype=_F64)[is_state][order]
        e_src = src[~is_state]
        e_dst = np.asarray(g["dst"], dtype=_I64)[~is_state]
        if not len(e_src) or not len(sv):
            return {"v": np.empty(0, _I64), "s": np.empty(0, _F64)}
        li = np.searchsorted(sv, e_src)
        w = rk[li] / dg[li]
        o2 = np.lexsort((w, e_dst))  # canonical per-dst fold order
        dst_s, w_s = e_dst[o2], w[o2]
        first = np.ones(len(dst_s), dtype=bool)
        if len(dst_s) > 1:
            first[1:] = dst_s[1:] != dst_s[:-1]
        starts = np.nonzero(first)[0]
        out = np.zeros(len(starts), _F64)
        seg = np.cumsum(first) - 1
        np.add.at(out, seg, w_s)  # sequential, ascending-value within dst
        return {"v": dst_s[starts], "s": out}

    # APPLY-side union preps (uniform schema: v, s, deg, side)
    def prep_nodes(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "v": t["v"],
                "s": pa.array(np.zeros(n, _F64), pa.float64()),
                "deg": t["deg"],
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
        )

    nodes_prepped = node_table.map_batches(
        prep_nodes, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def prep_partials(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "v": pa.array(np.asarray(t["v"].to_numpy(zero_copy_only=False), dtype=_I64), pa.int64()),
                "s": pa.array(np.asarray(t["s"].to_numpy(zero_copy_only=False), dtype=_F64), pa.float64()),
                "deg": pa.array(np.zeros(n, _F64), pa.float64()),
                "side": pa.array(np.ones(n, np.int8), pa.int8()),
            }
        )

    def make_apply_shard(dm: float):
        def apply_shard(g: dict) -> dict:
            side = np.asarray(g["side"], dtype=np.int8)
            v = np.asarray(g["v"], dtype=_I64)
            is_node = side == 0
            nv = v[is_node]
            order = np.argsort(nv, kind="stable")
            nv = nv[order]
            dg = np.asarray(g["deg"], dtype=_F64)[is_node][order]
            pv = v[~is_node]
            ps = np.asarray(g["s"], dtype=_F64)[~is_node]
            agg = np.zeros(len(nv), _F64)
            if len(pv):
                o2 = np.lexsort((ps, pv))
                np.add.at(agg, np.searchsorted(nv, pv[o2]), ps[o2])
            rank = (1.0 - d) / nf + d * (agg + dm / nf)
            return {"v": nv, "rank": rank, "deg": dg}

        return apply_shard

    def dangling_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["deg"], 0.0))
        return pa.table({"v": t["v"], "rank": t["rank"]})

    def _dangling_mass(st: Dataset) -> float:
        if n_dangling == 0:
            return 0.0
        dang = st.map_batches(dangling_rows, batch_format="pyarrow", zero_copy_batch=True)
        if n_dangling <= dangling_gather_max:
            vs, rs = [], []
            for b in dang.iter_batches(batch_format="pyarrow", batch_size=2**20):
                vs.append(np.asarray(b["v"].to_numpy(zero_copy_only=False), dtype=_I64))
                rs.append(np.asarray(b["rank"].to_numpy(zero_copy_only=False), dtype=_F64))
            v = np.concatenate(vs)
            r = np.concatenate(rs)
            return float(r[np.argsort(v, kind="stable")].sum())
        # per-shard partials folded in min-v order: deterministic, rounding
        # differs from the gathered sum in the last ulp
        def dm_shard(g: dict) -> dict:
            v = np.asarray(g["v"], dtype=_I64)
            r = np.asarray(g["rank"], dtype=_F64)
            o = np.argsort(v, kind="stable")
            return {"minv": v[o][:1], "part": np.array([r[o].sum()], _F64)}

        parts = sharded_group_map(dang, ["v"], dm_shard, num_shards=num_shards)
        mv, pp = [], []
        for b in parts.iter_batches(batch_format="pyarrow", batch_size=2**20):
            mv.append(np.asarray(b["minv"].to_numpy(zero_copy_only=False), dtype=_I64))
            pp.append(np.asarray(b["part"].to_numpy(zero_copy_only=False), dtype=_F64))
        if not mv:
            return 0.0
        mv, pp = np.concatenate(mv), np.concatenate(pp)
        return float(pp[np.argsort(mv, kind="stable")].sum())

    for _ in range(n_iters):
        dm = _dangling_mass(state)
        live = state.map_batches(
            prep_live_state, batch_format="pyarrow", zero_copy_batch=True
        )
        contribs = sharded_group_map(
            edges_prepped.union(live), ["src"], contrib_shard, num_shards=num_shards
        )
        partials_prepped = contribs.map_batches(
            prep_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        state = sharded_group_map(
            nodes_prepped.union(partials_prepped),
            ["v"],
            make_apply_shard(dm),
            num_shards=num_shards,
        ).materialize()

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({node_col: t["v"], "rank": t["rank"]})

    return state.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


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

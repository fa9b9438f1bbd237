"""PageRank over an edge-list Dataset — brute-force reference, dangling
nodes, multi-edges, determinism, and the broadcast gate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from image_deduplication_3m_images_ray.extras.graph import pagerank


def _brute(edges, d=0.85, n_iters=10):
    """Dense reference power iteration with uniform dangling redistribution."""
    src = np.asarray([e[0] for e in edges])
    dst = np.asarray([e[1] for e in edges])
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.zeros(n)
    np.add.at(deg, si, 1.0)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        agg = np.zeros(n)
        np.add.at(agg, di, r[si] / deg[si])
        dm = r[deg == 0].sum()
        r = (1 - d) / n + d * (agg + dm / n)
    return dict(zip(nodes.tolist(), r.tolist()))


def _run(edges, ray_session, **kw):
    import ray

    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = pagerank(ds, **kw).to_pandas()
    return dict(zip(out["node"].tolist(), out["rank"].tolist()))


EDGES = [
    (1, 2), (2, 1), (2, 3), (3, 1), (4, 3), (4, 1), (5, 4),
    (6, 7),  # 7 is dangling (no out-edges)
    (8, 1), (8, 1), (8, 3),  # parallel edge: 1 gets 2/3 of 8's mass
]


def test_matches_bruteforce(ray_session):
    got = _run(EDGES, ray_session)
    want = _brute(EDGES)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_dangling_and_multiedge_semantics(ray_session):
    got = _run(EDGES, ray_session)
    # node 1 has in-edges from 2, 3, 4 and a DOUBLE edge from 8 -> top rank
    assert got[1] == max(got.values())
    # dangling node 7 still holds rank (from 6) and redistributes it
    assert got[7] > (1 - 0.85) / len(got)
    # parallel edges weight the split: with (8,1)x2 + (8,3), node 1 takes 2/3
    # of 8's mass; dropping one copy gives it only 1/2
    single = _run([e for e in EDGES if e != (8, 1)] + [(8, 1)], ray_session)
    assert got[1] > single[1]


def test_deterministic_across_runs(ray_session):
    a = _run(EDGES, ray_session, n_iters=7)
    b = _run(EDGES, ray_session, n_iters=7)
    assert a == b  # bit-identical, not approx


def test_gate_and_validation(ray_session):
    with pytest.raises(ValueError):
        _run(EDGES, ray_session, broadcast_max_nodes=3, plan="broadcast")
    with pytest.raises(ValueError):
        _run(EDGES, ray_session, damping=1.5)
    with pytest.raises(ValueError):
        _run(EDGES, ray_session, n_iters=0)
    with pytest.raises(ValueError):
        _run(EDGES, ray_session, plan="pregel")


def _knn_like_digraph(n=120, out_deg=5, seed=7, dangling_every=11):
    """Seeded k-out digraph shaped like the 5-NN graph query feeds pagerank,
    plus a planted dangling stratum (every ``dangling_every``-th node emits
    no edges) so the dm path is exercised."""
    rng = np.random.default_rng(seed)
    edges = []
    for v in range(n):
        if v % dangling_every == 0:
            continue
        nbrs = rng.choice([u for u in range(n) if u != v], size=out_deg, replace=False)
        edges.extend((v, int(u)) for u in nbrs)
    return edges


def test_bsp_matches_bruteforce(ray_session):
    got = _run(EDGES, ray_session, plan="bsp")
    want = _brute(EDGES)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_bsp_matches_broadcast(ray_session):
    """Cross-plan parity on the 5-NN-shaped digraph: the two plans fold
    through different reduction trees, so ranks agree to ~1e-13 (pinned
    here), six decimal orders inside the oracle's 1e-6 rounding quantum —
    NOT bitwise (see extras/graph.py module docstring)."""
    edges = _knn_like_digraph()
    bc = _run(edges, ray_session, plan="broadcast")
    bsp = _run(edges, ray_session, plan="bsp", num_shards=7)
    assert set(bc) == set(bsp)
    for v in bc:
        assert abs(bc[v] - bsp[v]) < 1e-13
    # and the auto plan dispatches to BSP above the gate with the same result
    auto = _run(edges, ray_session, broadcast_max_nodes=3, num_shards=7)
    assert auto == bsp


def test_bsp_deterministic_across_runs(ray_session):
    edges = _knn_like_digraph(n=60, seed=3)
    a = _run(edges, ray_session, plan="bsp", n_iters=6, num_shards=5)
    b = _run(edges, ray_session, plan="bsp", n_iters=6, num_shards=5)
    assert a == b  # bit-identical, not approx


def test_bsp_dangling_sharded_fold(ray_session):
    """Above dangling_gather_max the dm fold goes per-shard; parity with the
    gathered path stays inside the documented rounding bound."""
    edges = _knn_like_digraph(n=80, seed=5, dangling_every=4)
    gathered = _run(edges, ray_session, plan="bsp", num_shards=5)
    sharded = _run(edges, ray_session, plan="bsp", num_shards=5, dangling_gather_max=0)
    assert set(gathered) == set(sharded)
    for v in gathered:
        assert abs(gathered[v] - sharded[v]) < 1e-13


def test_bsp_empty_edges(ray_session):
    import ray

    t = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    out = pagerank(ray.data.from_arrow(t).repartition(3), plan="bsp")
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "rank"}


def test_graph_components(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.graph import graph_components

    # two chains + a ring + a self-loop singleton, deliberately mixed direction
    edges = [(1, 2), (3, 2), (3, 4), (10, 11), (12, 11), (20, 21), (21, 22), (22, 20), (30, 30)]
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    out = (
        graph_components(ray.data.from_arrow(t).repartition(3))
        .sort("node")
        .to_pandas()
    )
    comp = dict(zip(out["node"], out["component_id"]))
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                    20: 20, 21: 20, 22: 20, 30: 30}

"""Unit tests for min-label-propagation clustering on known graphs."""

import numpy as np
import pyarrow as pa
import pytest

from image_deduplication_3m_images_ray.config import DedupConfig

# driver_max_edges=0 forces the DISTRIBUTED label-propagation path; the
# driver union-find fast path is covered by test_driver_and_distributed_agree
CFG = DedupConfig(join_num_buckets=2, cluster_max_rounds=50, cluster_driver_max_edges=0)


def _edges_ds(edges):
    import ray.data

    a = pa.array([e[0] for e in edges], pa.uint64())
    b = pa.array([e[1] for e in edges], pa.uint64())
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": a,
                "doc_b": b,
                "jaccard": pa.array([1.0] * len(edges), pa.float64()),
                "simhash_hamming": pa.array([0] * len(edges), pa.int32()),
                "match_len": pa.array([0] * len(edges), pa.int64()),
                "origin": pa.array(["lsh"] * len(edges), pa.string()),
            }
        )
    )


def _run(edges, ray_session, cfg=CFG):
    from image_deduplication_3m_images_ray.stages.cluster import cluster_stage

    out = cluster_stage(_edges_ds(edges), cfg).to_pandas()
    return dict(zip(out["doc_id"].astype(np.uint64), out["cluster_id"].astype(np.uint64)))


def test_chain_collapses_to_one(ray_session):
    # a long path graph is the worst case for label propagation
    edges = [(i, i + 1) for i in range(40)]
    labels = _run(edges, ray_session)
    assert set(labels.values()) == {0}
    assert len(labels) == 41


def test_two_components(ray_session):
    edges = [(1, 2), (2, 3), (10, 11), (12, 11)]
    labels = _run(edges, ray_session)
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[10] == labels[11] == labels[12] == 10


def test_star_and_self_consistency(ray_session):
    edges = [(100, i) for i in range(101, 110)] + [(5, 100)]
    labels = _run(edges, ray_session)
    assert set(labels.values()) == {5}


def test_driver_and_distributed_agree(ray_session):
    rng = np.random.default_rng(9)
    edges = [tuple(sorted(map(int, rng.integers(0, 120, 2)))) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    dist = _run(edges, ray_session)
    fast = _run(edges, ray_session, DedupConfig(join_num_buckets=2))
    assert dist == fast


def test_empty_edges(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.stages.cluster import cluster_stage

    ds = ray.data.from_arrow(
        pa.table({"doc_a": pa.array([], pa.uint64()), "doc_b": pa.array([], pa.uint64())})
    )
    out = cluster_stage(ds, CFG)
    assert out.count() == 0

"""Unit tests for min-label-propagation clustering on known graphs."""

import numpy as np
import pyarrow as pa
import pytest

from image_deduplication_3m_images_ray.config import DedupConfig

CFG = DedupConfig(join_num_buckets=2, cluster_max_rounds=50)


def _run(edges, ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.stages.cluster import cluster_stage

    a = pa.array([e[0] for e in edges], pa.uint64())
    b = pa.array([e[1] for e in edges], pa.uint64())
    ds = ray.data.from_arrow(
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
    out = cluster_stage(ds, CFG).to_pandas()
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


def test_empty_edges(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.stages.cluster import cluster_stage

    ds = ray.data.from_arrow(
        pa.table({"doc_a": pa.array([], pa.uint64()), "doc_b": pa.array([], pa.uint64())})
    )
    out = cluster_stage(ds, CFG)
    assert out.count() == 0

"""Unit tests for the shared Dataset helpers (sharded grouping + attach join)."""

import numpy as np
import pyarrow as pa

from image_deduplication_3m_images_ray.util import segment_bounds, shard_attach, sharded_group_map


def test_segment_bounds():
    assert list(segment_bounds(np.array([1, 1, 2, 5, 5, 5]))) == [0, 2, 3, 6]
    assert list(segment_bounds(np.array([]))) == [0]


def test_sharded_group_map_sees_whole_groups(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(1000) % 37, pa.uint64()),
                "v": pa.array(np.arange(1000), pa.int64()),
            }
        )
    )

    def per_shard(g):
        k = np.asarray(g["k"], dtype=np.uint64)
        v = np.asarray(g["v"], dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        b = segment_bounds(k)
        starts = b[:-1]
        return {"k": k[starts], "total": np.add.reduceat(v, starts)}

    out = sharded_group_map(ds, ["k"], per_shard, num_shards=8).to_pandas()
    assert len(out) == 37  # every key appears in exactly one shard
    expect = {k: sum(range(int(k), 1000, 37)) for k in range(37)}
    got = dict(zip(out["k"].astype(int), out["total"].astype(int)))
    assert got == expect


def _sides():
    import ray.data

    left = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 3, 3, 9], pa.uint64()),
                "tag": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([1, 2, 3, 4], pa.uint64()),
                "payload": pa.array(["p1", "p2", "p3", "p4"], pa.string()),
                "num": pa.array([10, 20, 30, 40], pa.int64()),
            }
        )
    )
    return left, right


def test_shard_attach_inner(ray_session):
    left, right = _sides()
    out = (
        shard_attach(left, right, key="doc_a", payload={"payload": "p", "num": "n"}, num_shards=4)
        .to_pandas()
        .sort_values(["doc_a", "tag"])
        .reset_index(drop=True)
    )
    # doc 9 has no match -> dropped; doc 3 matched twice (two left rows)
    assert list(out["doc_a"].astype(int)) == [1, 2, 3, 3]
    assert list(out["p"]) == ["p1", "p2", "p3", "p3"]
    assert list(out["n"].astype(int)) == [10, 20, 30, 30]
    assert list(out["tag"]) == ["a", "b", "c", "d"]


def test_shard_attach_left_outer(ray_session):
    left, right = _sides()
    out = (
        shard_attach(
            left, right, key="doc_a", payload={"payload": "p"}, num_shards=4, how="left_outer"
        )
        .to_pandas()
        .sort_values(["doc_a", "tag"])
        .reset_index(drop=True)
    )
    assert list(out["doc_a"].astype(int)) == [1, 2, 3, 3, 9]
    assert out["p"].tolist()[:4] == ["p1", "p2", "p3", "p3"]
    assert out["p"].tolist()[4] is None

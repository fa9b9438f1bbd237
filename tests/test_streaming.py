"""stream_dedup's sharded consumer: scale, determinism, arrival-order truth.

Round-2 verdict item 3 (consumer no longer a single driver loop) and ADVICE
item 5 (dup_of must name the earliest ARRIVAL, not the minimum doc_id).
"""

import numpy as np
import pyarrow as pa
import pytest


def _corpus(n_groups, reps, id_of, seed_text="document"):
    """reps copies of n_groups distinct texts; ids assigned by id_of(u, rep)."""
    texts, ids = [], []
    for u in range(n_groups):
        base = f"{seed_text} {u} " + " ".join(f"w{u}x{i}" for i in range(40))
        for rep in range(reps):
            ids.append(id_of(u, rep))
            texts.append(base)
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )


def test_stream_dedup_10x_multi_consumer(ray_session):
    """10x the original test's input through >1 consumer shard: every later
    copy flags the group's first arrival; all firsts pass clean."""
    import ray.data
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.streaming import stream_dedup

    t = _corpus(200, 3, lambda u, rep: u * 10 + rep + 1)
    ds = ray.data.from_arrow(t)
    out = (
        stream_dedup(ds, DedupConfig(), n_shards=6, batch_size=64)
        .to_pandas()
        .set_index("doc_id")["dup_of"]
    )
    assert len(out) == 600
    for u in range(200):
        first = u * 10 + 1
        assert out[first] == 0
        assert out[first + 1] == first
        assert out[first + 2] == first


def test_stream_dedup_determinism_across_sharding(ray_session):
    """The verdict is a pure function of stream order: block boundaries and
    consumer count must not change a single row."""
    import ray.data
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.streaming import stream_dedup

    t = _corpus(60, 3, lambda u, rep: u * 10 + rep + 1)

    def run(n_shards, batch_size, n_blocks):
        ds = ray.data.from_arrow(t).repartition(n_blocks) if n_blocks else ray.data.from_arrow(t)
        return (
            stream_dedup(ds, DedupConfig(), n_shards=n_shards, batch_size=batch_size)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    a = run(1, 16, None)
    for n_shards, batch_size, n_blocks in [(4, 16, None), (7, 64, None), (4, 32, 9)]:
        b = run(n_shards, batch_size, n_blocks)
        assert a.equals(b), (n_shards, batch_size, n_blocks)


def test_stream_dedup_earliest_arrival_not_min_id(ray_session):
    """ADVICE item 5: with ids NON-monotone in arrival order, dup_of points
    at the earliest-arriving copy even when a later copy has a smaller id."""
    import ray.data
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.streaming import stream_dedup

    # arrival order: id 900 (first copy), id 5 (second), id 400 (third)
    t = _corpus(30, 3, lambda u, rep: [900, 5, 400][rep] + u * 1000 + 1)
    ds = ray.data.from_arrow(t)
    out = (
        stream_dedup(ds, DedupConfig(), n_shards=4, batch_size=32)
        .to_pandas()
        .set_index("doc_id")["dup_of"]
    )
    for u in range(30):
        first, second, third = (x + u * 1000 + 1 for x in (900, 5, 400))
        assert out[first] == 0, "earliest arrival flagged as dup"
        assert out[second] == first, "dup_of must be earliest ARRIVAL (id 900), not min id"
        assert out[third] == first


def test_stream_dedup_returns_dataset(ray_session):
    """Round-3 verdict item 5: the verdict comes back as a Dataset of
    per-block tables (driver holds refs + counts only), values unchanged."""
    import ray.data
    from ray.data import Dataset
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.streaming import stream_dedup

    t = _corpus(20, 2, lambda u, rep: u * 10 + rep + 1)
    out = stream_dedup(ray.data.from_arrow(t), DedupConfig(), n_shards=3, batch_size=16)
    assert isinstance(out, Dataset)
    df = out.to_pandas().set_index("doc_id")["dup_of"]
    assert len(df) == 40
    for u in range(20):
        first = u * 10 + 1
        assert df[first] == 0 and df[first + 1] == first


def test_stream_dedup_rejects_zero_id(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.streaming import stream_dedup

    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a b c d e f g h", "x y z w q r s t"], pa.string())})
    with pytest.raises(Exception):
        stream_dedup(ray.data.from_arrow(t), DedupConfig(), n_shards=2, batch_size=8)

"""Bloom / sorted-set membership filters used by the verify attach semi-join."""

import numpy as np
import pyarrow as pa
import pytest

from image_deduplication_3m_images_ray.functions.bloom import BloomFilter, SortedIdSet


def test_sorted_id_set_membership():
    ids = np.array([3, 7, 7, 100, 2**63], dtype=np.uint64)
    s = SortedIdSet(np.unique(ids))
    probe = np.array([0, 3, 6, 7, 100, 2**63, 2**64 - 1], dtype=np.uint64)
    got = s.contains(probe)
    assert got.tolist() == [False, True, False, True, True, True, False]
    assert SortedIdSet(np.empty(0, np.uint64)).contains(probe).sum() == 0


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 2**64, size=50_000, dtype=np.uint64)
    bf = BloomFilter(BloomFilter.size_bits(len(ids), 12), 8).add(ids)
    assert bf.contains(ids).all()


def test_bloom_false_positive_rate():
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 2**64, size=50_000, dtype=np.uint64)
    bf = BloomFilter(BloomFilter.size_bits(len(ids), 12), 8).add(ids)
    absent = rng.integers(0, 2**64, size=100_000, dtype=np.uint64)
    absent = absent[~np.isin(absent, ids)]
    fpr = bf.contains(absent).mean()
    assert fpr < 0.01, fpr  # theory ~3e-4 at 12 bits/id, k=8


def test_bloom_merge_equals_single_build():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**64, size=10_000, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=10_000, dtype=np.uint64)
    m = BloomFilter.size_bits(20_000, 12)
    one = BloomFilter(m, 8).add(np.concatenate([a, b]))
    merged = BloomFilter(m, 8).add(a).merge(BloomFilter(m, 8).add(b))
    assert np.array_equal(one.words, merged.words)
    with pytest.raises(ValueError):
        BloomFilter(m, 8).merge(BloomFilter(m * 2, 8))


def test_bloom_deterministic_and_sizing():
    ids = np.arange(1000, dtype=np.uint64)
    m = BloomFilter.size_bits(1000, 12)
    assert m & (m - 1) == 0 and m >= 12 * 1000
    w1 = BloomFilter(m, 8).add(ids).words
    w2 = BloomFilter(m, 8).add(ids[::-1].copy()).words
    assert np.array_equal(w1, w2)
    assert BloomFilter.size_bits(0, 12) == 1 << 16  # floor
    assert BloomFilter.size_bits(10**12, 12, max_bits=1 << 33) == 1 << 33  # ceiling
    with pytest.raises(ValueError):
        BloomFilter(100)  # not a power of two


def test_distributed_bloom_build_matches_local(ray_session):
    """_side_memberships' Bloom path (tree-OR over per-block partials) equals a
    single local build over the same side's ids, split by origin."""
    import ray.data
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.stages.verify import (
        ORIGIN_LSH,
        ORIGIN_WINNOW,
        _side_memberships,
    )

    rng = np.random.default_rng(5)
    n = 4000
    a = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    b = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    origin = np.where(rng.random(n) < 0.5, ORIGIN_LSH, ORIGIN_WINNOW).astype(np.int8)
    t = pa.table(
        {
            "doc_a": pa.array(a, pa.uint64()),
            "doc_b": pa.array(b, pa.uint64()),
            "origin": pa.array(origin, pa.int8()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(7)
    cfg = DedupConfig(attach_semijoin_max_ids=0)  # force the Bloom path
    fl, fw = _side_memberships(ds, "doc_a", cfg)
    m = BloomFilter.size_bits(n, cfg.attach_bloom_bits_per_id)
    lsh_ids = a[origin == ORIGIN_LSH]
    win_ids = a[origin == ORIGIN_WINNOW]
    assert np.array_equal(fl.words, BloomFilter(m, cfg.attach_bloom_hashes).add(lsh_ids).words)
    assert np.array_equal(fw.words, BloomFilter(m, cfg.attach_bloom_hashes).add(win_ids).words)
    assert fl.contains(lsh_ids).all() and fw.contains(win_ids).all()


def test_side_memberships_exact_path(ray_session):
    """Below the bound the exact sorted-id sets hold precisely the side's ids."""
    import ray.data
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.stages.verify import (
        ORIGIN_LSH,
        ORIGIN_WINNOW,
        _side_memberships,
    )

    rng = np.random.default_rng(9)
    n = 1000
    a = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    b = rng.integers(0, 2**63, size=n, dtype=np.uint64)
    origin = np.where(rng.random(n) < 0.5, ORIGIN_LSH, ORIGIN_WINNOW).astype(np.int8)
    t = pa.table(
        {
            "doc_a": pa.array(a, pa.uint64()),
            "doc_b": pa.array(b, pa.uint64()),
            "origin": pa.array(origin, pa.int8()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    cfg = DedupConfig()
    sl, sw = _side_memberships(ds, "doc_b", cfg)
    assert isinstance(sl, SortedIdSet) and isinstance(sw, SortedIdSet)
    assert np.array_equal(sl.ids, np.unique(b[origin == ORIGIN_LSH]))
    assert np.array_equal(sw.ids, np.unique(b[origin == ORIGIN_WINNOW]))


def test_distributed_bloom_build_tolerates_empty_blocks(ray_session):
    """Empty input blocks pass through map_batches with the ORIGINAL candidates
    schema (Ray Data skips the UDF on zero-row blocks); the tree-OR must skip
    them instead of KeyError-ing on the missing partial columns."""
    import ray.data
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.stages.verify import (
        ORIGIN_LSH,
        _side_memberships,
    )

    ids = np.arange(1, 33, dtype=np.uint64)
    t = pa.table(
        {
            "doc_a": pa.array(ids, pa.uint64()),
            "doc_b": pa.array(ids + 1000, pa.uint64()),
            "origin": pa.array(np.full(len(ids), ORIGIN_LSH, np.int8), pa.int8()),
        }
    )
    empty = t.slice(0, 0)
    ds = ray.data.from_arrow([t, empty, empty])
    cfg = DedupConfig(attach_semijoin_max_ids=0)  # force the Bloom path
    fl, fw = _side_memberships(ds, "doc_a", cfg)
    assert fl.contains(ids).all()
    assert not fw.contains(ids).any()

"""Sharded ANN-LSH top-k and recall-targeted hyperplane pairs.

Round-2 verdict items 4 and 8: ``ann_lsh_topk`` must not issue one Python
call per bucket (it now routes through ``sharded_group_map`` at any
``n_bits``), multi-table probing must raise recall, and
``lsh_params_for_recall`` must size ``n_tables`` so a planted corpus
achieves the requested recall.
"""

import numpy as np
import pyarrow as pa
import pytest


def _planted(n_base=250, d=16, noise=0.02, seed=123):
    """Corpus of n_base random unit vectors, each with one planted near-dup
    (row i's dup is row n_base + i).  Returns (arrow table, float64 matrix)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dup = base + noise * rng.standard_normal((n_base, d))
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    m = np.concatenate([base, dup])
    tbl = pa.table(
        {
            "vec_id": pa.array(range(len(m)), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1).astype(np.float32), pa.float32()), d
            ).cast(pa.list_(pa.float32())),
        }
    )
    return tbl, m


def test_lsh_params_for_recall_math():
    from image_deduplication_3m_images_ray.extras.similarity import (
        lsh_params_for_recall,
        lsh_table_collision_prob,
    )

    p1 = lsh_table_collision_prob(0.9, 8)
    assert 0.0 < p1 < 1.0
    n, exp = lsh_params_for_recall(0.9, 0.9, n_bits=8)
    assert exp >= 0.9
    assert 1.0 - (1.0 - p1) ** (n - 1) < 0.9  # minimal: one fewer misses
    # identical vectors always collide
    assert lsh_params_for_recall(1.0, 0.999, n_bits=64) == (1, 1.0)
    # more bits -> smaller buckets -> more tables for the same recall
    n_hi, _ = lsh_params_for_recall(0.9, 0.9, n_bits=16, max_tables=10_000)
    assert n_hi > n
    with pytest.raises(ValueError):
        lsh_params_for_recall(0.5, 0.9999, n_bits=64, max_tables=4)
    with pytest.raises(ValueError):
        lsh_params_for_recall(0.9, 1.5)


def test_ann_lsh_topk_sharded_high_bits(ray_session):
    """n_bits=16 (65k+ buckets) with multi-table probing: self-hit rank 1,
    planted neighbor recovered for most queries, no duplicate hits."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.similarity import ann_lsh_topk

    tbl, m = _planted()
    n_base = len(m) // 2
    ds = ray.data.from_arrow(tbl).repartition(5)
    q_idx = np.arange(0, n_base, 5)  # 50 base vectors as queries
    out = ann_lsh_topk(
        ds, m[q_idx], q_idx, k=3, n_bits=16, n_tables=8, num_shards=16
    ).to_pandas()
    assert not out.duplicated(["query_id", "vec_id"]).any()
    hits = 0
    for qi in q_idx:
        rows = out[out["query_id"] == qi].sort_values("rank")
        assert int(rows.iloc[0]["vec_id"]) == qi  # self always collides
        assert list(rows["rank"]) == list(range(1, len(rows) + 1))
        if (rows["vec_id"] == qi + n_base).any():
            hits += 1
    # theory: pair at ~0.02 noise collides per table w.p. ~0.66 at 16 bits;
    # 8 tables -> recall ~0.9998.  Leave slack for the finite draw.
    assert hits / len(q_idx) >= 0.9, hits / len(q_idx)


def test_ann_lsh_multi_table_recall_monotone(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.similarity import ann_lsh_topk

    tbl, m = _planted(n_base=150, noise=0.08, seed=7)
    n_base = len(m) // 2
    ds = ray.data.from_arrow(tbl).repartition(3)
    q_idx = np.arange(n_base)

    def recall(n_tables):
        out = ann_lsh_topk(
            ds, m[q_idx], q_idx, k=3, n_bits=16, n_tables=n_tables, num_shards=8
        ).to_pandas()
        found = out.groupby("query_id")["vec_id"].apply(set)
        return np.mean([qi + n_base in found.get(qi, set()) for qi in q_idx])

    r1, r6 = recall(1), recall(6)
    assert r6 >= r1
    assert r6 >= 0.7, (r1, r6)


def test_hyperplane_pairs_target_recall(ray_session):
    """task-8 acceptance: the closed-form table count achieves the requested
    recall on a planted corpus (measured against exact local pairs)."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.similarity import hyperplane_cosine_pairs

    tbl, m = _planted(n_base=200, noise=0.12, seed=31)
    sim = m @ m.T
    ia, ib = np.nonzero(np.triu(sim >= 0.9, k=1))
    truth = set(zip(ia.tolist(), ib.tolist()))
    assert len(truth) >= 100  # the plant worked
    ds = ray.data.from_arrow(tbl).repartition(4)
    pairs = hyperplane_cosine_pairs(
        ds, threshold=0.9, n_bits=8, target_recall=0.9, num_shards=16
    ).to_pandas()
    got = set(zip(pairs["vec_a"].astype(int), pairs["vec_b"].astype(int)))
    assert got <= truth  # precision exact: every emitted cosine is computed
    rec = len(got & truth) / len(truth)
    assert rec >= 0.85, rec


def test_ann_lsh_multiprobe_recall_monotone(ray_session):
    """Flipping smallest-margin bits probes adjacent buckets: recall at
    multiprobe=3 must be >= plain single-table recall, with no dup hits."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.similarity import ann_lsh_topk

    tbl, m = _planted(n_base=150, noise=0.08, seed=21)
    n_base = len(m) // 2
    ds = ray.data.from_arrow(tbl).repartition(3)
    q_idx = np.arange(n_base)

    def recall(multiprobe):
        out = ann_lsh_topk(
            ds, m[q_idx], q_idx, k=3, n_bits=16, n_tables=1,
            multiprobe=multiprobe, num_shards=8,
        ).to_pandas()
        assert not out.duplicated(["query_id", "vec_id"]).any()
        found = out.groupby("query_id")["vec_id"].apply(set)
        return np.mean([qi + n_base in found.get(qi, set()) for qi in q_idx])

    r0, r3 = recall(0), recall(3)
    assert r3 >= r0
    assert r3 >= min(1.0, r0 + 0.05), (r0, r3)  # 3 extra probes must help here

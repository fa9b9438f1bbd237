"""Distributed Lloyd's k-means — numpy reference parity, partition
invariance, empty-cluster handling, k > n guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from image_deduplication_3m_images_ray.extras.clustering import (
    kmeans,
    kmeans_assign,
    kmeans_fit,
)


def _make_ds(rows: np.ndarray, ids=None, parts: int = 1):
    n = len(rows)
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [r.astype(np.float32) for r in rows], pa.list_(pa.float32())
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(parts)


def _brute(rows: np.ndarray, k: int, n_iter: int):
    """Dense reference Lloyd's with smallest-id init + empty-keeps-previous."""
    rows = rows.astype(np.float32).astype(np.float64)
    cent = rows[:k].copy()  # ids are 0..n-1 ascending in _make_ds
    for _ in range(n_iter):
        d2 = (
            (rows * rows).sum(1, keepdims=True)
            - 2 * rows @ cent.T
            + (cent * cent).sum(1)[None]
        )
        lab = np.argmin(d2, axis=1)
        for c in range(k):
            m = lab == c
            if m.any():
                cent[c] = rows[m].mean(0)
    d2 = np.maximum(
        (rows * rows).sum(1, keepdims=True)
        - 2 * rows @ cent.T
        + (cent * cent).sum(1)[None],
        0,
    )
    lab = np.argmin(d2, axis=1)
    return cent, lab, np.sqrt(d2[np.arange(len(lab)), lab])


def test_matches_numpy_reference_across_partitionings(ray_session):
    rng = np.random.default_rng(7)
    rows = rng.normal(size=(200, 16))
    _, lab_ref, dist_ref = _brute(rows, k=5, n_iter=4)
    outs = []
    for parts in (1, 7):
        out = (
            kmeans(_make_ds(rows, parts=parts), k=5, n_iter=4)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        np.testing.assert_array_equal(out["label_km"].to_numpy(), lab_ref)
        np.testing.assert_allclose(out["dist"].to_numpy(), dist_ref, rtol=0, atol=1e-9)
        outs.append(out)
    # block layout must not change the answer
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_init_is_smallest_ids_not_first_rows(ray_session):
    rng = np.random.default_rng(3)
    rows = rng.normal(size=(60, 8))
    ids = np.arange(60, dtype=np.int64)[::-1].copy()  # ids descend in row order
    cent = kmeans_fit(_make_ds(rows, ids=ids), k=4, n_iter=0)
    # ids 0..3 are the LAST four rows
    expect = rows[-4:][::-1].astype(np.float32).astype(np.float64)
    np.testing.assert_allclose(cent, expect, rtol=0, atol=0)


def test_empty_cluster_keeps_previous_centroid(ray_session):
    # two tight blobs, k=3: the third centroid (init = point 2, inside blob A)
    # empties after iteration 1 and must keep its previous position
    blob_a = np.zeros((5, 4)) + [0, 0, 0, 0]
    blob_a[2] = [9, 9, 9, 9]  # id 2: far outlier used as init for label 2
    blob_b = np.ones((5, 4)) * 100
    rows = np.vstack([blob_a, blob_b])
    cent = kmeans_fit(_make_ds(rows), k=3, n_iter=2)
    assert cent.shape == (3, 4)
    assert np.isfinite(cent).all()
    out = kmeans(_make_ds(rows), k=3, n_iter=2).to_pandas()
    assert set(out.columns) == {"vec_id", "label_km", "dist"}
    _, lab_ref, _ = _brute(rows, k=3, n_iter=2)
    np.testing.assert_array_equal(
        out.sort_values("vec_id")["label_km"].to_numpy(), lab_ref
    )


def test_k_exceeding_table_raises(ray_session):
    rows = np.random.default_rng(0).normal(size=(3, 4))
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(_make_ds(rows), k=5, n_iter=1)


def test_assign_ties_break_to_smallest_label(ray_session):
    rows = np.array([[0.0, 0.0]])
    cent = np.array([[1.0, 0.0], [-1.0, 0.0]])  # equidistant
    out = kmeans_assign(_make_ds(rows), cent).to_pandas()
    assert out["label_km"].tolist() == [0]


def test_semdedup_kmeans_composition(ray_session):
    """kmeans labels feed semdedup_prune end-to-end: planted duplicate pairs
    inside tight blobs are flagged; cross-blob vectors are not."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from image_deduplication_3m_images_ray.extras.similarity import semdedup_prune

    rng = np.random.default_rng(13)
    blob_a = rng.normal(size=(1, 8)) + rng.normal(scale=0.01, size=(10, 8))
    blob_b = rng.normal(size=(1, 8)) * -3 + rng.normal(scale=0.01, size=(10, 8))
    rows = np.vstack([blob_a, blob_b])
    ds = _make_ds(rows, parts=3)

    from image_deduplication_3m_images_ray.extras.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    cent = kmeans_fit(ds, k=2, n_iter=3)
    labeled = kmeans_assign(ds, cent).drop_columns(["dist"])
    out = semdedup_prune(labeled, threshold=0.99, label_col="label_km").to_pandas()
    # each tight blob keeps exactly one member; 2 clusters -> 2 keepers
    assert len(out) == 20
    assert (out["is_dup"] == 0).sum() == 2
    # keepers are in different kmeans clusters
    keep = out[out["is_dup"] == 0]
    assert set(keep["label_km"]) == {0, 1}


def test_kmeans_parallel_init_quality_and_determinism(ray_session):
    """Adversarial layout: the k smallest ids all sit in ONE blob, so the
    default init collapses (Lloyd's cannot split a cluster it never seeds);
    k-means|| seeds by D^2 and recovers all blobs — deterministically."""
    from image_deduplication_3m_images_ray.extras.clustering import (
        kmeans_parallel_init,
    )

    rng = np.random.default_rng(3)
    centers = rng.normal(scale=10, size=(4, 16))
    rows = np.vstack(
        [centers[i % 4] + rng.normal(scale=0.1, size=16) for i in range(400)]
    )
    rows[0:4] = centers[0] + rng.normal(scale=0.1, size=(4, 16))  # ids 0-3: blob 0

    def inertia(ds, cent):
        out = kmeans_assign(ds, cent).to_pandas()
        return float((out["dist"] ** 2).sum())

    inits, inertias = [], {}
    for parts in (1, 5):
        ds = _make_ds(rows, parts=parts)
        init = kmeans_parallel_init(ds, k=4, rounds=4)
        assert init.shape == (4, 16)
        inits.append(init)
        inertias[parts] = (
            inertia(ds, kmeans_fit(ds, k=4, n_iter=5, init="kmeans_par")),
            inertia(ds, kmeans_fit(ds, k=4, n_iter=5, init="smallest_ids")),
        )
    np.testing.assert_array_equal(inits[0], inits[1])  # partition-invariant
    for par, sid in inertias.values():
        assert par < sid / 100  # collapse vs recovery is not subtle
    assert inertias[1] == inertias[5]


def test_kmeans_fit_explicit_and_bad_init(ray_session):
    rows = np.random.default_rng(0).normal(size=(30, 4))
    ds = _make_ds(rows)
    explicit = rows[:3].astype(np.float64)
    cent = kmeans_fit(ds, k=3, n_iter=0, init=explicit)
    np.testing.assert_allclose(cent, explicit)
    with pytest.raises(ValueError, match="expected k"):
        kmeans_fit(ds, k=2, n_iter=1, init=explicit)
    with pytest.raises(ValueError, match="unknown init"):
        kmeans_fit(ds, k=2, n_iter=1, init="random")

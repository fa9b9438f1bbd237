"""Distributed full-data Lloyd's k-means over an embedding column.

Complements :func:`extras.similarity.ivf_train_centroids` (a driver-side
*sample* quantizer): here every Lloyd iteration scans the ENTIRE table —
the E-step is a broadcast-centroid vectorized assign inside ``map_batches``,
the M-step reduces per-block partial sums (k x d doubles per block, O(1) in
the table size) on the driver.  At 10^9+ vectors this is the textbook
scale shape: per-iteration cost is one streaming pass + a k*d*n_blocks-byte
fan-in, never a shuffle of the vectors themselves.

Reference analog role: the reference clusters embeddings by pairwise cosine
+ connected components (/root/reference/modules/deduplication.py:1207-1283);
k-means is the partitional counterpart used by SemDeDup (Abbas et al. 2023)
to form the clusters its within-cluster pruning needs —
:func:`extras.similarity.semdedup_prune` consumes this operator's labels.

Determinism: init is the vectors of the k smallest ids (a pure function of
the data, independent of block order and count); each M-step mean is a sum
of per-block float64 partials, so the result is block-layout-dependent only
in the last ulp (assignments flip only on exact distance near-ties, which
the driver oracle confirms do not occur on the test corpora).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from .dedup_ops import embeddings_to_matrix


def _smallest_k_vectors(embeddings: Dataset, k: int) -> np.ndarray:
    """(k, d) float64 rows of the k smallest vec_ids — one scan, per-block
    partial top-k (k x d bytes per block to the driver, never full columns)."""
    import ray as _ray

    def partial(t: pa.Table) -> pa.Table:
        ids, rows = embeddings_to_matrix(t)
        order = np.argsort(ids, kind="stable")[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "v": pa.array(list(rows[order]), pa.list_(pa.float64())),
            }
        )

    parts = [
        t
        for t in _ray.get(
            embeddings.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not parts:
        raise ValueError(f"k={k} exceeds the table's 0 vectors")
    merged = pa.concat_tables(parts)
    ids = np.asarray(merged["vec_id"].to_numpy(zero_copy_only=False))
    rows = np.asarray(
        merged["v"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
    ).reshape(len(ids), -1)
    order = np.argsort(ids, kind="stable")[:k]
    if len(order) < k:
        raise ValueError(f"k={k} exceeds the table's {len(order)} vectors")
    return rows[order].copy()


def _sq_dists(rows: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n, k) squared L2 distances via the expanded form (one matmul)."""
    # clip: ||x||^2 - 2xC + ||c||^2 can go epsilon-negative in float64
    d2 = (
        (rows * rows).sum(axis=1, keepdims=True)
        - 2.0 * (rows @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    return np.maximum(d2, 0.0)


def _cost_and_sample(
    embeddings: Dataset,
    cent: np.ndarray,
    thresh_per_d2: float,
    rnd: int,
    batch_size: int,
) -> tuple[float, np.ndarray]:
    """One pass: total cost sum(min d^2) + the points whose hash draw
    u = splitmix64(vec_id ^ rnd)/2^64 falls below thresh_per_d2 * d^2(x, C)
    (the k-means|| per-round sampling rule with deterministic uniforms)."""
    import ray as _ray

    from ..functions.hashing import U64, splitmix64

    ref = _ray.put(cent)
    seed = U64(0x9E3779B97F4A7C15) * U64(rnd + 1)

    def fn(t: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        ids, rows = embeddings_to_matrix(t)
        d2 = _sq_dists(rows, c).min(axis=1)
        u = splitmix64(ids.astype(U64) ^ seed).astype(np.float64) / float(2**64)
        keep = u < thresh_per_d2 * d2
        return pa.table(
            {
                "cost": pa.array([float(d2.sum())], pa.float64()),
                "picked": pa.array([list(rows[keep].reshape(-1))], pa.list_(pa.float64())),
                "n_picked": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    parts = [
        t
        for t in _ray.get(
            embeddings.map_batches(
                fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    cost = 0.0
    picks = []
    d = cent.shape[1]
    for t in parts:
        cost += float(np.asarray(t["cost"].to_numpy(zero_copy_only=False)).sum())
        flat = np.asarray(
            t["picked"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        )
        if len(flat):
            picks.append(flat.reshape(-1, d))
    picked = np.concatenate(picks) if picks else np.empty((0, d), dtype=np.float64)
    return cost, picked


def kmeans_parallel_init(
    embeddings: Dataset,
    k: int,
    rounds: int = 5,
    oversample: int | None = None,
    batch_size: int = 4096,
) -> np.ndarray:
    """Deterministic k-means|| (Bahmani et al., VLDB 2012) seeding over the
    FULL table: (k, d) float64 initial centroids.

    The smallest-id default init degenerates when the k smallest ids happen
    to sit in one dense region; k-means|| seeds proportionally to squared
    distance from the current seed set, fixing that with ``rounds`` + 1
    streaming passes.  Each point is drawn independently with probability
    min(1, oversample * d^2(x, C) / cost(C)) — the uniform comes from
    ``splitmix64(vec_id ^ round_seed)``, so the result is a pure function of
    (data, parameters): identical across runs, machines and partitionings.
    Candidates (expected ``oversample`` per round, default 2k) are weighted
    by their nearest-point counts and reduced to k on the driver with the
    same greedy D^2 rule (kmeans++ on the weighted candidate set, argmax
    instead of a draw — deterministic).
    """
    import ray as _ray

    if oversample is None:
        oversample = 2 * k
    embeddings = embeddings.materialize()
    cent = _smallest_k_vectors(embeddings, 1)  # deterministic first seed
    # Bahmani's practical variant folds cost + sampling into one pass per
    # round by thresholding against the PREVIOUS round's cost; an initial
    # pure cost pass (threshold 0) seeds the recurrence.
    cost, _ = _cost_and_sample(embeddings, cent, 0.0, rounds + 7, batch_size)
    for r in range(rounds):
        if cost <= 0:
            break
        thresh = oversample / cost
        cost, picked = _cost_and_sample(embeddings, cent, thresh, r, batch_size)
        if len(picked):
            cent = np.concatenate([cent, picked])
    if len(cent) < k:
        raise ValueError(
            f"kmeans_parallel_init: only {len(cent)} candidates after "
            f"{rounds} rounds for k={k}; raise rounds/oversample"
        )
    # weight candidates by nearest-point counts (one pass), then reduce to k
    weights = _nearest_counts(embeddings, cent, batch_size)
    return _weighted_kmeanspp_reduce(cent, weights, k)


def _nearest_counts(
    embeddings: Dataset, cent: np.ndarray, batch_size: int
) -> np.ndarray:
    import ray as _ray

    ref = _ray.put(cent)

    def fn(t: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        _, rows = embeddings_to_matrix(t)
        lab = np.argmin(_sq_dists(rows, c), axis=1)
        return pa.table(
            {"n": pa.array(np.bincount(lab, minlength=len(c)).astype(np.int64))}
        )

    counts = np.zeros(len(cent), dtype=np.int64)
    for t in _ray.get(
        embeddings.map_batches(
            fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        ).to_arrow_refs()
    ):
        if t.num_rows:
            counts += np.asarray(t["n"].to_numpy(zero_copy_only=False))
    return counts


def _weighted_kmeanspp_reduce(cand: np.ndarray, w: np.ndarray, k: int) -> np.ndarray:
    """Deterministic weighted kmeans++ on the driver-small candidate set:
    start from the heaviest candidate, then repeatedly take the argmax of
    weight * D^2 (the expectation-maximizing choice instead of a draw)."""
    chosen = [int(np.argmax(w))]
    d2 = ((cand - cand[chosen[0]]) ** 2).sum(axis=1)
    while len(chosen) < k:
        nxt = int(np.argmax(w * d2))
        if d2[nxt] == 0.0:  # all remaining mass at distance 0: duplicates
            remaining = [i for i in range(len(cand)) if i not in set(chosen)]
            for i in remaining:
                chosen.append(i)
                if len(chosen) == k:
                    break
            break
        chosen.append(nxt)
        d2 = np.minimum(d2, ((cand - cand[nxt]) ** 2).sum(axis=1))
    return cand[chosen[:k]].copy()


def kmeans_fit(
    embeddings: Dataset,
    k: int = 8,
    n_iter: int = 3,
    batch_size: int = 4096,
    init: str | np.ndarray = "smallest_ids",
) -> np.ndarray:
    """Full-data Lloyd's: returns (k, d) float64 centroids after ``n_iter``
    assign+mean rounds.  Empty clusters keep their previous centroid.

    ``init``: ``"smallest_ids"`` (default — SQL-oracle-exact),
    ``"kmeans_par"`` (deterministic k-means|| seeding, the quality path for
    real data), or an explicit (k, d) array.
    ``embeddings`` is scanned ``n_iter + 1`` times — materialized once up
    front so a lazy upstream never re-executes.
    """
    import ray as _ray

    embeddings = embeddings.materialize()
    if isinstance(init, np.ndarray):
        cent = np.asarray(init, dtype=np.float64).copy()
        if len(cent) != k:
            raise ValueError(f"init array has {len(cent)} rows, expected k={k}")
    elif init == "kmeans_par":
        cent = kmeans_parallel_init(embeddings, k, batch_size=batch_size)
    elif init == "smallest_ids":
        cent = _smallest_k_vectors(embeddings, k)
    else:
        raise ValueError(f"unknown init: {init!r}")
    d = cent.shape[1]

    for _ in range(n_iter):
        ref = _ray.put(cent)

        def partial_sums(t: pa.Table) -> pa.Table:
            c = _ray.get(ref)
            _, rows = embeddings_to_matrix(t)
            lab = np.argmin(_sq_dists(rows, c), axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, lab, rows)
            counts = np.bincount(lab, minlength=len(c)).astype(np.int64)
            return pa.table(
                {
                    "label": pa.array(np.arange(len(c), dtype=np.int32), pa.int32()),
                    "psum": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": pa.array(counts, pa.int64()),
                }
            )

        parts = [
            t
            for t in _ray.get(
                embeddings.map_batches(
                    partial_sums,
                    batch_format="pyarrow",
                    batch_size=batch_size,
                    zero_copy_batch=True,
                ).to_arrow_refs()
            )
            if t.num_rows
        ]
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for t in parts:
            lab = np.asarray(t["label"].to_numpy(zero_copy_only=False))
            ps = np.asarray(
                t["psum"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            ).reshape(len(lab), -1)
            np.add.at(sums, lab, ps)
            np.add.at(counts, lab, np.asarray(t["n"].to_numpy(zero_copy_only=False)))
        live = counts > 0
        cent[live] = sums[live] / counts[live, None]
    return cent


def kmeans_assign(
    embeddings: Dataset, centroids: np.ndarray, batch_size: int = 4096
) -> Dataset:
    """Adds ``label`` (argmin squared-L2 centroid, ties to the smallest
    index) and ``dist`` (Euclidean, full precision) to each row."""
    import ray as _ray

    ref = _ray.put(np.asarray(centroids, dtype=np.float64))

    def fn(t: pa.Table) -> pa.Table:
        c = _ray.get(ref)
        _, rows = embeddings_to_matrix(t)
        d2 = _sq_dists(rows, c)
        lab = np.argmin(d2, axis=1)
        dist = np.sqrt(d2[np.arange(len(lab)), lab])
        return t.append_column(
            "label_km", pa.array(lab.astype(np.int32), pa.int32())
        ).append_column("dist", pa.array(dist, pa.float64()))

    return embeddings.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def kmeans(
    embeddings: Dataset,
    k: int = 8,
    n_iter: int = 3,
    batch_size: int = 4096,
) -> Dataset:
    """fit + assign: (vec_id, embedding, ...) -> (vec_id, label_km, dist)."""
    embeddings = embeddings.materialize()
    cent = kmeans_fit(embeddings, k=k, n_iter=n_iter, batch_size=batch_size)
    return kmeans_assign(embeddings, cent, batch_size=batch_size).select_columns(
        ["vec_id", "label_km", "dist"]
    )

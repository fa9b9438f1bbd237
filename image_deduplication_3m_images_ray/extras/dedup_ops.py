"""Standalone dedup operators over a ``documents(doc_id, text, lang, source,
n_chars)`` table — each usable on its own, each scale-shaped for Ray Data.

Reference analogs: exact dedup = identical-hash grouping
(/root/reference/modules/deduplication.py:240-249); SimHash dedup = the
wavelet-hash Hamming stage (:234-249); embedding-cosine near-dup = the global
cosine refinement stage (:1207-1283).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import (
    U64,
    hamming64,
    minhash_seeds,
    minhash_simhash_batch,
    splitmix64,
)
from ..functions.text import normalize_array, shingle_batch


def exact_dedup_clusters(docs: Dataset) -> Dataset:
    """(doc_id, text) -> (doc_id, cluster_id, cluster_size) on byte-identical text.

    Hash-partitioned shuffle on a 64-bit text hash; groups split by the actual
    text inside the group fn, so the result is exact (collision-proof).
    """

    def add_hash(t: pa.Table) -> pa.Table:
        texts = np.asarray(t["text"].to_pylist(), dtype=object)
        h = splitmix64(pd.util.hash_array(texts).astype(U64))
        return t.append_column("text_hash", pa.array(h, pa.uint64()))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        out = g.copy()
        grp = out.groupby(["text_hash", "text"], sort=False)["doc_id"]
        out["cluster_id"] = grp.transform("min").astype(np.int64)
        out["cluster_size"] = grp.transform("size").astype(np.int64)
        return out[["doc_id", "cluster_id", "cluster_size"]]

    from ..util import sharded_group_map

    hashed = docs.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_group_map(hashed, ["text_hash"], assign, batch_format="pandas")


def exact_dedup_keep_first(docs: Dataset) -> Dataset:
    """Distinct-by-text keep-min-doc_id -> (doc_id) of the survivors."""
    clusters = exact_dedup_clusters(docs)
    return clusters.map_batches(
        lambda t: pa.table(
            {"doc_id": t.filter(pc.equal(t["doc_id"], t["cluster_id"]))["doc_id"]}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class SimHashActor:
    """Compute 64-bit SimHash per document (stateful: seed table built once)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.seeds = minhash_seeds(cfg.num_perms, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch["text"])
        shingles, offsets = shingle_batch(norm, self.cfg.shingle_k)
        _, simhashes, _ = minhash_simhash_batch(shingles, offsets, self.seeds[:1])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(simhashes, pa.uint64()),
            }
        )


def simhash_dedup_pairs(docs: Dataset, cfg: DedupConfig, max_hamming: int = 3) -> Dataset:
    """(doc_id, text) -> candidate near-dup pairs with SimHash Hamming <= k.

    Pigeonhole banding: split the 64-bit fingerprint into ``max_hamming + 1``
    blocks; any pair within Hamming k shares at least one block verbatim, so a
    groupby per block key finds every such pair without an all-pairs scan
    (the reference's wavelet-Hamming stage does O(n^2) inside buckets —
    /root/reference/modules/deduplication.py:234-249).
    """
    n_blocks = max_hamming + 1
    width = 64 // n_blocks

    sim = docs.map_batches(
        SimHashActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.signature_concurrency,
        zero_copy_batch=True,
    )

    def explode(t: pa.Table) -> pa.Table:
        s = np.asarray(t["simhash"].to_numpy(zero_copy_only=False), dtype=U64)
        d = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        keys, docs_out, sims_out = [], [], []
        for b in range(n_blocks):
            block = (s >> U64(b * width)) & U64((1 << width) - 1)
            keys.append(splitmix64(block ^ (U64(b) << U64(48))))
            docs_out.append(d)
            sims_out.append(s)
        return pa.table(
            {
                "block_key": pa.array(np.concatenate(keys), pa.uint64()),
                "doc_id": pa.array(np.concatenate(docs_out)),
                "simhash": pa.array(np.concatenate(sims_out), pa.uint64()),
            }
        )

    def emit_shard(group: dict) -> dict:
        from ..util import segment_bounds

        key = np.asarray(group["block_key"], dtype=U64)
        ids = np.asarray(group["doc_id"])
        sims = np.asarray(group["simhash"], dtype=U64)
        order = np.lexsort((ids, key))
        key, ids, sims = key[order], ids[order], sims[order]
        bounds = segment_bounds(key)
        a_p, b_p, h_p = [], [], []
        for m in np.nonzero(np.diff(bounds) >= 2)[0]:
            lo, hi = bounds[m], bounds[m + 1]
            d, idx = np.unique(ids[lo:hi], return_index=True)
            s = sims[lo:hi][idx]
            if len(d) < 2:
                continue
            ia, ib = np.triu_indices(len(d), k=1)
            ham = hamming64(s[ia], s[ib])
            ok = ham <= max_hamming
            a_p.append(d[ia[ok]])
            b_p.append(d[ib[ok]])
            h_p.append(ham[ok].astype(np.int64))
        if not a_p:
            return {
                "doc_a": np.empty(0, dtype=ids.dtype),
                "doc_b": np.empty(0, dtype=ids.dtype),
                "hamming": np.empty(0, dtype=np.int64),
            }
        return {
            "doc_a": np.concatenate(a_p),
            "doc_b": np.concatenate(b_p),
            "hamming": np.concatenate(h_p),
        }

    def dedup_shard(group: dict) -> dict:
        a = np.asarray(group["doc_a"])
        b = np.asarray(group["doc_b"])
        order = np.lexsort((b, a))
        keep = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep[1:] = (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1])
        idx = order[keep]
        return {k: np.asarray(v)[idx] for k, v in group.items()}

    from ..util import sharded_group_map

    pairs = sharded_group_map(
        sim.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        ["block_key"],
        emit_shard,
    )
    return sharded_group_map(pairs, ["doc_a", "doc_b"], dedup_shard)


def char_jaccard_pairs(
    docs: Dataset, threshold: float = 0.5, block_col: str = "lang"
) -> Dataset:
    """All-pairs character-set Jaccard >= t within a blocking key.

    Semantics chosen to be SQL-checkable: J = |chars(a) ∩ chars(b)| /
    |chars(a) ∪ chars(b)| over distinct characters — DuckDB's ``jaccard()``.
    The blocking column bounds the quadratic term per group (pick a
    low-cardinality, high-selectivity key; lang/source for webtext).
    """

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sets = [frozenset(t) for t in g["text"]]
        rows_a, rows_b, sims = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                sim = inter / union if union else 1.0
                if sim >= threshold:
                    rows_a.append(ids[i])
                    rows_b.append(ids[j])
                    sims.append(sim)
        return pd.DataFrame({"doc_a": rows_a, "doc_b": rows_b, "char_jaccard": sims})

    return docs.groupby(block_col).map_groups(emit, batch_format="pandas")


def minhash_lsh_clusters(docs: Dataset, cfg: DedupConfig) -> Dataset:
    """Full MinHash-LSH near-dup clustering over a documents table.

    Composition of the core pipeline stages on a (doc_id, text) shape —
    returns (doc_id, cluster_id) covering every input doc (singletons map to
    themselves).
    """
    import ray.data

    from ..stages.banding import band_postings_stage, lsh_pairs_stage
    from ..stages.cluster import cluster_stage
    from ..stages.signatures import SignatureActor
    from ..stages.verify import verify_stage
    from ..util import rename_columns

    def to_docs(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.uint64()),
                "url": pc.cast(t["doc_id"], pa.string()),
                "norm_text": norm,
                "n_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
                "lang": t["lang"] if "lang" in t.column_names else pa.array([""] * len(t)),
            }
        )

    d = docs.map_batches(to_docs, batch_format="pyarrow", zero_copy_batch=True)
    profile = d.map_batches(
        SignatureActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.signature_concurrency,
        zero_copy_batch=True,
    ).materialize()
    pairs = lsh_pairs_stage(band_postings_stage(profile, cfg), cfg, dedup=False)
    verified = verify_stage(pairs, profile, cfg).materialize()
    clusters = cluster_stage(verified, cfg)
    cl = rename_columns(clusters, {"cluster_id": "min_cluster"})
    j = d.select_columns(["doc_id"]).join(
        cl, join_type="left_outer", num_partitions=cfg.join_num_buckets, on=("doc_id",)
    )

    def fill(t: pa.Table) -> pa.Table:
        mc = t["min_cluster"]
        if isinstance(mc, pa.ChunkedArray):
            mc = mc.combine_chunks()
        did = t["doc_id"]
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        return pa.table(
            {"doc_id": did, "cluster_id": pc.coalesce(mc, did).cast(pa.uint64())}
        )

    return j.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def embeddings_to_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(vec_id, embedding list<float>) Arrow batch -> (ids int64, rows float64)."""
    ids = np.asarray(t["vec_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    emb = t["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = np.asarray(emb.flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
    return ids, flat.reshape(len(ids), -1)


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _CosinePairActor:
    """Compare each batch against a broadcast normalized matrix (one fetch per
    actor, not per batch — SURVEY.md §2.4 J1 broadcast pattern)."""

    def __init__(self, matrix_ref, threshold: float):
        import ray as _ray

        self.ids, self.matrix = _ray.get(matrix_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, rows = embeddings_to_matrix(batch)
        sim = _l2_normalize(rows) @ self.matrix.T  # (batch, all)
        ia, ib = np.nonzero(sim >= self.threshold)
        a, b = ids[ia], self.ids[ib]
        keep = a < b  # each unordered pair emitted exactly once, no self-pairs
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(sim[ia, ib][keep], pa.float64()),
            }
        )


def embedding_cosine_pairs(
    embeddings: Dataset, threshold: float = 0.9, concurrency: int = 4, batch_size: int = 1024
) -> Dataset:
    """(vec_id, embedding list<float>) -> pairs with cosine >= t.

    Brute-force with a broadcast comparison matrix: the (assumed
    broadcastable) normalized matrix goes to the object store ONCE via
    ``ray.put`` and every actor reads it in ``__init__``; each batch then does
    one float64 matmul.  Reference analog: the dense cosine similarity matrix
    of Stage 3 (/root/reference/modules/deduplication.py:1219-1283).  When the
    matrix exceeds worker memory, use the hyperplane-LSH variant in
    ``extras.similarity`` which buckets before comparing.
    """
    import ray as _ray

    # single driver-side pass to assemble the broadcast side (small by contract)
    tbl = pa.concat_tables(_ray.get(embeddings.to_arrow_refs())).combine_chunks()
    ids, matrix = embeddings_to_matrix(tbl)
    ref = _ray.put((ids, _l2_normalize(matrix)))
    return embeddings.map_batches(
        _CosinePairActor,
        fn_constructor_args=(ref, threshold),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )

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


def exact_dedup_keep_first_rows(docs: Dataset) -> Dataset:
    """Distinct-by-text keep-min-doc_id, returning the survivors' FULL rows
    (all input columns) — the composable form for pipelines that keep
    processing the surviving text (:func:`extras.curate.curate_corpus`).
    Same single hash-partitioned exchange as :func:`exact_dedup_clusters`,
    with the byte-exact text split inside the group fn."""
    import pandas as pd

    from ..functions.hashing import U64, splitmix64
    from ..util import sharded_group_map

    def add_hash(t: pa.Table) -> pa.Table:
        texts = np.asarray(t["text"].to_pylist(), dtype=object)
        h = splitmix64(pd.util.hash_array(texts).astype(U64))
        return t.append_column("text_hash", pa.array(h, pa.uint64()))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        win = g.groupby(["text_hash", "text"], sort=False)["doc_id"].transform("min")
        return g[g["doc_id"] == win].drop(columns=["text_hash"])

    hashed = docs.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_group_map(hashed, ["text_hash"], first, batch_format="pandas")


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
    """64-bit SimHash per document over the normalized token multiset.

    Token hashes use the md5 anchor (:func:`functions.hashing.md5_u64` ==
    DuckDB ``md5_number_lower``) so the whole operator — simhash values AND
    the Hamming-distance pair set — is exactly expressible as a DuckDB oracle:
    bit b of the simhash is 1 iff the sum over token occurrences of
    (+1 if bit b of the token hash else -1) is > 0.  Per-batch compute is
    vectorized: md5 runs once per DISTINCT token, bit sums are one segmented
    reduceat over the flat token stream.  (The flagship pipeline's simhash
    gate keeps the fast splitmix hash — this standalone operator trades hash
    throughput for oracle parity.)
    """

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self._bit_cols = np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64

        norm = normalize_array(batch["text"])
        tokens_list = pc.split_pattern(norm, pattern=" ")
        offsets = tokens_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = tokens_list.flatten().to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flat, return_inverse=True)
        h = md5_u64(list(uniq))[inv]  # one md5 per distinct token
        # (n_tokens, 64) sign matrix, segment-summed per doc
        bits = (((h[:, None] >> self._bit_cols) & np.uint64(1)).astype(np.int32) * 2 - 1)
        csum = np.zeros((len(h) + 1, 64), dtype=np.int64)
        np.cumsum(bits, axis=0, out=csum[1:])
        sums = csum[offsets[1:]] - csum[offsets[:-1]]  # (n_docs, 64)
        sim = ((sums > 0).astype(np.uint64) << self._bit_cols).sum(
            axis=1, dtype=np.uint64
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sim, pa.uint64()),
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
    docs: Dataset, threshold: float = 0.5, block_col: str = "lang", tile: int = 2048
) -> Dataset:
    """All-pairs character-set Jaccard >= t within a blocking key.

    Semantics (SQL-checkable): J = |chars(a) ∩ chars(b)| / |chars(a) ∪
    chars(b)| over distinct characters — DuckDB's ``jaccard()``, blocked by
    ``ON a.lang = b.lang``.  The semantics are inherently all-pairs; the
    implementation makes that tractable at scale instead of looping Python
    per pair (the round-1 design):

    - the map stage reduces each doc to its sorted distinct-codepoint set
      (vectorized segmented unique) — the shuffle ships <= ~100 uint32s per
      doc, never the text;
    - docs are bucketed by ``floor(log(set_size) / log(1/t))``: J >= t bounds
      the size ratio by t (|A∩B| <= |A|, |A∪B| >= |B|), so only same-bucket
      and adjacent-bucket pairs can pass — each doc is emitted into its home
      bucket plus the next one (ghost rows), and ghost x ghost comparisons
      are skipped so every candidate pair is compared exactly once;
    - within a (block, bucket) group the comparison is a tiled 0/1-matrix
      matmul over the group's alphabet (popcount intersection in BLAS),
      with exact integer inter/union division — no per-pair Python.
    """
    from ..functions.hashing import splitmix64, unique_per_doc
    from ..util import sharded_group_map

    if not (0 <= threshold <= 1):
        raise ValueError("threshold must be in [0, 1]")
    import math

    # t == 0 (every pair passes) and t == 1 (size ratio 1) both collapse to a
    # single bucket per block — no size-bucket pruning possible or needed
    log_base = math.log(1.0 / threshold) if 0 < threshold < 1 else None

    def prep(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        # flat codepoint stream + offsets -> vectorized per-doc distinct sets
        offs = np.zeros(len(texts) + 1, dtype=np.int64)
        np.cumsum([len(s) for s in texts], out=offs[1:])
        flat = (
            np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
            if offs[-1]
            else np.empty(0, np.uint32)
        )
        uniq, uoffs = unique_per_doc(flat.astype(U64), offs)
        sizes = np.diff(uoffs)
        if log_base is None:
            bucket = np.zeros(len(texts), dtype=np.int64)
        else:
            bucket = np.where(
                sizes > 0, np.floor(np.log(np.maximum(sizes, 1)) / log_base), 0
            ).astype(np.int64)
        blk = np.asarray(t[block_col].to_pylist(), dtype=object)
        blk_code = splitmix64(pd.util.hash_array(blk).astype(U64))
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        charset = pa.ListArray.from_arrays(
            pa.array(uoffs, pa.int32()), pa.array(uniq.astype(np.uint32), pa.uint32())
        )
        home = pa.table(
            {
                "doc_id": pa.array(ids),
                "blk": pa.array(blk_code, pa.uint64()),
                "bucket": pa.array(bucket, pa.int64()),
                "ghost": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
                "charset": charset,
            }
        )
        if log_base is None:
            return home
        # ghosts go into bucket+1 AND bucket+2: J >= t bounds the bucket gap
        # at 1 mathematically, the extra level absorbs any float rounding of
        # the log at ratio == t exactly; ghost x ghost skipping still makes
        # every candidate pair compare exactly once
        ghosts = [
            pa.table(
                {
                    "doc_id": pa.array(ids),
                    "blk": pa.array(blk_code, pa.uint64()),
                    "bucket": pa.array(bucket + d, pa.int64()),
                    "ghost": pa.array(np.ones(len(ids), np.int8), pa.int8()),
                    "charset": charset,
                }
            )
            for d in (1, 2)
        ]
        return pa.concat_tables([home, *ghosts])

    def compare(group: dict) -> dict:
        blk = np.asarray(group["blk"], dtype=U64)
        bucket = np.asarray(group["bucket"], dtype=np.int64)
        ghost = np.asarray(group["ghost"], dtype=np.int8)
        ids = np.asarray(group["doc_id"])
        charsets = np.asarray(group["charset"], dtype=object)
        order = np.lexsort((ids, ghost, bucket, blk))
        blk, bucket, ghost, ids, charsets = (
            blk[order], bucket[order], ghost[order], ids[order], charsets[order]
        )
        seg_key = splitmix64(blk * U64(0x9E3779B97F4A7C15) ^ bucket.astype(U64))
        a_out, b_out, j_out = [], [], []
        from ..util import segment_bounds

        bounds = segment_bounds(seg_key)
        for s_i in range(len(bounds) - 1):
            lo, hi = bounds[s_i], bounds[s_i + 1]
            n = hi - lo
            if n < 2:
                continue
            g_ids = ids[lo:hi]
            g_ghost = ghost[lo:hi]
            sets = charsets[lo:hi]
            # collapse IDENTICAL charsets to one representative before the
            # dense compare: webtext char profiles repeat heavily, and a hot
            # (lang, bucket) group of m docs over d distinct sets costs a
            # d x d matmul + true-output-size expansion instead of m x m
            # (planted-skew test: 10k docs / 500 distinct sets)
            skeys = np.array([c.astype(np.uint32).tobytes() for c in sets], dtype=object)
            d_keys, first_of, inv = np.unique(skeys, return_index=True, return_inverse=True)
            d = len(d_keys)
            rep_sets = sets[first_of]
            lens = np.array([len(c) for c in rep_sets], dtype=np.int64)
            alphabet, a_inv = np.unique(
                np.concatenate(rep_sets).astype(np.uint32)
                if lens.sum()
                else np.empty(0, np.uint32),
                return_inverse=True,
            )
            X = np.zeros((d, max(len(alphabet), 1)), dtype=np.float32)
            X[np.repeat(np.arange(d), lens), a_inv] = 1.0
            # members of each distinct set, grouped once
            m_order = np.argsort(inv, kind="stable")
            m_bounds = segment_bounds(inv[m_order])

            def members(p: int) -> np.ndarray:
                return m_order[m_bounds[p] : m_bounds[p + 1]]

            def emit(rows_a: np.ndarray, rows_b: np.ndarray, j: float) -> None:
                ia_ids, ib_ids = g_ids[rows_a], g_ids[rows_b]
                swap = ia_ids > ib_ids
                ia_f = np.where(swap, ib_ids, ia_ids)
                ib_f = np.where(swap, ia_ids, ib_ids)
                keep = (ia_f < ib_f) & ~(
                    (g_ghost[rows_a] == 1) & (g_ghost[rows_b] == 1)
                )
                a_out.append(ia_f[keep])
                b_out.append(ib_f[keep])
                j_out.append(np.full(int(keep.sum()), j, dtype=np.float64))

            for t0 in range(0, d, tile):
                t1 = min(t0 + tile, d)
                inter = np.rint(X[t0:t1] @ X.T).astype(np.int64)  # (tile, d)
                union = lens[t0:t1, None] + lens[None, :] - inter
                with np.errstate(invalid="ignore", divide="ignore"):
                    sim = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
                pa_, pb_ = np.nonzero(sim >= threshold)
                for pi, qi in zip((pa_ + t0).tolist(), pb_.tolist()):
                    if pi > qi:
                        continue  # each unordered distinct pair once
                    j = float(sim[pi - t0, qi])
                    mp = members(pi)
                    if pi == qi:
                        if len(mp) < 2:
                            continue
                        ii, jj = np.triu_indices(len(mp), k=1)
                        emit(mp[ii], mp[jj], 1.0)
                    else:
                        mq = members(qi)
                        emit(
                            np.repeat(mp, len(mq)),
                            np.tile(mq, len(mp)),
                            j,
                        )
        if not a_out:
            return {
                "doc_a": np.empty(0, dtype=ids.dtype),
                "doc_b": np.empty(0, dtype=ids.dtype),
                "char_jaccard": np.empty(0, np.float64),
            }
        return {
            "doc_a": np.concatenate(a_out),
            "doc_b": np.concatenate(b_out),
            "char_jaccard": np.concatenate(j_out).astype(np.float64),
        }

    def dedup(group: dict) -> dict:
        a = np.asarray(group["doc_a"])
        b = np.asarray(group["doc_b"])
        order = np.lexsort((b, a))
        keep = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep[1:] = (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1])
        idx = order[keep]
        return {k: np.asarray(v)[idx] for k, v in group.items()}

    prepped = docs.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    pairs = sharded_group_map(prepped, ["blk", "bucket"], compare)
    # a home/ghost pair can coexist in two buckets only when sizes tie across
    # the boundary; a cheap distinct keeps the contract exact
    return sharded_group_map(pairs, ["doc_a", "doc_b"], dedup)


def minhash_lsh_clusters(docs: Dataset, cfg: DedupConfig) -> Dataset:
    """Full MinHash-LSH near-dup clustering over a documents table.

    Composition of the core pipeline stages on a (doc_id, text) shape —
    returns (doc_id, cluster_id) covering every input doc (singletons map to
    themselves).
    """
    import ray.data

    from ..stages.banding import band_postings_stage, lsh_pairs_stage
    from ..stages.cluster import cluster_stage
    from ..stages.signatures import SignatureKernel
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
        SignatureKernel(cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
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


def semantic_dedup(
    embeddings: Dataset,
    threshold: float = 0.9,
    cfg: DedupConfig | None = None,
    **pair_kwargs,
) -> Dataset:
    """SemDeDup-style semantic dedup over an embedding column.

    (vec_id, embedding) -> (vec_id, cluster_id, keep): edges are cosine >=
    ``threshold`` pairs (:func:`embedding_cosine_pairs` — exact broadcast
    brute force by default; pass ``approx=True`` through ``pair_kwargs`` for
    the hyperplane-LSH scale path above the broadcast bound), components
    come from the same distributed min-label propagation the flagship text
    pipeline uses (``stages.cluster.cluster_stage``), ``cluster_id`` is the
    component's min vec_id and ``keep`` marks the one survivor per cluster
    (the min id — deterministic; a quality-ranked variant would order by a
    score column instead).  Singletons keep themselves.  Reference analog:
    the global cosine refinement + BFS components of Stage 3
    (/root/reference/modules/deduplication.py:1219-1283).
    """
    from ..stages.cluster import cluster_stage

    cfg = cfg or DedupConfig()
    pairs = embedding_cosine_pairs(embeddings, threshold=threshold, **pair_kwargs)

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_a": pc.cast(t["vec_a"], pa.uint64()),
                "doc_b": pc.cast(t["vec_b"], pa.uint64()),
            }
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)

    def to_i64(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vec_id": pc.cast(t["doc_id"], pa.int64()),
                "min_cluster": pc.cast(t["cluster_id"], pa.int64()),
            }
        )

    clusters = cluster_stage(edges, cfg).map_batches(
        to_i64, batch_format="pyarrow", zero_copy_batch=True
    )
    j = embeddings.select_columns(["vec_id"]).join(
        clusters,
        join_type="left_outer",
        num_partitions=cfg.join_num_buckets,
        on=("vec_id",),
    )

    def fill(t: pa.Table) -> pa.Table:
        vid = t["vec_id"]
        if isinstance(vid, pa.ChunkedArray):
            vid = vid.combine_chunks()
        mc = t["min_cluster"]
        if isinstance(mc, pa.ChunkedArray):
            mc = mc.combine_chunks()
        cid = pc.coalesce(pc.cast(mc, pa.int64()), pc.cast(vid, pa.int64()))
        return pa.table(
            {
                "vec_id": pc.cast(vid, pa.int64()),
                "cluster_id": cid,
                "keep": pc.cast(pc.equal(pc.cast(vid, pa.int64()), cid), pa.int32()),
            }
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
    embeddings: Dataset,
    threshold: float = 0.9,
    concurrency: int = 4,
    batch_size: int = 1024,
    broadcast_max_rows: int = 100_000,
    approx: bool = False,
    n_tables: int = 4,
) -> Dataset:
    """(vec_id, embedding list<float>) -> pairs with cosine >= t.

    Two physical plans, selected EXPLICITLY (never silently):

    - ``approx=False`` (default): **exact brute force** — the contract the
      SQL oracle checks.  The input executes ONCE (``materialize()``; the row
      count, the broadcast assembly and the scan all feed from the pinned
      handle), the normalized matrix goes to the object store once via
      ``ray.put`` and every actor reads it in ``__init__``; each batch does
      one float64 matmul.  If the table exceeds ``broadcast_max_rows`` this
      RAISES with guidance instead of silently degrading to an approximate
      plan — callers relying on exactness (the driver oracle,
      :func:`semantic_dedup` defaults) must opt into approximation.
      Reference analog: the dense cosine similarity matrix of Stage 3
      (/root/reference/modules/deduplication.py:1219-1283).
    - ``approx=True``: the **scale path** — the driver never materializes
      the table; rows are bucketed by ``n_tables`` random-hyperplane LSH
      sketches (``extras.similarity.hyperplane_cosine_pairs``) and compared
      within buckets.  Recall < 1 by construction (raised by ``n_tables`` —
      see ``similarity.lsh_params_for_recall``); precision is exact (every
      emitted pair's cosine is computed).
    """
    import ray as _ray

    if approx:
        from .similarity import hyperplane_cosine_pairs

        return hyperplane_cosine_pairs(embeddings, threshold=threshold, n_tables=n_tables)

    # pin the (possibly lazy) upstream ONCE: count, broadcast assembly and
    # the scan below all read the same materialized blocks — no re-execution
    mat = embeddings.materialize()
    n = mat.count()
    if n > broadcast_max_rows:
        raise ValueError(
            f"embedding_cosine_pairs: {n} rows exceed broadcast_max_rows="
            f"{broadcast_max_rows} for the exact brute-force plan; pass "
            "approx=True for the hyperplane-LSH scale path (approximate "
            "recall, exact precision), or raise broadcast_max_rows if the "
            "normalized matrix fits every worker's heap"
        )
    tbl = pa.concat_tables(_ray.get(mat.to_arrow_refs())).combine_chunks()
    ids, matrix = embeddings_to_matrix(tbl)
    ref = _ray.put((ids, _l2_normalize(matrix)))
    return mat.map_batches(
        _CosinePairActor,
        fn_constructor_args=(ref, threshold),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def _explode_segments(t: pa.Table, W: int) -> pa.Table:
    """(doc_id, text) batch -> (doc_id, pidx, seg, seg_hash) segment rows.

    Shared segmenter for :func:`segment_dedup` and
    :func:`remove_frequent_segments`: normalized text splits into fixed
    ``W``-token windows.  Zero-copy-shaped — token boundaries come from one
    vectorized space-scan over the batch's flat UTF-8 buffer and segment
    strings are built with a single byte-gather (no per-doc Python).  Empty
    docs contribute one ``''`` segment (matches SQL ``string_split('', ' ')``).
    """
    from ..functions.hashing import _ranges, hash_tokens
    from ..functions.text import flat_utf8_view

    norm = normalize_array(t["text"])
    arr = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
    offs, data = flat_utf8_view(arr)
    ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
    doc_start, doc_end = offs[:-1], offs[1:]
    nonempty = doc_end > doc_start
    sp = np.nonzero(data == 32)[0]
    # tokens per nonempty doc = spaces inside it + 1 (normalized text has
    # single spaces, no leading/trailing)
    n_sp = np.searchsorted(sp, doc_end) - np.searchsorted(sp, doc_start)
    n_tok = np.where(nonempty, n_sp + 1, 0)
    # flat token boundary arrays (global byte positions), doc-major
    tok_starts = np.sort(np.concatenate([doc_start[nonempty], sp + 1]))
    tok_ends = np.sort(np.concatenate([sp, doc_end[nonempty]]))
    tok_base = np.concatenate([[0], np.cumsum(n_tok)])[:-1]
    n_seg = (n_tok + W - 1) // W  # 0 for empty docs (handled below)
    seg_doc = np.repeat(np.arange(len(ids), dtype=np.int64), n_seg)
    pidx = _ranges(n_seg[n_seg > 0]) if n_seg.sum() else np.zeros(0, np.int64)
    a = tok_base[seg_doc] + pidx * W
    last = np.minimum(a + W, (tok_base + n_tok)[seg_doc]) - 1
    sbyte = tok_starts[a] if len(a) else np.zeros(0, np.int64)
    ebyte = tok_ends[last] if len(a) else np.zeros(0, np.int64)
    lens = ebyte - sbyte
    gather = (
        np.repeat(sbyte, lens) + _ranges(lens) if lens.sum() else np.zeros(0, np.int64)
    )
    buf = data[gather]
    seg_offsets = np.zeros(len(lens) + 1, dtype=np.int32)
    if len(lens):
        seg_offsets[1:] = np.cumsum(lens).astype(np.int32)
    seg_arr = pa.Array.from_buffers(
        pa.utf8(),
        len(lens),
        [None, pa.py_buffer(seg_offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )
    out_ids = ids[seg_doc]
    out_pidx = pidx
    # empty docs contribute one '' segment (matches SQL string_split('',' '))
    empty_idx = np.nonzero(~nonempty)[0]
    if len(empty_idx):
        seg_arr = pa.concat_arrays([seg_arr, pa.array([""] * len(empty_idx), pa.utf8())])
        out_ids = np.concatenate([out_ids, ids[empty_idx]])
        out_pidx = np.concatenate([out_pidx, np.zeros(len(empty_idx), np.int64)])
    segs_np = np.asarray(seg_arr.to_numpy(zero_copy_only=False), dtype=object)
    h = splitmix64(hash_tokens(segs_np))
    return pa.table(
        {
            "doc_id": pa.array(out_ids),
            "pidx": pa.array(out_pidx, pa.int64()),
            "seg": seg_arr,
            "seg_hash": pa.array(h, pa.uint64()),
        }
    )


def segment_dedup(docs: Dataset, seg_tokens: int = 10, num_shards: int = 64) -> Dataset:
    """Sub-document (CCNet-style line/paragraph) dedup with first-wins removal.

    Each doc's normalized text splits into fixed ``seg_tokens``-token segments
    (the pluggable segmenter — real corpora would split on newline/sentence
    boundaries; the synthetic testdata has none, so fixed windows demonstrate
    the class); the globally FIRST occurrence of each distinct segment string
    (ordered by doc_id, then position) survives, every later occurrence is
    removed, and docs are reassembled from their surviving segments.  Output:
    (doc_id, clean_text, n_segs, n_removed).  Reference analog: the
    hash-grouping first-wins pass (deduplication.py:240-283) at sub-document
    granularity.

    Segment EXTRACTION is zero-copy-shaped (see :func:`_explode_segments`).
    Two exchanges: first-wins on the segment hash, reassembly on doc_id; both
    ship (doc_id, pidx, segment) rows once.  Reassembly does one ``" ".join``
    per doc — inherent string assembly (output-size-bounded), same shape as
    the inverted-index posting join.
    """
    from ..util import sharded_group_map

    W = seg_tokens

    def explode(t: pa.Table) -> pa.Table:
        return _explode_segments(t, W)

    def first_wins(g: pd.DataFrame) -> pd.DataFrame:
        segs = g["seg"].to_numpy()
        doc = g["doc_id"].to_numpy()
        pidx = g["pidx"].to_numpy()
        order = np.lexsort((pidx, doc, segs))
        segs_s = segs[order]
        new = np.ones(len(segs_s), dtype=bool)
        new[1:] = segs_s[1:] != segs_s[:-1]
        keep = np.zeros(len(segs_s), dtype=np.int8)
        keep[new] = 1  # run head = global first occurrence of this segment
        out = g.iloc[order].reset_index(drop=True)
        out["keep"] = keep
        return out.drop(columns="seg_hash")

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        doc = g["doc_id"].to_numpy()
        pidx = g["pidx"].to_numpy()
        segs = g["seg"].to_numpy()
        keep = g["keep"].to_numpy()
        order = np.lexsort((pidx, doc))
        doc, pidx, segs, keep = doc[order], pidx[order], segs[order], keep[order]
        new = np.ones(len(doc), dtype=bool)
        new[1:] = doc[1:] != doc[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(doc))
        rows = []
        for s, e in zip(starts, ends):
            kept = segs[s:e][keep[s:e] == 1]
            rows.append((doc[s], " ".join(kept), int(e - s), int(e - s - len(kept))))
        return pd.DataFrame(rows, columns=["doc_id", "clean_text", "n_segs", "n_removed"])

    # pin at both exchange boundaries (round-5 A/B, VERDICT task 8): the
    # segment-hash groupby and the doc-keyed rebuild groupby fused into one
    # lazy DAG thrash each other — 7.8 s lazy vs 4.5 s pinned at 300k docs
    # / 4 cpus (tools/measure_shard_formats.py), same exchange-pin finding
    # as the flagship pipeline and exactsubstr._scrub_sharded
    exploded = docs.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    tagged = sharded_group_map(
        exploded, ["seg_hash"], first_wins, num_shards=num_shards, batch_format="pandas"
    ).materialize()
    return sharded_group_map(
        tagged, ["doc_id"], rebuild, num_shards=num_shards, batch_format="pandas"
    )


def subtract_corpus(
    new: Dataset,
    base: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    bloom_bits_per_key: int = 12,
    bloom_hashes: int = 8,
    bloom_max_bits: int = 1 << 33,
    bloom_min_base: int = 100_000,
    broadcast_max_drops: int = 5_000_000,
    num_shards: int = 64,
    batch_size: int = 1024,
) -> Dataset:
    """Anti-join dedup across snapshots: keep ``new`` rows whose ``text_col``
    is byte-identical to NO row of ``base``.

    The incremental-onboarding primitive (dedup the fresh crawl against the
    corpus you already trained on).  Exact result; the document text never
    enters an exchange while the drop set fits the broadcast bound (above
    ``broadcast_max_drops`` the fallback marker attach reshuffles the new
    rows — text included — ONCE; raise the bound for a pure-broadcast plan,
    it is an 8 B/drop cluster-scale object, not driver-heap-bounded state):

    1. both sides key by the 128-bit MD5 of the raw text (24 B/row; the
       ``exact_rep_stage`` contract — mis-grouping odds < 1e-15 at 10^12
       docs, stages/exact.py:12-15);
    2. when ``base`` holds >= ``bloom_min_base`` keys, a distributed-built
       Bloom filter of the BASE keys prunes the new side MAP-SIDE before the
       exchange: a key the filter rejects is PROVABLY absent from base, so
       the row survives without shipping — false positives only ship extra
       24 B rows to the exact check, never change the result;
    3. ONE tagged-union sharded exchange over the 128-bit keys emits the
       doc_ids of CONFIRMED cross-corpus duplicates (usually the small side);
    4. the drop set filters ``new`` map-side (broadcast sorted array up to
       ``broadcast_max_drops``, hash-sharded marker attach above it — the
       exact_rep_stage size-gated two-plan contract).

    Reference analog: the already-processed membership filter M4
    (/root/reference/modules/blob_manager.py processed-set skip), lifted from
    within-run bookkeeping to corpus-vs-corpus semantics.
    """
    import ray as _ray

    from ..functions.bloom import BloomFilter, build_bloom_distributed
    from ..functions.hashing import md5_128
    from ..util import filter_out_ids, sharded_group_map

    def add_keys(t: pa.Table) -> pa.Table:
        lo, hi = md5_128(t[text_col].to_pylist())
        return pa.table(
            {
                "doc_id": pc.cast(t[id_col], pa.uint64()),
                "h_lo": pa.array(lo, pa.uint64()),
                "h_hi": pa.array(hi, pa.uint64()),
            }
        )

    # consumed by (optionally) the Bloom build AND the exchange: pin once.
    # new_keys is consumed exactly once in every plan — no pin needed.
    base_keys = base.map_batches(
        add_keys, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).materialize()
    new_keys = new.map_batches(
        add_keys, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    n_base = base_keys.count()

    def mix(t: pa.Table) -> np.ndarray:
        lo = np.asarray(t["h_lo"].to_numpy(zero_copy_only=False), dtype=U64)
        hi = np.asarray(t["h_hi"].to_numpy(zero_copy_only=False), dtype=U64)
        return splitmix64(lo ^ hi)

    suspicious = new_keys
    if n_base >= bloom_min_base:
        m_bits = BloomFilter.size_bits(n_base, bloom_bits_per_key, bloom_max_bits)
        bloom = build_bloom_distributed(base_keys, mix, m_bits, bloom_hashes)
        bref = _ray.put(bloom)

        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pa.array(_ray.get(bref).contains(mix(t))))

        suspicious = new_keys.map_batches(
            prune, batch_format="pyarrow", zero_copy_batch=True
        )

    def tag(val: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "tag", pa.array(np.full(len(t), val, np.int8), pa.int8())
            )

        return fn

    unioned = base_keys.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        suspicious.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def confirm(group: dict) -> dict:
        lo = np.asarray(group["h_lo"], dtype=U64)
        hi = np.asarray(group["h_hi"], dtype=U64)
        tg = np.asarray(group["tag"], dtype=np.int8)
        did = np.asarray(group["doc_id"], dtype=U64)
        order = np.lexsort((tg, hi, lo))
        lo, hi, tg, did = lo[order], hi[order], tg[order], did[order]
        n = len(lo)
        if n == 0:
            return {"doc_id": np.zeros(0, U64)}
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        seg = np.cumsum(new_seg) - 1
        # tag sorts last inside a key group, so the group has a base row
        # iff its FIRST row is tag 0
        has_base = tg[np.nonzero(new_seg)[0]] == 0
        drop = (tg == 1) & has_base[seg]
        return {"doc_id": did[drop]}

    drops = sharded_group_map(
        unioned, ["h_lo", "h_hi"], confirm, num_shards=num_shards
    )
    return filter_out_ids(
        new, drops, id_col=id_col, drops_col="doc_id",
        broadcast_max_drops=broadcast_max_drops, num_shards=num_shards,
        batch_size=batch_size,
    )


def remove_frequent_segments(
    docs: Dataset,
    max_docs: int,
    seg_tokens: int = 10,
    num_shards: int = 64,
    frequent_max_rows: int = 5_000_000,
    batch_size: int = 1024,
) -> Dataset:
    """Boilerplate removal: drop every segment that occurs in MORE THAN
    ``max_docs`` distinct documents, keeping all other occurrences.

    The frequency-based sibling of :func:`segment_dedup` (RefinedWeb /
    Dolma-style "frequent line removal": nav bars, cookie banners and footers
    repeat across thousands of pages; prose does not).  Segmentation is the
    shared :func:`_explode_segments` contract (normalized text, fixed
    ``seg_tokens``-token windows — real corpora would segment on newlines).
    Output: (doc_id, clean_text, n_segs, n_removed), one row per input doc.

    Scale shape — cheaper than segment_dedup's two full exchanges because
    frequency removal needs only the GLOBAL frequent set, not a first-wins
    winner per occurrence:

    1. count pass: per batch, segments dedupe to per-batch-distinct strings
       (one ``np.unique``; MD5 runs once per distinct string), distinct
       (doc, segment) incidences reduce to partial counts, and ONE sharded
       exchange of 24 B (md5-128, count) rows sums them exactly — document
       text never shuffles, and per-batch combining bounds the exchange at
       distinct-segments-per-batch rows;
    2. the frequent set (total > max_docs) is by construction <=
       total_occurrences / max_docs rows; it is size-gated by
       ``frequent_max_rows`` (explicit raise — 16 B/entry, 80 MB at the
       default bound) and broadcast ONCE via ``ray.put``;
    3. scrub pass: embarrassingly parallel — re-explode, test membership
       against the sorted broadcast set (:func:`member128`, exact on both
       md5 halves), rebuild each doc in-batch.  ZERO exchanges; docs are
       whole within their batch so no reassembly shuffle is needed.

    Reference analog: the hash-grouping dedup pass
    (/root/reference/modules/deduplication.py:240-283) inverted from
    keep-first to drop-frequent at sub-document granularity.
    """
    import ray as _ray

    from ..functions.hashing import md5_128, member128
    from ..util import sharded_group_map

    if max_docs < 1:
        raise ValueError("remove_frequent_segments: max_docs must be >= 1")
    W = seg_tokens

    def _seg_arrays(t: pa.Table):
        ex = _explode_segments(t, W)
        segs = np.asarray(ex["seg"].to_numpy(zero_copy_only=False), dtype=object)
        doc = np.asarray(ex["doc_id"].to_numpy(zero_copy_only=False))
        pidx = np.asarray(ex["pidx"].to_numpy(zero_copy_only=False))
        return segs, doc, pidx

    def partial(t: pa.Table) -> pa.Table:
        segs, doc, _ = _seg_arrays(t)
        if len(segs) == 0:
            return pa.table(
                {
                    "h_lo": pa.array([], pa.uint64()),
                    "h_hi": pa.array([], pa.uint64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uniq, inv = np.unique(segs, return_inverse=True)
        # distinct (doc, segment) incidences; docs are whole within a batch,
        # so summing these partials across batches = exact distinct-doc count
        _, d_inv = np.unique(doc, return_inverse=True)
        codes = np.unique(d_inv.astype(np.int64) * np.int64(len(uniq)) + inv)
        n_per = np.bincount(codes % len(uniq), minlength=len(uniq)).astype(np.int64)
        lo, hi = md5_128(uniq)
        return pa.table(
            {
                "h_lo": pa.array(lo, pa.uint64()),
                "h_hi": pa.array(hi, pa.uint64()),
                "n": pa.array(n_per, pa.int64()),
            }
        )

    def total(g: dict) -> dict:
        lo = np.asarray(g["h_lo"], dtype=U64)
        hi = np.asarray(g["h_hi"], dtype=U64)
        n = np.asarray(g["n"], dtype=np.int64)
        if len(lo) == 0:
            return {"h_lo": lo, "h_hi": hi}
        order = np.lexsort((hi, lo))
        lo, hi, n = lo[order], hi[order], n[order]
        new = np.ones(len(lo), dtype=bool)
        new[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        starts = np.nonzero(new)[0]
        totals = np.add.reduceat(n, starts)
        keep = totals > max_docs
        return {"h_lo": lo[starts][keep], "h_hi": hi[starts][keep]}

    # docs feeds the count pass AND the scrub pass: pin once (the
    # materialize-once contract — no double execution of a lazy upstream)
    mat = docs.materialize()
    counts = mat.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    freq = sharded_group_map(
        counts, ["h_lo", "h_hi"], total, num_shards=num_shards
    ).materialize()
    n_freq = freq.count()
    if n_freq > frequent_max_rows:
        raise ValueError(
            f"remove_frequent_segments: {n_freq} frequent segments exceed "
            f"frequent_max_rows={frequent_max_rows}; raise the bound (the "
            "broadcast is 16 B/entry, cluster-scale not driver-bounded) or "
            "raise max_docs"
        )
    if n_freq:
        parts = [
            (
                np.asarray(t["h_lo"].to_numpy(zero_copy_only=False), dtype=U64),
                np.asarray(t["h_hi"].to_numpy(zero_copy_only=False), dtype=U64),
            )
            for t in _ray.get(freq.to_arrow_refs())
            if t.num_rows
        ]
        flo = np.concatenate([p[0] for p in parts])
        fhi = np.concatenate([p[1] for p in parts])
        order = np.lexsort((fhi, flo))
        flo, fhi = flo[order], fhi[order]
    else:
        flo = np.zeros(0, U64)
        fhi = np.zeros(0, U64)
    fref = _ray.put((flo, fhi))

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "clean_text": pa.array([], pa.utf8()),
            "n_segs": pa.array([], pa.int64()),
            "n_removed": pa.array([], pa.int64()),
        }
    )

    def scrub(t: pa.Table) -> pa.Table:
        segs, doc, pidx = _seg_arrays(t)
        if len(segs) == 0:
            return empty
        uniq, inv = np.unique(segs, return_inverse=True)
        lo, hi = md5_128(uniq)
        slo, shi = _ray.get(fref)
        drop = member128(slo, shi, lo, hi)[inv]
        order = np.lexsort((pidx, doc))
        doc, segs, drop = doc[order], segs[order], drop[order]
        new = np.ones(len(doc), dtype=bool)
        new[1:] = doc[1:] != doc[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(doc))
        n_removed = np.add.reduceat(drop.astype(np.int64), starts)
        texts = [
            " ".join(segs[s:e][~drop[s:e]]) for s, e in zip(starts, ends)
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc[starts]),
                "clean_text": pa.array(texts, pa.utf8()),
                "n_segs": pa.array((ends - starts).astype(np.int64), pa.int64()),
                "n_removed": pa.array(n_removed, pa.int64()),
            }
        )

    return mat.map_batches(
        scrub, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def intradoc_dedup(docs: Dataset, seg_tokens: int = 10, batch_size: int = 1024) -> Dataset:
    """WITHIN-document segment dedup: drop repeats of a segment inside the
    same doc, keeping its first occurrence (C4's within-page repeated-span
    removal; the intra-doc sibling of :func:`segment_dedup`'s corpus-wide
    first-wins).

    Output: (doc_id, clean_text, n_segs, n_removed) — identical schema to
    :func:`segment_dedup`.  Scale shape: every decision is local to one doc,
    so this is ONE stateless scan — no exchange at all (the cheapest dedup
    stage in the repertoire; contrast the corpus-wide variant's two).
    Segment extraction shares :func:`_explode_segments` (vectorized byte
    gather); within-block first-wins uses an exact string factorize (never
    the hash column, so collisions cannot merge distinct segments).
    """

    def fn(t: pa.Table) -> pa.Table:
        ex = _explode_segments(t, seg_tokens)
        doc = np.asarray(ex["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pidx = np.asarray(ex["pidx"].to_numpy(zero_copy_only=False), dtype=np.int64)
        segs = np.asarray(ex["seg"].to_pylist(), dtype=object)
        code = pd.factorize(segs, sort=False)[0]  # exact string identity
        order = np.lexsort((pidx, code, doc))
        d_s, c_s = doc[order], code[order]
        first = np.ones(len(d_s), dtype=bool)
        first[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        keep = np.empty(len(d_s), dtype=bool)
        keep[order] = first  # back to (doc, pidx) stream order

        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        rows_doc, rows_clean, rows_n, rows_rm = [], [], [], []
        # per-doc reassembly: output-size-bounded string joins, the
        # segment_dedup rebuild shape (doc-major order by construction)
        bounds = np.nonzero(np.concatenate(([True], doc[1:] != doc[:-1])))[0]
        ends = np.append(bounds[1:], len(doc))
        by_doc = {doc[s]: (s, e) for s, e in zip(bounds, ends)}
        for did in ids:
            s, e = by_doc[did]
            kept = segs[s:e][keep[s:e]]
            rows_doc.append(did)
            rows_clean.append(" ".join(kept))
            rows_n.append(int(e - s))
            rows_rm.append(int(e - s - len(kept)))
        return pa.table(
            {
                "doc_id": pa.array(rows_doc, pa.int64()),
                "clean_text": pa.array(rows_clean, pa.string()),
                "n_segs": pa.array(rows_n, pa.int64()),
                "n_removed": pa.array(rows_rm, pa.int64()),
            }
        )

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

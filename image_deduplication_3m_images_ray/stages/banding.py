"""LSH banding: profile -> band postings -> candidate pairs, with hot-band salting.

Reference analog: the central wavelet-LSH grouping —
``group_by_wavelet`` builds ``Dict[band_key, List[path]]`` then unions
within-bucket pairs (/root/reference/modules/deduplication.py:270-346).  The
reference *silently truncates* hot buckets (skip >1000 members, cap 50k pairs —
:305-316,321-338); here hot buckets are **salted** instead: members are split
into deterministic sub-chunks, pairs are emitted within each chunk, and chunk
leaders are connected recursively, so connectivity (and therefore union-find
recall) is preserved through transitivity with O(cap·n) instead of O(n²) pairs
(SURVEY.md §2.7 O4, §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import band_hashes_batch
from ..util import segment_bounds, sharded_group_map
from .verify import ORIGIN_LSH


def _band_rows(batch: pa.Table, bands: int) -> pa.Table:
    n = len(batch)
    if n == 0:
        return pa.table(
            {"band_key": pa.array([], pa.uint64()), "doc_id": pa.array([], pa.uint64())}
        )
    mh = batch["minhash"]
    if isinstance(mh, pa.ChunkedArray):
        mh = mh.combine_chunks()
    flat = np.asarray(mh.flatten().to_numpy(zero_copy_only=False), dtype=np.uint64)
    num_perms = len(flat) // n
    sigs = flat.reshape(n, num_perms)
    bh = band_hashes_batch(sigs, bands, num_perms // bands)  # (n, bands), band id mixed in
    doc_ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    return pa.table(
        {
            "band_key": pa.array(bh.reshape(-1), pa.uint64()),
            "doc_id": pa.array(np.repeat(doc_ids, bands), pa.uint64()),
        }
    )


def band_postings_stage(profile: Dataset, cfg: DedupConfig) -> Dataset:
    """profile -> band_postings(band_key, doc_id): ``bands`` rows per doc."""
    return profile.select_columns(["doc_id", "minhash"]).map_batches(
        _band_rows,
        fn_args=(cfg.bands,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )


def emit_capped_pairs(
    ids: np.ndarray, cap: int, salt: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """All-pairs for buckets <= cap; salted chunk + recursive leader pairs above.

    Deterministic in (multiset of ids, salt).  Connectivity guarantee: the
    graph of emitted pairs over ``ids`` is connected (chunks are internally
    complete and leaders are connected recursively), so if every emitted pair
    verifies, the bucket still collapses to ONE cluster — the
    planted-giant-cluster test (FIXTURES.md §2) pins this.

    ``salt`` controls the (pseudo-random, id-magnitude-independent) chunk
    assignment.  It is deliberately CONSTANT across bands: a hot bucket that
    recurs in many bands (a true near-dup cluster) then emits the SAME pair
    set each time, which the downstream distinct collapses — salting per band
    would multiply distinct pairs by the band count.  Mixed hot buckets in
    different bands have different membership, so their chunk splits differ
    anyway.  (The reference instead silently dropped hot buckets,
    /root/reference/modules/deduplication.py:305-316.)
    """
    from ..functions.hashing import splitmix64

    ids = np.unique(ids)
    n = len(ids)
    if n < 2:
        e = np.empty(0, dtype=np.uint64)
        return e, e.copy()
    if n <= cap:
        ia, ib = np.triu_indices(n, k=1)
        return ids[ia], ids[ib]
    order = np.argsort(splitmix64(ids ^ np.uint64(salt)), kind="stable")
    ids_s = ids[order]
    n_chunks = -(-n // cap)
    a_parts, b_parts = [], []
    for c in range(n_chunks):
        chunk = ids_s[c * cap : (c + 1) * cap]
        ia, ib = np.triu_indices(len(chunk), k=1)
        a_parts.append(np.minimum(chunk[ia], chunk[ib]))
        b_parts.append(np.maximum(chunk[ia], chunk[ib]))
    leaders = np.sort(ids_s[np.arange(n_chunks) * cap])
    la, lb = emit_capped_pairs(leaders, cap, salt)
    a_parts.append(la)
    b_parts.append(lb)
    return np.concatenate(a_parts), np.concatenate(b_parts)


def _emit_shard_pairs(group: dict, cap: int, salt: int = 0) -> dict:
    """Vectorized pair emission for ALL buckets in one shard.

    lexsort by (doc_id, band_key) -> segment boundaries -> only buckets with
    >= 2 members enter the (short) Python loop; singleton buckets — the vast
    majority — are skipped wholesale.
    """
    key = np.asarray(group["band_key"], dtype=np.uint64)
    doc = np.asarray(group["doc_id"], dtype=np.uint64)
    order = np.lexsort((doc, key))
    key, doc = key[order], doc[order]
    bounds = segment_bounds(key)
    counts = np.diff(bounds)
    multi = np.nonzero(counts >= 2)[0]
    a_parts, b_parts = [], []
    for m in multi:
        a, b = emit_capped_pairs(doc[bounds[m] : bounds[m + 1]], cap, salt)
        if len(a):
            a_parts.append(a)
            b_parts.append(b)
    a = np.concatenate(a_parts) if a_parts else np.empty(0, dtype=np.uint64)
    b = np.concatenate(b_parts) if b_parts else np.empty(0, dtype=np.uint64)
    n = len(a)
    return {
        "doc_a": a,
        "doc_b": b,
        "origin": np.full(n, ORIGIN_LSH, dtype=np.int8),
        "pos_a": np.full(n, -1, dtype=np.int64),
        "pos_b": np.full(n, -1, dtype=np.int64),
    }


def dedup_pairs(pairs: Dataset, num_shards: int = 64, extra_cols: dict | None = None) -> Dataset:
    """Distinct on (doc_a, doc_b), fully vectorized per shard."""

    def fn(group: dict) -> dict:
        a = np.asarray(group["doc_a"], dtype=np.uint64)
        b = np.asarray(group["doc_b"], dtype=np.uint64)
        order = np.lexsort((b, a))
        keep_sorted = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            keep_sorted[1:] = (a[order][1:] != a[order][:-1]) | (b[order][1:] != b[order][:-1])
        idx = order[keep_sorted]
        return {k: np.asarray(v)[idx] for k, v in group.items()}

    return sharded_group_map(pairs, ["doc_a", "doc_b"], fn, num_shards=num_shards)


def lsh_pairs_stage(postings: Dataset, cfg: DedupConfig, dedup: bool = True) -> Dataset:
    """band_postings -> candidate_pairs(doc_a<doc_b, origin=ORIGIN_LSH).

    ``dedup=True`` adds a shard-grouped distinct on (doc_a, doc_b) — a true
    near-dup pair typically co-occurs in many of the 32 bands.  The flagship
    pipeline passes ``dedup=False`` because the verify stage's consolidate
    exchange dedups the combined lsh+winnow stream anyway; standalone use
    keeps the distinct.
    """
    pairs = sharded_group_map(
        postings,
        ["band_key"],
        lambda g: _emit_shard_pairs(g, cfg.bucket_pair_cap, cfg.salt_seed),
        num_shards=cfg.group_shards,
    )
    return dedup_pairs(pairs, num_shards=cfg.group_shards) if dedup else pairs

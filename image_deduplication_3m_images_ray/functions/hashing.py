"""Deterministic 64-bit hashing kernels: token hashes, shingles, MinHash, SimHash,
LSH band keys, and char-level winnowing fingerprints.

All arithmetic is numpy ``uint64`` with intentional mod-2^64 wraparound (the
splitmix64 finalizer is designed for it), so every kernel is fully vectorized and
reproducible across processes/machines — no reliance on ``PYTHONHASHSEED``.

Role mapping vs the reference:
- MinHash-128 plays the role of the reference's global embedding
  (/root/reference/modules/feature_extraction.py:206-237 — EfficientNet 2560-d);
- SimHash-64 plays the role of the wavelet perceptual hash
  (/root/reference/modules/feature_extraction.py:278-315);
- winnowing fingerprints play the role of local keypoint descriptors
  (/root/reference/modules/feature_extraction.py:239-276), re-expressed for exact
  substring duplicate detection per the north rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

U64 = np.uint64

_SM_C1 = U64(0x9E3779B97F4A7C15)
_SM_C2 = U64(0xBF58476D1CE4E5B9)
_SM_C3 = U64(0x94D049BB133111EB)
_POLY_P = U64(0x100000001B3)  # FNV-ish odd multiplier for polynomial combines
_EMPTY_DOC_SHINGLE = U64(0xE3A7C15D00000001)  # sentinel shingle for docs w/o tokens


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixer, Steele et al.)."""
    z = (np.asarray(x, dtype=U64) + _SM_C1).astype(U64, copy=False)
    z = (z ^ (z >> U64(30))) * _SM_C2
    z = (z ^ (z >> U64(27))) * _SM_C3
    return z ^ (z >> U64(31))


def hash_tokens(tokens: np.ndarray) -> np.ndarray:
    """Flat object array of token strings -> uint64 hashes.

    Uses pandas' vectorized, deterministically-keyed string hash (siphash with the
    library's fixed default key) — stable across processes, C-speed.
    """
    if len(tokens) == 0:
        return np.empty(0, dtype=U64)
    return pd.util.hash_array(np.asarray(tokens, dtype=object), categorize=True).astype(U64)


def hash_tokens_arrow(flat) -> np.ndarray:
    """:func:`hash_tokens` over an Arrow string array, bit-identical values.

    ``dictionary_encode`` (C-level) replaces the object materialization +
    pandas factorize: only the DISTINCT tokens ever become Python strings,
    then the per-token hashes gather through the dictionary indices.
    Measured 8.0 s -> 1.1 s on a 56M-token bench block (the win scales with
    the duplication factor; an all-distinct array degrades to roughly the
    object path plus the encode).
    """
    import pyarrow as pa

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return np.empty(0, dtype=U64)
    enc = flat.dictionary_encode()
    dvals = enc.dictionary.to_numpy(zero_copy_only=False)
    dh = pd.util.hash_array(np.asarray(dvals, dtype=object), categorize=False).astype(U64)
    idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    return dh[idx]


def shingle_hashes_flat(
    token_hashes: np.ndarray, doc_offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compute k-token shingle hashes for a whole batch of docs at once.

    ``token_hashes``: concatenation of all docs' token hashes.
    ``doc_offsets``: int64 array of length n_docs+1; doc i's tokens are
    ``token_hashes[doc_offsets[i]:doc_offsets[i+1]]``.

    Returns ``(shingles, shingle_offsets)`` in the same flat layout.  A doc with
    fewer than k tokens gets exactly one shingle: the polynomial hash of all of
    its tokens (empty doc -> the sentinel shingle), so exact copies of short docs
    still collide.
    """
    n = len(token_hashes)
    doc_offsets = np.asarray(doc_offsets, dtype=np.int64)
    n_docs = len(doc_offsets) - 1
    lengths = np.diff(doc_offsets)

    # Global rolling polynomial combine over the flat array: windows that cross a
    # doc boundary are masked out afterwards.
    if n >= k:
        acc = token_hashes[: n - k + 1].astype(U64).copy()
        for j in range(1, k):
            acc = acc * _POLY_P + token_hashes[j : n - k + 1 + j]
        full = splitmix64(acc)
    else:
        full = np.empty(0, dtype=U64)

    out_counts = np.where(lengths >= k, lengths - k + 1, 1).astype(np.int64)
    shingle_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(out_counts, out=shingle_offsets[1:])
    shingles = np.empty(shingle_offsets[-1], dtype=U64)

    long_mask = lengths >= k
    if long_mask.any():
        # valid window starts for long docs, gathered from the global rolling array
        starts = doc_offsets[:-1][long_mask]
        counts = out_counts[long_mask]
        idx = np.repeat(starts, counts) + _ranges(counts)
        dst = np.repeat(shingle_offsets[:-1][long_mask], counts) + _ranges(counts)
        shingles[dst] = full[idx]

    short_idx = np.nonzero(~long_mask)[0]
    for i in short_idx:  # rare path: docs shorter than k tokens get one shingle
        toks = token_hashes[doc_offsets[i] : doc_offsets[i + 1]].astype(U64)
        if len(toks) == 0:
            h = _EMPTY_DOC_SHINGLE
        else:
            acc = U64(0xCBF29CE484222325)
            for t in toks:
                acc = U64((int(acc) * int(_POLY_P) + int(t)) & 0xFFFFFFFFFFFFFFFF)
            h = splitmix64(np.array([acc], dtype=U64))[0]
        shingles[shingle_offsets[i]] = h
    return shingles, shingle_offsets


def _ranges(counts: np.ndarray) -> np.ndarray:
    """[3,2] -> [0,1,2,0,1] (vectorized per-group arange)."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    starts = np.cumsum(counts)[:-1]
    out[starts] = 1 - counts[:-1]
    return np.cumsum(out)


def minhash_seeds(num_perms: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation xor seeds."""
    base = splitmix64(np.arange(num_perms, dtype=U64) + U64(seed) * U64(0x9E3779B9))
    return base.astype(U64)


def minhash_signature(shingles: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """MinHash over a doc's (possibly non-unique) shingle multiset.

    h_i(x) = (x ^ seed_i) * ODD_C mod 2^64 — a bijection of the key space per
    seed (odd multiplier), so taking the min is a valid permutation-MinHash.
    One xor + one multiply per lane (the input shingle hashes are already
    splitmix-finalized, so no further avalanche is needed); the estimator
    quality is pinned by test_minhash_estimates_jaccard.
    """
    uniq = np.unique(np.asarray(shingles, dtype=U64))
    if len(uniq) == 0:
        uniq = np.array([_EMPTY_DOC_SHINGLE], dtype=U64)
    mixed = (uniq[:, None] ^ seeds[None, :]) * _SM_C2
    return mixed.min(axis=0)


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash over the unique shingle hashes (bit-majority vote)."""
    uniq = np.unique(np.asarray(shingles, dtype=U64))
    if len(uniq) == 0:
        return int(_EMPTY_DOC_SHINGLE)
    bits = (uniq[:, None] >> np.arange(64, dtype=U64)[None, :]) & U64(1)
    votes = bits.sum(axis=0, dtype=np.int64)
    majority = (votes * 2 >= len(uniq)).astype(U64)
    return int((majority << np.arange(64, dtype=U64)).sum(dtype=U64))


def band_hashes(signature: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """Split a signature into bands and hash each band's rows -> uint64[bands]."""
    sig = np.asarray(signature, dtype=U64).reshape(bands, rows_per_band)
    acc = sig[:, 0].copy()
    for j in range(1, rows_per_band):
        acc = acc * _POLY_P + sig[:, j]
    # mix in the band id so identical row values in different bands don't collide
    return splitmix64(acc ^ (np.arange(bands, dtype=U64) * _SM_C1))


def band_hashes_batch(signatures: np.ndarray, bands: int, rows_per_band: int) -> np.ndarray:
    """(n_docs, num_perms) -> (n_docs, bands) band hashes, fully vectorized."""
    sigs = np.asarray(signatures, dtype=U64).reshape(len(signatures), bands, rows_per_band)
    acc = sigs[:, :, 0].copy()
    for j in range(1, rows_per_band):
        acc = acc * _POLY_P + sigs[:, :, j]
    return splitmix64(acc ^ (np.arange(bands, dtype=U64)[None, :] * _SM_C1))


def hamming64(a: int | np.ndarray, b: int | np.ndarray) -> np.ndarray:
    """Popcount of XOR for uint64 scalars/arrays (vectorized, no Python loop)."""
    x = np.bitwise_xor(np.asarray(a, dtype=U64), np.asarray(b, dtype=U64))
    x = x.view(np.uint8).reshape(-1, 8) if x.ndim else x.reshape(1).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)


def unique_per_doc(shingles: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Flat shingle layout -> (sorted-unique flat shingles, new offsets), vectorized.

    Every doc segment must be non-empty (``shingle_hashes_flat`` guarantees this
    via the empty-doc sentinel shingle).
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n_docs = len(offsets) - 1
    # doc segments are already contiguous, so sort each segment IN PLACE
    # instead of a global lexsort by (doc, shingle): measured 0.25 s vs
    # 6.2 s for the lexsort on a 17M-shingle block (the signature kernel's
    # dominant cost before round 5) — 50k tiny introsorts beat one stable
    # two-key mergesort by ~25x
    s = shingles.copy()
    for i in range(n_docs):
        s[offsets[i] : offsets[i + 1]].sort()
    first = np.ones(len(s), dtype=bool)
    if len(s) > 1:
        first[1:] = s[1:] != s[:-1]
    first[offsets[:-1]] = True  # segment heads (every doc is non-empty)
    uniq = s[first]
    uniq_counts = (
        np.add.reduceat(first.astype(np.int64), offsets[:-1])
        if n_docs
        else np.zeros(0, np.int64)
    )
    uniq_offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(uniq_counts, out=uniq_offsets[1:])
    return uniq, uniq_offsets


def minhash_simhash_batch(
    shingles: np.ndarray,
    offsets: np.ndarray,
    seeds: np.ndarray,
    chunk_shingles: int = 1 << 15,
    return_uniques: bool = False,
):
    """Whole-batch MinHash + SimHash via segmented reductions — no per-doc Python loop.

    Returns ``(signatures (n_docs, num_perms) uint64, simhash (n_docs,) uint64,
    n_unique_shingles (n_docs,) int64)`` — plus ``(uniq_flat, uniq_offsets)``
    (the sorted-unique shingle sets, flat layout) when ``return_uniques``.
    Semantics identical to calling :func:`minhash_signature` /
    :func:`simhash64` per doc (asserted in tests).

    Cache-blocked: the per-seed mix runs in-place over an L2-resident
    ``chunk_shingles`` window (measured ~10x faster than materializing the
    (shingles x num_perms) matrix, which streams num_perms*8 bytes of
    temporaries through DRAM per shingle).  Chunks cut across doc boundaries;
    partial per-doc minima/votes merge into the output arrays.
    """
    uniq, uoff = unique_per_doc(np.asarray(shingles, dtype=U64), offsets)
    n_docs = len(uoff) - 1
    num_perms = len(seeds)
    n = len(uniq)
    sigs = np.full((n_docs, num_perms), np.iinfo(np.uint64).max, dtype=U64)
    votes = np.zeros((n_docs, 64), dtype=np.int32)
    n_unique = np.diff(uoff)

    tmp = np.empty(chunk_shingles, dtype=U64)
    lo = 0
    while lo < n:
        hi = min(n, lo + chunk_shingles)
        seg = uniq[lo:hi]
        t = tmp[: hi - lo]
        # docs overlapping [lo, hi): j0 starts at/before lo, j1 first at/after hi
        j0 = int(np.searchsorted(uoff, lo, side="right")) - 1
        j1 = int(np.searchsorted(uoff, hi, side="left"))
        starts_local = np.maximum(uoff[j0:j1] - lo, 0).astype(np.int64)
        for i in range(num_perms):
            # bijective xor + odd-multiply per seed (same formula as
            # minhash_signature — asserted equal in tests)
            np.bitwise_xor(seg, seeds[i], out=t)
            np.multiply(t, _SM_C2, out=t)
            part = np.minimum.reduceat(t, starts_local)
            np.minimum(sigs[j0:j1, i], part, out=sigs[j0:j1, i])
        bits = np.unpackbits(seg.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        votes[j0:j1] += np.add.reduceat(bits.astype(np.int32), starts_local, axis=0)
        lo = hi

    majority = (votes * 2 >= n_unique[:, None]).astype(U64)
    simhashes = (majority << np.arange(64, dtype=U64)[None, :]).sum(axis=1, dtype=U64)
    if return_uniques:
        return sigs, simhashes, n_unique, uniq, uoff
    return sigs, simhashes, n_unique


# ---------------------------------------------------------------------------
# Winnowing fingerprints (char-level) — the exact-substring candidate generator
# ---------------------------------------------------------------------------

_ROLL_B = U64(0x100000001B5)  # odd base for the char-level rolling hash


def _char_kgram_hashes(data, k: int) -> np.ndarray:
    """Rolling polynomial hash of every k-symbol window of ``data`` (uint64 mod 2^64).

    ``data`` is either UTF-8 ``bytes`` (symbol = byte) or an integer ndarray
    (symbol = element — e.g. a uint32 codepoint array for character-unit
    windows).  H(i) = sum_{j<k} data[i+j] * B^(k-1-j); computed via prefix
    sums weighted by inverse powers of the (odd, hence invertible mod 2^64)
    base.
    """
    if isinstance(data, np.ndarray):
        b = data.astype(U64)
    else:
        b = np.frombuffer(data, dtype=np.uint8).astype(U64)
    n = len(b)
    if n < k:
        return np.empty(0, dtype=U64)
    # powers[i] = B^(n-1-i); prefix[i] = sum_{j<i} b[j] * B^(n-1-j)
    powers = _pow_series(n)
    weighted = b * powers
    prefix = np.zeros(n + 1, dtype=U64)
    np.cumsum(weighted, out=prefix[1:])  # wraps mod 2^64 — exact under wraparound
    window_sums = prefix[k:] - prefix[:-k]  # = B^(n-1-(i+k-1)) * H(i) * 1 ... scaled
    # descale: multiply by inverse of B^(n-k-i) => H(i) = window_sums[i] * invpow[n-k-i]
    invpows = _invpow_series(n - k + 1)
    return splitmix64(window_sums * invpows[::-1])


_POW_ASC: np.ndarray | None = None  # [B^0, B^1, ...] — grown geometrically, shared


def _pow_table(n: int) -> np.ndarray:
    """Ascending power table [B^0 .. B^(size-1)], cached across calls.

    The per-doc cumprod was ~18% of the winnow kernel; the table is
    append-only per process (Ray workers are single-threaded per task slot)
    and both series helpers slice read-only views of it."""
    global _POW_ASC
    if _POW_ASC is None or len(_POW_ASC) < n:
        size = max(n, 1 << 16, 0 if _POW_ASC is None else 2 * len(_POW_ASC))
        t = np.empty(size, dtype=U64)
        t[0] = U64(1)
        t[1:] = _ROLL_B
        np.cumprod(t, out=t)  # wraps mod 2^64
        _POW_ASC = t
    return _POW_ASC


def _pow_series(n: int) -> np.ndarray:
    """[B^(n-1), B^(n-2), ..., B^0] mod 2^64 — read-only view of the table."""
    return _pow_table(n)[:n][::-1]


_INV_ROLL_B = None


def _modinv_pow2(a: int) -> int:
    """Inverse of odd ``a`` mod 2^64 (Newton iteration)."""
    x = a & 0xFFFFFFFFFFFFFFFF
    inv = 1
    for _ in range(6):
        inv = (inv * (2 - a * inv)) & 0xFFFFFFFFFFFFFFFF
    return inv


_INV_ASC: np.ndarray | None = None  # [Binv^0, Binv^1, ...] — cached like _POW_ASC


def _invpow_series(n: int) -> np.ndarray:
    """[Binv^0, Binv^1, ..., Binv^(n-1)] mod 2^64 — read-only view of a cache."""
    global _INV_ROLL_B, _INV_ASC
    if _INV_ROLL_B is None:
        _INV_ROLL_B = U64(_modinv_pow2(int(_ROLL_B)))
    if _INV_ASC is None or len(_INV_ASC) < n:
        size = max(n, 1 << 16, 0 if _INV_ASC is None else 2 * len(_INV_ASC))
        t = np.empty(size, dtype=U64)
        t[0] = U64(1)
        t[1:] = _INV_ROLL_B
        np.cumprod(t, out=t)
        _INV_ASC = t
    return _INV_ASC[:n]


def sliding_min(hashes: np.ndarray, w: int) -> np.ndarray:
    """min over every length-``w`` window — O(n) two-pass block min (van
    Herk / Gil-Werman): per-``w`` block prefix and suffix running minima,
    window [j, j+w-1] = min(suffix_min[j], prefix_min[j+w-1]).  Replaced the
    O(n log w) sparse-table doubling (~7 full passes at w=101) with 2
    accumulate passes + 1 minimum — measured 2x on the fingerprint stage's
    dominant kernel."""
    n = len(hashes)
    nw = n - w + 1
    nblocks = -(-n // w)
    pad = nblocks * w - n
    if pad:
        a = np.empty(nblocks * w, dtype=hashes.dtype)
        a[:n] = hashes
        a[n:] = np.iinfo(hashes.dtype).max if hashes.dtype.kind == "u" else hashes.max()
    else:
        a = hashes
    blocks = a.reshape(nblocks, w)
    pre = np.minimum.accumulate(blocks, axis=1).reshape(-1)
    suf = np.minimum.accumulate(blocks[:, ::-1], axis=1)[:, ::-1].reshape(-1)
    # j and j+w-1 fall in the same block only when j is a block start, where
    # both spans equal the full window; otherwise suf[j] covers [j, block_end]
    # and pre[j+w-1] covers [next_block_start, j+w-1] — exactly the window.
    return np.minimum(suf[:nw], pre[w - 1 : w - 1 + nw])


def winnow_fingerprints(text: str, k: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing (Schleimer et al., SIGMOD'03): the min k-gram hash per window
    of ``w`` consecutive k-grams, over the UTF-8 BYTES of ``text``.

    Returns (fingerprint_hashes, byte_positions) of the selected k-grams.
    Guarantee: two texts sharing a common substring of >= k + w - 1 BYTES
    share at least one fingerprint HASH (64-bit hashes are unique within a
    doc w.h.p., so the selected value pins a position; a value repeated
    inside one doc keeps its first position — the shared-hash guarantee is
    unaffected, only the seed position can then point at a different copy).
    Byte windows are recall-safe for the engine's >= L CHARACTER contract:
    an L-char substring spans >= L bytes, so with k + w - 1 <= L every
    qualifying pair still shares a fingerprint; the verify stage measures
    match length in complete codepoints, restoring character-unit precision.
    """
    return winnow_fingerprints_bytes(text.encode("utf-8"), k, w)


def winnow_fingerprints_bytes(data, k: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """:func:`winnow_fingerprints` over raw UTF-8 ``bytes`` / uint8 ndarray.

    The batch caller feeds zero-copy slices of the Arrow string buffer
    (``flat_utf8_view``) so no per-doc str decode/encode happens.  First
    positions of the selected values come from a searchsorted membership probe
    against the ~2/(w+1)-density selected set instead of a stable argsort of
    the full hash stream (the argsort was ~40% of the kernel's time).
    """
    hashes = _char_kgram_hashes(data, k)
    m = len(hashes)
    if m == 0:
        return np.empty(0, dtype=U64), np.empty(0, dtype=np.int64)
    if m <= w:
        pos = int(np.flatnonzero(hashes == hashes.min())[0])
        return hashes[pos : pos + 1].copy(), np.array([pos], dtype=np.int64)
    wm = sliding_min(hashes, w)
    # winnowing mins form long runs (density 2/(w+1)); dedup consecutive runs
    # first so np.unique sorts ~2*density*m run heads instead of m-w+1 values
    heads = np.ones(len(wm), dtype=bool)
    heads[1:] = wm[1:] != wm[:-1]
    sel_vals = np.unique(wm[heads])
    # first position of each selected value: probe the sorted selected set
    idx = np.searchsorted(sel_vals, hashes)
    idx[idx == len(sel_vals)] = 0
    cand = np.nonzero(sel_vals[idx] == hashes)[0]  # every occurrence of a selected value
    ch = hashes[cand]
    o = np.argsort(ch, kind="stable")  # small: ~density * m entries
    ch, cand = ch[o], cand[o]
    first = np.ones(len(ch), dtype=bool)
    first[1:] = ch[1:] != ch[:-1]
    sel, pos = ch[first], cand[first]
    oo = np.argsort(pos, kind="stable")
    return sel[oo], pos[oo].astype(np.int64)


def md5_u64(values) -> np.ndarray:
    """DuckDB-anchored 64-bit content hash: little-endian bytes [8:16) of MD5.

    Equals DuckDB's ``md5_number_lower(s)`` for the same string/bytes, which
    makes any operator built on it expressible as an ANSI-SQL oracle (the
    driver's DuckDB correctness gate).  MD5 per value costs ~1 us — orders of
    magnitude slower than the vectorized splitmix64 family used by the
    flagship pipeline, so this hash is reserved for the standalone
    sketch/fingerprint operators where oracle parity matters more than
    per-byte throughput; a production deployment would swap in the fast hash
    and drop the SQL anchor.
    """
    import hashlib

    out = np.empty(len(values), dtype=U64)
    for i, v in enumerate(values):
        if v is None:
            v = b""
        elif isinstance(v, str):
            v = v.encode("utf-8")
        out[i] = int.from_bytes(hashlib.md5(v).digest()[8:16], "little")
    return out


def oph_minhash_simhash_batch(
    shingles: np.ndarray,
    offsets: np.ndarray,
    num_perms: int,
    seed: int,
):
    """One-permutation MinHash + SimHash over a batch — O(n_shingles) total.

    One-permutation hashing (Li, Owen & Zhang, NIPS'12): ONE bijective mix of
    every shingle hash; the top log2(num_perms) bits pick the signature slot,
    the min mixed value per (doc, slot) is the signature entry.  Empty slots
    (short docs) are filled by rotation densification (Shrivastava & Li,
    ICML'14): borrow the nearest filled slot to the left, circularly — keeps
    the collision probability of any slot pair ~J with a deterministic fill.
    Replaces the k-independent-permutation kernel (128 passes over every
    shingle) with a single pass: ~100x less compute/bandwidth for the same
    LSH banding behavior, which is what makes the signature stage scale.

    SimHash runs over the raw shingle stream (multiset bit-majority) in
    L2-resident chunks.  Returns ``(signatures (n_docs, num_perms) uint64,
    simhash (n_docs,) uint64, n_shingles (n_docs,) int64)`` where
    ``n_shingles`` counts the raw (with-multiplicity) shingles — used only as
    a length-ratio gate downstream, where multiplicity is irrelevant.
    """
    x = np.asarray(shingles, dtype=U64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n_docs = len(offsets) - 1
    lengths = np.diff(offsets)
    if num_perms & (num_perms - 1):
        raise ValueError("num_perms must be a power of two for OPH slotting")
    shift = U64(64 - num_perms.bit_length() + 1)

    # seed-dependent bijection of the key space (xor + odd multiply)
    seed_mix = splitmix64(np.array([seed], dtype=U64))[0]
    mixed = (x ^ seed_mix) * _SM_C2

    slot = (mixed >> shift).astype(np.int64)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
    flat = doc_idx * num_perms + slot
    sigs_flat = np.full(n_docs * num_perms, np.iinfo(np.uint64).max, dtype=U64)
    np.minimum.at(sigs_flat, flat, mixed)
    sigs = sigs_flat.reshape(n_docs, num_perms)

    # rotation densification, only for rows that have empty slots
    MAX = np.iinfo(np.uint64).max
    empty_rows = np.nonzero((sigs == MAX).any(axis=1) & (lengths > 0))[0]
    if len(empty_rows):
        sub = sigs[empty_rows]
        step = 1
        while step < num_perms:
            holes = sub == MAX
            if not holes.any():
                break
            donor = np.roll(sub, step, axis=1)
            take = holes & (donor != MAX)
            sub[take] = donor[take]
            step <<= 1
        sigs[empty_rows] = sub

    # SWAR bit-majority SimHash over the raw shingle stream: 8 shift+and+
    # reduceat passes with 8 bit-positions counted per uint64 byte lane —
    # ~40x cheaper than unpacking a (n_shingles, 64) bit matrix.  Docs are
    # split into <=255-shingle subsegments so byte-lane counts cannot carry;
    # exact-match asserted against the naive unpackbits vote in tests.
    votes = np.zeros((n_docs, 64), dtype=np.int64)
    if len(x):
        n_sub = (lengths + 254) // 255
        sub_doc = np.repeat(np.arange(n_docs), n_sub)
        intra = np.arange(len(sub_doc), dtype=np.int64) - np.repeat(
            np.cumsum(n_sub) - n_sub, n_sub
        )
        sub_starts = offsets[:-1][sub_doc] + intra * 255
        lane = U64(0x0101010101010101)
        for b in range(8):
            lanes = np.add.reduceat((x >> U64(b)) & lane, sub_starts)
            lane_bytes = lanes.view(np.uint8).reshape(-1, 8).astype(np.int64)
            acc = np.zeros((n_docs, 8), dtype=np.int64)
            np.add.at(acc, sub_doc, lane_bytes)
            votes[:, b::8] = acc
    majority = (votes * 2 >= np.maximum(lengths, 1)[:, None]).astype(U64)
    simhashes = (majority << np.arange(64, dtype=U64)[None, :]).sum(axis=1, dtype=U64)
    return sigs, simhashes, lengths.astype(np.int64)


def md5_128(values) -> tuple[np.ndarray, np.ndarray]:
    """128-bit MD5 content hash as two uint64 columns (lo = bytes [8:16) ==
    :func:`md5_u64` == DuckDB ``md5_number_lower``; hi = bytes [0:8) ==
    ``md5_number_upper``).

    Used as the exact-duplicate identity key: treating md5-128 equality as
    byte equality mis-groups two documents with probability < 1e-15 even at
    10^12 docs (birthday bound), while shrinking the exact-dedup exchange
    from full text (~KBs/row) to 24 bytes/row.
    """
    import hashlib

    lo = np.empty(len(values), dtype=U64)
    hi = np.empty(len(values), dtype=U64)
    for i, v in enumerate(values):
        if v is None:
            v = b""
        elif isinstance(v, str):
            v = v.encode("utf-8")
        d = hashlib.md5(v).digest()
        lo[i] = int.from_bytes(d[8:16], "little")
        hi[i] = int.from_bytes(d[0:8], "little")
    return lo, hi


def md5_128_view(offsets: np.ndarray, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """:func:`md5_128` over a zero-copy flat-UTF-8 view (``text.flat_utf8_view``).

    Hashes ``data[offsets[i]:offsets[i+1]]`` per row through a memoryview —
    no Python-string materialization and no re-encode, so the only per-row
    costs are the hashlib call and the digest unpack.  Bit-identical to
    ``md5_128(texts)`` for the same strings (MD5 of the same UTF-8 bytes);
    null rows don't exist in a flat view (callers fill nulls upstream).
    """
    import hashlib

    n = len(offsets) - 1
    lo = np.empty(n, dtype=U64)
    hi = np.empty(n, dtype=U64)
    mv = memoryview(data)
    for i in range(n):
        d = hashlib.md5(mv[offsets[i] : offsets[i + 1]]).digest()
        lo[i] = int.from_bytes(d[8:16], "little")
        hi[i] = int.from_bytes(d[0:8], "little")
    return lo, hi


def member128(flo: np.ndarray, fhi: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Exact membership of 128-bit keys (lo, hi) in a set (flo, fhi).

    ``(flo, fhi)`` must be lexsorted by (lo, hi) — ``np.lexsort((fhi, flo))``
    order.  Vectorized double-searchsorted on the lo half; the (vanishingly
    rare) duplicate-lo runs fall back to a per-row scan of the run.  Both
    halves are compared, so the test is exact over md5-128 keys — no
    64-bit-collision false positives.
    """
    m = np.zeros(len(lo), dtype=bool)
    if len(flo) == 0 or len(lo) == 0:
        return m
    left = np.searchsorted(flo, lo, "left")
    right = np.searchsorted(flo, lo, "right")
    single = right - left == 1
    m[single] = fhi[left[single]] == hi[single]
    for i in np.nonzero(right - left > 1)[0]:
        m[i] = hi[i] in fhi[left[i] : right[i]]
    return m

"""Unit tests for the pure hashing/shingling kernels (no Ray needed)."""

import numpy as np
import pyarrow as pa
import pytest

from image_deduplication_3m_images_ray.config import DedupConfig
from image_deduplication_3m_images_ray.functions.hashing import (
    U64,
    band_hashes,
    band_hashes_batch,
    hamming64,
    minhash_seeds,
    minhash_signature,
    minhash_simhash_batch,
    shingle_hashes_flat,
    simhash64,
    splitmix64,
    unique_per_doc,
    winnow_fingerprints,
)
from image_deduplication_3m_images_ray.functions.text import (
    exact_jaccard,
    normalize_text,
    pairwise_jaccard_batch,
    shingle_batch,
    shingle_set,
    tokenize_batch,
)

CFG = DedupConfig()
RNG = np.random.default_rng(7)


def _naive_shingles(tokens, k):
    """Reference implementation: polynomial hash over each window, then splitmix."""
    hashes = list(
        np.asarray(
            __import__("pandas").util.hash_array(np.asarray(tokens, dtype=object), categorize=True)
        ).astype(U64)
    )
    P = U64(0x100000001B3)
    out = []
    if len(tokens) >= k:
        for i in range(len(tokens) - k + 1):
            acc = hashes[i]
            for j in range(1, k):
                acc = U64((int(acc) * int(P) + int(hashes[i + j])) & 0xFFFFFFFFFFFFFFFF)
            out.append(int(splitmix64(np.array([acc], dtype=U64))[0]))
    return out


def test_shingle_flat_matches_naive():
    docs = [["a", "b", "c", "d", "e", "f", "g"], ["x", "y", "z", "w", "v", "u"]]
    import pandas as pd

    flat_tokens = np.asarray([t for d in docs for t in d], dtype=object)
    th = pd.util.hash_array(flat_tokens, categorize=True).astype(U64)
    offsets = np.array([0, 7, 13], dtype=np.int64)
    sh, off = shingle_hashes_flat(th, offsets, 5)
    assert list(off) == [0, 3, 5]
    assert [int(v) for v in sh[0:3]] == _naive_shingles(docs[0], 5)
    assert [int(v) for v in sh[3:5]] == _naive_shingles(docs[1], 5)


def test_shingle_short_and_empty_docs():
    arr = pa.array(["a b", "", "one two three four five six"], pa.string())
    sh, off = shingle_batch(arr, 5)
    # short doc -> 1 shingle, empty doc -> 1 sentinel shingle, 6 tokens -> 2 shingles
    assert list(np.diff(off)) == [1, 1, 2]
    # identical short docs collide
    sh2, _ = shingle_batch(pa.array(["a b"], pa.string()), 5)
    assert sh[0] == sh2[0]


def test_unique_per_doc():
    sh = np.array([5, 3, 5, 9, 1, 1, 1], dtype=U64)
    off = np.array([0, 4, 7], dtype=np.int64)
    u, uo = unique_per_doc(sh, off)
    assert list(uo) == [0, 3, 4]
    assert list(u[:3]) == [3, 5, 9]
    assert list(u[3:]) == [1]


def test_minhash_simhash_batch_matches_scalar():
    seeds = minhash_seeds(CFG.num_perms, CFG.seed)
    docs = [RNG.integers(0, 2**63, size=int(RNG.integers(1, 400))).astype(U64) for _ in range(20)]
    flat = np.concatenate(docs)
    off = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=off[1:])
    sigs, sims, nuniq = minhash_simhash_batch(flat, off, seeds, chunk_shingles=257)
    for i, d in enumerate(docs):
        assert np.array_equal(sigs[i], minhash_signature(d, seeds))
        assert int(sims[i]) == simhash64(d)
        assert nuniq[i] == len(np.unique(d))


def test_minhash_estimates_jaccard():
    seeds = minhash_seeds(256, 1)
    a = np.arange(1000, dtype=U64) * U64(2654435761)
    b = np.arange(300, 1300, dtype=U64) * U64(2654435761)  # true J = 700/1300
    sa = minhash_signature(a, seeds)
    sb = minhash_signature(b, seeds)
    est = (sa == sb).mean()
    assert abs(est - 700 / 1300) < 0.08


def test_band_hashes_batch_matches_single():
    seeds = minhash_seeds(CFG.num_perms, CFG.seed)
    sig = minhash_signature(RNG.integers(0, 2**63, 500).astype(U64), seeds)
    single = band_hashes(sig, CFG.bands, CFG.rows_per_band)
    batch = band_hashes_batch(sig[None, :], CFG.bands, CFG.rows_per_band)
    assert np.array_equal(single, batch[0])


def test_identical_docs_share_all_bands():
    seeds = minhash_seeds(CFG.num_perms, CFG.seed)
    sh = RNG.integers(0, 2**63, 200).astype(U64)
    s1 = minhash_signature(sh, seeds)
    s2 = minhash_signature(sh.copy(), seeds)
    assert np.array_equal(
        band_hashes(s1, CFG.bands, CFG.rows_per_band), band_hashes(s2, CFG.bands, CFG.rows_per_band)
    )


def test_hamming64():
    assert hamming64(U64(0), U64(0))[0] == 0
    assert hamming64(U64(0xFFFFFFFFFFFFFFFF), U64(0))[0] == 64
    a = np.array([0b1010, 0b1111], dtype=U64)
    b = np.array([0b0101, 0b1111], dtype=U64)
    assert list(hamming64(a, b)) == [4, 0]


def test_simhash_near_duplicates_close():
    sh = RNG.integers(0, 2**63, 500).astype(U64)
    sh2 = sh.copy()
    sh2[:25] = RNG.integers(0, 2**63, 25).astype(U64)  # 5% replaced
    d = hamming64(U64(simhash64(sh)), U64(simhash64(sh2)))[0]
    assert d <= CFG.simhash_hamming_max


def test_pairwise_jaccard_batch_matches_scalar():
    texts_a = ["the quick brown fox jumps over the lazy dog again and again", "aa bb cc", ""]
    texts_b = ["the quick brown fox leaps over the lazy dog again and again", "aa bb cc", ""]
    got = pairwise_jaccard_batch(pa.array(texts_a), pa.array(texts_b), 5)
    for i in range(len(texts_a)):
        want = exact_jaccard(shingle_set(texts_a[i], 5), shingle_set(texts_b[i], 5))
        assert got[i] == pytest.approx(want)


def test_normalize():
    assert normalize_text("  Héllo\t\nWORLD  ") == "héllo world"
    assert normalize_text("") == ""


def test_tokenize_batch_empty_doc():
    arr = pa.array(["a b c", ""], pa.string())
    h, off = tokenize_batch(arr)
    assert list(np.diff(off)) == [3, 0]


def test_winnow_guarantee():
    """Two texts sharing >= k+w-1 chars share a fingerprint; extension recovers it."""
    from image_deduplication_3m_images_ray.stages.verify import extend_match

    rng = np.random.default_rng(3)
    alphabet = list("abcdefghijklmnopqrstuvwxyz ")
    shared = "".join(rng.choice(alphabet, 250))
    t1 = "".join(rng.choice(alphabet, 300)) + shared + "".join(rng.choice(alphabet, 100))
    t2 = "".join(rng.choice(alphabet, 50)) + shared
    f1, p1 = winnow_fingerprints(t1, CFG.winnow_kgram, CFG.winnow_window)
    f2, p2 = winnow_fingerprints(t2, CFG.winnow_kgram, CFG.winnow_window)
    common = np.intersect1d(f1, f2)
    assert len(common) > 0
    # seed-extend at a shared fingerprint recovers >= the shared length
    h = common[0]
    i1 = int(p1[np.nonzero(f1 == h)[0][0]])
    i2 = int(p2[np.nonzero(f2 == h)[0][0]])
    ln = extend_match(t1.encode(), t2.encode(), i1, i2, CFG.winnow_kgram)
    assert ln >= 250


def test_winnow_no_false_short_overlap():
    rng = np.random.default_rng(4)
    alphabet = list("abcdefghijklmnopqrstuvwxyz ")
    t1 = "".join(rng.choice(alphabet, 400))
    t2 = "".join(rng.choice(alphabet, 400))
    f1, _ = winnow_fingerprints(t1, CFG.winnow_kgram, CFG.winnow_window)
    f2, _ = winnow_fingerprints(t2, CFG.winnow_kgram, CFG.winnow_window)
    assert len(np.intersect1d(f1, f2)) == 0


def test_splitmix_deterministic_and_dispersive():
    x = splitmix64(np.arange(1000, dtype=U64))
    y = splitmix64(np.arange(1000, dtype=U64))
    assert np.array_equal(x, y)
    assert len(np.unique(x)) == 1000


def test_oph_minhash_batch_invariance_and_estimation():
    """OPH signatures: per-doc results independent of batching; identical
    shingle sets give identical signatures; slot-equality estimates Jaccard."""
    from image_deduplication_3m_images_ray.functions.hashing import (
        oph_minhash_simhash_batch,
    )

    rng = np.random.default_rng(7)
    pool = rng.integers(1, 2**63, 4000).astype(U64)
    a = pool[:2000]
    b = np.concatenate([pool[:1400], pool[2000:2600]])  # J = 1400/2600 ~ 0.538
    docs = [a, b, a.copy()]
    flat = np.concatenate(docs)
    off = np.concatenate([[0], np.cumsum([len(d) for d in docs])]).astype(np.int64)
    sigs, simh, nsh = oph_minhash_simhash_batch(flat, off, 128, 42)
    assert np.array_equal(sigs[0], sigs[2])  # identical multiset, identical sig
    assert simh[0] == simh[2]
    assert nsh.tolist() == [2000, 2000, 2000]
    # batching invariance: each doc alone produces the same signature row
    for i, d in enumerate(docs):
        s1, h1, _ = oph_minhash_simhash_batch(
            d, np.array([0, len(d)], dtype=np.int64), 128, 42
        )
        assert np.array_equal(s1[0], sigs[i])
        assert h1[0] == simh[i]
    est = (sigs[0] == sigs[1]).mean()
    true_j = 1400 / 2600
    assert abs(est - true_j) < 0.12  # 128-slot estimator tolerance

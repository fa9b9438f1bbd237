"""Property-based tests (hypothesis) for the deterministic kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from image_deduplication_3m_images_ray.config import DedupConfig
from image_deduplication_3m_images_ray.functions.hashing import (
    U64,
    minhash_seeds,
    minhash_signature,
    sliding_min,
    winnow_fingerprints,
)
from image_deduplication_3m_images_ray.functions.text import (
    exact_jaccard,
    normalize_text,
    shingle_set,
)

CFG = DedupConfig()
words = st.text(alphabet="abcdefghij", min_size=1, max_size=6)
docs = st.lists(words, min_size=0, max_size=120).map(" ".join)


@settings(max_examples=50, deadline=None)
@given(docs)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@settings(max_examples=50, deadline=None)
@given(docs)
def test_jaccard_self_is_one(s):
    sh = shingle_set(s, CFG.shingle_k)
    assert exact_jaccard(sh, sh) == 1.0


@settings(max_examples=50, deadline=None)
@given(docs, docs)
def test_jaccard_symmetric_and_bounded(a, b):
    sa, sb = shingle_set(a, CFG.shingle_k), shingle_set(b, CFG.shingle_k)
    j1, j2 = exact_jaccard(sa, sb), exact_jaccard(sb, sa)
    assert j1 == j2
    assert 0.0 <= j1 <= 1.0


@settings(max_examples=30, deadline=None)
@given(docs)
def test_minhash_identical_docs_identical_sigs(s):
    seeds = minhash_seeds(32, 7)
    sh = shingle_set(s, CFG.shingle_k)
    assert np.array_equal(minhash_signature(sh, seeds), minhash_signature(sh.copy(), seeds))


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=50),
)
def test_sliding_min_matches_naive(vals, w):
    h = np.array(vals, dtype=U64)
    if len(h) < w:
        return
    got = sliding_min(h, w)
    naive = np.array([h[i : i + w].min() for i in range(len(h) - w + 1)], dtype=U64)
    assert np.array_equal(got, naive)


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="abcdef gh", min_size=0, max_size=600))
def test_winnow_positions_in_range(s):
    fps, pos = winnow_fingerprints(s, 20, 21)
    data = s.encode("utf-8")
    assert (pos >= 0).all()
    assert (pos <= max(len(data) - 20, 0)).all()
    assert len(fps) == len(pos)


@settings(max_examples=20, deadline=None)
@given(
    st.text(alphabet="abcdef gh", min_size=60, max_size=300),
    st.text(alphabet="rstuvw xy", min_size=0, max_size=100),
    st.text(alphabet="rstuvw xy", min_size=0, max_size=100),
)
def test_winnow_shared_substring_shares_fingerprint(shared, pre, post):
    """Embedding the same >= k+w-1 chunk in two different docs always yields a
    shared fingerprint hash (the winnowing guarantee, k=20 w=21 -> L=40)."""
    t1 = pre + shared + post
    t2 = shared
    f1, _ = winnow_fingerprints(t1, 20, 21)
    f2, _ = winnow_fingerprints(t2, 20, 21)
    if len(shared) >= 40:
        assert len(np.intersect1d(f1, f2)) > 0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_bpe_counts_match_regex(texts):
    """Byte-class run counting == the pretokenizer regex over codepoints,
    for arbitrary unicode including multi-byte boundaries."""
    import re

    import pyarrow as pa

    from image_deduplication_3m_images_ray.extras.textstats import bpe_counts
    from image_deduplication_3m_images_ray.functions.text import normalize_array

    arr = normalize_array(pa.array(texts, pa.string()))
    word, num, punct = bpe_counts(arr)
    for i, nt in enumerate(arr.to_pylist()):
        assert word[i] == len(re.findall(r"[a-z]+", nt)), repr(nt)
        assert num[i] == len(re.findall(r"[0-9]+", nt)), repr(nt)
        assert punct[i] == len(re.findall(r"[^a-z0-9 ]+", nt)), repr(nt)

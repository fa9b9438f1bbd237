"""BPE training — parity with the classic pure-Python algorithm (Sennrich
get_stats/merge loop), including overlapping l==r runs, tie-breaks,
partition invariance, early stop, and the encode kernel."""

import numpy as np
import pytest

import ray.data

from image_deduplication_3m_images_ray.extras.bpe import (
    bpe_encode_word,
    bpe_train,
    word_vocab,
)


def _ref_bpe(texts, n_merges, min_count=2):
    """Classic dict-based BPE: count all adjacent pairs (overlaps included),
    merge the most frequent greedily leftmost; ties -> smallest (left, right)."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, sym in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += vocab[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        if c < min_count:
            break
        merges.append((l, r, c))
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "aaaa aaa aa aaaa",  # l==r runs: overlap counting + greedy apply
    "the cat sat on the mat the cat",
    "banana bandana banana",
]


def _run(texts, n_merges, parts):
    ds = ray.data.from_items([{"text": t} for t in texts]).repartition(parts)
    out = bpe_train(ds, n_merges=n_merges, num_shards=8)
    return list(
        zip(out["left"].to_pylist(), out["right"].to_pylist(), out["count"].to_pylist())
    )


def test_bpe_train_matches_reference(ray_session):
    ref = _ref_bpe(TEXTS, 10)
    for parts in (1, 4):
        got = _run(TEXTS, 10, parts)
        assert got == ref, f"parts={parts}: {got} != {ref}"


def test_bpe_train_run_overlap_counting(ray_session):
    # "aaaa" x2 + "aaa" + "aa": (a,a) occurrences = 3*2 + 2 + 1
    texts = ["aaaa aaa aa aaaa"]
    ref = _ref_bpe(texts, 3)
    got = _run(texts, 3, 2)
    assert got == ref
    # first merge is (a,a) with overlap-inclusive count 2*3 + 2 + 1 = 9
    assert got[0] == ("a", "a", 9)


def test_bpe_train_early_stop_and_validation(ray_session):
    # all-distinct single chars: no pair reaches min_count=2 after the
    # available merges are exhausted
    got = _run(["ab"], 5, 1)
    ref = _ref_bpe(["ab"], 5)
    assert got == ref and len(got) < 5

    ds = ray.data.from_items([{"text": "x"}])
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(ds, n_merges=0)


def test_word_vocab_exact(ray_session):
    ds = ray.data.from_items(
        [{"text": "a b  a\tc"}, {"text": " b a "}]
    ).repartition(2)
    out = word_vocab(ds, num_shards=4).to_pandas().sort_values("word")
    assert dict(zip(out["word"], out["n"])) == {"a": 3, "b": 2, "c": 1}


def test_encode_word_applies_merges_in_order(ray_session):
    merges = [("a", "a"), ("aa", "a")]
    # (a,a): aaaaa -> [aa, aa, a]; (aa,a): leftmost match at index 1 -> [aa, aaa]
    assert bpe_encode_word("aaaaa", merges) == ["aa", "aaa"]
    assert bpe_encode_word("banana", [("a", "n"), ("b", "an")]) == [
        "ban",
        "an",
        "a",
    ]


def test_bpe_encode_counts(ray_session):
    from image_deduplication_3m_images_ray.extras.bpe import bpe_encode

    texts = ["low lower", "aaaa aa", ""]
    merges = [("l", "o"), ("lo", "w"), ("a", "a")]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(2)
    out = (
        bpe_encode(ds, merges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # low -> [low]; lower -> [low, e, r]; aaaa -> [aa, aa]; aa -> [aa]
    assert out["n_words"].tolist() == [2, 2, 0]
    assert out["n_tokens"].tolist() == [1 + 3, 2 + 1, 0]
    assert out["compression"].tolist() == [(3 + 5) / 4, (4 + 2) / 3, 0.0]


from hypothesis import given, settings
from hypothesis import strategies as st

# small alphabet forces heavy pair collisions, ties, and l==r runs
_word = st.text(alphabet="ab", min_size=1, max_size=6)
_corpus = st.lists(
    st.lists(_word, min_size=1, max_size=8).map(" ".join), min_size=1, max_size=6
)


@settings(max_examples=25, deadline=None)
@given(texts=_corpus, n_merges=st.integers(min_value=1, max_value=6))
def test_bpe_train_property_matches_reference(ray_session, texts, n_merges):
    ref = _ref_bpe(texts, n_merges)
    got = _run(texts, n_merges, 2)
    assert got == ref

"""BM25 retrieval: brute-force parity, block invariance, edge contracts."""

import math

import numpy as np
import pytest
import ray.data

from image_deduplication_3m_images_ray.extras.retrieval import bm25_topk

DOCS = [
    (0, "spark table spark join fast"),
    (1, "slow scan row row row"),
    (2, "spark vector"),
    (3, ""),
    (4, "vector vector vector spark dup"),
    (5, "the a of and"),
    (6, "dup"),
]


def _ref_bm25(docs, terms, k):
    """Pure-Python Okapi BM25 (k1=1.2, b=0.75) with the microbit pinning."""
    toks = {i: t.split(" ") for i, t in docs}
    n = len(docs)
    s = sum(len(v) for v in toks.values())
    terms = sorted(set(terms))
    df = {q: sum(1 for v in toks.values() if q in v) for q in terms}
    idf = {
        q: math.floor(math.log2((2.0 * (n - df[q]) + 1.0) / (2.0 * df[q] + 1.0)) * 1e6 + 0.5)
        for q in terms
    }
    out = []
    for i, v in toks.items():
        tf = {q: v.count(q) for q in terms}
        if sum(tf.values()) == 0:
            continue
        score = 0
        for q in terms:
            num = (22.0 * tf[q]) * s
            den = ((10.0 * tf[q]) * s + 3.0 * s) + (9.0 * len(v)) * n
            score += math.floor(idf[q] * (num / den) + 0.5)
        out.append((i, score))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def _ds(docs, blocks):
    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in docs]
    ).repartition(blocks)


@pytest.mark.parametrize("blocks", [1, 4])
def test_bm25_topk_matches_reference(ray_session, blocks):
    got = bm25_topk(_ds(DOCS, blocks), ["spark", "vector", "dup"], k=5).to_pandas()
    want = _ref_bm25(DOCS, ["spark", "vector", "dup"], 5)
    assert list(zip(got["doc_id"], got["score_micro"])) == want


def test_bm25_topk_duplicate_terms_collapse(ray_session):
    a = bm25_topk(_ds(DOCS, 2), ["spark", "spark"], k=7).to_pandas()
    b = bm25_topk(_ds(DOCS, 2), ["spark"], k=7).to_pandas()
    assert a.equals(b)
    # only docs containing the term are candidates
    assert set(a["doc_id"]) == {0, 2, 4}


def test_bm25_topk_common_term_negative_idf(ray_session):
    # 'row' appears in 1 of 7 docs but 3 times; 'the' in 1 doc. A term in
    # > half the docs goes NEGATIVE (Okapi convention) — build one: 'spark'
    # in 3/7 stays positive; verify against the reference either way.
    got = bm25_topk(_ds(DOCS, 3), ["row", "the"], k=10).to_pandas()
    want = _ref_bm25(DOCS, ["row", "the"], 10)
    assert list(zip(got["doc_id"], got["score_micro"])) == want


def test_bm25_topk_no_match_returns_empty(ray_session):
    got = bm25_topk(_ds(DOCS, 2), ["zzz_absent"], k=5).to_pandas()
    # (Ray's sort drops column metadata when every block is empty, so only
    # the row count is asserted — see the operator docstring.)
    assert len(got) == 0


def test_bm25_topk_validation(ray_session):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(_ds(DOCS, 1), [], k=5)
    with pytest.raises(ValueError, match="positive"):
        bm25_topk(_ds(DOCS, 1), ["spark"], k=0)

"""Tests for the curate_corpus composition and its two new building blocks
(gopher_filter, exact_dedup_keep_first_rows)."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    """Deterministic (doc_id, text, lang) table: a mix of clean long docs
    (some byte-exact duplicates), junk docs, and two languages."""
    rng = np.random.RandomState(7)
    words = [
        "the", "and", "with", "that", "have", "market", "village", "story",
        "window", "garden", "river", "music", "letter", "simple", "before",
    ]
    texts, langs = [], []
    for i in range(60):
        n = 40 + int(rng.randint(0, 30))
        texts.append(" ".join(words[int(j)] for j in rng.randint(0, len(words), n)))
        langs.append("en" if i % 3 else "de")
    # byte-exact duplicates of earlier clean docs
    for i in range(10):
        texts.append(texts[i])
        langs.append(langs[i])
    # junk: too short / symbol-heavy / no alpha words
    texts += ["tiny doc", "### ... ### ... ###", "111 222 333 444 555"]
    langs += ["en", "en", "de"]
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def test_gopher_filter_matches_quality_keep(ray_session):
    import ray.data

    from image_deduplication_3m_images_ray.extras.textstats import gopher_filter, gopher_quality

    t = _corpus()
    kw = dict(min_words=30, min_stopwords=1)
    kept = (
        gopher_filter(ray.data.from_arrow(t), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    q = gopher_quality(ray.data.from_arrow(t), **kw).to_pandas()
    want_ids = sorted(q.loc[q["keep"] == 1, "doc_id"])
    assert list(kept["doc_id"]) == want_ids
    # all input columns pass through untouched
    assert list(kept.columns) == ["doc_id", "text", "lang"]
    src = t.to_pandas().set_index("doc_id")
    assert (kept.set_index("doc_id")["text"] == src.loc[want_ids, "text"]).all()
    # the planted junk rows are dropped, the clean bulk survives
    assert set(range(70, 73)).isdisjoint(want_ids) and len(want_ids) >= 60


def test_exact_dedup_keep_first_rows(ray_session):
    import ray.data

    from image_deduplication_3m_images_ray.extras.dedup_ops import (
        exact_dedup_keep_first,
        exact_dedup_keep_first_rows,
    )

    t = _corpus()
    out = (
        exact_dedup_keep_first_rows(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # survivors = min doc_id per byte-exact text (matches the id-only form)
    ids_only = sorted(
        exact_dedup_keep_first(ray.data.from_arrow(t)).to_pandas()["doc_id"]
    )
    assert list(out["doc_id"]) == ids_only
    want = (
        t.to_pandas().groupby("text", sort=False)["doc_id"].min().sort_values()
    )
    assert list(out["doc_id"]) == sorted(want)
    # full rows: every input column, values intact
    assert list(out.columns) == ["doc_id", "text", "lang"]
    src = t.to_pandas().set_index("doc_id")
    assert (out.set_index("doc_id")["lang"] == src.loc[out["doc_id"], "lang"]).all()
    # the 10 planted duplicates are gone
    assert len(out) == t.num_rows - 10


def test_curate_corpus_equals_manual_chain(ray_session):
    import ray.data

    from image_deduplication_3m_images_ray.extras.curate import curate_corpus
    from image_deduplication_3m_images_ray.extras.dedup_ops import (
        exact_dedup_keep_first_rows,
    )
    from image_deduplication_3m_images_ray.extras.lm import perplexity_buckets
    from image_deduplication_3m_images_ray.extras.textstats import gopher_filter

    t = _corpus()
    kw = dict(min_words=30, min_stopwords=1)
    got = (
        curate_corpus(ray.data.from_arrow(t), gopher_kwargs=kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    manual = perplexity_buckets(
        exact_dedup_keep_first_rows(gopher_filter(ray.data.from_arrow(t), **kw)),
        min_count=2,
    ).to_pandas()
    manual = (
        manual[manual["bucket"].isin(["head", "middle"])]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(manual.columns)
    for c in got.columns:
        assert (got[c].values == manual[c].values).all(), c
    # tail is cut, both languages present, ranks are per-language terciles
    assert set(got["bucket"]) == {"head", "middle"}
    assert set(got["lang"]) == {"en", "de"}
    for lang, g in got.groupby("lang"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))


def test_curate_corpus_keep_buckets_validation(ray_session):
    import ray.data

    from image_deduplication_3m_images_ray.extras.curate import curate_corpus

    ds = ray.data.from_arrow(_corpus())
    with pytest.raises(ValueError, match="keep_buckets"):
        curate_corpus(ds, keep_buckets=())
    with pytest.raises(ValueError, match="keep_buckets"):
        curate_corpus(ds, keep_buckets=("head", "bogus"))

"""Tests for URL canonicalization / URL dedup / domain stats (extras/urltools.py)."""

import numpy as np
import pyarrow as pa
import pytest


URLS = [
    "HTTP://WWW.Example.COM/A/B/?utm_source=x&ref=1#frag",
    "https://example.com/a/b",
    "http://example.com/a/b///",
    "https://www.example.com/a/b#other",
    "ftp://weird.example.com/path/",   # unknown scheme: kept (only http(s) strips)
    "example.com/a/b",                 # already scheme-less
    "https://Sub.Example.com/C?q=1",
    "",                                # empty
    None,                              # null -> '' key
]
EXPECT_CANON = [
    "example.com/a/b",
    "example.com/a/b",
    "example.com/a/b",
    "example.com/a/b",
    "ftp://weird.example.com/path",
    "example.com/a/b",
    "sub.example.com/c",
    "",
    "",
]


def test_canonical_url_kernel():
    from image_deduplication_3m_images_ray.extras.urltools import canonical_url_array

    got = canonical_url_array(pa.array(URLS, pa.string())).to_pylist()
    assert got == EXPECT_CANON


def test_url_dedup_keep_first_and_counts(ray_session):
    import ray.data

    from image_deduplication_3m_images_ray.extras.urltools import url_dedup

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(URLS), dtype=np.int64)),
            "url": pa.array(URLS, pa.string()),
        }
    )
    # two partitionings must agree (the exchange is the operator)
    for blocks in (1, 4):
        out = (
            url_dedup(ray.data.from_arrow(t).repartition(blocks))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        canon = np.array(EXPECT_CANON)
        keeper = np.array([int(np.flatnonzero(canon == c)[0]) for c in canon])
        n_same = np.array([int((canon == c).sum()) for c in canon])
        assert out["canon_url"].tolist() == EXPECT_CANON
        assert out["keeper_id"].tolist() == keeper.tolist()
        assert out["n_same_url"].tolist() == n_same.tolist()


def test_domain_stats_counts_and_share(ray_session):
    import ray.data

    from image_deduplication_3m_images_ray.extras.urltools import domain_stats

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "url": pa.array(
                [
                    "https://a.example/x",
                    "https://www.a.example/y?z=1",
                    "http://b.example/",
                    "https://b.example/p/q",
                ]
            ),
            "text": pa.array(["one two  three", "four", "", "five six"]),
        }
    )
    out = domain_stats(ray.data.from_arrow(t).repartition(2)).to_pandas()
    assert out["domain"].tolist() == ["a.example", "b.example"]
    assert out["n_docs"].tolist() == [2, 2]
    # token contract: whitespace-collapse then spaces+1; empty doc = 0
    assert out["n_tokens"].tolist() == [4, 2]
    assert np.allclose(out["doc_share"], [0.5, 0.5])


def test_domain_filter(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.urltools import domain_filter

    t = pa.table(
        {
            "doc_id": pa.array(list(range(8)), pa.int64()),
            "url": pa.array(
                [
                    "https://good.example/a", "https://good.example/b",
                    "https://low.example/a", "https://low.example/b",
                    "https://edge.example/a", "https://edge.example/b",
                    "https://evil.example/a", "https://evil.example/b",
                ]
            ),
            "q": pa.array([100, 200, 10, 20, 50, 50, 900, 900], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    out = (
        domain_filter(ds, min_mean_value=50, value_col="q", blocklist=["evil.example"])
        .sort("doc_id")
        .to_pandas()
    )
    # good (mean 150) kept; low (mean 15) dropped; edge (mean == 50) kept —
    # the integer gate is sum >= thr*count, inclusive; evil blocklisted
    assert set(out["domain"]) == {"good.example", "edge.example"}
    assert list(out["doc_id"]) == [0, 1, 4, 5]
    assert list(out["q"]) == [100, 200, 50, 50]

    with pytest.raises(ValueError):
        domain_filter(ds, min_mean_value=50.5, value_col="q")
    with pytest.raises(ValueError):
        domain_filter(ds, min_mean_value=50, value_col="q", broadcast_max_domains=1)


def test_crawl_curate_composition(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.urltools import crawl_curate

    t = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "url": pa.array(
                [
                    "https://a.example/p1",
                    "https://WWW.A.example/p1/",   # recrawl of doc 0 -> dropped
                    "https://a.example/p2",
                    "https://low.example/p1",      # low-mean domain -> dropped
                    "https://evil.example/p1",     # blocklisted -> dropped
                    "https://a.example/p3",        # contains the bad word
                ]
            ),
            "text": pa.array(["ok text", "ok text", "fine", "meh", "rich", "has badword here"]),
            "n_chars": pa.array([100, 100, 120, 5, 999, 150], pa.int64()),
        }
    )
    out = (
        crawl_curate(
            ray.data.from_arrow(t).repartition(2),
            badwords=["badword"],
            min_mean_value=50,
            value_col="n_chars",
            blocklist=["evil.example"],
        )
        .sort("doc_id")
        .to_pandas()
    )
    # survivors: 0 (recrawl winner) and 2; 1 url-duped, 3 low-domain,
    # 4 blocklisted, 5 bad word
    assert list(out["doc_id"]) == [0, 2]
    assert list(out["domain"]) == ["a.example", "a.example"]
    assert list(out["canon_url"]) == ["a.example/p1", "a.example/p2"]
    assert list(out["n_chars"]) == [100, 120]

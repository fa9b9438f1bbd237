"""End-to-end pipeline on the tiny planted corpus (Ray, streaming mode)."""

from collections import defaultdict

import numpy as np
import pytest

from image_deduplication_3m_images_ray.config import DedupConfig


@pytest.fixture(scope="module")
def report_df(ray_session, tiny_corpus):
    import ray.data

    pages, _ = tiny_corpus
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline

    ds = ray.data.from_arrow(pages)
    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    return dedup_pipeline(ds, cfg).to_pandas()


def test_every_url_reported_once(report_df, tiny_corpus):
    pages, _ = tiny_corpus
    assert sorted(report_df["url"]) == sorted(pages["url"].to_pylist())
    assert report_df["url"].is_unique


def test_statuses_consistent(report_df):
    assert set(report_df["status"]) <= {"Best", "Duplicate", "Unique"}
    for cid, g in report_df.groupby("cluster_id"):
        assert (g["cluster_size"] == len(g)).all()
        if len(g) == 1:
            assert (g["status"] == "Unique").all()
        else:
            assert (g["status"] == "Best").sum() == 1
            assert (g["status"] == "Duplicate").sum() == len(g) - 1
            # best has max quality (ties broken by url)
            best = g[g["status"] == "Best"].iloc[0]
            assert best["quality"] == g["quality"].max()


def test_planted_clusters_recovered(report_df, tiny_corpus):
    _, truth = tiny_corpus
    cls = dict(zip(truth["url"].to_pylist(), truth["class"].to_pylist()))
    tcid = dict(zip(truth["url"].to_pylist(), truth["true_cluster_id"].to_pylist()))
    got = dict(zip(report_df["url"], report_df["cluster_id"]))

    by_true = defaultdict(list)
    for u in got:
        by_true[tcid[u]].append(u)

    # exact + light near-dup planted clusters must be fully recovered (exact
    # copies and 1-3% edits are far above the 0.7 threshold)
    for c, members in by_true.items():
        classes = {cls[u] for u in members}
        if len(members) > 1 and classes <= {"exact_dup", "near_dup_light"}:
            assert len({got[u] for u in members}) == 1, (classes, members)

    # substring dups recovered via the winnowing pass
    for c, members in by_true.items():
        classes = {cls[u] for u in members}
        if classes == {"substring_dup"} and len(members) == 2:
            assert len({got[u] for u in members}) == 1, members

    # boilerplate non-dups must not share clusters with each other
    bp = [u for u in got if cls[u] == "boilerplate_nondup"]
    seen = {}
    for u in bp:
        assert got[u] not in seen, (u, seen[got[u]])
        seen[got[u]] = u


def test_giant_cluster_single(report_df, tiny_corpus):
    _, truth = tiny_corpus
    tcid = np.array(truth["true_cluster_id"].to_pylist())
    urls = truth["url"].to_pylist()
    giant_id = np.bincount(tcid).argmax()
    giant_urls = [u for u, c in zip(urls, tcid) if c == giant_id]
    got = dict(zip(report_df["url"], report_df["cluster_id"]))
    assert len({got[u] for u in giant_urls}) == 1


def test_cluster_stats_pipeline(ray_session, tiny_corpus):
    """Per-cluster stats report: sizes partition the corpus; Jaccard-confirmed
    pair means are in [threshold, 1]; singletons report 0 pairs."""
    import ray.data
    from image_deduplication_3m_images_ray.pipelines import cluster_stats_pipeline

    pages, truth = tiny_corpus
    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    stats = cluster_stats_pipeline(ray.data.from_arrow(pages), cfg).to_pandas()
    assert stats["cluster_size"].sum() == len(pages)
    assert (stats["cluster_size"] >= 1).all()
    multi = stats[stats["n_pairs"] > 0]
    assert (multi["mean_jaccard"] >= cfg.jaccard_threshold - 1e-9).all()
    assert (multi["mean_jaccard"] <= 1.0).all()
    singles = stats[stats["cluster_size"] == 1]
    assert (singles["n_pairs"] == 0).all()
    assert (singles["mean_jaccard"] == 0.0).all()


def test_attach_semijoin_equivalent(ray_session, tiny_corpus):
    """The attach semi-join filter is a pure optimization in all THREE modes:
    exact sorted-id set (default), distributed Bloom filter (forced by
    attach_semijoin_max_ids=0), and no filter at all (Bloom also disabled —
    every profile row ships).  All must yield a byte-identical report."""
    import ray.data
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline

    pages, _ = tiny_corpus
    base = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    bloom = DedupConfig(
        signature_concurrency=2, join_num_buckets=4, attach_semijoin_max_ids=0
    )
    off = DedupConfig(
        signature_concurrency=2,
        join_num_buckets=4,
        attach_semijoin_max_ids=0,
        attach_bloom_bits_per_id=0,
    )
    r_exact = dedup_pipeline(ray.data.from_arrow(pages), base).to_pandas()
    r_bloom = dedup_pipeline(ray.data.from_arrow(pages), bloom).to_pandas()
    r_off = dedup_pipeline(ray.data.from_arrow(pages), off).to_pandas()
    assert r_exact.equals(r_bloom)
    assert r_exact.equals(r_off)

"""Oracle conformance: dup-pair recall >= 0.99 + cluster agreement (north rule).

Pipeline pairs are provably a SUBSET of oracle pairs (both confirm with the
same exact Jaccard / exact substring predicates; the oracle enumerates
exhaustively while the pipeline enumerates via LSH + winnowing), so:
- recall  = fraction of oracle dup pairs the pipeline clusters together,
- the pipeline partition must REFINE the oracle partition (no over-merge).
"""

from collections import defaultdict

import pytest

from image_deduplication_3m_images_ray.config import DedupConfig
from image_deduplication_3m_images_ray.oracle import oracle_dedup

CFG = DedupConfig(signature_concurrency=2, join_num_buckets=4)


@pytest.fixture(scope="module")
def conformance(ray_session, small_corpus):
    import ray.data
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline

    pages, truth = small_corpus
    urls = truth["url"].to_pylist()
    bodies = truth["body"].to_pylist()
    oracle = oracle_dedup(urls, bodies, CFG)
    report = dedup_pipeline(ray.data.from_arrow(pages), CFG).to_pandas()
    got = dict(zip(report["url"], report["cluster_id"]))
    return oracle, report, got, urls


def test_dup_pair_recall(conformance):
    oracle, _, got, urls = conformance
    pairs = oracle.dup_pairs
    assert len(pairs) > 50  # the corpus plants plenty of structure
    hit = sum(1 for i, j in pairs if got[urls[i]] == got[urls[j]])
    recall = hit / len(pairs)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(pairs)} oracle pairs"


def test_no_overmerge(conformance):
    """Every pipeline cluster lies inside one oracle cluster (partition refinement)."""
    oracle, _, got, urls = conformance
    by_pipeline = defaultdict(set)
    for u, c in got.items():
        by_pipeline[c].add(oracle.clusters[u])
    for c, oroots in by_pipeline.items():
        assert len(oroots) == 1, f"pipeline cluster {c} spans oracle clusters {oroots}"


def test_status_agreement(conformance):
    """Where partitions coincide, Best/Duplicate/Unique must match the oracle."""
    oracle, report, got, urls = conformance
    by_oracle = defaultdict(set)
    for u in urls:
        by_oracle[oracle.clusters[u]].add(u)
    statuses = dict(zip(report["url"], report["status"]))
    agree = total = 0
    for root, members in by_oracle.items():
        pipeline_ids = {got[u] for u in members}
        if len(pipeline_ids) == 1:  # partitions coincide on this cluster
            for u in members:
                total += 1
                agree += statuses[u] == oracle.statuses[u]
    assert total > 0
    assert agree == total


def test_report_invariants(conformance, small_corpus):
    pages, _ = small_corpus
    _, report, _, _ = conformance
    assert sorted(report["url"]) == sorted(pages["url"].to_pylist())
    assert set(report["status"]) <= {"Best", "Duplicate", "Unique"}

"""Oracle sanity: the single-process ground truth matches the planted structure."""

from collections import defaultdict

import numpy as np

from image_deduplication_3m_images_ray.config import DedupConfig
from image_deduplication_3m_images_ray.oracle import oracle_dedup

CFG = DedupConfig()


def _truth_maps(truth):
    urls = truth["url"].to_pylist()
    cids = truth["true_cluster_id"].to_pylist()
    cls = truth["class"].to_pylist()
    bodies = truth["body"].to_pylist()
    return urls, cids, cls, bodies


def test_oracle_on_planted_corpus(tiny_corpus):
    _, truth = tiny_corpus
    urls, cids, cls, bodies = _truth_maps(truth)
    res = oracle_dedup(urls, bodies, CFG)
    idx = {u: i for i, u in enumerate(urls)}
    by_cluster = defaultdict(list)
    for u, c in zip(urls, cids):
        by_cluster[c].append(u)

    pair_set = {(min(a, b), max(a, b)) for a, b in res.dup_pairs}

    # exact dups: every same-cluster exact pair must be an oracle pair
    for c, members in by_cluster.items():
        classes = {cls[idx[u]] for u in members}
        if classes == {"exact_dup"} and len(members) > 1:
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, b = idx[members[i]], idx[members[j]]
                    assert (min(a, b), max(a, b)) in pair_set

    # substring dups: the planted containment pair must be found
    n_sub_clusters = 0
    for c, members in by_cluster.items():
        classes = {cls[idx[u]] for u in members}
        if classes == {"substring_dup"} and len(members) == 2:
            n_sub_clusters += 1
            a, b = idx[members[0]], idx[members[1]]
            assert (min(a, b), max(a, b)) in res.substring_pairs
    assert n_sub_clusters > 0

    # boilerplate non-dups must never pair with each other
    bp = [idx[u] for u in urls if cls[idx[u]] == "boilerplate_nondup"]
    for i in range(len(bp)):
        for j in range(i + 1, len(bp)):
            assert (min(bp[i], bp[j]), max(bp[i], bp[j])) not in pair_set

    # the giant cluster (largest planted) must be one oracle cluster
    giant = max(by_cluster.values(), key=len)
    roots = {res.clusters[u] for u in giant}
    assert len(roots) == 1

    # statuses: every url present, exactly one Best per multi-cluster
    assert set(res.statuses) == set(urls)
    best_count = defaultdict(int)
    for u, s in res.statuses.items():
        if s == "Best":
            best_count[res.clusters[u]] += 1
    for root, cnt in best_count.items():
        assert cnt == 1

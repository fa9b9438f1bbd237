"""Measure dup-pair recall at bench scale (north rule: recall >= 0.99).

The exhaustive conformance oracle (`image_deduplication_3m_images_ray.oracle`) is
all-pairs and only feasible on the small test corpora; at bench scale the
fixture's planted truth restricts where true dup pairs can exist — the
generator plants duplicates only WITHIN a ``true_cluster_id`` (cross-cluster
texts are independent draws), so evaluating the SAME exact predicates the
oracle uses (token-shingle Jaccard >= t, common substring >= L codepoints)
over same-true-cluster pairs enumerates the full oracle-positive pair set.

Reports:
- recall   = fraction of oracle-positive pairs the pipeline co-clusters,
- overmerge = number of report clusters spanning >1 true cluster (expect 0;
  the boilerplate_nondup class is planted specifically to tempt this).

Usage: python tools/measure_recall.py [n_pages] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def common_substring_at_least(a: np.ndarray, b: np.ndarray, L: int) -> bool:
    """True iff codepoint arrays a, b share a contiguous run of >= L codepoints."""
    from image_deduplication_3m_images_ray.functions.hashing import _char_kgram_hashes

    ha, hb = _char_kgram_hashes(a, L), _char_kgram_hashes(b, L)
    if not (len(ha) and len(hb)):
        return False
    common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
    for pa_, pb_ in zip(ia, ib):  # verify codepoints (collision safety)
        if np.array_equal(a[pa_ : pa_ + L], b[pb_ : pb_ + L]):
            return True
    return False


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.fixtures import write_corpus
    from image_deduplication_3m_images_ray.functions.text import normalize_text, shingle_set
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline

    corpus_dir = f"/tmp/graft_bench_corpus_{n_pages}_s4_42"
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        write_corpus(corpus_dir, n_pages, seed=42, doc_scale=4)

    cfg = DedupConfig(signature_concurrency=max(2, min(num_cpus, 16)),
                      join_num_buckets=max(8, num_cpus // 2))
    pages = rd.read_parquet(pages_path, override_num_blocks=num_cpus * 2)
    report = dedup_pipeline(pages, cfg).select_columns(["url", "cluster_id"]).to_pandas()
    got = dict(zip(report["url"], report["cluster_id"]))

    truth = pq.read_table(os.path.join(corpus_dir, "truth.parquet"))
    urls = truth["url"].to_pylist()
    cids = truth["true_cluster_id"].to_numpy(zero_copy_only=False)
    bodies = truth["body"].to_pylist()

    groups = defaultdict(list)
    for i, c in enumerate(cids):
        groups[int(c)].append(i)
    multi = [idxs for idxs in groups.values() if len(idxs) > 1]
    need = sorted({i for idxs in multi for i in idxs})

    # predicate inputs only for docs inside multi-member truth clusters
    norm = {}
    sh = {}
    for i in need:
        nt = normalize_text(bodies[i])
        norm[i] = np.frombuffer(nt.encode("utf-32-le"), dtype=np.uint32)
        sh[i] = shingle_set(bodies[i], cfg.shingle_k)  # sorted unique u64

    t = cfg.jaccard_threshold
    L = cfg.min_substring_len
    oracle_pos = hit = 0
    for idxs in multi:
        for x in range(len(idxs)):
            for y in range(x + 1, len(idxs)):
                a, b = idxs[x], idxs[y]
                inter = len(np.intersect1d(sh[a], sh[b], assume_unique=True))
                union = len(sh[a]) + len(sh[b]) - inter
                pos = inter >= t * max(union, 1)
                if not pos:
                    pos = common_substring_at_least(norm[a], norm[b], L)
                if pos:
                    oracle_pos += 1
                    if got[urls[a]] == got[urls[b]]:
                        hit += 1

    # over-merge: report clusters spanning more than one true cluster
    by_report = defaultdict(set)
    true_of = dict(zip(urls, (int(c) for c in cids)))
    for url, rc in got.items():
        by_report[rc].add(true_of[url])
    overmerged = sum(1 for s in by_report.values() if len(s) > 1)

    print(json.dumps({
        "n_pages": n_pages,
        "truth_multi_clusters": len(multi),
        "oracle_positive_pairs": oracle_pos,
        "co_clustered": hit,
        "recall": round(hit / max(oracle_pos, 1), 5),
        "overmerged_report_clusters": overmerged,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

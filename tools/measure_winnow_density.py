"""Winnow-density A/B evidence tool (BASELINE.md "Winnow density A/B").

Measures, for a given (k, w) winnowing config with k + w - 1 = 200:
  - fingerprint exchange rows + stage seconds,
  - winnow candidate pairs + stage seconds,
  - full dedup_pipeline wall (best of 2) + report md5,
  - cluster-level substring recall vs the exact suffix-array truth on a
    smaller corpus (the contract metric: star-capping keeps bucket
    connectivity, not every pair, so PAIR-level recall is capped by design).

Usage: python tools/measure_winnow_density.py <k> <w> [num_cpus]
Run each config in a FRESH process; compare the JSON lines.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    k, w = int(sys.argv[1]), int(sys.argv[2])
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import ray.data

    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.suffix import suffix_array_pairs_stage
    from image_deduplication_3m_images_ray.fixtures import write_corpus
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline
    from image_deduplication_3m_images_ray.stages.exact import exact_rep_stage, reps_only
    from image_deduplication_3m_images_ray.stages.extract import extract_stage
    from image_deduplication_3m_images_ray.stages.signatures import signature_stage
    from image_deduplication_3m_images_ray.stages.verify import verify_stage
    from image_deduplication_3m_images_ray.stages.winnow import (
        fingerprint_stage,
        winnow_pairs_stage,
    )

    cfg = DedupConfig(
        signature_concurrency=cpus,
        join_num_buckets=max(8, cpus // 2),
        winnow_kgram=k,
        winnow_window=w,
    )

    # --- bench corpus: stage rows/seconds + pipeline wall ---
    bench_dir = "/tmp/graft_bench_corpus_20000_s4_42"
    bench_pages = os.path.join(bench_dir, "pages.parquet")
    if not os.path.exists(bench_pages):
        write_corpus(bench_dir, 20000, seed=42, doc_scale=4)
    pages = ray.data.read_parquet(bench_pages, override_num_blocks=cpus * 2)
    pages.count()  # warm

    profile = extract_stage(
        ray.data.read_parquet(bench_pages, override_num_blocks=cpus * 2), cfg
    )
    t0 = time.time()
    fps = fingerprint_stage(profile, cfg).materialize()
    n_fp, t_fp = fps.count(), time.time() - t0
    t0 = time.time()
    n_pairs = winnow_pairs_stage(fps, cfg).count()
    t_pairs = time.time() - t0

    best, digest = None, None
    for _ in range(2):
        t0 = time.time()
        pages = ray.data.read_parquet(bench_pages, override_num_blocks=cpus * 2)
        rep = dedup_pipeline(pages, cfg).sort("url").to_pandas()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        digest = hashlib.md5(rep.to_csv(index=False).encode()).hexdigest()

    # --- recall corpus: cluster-level recall vs exact suffix truth ---
    rec_dir = "/tmp/graft_ab_corpus_6000_s4_42"
    rec_pages = os.path.join(rec_dir, "pages.parquet")
    if not os.path.exists(rec_pages):
        write_corpus(rec_dir, 6000, seed=42, doc_scale=4)
    rp = ray.data.read_parquet(rec_pages, override_num_blocks=cpus)
    docs_rep = exact_rep_stage(extract_stage(rp, cfg), cfg).materialize()
    reps = reps_only(docs_rep).materialize()
    truth_df = suffix_array_pairs_stage(
        reps.select_columns(["doc_id", "norm_text"])
        .rename_columns({"norm_text": "text"})
        .repartition(1),
        cfg,
        batch_size=1 << 20,
    ).to_pandas()
    truth = list(
        zip(truth_df["doc_a"].astype("uint64"), truth_df["doc_b"].astype("uint64"))
    )

    prof = signature_stage(reps, cfg).materialize()
    raw = winnow_pairs_stage(fingerprint_stage(prof, cfg), cfg)
    ver = verify_stage(raw, prof, cfg).to_pandas()
    acc = ver[ver["match_len"] >= cfg.min_substring_len]
    got = list(zip(acc["doc_a"].astype("uint64"), acc["doc_b"].astype("uint64")))

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in got:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    same = sum(1 for a, b in truth if find(a) == find(b))

    print(
        json.dumps(
            {
                "k": k,
                "w": w,
                "num_cpus": cpus,
                "fp_rows": n_fp,
                "fp_sec": round(t_fp, 2),
                "winnow_pairs": n_pairs,
                "pairs_sec": round(t_pairs, 2),
                "pipeline_sec_best2": round(best, 2),
                "report_md5": digest,
                "truth_pairs_6k": len(truth),
                "cluster_level_recall": round(same / max(len(truth), 1), 5),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Isolate the winnow fingerprint exchange: rows, bytes, time, dup-fp fraction.

Evidence tool for the round-4 item "cut the winnow exchange volume"
(VERDICT round 3: winnow_pairs is 34.7% of 16-cpu wall at 500k pages,
exchange-bound at the winnowing density floor).  Builds the flagship profile
on a bench corpus, then times fingerprint_stage and winnow_pairs_stage
separately and reports the exchange's row count, wire bytes per row, and the
fraction of fingerprint rows whose fingerprint occurs in >= 2 docs (the only
rows the pair-emission reducer can use — everything else is dead exchange
volume).

Usage: python tools/measure_winnow.py [n_pages] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.fixtures import write_corpus
    from image_deduplication_3m_images_ray.stages.exact import exact_rep_stage, reps_only
    from image_deduplication_3m_images_ray.stages.extract import extract_stage
    from image_deduplication_3m_images_ray.stages.signatures import signature_stage
    from image_deduplication_3m_images_ray.stages.winnow import (
        fingerprint_stage,
        winnow_pairs_stage,
    )

    corpus_dir = f"/tmp/graft_bench_corpus_{n_pages}_s4_42"
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        write_corpus(corpus_dir, n_pages, seed=42, doc_scale=4)

    cfg = DedupConfig(signature_concurrency=max(2, min(num_cpus, 16)),
                      join_num_buckets=max(8, num_cpus // 2))
    pages = rd.read_parquet(pages_path, override_num_blocks=num_cpus * 2)
    docs_rep = exact_rep_stage(extract_stage(pages, cfg), cfg).materialize()
    profile = signature_stage(reps_only(docs_rep), cfg).materialize()

    t0 = time.time()
    fps = fingerprint_stage(profile, cfg).materialize()
    t_fp = round(time.time() - t0, 2)
    n_fp = fps.count()
    schema = fps.schema()
    row_bytes = sum(
        8 if str(t) in ("uint64", "int64") else 4 for t in schema.types
    )

    # dup-fp diagnosis: fraction of rows whose fp occurs in >= 2 DOCS
    # (driver-side at tool scale only)
    parts = [
        (np.asarray(t["fp"].to_numpy(zero_copy_only=False)),
         np.asarray(t["doc_id"].to_numpy(zero_copy_only=False)))
        for t in ray.get(fps.to_arrow_refs()) if t.num_rows
    ]
    fp_all = np.concatenate([p[0] for p in parts])
    doc_all = np.concatenate([p[1] for p in parts])
    rec = np.unique(np.stack([fp_all.astype(np.uint64), doc_all.astype(np.uint64)]), axis=1)
    u, c = np.unique(rec[0], return_counts=True)
    dup_fps = u[c >= 2]
    live = np.isin(fp_all.astype(np.uint64), dup_fps)
    live_rows = int(live.sum())

    t0 = time.time()
    pairs = winnow_pairs_stage(fps, cfg).materialize()
    t_pairs = round(time.time() - t0, 2)

    print(json.dumps({
        "n_pages": n_pages,
        "num_cpus": num_cpus,
        "profile_rows": profile.count(),
        "fingerprint_rows": n_fp,
        "fingerprint_sec": t_fp,
        "exchange_bytes_per_row": row_bytes,
        "exchange_mb": round(n_fp * row_bytes / 1e6, 1),
        "distinct_fps": int(len(u)),
        "dup_fps": int(len(dup_fps)),
        "live_rows": live_rows,
        "live_row_pct": round(100 * live_rows / max(n_fp, 1), 2),
        "pair_rows": pairs.count(),
        "winnow_pairs_sec": t_pairs,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

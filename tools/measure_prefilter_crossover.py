"""A/B the winnow live-row prefilter across corpus sizes to find the
fingerprint-row count where it starts winning.

Evidence tool for the round-5 item "size-adaptive winnow_prefilter"
(VERDICT round 4, task 3): for each corpus size, time winnow_pairs_stage
with the prefilter OFF and ON (same materialized fingerprints, same
config otherwise) and report the fingerprint row count next to both
timings.  The crossover feeds DedupConfig.winnow_prefilter_min_rows.

Usage: python tools/measure_prefilter_crossover.py [num_cpus] [sizes...]
       (defaults: 16 cpus, sizes 20000 50000 100000 200000)

Each size runs in-process sequentially; one JSON line per size plus a
summary line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sizes = [int(a) for a in sys.argv[2:]] or [20_000, 50_000, 100_000, 200_000]

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from dataclasses import replace

    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.fixtures import write_corpus
    from image_deduplication_3m_images_ray.stages.exact import exact_rep_stage, reps_only
    from image_deduplication_3m_images_ray.stages.extract import extract_stage
    from image_deduplication_3m_images_ray.stages.signatures import signature_stage
    from image_deduplication_3m_images_ray.stages.winnow import (
        fingerprint_stage,
        winnow_pairs_stage,
    )

    results = []
    for n_pages in sizes:
        corpus_dir = f"/tmp/graft_bench_corpus_{n_pages}_s4_42"
        pages_path = os.path.join(corpus_dir, "pages.parquet")
        if not os.path.exists(pages_path):
            write_corpus(corpus_dir, n_pages, seed=42, doc_scale=4)

        base = DedupConfig(signature_concurrency=max(2, min(num_cpus, 16)),
                           join_num_buckets=max(8, num_cpus // 2))
        pages = rd.read_parquet(pages_path, override_num_blocks=num_cpus * 2)
        docs_rep = exact_rep_stage(extract_stage(pages, base), base).materialize()
        profile = signature_stage(reps_only(docs_rep), base).materialize()
        fps = fingerprint_stage(profile, base).materialize()
        n_fp = fps.count()

        timings = {}
        pair_counts = {}
        for mode, flag in (("off", False), ("on", True)):
            cfg = replace(base, winnow_prefilter=flag)
            t0 = time.time()
            pairs = winnow_pairs_stage(fps, cfg).materialize()
            timings[mode] = round(time.time() - t0, 2)
            pair_counts[mode] = pairs.count()

        row = {
            "n_pages": n_pages,
            "num_cpus": num_cpus,
            "fingerprint_rows": n_fp,
            "off_sec": timings["off"],
            "on_sec": timings["on"],
            "speedup": round(timings["off"] / max(timings["on"], 1e-9), 2),
            "pairs_equal": pair_counts["off"] == pair_counts["on"],
            "pair_rows": pair_counts["off"],
        }
        print(json.dumps(row), flush=True)
        results.append(row)

    winners = [r for r in results if r["on_sec"] < r["off_sec"]]
    crossover = min((r["fingerprint_rows"] for r in winners), default=None)
    print(json.dumps({"crossover_fingerprint_rows": crossover,
                      "all_pairs_equal": all(r["pairs_equal"] for r in results)}))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Measure the verify semi-join's row/byte cut (exact set vs Bloom), per side.

Evidence for BASELINE.md (round-2 verdict item 1 "measured byte-volume cut",
updated for the round-4 two-exchange verify plan): builds the flagship
pipeline's profile + raw candidate stream on a bench corpus, then applies
`_prep_profile` for each exchange side (a-side feeds the prepare exchange,
b-side the verify exchange) with (a) no filter, (b) the exact sorted-id
sets, (c) the distributed Bloom filters, and reports rows and payload bytes
that would enter the exchange under each mode, plus the Bloom
false-positive overhead vs exact.

Usage: python tools/measure_attach_semijoin.py [n_pages] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa


def payload_bytes(t: pa.Table) -> int:
    """Heavy columns only: non-null payload (text) + sset value bytes."""
    import pyarrow.compute as pc

    total = 0
    for col in ("payload", "sset"):
        s = pc.sum(pc.binary_length(t[col])).as_py()
        total += int(s or 0)
    return total


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.fixtures import write_corpus
    from image_deduplication_3m_images_ray.stages.banding import band_postings_stage, lsh_pairs_stage
    from image_deduplication_3m_images_ray.stages.exact import exact_rep_stage, reps_only
    from image_deduplication_3m_images_ray.stages.extract import extract_stage
    from image_deduplication_3m_images_ray.stages.signatures import signature_stage
    from image_deduplication_3m_images_ray.stages.verify import (
        _prep_profile,
        _side_memberships,
        prepare_candidates,
    )
    from image_deduplication_3m_images_ray.stages.winnow import fingerprint_stage, winnow_pairs_stage

    corpus_dir = f"/tmp/graft_bench_corpus_{n_pages}_s4_42"
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        write_corpus(corpus_dir, n_pages, seed=42, doc_scale=4)

    cfg = DedupConfig(signature_concurrency=max(2, min(num_cpus, 16)),
                      join_num_buckets=max(8, num_cpus // 2))
    cfg_bloom = DedupConfig(
        signature_concurrency=cfg.signature_concurrency,
        join_num_buckets=cfg.join_num_buckets,
        attach_semijoin_max_ids=0,  # force the Bloom path
    )
    pages = rd.read_parquet(pages_path, override_num_blocks=num_cpus * 2)
    docs_rep = exact_rep_stage(extract_stage(pages, cfg), cfg).materialize()
    profile = signature_stage(reps_only(docs_rep), cfg).materialize()
    lsh = lsh_pairs_stage(band_postings_stage(profile, cfg), cfg, dedup=False).materialize()
    wp = winnow_pairs_stage(fingerprint_stage(profile, cfg), cfg).materialize()
    raw = lsh.union(wp)
    prepared = prepare_candidates(raw, profile, cfg).materialize()

    result = {"n_pages": n_pages, "profile_rows": profile.count(),
              "raw_candidate_rows": raw.count(),
              "prepared_rows": prepared.count()}

    prof_tables = ray.get(
        profile.select_columns(
            ["doc_id", "simhash", "n_shingles", "norm_text", "shingle_set"]
        ).to_arrow_refs()
    )

    for side, col, cand in (("a", "doc_a", raw), ("b", "doc_b", prepared)):
        exact_members = _side_memberships(cand, col, cfg)
        bloom_members = _side_memberships(cand, col, cfg_bloom)
        totals = {"none": [0, 0], "exact": [0, 0], "bloom": [0, 0]}
        for t in prof_tables:
            if not t.num_rows:
                continue
            for mode, members in (
                ("none", None),
                ("exact", exact_members),
                ("bloom", bloom_members),
            ):
                out = (
                    _prep_profile(t, col)
                    if members is None
                    else _prep_profile(t, col, members[0], members[1])
                )
                totals[mode][0] += out.num_rows
                totals[mode][1] += payload_bytes(out)
        result[f"{side}_distinct_ids"] = int(
            len(exact_members[0].ids) + len(exact_members[1].ids)
        )
        result[f"{side}_bloom_m_bits"] = bloom_members[0].m_bits
        result[f"{side}_bloom_fill_fraction"] = round(
            max(bloom_members[0].fill_fraction(), bloom_members[1].fill_fraction()), 5
        )
        for mode, (rows, byts) in totals.items():
            result[f"{side}_{mode}_rows"] = rows
            result[f"{side}_{mode}_payload_mb"] = round(byts / 1e6, 1)
        result[f"{side}_exact_row_cut_pct"] = round(
            100 * (1 - totals["exact"][0] / max(totals["none"][0], 1)), 1
        )
        result[f"{side}_exact_byte_cut_pct"] = round(
            100 * (1 - totals["exact"][1] / max(totals["none"][1], 1)), 1
        )
        result[f"{side}_bloom_fp_row_overhead_pct"] = round(
            100 * (totals["bloom"][0] - totals["exact"][0]) / max(totals["exact"][0], 1), 3
        )
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()

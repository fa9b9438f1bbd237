"""Itemize the dedup report tail: cluster-map lookup, dup-rep membership,
tagged projection, meta exchange, status apply, final sort, consume.

Evidence tool for the round-5 item "report-tail streaming cut" (VERDICT
round 4, task 6: 18 s CPU-invariant tail at 500k pages).  Runs the flagship
up to rep_clusters (pinned), then times each report sub-step separately.

Usage: python tools/measure_report_tail.py [n_pages] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.fixtures import write_corpus
    from image_deduplication_3m_images_ray.stages.banding import band_postings_stage, lsh_pairs_stage
    from image_deduplication_3m_images_ray.stages.cluster import cluster_stage
    from image_deduplication_3m_images_ray.stages.exact import exact_rep_stage, reps_only
    from image_deduplication_3m_images_ray.stages.extract import extract_stage
    from image_deduplication_3m_images_ray.stages.signatures import signature_stage
    from image_deduplication_3m_images_ray.stages.verify import prepare_candidates, verify_prepared
    from image_deduplication_3m_images_ray.stages.winnow import fingerprint_stage, winnow_pairs_stage
    from image_deduplication_3m_images_ray.stages import report as rp

    corpus_dir = f"/tmp/graft_bench_corpus_{n_pages}_s4_42"
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        write_corpus(corpus_dir, n_pages, seed=42, doc_scale=4)

    cfg = DedupConfig(signature_concurrency=max(2, min(num_cpus, 16)),
                      join_num_buckets=max(8, num_cpus // 2))
    pages = rd.read_parquet(pages_path, override_num_blocks=num_cpus * 2)
    docs_rep = exact_rep_stage(extract_stage(pages, cfg), cfg).materialize()
    profile = signature_stage(reps_only(docs_rep), cfg).materialize()
    lsh = lsh_pairs_stage(band_postings_stage(profile, cfg), cfg, dedup=False).materialize()
    wp = winnow_pairs_stage(fingerprint_stage(profile, cfg), cfg).materialize()
    candidates = prepare_candidates(lsh.union(wp), profile, cfg).materialize()
    verified = verify_prepared(candidates, profile, cfg).materialize()
    rep_clusters = cluster_stage(verified, cfg).materialize()

    out = {"n_pages": n_pages, "num_cpus": num_cpus}

    t0 = time.time()
    ref, pinned = rp._gated_cluster_lookup(rep_clusters, "doc_id", 5_000_000)
    out["cluster_lookup_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    dup_reps = rp._dup_rep_membership(docs_rep, cfg, 5_000_000)
    out["dup_rep_membership_sec"] = round(time.time() - t0, 2)

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    dref = ray.put(dup_reps)
    base = docs_rep.select_columns(["doc_id", "url", "n_chars", "rep_id"])

    def project(t: pa.Table) -> pa.Table:
        ids_, cids_ = ray.get(ref)
        m = ray.get(dref)
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        rid = np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        hit, cid = rp._lookup_u64(ids_, cids_, rid)
        ship = hit | (rid != did) | m.contains(did)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "url": t["url"],
                "quality": pc.cast(t["n_chars"], pa.float64()),
                "cluster_id": pa.array(np.where(hit, cid, rid), pa.uint64()),
                "__ship": pa.array(ship),
            }
        )

    t0 = time.time()
    tagged = base.map_batches(
        project, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
    ).materialize()
    out["tagged_project_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    shipped = tagged.map_batches(
        lambda t: t.filter(t["__ship"]).select(["cluster_id", "doc_id", "quality", "url"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    meta = rp._cluster_meta(shipped, cfg).materialize()
    out["meta_exchange_sec"] = round(time.time() - t0, 2)
    out["meta_rows"] = meta.count()

    t0 = time.time()
    bbase = tagged.map_batches(
        lambda t: t.drop_columns(["__ship"]), batch_format="pyarrow", zero_copy_batch=True
    )
    report = rp._apply_meta(bbase, meta, cfg, 5_000_000).materialize()
    out["apply_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    sorted_report = report.sort(["cluster_id", "status"]).materialize()
    out["sort_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    out["rows"] = sorted_report.count()
    out["consume_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

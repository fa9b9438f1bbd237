"""Itemize the fused exact_reps stage: extract vs md5 keys vs dup-map
exchange vs rep attach.

Evidence tool for the round-5 item "profile and split the exact_reps stage"
(VERDICT round 4, task 5: 52.8 s @ 4 cpus at 500k pages with 1.8x scaling —
the worst-scaling compute stage, previously unprofiled because the pipeline
pins extract + exact_rep_stage as ONE boundary).  Each sub-stage is pinned
separately here so its wall time is exclusive:

  extract    — pages -> docs (HTML->text for the ~20% empty-text rows,
               normalize, md5 doc ids)
  md5_keys   — docs + (h_lo, h_hi) norm_text hash columns (pure numpy/arrow)
  dup_map    — the (h_lo, h_hi)-keyed exchange producing doc_id -> rep_id
               for exact-duplicate groups
  attach     — broadcast (or sharded) rep_id attach back onto the doc table

Usage: python tools/measure_exact_reps.py [n_pages] [num_cpus]
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

    import numpy as np
    import pyarrow as pa

    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.fixtures import write_corpus
    from image_deduplication_3m_images_ray.stages import exact as ex
    from image_deduplication_3m_images_ray.stages.extract import extract_stage
    from image_deduplication_3m_images_ray.util import sharded_group_map

    corpus_dir = f"/tmp/graft_bench_corpus_{n_pages}_s4_42"
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        write_corpus(corpus_dir, n_pages, seed=42, doc_scale=4)

    cfg = DedupConfig(signature_concurrency=max(2, min(num_cpus, 16)),
                      join_num_buckets=max(8, num_cpus // 2))
    pages = rd.read_parquet(pages_path, override_num_blocks=num_cpus * 2)
    # warm page cache + worker pool like bench.py
    pages.map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True).count()

    out = {"n_pages": n_pages, "num_cpus": num_cpus}

    t0 = time.time()
    docs = extract_stage(pages, cfg).materialize()
    out["extract_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    hashed = docs.map_batches(
        ex._add_md5, batch_format="pyarrow", batch_size=cfg.batch_size,
        zero_copy_batch=True,
    ).materialize()
    out["md5_keys_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    keys = hashed.select_columns(["doc_id", "h_lo", "h_hi"])
    dup_map = sharded_group_map(
        keys, ["h_lo", "h_hi"], ex._dup_map_shard, num_shards=cfg.group_shards
    ).materialize()
    out["dup_map_sec"] = round(time.time() - t0, 2)
    out["dup_map_rows"] = dup_map.count()

    t0 = time.time()
    import ray as _ray

    parts = [t for t in _ray.get(dup_map.to_arrow_refs()) if t.num_rows]
    if parts:
        tbl = pa.concat_tables(parts).combine_chunks()
        ids = np.asarray(tbl["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        reps = np.asarray(tbl["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, reps = ids[order], reps[order]
    else:
        ids = np.empty(0, dtype=np.uint64)
        reps = np.empty(0, dtype=np.uint64)
    ref = _ray.put((ids, reps))
    base = hashed.map_batches(
        lambda t: t.drop_columns(["h_lo", "h_hi"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    attached = base.map_batches(
        ex._broadcast_rep_attach(ref), batch_format="pyarrow",
        batch_size=cfg.batch_size, zero_copy_batch=True,
    ).materialize()
    out["attach_sec"] = round(time.time() - t0, 2)
    out["rows"] = attached.count()

    # the fused stage as the pipeline runs it, for the inclusive total
    t0 = time.time()
    fused = ex.exact_rep_stage(
        extract_stage(
            rd.read_parquet(pages_path, override_num_blocks=num_cpus * 2), cfg
        ),
        cfg,
    ).materialize()
    out["fused_total_sec"] = round(time.time() - t0, 2)
    assert fused.count() == out["rows"]

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()

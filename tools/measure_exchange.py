"""Compare exchange strategies for the winnow fingerprint groupby.

Round-4 evidence tool (VERDICT item 1: winnow_pairs is exchange-bound).
Times, on the same materialized fingerprint table:

  a. sort     — current sharded_group_map (groupby("__shard") sort exchange)
  b. hash     — repartition(num_blocks, keys=["__shard"]) hash shuffle +
                per-block map_batches (sort-free exchange)
  c. live     — dup-fp pre-pass (8+1-byte (fp,cnt) exchange, exact per-block
                doc-distinct counts) -> broadcast sorted dup-fp array ->
                map-side filter -> sort exchange over live rows only
  d. live+hash— same pre-filter, hash-shuffle exchange

Usage: python tools/measure_exchange.py [n_pages] [num_cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


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
        _emit_shard_fp_pairs,
        fingerprint_stage,
    )
    from image_deduplication_3m_images_ray.util import sharded_group_map

    corpus_dir = f"/tmp/graft_bench_corpus_{n_pages}_s4_42"
    pages_path = os.path.join(corpus_dir, "pages.parquet")
    if not os.path.exists(pages_path):
        write_corpus(corpus_dir, n_pages, seed=42, doc_scale=4)

    cfg = DedupConfig(signature_concurrency=max(2, min(num_cpus, 16)),
                      join_num_buckets=max(8, num_cpus // 2))
    pages = rd.read_parquet(pages_path, override_num_blocks=num_cpus * 2)
    docs_rep = exact_rep_stage(extract_stage(pages, cfg), cfg).materialize()
    profile = signature_stage(reps_only(docs_rep), cfg).materialize()
    fps = fingerprint_stage(profile, cfg).materialize()
    n_fp = fps.count()
    results = {"n_pages": n_pages, "num_cpus": num_cpus, "fingerprint_rows": n_fp}

    emit = lambda g: _emit_shard_fp_pairs(g, cfg.bucket_pair_cap)  # noqa: E731

    # --- a. current sort path ---
    t0 = time.time()
    out_a = sharded_group_map(fps, ["fp"], emit, num_shards=cfg.group_shards).materialize()
    results["sort_sec"] = round(time.time() - t0, 2)
    results["pair_rows"] = out_a.count()

    # --- b. hash-shuffle repartition path ---
    def run_hash(ds):
        # key-based repartition requires the hash-shuffle strategy; the
        # context flag is read at plan execution, so set it only around the
        # hash variants (ds is already materialized — nothing upstream reruns)
        from ray.data.context import ShuffleStrategy

        ctx = rd.DataContext.get_current()
        prev = ctx.shuffle_strategy
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            # a Dataset snapshots its DataContext at creation — rebuild from
            # the materialized block refs so the new plan sees HASH_SHUFFLE
            ds2 = rd.from_arrow_refs(ds.to_arrow_refs())
            rep = ds2.repartition(cfg.group_shards, keys=["fp"])
            return rep.map_batches(emit, batch_format="numpy", batch_size=None,
                                   zero_copy_batch=True).materialize()
        finally:
            ctx.shuffle_strategy = prev

    t0 = time.time()
    try:
        out_b = run_hash(fps)
        results["hash_sec"] = round(time.time() - t0, 2)
        results["hash_pair_rows"] = out_b.count()
    except Exception as e:  # noqa: BLE001
        results["hash_sec"] = None
        results["hash_err"] = str(e)[:200]

    # --- c. live-row prefilter + sort ---
    t0 = time.time()

    def fp_counts(t: pa.Table) -> pa.Table:
        f = np.asarray(t["fp"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        d = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        # distinct (fp, doc) then count docs per fp — exact because each doc's
        # rows live entirely inside one block
        order = np.lexsort((d, f))
        f, d = f[order], d[order]
        keep = np.ones(len(f), dtype=bool)
        if len(f) > 1:
            keep[1:] = (f[1:] != f[:-1]) | (d[1:] != d[:-1])
        f = f[keep]
        first = np.ones(len(f), dtype=bool)
        if len(f) > 1:
            first[1:] = f[1:] != f[:-1]
        starts = np.nonzero(first)[0]
        # clamp BEFORE the uint8 cast: a count that is a multiple of 256
        # would wrap to 0 and misclassify a hot fingerprint as dead
        cnt = np.minimum(np.diff(np.append(starts, len(f))), 2).astype(np.uint8)
        return pa.table({"fp": pa.array(f[starts], pa.uint64()),
                         "cnt": pa.array(cnt, pa.uint8())})

    def dup_fp_shard(g: dict) -> dict:
        f = np.asarray(g["fp"], dtype=np.uint64)
        c = np.asarray(g["cnt"], dtype=np.int64)
        order = np.argsort(f, kind="stable")
        f, c = f[order], c[order]
        first = np.ones(len(f), dtype=bool)
        if len(f) > 1:
            first[1:] = f[1:] != f[:-1]
        starts = np.nonzero(first)[0]
        tot = np.add.reduceat(c, starts) if len(starts) else np.empty(0, np.int64)
        return {"fp": f[starts][tot >= 2]}

    partials = fps.map_batches(fp_counts, batch_format="pyarrow", zero_copy_batch=True)
    dup_ds = sharded_group_map(partials, ["fp"], dup_fp_shard, num_shards=cfg.group_shards)
    dup_parts = [
        np.asarray(t["fp"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        for t in ray.get(dup_ds.to_arrow_refs()) if t.num_rows and "fp" in t.schema.names
    ]
    dup_arr = np.sort(np.concatenate(dup_parts)) if dup_parts else np.empty(0, np.uint64)
    dup_ref = ray.put(dup_arr)
    t_pre = round(time.time() - t0, 2)

    def live_filter(t: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        f = np.asarray(t["fp"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        if not len(dups):
            return t.slice(0, 0)
        idx = np.minimum(np.searchsorted(dups, f), len(dups) - 1)
        return t.filter(pa.array(dups[idx] == f))

    live = fps.map_batches(live_filter, batch_format="pyarrow", zero_copy_batch=True)
    t1 = time.time()
    live_mat = live.materialize()
    n_live = live_mat.count()
    out_c = sharded_group_map(live_mat, ["fp"], emit, num_shards=cfg.group_shards).materialize()
    results["live_prepass_sec"] = t_pre
    results["live_rows"] = n_live
    results["dup_fps"] = int(len(dup_arr))
    results["live_sort_sec"] = round(time.time() - t1, 2)
    results["live_total_sec"] = round(t_pre + time.time() - t1, 2)
    results["live_pair_rows"] = out_c.count()

    # --- d. live + hash ---
    t0 = time.time()
    try:
        out_d = run_hash(live_mat)
        results["live_hash_sec"] = round(t_pre + time.time() - t0, 2)
        results["live_hash_pair_rows"] = out_d.count()
    except Exception as e:  # noqa: BLE001
        results["live_hash_sec"] = None
        results["live_hash_err"] = str(e)[:200]

    print(json.dumps(results))
    ray.shutdown()


if __name__ == "__main__":
    main()

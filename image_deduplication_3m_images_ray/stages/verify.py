"""Verification stage: candidate pairs -> verified pairs (exact evidence only).

Reference analog: the staged verification funnel — cheap color gate
(/root/reference/modules/deduplication.py:711-801) then cosine refinement
(:1219-1283) then local-descriptor matching (:1460-1532).  Per the north rule
the confirm step here is *exact*: token-shingle Jaccard for LSH candidates and
measured common-substring length (seed-and-extend at the shared winnowing
fingerprint positions) for substring candidates.  The SimHash-Hamming +
length-ratio gates are provably lossless for pairs above the Jaccard
threshold (J >= t implies |A|/|B| >= t), so they only skip work, never recall.

Pair -> signature attachment is a hash-partitioned join (``Dataset.join``,
SURVEY.md §2.4 J1) done once per side; both sides are large at 10^12-doc
scale so a broadcast is not an option.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import hamming64
from ..functions.text import pairwise_jaccard_batch
from ..util import rename_columns as _rename


def extend_match(ba: bytes, bb: bytes, pos_a: int, pos_b: int, k: int, chunk: int = 128) -> int:
    """Length of the maximal common run around a shared k-gram seed, in bytes.

    Returns 0 if the seed k-grams differ (fingerprint hash collision).
    Slice-compare in ``chunk``-byte steps to avoid per-byte Python cost.
    """
    if ba[pos_a : pos_a + k] != bb[pos_b : pos_b + k]:
        return 0
    i, j = pos_a + k, pos_b + k
    while i < len(ba) and j < len(bb):
        step = min(chunk, len(ba) - i, len(bb) - j)
        if ba[i : i + step] == bb[j : j + step]:
            i += step
            j += step
            continue
        while i < len(ba) and j < len(bb) and ba[i] == bb[j]:
            i += 1
            j += 1
        break
    lo_a, lo_b = pos_a, pos_b
    while lo_a > 0 and lo_b > 0:
        step = min(chunk, lo_a, lo_b)
        if ba[lo_a - step : lo_a] == bb[lo_b - step : lo_b]:
            lo_a -= step
            lo_b -= step
            continue
        while lo_a > 0 and lo_b > 0 and ba[lo_a - 1] == bb[lo_b - 1]:
            lo_a -= 1
            lo_b -= 1
        break
    return i - lo_a


def _verify_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    n = len(batch)
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.uint64()),
            "doc_b": pa.array([], pa.uint64()),
            "jaccard": pa.array([], pa.float64()),
            "simhash_hamming": pa.array([], pa.int32()),
            "match_len": pa.array([], pa.int64()),
            "origin": pa.array([], pa.string()),
        }
    )
    if n == 0:
        return empty
    origin = np.asarray(batch["origin"].to_pylist(), dtype=object)
    is_lsh = origin == "lsh"
    sim_a = np.asarray(batch["simhash_a"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    sim_b = np.asarray(batch["simhash_b"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    ns_a = np.asarray(batch["n_shingles_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ns_b = np.asarray(batch["n_shingles_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ham = hamming64(sim_a, sim_b)
    ratio = np.minimum(ns_a, ns_b) / np.maximum(np.maximum(ns_a, ns_b), 1)
    gate_ok = (ham <= cfg.simhash_hamming_max) & (ratio >= cfg.length_ratio_min)
    # candidates to score: lsh pairs passing gates + every winnow pair
    todo = np.nonzero((is_lsh & gate_ok) | ~is_lsh)[0]
    if len(todo) == 0:
        return empty

    ta = batch["text_a"].take(pa.array(todo))
    tb = batch["text_b"].take(pa.array(todo))
    jacc = pairwise_jaccard_batch(ta, tb, cfg.shingle_k)

    match_len = np.zeros(len(todo), dtype=np.int64)
    win_rows = np.nonzero(~is_lsh[todo])[0]
    if len(win_rows):
        pos_a = np.asarray(batch["pos_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
        pos_b = np.asarray(batch["pos_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
        ta_list = ta.to_pylist()
        tb_list = tb.to_pylist()
        for r in win_rows:
            src = todo[r]
            match_len[r] = extend_match(
                ta_list[r].encode("utf-8"),
                tb_list[r].encode("utf-8"),
                int(pos_a[src]),
                int(pos_b[src]),
                cfg.winnow_kgram,
            )
    keep_local = (jacc >= cfg.jaccard_threshold) | (match_len >= cfg.min_substring_len)
    kept = todo[keep_local]
    if len(kept) == 0:
        return empty
    return pa.table(
        {
            "doc_a": batch["doc_a"].take(pa.array(kept)),
            "doc_b": batch["doc_b"].take(pa.array(kept)),
            "jaccard": pa.array(jacc[keep_local], pa.float64()),
            "simhash_hamming": pa.array(ham[kept].astype(np.int32), pa.int32()),
            "match_len": pa.array(match_len[keep_local], pa.int64()),
            "origin": pa.array(origin[kept], pa.string()),
        }
    )


def _combine_pair(group: dict) -> dict:
    jacc = np.asarray(group["jaccard"], dtype=np.float64)
    return {
        "doc_a": np.asarray(group["doc_a"], dtype=np.uint64)[:1],
        "doc_b": np.asarray(group["doc_b"], dtype=np.uint64)[:1],
        "jaccard": jacc.max(keepdims=True),
        "simhash_hamming": np.asarray(group["simhash_hamming"], dtype=np.int32).min(keepdims=True),
        "match_len": np.asarray(group["match_len"], dtype=np.int64).max(keepdims=True),
        "origin": np.asarray(
            ["+".join(sorted(set(np.asarray(group["origin"], dtype=object))))], dtype=object
        ),
    }


def verify_stage(candidates: Dataset, profile: Dataset, cfg: DedupConfig) -> Dataset:
    """candidate_pairs x profile -> verified_pairs (distinct on doc_a, doc_b)."""
    cols = profile.select_columns(["doc_id", "simhash", "n_shingles", "norm_text"])
    prof_a = _rename(
        cols,
        {"doc_id": "doc_a", "simhash": "simhash_a", "n_shingles": "n_shingles_a", "norm_text": "text_a"},
    )
    prof_b = _rename(
        cols,
        {"doc_id": "doc_b", "simhash": "simhash_b", "n_shingles": "n_shingles_b", "norm_text": "text_b"},
    )
    j = candidates.join(
        prof_a, join_type="inner", num_partitions=cfg.join_num_buckets, on=("doc_a",)
    )
    j = j.join(prof_b, join_type="inner", num_partitions=cfg.join_num_buckets, on=("doc_b",))
    verified = j.map_batches(
        _verify_batch,
        fn_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    return verified.groupby(["doc_a", "doc_b"]).map_groups(_combine_pair, batch_format="numpy")

"""Verification stage: candidate pairs -> verified pairs (exact evidence only).

Reference analog: the staged verification funnel — cheap color gate
(/root/reference/modules/deduplication.py:711-801) then cosine refinement
(:1219-1283) then local-descriptor matching (:1460-1532).  Per the north rule
the confirm step here is *exact*: token-shingle Jaccard for LSH candidates and
measured common-substring length (seed-and-extend at the shared winnowing
fingerprint positions) for substring candidates.  The SimHash-Hamming +
length-ratio gates are provably lossless for pairs above the Jaccard
threshold (J >= t implies |A|/|B| >= t), so they only skip work, never recall.

Two join paths, each shipping only what it needs (pair -> signature
attachment is a hash-partitioned ``Dataset.join``, SURVEY.md §2.4 J1; both
sides are large at 10^12-doc scale so broadcast is not an option):
- LSH candidates join the precomputed sorted-unique SHINGLE SETS — Jaccard is
  a segmented set intersection, no re-tokenization of text;
- winnow candidates join the normalized TEXT — seed-and-extend needs bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import hamming64
from ..functions.text import pairwise_jaccard_from_sets
from ..util import rename_columns as _rename
from ..util import shard_attach, sharded_group_map

_OUT_SCHEMA = pa.schema(
    [
        ("doc_a", pa.uint64()),
        ("doc_b", pa.uint64()),
        ("jaccard", pa.float64()),
        ("simhash_hamming", pa.int32()),
        ("match_len", pa.int64()),
        ("origin", pa.string()),
    ]
)
_EMPTY = pa.table({f.name: pa.array([], f.type) for f in _OUT_SCHEMA})


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


def _shingle_col_to_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """Binary shingle-set column (raw uint64 bytes) -> (flat values, int64 offsets).

    Zero-copy: reads the Arrow binary array's value/offset buffers directly.
    Element byte-lengths are multiples of 8 by construction, so the uint64
    reinterpretation stays aligned.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    byte_offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + len(col) + 1
    ].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    seg = data[byte_offs[0] : byte_offs[-1]]
    try:
        values = seg.view(np.uint64)
    except ValueError:  # unaligned slice — copy
        values = np.frombuffer(seg.tobytes(), dtype=np.uint64)
    return values, (byte_offs - byte_offs[0]) // 8


def _verify_lsh_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    n = len(batch)
    if n == 0:
        return _EMPTY
    sim_a = np.asarray(batch["simhash_a"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    sim_b = np.asarray(batch["simhash_b"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    ns_a = np.asarray(batch["n_shingles_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ns_b = np.asarray(batch["n_shingles_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ham = hamming64(sim_a, sim_b)
    ratio = np.minimum(ns_a, ns_b) / np.maximum(np.maximum(ns_a, ns_b), 1)
    gate_ok = (ham <= cfg.simhash_hamming_max) & (ratio >= cfg.length_ratio_min)
    todo = np.nonzero(gate_ok)[0]
    if len(todo) == 0:
        return _EMPTY
    sel = pa.array(todo)
    ua, uoff_a = _shingle_col_to_flat(batch["sh_a"].take(sel))
    ub, uoff_b = _shingle_col_to_flat(batch["sh_b"].take(sel))
    jacc = pairwise_jaccard_from_sets(ua, uoff_a, ub, uoff_b)
    keep_local = jacc >= cfg.jaccard_threshold
    kept = todo[keep_local]
    if len(kept) == 0:
        return _EMPTY
    return pa.table(
        {
            "doc_a": batch["doc_a"].take(pa.array(kept)).cast(pa.uint64()),
            "doc_b": batch["doc_b"].take(pa.array(kept)).cast(pa.uint64()),
            "jaccard": pa.array(jacc[keep_local], pa.float64()),
            "simhash_hamming": pa.array(ham[kept].astype(np.int32), pa.int32()),
            "match_len": pa.array(np.zeros(len(kept), dtype=np.int64), pa.int64()),
            "origin": pa.array(["lsh"] * len(kept), pa.string()),
        }
    )


def _verify_winnow_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    n = len(batch)
    if n == 0:
        return _EMPTY
    pos_a = np.asarray(batch["pos_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
    pos_b = np.asarray(batch["pos_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ta = batch["text_a"].to_pylist()
    tb = batch["text_b"].to_pylist()
    match_len = np.zeros(n, dtype=np.int64)
    for i in range(n):
        match_len[i] = extend_match(
            ta[i].encode("utf-8"),
            tb[i].encode("utf-8"),
            int(pos_a[i]),
            int(pos_b[i]),
            cfg.winnow_kgram,
        )
    keep = match_len >= cfg.min_substring_len
    if not keep.any():
        return _EMPTY
    sel = pa.array(np.nonzero(keep)[0])
    nk = int(keep.sum())
    return pa.table(
        {
            "doc_a": batch["doc_a"].take(sel).cast(pa.uint64()),
            "doc_b": batch["doc_b"].take(sel).cast(pa.uint64()),
            "jaccard": pa.array(np.zeros(nk), pa.float64()),
            "simhash_hamming": pa.array(np.full(nk, 64, dtype=np.int32), pa.int32()),
            "match_len": pa.array(match_len[keep], pa.int64()),
            "origin": pa.array(["winnow"] * nk, pa.string()),
        }
    )


def _combine_shard_pairs(group: dict) -> dict:
    """Per-shard vectorized combine: one output row per distinct (doc_a, doc_b),
    keeping max jaccard / max match_len / min hamming and the merged origin."""
    a = np.asarray(group["doc_a"], dtype=np.uint64)
    b = np.asarray(group["doc_b"], dtype=np.uint64)
    jacc = np.asarray(group["jaccard"], dtype=np.float64)
    ham = np.asarray(group["simhash_hamming"], dtype=np.int32)
    mlen = np.asarray(group["match_len"], dtype=np.int64)
    origin = np.asarray(group["origin"], dtype=object)
    order = np.lexsort((b, a))
    a, b, jacc, ham, mlen, origin = (
        a[order], b[order], jacc[order], ham[order], mlen[order], origin[order]
    )
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(first)[0]
    is_lsh = (origin == "lsh").astype(np.int64)
    is_win = (origin == "winnow").astype(np.int64)
    has_lsh = np.maximum.reduceat(is_lsh, starts) > 0
    has_win = np.maximum.reduceat(is_win, starts) > 0
    names = np.where(
        has_lsh & has_win, "lsh+winnow", np.where(has_lsh, "lsh", "winnow")
    ).astype(object)
    return {
        "doc_a": a[starts],
        "doc_b": b[starts],
        "jaccard": np.maximum.reduceat(jacc, starts),
        "simhash_hamming": np.minimum.reduceat(ham, starts),
        "match_len": np.maximum.reduceat(mlen, starts),
        "origin": names,
    }


def _filter_origin(ds: Dataset, origin: str, cols: list) -> Dataset:
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t["origin"], origin)).select(cols),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def verify_stage(candidates: Dataset, profile: Dataset, cfg: DedupConfig) -> Dataset:
    """candidate_pairs x profile -> verified_pairs (distinct on doc_a, doc_b)."""
    # --- LSH path: join shingle sets, gate, exact Jaccard ---
    sig = profile.select_columns(["doc_id", "simhash", "n_shingles", "shingles"])
    sig_a = _rename(
        sig,
        {"doc_id": "doc_a", "simhash": "simhash_a", "n_shingles": "n_shingles_a", "shingles": "sh_a"},
    )
    sig_b = _rename(
        sig,
        {"doc_id": "doc_b", "simhash": "simhash_b", "n_shingles": "n_shingles_b", "shingles": "sh_b"},
    )
    lsh_cand = _filter_origin(candidates, "lsh", ["doc_a", "doc_b"])
    lsh_j = shard_attach(
        lsh_cand,
        sig_a,
        key="doc_a",
        payload={"simhash_a": "simhash_a", "n_shingles_a": "n_shingles_a", "sh_a": "sh_a"},
        num_shards=cfg.group_shards,
    )
    lsh_j = shard_attach(
        lsh_j,
        sig_b,
        key="doc_b",
        payload={"simhash_b": "simhash_b", "n_shingles_b": "n_shingles_b", "sh_b": "sh_b"},
        num_shards=cfg.group_shards,
    )
    lsh_ver = lsh_j.map_batches(
        _verify_lsh_batch,
        fn_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )

    # --- winnow path: join texts, seed-and-extend at fingerprint positions ---
    txt = profile.select_columns(["doc_id", "norm_text"])
    txt_a = _rename(txt, {"doc_id": "doc_a", "norm_text": "text_a"})
    txt_b = _rename(txt, {"doc_id": "doc_b", "norm_text": "text_b"})
    win_cand = _filter_origin(candidates, "winnow", ["doc_a", "doc_b", "pos_a", "pos_b"])
    win_j = shard_attach(
        win_cand, txt_a, key="doc_a", payload={"text_a": "text_a"}, num_shards=cfg.group_shards
    )
    win_j = shard_attach(
        win_j, txt_b, key="doc_b", payload={"text_b": "text_b"}, num_shards=cfg.group_shards
    )
    win_ver = win_j.map_batches(
        _verify_winnow_batch,
        fn_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )

    return sharded_group_map(
        lsh_ver.union(win_ver),
        ["doc_a", "doc_b"],
        _combine_shard_pairs,
        num_shards=cfg.group_shards,
    )

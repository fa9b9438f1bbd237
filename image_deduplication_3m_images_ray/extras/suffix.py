"""Partition-local suffix-array pass for exact substring duplicates.

The alternative design from SURVEY.md §7.2 step 7 (the primary engine uses the
global winnowing pass in ``stages.winnow``): within each batch/partition,
build a suffix ordering over the concatenated docs and emit pairs of docs
sharing a common substring >= L chars.  Partition-local BY DESIGN (the north
rule's stated assumption): pairs across partitions are not found by this
operator — co-partition related docs (e.g. by host) upstream, or rely on the
winnowing pass for global coverage.

Correctness argument: sort all suffixes (by a 4L/ mapped key of their first
``key_bytes`` bytes); any two suffixes sharing a >= L-byte prefix are
adjacent-or-connected in sorted order (every suffix between them shares the
same prefix), so scanning ADJACENT pairs with common-prefix >= L and unioning
transitively finds every such doc pair.  key_bytes >= L keeps the scan exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.text import normalize_array


def _common_prefix_len(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    lo = 0
    while lo < n and a[lo] == b[lo]:
        lo += 1
    return lo


def suffix_pairs_in_batch(texts: list, doc_ids: np.ndarray, min_len: int) -> set:
    """Exact doc pairs sharing a substring >= min_len chars, within one batch."""
    datas = [t.encode("utf-8") for t in texts]
    starts, owners = [], []
    for i, d in enumerate(datas):
        if len(d) >= min_len:
            n_suf = len(d) - min_len + 1
            starts.append(np.arange(n_suf, dtype=np.int64))
            owners.append(np.full(n_suf, i, dtype=np.int64))
    if not starts:
        return set()
    starts = np.concatenate(starts)
    owners = np.concatenate(owners)
    # sort suffixes by their first min_len bytes via fixed-width void view
    keys = np.zeros((len(starts), min_len), dtype=np.uint8)
    for row, (o, s) in enumerate(zip(owners, starts)):
        seg = datas[o][s : s + min_len]
        keys[row, : len(seg)] = np.frombuffer(seg, dtype=np.uint8)
    order = np.lexsort(keys.T[::-1])
    k_sorted = keys[order]
    o_sorted = owners[order]
    pairs = set()
    # adjacent suffixes with identical min_len-byte key and different docs
    same = (k_sorted[1:] == k_sorted[:-1]).all(axis=1)
    for idx in np.nonzero(same)[0]:
        a, b = int(o_sorted[idx]), int(o_sorted[idx + 1])
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    # transitive closure through runs of identical keys with >2 suffixes is
    # covered because every member of a run is adjacent to the next
    out = set()
    for a, b in pairs:
        out.add((int(doc_ids[a]), int(doc_ids[b])) if doc_ids[a] < doc_ids[b] else (int(doc_ids[b]), int(doc_ids[a])))
    return out


def suffix_array_pairs_stage(
    docs: Dataset, cfg: DedupConfig, batch_size: int = 256
) -> Dataset:
    """(doc_id, text) -> partition-local substring-dup pairs (doc_a, doc_b, origin).

    ``batch_size`` bounds the per-task suffix table: batch_size x avg_len
    suffixes x min_substring_len bytes of key material (SURVEY.md §7.4
    "suffix-array memory" cap).
    """

    def fn(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        texts = normalize_array(t["text"]).to_pylist()
        pairs = sorted(suffix_pairs_in_batch(texts, ids, cfg.min_substring_len))
        return pa.table(
            {
                "doc_a": pa.array([p[0] for p in pairs], pa.uint64()),
                "doc_b": pa.array([p[1] for p in pairs], pa.uint64()),
                "origin": pa.array(["suffix"] * len(pairs), pa.string()),
            }
        )

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

"""Partition-local substring-duplicate pass (the suffix-ordering alternative).

The alternative design from SURVEY.md §7.2 step 7 (the primary engine uses the
global winnowing pass in ``stages.winnow``): within each batch/partition,
find every pair of docs sharing an identical ``min_substring_len``-CHARACTER
window of normalized text.  The unit is explicitly CODEPOINTS, matching the
SQL oracle's ``substr``/``length`` semantics on any unicode text (round-2
ADVICE item 2 — the old byte windows were a weaker criterion on non-ASCII
text).  Partition-local BY DESIGN (the north rule's stated assumption):
pairs across partitions are not found by this operator — co-partition
related docs (e.g. by host) upstream, or rely on the winnowing pass for
global coverage.

Contract (SQL-checkable): emit every (doc_a < doc_b) pair whose normalized
texts share at least one identical length-L character substring — exactly
the DuckDB self-join of the distinct L-gram sets.  Implementation is a
rolling-hash suffix grouping over uint32 codepoint arrays, NOT a byte
matrix: every L-codepoint window is hashed in one vectorized pass (~8 bytes
of state per window vs the L-symbol key rows of the naive suffix sort),
windows are grouped by hash, and groups are verified codepoint-exactly
before emitting pairs, so a 64-bit hash collision can never produce a false
pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import U64, _char_kgram_hashes
from ..functions.text import normalize_array


def suffix_pairs_in_batch(texts: list, doc_ids: np.ndarray, min_len: int) -> set:
    """Exact doc pairs sharing a >= min_len-CHARACTER substring, within one batch.

    Hash every L-codepoint window of every doc (vectorized rolling hash over
    the uint32 codepoint array — UTF-32LE view of the text), sort the flat
    (hash, doc, start) stream once, then walk equal-hash runs: within a run,
    windows are compared codepoint-exactly (collision guard) and every
    distinct doc pair sharing identical codepoints is emitted.
    """
    datas = [
        np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) for t in texts
    ]
    hash_parts, owner_parts, start_parts = [], [], []
    for i, d in enumerate(datas):
        h = _char_kgram_hashes(d, min_len)
        if len(h):
            hash_parts.append(h)
            owner_parts.append(np.full(len(h), i, dtype=np.int64))
            start_parts.append(np.arange(len(h), dtype=np.int64))
    if not hash_parts:
        return set()
    hashes = np.concatenate(hash_parts)
    owners = np.concatenate(owner_parts)
    starts = np.concatenate(start_parts)
    order = np.lexsort((starts, owners, hashes))
    hashes, owners, starts = hashes[order], owners[order], starts[order]
    run_first = np.ones(len(hashes), dtype=bool)
    run_first[1:] = hashes[1:] != hashes[:-1]
    run_starts = np.nonzero(run_first)[0]
    run_ends = np.append(run_starts[1:], len(hashes))
    pairs: set = set()
    for lo, hi in zip(run_starts, run_ends):
        if hi - lo < 2 or owners[lo] == owners[hi - 1]:
            continue  # single window or all windows from one doc
        # verify codepoints within the run; group identical windows -> doc sets
        by_bytes: dict = {}
        for idx in range(lo, hi):
            o = int(owners[idx])
            s = int(starts[idx])
            by_bytes.setdefault(datas[o][s : s + min_len].tobytes(), set()).add(o)
        for docs in by_bytes.values():
            if len(docs) > 1:
                ds = sorted(docs)
                for ai in range(len(ds)):
                    for bi in range(ai + 1, len(ds)):
                        pairs.add((ds[ai], ds[bi]))
    out = set()
    for a, b in pairs:
        da, db = int(doc_ids[a]), int(doc_ids[b])
        out.add((da, db) if da < db else (db, da))
    return out


def suffix_array_pairs_stage(
    docs: Dataset, cfg: DedupConfig, batch_size: int = 256
) -> Dataset:
    """(doc_id, text) -> partition-local substring-dup pairs (doc_a, doc_b, origin).

    ``batch_size`` bounds the per-task window table: batch_size x avg_len
    windows x ~24 bytes of (hash, owner, start) state (SURVEY.md §7.4
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

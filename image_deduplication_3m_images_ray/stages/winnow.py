"""Winnowing fingerprint pass: exact-substring duplicate candidates.

Reference analog role: Stage 4 local-descriptor verification — the most precise,
most expensive matcher (/root/reference/modules/deduplication.py:1285-1351,
keypoint matching :1460-1532).  For webtext the precise matcher is *exact
common substrings*: two docs sharing any substring of >= ``min_substring_len``
chars are duplicates regardless of their Jaccard (e.g. one page embedded inside
a longer one — FIXTURES.md `substring_dup`).

Mechanism (Schleimer, Wilkerson & Aiken, SIGMOD'03 winnowing): every doc emits
a sparse, deterministic set of (k-gram hash, byte position) fingerprints with
the guarantee that any common substring of length >= k + w - 1 =
``min_substring_len`` BYTES yields at least one *shared* fingerprint hash —
recall-safe for the >= L CHARACTER contract since L chars span >= L bytes.  A
groupby on the fingerprint hash then surfaces candidate doc pairs together
with the byte positions where the shared k-gram occurs; the verify stage
seed-extends at those positions and measures the true match length in
complete codepoints (char-unit precision).

Unlike a partition-local suffix-array pass (SURVEY.md §7.2 step 7), this
formulation is *global* — substring pairs are found across partition
boundaries — while still being one map + one groupby.  A partition-local
suffix-array operator is provided separately in ``extras.suffix`` for parity
with the survey's alternative design.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import winnow_fingerprints
from ..util import segment_bounds, sharded_group_map
from .verify import ORIGIN_WINNOW


def _fingerprint_batch(batch: pa.Table, k: int, w: int) -> pa.Table:
    doc_ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    texts = batch["norm_text"].to_pylist()
    fp_parts, pos_parts, id_parts = [], [], []
    for i, text in enumerate(texts):
        fps, poss = winnow_fingerprints(text, k, w)
        if len(fps):
            fp_parts.append(fps)
            pos_parts.append(poss)
            id_parts.append(np.full(len(fps), doc_ids[i], dtype=np.uint64))
    if not fp_parts:
        return pa.table(
            {
                "fp": pa.array([], pa.uint64()),
                "doc_id": pa.array([], pa.uint64()),
                "pos": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "fp": pa.array(np.concatenate(fp_parts), pa.uint64()),
            "doc_id": pa.array(np.concatenate(id_parts), pa.uint64()),
            "pos": pa.array(np.concatenate(pos_parts), pa.int64()),
        }
    )


def fingerprint_stage(profile: Dataset, cfg: DedupConfig) -> Dataset:
    """profile -> fingerprints(fp, doc_id, pos)."""
    return profile.select_columns(["doc_id", "norm_text"]).map_batches(
        _fingerprint_batch,
        fn_args=(cfg.winnow_kgram, cfg.winnow_window),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )


def _emit_bucket_pairs(doc: np.ndarray, pos: np.ndarray, cap: int):
    """Candidate (doc_a, doc_b, pos_a, pos_b) for ONE fingerprint bucket.

    Docs sharing this fingerprint hash share (w.h.p.) a k-gram at the recorded
    positions.  Hot fingerprints (site boilerplate) are capped star-wise: each
    doc pairs with the bucket's min-doc occurrence only, which keeps emission
    linear while preserving bucket connectivity; correctness is restored by
    the verify stage measuring the true match length at the positions.
    """
    if len(doc) * (len(doc) - 1) // 2 > cap:
        # hot fingerprint: collapse to one occurrence per doc (min position);
        # (doc, pos) arrive lexsorted so the first row per doc is min-pos
        keep = np.ones(len(doc), dtype=bool)
        keep[1:] = doc[1:] != doc[:-1]
        doc, pos = doc[keep], pos[keep]
    n = len(doc)
    if n < 2:
        return None
    if n * (n - 1) // 2 <= cap:
        ia, ib = np.triu_indices(n, k=1)
        mask = doc[ia] != doc[ib]  # drop same-doc occurrence pairs
        ia, ib = ia[mask], ib[mask]
    else:  # star around the first (min doc_id) occurrence
        ia = np.zeros(n - 1, dtype=np.int64)
        ib = np.arange(1, n, dtype=np.int64)
    return doc[ia], doc[ib], pos[ia], pos[ib]


def _emit_shard_fp_pairs(group: dict, cap: int) -> dict:
    fp = np.asarray(group["fp"], dtype=np.uint64)
    doc = np.asarray(group["doc_id"], dtype=np.uint64)
    pos = np.asarray(group["pos"], dtype=np.int64)
    order = np.lexsort((pos, doc, fp))
    fp, doc, pos = fp[order], doc[order], pos[order]
    bounds = segment_bounds(fp)
    counts = np.diff(bounds)
    a_p, b_p, pa_p, pb_p = [], [], [], []
    for m in np.nonzero(counts >= 2)[0]:
        lo, hi = bounds[m], bounds[m + 1]
        out = _emit_bucket_pairs(doc[lo:hi], pos[lo:hi], cap)
        if out is not None:
            a_p.append(out[0])
            b_p.append(out[1])
            pa_p.append(out[2])
            pb_p.append(out[3])
    if not a_p:
        return {
            "doc_a": np.empty(0, dtype=np.uint64),
            "doc_b": np.empty(0, dtype=np.uint64),
            "origin": np.empty(0, dtype=np.int8),
            "pos_a": np.empty(0, dtype=np.int64),
            "pos_b": np.empty(0, dtype=np.int64),
        }
    a = np.concatenate(a_p)
    return {
        "doc_a": a,
        "doc_b": np.concatenate(b_p),
        "origin": np.full(len(a), ORIGIN_WINNOW, dtype=np.int8),
        "pos_a": np.concatenate(pa_p),
        "pos_b": np.concatenate(pb_p),
    }


def winnow_pairs_stage(fingerprints: Dataset, cfg: DedupConfig) -> Dataset:
    """fingerprints -> candidate_pairs(doc_a<doc_b, origin='winnow', pos_a, pos_b).

    NOT deduped on (doc_a, doc_b): a pair may surface at several shared
    fingerprints and the verify stage needs each position as an extension seed
    (keeping only one could pick a seed outside the long shared run).  The
    verify stage dedups after measuring match lengths.
    """
    return sharded_group_map(
        fingerprints,
        ["fp"],
        lambda g: _emit_shard_fp_pairs(g, cfg.bucket_pair_cap),
        num_shards=cfg.group_shards,
    )

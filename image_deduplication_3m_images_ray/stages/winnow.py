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
from ..functions.bloom import BloomFilter, SortedIdSet, build_bloom_distributed
from ..functions.hashing import winnow_fingerprints_bytes
from ..functions.text import flat_utf8_view
from ..util import segment_bounds, sharded_group_map
from .verify import ORIGIN_WINNOW


def _fingerprint_batch(batch: pa.Table, k: int, w: int) -> pa.Table:
    doc_ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    # zero-copy per-doc uint8 views of the Arrow string buffer — no str
    # decode/encode round-trip (the hash kernel consumes raw UTF-8 bytes)
    offs, data = flat_utf8_view(batch["norm_text"])
    fp_parts, pos_parts, id_parts = [], [], []
    for i in range(len(offs) - 1):
        fps, poss = winnow_fingerprints_bytes(data[offs[i] : offs[i + 1]], k, w)
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


def _fp_doc_counts(t: pa.Table) -> pa.Table:
    """Per-block (fp, min(distinct_docs, 2)) partials for the dup-fp pre-pass.

    Exact within the block because every doc's fingerprint rows are emitted
    by ONE :func:`_fingerprint_batch` call (a doc never spans blocks at the
    fingerprint level).  If a later repartition ever did split a doc's rows
    across blocks the count could only OVER-estimate (the doc counted once
    per block) — marking extra fps live, never dropping one.
    """
    f = np.asarray(t["fp"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    d = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    order = np.lexsort((d, f))
    f, d = f[order], d[order]
    keep = np.ones(len(f), dtype=bool)  # distinct (fp, doc)
    if len(f) > 1:
        keep[1:] = (f[1:] != f[:-1]) | (d[1:] != d[:-1])
    f = f[keep]
    first = np.ones(len(f), dtype=bool)
    if len(f) > 1:
        first[1:] = f[1:] != f[:-1]
    starts = np.nonzero(first)[0]
    cnt = np.diff(np.append(starts, len(f)))
    return pa.table(
        {
            "fp": pa.array(f[starts], pa.uint64()),
            "cnt": pa.array(np.minimum(cnt, 2).astype(np.uint8), pa.uint8()),
        }
    )


def _sum_dup_fps_shard(g: dict) -> dict:
    """Per-shard: sum the per-block doc counts, keep fps seen in >= 2 docs."""
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


def dup_fingerprint_stage(fingerprints: Dataset, cfg: DedupConfig) -> Dataset:
    """fingerprints -> (fp) rows for every fingerprint borne by >= 2 docs.

    The pre-pass exchange ships 9-byte (fp, cnt) rows — one per distinct
    (block, fp) — instead of the 24-byte full fingerprint rows, and its
    per-shard reduction is a pure segmented sum.
    """
    partials = fingerprints.map_batches(
        _fp_doc_counts, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    return sharded_group_map(partials, ["fp"], _sum_dup_fps_shard, num_shards=cfg.group_shards)


def _empty_pairs() -> Dataset:
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([], pa.uint64()),
                "doc_b": pa.array([], pa.uint64()),
                "origin": pa.array([], pa.int8()),
                "pos_a": pa.array([], pa.int64()),
                "pos_b": pa.array([], pa.int64()),
            }
        )
    )


def winnow_pairs_stage(fingerprints: Dataset, cfg: DedupConfig) -> Dataset:
    """fingerprints -> candidate_pairs(doc_a<doc_b, origin='winnow', pos_a, pos_b).

    NOT deduped on (doc_a, doc_b): a pair may surface at several shared
    fingerprints and the verify stage needs each position as an extension seed
    (keeping only one could pick a seed outside the long shared run).  The
    verify stage dedups after measuring match lengths.

    **Live-row prefilter** (``cfg.winnow_prefilter``, default OFF on
    re-measured evidence): ~80% of fingerprint rows are DEAD — fingerprints
    borne by exactly one doc, which can never emit a pair.  A cheap pre-pass
    (:func:`dup_fingerprint_stage`, 9-byte rows, segmented-sum reduction)
    finds the dup fps; the full 24-byte rows are then filtered map-side
    against a broadcast membership (exact :class:`SortedIdSet` up to
    ``winnow_dupfp_max_ids``, a distributed-built :class:`BloomFilter` above
    it whose false positives only ship dead rows — never drop a live one)
    before the pair-emission exchange sees them.

    Round-5 A/B (``tools/measure_prefilter_crossover.py``, 16 cpus, pair
    output identical in every run): the prefilter LOSES at every measurable
    size and the gap widens — 13.0M fp rows (100k pages) 2.5 s off vs 3.8 s
    on; 25.9M (200k) 4.6 vs 6.8; 51.9M (400k) 9.1 vs 14.8 (0.61-0.67x).
    Round 4's 10.6 s -> 6.4 s win predates the round-4 exchange work that
    made the unfiltered sort ~4x faster; the pre-pass's extra exchange +
    second fingerprint scan now cost more than the dead rows they remove.
    An auto-enable threshold was therefore REJECTED: no crossover exists in
    the measured range and the trend is monotonically against the prefilter.
    The flag stays for exchange-constrained deployments (e.g. slow network
    fabric where bytes, not sort latency, bind).
    """
    if not cfg.winnow_prefilter:
        return sharded_group_map(
            fingerprints,
            ["fp"],
            lambda g: _emit_shard_fp_pairs(g, cfg.bucket_pair_cap),
            num_shards=cfg.group_shards,
        )
    import ray

    # consumed twice (pre-pass + filtered exchange) — pin once
    fps = fingerprints.materialize()
    dup_ds = dup_fingerprint_stage(fps, cfg).materialize()
    n_dup = dup_ds.count()
    if n_dup == 0:
        return _empty_pairs()
    if n_dup <= cfg.winnow_dupfp_max_ids:
        parts = [
            np.asarray(t["fp"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            for t in ray.get(dup_ds.to_arrow_refs())
            if t.num_rows and "fp" in t.schema.names
        ]
        member = SortedIdSet(np.sort(np.concatenate(parts)) if parts else np.empty(0, np.uint64))
    elif cfg.attach_bloom_bits_per_id <= 0:
        # Bloom scale path disabled (same convention as the verify attach's
        # _side_memberships): above the exact bound there is no filter to
        # build — fall back to the unfiltered exchange rather than a
        # floor-size, near-saturated filter that drops nothing
        return sharded_group_map(
            fps,
            ["fp"],
            lambda g: _emit_shard_fp_pairs(g, cfg.bucket_pair_cap),
            num_shards=cfg.group_shards,
        )
    else:
        m_bits = BloomFilter.size_bits(
            n_dup, cfg.attach_bloom_bits_per_id, cfg.attach_bloom_max_bits
        )
        member = build_bloom_distributed(
            dup_ds,
            lambda t: np.asarray(t["fp"].to_numpy(zero_copy_only=False), dtype=np.uint64),
            m_bits,
            cfg.attach_bloom_hashes,
        )
    mem_ref = ray.put(member)

    def live_filter(t: pa.Table) -> pa.Table:
        m = ray.get(mem_ref)
        f = np.asarray(t["fp"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        return t.filter(pa.array(m.contains(f)))

    live = fps.map_batches(live_filter, batch_format="pyarrow", zero_copy_batch=True)
    return sharded_group_map(
        live,
        ["fp"],
        lambda g: _emit_shard_fp_pairs(g, cfg.bucket_pair_cap),
        num_shards=cfg.group_shards,
    )

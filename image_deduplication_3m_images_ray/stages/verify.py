"""Verification stage: candidate pairs -> verified pairs (exact evidence only).

Reference analog: the staged verification funnel — cheap color gate
(/root/reference/modules/deduplication.py:711-801) then cosine refinement
(:1219-1283) then local-descriptor matching (:1460-1532).  Per the north rule
the confirm step here is *exact*: token-shingle Jaccard for LSH candidates and
measured common-substring length (seed-and-extend at the shared winnowing
fingerprint positions) for substring candidates.  The SimHash-Hamming +
length-ratio gates are provably lossless for pairs above the Jaccard
threshold (J >= t implies |A|/|B| >= t), so they only skip work, never recall.

Physical plan — exactly TWO exchanges (three in rounds 1-3, seven in the
first design; each all-to-all costs 1-2 s of serial wall-time regardless of
CPU count, so exchange count is the scaling-efficiency budget):

1. **prepare** (key = doc_a): ONE tagged-union shard pass both
   *consolidates* the raw candidate stream (a true pair surfaces in many of
   the 32 LSH bands and at many shared fingerprints; it is distincted down
   to one LSH row plus <= ``max_seeds`` spread winnow seed rows per pair —
   doc_a co-locates every row of a pair, so per-(doc_a, doc_b) consolidation
   is shard-local) *and* attaches the a-side payload from the co-sharded
   profile rows: LSH rows pick up (simhash_a, n_shingles_a, the doc's
   pre-sorted unique shingle set — never the text), winnow rows a byte
   context window around their seed position (~50x less volume than full
   text for long docs).  Winnow star-hubs (a hot fingerprint's min-doc pairs
   with every other bearer) concentrate on doc_a — here that only means one
   shard runs a bigger numpy consolidation, not a bigger Python verify loop.
2. **verify** (key = doc_b): the prepared rows meet the b-side profile rows
   (text ships once per distinct winnow doc_b, shingle sets once per LSH
   doc_b).  Gates + exact Jaccard (a searchsorted merge of the two
   pre-sorted shingle sets — no tokenization, no re-sort) run for LSH rows,
   seed-extend for winnow rows (skipped when the pair already confirmed via
   Jaccard — a free local check: every row of a pair shares doc_b, so the
   whole pair is shard-local again), and the distinct verified pair set is
   emitted.  Winnow star spokes have DISTINCT doc_b values, so the Python
   seed-extend work of a hub spreads across shards.

Each exchange ships a profile row's heavy columns at most once per distinct
doc id on its own side (a broadcast semi-join — exact id set below
``attach_semijoin_max_ids``, distributed Bloom filter above it; false
positives only ship extra rows, never drop one), and the pair stream rides
each exchange once (rounds 1-3 shipped TWO half-rows per pair through the
attach and both payloads per pair through the merge).

Origin codes on the wire are int8 (0 = lsh, 1 = winnow) to keep the shuffles
binary-dense; the output ``origin`` column is back to strings for report
parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.bloom import BloomFilter, SortedIdSet, build_bloom_distributed
from ..functions.hashing import _ranges, hamming64
from ..functions.text import pairwise_jaccard_from_sets  # noqa: F401  (re-export for tests)
from ..util import sharded_group_map

ORIGIN_LSH = 0
ORIGIN_WINNOW = 1
_SIDE_PROFILE = 2  # tag for profile rows in the attach unions

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


def _utf8_run_chars(data: bytes, lo: int, hi: int) -> int:
    """Complete codepoints fully inside ``data[lo:hi]`` (a UTF-8 byte run).

    Lead bytes are those with top bits != 10xxxxxx; a run starting
    mid-character contributes no lead byte for that character, and a
    trailing character whose encoded length overruns ``hi`` is excluded.
    """
    b = np.frombuffer(data, dtype=np.uint8)[lo:hi]
    lead = np.nonzero((b & 0xC0) != 0x80)[0]
    if not len(lead):
        return 0
    count = len(lead)
    c = int(b[lead[-1]])
    need = 1 if c < 0x80 else 2 if c < 0xE0 else 3 if c < 0xF0 else 4
    if int(lead[-1]) + need > len(b):
        count -= 1
    return count


def extend_match(ba: bytes, bb: bytes, pos_a: int, pos_b: int, k: int, chunk: int = 128) -> int:
    """CHARACTERS in the maximal common byte run around a shared k-gram seed.

    Extension is byte-wise (UTF-8 is self-synchronizing: identical byte runs
    in two valid UTF-8 texts have aligned character boundaries, so the
    common character substring is well-defined), then the run is measured in
    COMPLETE codepoints — the unit of the >= ``min_substring_len``-char
    contract and of the SQL oracle's substr/length (round-2 ADVICE item 2).
    On pure-ASCII text this equals the old byte length.  Returns 0 if the
    seed k-grams differ (fingerprint hash collision).  Slice-compare in
    ``chunk``-byte steps to avoid per-byte Python cost.
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
    return _utf8_run_chars(ba, lo_a, i)


def _consolidate_shard(group: dict, max_seeds: int = 4) -> dict:
    """One row set per distinct (doc_a, doc_b) before the expensive text attach.

    Keeps at most one LSH row plus up to ``max_seeds`` winnow seed rows per
    pair.  Near-dup clusters otherwise explode the winnow row count (every
    shared fingerprint emits a row — hundreds for lightly-edited copies), and
    each surviving row later ships document payload through the attach
    shuffle.  Seeds are SPREAD over the pair's matches: extension around any
    seed inside a >=L shared run passes, so a handful of spread seeds
    preserves the winnowing guarantee in all but adversarial multi-run
    layouts.  The LSH row is kept even when winnow seeds exist (and vice
    versa) — a containment pair can share a band yet fail Jaccard.

    Emits a per-pair ``seed`` index (-1 for the LSH row, 0..max_seeds-1 for
    winnow rows) so the verify stage can align the rows of each pair after
    the exchanges.  Idempotent: re-consolidating consolidated rows keeps
    them unchanged.
    """
    a = np.asarray(group["doc_a"], dtype=np.uint64)
    b = np.asarray(group["doc_b"], dtype=np.uint64)
    pos_a = np.asarray(group["pos_a"], dtype=np.int64)
    pos_b = np.asarray(group["pos_b"], dtype=np.int64)
    origin = np.asarray(group["origin"], dtype=np.int8)
    is_win = (origin == ORIGIN_WINNOW).astype(np.int8)
    order = np.lexsort((pos_a, is_win, b, a))
    a, b, pos_a, pos_b, origin, is_win = (
        a[order], b[order], pos_a[order], pos_b[order], origin[order], is_win[order]
    )
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(first)[0]
    ends = np.append(starts[1:], len(a))
    # LSH rows sort before winnow rows within a pair; a raw (non-deduped)
    # candidate stream can hold MANY lsh rows per pair — keep the first only
    n_lsh = (
        np.add.reduceat((1 - is_win).astype(np.int64), starts)
        if len(starts)
        else np.empty(0, np.int64)
    )
    has_lsh = is_win[starts] == 0
    keep_parts = [starts[has_lsh]]
    w_starts = starts + n_lsh.astype(np.int64)
    w_lens = ends - w_starts
    nonempty = w_lens > 0
    w_starts, w_lens = w_starts[nonempty], w_lens[nonempty]
    small = w_lens <= max_seeds
    if small.any():
        s, ln = w_starts[small], w_lens[small]
        keep_parts.append(np.repeat(s, ln) + _ranges(ln))
    for s, ln in zip(w_starts[~small], w_lens[~small]):
        sel = s + np.unique((np.arange(max_seeds) * (ln - 1)) // (max_seeds - 1))
        keep_parts.append(sel)
    keep = np.sort(np.concatenate(keep_parts)) if keep_parts else np.empty(0, np.int64)
    ka, kb, kw = a[keep], b[keep], is_win[keep]
    kfirst = np.ones(len(ka), dtype=bool)
    if len(ka) > 1:
        kfirst[1:] = (ka[1:] != ka[:-1]) | (kb[1:] != kb[:-1])
    kstarts = np.nonzero(kfirst)[0]
    seg_id = np.cumsum(kfirst) - 1
    pos_in_seg = np.arange(len(ka), dtype=np.int64) - kstarts[seg_id]
    # winnow seed index within its pair (0-based after the optional LSH row)
    seg_has_lsh = (kw[kstarts] == 0).astype(np.int64) if len(kstarts) else np.empty(0, np.int64)
    seed = np.where(kw == 1, pos_in_seg - seg_has_lsh[seg_id], -1).astype(np.int32)
    return {
        "doc_a": ka,
        "doc_b": kb,
        "origin": origin[keep],
        "pos_a": pos_a[keep],
        "pos_b": pos_b[keep],
        "seed": seed,
    }


def consolidate_candidates(candidates: Dataset, cfg: DedupConfig) -> Dataset:
    """Raw candidate stream -> distinct per-pair rows with seed indices.

    Standalone operator (tests / tools); the flagship path folds this into
    :func:`prepare_candidates`'s exchange instead.
    """
    return sharded_group_map(
        candidates, ["doc_a", "doc_b"], _consolidate_shard, num_shards=cfg.group_shards
    )


def _list_u64_to_binary(col) -> pa.Array:
    """list<uint64> column -> binary column of the raw little-endian bytes.

    Zero-copy reinterpretation: the list offsets (elements) scale by 8 into
    byte offsets over the same flat values buffer.  Binary is the only wire
    type both the numpy group format and block unification handle untyped —
    the consumer decodes with ``np.frombuffer`` (again zero-copy).
    """
    lst = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(lst.values.to_numpy(zero_copy_only=False), dtype=np.uint64)
    offs = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    byte_offs = ((offs - offs[0]) * 8).astype(np.int32)
    data = flat[offs[0] : offs[-1]].tobytes()
    return pa.Array.from_buffers(
        pa.binary(), len(lst), [None, pa.py_buffer(byte_offs.tobytes()), pa.py_buffer(data)]
    )


def _prep_profile(t: pa.Table, key_col: str, sset_mem=None, text_mem=None) -> pa.Table:
    """Profile rows -> attach-union rows keyed in ``key_col``, semi-join-filtered.

    ``sset_mem`` / ``text_mem`` are membership filters (broadcast via
    ``ray.put``) over the doc ids that appear on this exchange's side of any
    LSH / winnow candidate row — either exact
    :class:`~..functions.bloom.SortedIdSet`s or, above the exact-set bound,
    :class:`~..functions.bloom.BloomFilter`s whose false positives only ship
    extra rows (the shard drops profile rows no candidate references anyway;
    false negatives are impossible).  When given, rows for docs in neither
    set are dropped entirely and the heavy columns are nulled where unneeded
    (``norm_text`` only ships for winnow docs, ``shingle_set`` only for LSH
    docs) — candidates reference a small fraction of the corpus, so this
    cuts most of the exchange's byte volume (measured 58% of profile rows
    dead at 200k docs).
    """
    ids = np.asarray(
        pc.cast(t["doc_id"], pa.uint64()).to_numpy(zero_copy_only=False), dtype=np.uint64
    )
    need_sset = need_text = None
    if sset_mem is not None:
        need_sset = sset_mem.contains(ids)
        need_text = text_mem.contains(ids)
        keep = need_sset | need_text
        t = t.filter(pa.array(keep))
        ids = ids[keep]
        need_sset, need_text = need_sset[keep], need_text[keep]
    n = len(t)
    payload = pc.cast(t["norm_text"], pa.binary())
    sset = _list_u64_to_binary(t["shingle_set"])
    if need_sset is not None:
        null_bin = pa.scalar(None, pa.binary())
        payload = pc.if_else(pa.array(need_text), payload, null_bin)
        sset = pc.if_else(pa.array(need_sset), sset, null_bin)
    zeros = pa.array(np.zeros(n, np.uint64), pa.uint64())
    cols = {
        "doc_a": zeros,
        "doc_b": zeros,
        "origin": pa.array(np.full(n, _SIDE_PROFILE, np.int8), pa.int8()),
        "seed": pa.array(np.full(n, -1, np.int32), pa.int32()),
        "pos_a": pa.array(np.full(n, -1, np.int64), pa.int64()),
        "pos_b": pa.array(np.full(n, -1, np.int64), pa.int64()),
        "simhash": pc.cast(t["simhash"], pa.uint64()),
        "n_shingles": pc.cast(t["n_shingles"], pa.int64()),
        "payload": payload,
        "sset": sset,
    }
    cols[key_col] = pa.array(ids, pa.uint64())
    return pa.table(cols)


def _cut_window(data: bytes, p: int, window: int, k: int) -> tuple[bytes, int]:
    """``window``-CHARACTER context slice around a seed at byte ``p``.

    The slice exposes ``window`` complete characters each side of the seed
    k-gram so the char-unit seed-extend can prove a >=
    ``min_substring_len``-char match; character boundaries are found with
    one vectorized lead-byte scan over a 4*window-byte neighborhood (a char
    is at most 4 UTF-8 bytes), so pure-ASCII slices are byte-identical to
    plain byte windows.  Returns (slice, seed position within the slice).
    """
    margin = 4 * window + 8  # chars are <= 4 UTF-8 bytes; +8 covers edge cuts
    scan_lo = max(0, p - margin)
    scan_hi = min(len(data), p + k + margin)
    b = np.frombuffer(data, dtype=np.uint8)[scan_lo:scan_hi]
    lead = (b & 0xC0) != 0x80
    left = np.nonzero(lead[: p - scan_lo])[0]
    lo = scan_lo + (int(left[-window]) if len(left) >= window else 0)
    rel_end = min(p + k, len(data)) - scan_lo
    right = np.nonzero(lead[rel_end:])[0]
    hi = (
        scan_lo + rel_end + int(right[window])
        if len(right) > window
        else min(len(data), scan_hi)
    )
    return data[lo:hi], p - lo


def _prepare_shard(group: dict, window: int, k: int) -> dict:
    """Exchange-1 reducer: consolidate the shard's pairs, attach a-side payload.

    The shard (key = doc_a) holds every raw row of each of its pairs plus
    the profile rows of its doc_a ids.  Consolidation runs first (it is
    shard-local because a pair's rows share doc_a), then each surviving row
    gathers its a-side columns: LSH rows (simhash_a, n_shingles_a, sset_a),
    winnow rows a context window around pos_a (``pos_a`` rewritten to the
    slice-local byte offset; ``pos_b`` stays absolute — the b text attaches
    whole in exchange 2).  Rows whose doc_a has no profile row (impossible
    for consistent inputs) are dropped, mirroring an inner join.
    """
    empty = {
        "doc_a": np.empty(0, np.uint64),
        "doc_b": np.empty(0, np.uint64),
        "origin": np.empty(0, np.int8),
        "seed": np.empty(0, np.int32),
        "pos_a": np.empty(0, np.int64),
        "pos_b": np.empty(0, np.int64),
        "simhash": np.empty(0, np.uint64),
        "n_shingles": np.empty(0, np.int64),
        "payload": np.empty(0, object),
        "sset": np.empty(0, object),
    }
    side = np.asarray(group["origin"], dtype=np.int8)
    cand_idx = np.nonzero(side != _SIDE_PROFILE)[0]
    if len(cand_idx) == 0:
        return empty
    sub = {
        c: np.asarray(group[c])[cand_idx]
        for c in ("doc_a", "doc_b", "origin", "pos_a", "pos_b")
    }
    cons = _consolidate_shard(sub)
    ca = np.asarray(cons["doc_a"], dtype=np.uint64)
    if len(ca) == 0:
        return empty
    prof_idx = np.nonzero(side == _SIDE_PROFILE)[0]
    pk = np.asarray(group["doc_a"], dtype=np.uint64)[prof_idx]
    order = np.argsort(pk, kind="stable")
    prof_idx, pk = prof_idx[order], pk[order]
    if len(pk):
        loc = np.minimum(np.searchsorted(pk, ca), len(pk) - 1)
        matched = pk[loc] == ca
    else:
        loc = np.zeros(len(ca), dtype=np.int64)
        matched = np.zeros(len(ca), dtype=bool)
    sel = np.nonzero(matched)[0]
    if len(sel) == 0:
        return empty
    src = prof_idx[loc[sel]]
    origin = np.asarray(cons["origin"], dtype=np.int8)[sel]
    pos_a = np.asarray(cons["pos_a"], dtype=np.int64)[sel]
    payload_all = np.asarray(group["payload"], dtype=object)
    sset_all = np.asarray(group["sset"], dtype=object)
    out_payload = np.full(len(sel), None, dtype=object)
    out_sset = np.full(len(sel), None, dtype=object)
    lsh_rows = origin == ORIGIN_LSH
    out_sset[lsh_rows] = sset_all[src[lsh_rows]]
    out_pos_a = np.full(len(sel), -1, dtype=np.int64)
    for i in np.nonzero(origin == ORIGIN_WINNOW)[0]:
        out_payload[i], out_pos_a[i] = _cut_window(
            payload_all[src[i]], int(pos_a[i]), window, k
        )
    return {
        "doc_a": ca[sel],
        "doc_b": np.asarray(cons["doc_b"], dtype=np.uint64)[sel],
        "origin": origin,
        "seed": np.asarray(cons["seed"], dtype=np.int32)[sel],
        "pos_a": out_pos_a,
        "pos_b": np.asarray(cons["pos_b"], dtype=np.int64)[sel],
        "simhash": np.asarray(group["simhash"], dtype=np.uint64)[src],
        "n_shingles": np.asarray(group["n_shingles"], dtype=np.int64)[src],
        "payload": out_payload,
        "sset": out_sset,
    }


def _verify_shard(group: dict, cfg: DedupConfig) -> dict:
    """Exchange-2 reducer: attach b-side from co-sharded profile rows, then
    gates, exact Jaccard, seed-extend and the per-pair combine — all local."""
    empty = {
        "doc_a": np.empty(0, np.uint64),
        "doc_b": np.empty(0, np.uint64),
        "jaccard": np.empty(0, np.float64),
        "simhash_hamming": np.empty(0, np.int32),
        "match_len": np.empty(0, np.int64),
        "origin": np.empty(0, object),
    }
    side = np.asarray(group["origin"], dtype=np.int8)
    cand_idx = np.nonzero(side != _SIDE_PROFILE)[0]
    if len(cand_idx) == 0:
        return empty
    prof_idx = np.nonzero(side == _SIDE_PROFILE)[0]
    keys = np.asarray(group["doc_b"], dtype=np.uint64)
    pk = keys[prof_idx]
    order = np.argsort(pk, kind="stable")
    prof_idx, pk = prof_idx[order], pk[order]
    cb = keys[cand_idx]
    if len(pk):
        loc = np.minimum(np.searchsorted(pk, cb), len(pk) - 1)
        matched = pk[loc] == cb
    else:
        loc = np.zeros(len(cb), dtype=np.int64)
        matched = np.zeros(len(cb), dtype=bool)
    cand_idx, loc = cand_idx[matched], loc[matched]
    if len(cand_idx) == 0:
        return empty
    src = prof_idx[loc]

    a = np.asarray(group["doc_a"], dtype=np.uint64)[cand_idx]
    b = keys[cand_idx]
    origin = side[cand_idx]
    seed = np.asarray(group["seed"], dtype=np.int32)[cand_idx]
    pos_a = np.asarray(group["pos_a"], dtype=np.int64)[cand_idx]
    pos_b = np.asarray(group["pos_b"], dtype=np.int64)[cand_idx]
    sim_all = np.asarray(group["simhash"], dtype=np.uint64)
    nsh_all = np.asarray(group["n_shingles"], dtype=np.int64)
    payload_all = np.asarray(group["payload"], dtype=object)
    sset_all = np.asarray(group["sset"], dtype=object)
    sim_a, sim_b = sim_all[cand_idx], sim_all[src]
    nsh_a, nsh_b = nsh_all[cand_idx], nsh_all[src]
    payload_a, text_b = payload_all[cand_idx], payload_all[src]
    sset_a, sset_b = sset_all[cand_idx], sset_all[src]

    # sort so each pair's rows are consecutive (for the anti-join + combine)
    order = np.lexsort((seed, origin, b, a))
    (a, b, origin, pos_a, pos_b, sim_a, sim_b, nsh_a, nsh_b,
     payload_a, text_b, sset_a, sset_b) = (
        a[order], b[order], origin[order], pos_a[order], pos_b[order],
        sim_a[order], sim_b[order], nsh_a[order], nsh_b[order],
        payload_a[order], text_b[order], sset_a[order], sset_b[order],
    )

    # --- LSH rows: gates then exact Jaccard ---
    lsh_i = np.nonzero(origin == ORIGIN_LSH)[0]
    ham = (
        hamming64(sim_a[lsh_i], sim_b[lsh_i]) if len(lsh_i) else np.empty(0, np.int64)
    )
    ratio = (
        np.minimum(nsh_a[lsh_i], nsh_b[lsh_i])
        / np.maximum(np.maximum(nsh_a[lsh_i], nsh_b[lsh_i]), 1)
        if len(lsh_i)
        else np.empty(0)
    )
    gate_ok = (ham <= cfg.simhash_hamming_max) & (ratio >= cfg.length_ratio_min)
    jacc = np.zeros(len(lsh_i), dtype=np.float64)
    todo = np.nonzero(gate_ok)[0]
    if len(todo):
        # exact Jaccard over the pre-computed unique shingle sets shipped in
        # the exchanges — no tokenization here at all (each document was
        # shingled exactly once, in the signature stage).  Both sets arrive
        # SORTED, so |A ∩ B| is one binary-search pass of the smaller side
        # into the larger (np.searchsorted) — no re-sort of the pair union
        # (the sort was ~60x the cost of the searchsorted merge).
        out = np.empty(len(todo), dtype=np.float64)
        for i, t in enumerate(todo):
            sa = np.frombuffer(sset_a[lsh_i[t]], dtype=np.uint64)
            sb = np.frombuffer(sset_b[lsh_i[t]], dtype=np.uint64)
            if len(sa) > len(sb):
                sa, sb = sb, sa
            idx = np.searchsorted(sb, sa)
            idx[idx == len(sb)] = len(sb) - 1 if len(sb) else 0
            inter = int((sb[idx] == sa).sum()) if len(sb) else 0
            union = len(sa) + len(sb) - inter
            out[i] = inter / union if union else 1.0
        jacc[todo] = out
    lsh_pass = jacc >= cfg.jaccard_threshold

    # pairs confirmed via Jaccard skip their seed-extends (the old anti-join;
    # free because every row of a pair shares doc_b and lands in this shard)
    la = lsh_i[lsh_pass]
    verified_keys = set(zip(a[la].tolist(), b[la].tolist()))

    # --- winnow rows: seed-extend (a context window vs the full b text) ---
    win_i = np.nonzero(origin == ORIGIN_WINNOW)[0]
    wlen = np.zeros(len(win_i), dtype=np.int64)
    k = cfg.winnow_kgram
    for i in range(len(win_i)):
        w = win_i[i]
        if (int(a[w]), int(b[w])) in verified_keys:
            continue
        wlen[i] = extend_match(
            payload_a[w], text_b[w], int(pos_a[w]), int(pos_b[w]), k
        )
    win_pass = wlen >= cfg.min_substring_len
    wa = win_i[win_pass]

    # --- combine: one output row per verified pair ---
    out_a = np.concatenate([a[la], a[wa]])
    if len(out_a) == 0:
        return empty
    out_b = np.concatenate([b[la], b[wa]])
    out_j = np.concatenate([jacc[lsh_pass], np.zeros(len(wa))])
    out_h = np.concatenate(
        [ham[lsh_pass], np.full(len(wa), 64, dtype=np.int64)]
    ).astype(np.int32)
    out_m = np.concatenate([np.zeros(len(la), np.int64), wlen[win_pass]])
    out_o = np.concatenate(
        [
            np.full(len(la), "lsh", dtype=object),
            np.full(len(wa), "winnow", dtype=object),
        ]
    )
    oorder = np.lexsort((out_b, out_a))
    out_a, out_b, out_j, out_h, out_m, out_o = (
        out_a[oorder], out_b[oorder], out_j[oorder], out_h[oorder], out_m[oorder], out_o[oorder]
    )
    first = np.ones(len(out_a), dtype=bool)
    if len(out_a) > 1:
        first[1:] = (out_a[1:] != out_a[:-1]) | (out_b[1:] != out_b[:-1])
    starts = np.nonzero(first)[0]
    seg_sizes = np.diff(np.append(starts, len(out_a)))
    merged_o = out_o[starts].copy()
    multi = np.nonzero(seg_sizes > 1)[0]
    for m in multi:
        names = set(out_o[starts[m] : starts[m] + seg_sizes[m]])
        merged_o[m] = "lsh+winnow" if len(names) > 1 else names.pop()
    return {
        "doc_a": out_a[starts],
        "doc_b": out_b[starts],
        "jaccard": np.maximum.reduceat(out_j, starts),
        "simhash_hamming": np.minimum.reduceat(out_h, starts),
        "match_len": np.maximum.reduceat(out_m, starts),
        "origin": merged_o,
    }


def _emit_cand_union(t: pa.Table) -> pa.Table:
    """Raw/consolidated candidate rows -> exchange-1 union rows."""
    n = len(t)
    seed = (
        pc.cast(t["seed"], pa.int32())
        if "seed" in t.schema.names
        else pa.array(np.full(n, -1, np.int32), pa.int32())
    )
    return pa.table(
        {
            "doc_a": pc.cast(t["doc_a"], pa.uint64()),
            "doc_b": pc.cast(t["doc_b"], pa.uint64()),
            "origin": pc.cast(t["origin"], pa.int8()),
            "seed": seed,
            "pos_a": pc.cast(t["pos_a"], pa.int64()),
            "pos_b": pc.cast(t["pos_b"], pa.int64()),
            "simhash": pa.array(np.zeros(n, np.uint64), pa.uint64()),
            "n_shingles": pa.array(np.zeros(n, np.int64), pa.int64()),
            "payload": pa.nulls(n, type=pa.binary()),
            "sset": pa.nulls(n, type=pa.binary()),
        }
    )


def _prepared_union(t: pa.Table) -> pa.Table:
    """Prepared (exchange-1 output) rows -> exchange-2 union rows.

    Identity on the column set; casts cover a Parquet checkpoint round-trip
    (binary payloads and unsigned ids survive, but pandas-backed blocks can
    degrade int widths).
    """
    return pa.table(
        {
            "doc_a": pc.cast(t["doc_a"], pa.uint64()),
            "doc_b": pc.cast(t["doc_b"], pa.uint64()),
            "origin": pc.cast(t["origin"], pa.int8()),
            "seed": pc.cast(t["seed"], pa.int32()),
            "pos_a": pc.cast(t["pos_a"], pa.int64()),
            "pos_b": pc.cast(t["pos_b"], pa.int64()),
            "simhash": pc.cast(t["simhash"], pa.uint64()),
            "n_shingles": pc.cast(t["n_shingles"], pa.int64()),
            "payload": pc.cast(t["payload"], pa.binary()),
            "sset": pc.cast(t["sset"], pa.binary()),
        }
    )


def _side_memberships(candidates: Dataset, col: str, cfg: DedupConfig):
    """(lsh_member, win_member) over ``candidates[col]`` split by origin.

    The semi-join filter build for one exchange side.  ONE scan of the
    candidate stream produces per-block distinct-id blobs per origin (a
    pinned dataset of ``unique(ids).tobytes()`` cells); everything else
    reads those blobs, never the candidates again:

    1. the exact-vs-Bloom decision uses the SUMMED blob lengths — a true
       upper bound on distinct ids (cross-block repeats overcount, never
       under), far tighter than the raw row count (one pair contributes up
       to ``bands`` LSH rows plus one row per shared fingerprint) — and is
       made from per-block scalars BEFORE any driver-side id collection;
    2. below ``attach_semijoin_max_ids`` the blobs concatenate into exact
       :class:`SortedIdSet`s (driver holds at most the bound just checked);
    3. above it BOTH origins' Bloom filters are built FROM the blobs (no
       second candidate scan), sized by the same distinct upper bound.

    Returns ``None`` when the Bloom path is disabled
    (``attach_bloom_bits_per_id <= 0``) and the bound is exceeded — every
    profile row ships (slower, correct).
    """
    import pyarrow.compute as pc

    # column-prune before the scan: the membership pass needs only (col,
    # origin) — 9 bytes/row — and ``candidates`` may carry heavy binary
    # payloads (prepared rows ship context windows + shingle sets).  On
    # object-store blocks this slices two buffers zero-copy; on a Parquet
    # checkpoint it pushes the projection into the read.
    candidates = candidates.select_columns([col, "origin"])

    def partial(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[col].to_numpy(zero_copy_only=False), dtype=np.uint64)
        o = np.asarray(t["origin"].to_numpy(zero_copy_only=False), dtype=np.int8)
        return pa.table(
            {
                "lsh": pa.array([np.unique(ids[o == ORIGIN_LSH]).tobytes()]),
                "win": pa.array([np.unique(ids[o == ORIGIN_WINNOW]).tobytes()]),
            }
        )

    parts = candidates.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()

    def blob_bytes(t: pa.Table) -> pa.Table:
        if "lsh" not in t.schema.names:  # empty-block schema passthrough
            return pa.table({"n": pa.array([0], pa.int64())})
        n = pc.sum(pc.binary_length(t["lsh"])).as_py() or 0
        n += pc.sum(pc.binary_length(t["win"])).as_py() or 0
        return pa.table({"n": pa.array([int(n)], pa.int64())})

    sizes = parts.map_batches(
        blob_bytes, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).take_all()
    ids_upper = sum(int(r["n"]) for r in sizes) // 8

    if ids_upper <= cfg.attach_semijoin_max_ids:
        rows = [r for r in parts.take_all() if "lsh" in r]

        def merge(key: str) -> np.ndarray:
            bufs = [np.frombuffer(r[key], dtype=np.uint64) for r in rows]
            return np.unique(np.concatenate(bufs)) if bufs else np.empty(0, np.uint64)

        return SortedIdSet(merge("lsh")), SortedIdSet(merge("win"))
    if cfg.attach_bloom_bits_per_id <= 0:
        return None
    m_bits = BloomFilter.size_bits(
        ids_upper, cfg.attach_bloom_bits_per_id, cfg.attach_bloom_max_bits
    )

    def ids_of(key: str):
        def fn(t: pa.Table) -> np.ndarray:
            if key not in t.schema.names:
                return np.empty(0, np.uint64)
            bufs = [
                np.frombuffer(cell, dtype=np.uint64)
                for cell in t[key].to_pylist()
                if cell
            ]
            return np.concatenate(bufs) if bufs else np.empty(0, np.uint64)

        return fn

    return (
        build_bloom_distributed(parts, ids_of("lsh"), m_bits, cfg.attach_bloom_hashes),
        build_bloom_distributed(parts, ids_of("win"), m_bits, cfg.attach_bloom_hashes),
    )


def _prepped_profile(profile: Dataset, key_col: str, members) -> Dataset:
    import ray

    if members is not None:
        mem_ref = ray.put(members)

        def prep(t: pa.Table) -> pa.Table:
            sm, tm = ray.get(mem_ref)
            return _prep_profile(t, key_col, sm, tm)

    else:

        def prep(t: pa.Table) -> pa.Table:
            return _prep_profile(t, key_col)

    return profile.select_columns(
        ["doc_id", "simhash", "n_shingles", "norm_text", "shingle_set"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def prepare_candidates(candidates: Dataset, profile: Dataset, cfg: DedupConfig) -> Dataset:
    """Exchange 1: raw candidates -> consolidated per-pair rows with a-side
    payload attached (see module docstring).

    ``candidates`` is consumed twice (membership pass + exchange) — the
    caller must pass a pinned/materialized stream (the flagship pins the LSH
    and winnow pair streams separately; :func:`verify_stage` materializes
    for standalone callers).
    """
    members = _side_memberships(candidates, "doc_a", cfg)
    cand = candidates.map_batches(
        _emit_cand_union, batch_format="pyarrow", zero_copy_batch=True
    )
    prof = _prepped_profile(profile, "doc_a", members)
    return sharded_group_map(
        cand.union(prof),
        ["doc_a"],
        lambda g: _prepare_shard(g, cfg.min_substring_len, cfg.winnow_kgram),
        num_shards=cfg.group_shards,
    )


def verify_prepared(prepared: Dataset, profile: Dataset, cfg: DedupConfig) -> Dataset:
    """Exchange 2: prepared rows x profile -> verified_pairs (distinct pairs).

    ``prepared`` is consumed twice (membership pass + exchange) — pass a
    pinned/checkpointed dataset.
    """
    members = _side_memberships(prepared, "doc_b", cfg)
    cand = prepared.map_batches(
        _prepared_union, batch_format="pyarrow", zero_copy_batch=True
    )
    prof = _prepped_profile(profile, "doc_b", members)
    return sharded_group_map(
        cand.union(prof),
        ["doc_b"],
        lambda g: _verify_shard(g, cfg),
        num_shards=cfg.group_shards,
    )


def verify_stage(
    candidates: Dataset,
    profile: Dataset,
    cfg: DedupConfig,
    consolidated: bool = False,
    pin_intermediate: bool = True,
) -> Dataset:
    """candidate_pairs x profile -> verified_pairs (distinct on doc_a, doc_b).

    Convenience composition of :func:`prepare_candidates` +
    :func:`verify_prepared`.  ``consolidated=True`` signals the caller
    already distincted the stream (e.g. a checkpointed boundary);
    consolidation is idempotent so the prepare exchange simply passes such
    rows through while attaching the a-side payload.

    ``pin_intermediate`` materializes the prepared rows before the verify
    exchange: two all-to-all operators in one streaming DAG thrash each
    other on this Ray version (see pipelines/dedup.py), so the ~1 s barrier
    is a net win at every measured scale.  The input is materialized first
    for the same reason (the membership pass would otherwise execute a lazy
    upstream twice).
    """
    del consolidated  # kept for API compatibility; consolidation is idempotent
    candidates = candidates.materialize()
    prepared = prepare_candidates(candidates, profile, cfg)
    if pin_intermediate:
        prepared = prepared.materialize()
    return verify_prepared(prepared, profile, cfg)

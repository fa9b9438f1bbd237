"""Verification stage: candidate pairs -> verified pairs (exact evidence only).

Reference analog: the staged verification funnel — cheap color gate
(/root/reference/modules/deduplication.py:711-801) then cosine refinement
(:1219-1283) then local-descriptor matching (:1460-1532).  Per the north rule
the confirm step here is *exact*: token-shingle Jaccard for LSH candidates and
measured common-substring length (seed-and-extend at the shared winnowing
fingerprint positions) for substring candidates.  The SimHash-Hamming +
length-ratio gates are provably lossless for pairs above the Jaccard
threshold (J >= t implies |A|/|B| >= t), so they only skip work, never recall.

Physical plan — exactly THREE exchanges (down from seven in the first
design; each all-to-all costs 1-2 s of serial wall-time regardless of CPU
count, so exchange count is the scaling-efficiency budget):

1. **consolidate** (key = (doc_a, doc_b)): distinct the raw candidate stream
   (a true pair typically surfaces in many of the 32 LSH bands and at many
   shared fingerprints) down to one LSH row plus <= ``max_seeds`` spread
   winnow seed rows per pair;
2. **attach** (key = doc id): ONE tagged-union shard pass co-locates *both*
   half-rows of every pair with the profile rows they need — the LSH halves
   pick up (simhash, n_shingles, the doc's pre-sorted unique shingle set —
   never the text), the winnow halves a byte context window around their
   seed position (>= L decidable within +-L of the seed, ~50x less volume
   than full text for long docs);
3. **merge-verify** (key = (doc_a, doc_b)): the two halves of each pair meet;
   gates + exact Jaccard (a searchsorted merge of the two pre-sorted shingle
   sets — no tokenization, no re-sort) run for LSH units, seed-extend for
   winnow units
   (skipped when the pair already confirmed via Jaccard — the old anti-join,
   now a free local check), and the distinct verified pair set is emitted.

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
from ..functions.bloom import BloomFilter, SortedIdSet
from ..functions.hashing import _ranges, hamming64
from ..functions.text import pairwise_jaccard_from_sets  # noqa: F401  (re-export for tests)
from ..util import sharded_group_map

ORIGIN_LSH = 0
ORIGIN_WINNOW = 1
_SIDE_PROFILE = 2  # tag for profile rows in the attach union

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
    winnow rows) so the merge-verify stage can align the a/b halves of each
    unit after the attach exchange.
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
    """Raw candidate stream -> distinct per-pair rows with seed indices."""
    return sharded_group_map(
        candidates, ["doc_a", "doc_b"], _consolidate_shard, num_shards=cfg.group_shards
    )


def _emit_halves(t: pa.Table) -> pa.Table:
    """Consolidated rows -> two half-rows each (keyed by doc_a then doc_b)."""
    n = len(t)
    a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), dtype=np.uint64)
    origin = np.asarray(t["origin"].to_numpy(zero_copy_only=False), dtype=np.int8)
    pos_a = np.asarray(t["pos_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
    pos_b = np.asarray(t["pos_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
    seed = np.asarray(t["seed"].to_numpy(zero_copy_only=False), dtype=np.int32)
    return pa.table(
        {
            "key": pa.array(np.concatenate([a, b]), pa.uint64()),
            "doc_a": pa.array(np.concatenate([a, a]), pa.uint64()),
            "doc_b": pa.array(np.concatenate([b, b]), pa.uint64()),
            "origin": pa.array(np.concatenate([origin, origin]), pa.int8()),
            "half": pa.array(
                np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)]), pa.int8()
            ),
            "seed": pa.array(np.concatenate([seed, seed]), pa.int32()),
            "pos": pa.array(np.concatenate([pos_a, pos_b]), pa.int64()),
            "simhash": pa.array(np.zeros(2 * n, np.uint64), pa.uint64()),
            "n_shingles": pa.array(np.zeros(2 * n, np.int64), pa.int64()),
            "payload": pa.nulls(2 * n, type=pa.binary()),
            "sset": pa.nulls(2 * n, type=pa.binary()),
        }
    )


def _prep_profile(t: pa.Table, sset_mem=None, text_mem=None) -> pa.Table:
    """Profile rows -> attach-union rows, optionally semi-join-filtered.

    ``sset_mem`` / ``text_mem`` are membership filters (broadcast via
    ``ray.put``) over the doc ids that appear in LSH / winnow candidate rows
    — either exact :class:`~..functions.bloom.SortedIdSet`s or, above the
    exact-set bound, :class:`~..functions.bloom.BloomFilter`s whose false
    positives only ship extra rows (the attach shard drops profile rows with
    no halves anyway; false negatives are impossible).  When given, rows for
    docs in neither set are dropped entirely and the heavy columns are
    nulled where unneeded (``norm_text`` only ships for winnow docs,
    ``shingle_set`` only for LSH docs) — candidates reference a small
    fraction of the corpus, so this cuts most of the attach exchange's byte
    volume (measured 58% of rows dead at 200k docs).
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
    return pa.table(
        {
            "key": pa.array(ids, pa.uint64()),
            "doc_a": pa.array(np.zeros(n, np.uint64), pa.uint64()),
            "doc_b": pa.array(np.zeros(n, np.uint64), pa.uint64()),
            "origin": pa.array(np.full(n, _SIDE_PROFILE, np.int8), pa.int8()),
            "half": pa.array(np.full(n, -1, np.int8), pa.int8()),
            "seed": pa.array(np.full(n, -1, np.int32), pa.int32()),
            "pos": pa.array(np.full(n, -1, np.int64), pa.int64()),
            "simhash": pc.cast(t["simhash"], pa.uint64()),
            "n_shingles": pc.cast(t["n_shingles"], pa.int64()),
            "payload": payload,
            "sset": sset,
        }
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


def _attach_shard(group: dict, window: int, k: int) -> dict:
    """Fill each half-row's payload from its co-sharded profile row.

    LSH halves receive (simhash, n_shingles, full text); winnow halves a
    ``window``-CHARACTER context slice around the seed (``pos`` rewritten to
    the slice-local byte offset).  The slice must expose ``window`` complete
    characters each side so the char-unit seed-extend can prove a
    >= ``min_substring_len``-char match; character boundaries are found with
    one vectorized lead-byte scan over a 4*window-byte neighborhood (a char
    is at most 4 UTF-8 bytes), so pure-ASCII slices are byte-identical to
    the old byte windows.  Halves whose doc id has no profile row
    (impossible for consistent inputs) are dropped, mirroring the old inner
    join.
    """
    side = np.asarray(group["origin"], dtype=np.int8)
    keys = np.asarray(group["key"], dtype=np.uint64)
    prof_idx = np.nonzero(side == _SIDE_PROFILE)[0]
    order = np.argsort(keys[prof_idx], kind="stable")
    prof_idx = prof_idx[order]
    pk = keys[prof_idx]
    half_idx = np.nonzero(side != _SIDE_PROFILE)[0]
    hk = keys[half_idx]
    if len(pk):
        loc = np.minimum(np.searchsorted(pk, hk), len(pk) - 1)
        matched = pk[loc] == hk
    else:
        loc = np.zeros(len(hk), dtype=np.int64)
        matched = np.zeros(len(hk), dtype=bool)
    half_idx, loc = half_idx[matched], loc[matched]
    src = prof_idx[loc]
    payload = np.asarray(group["payload"], dtype=object)
    sset = np.asarray(group["sset"], dtype=object)
    pos = np.asarray(group["pos"], dtype=np.int64)
    origin = side[half_idx]
    # LSH halves carry the pre-computed unique shingle set (exact Jaccard is
    # then pure set arithmetic downstream — no re-tokenization, no text);
    # winnow halves carry only a context window around their seed position
    out_payload = payload[src]  # object ref copy
    out_sset = sset[src]
    out_pos = np.full(len(half_idx), -1, dtype=np.int64)
    win_rows = np.nonzero(origin == ORIGIN_WINNOW)[0]
    margin = 4 * window + 8  # chars are <= 4 UTF-8 bytes; +8 covers edge cuts
    for i in win_rows:
        data = out_payload[i]
        p = int(pos[half_idx[i]])
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
        out_payload[i] = data[lo:hi]
        out_pos[i] = p - lo
    lsh_rows = origin == ORIGIN_LSH
    out_payload[lsh_rows] = None  # text never ships for LSH halves
    out_sset[~lsh_rows] = None
    return {
        "doc_a": np.asarray(group["doc_a"], dtype=np.uint64)[half_idx],
        "doc_b": np.asarray(group["doc_b"], dtype=np.uint64)[half_idx],
        "origin": origin,
        "half": np.asarray(group["half"], dtype=np.int8)[half_idx],
        "seed": np.asarray(group["seed"], dtype=np.int32)[half_idx],
        "pos": out_pos,
        "simhash": np.asarray(group["simhash"], dtype=np.uint64)[src],
        "n_shingles": np.asarray(group["n_shingles"], dtype=np.int64)[src],
        "payload": out_payload,
        "sset": out_sset,
    }


def _merge_verify_shard(group: dict, cfg: DedupConfig) -> dict:
    """Both halves of every pair meet here: gates, exact Jaccard, seed-extend,
    and the per-pair combine — all local to one task."""
    empty = {
        "doc_a": np.empty(0, np.uint64),
        "doc_b": np.empty(0, np.uint64),
        "jaccard": np.empty(0, np.float64),
        "simhash_hamming": np.empty(0, np.int32),
        "match_len": np.empty(0, np.int64),
        "origin": np.empty(0, object),
    }
    a = np.asarray(group["doc_a"], dtype=np.uint64)
    if len(a) == 0:
        return empty
    b = np.asarray(group["doc_b"], dtype=np.uint64)
    origin = np.asarray(group["origin"], dtype=np.int8)
    half = np.asarray(group["half"], dtype=np.int8)
    seed = np.asarray(group["seed"], dtype=np.int32)
    pos = np.asarray(group["pos"], dtype=np.int64)
    simhash = np.asarray(group["simhash"], dtype=np.uint64)
    n_sh = np.asarray(group["n_shingles"], dtype=np.int64)
    payload = np.asarray(group["payload"], dtype=object)
    sset = np.asarray(group["sset"], dtype=object)
    order = np.lexsort((half, seed, origin, b, a))
    a, b, origin, half, seed, pos, simhash, n_sh, payload, sset = (
        a[order], b[order], origin[order], half[order], seed[order],
        pos[order], simhash[order], n_sh[order], payload[order], sset[order],
    )
    # a unit = consecutive (pair, origin, seed) rows with half 0 then half 1
    same = np.zeros(len(a), dtype=bool)
    if len(a) > 1:
        same[:-1] = (
            (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (origin[1:] == origin[:-1])
            & (seed[1:] == seed[:-1]) & (half[:-1] == 0) & (half[1:] == 1)
        )
    ia = np.nonzero(same)[0]  # index of the a-half of each complete unit
    if len(ia) == 0:
        return empty
    ib = ia + 1

    # --- LSH units: gates then exact Jaccard ---
    lsh_u = origin[ia] == ORIGIN_LSH
    la, lb = ia[lsh_u], ib[lsh_u]
    ham = hamming64(simhash[la], simhash[lb]) if len(la) else np.empty(0, np.int64)
    ratio = (
        np.minimum(n_sh[la], n_sh[lb]) / np.maximum(np.maximum(n_sh[la], n_sh[lb]), 1)
        if len(la)
        else np.empty(0)
    )
    gate_ok = (ham <= cfg.simhash_hamming_max) & (ratio >= cfg.length_ratio_min)
    jacc = np.zeros(len(la), dtype=np.float64)
    todo = np.nonzero(gate_ok)[0]
    if len(todo):
        # exact Jaccard over the pre-computed unique shingle sets shipped in
        # the attach — no tokenization here at all (each document was
        # shingled exactly once, in the signature stage).  Both sets arrive
        # SORTED, so |A ∩ B| is one binary-search pass of the smaller side
        # into the larger (np.searchsorted) — no re-sort of the pair union
        # (the sort was ~60x the cost of the searchsorted merge).
        out = np.empty(len(todo), dtype=np.float64)
        for i, t in enumerate(todo):
            sa = np.frombuffer(sset[la[t]], dtype=np.uint64)
            sb = np.frombuffer(sset[lb[t]], dtype=np.uint64)
            if len(sa) > len(sb):
                sa, sb = sb, sa
            idx = np.searchsorted(sb, sa)
            idx[idx == len(sb)] = len(sb) - 1 if len(sb) else 0
            inter = int((sb[idx] == sa).sum()) if len(sb) else 0
            union = len(sa) + len(sb) - inter
            out[i] = inter / union if union else 1.0
        jacc[todo] = out
    lsh_pass = jacc >= cfg.jaccard_threshold

    # pairs confirmed via Jaccard skip their seed-extends (the old anti-join)
    verified_keys = set(
        zip(a[la[lsh_pass]].tolist(), b[la[lsh_pass]].tolist())
    )

    # --- winnow units: seed-extend in context windows ---
    win_u = np.nonzero(origin[ia] == ORIGIN_WINNOW)[0]
    wa, wb = ia[win_u], ib[win_u]
    wlen = np.zeros(len(wa), dtype=np.int64)
    k = cfg.winnow_kgram
    for i in range(len(wa)):
        if (int(a[wa[i]]), int(b[wa[i]])) in verified_keys:
            continue
        wlen[i] = extend_match(
            payload[wa[i]], payload[wb[i]], int(pos[wa[i]]), int(pos[wb[i]]), k
        )
    win_pass = wlen >= cfg.min_substring_len

    # --- combine: one output row per verified pair ---
    out_a = np.concatenate([a[la[lsh_pass]], a[wa[win_pass]]])
    out_b = np.concatenate([b[la[lsh_pass]], b[wa[win_pass]]])
    out_j = np.concatenate([jacc[lsh_pass], np.zeros(int(win_pass.sum()))])
    out_h = np.concatenate(
        [ham[lsh_pass], np.full(int(win_pass.sum()), 64, dtype=np.int64)]
    ).astype(np.int32)
    out_m = np.concatenate([np.zeros(int(lsh_pass.sum()), np.int64), wlen[win_pass]])
    out_o = np.concatenate(
        [
            np.full(int(lsh_pass.sum()), "lsh", dtype=object),
            np.full(int(win_pass.sum()), "winnow", dtype=object),
        ]
    )
    if len(out_a) == 0:
        return empty
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


def _candidate_doc_ids(candidates: Dataset) -> tuple:
    """Distinct doc ids over candidate rows: (in any LSH row, in any winnow row).

    One cheap pass over the (consolidated, materialized) candidate table:
    per-block partial uniques serialized as raw bytes, merged on the driver.
    Driver memory is O(distinct dup-doc ids) — 8 bytes each.  The caller
    gates on ``2 * n_pairs <= cfg.attach_semijoin_max_ids`` BEFORE invoking
    this, so the collection itself is driver-bounded; above the bound the
    Bloom path (:func:`_candidate_bloom_filters`) runs instead and raw ids
    never reach the driver.
    """

    def partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        o = np.asarray(t["origin"].to_numpy(zero_copy_only=False), dtype=np.int8)
        lsh, win = o == ORIGIN_LSH, o == ORIGIN_WINNOW
        return pa.table(
            {
                "lsh": pa.array([np.unique(np.concatenate([a[lsh], b[lsh]])).tobytes()]),
                "win": pa.array([np.unique(np.concatenate([a[win], b[win]])).tobytes()]),
            }
        )

    parts = candidates.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()

    def merge(key: str) -> np.ndarray:
        bufs = [np.frombuffer(p[key], dtype=np.uint64) for p in parts]
        return np.unique(np.concatenate(bufs)) if bufs else np.empty(0, np.uint64)

    return merge("lsh"), merge("win")


def _candidate_bloom_filters(
    candidates: Dataset, cfg: DedupConfig, n_ids_upper: int
) -> tuple:
    """Distributed Bloom build over candidate doc ids: (lsh_bloom, win_bloom).

    The semi-join scale path above ``attach_semijoin_max_ids`` (the cliff
    named by the round-2 verdict): per-block partial filters are built inside
    ``map_batches`` (fixed ``m_bits/8`` bytes each regardless of block id
    count), then OR-merged by a fan-in-8 tree of Ray tasks — the driver only
    ever holds object refs plus the single final filter, never raw ids.
    Contract (same as the exact set): false positives only ship extra
    profile rows, false negatives cannot occur.
    """
    import ray

    m_bits = BloomFilter.size_bits(
        n_ids_upper, cfg.attach_bloom_bits_per_id, cfg.attach_bloom_max_bits
    )
    k = cfg.attach_bloom_hashes

    def partial(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        b = np.asarray(t["doc_b"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        o = np.asarray(t["origin"].to_numpy(zero_copy_only=False), dtype=np.int8)
        lsh, win = o == ORIGIN_LSH, o == ORIGIN_WINNOW
        fl = BloomFilter(m_bits, k).add(np.concatenate([a[lsh], b[lsh]]))
        fw = BloomFilter(m_bits, k).add(np.concatenate([a[win], b[win]]))
        return pa.table(
            {
                "lsh": pa.array([fl.words.tobytes()]),
                "win": pa.array([fw.words.tobytes()]),
            }
        )

    refs = candidates.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).to_arrow_refs()

    @ray.remote
    def or_merge(*parts):
        lsh = np.zeros(m_bits // 64, dtype=np.uint64)
        win = np.zeros(m_bits // 64, dtype=np.uint64)
        for p in parts:
            # empty input blocks pass through map_batches without the UDF
            # running, so they arrive with the candidates schema — skip them
            if p.num_rows == 0 or "lsh" not in p.schema.names:
                continue
            for col, acc in (("lsh", lsh), ("win", win)):
                for chunk in p[col].chunks if hasattr(p[col], "chunks") else [p[col]]:
                    for buf in chunk:
                        acc |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.table({"lsh": pa.array([lsh.tobytes()]), "win": pa.array([win.tobytes()])})

    fanin = 8
    while len(refs) > 1:
        refs = [or_merge.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)]
    final = ray.get(refs[0]) if refs else None
    if final is None:
        return BloomFilter(m_bits, k), BloomFilter(m_bits, k)
    return (
        BloomFilter(m_bits, k, np.frombuffer(final["lsh"][0].as_py(), np.uint64).copy()),
        BloomFilter(m_bits, k, np.frombuffer(final["win"][0].as_py(), np.uint64).copy()),
    )


def verify_stage(
    candidates: Dataset,
    profile: Dataset,
    cfg: DedupConfig,
    consolidated: bool = False,
    pin_intermediate: bool = True,
) -> Dataset:
    """candidate_pairs x profile -> verified_pairs (distinct on doc_a, doc_b).

    ``consolidated=True`` skips exchange 1 (the caller already ran
    :func:`consolidate_candidates`, e.g. because that boundary is a
    checkpoint stage).  See the module docstring for the three-exchange plan.

    ``pin_intermediate`` materializes the attach output before the
    merge-verify exchange: two all-to-all operators in one streaming DAG
    thrash each other on this Ray version (see pipelines/dedup.py), so the
    ~1 s barrier is a net win at every measured scale.
    """
    import ray

    if not consolidated:
        # the id-collection pass below would otherwise execute the lazy
        # consolidate exchange twice (once for ids, once for the attach)
        candidates = consolidate_candidates(candidates, cfg).materialize()
    halves = candidates.map_batches(
        _emit_halves, batch_format="pyarrow", zero_copy_batch=True
    )
    # broadcast semi-join: ship a profile row (and its heavy columns) only to
    # the docs that can be consumed downstream — see _prep_profile.  The
    # exact-vs-Bloom decision is made from the pair COUNT (2 * n_pairs is an
    # upper bound on distinct ids) BEFORE any id collection, so the driver
    # never materializes an unbounded id set just to discover it was too big.
    n_pairs = candidates.count()
    if 2 * n_pairs <= cfg.attach_semijoin_max_ids:
        sset_ids, text_ids = _candidate_doc_ids(candidates)
        members = (SortedIdSet(sset_ids), SortedIdSet(text_ids))
    elif cfg.attach_bloom_bits_per_id > 0:
        members = _candidate_bloom_filters(candidates, cfg, 2 * n_pairs)
    else:  # Bloom disabled: ship every profile row (slower, correct)
        members = None
    if members is not None:
        mem_ref = ray.put(members)

        def prep(t: pa.Table) -> pa.Table:
            sm, tm = ray.get(mem_ref)
            return _prep_profile(t, sm, tm)

    else:
        prep = _prep_profile
    prof = profile.select_columns(
        ["doc_id", "simhash", "n_shingles", "norm_text", "shingle_set"]
    ).map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    attached = sharded_group_map(
        halves.union(prof),
        ["key"],
        lambda g: _attach_shard(g, cfg.min_substring_len, cfg.winnow_kgram),
        num_shards=cfg.group_shards,
    )
    if pin_intermediate:
        attached = attached.materialize()
    return sharded_group_map(
        attached,
        ["doc_a", "doc_b"],
        lambda g: _merge_verify_shard(g, cfg),
        num_shards=cfg.group_shards,
    )

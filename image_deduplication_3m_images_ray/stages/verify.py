"""Verification stage: candidate pairs -> verified pairs (exact evidence only).

Reference analog: the staged verification funnel — cheap color gate
(/root/reference/modules/deduplication.py:711-801) then cosine refinement
(:1219-1283) then local-descriptor matching (:1460-1532).  Per the north rule
the confirm step here is *exact*: token-shingle Jaccard for LSH candidates and
measured common-substring length (seed-and-extend at the shared winnowing
fingerprint positions) for substring candidates.  The SimHash-Hamming +
length-ratio gates are provably lossless for pairs above the Jaccard
threshold (J >= t implies |A|/|B| >= t), so they only skip work, never recall.

Pair -> document attachment is a hash-partitioned sort-based equi-join
(``util.shard_attach``, SURVEY.md §2.4 J1; both sides are large at
10^12-doc scale so broadcast is not an option).  The stage is organized to
minimize shuffle VOLUME (the dominant cost is shipping document payloads per
candidate pair) — see :func:`verify_stage` for the five-step plan.
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
    # exact Jaccard by re-shingling the attached texts: shipping text through
    # the attach shuffle is cheaper than shipping shingle sets (~40% fewer
    # bytes) and the re-shingle is perfectly parallel vectorized compute
    jacc = pairwise_jaccard_batch(
        batch["text_a"].take(sel), batch["text_b"].take(sel), cfg.shingle_k
    )
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
    """Seed-extend inside the attached context windows (bytes, window-local
    positions).  match_len is exact up to the window bound — the >= L decision
    is unaffected (any >= L run through the seed lies within +-L of it)."""
    n = len(batch)
    if n == 0:
        return _EMPTY
    pos_a = np.asarray(batch["pos_a"].to_numpy(zero_copy_only=False), dtype=np.int64)
    pos_b = np.asarray(batch["pos_b"].to_numpy(zero_copy_only=False), dtype=np.int64)
    ta = batch["ctx_a"].to_pylist()
    tb = batch["ctx_b"].to_pylist()
    match_len = np.zeros(n, dtype=np.int64)
    for i in range(n):
        match_len[i] = extend_match(
            ta[i], tb[i], int(pos_a[i]), int(pos_b[i]), cfg.winnow_kgram
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


def _consolidate_shard(group: dict, max_seeds: int = 4) -> dict:
    """One row set per distinct (doc_a, doc_b) before the expensive text attach.

    Keeps at most one LSH row plus up to ``max_seeds`` winnow seed rows per
    pair.  Near-dup clusters otherwise explode the winnow row count (every
    shared fingerprint emits a row — hundreds for lightly-edited copies), and
    each surviving row later ships both documents' text through the attach
    shuffle.  Seeds are SPREAD over the pair's matches: extension around any
    seed inside a >=L shared run passes, so a handful of spread seeds
    preserves the winnowing guarantee in all but adversarial multi-run
    layouts.  The LSH row is kept even when winnow seeds exist (and vice
    versa) — a containment pair can share a band yet fail Jaccard.
    """
    a = np.asarray(group["doc_a"], dtype=np.uint64)
    b = np.asarray(group["doc_b"], dtype=np.uint64)
    pos_a = np.asarray(group["pos_a"], dtype=np.int64)
    pos_b = np.asarray(group["pos_b"], dtype=np.int64)
    origin = np.asarray(group["origin"], dtype=object)
    is_win = (origin == "winnow").astype(np.int8)
    order = np.lexsort((pos_a, is_win, b, a))
    a, b, pos_a, pos_b, origin, is_win = (
        a[order], b[order], pos_a[order], pos_b[order], origin[order], is_win[order]
    )
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(first)[0]
    ends = np.append(starts[1:], len(a))
    has_lsh = is_win[starts] == 0  # lsh rows sort before winnow rows per pair
    keep_parts = [starts[has_lsh]]
    # winnow seed rows for EVERY pair (segment minus the lsh row if present)
    w_starts = starts + has_lsh.astype(np.int64)
    w_lens = ends - w_starts
    nonempty = w_lens > 0
    w_starts, w_lens = w_starts[nonempty], w_lens[nonempty]
    small = w_lens <= max_seeds
    if small.any():
        s, ln = w_starts[small], w_lens[small]
        from ..functions.hashing import _ranges

        keep_parts.append(np.repeat(s, ln) + _ranges(ln))
    for s, ln in zip(w_starts[~small], w_lens[~small]):
        sel = s + np.unique((np.arange(max_seeds) * (ln - 1)) // (max_seeds - 1))
        keep_parts.append(sel)
    keep = np.sort(np.concatenate(keep_parts))
    return {
        "doc_a": a[keep],
        "doc_b": b[keep],
        "origin": origin[keep],
        "pos_a": pos_a[keep],
        "pos_b": pos_b[keep],
    }


def _ctx_attach(
    rows: Dataset,
    prof: Dataset,
    key: str,
    pos_col: str,
    out_col: str,
    window: int,
    k: int,
    num_shards: int,
) -> Dataset:
    """Attach a byte CONTEXT WINDOW of the document text around each seed.

    A >= L common run through a shared k-gram is decidable from the bytes
    within ``window`` (= L) of the seed on each side, so winnow verification
    never needs the full text — this cuts the attach shuffle volume by ~50x
    for long documents.  ``pos_col`` is rewritten to the window-local offset.
    """
    row_schema = rows.schema()
    row_cols = list(row_schema.names)
    row_types = {n: t for n, t in zip(row_schema.names, row_schema.types)}

    def prep_rows(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in row_cols}
        cols[out_col] = pa.nulls(len(t), type=pa.binary())
        cols["__side"] = pa.array(np.ones(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    def filler(n: int, typ) -> pa.Array:
        if isinstance(typ, pa.DataType) and (pa.types.is_integer(typ) or pa.types.is_floating(typ)):
            return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()), typ)
        if isinstance(typ, pa.DataType):
            return pa.nulls(n, type=typ)
        return pa.nulls(n, type=pa.string())  # pandas-backed object column

    def prep_prof(t: pa.Table) -> pa.Table:
        cols = {
            c: (t["doc_id"] if c == key else filler(len(t), row_types[c])) for c in row_cols
        }
        cols[out_col] = pc.cast(t["norm_text"], pa.binary())
        cols["__side"] = pa.array(np.zeros(len(t), dtype=np.int8), pa.int8())
        return pa.table(cols)

    lt = rows.map_batches(prep_rows, batch_format="pyarrow", zero_copy_batch=True)
    rt = prof.select_columns(["doc_id", "norm_text"]).map_batches(
        prep_prof, batch_format="pyarrow", zero_copy_batch=True
    )

    def join_shard(g: dict) -> dict:
        side = np.asarray(g["__side"], dtype=np.int8)
        keys = np.asarray(g[key]).astype(np.uint64)
        texts = np.asarray(g[out_col], dtype=object)
        pos = np.asarray(g[pos_col], dtype=np.int64)
        prof_idx = np.nonzero(side == 0)[0]
        pk = keys[prof_idx]
        order = np.argsort(pk, kind="stable")
        pk = pk[order]
        prof_idx = prof_idx[order]
        row_idx = np.nonzero(side == 1)[0]
        lk = keys[row_idx]
        if len(pk):
            loc = np.minimum(np.searchsorted(pk, lk), len(pk) - 1)
            matched = pk[loc] == lk
        else:
            loc = np.zeros(len(lk), dtype=np.int64)
            matched = np.zeros(len(lk), dtype=bool)
        row_idx = row_idx[matched]
        loc = loc[matched]
        ctx = np.empty(len(row_idx), dtype=object)
        new_pos = np.empty(len(row_idx), dtype=np.int64)
        for i in range(len(row_idx)):
            data = texts[prof_idx[loc[i]]]
            p = int(pos[row_idx[i]])
            lo = max(0, p - window)
            hi = min(len(data), p + k + window)
            ctx[i] = data[lo:hi]
            new_pos[i] = p - lo
        out = {}
        for c in row_cols:
            out[c] = np.asarray(g[c])[row_idx]
        out[pos_col] = new_pos
        out[out_col] = ctx
        return out

    return sharded_group_map(lt.union(rt), [key], join_shard, num_shards=num_shards)


def _drop_verified_shard(group: dict) -> dict:
    """Anti-join: drop winnow seed rows whose pair already verified via LSH."""
    a = np.asarray(group["doc_a"], dtype=np.uint64)
    b = np.asarray(group["doc_b"], dtype=np.uint64)
    origin = np.asarray(group["origin"], dtype=object)
    pos_a = np.asarray(group["pos_a"], dtype=np.int64)
    pos_b = np.asarray(group["pos_b"], dtype=np.int64)
    is_marker = (origin == "verified").astype(np.int8)
    order = np.lexsort((1 - is_marker, b, a))  # markers first within each pair
    a, b, origin, pos_a, pos_b, is_marker = (
        a[order], b[order], origin[order], pos_a[order], pos_b[order], is_marker[order]
    )
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    pair_id = np.cumsum(first) - 1
    starts = np.nonzero(first)[0]
    pair_has_marker = is_marker[starts] == 1
    keep = (is_marker == 0) & ~pair_has_marker[pair_id]
    return {
        "doc_a": a[keep],
        "doc_b": b[keep],
        "origin": origin[keep],
        "pos_a": pos_a[keep],
        "pos_b": pos_b[keep],
    }


def verify_stage(candidates: Dataset, profile: Dataset, cfg: DedupConfig) -> Dataset:
    """candidate_pairs x profile -> verified_pairs (distinct on doc_a, doc_b).

    Two-phase, shuffle-volume-minimizing plan (the dominant cost is shipping
    both documents' text per candidate pair through the attach exchange):

    1. consolidate candidates per pair (1 LSH row + <= 4 spread winnow seeds);
    2. attach profile payload to the LSH rows only and confirm by exact
       Jaccard — near-dup clusters (where winnow seeds are most redundant)
       resolve here;
    3. anti-join the winnow seeds against the phase-2 verdicts: a pair already
       confirmed needs no substring check — this is what keeps lightly-edited
       copy clusters (hundreds of shared fingerprints per pair) from shipping
       text hundreds of times;
    4. attach text to the surviving winnow seeds and seed-extend;
    5. one combine shuffle emits the distinct verified pair set.
    """
    prof = profile.select_columns(["doc_id", "simhash", "n_shingles", "norm_text"])
    prof_a = _rename(
        prof,
        {"doc_id": "doc_a", "simhash": "simhash_a", "n_shingles": "n_shingles_a", "norm_text": "text_a"},
    )
    prof_b = _rename(
        prof,
        {"doc_id": "doc_b", "simhash": "simhash_b", "n_shingles": "n_shingles_b", "norm_text": "text_b"},
    )
    candidates = sharded_group_map(
        candidates, ["doc_a", "doc_b"], _consolidate_shard, num_shards=cfg.group_shards
    ).materialize()  # consumed by both phases; tiny payload (ids + positions)

    # --- phase 1: LSH rows -> exact Jaccard ---
    lsh_rows = _filter_origin(candidates, "lsh", ["doc_a", "doc_b"])
    j1 = shard_attach(
        lsh_rows,
        prof_a,
        key="doc_a",
        payload={"simhash_a": "simhash_a", "n_shingles_a": "n_shingles_a", "text_a": "text_a"},
        num_shards=cfg.group_shards,
    )
    j1 = shard_attach(
        j1,
        prof_b,
        key="doc_b",
        payload={"simhash_b": "simhash_b", "n_shingles_b": "n_shingles_b", "text_b": "text_b"},
        num_shards=cfg.group_shards,
    )
    v_lsh = j1.map_batches(
        _verify_lsh_batch,
        fn_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    ).materialize()  # consumed twice (anti-join markers + final union); small

    # --- phase 2: anti-join winnow seeds, then seed-extend ---
    win_rows = _filter_origin(
        candidates, "winnow", ["doc_a", "doc_b", "origin", "pos_a", "pos_b"]
    )
    markers = v_lsh.map_batches(
        lambda t: pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "origin": pa.array(["verified"] * len(t), pa.string()),
                "pos_a": pa.array(np.full(len(t), -1, dtype=np.int64), pa.int64()),
                "pos_b": pa.array(np.full(len(t), -1, dtype=np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    win_keep = sharded_group_map(
        win_rows.union(markers), ["doc_a", "doc_b"], _drop_verified_shard, num_shards=cfg.group_shards
    )
    j2 = _ctx_attach(
        win_keep, profile, key="doc_a", pos_col="pos_a", out_col="ctx_a",
        window=cfg.min_substring_len, k=cfg.winnow_kgram, num_shards=cfg.group_shards,
    )
    j2 = _ctx_attach(
        j2, profile, key="doc_b", pos_col="pos_b", out_col="ctx_b",
        window=cfg.min_substring_len, k=cfg.winnow_kgram, num_shards=cfg.group_shards,
    )
    v_win = j2.map_batches(
        _verify_winnow_batch,
        fn_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    return sharded_group_map(
        v_lsh.union(v_win), ["doc_a", "doc_b"], _combine_shard_pairs, num_shards=cfg.group_shards
    )

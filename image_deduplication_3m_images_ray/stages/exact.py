"""Exact-duplicate pre-pass: collapse identical normalized texts.

Reference analog: the identical-hash LSH grouping fast path
(/root/reference/modules/deduplication.py:240-249 — LSH key = hash prefix, so
byte-identical hashes group for free).  At Common-Crawl scale the bulk of
duplicates are *exact* copies; collapsing them to one representative before
MinHash/LSH removes the quadratic pair blow-up inside exact-dup bands and
skips signature work for every copy (SURVEY.md §7.2 step 5).

Physical plan — the document TEXT never enters an exchange:

1. each doc is keyed in place by its 128-bit MD5 content hash (md5-128
   equality mis-groups distinct texts w.p. < 1e-15 even at 10^12 docs —
   ``functions.hashing.md5_128``; the byte-exact alternative would ship every
   text through the shuffle for a ~2^-129 gain);
2. ONE tiny exchange of (doc_id, h_lo, h_hi) rows (24 B/row vs KBs/row of
   text) computes rep_id = min doc_id per hash and keeps only the rows of
   actual duplicates (rep_id != doc_id) — on web corpora a small fraction of
   the input;
3. the dup map re-attaches to the full docs either map-side (``ray.put``
   broadcast, when it fits — SURVEY.md §2.4 J1) or via a hash-sharded attach
   above ``broadcast_max_entries`` — the same size-gated two-plan contract as
   ``extras.dedup_ops.embedding_cosine_pairs``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import md5_128_view
from ..functions.text import flat_utf8_view


def _add_md5(batch: pa.Table) -> pa.Table:
    # hash the Arrow UTF-8 buffer in place (memoryview slices): measured
    # 1.44x faster than to_pylist() + per-row str.encode on ~4KB docs
    # (md5 itself dominates), bit-identical digests (round-5 exact_reps
    # profiling, VERDICT task 5)
    offs, data = flat_utf8_view(batch["norm_text"])
    lo, hi = md5_128_view(offs, data)
    return batch.append_column("h_lo", pa.array(lo, pa.uint64())).append_column(
        "h_hi", pa.array(hi, pa.uint64())
    )


def _dup_map_shard(group: dict) -> dict:
    """(doc_id, h_lo, h_hi) shard -> (doc_id, rep_id) rows for DUPLICATES only."""
    lo = np.asarray(group["h_lo"], dtype=np.uint64)
    hi = np.asarray(group["h_hi"], dtype=np.uint64)
    did = np.asarray(group["doc_id"], dtype=np.uint64)
    order = np.lexsort((did, hi, lo))
    lo, hi, did = lo[order], hi[order], did[order]
    first = np.ones(len(did), dtype=bool)
    if len(did) > 1:
        first[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    seg = np.cumsum(first) - 1
    rep = did[np.nonzero(first)[0]][seg]  # min doc_id of each hash group
    dup = rep != did
    return {"doc_id": did[dup], "rep_id": rep[dup]}


def _broadcast_rep_attach(ref):
    """Map-side rep_id attach: plasma-shared sorted dup map, zero-copy reads.

    ``ray.get`` of an in-store object from a task is a shared-memory map, so
    every task on a node reads the SAME broadcast buffer (no per-batch
    re-ship — SURVEY.md §2.4 J1 broadcast pattern)."""

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids, reps = _ray.get(ref)
        did = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        rep = did.copy()
        if len(ids):
            pos = np.searchsorted(ids, did)
            pos[pos == len(ids)] = len(ids) - 1
            hit = ids[pos] == did
            rep[hit] = reps[pos[hit]]
        return batch.append_column("rep_id", pa.array(rep, pa.uint64()))

    return fn


def exact_rep_stage(
    docs: Dataset, cfg: DedupConfig, broadcast_max_entries: int = 5_000_000
) -> Dataset:
    """docs -> docs + ``rep_id`` column (min doc_id among identical norm_text).

    Rows with ``rep_id == doc_id`` are the representatives that continue into
    signatures/LSH; the full mapping re-attaches exact copies to the final
    clusters without ever shuffling them through the pair stages.
    """
    import ray as _ray

    from ..util import shard_attach, sharded_group_map

    # ONE materialize: md5 keys fuse into the (possibly lazy) extract pass,
    # and the pinned hashed table then feeds both the tiny key exchange and
    # the attach pass without re-executing upstream
    hashed = docs.map_batches(
        _add_md5, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
    ).materialize()
    keys = hashed.select_columns(["doc_id", "h_lo", "h_hi"])
    dup_map = sharded_group_map(
        keys, ["h_lo", "h_hi"], _dup_map_shard, num_shards=cfg.group_shards
    ).materialize()
    n_dups = dup_map.count()
    base = hashed.map_batches(
        lambda t: t.drop_columns(["h_lo", "h_hi"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if n_dups <= broadcast_max_entries:
        if n_dups:
            parts = [t for t in _ray.get(dup_map.to_arrow_refs()) if t.num_rows]
            tbl = pa.concat_tables(parts).combine_chunks()
            ids = np.asarray(tbl["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            reps = np.asarray(tbl["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
            order = np.argsort(ids, kind="stable")
            ids, reps = ids[order], reps[order]
        else:
            ids = np.empty(0, dtype=np.uint64)
            reps = np.empty(0, dtype=np.uint64)
        ref = _ray.put((ids, reps))
        return base.map_batches(
            _broadcast_rep_attach(ref),
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            zero_copy_batch=True,
        )
    # scale path: hash-sharded attach of the (still tiny-per-row) dup map
    out = shard_attach(
        base,
        dup_map,
        key="doc_id",
        payload={"rep_id": "rep_id"},
        num_shards=cfg.group_shards,
        how="left_outer",
    )

    def fill(t: pa.Table) -> pa.Table:
        rep = np.asarray(t["rep_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        filled = np.where(rep == 0, did, rep)
        return t.set_column(
            t.column_names.index("rep_id"), "rep_id", pa.array(filled, pa.uint64())
        )

    return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def reps_only(docs_rep: Dataset) -> Dataset:
    """Filter docs_rep to the representative rows (vectorized predicate)."""
    return docs_rep.map_batches(
        lambda t: t.filter(pa.compute.equal(t["doc_id"], t["rep_id"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

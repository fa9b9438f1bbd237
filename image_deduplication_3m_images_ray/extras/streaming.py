"""Streaming incremental dedup: a shared mutable LSH index as raw Ray actors.

This is the one operator that deliberately drops below the Dataset API (task
brief: raw tasks/actors only where Dataset semantics genuinely don't fit —
"e.g. a shared mutable index").  The semantics are arrival-order-dependent:
each document is flagged against everything seen BEFORE it in the stream, so
the operator's state grows monotonically as the stream advances — not
expressible as a stateless batch transform or a groupby (which would see the
whole corpus at once and lose the online "first occurrence wins" contract).

Shape: signature computation stays DISTRIBUTED (a normal ``map_batches`` over
the Dataset — the heavy compute never touches the driver); the driver then
consumes ``iter_batches`` (the streaming-consumption path, ordered) and routes
each batch's LSH band keys to ``n_shards`` index actors by ``band_key %
n_shards`` — the documented partitioning assumption: a band key's bucket
lives on exactly one actor, so "was this band seen before?" is one dict probe
with no cross-actor coordination.  Actors process offers serially (Ray actor
semantics), which preserves stream order per shard.

Reference analog: the incremental grouping mode that updates
``hash_groups``/``processed_hashes`` dicts as images arrive
(/root/reference/modules/deduplication.py:240-283) — there a single-process
dict, here sharded actors so the index scales horizontally with cluster size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import band_hashes_batch, oph_minhash_simhash_batch
from ..functions.text import normalize_array, shingle_batch


@ray.remote
class DedupIndexShard:
    """One shard of the shared mutable band-key index.

    ``offer`` registers each (band_key, doc_id) pair and returns, per pair,
    the doc_id that FIRST registered that band key (0 if this pair is the
    first).  The per-entry dict loop IS the operator — the state is a hash
    map, and updates must observe earlier entries in the same call (two
    identical docs in one batch: the first registers, the second matches).
    """

    def __init__(self):
        self._first: dict = {}

    def offer(self, band_keys: np.ndarray, doc_ids: np.ndarray) -> np.ndarray:
        out = np.zeros(len(band_keys), dtype=np.uint64)
        first = self._first
        for i, (k, d) in enumerate(zip(band_keys.tolist(), doc_ids.tolist())):
            prev = first.get(k)
            if prev is None:
                first[k] = d
            else:
                out[i] = prev
        return out

    def n_keys(self) -> int:
        return len(self._first)


def stream_dedup(
    docs: Dataset,
    cfg: DedupConfig | None = None,
    n_shards: int = 8,
    batch_size: int = 4096,
) -> pa.Table:
    """Online near-dup flagging: (doc_id, text) stream -> (doc_id, dup_of).

    ``dup_of`` is 0 for a first-seen / unique doc, else the doc_id of the
    earliest stream element sharing an LSH band (identical texts share ALL
    bands, so exact copies always flag their first occurrence; near-dups flag
    with the usual MinHash-LSH probability).  Deterministic for a fixed input
    order.  The returned table is driver-resident by design — it is the
    stream consumer's running verdict, O(1) small per row.
    """
    cfg = cfg or DedupConfig()
    rows_per_band = cfg.num_perms // cfg.bands

    def sig(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        shingles, offsets = shingle_batch(norm, cfg.shingle_k)
        sigs, _, _ = oph_minhash_simhash_batch(shingles, offsets, cfg.num_perms, cfg.seed)
        mh = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), cfg.num_perms
        )
        return pa.table(
            {
                "doc_id": pa.compute.cast(t["doc_id"], pa.uint64()),
                "minhash": mh,
            }
        )

    prof = docs.map_batches(sig, batch_format="pyarrow", batch_size=batch_size,
                            zero_copy_batch=True)
    shards = [DedupIndexShard.remote() for _ in range(n_shards)]
    out_ids, out_dups = [], []
    for batch in prof.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        n = len(batch)
        if n == 0:
            continue
        mh = batch["minhash"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        flat = np.asarray(mh.flatten().to_numpy(zero_copy_only=False), dtype=np.uint64)
        sigs = flat.reshape(n, cfg.num_perms)
        bh = band_hashes_batch(sigs, cfg.bands, rows_per_band)  # (n, bands)
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), dtype=np.uint64)
        if (ids == 0).any():
            raise ValueError("stream_dedup requires nonzero doc_ids (0 is the no-dup sentinel)")
        keys = bh.reshape(-1)
        owners = np.repeat(ids, cfg.bands)
        shard_of = (keys % np.uint64(n_shards)).astype(np.int64)
        futures, masks = [], []
        for s in range(n_shards):
            m = shard_of == s
            if m.any():
                futures.append(shards[s].offer.remote(keys[m], owners[m]))
                masks.append(m)
        matches = np.zeros(len(keys), dtype=np.uint64)
        for m, r in zip(masks, ray.get(futures)):
            matches[m] = r
        # per doc: earliest (minimum nonzero) matched id across its bands
        per_doc = matches.reshape(n, cfg.bands)
        masked = np.where(per_doc == 0, np.uint64(0xFFFFFFFFFFFFFFFF), per_doc)
        best = masked.min(axis=1)
        dup_of = np.where(best == np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0), best)
        out_ids.append(ids)
        out_dups.append(dup_of)
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_ids) if out_ids else [], pa.uint64()),
            "dup_of": pa.array(np.concatenate(out_dups) if out_dups else [], pa.uint64()),
        }
    )

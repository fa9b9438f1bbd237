"""Exact-duplicate pre-pass: collapse byte-identical normalized texts.

Reference analog: the identical-hash LSH grouping fast path
(/root/reference/modules/deduplication.py:240-249 — LSH key = hash prefix, so
byte-identical hashes group for free).  At Common-Crawl scale the bulk of
duplicates are *exact* copies; collapsing them to one representative before
MinHash/LSH removes the quadratic pair blow-up inside exact-dup bands and
skips signature work for every copy (SURVEY.md §7.2 step 5).

The shuffle key is ``text_hash`` (64-bit) but the group function partitions by
the *actual* ``norm_text`` within each hash bucket, so a 64-bit collision can
never merge two distinct texts — the pass is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import U64, splitmix64


def _add_text_hash(batch: pa.Table) -> pa.Table:
    texts = np.asarray(batch["norm_text"].to_pylist(), dtype=object)
    h = splitmix64(pd.util.hash_array(texts).astype(U64) ^ U64(0x7E47))
    return batch.append_column("text_hash", pa.array(h, pa.uint64()))


def _pick_reps_shard(group: pd.DataFrame) -> pd.DataFrame:
    # group by (hash, actual text) across the whole shard — the text split
    # makes a 64-bit collision harmless; transform('min') is one C pass
    out = group.copy()
    out["rep_id"] = (
        out.groupby(["text_hash", "norm_text"], sort=False)["doc_id"]
        .transform("min")
        .astype(np.uint64)
    )
    return out.drop(columns=["text_hash"])


def exact_rep_stage(docs: Dataset, cfg: DedupConfig) -> Dataset:
    """docs -> docs + ``rep_id`` column (min doc_id among byte-identical norm_text).

    Rows with ``rep_id == doc_id`` are the representatives that continue into
    signatures/LSH; the full mapping re-attaches exact copies to the final
    clusters without ever shuffling them through the pair stages.
    """
    from ..util import sharded_group_map

    hashed = docs.map_batches(
        _add_text_hash, batch_format="pyarrow", batch_size=cfg.batch_size, zero_copy_batch=True
    )
    return sharded_group_map(
        hashed,
        ["text_hash"],
        _pick_reps_shard,
        num_shards=cfg.group_shards,
        batch_format="pandas",
    )


def reps_only(docs_rep: Dataset) -> Dataset:
    """Filter docs_rep to the representative rows (vectorized predicate)."""
    return docs_rep.map_batches(
        lambda t: t.filter(pa.compute.equal(t["doc_id"], t["rep_id"])),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

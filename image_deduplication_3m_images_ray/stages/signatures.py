"""Signature stage: docs -> profile (MinHash-128 + SimHash-64 + quality).

Reference analog: Stage 1 feature computation — wavelet hash + quality score
computed once and cached for reuse by later stages
(/root/reference/modules/memory_efficient_deduplication.py:188-287, quality
caching at :233-246).  MinHash plays the global-embedding role
(/root/reference/modules/feature_extraction.py:206-237) and SimHash the
wavelet-hash role (:278-315).

This is the canonical *stateful actor-pool* stage: the 128-permutation seed
table and config are built once per actor in ``__init__`` (the reference
wastefully re-instantiates its extractor per group —
/root/reference/modules/memory_efficient_deduplication.py:804-806); ``__call__``
does fully-vectorized segmented-reduction MinHash/SimHash per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import minhash_seeds, minhash_simhash_batch
from ..functions.text import shingle_batch


class SignatureActor:
    """Callable class for ``map_batches`` — one instance per pool actor."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.seeds = minhash_seeds(cfg.num_perms, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        norm = (
            batch["norm_text"].combine_chunks()
            if isinstance(batch["norm_text"], pa.ChunkedArray)
            else batch["norm_text"]
        )
        shingles, offsets = shingle_batch(norm, cfg.shingle_k)
        sigs, simhashes, n_unique = minhash_simhash_batch(shingles, offsets, self.seeds)
        minhash_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), cfg.num_perms
        ).cast(pa.list_(pa.uint64()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": batch["url"],
                "norm_text": norm,
                "minhash": minhash_col,
                "simhash": pa.array(simhashes, pa.uint64()),
                "n_shingles": pa.array(n_unique, pa.int64()),
                # doc quality = extracted-text length (FIXTURES.md §4), the
                # analog of the reference's Laplacian-variance score
                # (/root/reference/modules/deduplication.py:1575-1609)
                "quality": pa.compute.cast(batch["n_chars"], pa.float64()),
            }
        )


def signature_stage(docs: Dataset, cfg: DedupConfig) -> Dataset:
    """docs -> profile(doc_id, url, norm_text, minhash, simhash, n_shingles, quality)."""
    return docs.map_batches(
        SignatureActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.signature_concurrency,
        num_cpus=1,
        zero_copy_batch=True,
    )

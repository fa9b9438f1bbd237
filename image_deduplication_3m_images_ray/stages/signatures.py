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
from ..functions.hashing import oph_minhash_simhash_batch
from ..functions.text import shingle_batch


class SignatureKernel:
    """Per-batch signature computation, shipped to stateless map tasks.

    Signatures are one-permutation MinHash (see
    :func:`functions.hashing.oph_minhash_simhash_batch`): one pass over the
    shingle stream instead of 128 — the signature stage is then bounded by
    tokenize+shingle, not by the sketch.  OPH removed the per-actor state
    (the 128-permutation seed table), so the stage runs as plain TASKS on
    long-lived Ray workers: an actor pool here would only add pool spawn +
    import latency per execution (measured 5x slower at 16 cpus on 50k docs).
    The canonical stateful actor-pool pattern (SURVEY.md §2.3 A1) lives in
    the stages that still hold real state: ``extras.textstats.LangIdActor``
    (compiled vocab), ``extras.multimodal.DecodeActor`` (decoder),
    ``extras.dedup_ops._CosinePairActor`` (broadcast matrix)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        norm = (
            batch["norm_text"].combine_chunks()
            if isinstance(batch["norm_text"], pa.ChunkedArray)
            else batch["norm_text"]
        )
        shingles, offsets = shingle_batch(norm, cfg.shingle_k)
        sigs, simhashes, _ = oph_minhash_simhash_batch(
            shingles, offsets, cfg.num_perms, cfg.seed
        )
        # the sorted UNIQUE shingle set per doc travels in the profile so the
        # verify stage's exact Jaccard is pure set arithmetic — tokenization
        # happens exactly ONCE per document, here
        from ..functions.hashing import U64, unique_per_doc

        uflat, uoffs = unique_per_doc(shingles.astype(U64), offsets)
        shingle_set = pa.ListArray.from_arrays(
            pa.array(uoffs.astype(np.int32), pa.int32()), pa.array(uflat, pa.uint64())
        )
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
                "n_shingles": pa.array(np.diff(uoffs), pa.int64()),
                "shingle_set": shingle_set,
                # doc quality = extracted-text length (FIXTURES.md §4), the
                # analog of the reference's Laplacian-variance score
                # (/root/reference/modules/deduplication.py:1575-1609)
                "quality": pa.compute.cast(batch["n_chars"], pa.float64()),
            }
        )


# backwards-compatible name (the round-1 actor-pool spelling)
SignatureActor = SignatureKernel


def signature_stage(docs: Dataset, cfg: DedupConfig) -> Dataset:
    """docs -> profile(doc_id, url, norm_text, minhash, simhash, n_shingles, quality)."""
    return docs.map_batches(
        SignatureKernel(cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )

"""DSIR-style importance weights (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling").

``dsir_weights`` scores every raw-corpus document by the log likelihood
ratio of a hashed-bigram bag-of-ngrams model fit on a TARGET corpus vs one
fit on the RAW corpus itself — the published recipe for selecting
pretraining data that "looks like" a trusted target distribution.  The
weights feed :func:`extras.relational.importance_sample` (deterministic
Bernoulli keep) or a top-k cut for the actual resampling step.

Scale shape (all fixed-size, no all-to-all):

1. **Bucket-count pass** over target and raw — each block folds its word
   bigrams to ONE dense ``n_buckets`` count vector (md5 of the distinct
   grams only), so the driver merge is fixed bytes per block
   (8 B x n_buckets = 80 KB at the paper's 10k buckets) regardless of
   corpus size — the per-block-scalars contract.
2. **Log-ratio broadcast** — the add-one-smoothed
   ``ln(p_target(b)) - ln(p_raw(b))`` vector ships once via ``ray.put``.
3. **Score scan** over the raw corpus — one stateless vectorized
   ``map_batches``; per-doc weight = sum of its grams' broadcast ratios.

The bucket hash is md5-anchored (``functions.hashing.md5_u64`` ==
DuckDB ``md5_number_lower``) so the whole operator has an exact ANSI-SQL
oracle; a production deployment would swap the documented fast hash in.

Reference analog: the reference has no data-selection stage; this extends
the quality-scoring family (SURVEY.md M9/M10) the way lm_score does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

__all__ = ["dsir_weights"]


def _block_bucket_counts(text_col, n_buckets: int) -> np.ndarray:
    """Dense int64 bucket-count vector of one block's word bigrams."""
    from ..functions.hashing import md5_u64
    from .textstats import _word_ngram_strings

    g, _, _ = _word_ngram_strings(text_col, 2)
    counts = np.zeros(n_buckets, dtype=np.int64)
    if len(g):
        ug, inv = np.unique(g, return_inverse=True)
        buckets = (md5_u64(list(ug)) % np.uint64(n_buckets)).astype(np.int64)
        np.add.at(counts, buckets[inv], 1)
    return counts


def _corpus_bucket_counts(ds: Dataset, n_buckets: int, batch_size: int) -> np.ndarray:
    """Fold a corpus to ONE bucket-count vector (fixed bytes per block)."""
    import ray as _ray

    def partial(t: pa.Table) -> pa.Table:
        counts = _block_bucket_counts(t["text"], n_buckets)
        return pa.table(
            {
                "c": pa.FixedSizeListArray.from_arrays(
                    pa.array(counts, pa.int64()), n_buckets
                )
            }
        )

    total = np.zeros(n_buckets, dtype=np.int64)
    for blk in _ray.get(
        ds.map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        ).to_arrow_refs()
    ):
        if blk.num_rows:
            vecs = np.asarray(
                blk["c"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
                dtype=np.int64,
            ).reshape(-1, n_buckets)
            total += vecs.sum(axis=0)
    return total


def dsir_weights(
    raw: Dataset,
    target: Dataset,
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    batch_size: int = 2048,
) -> Dataset:
    """Per-document DSIR log importance weight of ``raw`` against ``target``.

    Both inputs need (``id_col``, text).  Feature = word bigrams hashed into
    ``n_buckets`` buckets (md5, SQL-anchored); both bag-of-ngrams models are
    add-one smoothed over the bucket space, so empty buckets are defined and
    the weight of a doc with no bigrams is exactly 0.

    Output: (``id_col``, n_grams, log_weight) — one row per RAW doc, where
    ``log_weight = sum_grams [ln p_target(bucket) - ln p_raw(bucket)]``.
    Positive = looks more like the target than like the raw corpus.

    ``raw`` is consumed by two passes (counts, scoring) and is
    ``materialize()``d once; ``target`` is consumed once.
    """
    import ray as _ray

    pinned = raw.materialize()
    t_counts = _corpus_bucket_counts(target, n_buckets, batch_size)
    q_counts = _corpus_bucket_counts(pinned, n_buckets, batch_size)
    log_ratio = np.log((t_counts + 1.0) / (t_counts.sum() + n_buckets)) - np.log(
        (q_counts + 1.0) / (q_counts.sum() + n_buckets)
    )
    ref = _ray.put(log_ratio)

    def score(t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64
        from .textstats import _word_ngram_strings

        lr = _ray.get(ref)
        g, doc_of, n_rows = _word_ngram_strings(t["text"], 2)
        n_grams = np.zeros(n_rows, dtype=np.int64)
        lw = np.zeros(n_rows, dtype=np.float64)
        if len(g):
            ug, inv = np.unique(g, return_inverse=True)
            buckets = (md5_u64(list(ug)) % np.uint64(n_buckets)).astype(np.int64)
            np.add.at(n_grams, doc_of, 1)
            np.add.at(lw, doc_of, lr[buckets[inv]])
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": pa.array(n_grams, pa.int64()),
                "log_weight": pa.array(lw, pa.float64()),
            }
        )

    return pinned.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

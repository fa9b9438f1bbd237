"""Hashed-ngram generative models: DSIR importance weights and a
multi-class Naive Bayes text classifier.

``dsir_weights`` is the binary form (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling"); :func:`nb_classify` is the
multi-class form — the fastText-style "looks like Wikipedia" quality /
domain classifier CCNet-family pipelines train to label raw crawl text.
Both share one scale shape: fixed-size per-block count folds, one broadcast
model, one stateless vectorized scoring scan.

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

__all__ = ["dsir_weights", "nb_classify"]


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


def _class_bucket_counts(
    train: Dataset, label_col: str, n_buckets: int, batch_size: int,
    max_classes: int,
):
    """One labeled-corpus pass -> (sorted class labels, per-class gram-bucket
    count matrix (C, n_buckets), per-class doc counts).

    Each block folds to ONE fixed-size row per class IT saw (count vector +
    doc count), so the driver merge holds at most
    ``max_classes x n_buckets`` int64 (5 MB at 64 x 10k) — raising, not
    truncating, when the label cardinality exceeds the gate."""
    import ray as _ray

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64
        from .textstats import _word_ngram_strings

        labels = np.asarray(t[label_col].to_pylist(), dtype=object)
        ul, linv = np.unique(labels, return_inverse=True)
        g, doc_of, _ = _word_ngram_strings(t["text"], 2)
        mat = np.zeros((len(ul), n_buckets), dtype=np.int64)
        if len(g):
            ug, inv = np.unique(g, return_inverse=True)
            buckets = (md5_u64(list(ug)) % np.uint64(n_buckets)).astype(np.int64)
            np.add.at(mat.reshape(-1), linv[doc_of] * n_buckets + buckets[inv], 1)
        nd = np.bincount(linv, minlength=len(ul)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(list(ul), pa.string()),
                "n_docs": pa.array(nd, pa.int64()),
                "c": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.int64()), n_buckets
                ),
            }
        )

    acc: dict[str, tuple[np.ndarray, int]] = {}
    for blk in _ray.get(
        train.map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        ).to_arrow_refs()
    ):
        if not blk.num_rows:
            continue
        vecs = np.asarray(
            blk["c"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
            dtype=np.int64,
        ).reshape(-1, n_buckets)
        for lab, nd, vec in zip(
            blk["label"].to_pylist(), blk["n_docs"].to_pylist(), vecs
        ):
            old = acc.get(lab)
            acc[lab] = (
                (old[0] + vec, old[1] + nd) if old is not None else (vec.copy(), nd)
            )
            if len(acc) > max_classes:
                raise ValueError(
                    f"nb_classify: more than max_classes={max_classes} distinct "
                    f"'{label_col}' values; raise the gate explicitly if intended"
                )
    classes = sorted(acc)
    mat = np.stack([acc[c][0] for c in classes]) if classes else np.zeros(
        (0, n_buckets), np.int64
    )
    nd = np.array([acc[c][1] for c in classes], dtype=np.int64)
    return classes, mat, nd


def nb_classify(
    docs: Dataset,
    train: Dataset | None = None,
    label_col: str = "lang",
    n_buckets: int = 10_000,
    id_col: str = "doc_id",
    batch_size: int = 2048,
    max_classes: int = 64,
) -> Dataset:
    """Multinomial Naive Bayes over hashed word bigrams: label every doc in
    ``docs`` with the most likely class from ``train`` (default: ``docs``
    itself, which must then carry ``label_col``).

    The CCNet-style quality/domain classifier: train on a labeled corpus
    ("Wikipedia" vs "raw crawl", or language, or source), score the whole
    crawl.  Add-one smoothing over the bucket space; all log probabilities
    are quantized to integer MICROBITS (``floor(ln(p) * 1e6 + 0.5)``, the
    ``extras.lm`` convention) so per-doc per-class sums are exact integers —
    order-independent across partitionings and bit-equal to the SQL oracle.

    Output: (``id_col``, pred_label, score_micro, margin_micro) — the argmax
    class (ties broken toward the lexicographically smallest label), its
    integer log-posterior, and the gap to the runner-up (0 when only one
    class exists).  Scale shape: one labeled-corpus fold (fixed bytes per
    block), one ``(C x n_buckets)`` int64 model broadcast via ``ray.put``,
    one stateless scoring scan.
    """
    import ray as _ray

    self_train = train is None
    pinned = docs.materialize() if self_train else docs
    classes, mat, nd = _class_bucket_counts(
        pinned if self_train else train, label_col, n_buckets, batch_size,
        max_classes,
    )
    if not classes:
        raise ValueError("nb_classify: training corpus is empty")
    tc = mat.sum(axis=1)
    mlp = np.floor(
        np.log((mat + 1.0) / (tc[:, None] + n_buckets)) * 1e6 + 0.5
    ).astype(np.int64)
    prior = np.floor(np.log(nd / nd.sum()) * 1e6 + 0.5).astype(np.int64)
    ref = _ray.put((classes, mlp, prior))

    def score(t: pa.Table) -> pa.Table:
        from ..functions.hashing import md5_u64
        from .textstats import _word_ngram_strings

        cls, m, pr = _ray.get(ref)
        g, doc_of, n_rows = _word_ngram_strings(t["text"], 2)
        scores = np.tile(pr, (n_rows, 1))
        if len(g):
            ug, inv = np.unique(g, return_inverse=True)
            buckets = (md5_u64(list(ug)) % np.uint64(n_buckets)).astype(np.int64)
            np.add.at(scores, doc_of, m[:, buckets[inv]].T)
        pred = np.argmax(scores, axis=1)  # classes sorted asc -> min-label ties
        best = scores[np.arange(n_rows), pred]
        margin = (
            best - np.sort(scores, axis=1)[:, -2]
            if len(cls) > 1
            else np.zeros(n_rows, np.int64)
        )
        return pa.table(
            {
                id_col: t[id_col],
                "pred_label": pa.array([cls[i] for i in pred], pa.string()),
                "score_micro": pa.array(best, pa.int64()),
                "margin_micro": pa.array(margin, pa.int64()),
            }
        )

    return pinned.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

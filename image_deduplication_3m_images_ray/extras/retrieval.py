"""BM25 retrieval over a documents table — the search primitive a curation
stack uses for query-driven corpus exploration and retrieval-based
decontamination (find the training docs most similar to a benchmark prompt).

Reference analog: the reference ranks cluster members by a quality score and
keeps the best (/root/reference/modules/deduplication.py best-of-cluster
selection); this operator is the query-driven generalization — rank the whole
corpus against a term query.

Scale shape (no all-to-all):

1. STATS — one fold pass over the corpus where each block contributes ONE
   fixed-size partial row (doc count, token count, per-query-term
   document-frequency vector); the driver only ever holds Q + 2 integers per
   block.
2. SCORE — the per-term idf vector is ``ray.put`` once and every scoring
   task reads it; one embarrassingly parallel ``map_batches`` pass computes
   every matching doc's score and emits only its block-local top-k rows.
3. TOP-K — a final distributed sort over the tiny per-block survivors
   (<= k rows per block) + ``limit(k)``.

Exactness contract (the repo's integer-microbit convention, see
``extras/lm.py``): Okapi BM25 at the standard k1 = 1.2, b = 0.75.  With
``N`` docs, ``S`` total tokens, per-doc length ``dl`` and term frequency
``tf``, the tf saturation term

    tf*(k1+1) / (tf + k1*(1 - b + b*dl/(S/N)))

is the exact integer ratio ``22*tf*S / (10*tf*S + 3*S + 9*dl*N)`` (multiply
through by ``10*S``), evaluated in float64 with a PINNED operation order so
DuckDB reproduces it bit-for-bit; idf is pinned to integer microbits
``floor(log2((2*(N-df)+1)/(2*df+1)) * 1e6 + 0.5)`` (numpy and DuckDB
``log2`` agree to 1 ulp, far inside the microbit quantum — the ``extras/lm``
precedent), and each (doc, term) contribution is floored half-up to an
integer so per-doc sums are order-independent exact integers.

Tokens split the raw text on single spaces (the ``ngram_counts`` /
``extras.lm`` gram contract, so the SQL oracle reuses ``string_split``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["bm25_topk"]


def _block_tokens(text_col):
    """(flat unicode token array, doc offsets) for a block's text column."""
    toks = pc.split_pattern(text_col, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False)).astype(np.str_)
    return flat, offs


def _term_hits(flat: np.ndarray, offs: np.ndarray, qarr: np.ndarray):
    """(doc index, query-term index) of every query-term occurrence."""
    n_rows = len(offs) - 1
    if len(flat) == 0 or len(qarr) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), n_rows
    pos = np.minimum(np.searchsorted(qarr, flat), len(qarr) - 1)
    hit = qarr[pos] == flat
    doc_of = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offs))
    return doc_of[hit], pos[hit].astype(np.int64), n_rows


def bm25_topk(
    docs: Dataset,
    query_terms: list,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 1024,
) -> Dataset:
    """Top-``k`` docs by Okapi BM25 score against a bag of query terms.

    Output: (``id_col``, score_micro) — integer microbit scores, ordered
    score desc then ``id_col`` asc, at most ``k`` rows.  Only docs containing
    at least one query term are candidates (a doc matching nothing scores
    nothing, exactly like the SQL oracle's join).  Duplicate query terms are
    collapsed (BM25 over a term SET; repeat-weighted queries belong in a
    query-side tf extension, not silent double counting).

    ``docs`` is consumed by two passes (stats fold, scoring) and is
    ``materialize()``d once.  When NO doc matches, the result has 0 rows
    (Ray's sort drops column metadata from an all-empty dataset).
    """
    import ray as _ray

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    if k <= 0:
        raise ValueError("bm25_topk: k must be positive")
    n_q = len(terms)
    qarr = np.asarray(terms, dtype=np.str_)

    pinned = docs.materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, offs = _block_tokens(t[text_col])
        doc_of, qi, n_rows = _term_hits(flat, offs, qarr)
        # distinct (doc, term) pairs -> per-term df partial (docs never
        # straddle blocks, so block partials sum to the global df)
        pairs = np.unique(doc_of * n_q + qi)
        df = np.bincount(pairs % n_q, minlength=n_q).astype(np.int64)
        return pa.table(
            {
                "n_docs": pa.array([n_rows], pa.int64()),
                "n_tokens": pa.array([len(flat)], pa.int64()),
                "df": pa.FixedSizeListArray.from_arrays(pa.array(df, pa.int64()), n_q),
            }
        )

    n_docs = 0
    n_tokens = 0
    df = np.zeros(n_q, dtype=np.int64)
    for blk in _ray.get(
        pinned.map_batches(
            stats_partial,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        ).to_arrow_refs()
    ):
        if blk.num_rows:
            n_docs += pc.sum(blk["n_docs"]).as_py()
            n_tokens += pc.sum(blk["n_tokens"]).as_py()
            vecs = np.asarray(
                blk["df"].combine_chunks().flatten().to_numpy(zero_copy_only=False),
                dtype=np.int64,
            ).reshape(-1, n_q)
            df += vecs.sum(axis=0)

    if n_docs == 0:
        return pinned.map_batches(
            lambda t: pa.table(
                {id_col: pa.array([], pa.int64()), "score_micro": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )

    # idf pinned to integer microbits (half-up); ratio of exact odd integers
    ratio = (2.0 * (n_docs - df) + 1.0) / (2.0 * df + 1.0)
    idf_micro = np.floor(np.log2(ratio) * 1e6 + 0.5).astype(np.int64)
    idf_ref = _ray.put(idf_micro)
    s_tok = float(n_tokens)
    n_d = float(n_docs)

    def score(t: pa.Table) -> pa.Table:
        idf = _ray.get(idf_ref).astype(np.float64)
        flat, offs = _block_tokens(t[text_col])
        doc_of, qi, n_rows = _term_hits(flat, offs, qarr)
        ids = np.asarray(
            pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False), np.int64
        )
        tf = np.bincount(doc_of * n_q + qi, minlength=n_rows * n_q).reshape(
            n_rows, n_q
        ).astype(np.float64)
        dl = np.diff(offs).astype(np.float64)
        # pinned float64 operation order — the SQL oracle mirrors these
        # parentheses exactly, so both engines round identically per step
        num = (22.0 * tf) * s_tok
        den = ((10.0 * tf) * s_tok + 3.0 * s_tok) + (9.0 * dl)[:, None] * n_d
        contrib = np.floor(idf[None, :] * (num / den) + 0.5).astype(np.int64)
        score_micro = contrib.sum(axis=1)
        keep = tf.sum(axis=1) > 0
        ids, score_micro = ids[keep], score_micro[keep]
        # block-local top-k: the exchange ships <= k rows per block
        order = np.lexsort((ids, -score_micro))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order], pa.int64()),
                "score_micro": pa.array(score_micro[order], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return parts.sort(["score_micro", id_col], descending=[True, False]).limit(k)

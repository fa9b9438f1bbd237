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

__all__ = ["bm25_topk", "bm25_join"]


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


def _corpus_term_stats(pinned: Dataset, qarr: np.ndarray, text_col: str, batch_size: int):
    """(n_docs, n_tokens, per-term df) — one fold pass, fixed bytes/block."""
    import ray as _ray

    n_q = len(qarr)

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
    return n_docs, n_tokens, df


def _idf_micro(n_docs: int, df: np.ndarray) -> np.ndarray:
    """Integer-microbit idf (half-up); ratio of exact odd integers."""
    ratio = (2.0 * (n_docs - df) + 1.0) / (2.0 * df + 1.0)
    return np.floor(np.log2(ratio) * 1e6 + 0.5).astype(np.int64)


def _contrib_micro(
    tf: np.ndarray, dl: np.ndarray, idf: np.ndarray, s_tok: float, n_d: float
) -> np.ndarray:
    """Floored per-(doc, term) BM25 contributions (pinned float64 op order —
    the SQL oracle mirrors these parentheses exactly, so both engines round
    identically per step).  ``tf``: (n_rows, T) float64; ``dl``: (n_rows,)."""
    num = (22.0 * tf) * s_tok
    den = ((10.0 * tf) * s_tok + 3.0 * s_tok) + (9.0 * dl)[:, None] * n_d
    return np.floor(idf[None, :].astype(np.float64) * (num / den) + 0.5).astype(
        np.int64
    )


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
    n_docs, n_tokens, df = _corpus_term_stats(pinned, qarr, text_col, batch_size)

    if n_docs == 0:
        return pinned.map_batches(
            lambda t: pa.table(
                {id_col: pa.array([], pa.int64()), "score_micro": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )

    idf_ref = _ray.put(_idf_micro(n_docs, df))
    s_tok = float(n_tokens)
    n_d = float(n_docs)

    def score(t: pa.Table) -> pa.Table:
        idf = _ray.get(idf_ref)
        flat, offs = _block_tokens(t[text_col])
        doc_of, qi, n_rows = _term_hits(flat, offs, qarr)
        ids = np.asarray(
            pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False), np.int64
        )
        tf = np.bincount(doc_of * n_q + qi, minlength=n_rows * n_q).reshape(
            n_rows, n_q
        ).astype(np.float64)
        dl = np.diff(offs).astype(np.float64)
        contrib = _contrib_micro(tf, dl, idf, s_tok, n_d)
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


def bm25_join(
    docs: Dataset,
    queries: Dataset,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    max_queries: int = 100_000,
    batch_size: int = 1024,
) -> Dataset:
    """Per-query BM25 top-``k`` over a corpus — the retrieval JOIN shape
    (one benchmark prompt per ``queries`` row; "which training docs does
    each eval question retrieve?" is the retrieval-decontamination audit).

    Output: (``query_id_col``, ``id_col``, score_micro, rank) with rank =
    SQL ``row_number() OVER (PARTITION BY query ORDER BY score DESC, id)``,
    at most ``k`` rows per query.  A query's terms are the distinct tokens
    of its text (space-split, same contract as :func:`bm25_topk`); df/idf
    are computed once over the UNION of all query terms, so adding queries
    never changes another query's scores.

    Scale shape: ``queries`` is the small side — collected once under
    ``max_queries`` (raising, not truncating) and broadcast with the idf
    vector; the corpus side is one stats fold + one stateless scoring scan
    emitting at most ``k`` rows per (block, query) (block-local top-k is a
    valid combiner under the total order); the only exchange is
    :func:`..relational.group_topk`'s O(k x n_queries)-row shuffle.
    ``docs`` is consumed by two passes and ``materialize()``d once.
    """
    import ray as _ray

    from .relational import _topk_select, group_topk

    if k <= 0:
        raise ValueError("bm25_join: k must be positive")
    try:
        qrows = queries.take_all(limit=max_queries)
    except ValueError as e:
        raise ValueError(
            f"bm25_join: queries exceed max_queries={max_queries}; BM25's "
            "small side must broadcast — shard the query table and union "
            "the per-shard joins instead"
        ) from e
    if not qrows:
        raise ValueError("bm25_join: queries table is empty")
    qids = [r[query_id_col] for r in qrows]
    term_sets = [sorted(set(str(r[query_text_col]).split(" "))) for r in qrows]
    terms = sorted(set().union(*term_sets))
    n_t = len(terms)
    qarr = np.asarray(terms, dtype=np.str_)
    n_queries = len(qids)
    # (T, n_queries) 0/1 membership of each term in each query
    mem = np.zeros((n_t, n_queries), dtype=np.int64)
    for j, ts in enumerate(term_sets):
        mem[np.searchsorted(qarr, np.asarray(ts, dtype=np.str_)), j] = 1

    pinned = docs.materialize()
    n_docs, n_tokens, df = _corpus_term_stats(pinned, qarr, text_col, batch_size)
    qid_type = pa.int64() if isinstance(qids[0], (int, np.integer)) else pa.string()
    if n_docs == 0:
        return pinned.map_batches(
            lambda t: pa.table(
                {
                    query_id_col: pa.array([], qid_type),
                    id_col: pa.array([], pa.int64()),
                    "score_micro": pa.array([], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    bcast = _ray.put((_idf_micro(n_docs, df), mem, np.asarray(qids, dtype=object)))
    s_tok = float(n_tokens)
    n_d = float(n_docs)

    def score(t: pa.Table) -> pa.Table:
        idf, m, qv = _ray.get(bcast)
        flat, offs = _block_tokens(t[text_col])
        doc_of, qi, n_rows = _term_hits(flat, offs, qarr)
        ids = np.asarray(
            pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False), np.int64
        )
        tf = np.bincount(doc_of * n_t + qi, minlength=n_rows * n_t).reshape(
            n_rows, n_t
        )
        contrib = _contrib_micro(tf.astype(np.float64), np.diff(offs).astype(np.float64), idf, s_tok, n_d)
        scores = contrib @ m  # (n_rows, n_queries) exact int64 sums
        cand_d, cand_q = np.nonzero(tf @ m)  # >= 1 shared term
        sc = scores[cand_d, cand_q]
        # block-local top-k per query: the exchange ships <= k rows per
        # (block, query)
        keep, _ = _topk_select(cand_q, sc, ids[cand_d], k)
        keep = keep[np.argsort(cand_q[keep], kind="stable")]
        return pa.table(
            {
                query_id_col: pa.array(qv[cand_q[keep]].tolist(), qid_type),
                id_col: pa.array(ids[cand_d[keep]], pa.int64()),
                "score_micro": pa.array(sc[keep], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return group_topk(parts, key=query_id_col, value="score_micro", k=k, tiebreak=id_col)

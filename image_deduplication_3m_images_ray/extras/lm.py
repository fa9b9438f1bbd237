"""Bigram language-model scoring — the CCNet-style LM-quality signal.

Reference analog: the reference scores every image against a broadcast
pretrained model (CLIP embeddings per worker,
/root/reference/modules/feature_extraction.py:41-74 — load once, score
batches).  The text-domain twin of "score every row against a shared model"
is n-gram LM perplexity bucketing (Wenzek et al., CCNet, LREC 2020): train
a small n-gram model on a reference corpus, score each document by its
average per-gram surprisal, and use the score to stratify quality.

Shape on Ray Data:

1. MODEL BUILD — one ``map_batches`` combiner pass over the model corpus
   emits per-batch distinct (kind, md5-128 key, count) partials for three
   tagged row kinds (0 = bigram counts, 1 = context-token counts, 2 =
   distinct vocabulary tokens), then ONE sharded exchange
   (``util.sharded_group_map``) sums them.  The gram multiset never
   shuffles; exchange rows are 25 B each (same contract as
   ``textstats.vocab_stats`` / ``ngram_counts``).
2. BROADCAST — the pruned model (bigrams with count >= ``min_count``) and
   the context table are collected ONCE into sorted digest arrays and
   ``ray.put`` for every scoring task; the collection is size-gated with an
   explicit raise (at 100 TB, prune harder via ``min_count`` — classic
   n-gram models keep only the heavy head — or shard-attach the scores).
3. SCORE — one embarrassingly parallel ``map_batches`` pass over the target
   corpus: vectorized gram extraction, one md5 per batch-distinct gram,
   ``searchsorted`` lookups, ``np.bincount`` per-doc folds.  No exchange.

Scoring model: add-one (Laplace) smoothing over the pruned table,
``P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)`` where ``c(w1)`` counts w1 as
a bigram CONTEXT (all tokens but each doc's last) and ``V`` is the distinct
token count of the model corpus.  Per-gram surprisal is pinned to integer
MICROBITS — ``floor(log2(1/P) * 1e6 + 0.5)`` — so per-doc sums are exact
integers, independent of summation order, and bit-reproducible against the
DuckDB oracle (the repo's half-up pinning convention; numpy and DuckDB
``log2`` agree to 1 ulp, far inside the microbit quantum).  Keys are
md5-128 (mis-grouping odds < 1e-15 at 10^12 grams, the
``functions.hashing.md5_128`` contract); a production deployment would swap
the splitmix64 family in and drop the SQL anchor.

Tokens split the raw text on single spaces (the ``ngram_counts`` /
``contamination_stats`` gram contract, so the SQL oracle reuses the same
``string_split`` idiom).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

__all__ = ["lm_score", "perplexity_buckets"]

U64 = np.uint64


def _md5_s16(values: np.ndarray) -> np.ndarray:
    """Full 16-byte md5 digests as an ``S16`` array (memcmp-sortable).

    Byte layout matches :func:`..functions.hashing.md5_128`'s (lo, hi)
    uint64 pair: digest[0:8] little-endian == hi, digest[8:16] == lo.
    """
    out = np.empty(len(values), "S16")
    for i, v in enumerate(values):
        out[i] = hashlib.md5(str(v).encode("utf-8")).digest()
    return out


def _s16_from_u64(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Reassemble md5 digest bytes from the (lo, hi) uint64 exchange columns."""
    n = len(lo)
    b = np.empty((n, 16), np.uint8)
    b[:, :8] = hi.astype("<u8").view(np.uint8).reshape(n, 8)
    b[:, 8:] = lo.astype("<u8").view(np.uint8).reshape(n, 8)
    return b.reshape(-1).view("S16")


def _tokens_and_bigrams(text_col):
    """(bigrams, bigram->row map, n_rows, aligned context tokens, all tokens).

    Context token i of a doc is the first token of its bigram i, so the
    context array (all tokens but each doc's last) aligns elementwise with
    the bigram array — both enumerate docs in row order.
    """
    from .textstats import _word_ngram_strings

    g, gdoc, n_rows = _word_ngram_strings(text_col, 2)
    toks, tdoc, _ = _word_ngram_strings(text_col, 1)
    if len(toks):
        is_last = np.diff(tdoc, append=np.int64(-1)) != 0
        ctx = toks[~is_last]
    else:
        ctx = toks
    return g, gdoc, n_rows, ctx, toks


def _lookup(keys: np.ndarray, table_keys: np.ndarray, table_vals: np.ndarray) -> np.ndarray:
    """Counts for ``keys`` from a sorted (table_keys -> table_vals) map, 0 when absent."""
    out = np.zeros(len(keys), dtype=np.int64)
    if len(table_keys) and len(keys):
        pos = np.searchsorted(table_keys, keys)
        pos[pos == len(table_keys)] = 0
        hit = table_keys[pos] == keys
        out[hit] = table_vals[pos[hit]]
    return out


def lm_score(
    docs: Dataset,
    model_docs: Dataset | None = None,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_model_rows: int = 50_000_000,
    num_shards: int = 64,
    batch_size: int = 1024,
    passthrough_cols: tuple = (),
) -> Dataset:
    """Score every doc by its add-one-smoothed bigram LM surprisal.

    ``model_docs`` is the training corpus (default: ``docs`` itself, the
    self-scoring CCNet setup — the input executes once, pinned).  Bigrams
    below ``min_count`` are pruned from the model and scored as unseen
    (count 0), the standard n-gram head-pruning that keeps the broadcast
    model small at corpus scale.

    Output, one row per input doc:
      (id_col, n_bigrams, n_oov, sum_microbits, bits_per_bigram) —
      ``n_oov`` counts bigrams absent from the pruned model,
      ``sum_microbits`` the exact integer surprisal sum
      (``floor(log2((c1+V)/(c12+1)) * 1e6 + 0.5)`` per gram), and
      ``bits_per_bigram = sum_microbits / 1e6 / n_bigrams`` the
      cross-entropy estimate (0.0 for docs with < 2 tokens).  Lower bits =
      more model-like text; 2**bits is the conventional perplexity.
      ``passthrough_cols`` are copied from the input batch into the output
      unchanged (e.g. ``lang`` for downstream per-language bucketing).

    Raises when the pruned model or context table exceeds
    ``max_model_rows`` (the explicit-broadcast-bound contract shared with
    ``embedding_cosine_pairs``): raise the bound — the model is a
    cluster-scale broadcast object, not driver-heap-bounded state — or
    prune harder with ``min_count``.
    """
    import ray as _ray

    from ..functions.hashing import md5_128
    from ..util import sharded_group_map

    if min_count < 1:
        raise ValueError("lm_score: min_count must be >= 1")

    if model_docs is None:
        docs = docs.materialize()  # consumed by the model pass AND the score pass
        model_docs = docs

    def partials(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        g, _, _, ctx, alltoks = _tokens_and_bigrams(col)
        kinds, los, his, ns = [], [], [], []
        for kind, arr, counted in ((0, g, True), (1, ctx, True), (2, alltoks, False)):
            u, c = np.unique(arr, return_counts=True)
            lo, hi = md5_128([str(v) for v in u])
            kinds.append(np.full(len(u), kind, np.int8))
            los.append(lo)
            his.append(hi)
            ns.append(c.astype(np.int64) if counted else np.ones(len(u), np.int64))
        return pa.table(
            {
                "kind": pa.array(np.concatenate(kinds) if kinds else np.zeros(0, np.int8), pa.int8()),
                "h_lo": pa.array(np.concatenate(los) if los else np.zeros(0, U64), pa.uint64()),
                "h_hi": pa.array(np.concatenate(his) if his else np.zeros(0, U64), pa.uint64()),
                "n": pa.array(np.concatenate(ns) if ns else np.zeros(0, np.int64), pa.int64()),
            }
        )

    def fold(group: dict) -> dict:
        k = np.asarray(group["kind"], dtype=np.int8)
        lo = np.asarray(group["h_lo"], dtype=U64)
        hi = np.asarray(group["h_hi"], dtype=U64)
        n = np.asarray(group["n"], dtype=np.int64)
        if len(k) == 0:
            return {"kind": k, "h_lo": lo, "h_hi": hi, "n": n}
        order = np.lexsort((lo, hi, k))
        k, lo, hi, n = k[order], lo[order], hi[order], n[order]
        new = np.ones(len(k), dtype=bool)
        new[1:] = (k[1:] != k[:-1]) | (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        starts = np.nonzero(new)[0]
        sums = np.add.reduceat(n, starts)
        return {"kind": k[starts], "h_lo": lo[starts], "h_hi": hi[starts], "n": sums}

    partial_ds = model_docs.map_batches(
        partials, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    folded = sharded_group_map(
        partial_ds, ["kind", "h_lo", "h_hi"], fold, num_shards=num_shards
    ).materialize()

    # per-block size scalars BEFORE any driver collection (broadcast gate)
    def sizes(t: pa.Table) -> pa.Table:
        k = np.asarray(t["kind"].to_numpy(zero_copy_only=False), dtype=np.int8)
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "n_model": pa.array([int(((k == 0) & (n >= min_count)).sum())], pa.int64()),
                "n_ctx": pa.array([int((k == 1).sum())], pa.int64()),
                "n_vocab": pa.array([int((k == 2).sum())], pa.int64()),
            }
        )

    sz = folded.map_batches(sizes, batch_format="pyarrow", zero_copy_batch=True).to_pandas().sum()
    n_model, n_ctx, vocab_v = int(sz["n_model"]), int(sz["n_ctx"]), int(sz["n_vocab"])
    if max(n_model, n_ctx) > max_model_rows:
        raise ValueError(
            f"lm_score: pruned model has {n_model} bigrams / {n_ctx} contexts, "
            f"above max_model_rows={max_model_rows}; raise the bound or raise "
            "min_count (the model is a broadcast object, sized by the pruned "
            "head, not by the corpus)"
        )

    def keep_model(t: pa.Table) -> pa.Table:
        k = t["kind"]
        n = t["n"]
        is_model = pc.and_(pc.equal(k, 0), pc.greater_equal(n, min_count))
        return t.filter(pc.or_(is_model, pc.equal(k, 1)))

    blocks = [
        b
        for b in _ray.get(
            folded.map_batches(
                keep_model, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        if b.num_rows
    ]

    def side(kind: int) -> tuple[np.ndarray, np.ndarray]:
        keys_parts, val_parts = [], []
        for b in blocks:
            k = np.asarray(b["kind"].to_numpy(zero_copy_only=False), dtype=np.int8)
            m = k == kind
            if not m.any():
                continue
            lo = np.asarray(b["h_lo"].to_numpy(zero_copy_only=False), dtype=U64)[m]
            hi = np.asarray(b["h_hi"].to_numpy(zero_copy_only=False), dtype=U64)[m]
            keys_parts.append(_s16_from_u64(lo, hi))
            val_parts.append(np.asarray(b["n"].to_numpy(zero_copy_only=False), dtype=np.int64)[m])
        if not keys_parts:
            return np.empty(0, "S16"), np.zeros(0, np.int64)
        keys = np.concatenate(keys_parts)
        vals = np.concatenate(val_parts)
        order = np.argsort(keys)
        return keys[order], vals[order]

    model_keys, model_counts = side(0)
    ctx_keys, ctx_counts = side(1)
    ref = _ray.put((model_keys, model_counts, ctx_keys, ctx_counts, vocab_v))

    def score(t: pa.Table) -> pa.Table:
        mk, mn, ck, cn, v = _ray.get(ref)
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        g, gdoc, n_rows, ctx, _ = _tokens_and_bigrams(col)
        if len(g):
            ug, ginv = np.unique(g, return_inverse=True)
            c12 = _lookup(_md5_s16(ug), mk, mn)[ginv]
            uc, cinv = np.unique(ctx, return_inverse=True)
            c1 = _lookup(_md5_s16(uc), ck, cn)[cinv]
            y = np.log2((c1 + v).astype(np.float64) / (c12 + 1).astype(np.float64))
            mb = np.floor(y * 1e6 + 0.5)
            smb = np.bincount(gdoc, weights=mb, minlength=n_rows).astype(np.int64)
            nb = np.bincount(gdoc, minlength=n_rows).astype(np.int64)
            noov = np.bincount(
                gdoc[c12 == 0], minlength=n_rows
            ).astype(np.int64)
        else:
            smb = np.zeros(n_rows, np.int64)
            nb = np.zeros(n_rows, np.int64)
            noov = np.zeros(n_rows, np.int64)
        bits = np.where(nb > 0, (smb / 1e6) / np.maximum(nb, 1), 0.0)
        cols = {
            id_col: t[id_col],
            "n_bigrams": pa.array(nb, pa.int64()),
            "n_oov": pa.array(noov, pa.int64()),
            "sum_microbits": pa.array(smb, pa.int64()),
            "bits_per_bigram": pa.array(bits, pa.float64()),
        }
        for c in passthrough_cols:
            cols[c] = t[c]
        return pa.table(cols)

    return docs.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def perplexity_buckets(
    docs: Dataset,
    model_docs: Dataset | None = None,
    min_count: int = 2,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_model_rows: int = 50_000_000,
) -> Dataset:
    """CCNet head/middle/tail split: per-language perplexity terciles.

    Wenzek et al. (CCNet, LREC 2020) stratify each language of Common Crawl
    into three equal-count buckets by LM perplexity — "head" (most
    model-like, lowest bits) through "tail" — and train on head+middle.
    This composes two existing primitives with no new exchange shapes:

    1. :func:`lm_score` (self-scoring by default) with ``lang_col`` passed
       through — one model exchange + one broadcast + one stateless scan;
    2. :func:`relational.group_rank` over ``(lang, bits_per_bigram, id)``
       with ``ntile=3`` — ONE distributed sort; languages are the canonical
       low-cardinality group key that operator is built for.

    Output: (id_col, lang_col, bits_per_bigram, rank, tile, bucket) where
    ``tile`` is SQL ``NTILE(3)`` over ``ORDER BY bits_per_bigram, id`` within
    the language and ``bucket`` maps 1/2/3 -> 'head'/'middle'/'tail'.
    Docs with < 2 tokens score 0.0 bits and therefore land in 'head'
    deterministically — filter ``n_bigrams == 0`` upstream if that skews a
    real corpus.
    """
    from .relational import group_rank

    scored = lm_score(
        docs,
        model_docs=model_docs,
        min_count=min_count,
        text_col=text_col,
        id_col=id_col,
        max_model_rows=max_model_rows,
        passthrough_cols=(lang_col,),
    ).select_columns([id_col, lang_col, "bits_per_bigram"])
    ranked = group_rank(
        scored, key=lang_col, value="bits_per_bigram", id_col=id_col,
        descending=False, ntile=3,
    )

    _NAMES = pa.array(["head", "middle", "tail"], pa.string())

    def label(t: pa.Table) -> pa.Table:
        tile = t["tile"]
        if isinstance(tile, pa.ChunkedArray):
            tile = tile.combine_chunks()
        return t.append_column("bucket", _NAMES.take(pc.subtract(tile, 1)))

    return ranked.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)

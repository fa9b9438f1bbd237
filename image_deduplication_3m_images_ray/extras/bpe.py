"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016).

"Train a tokenizer on the corpus" is a first-class LLM-data-pipeline job the
brief's text-analysis family implies (token counting exists in
``textstats.bpe_token_stats``; this is the *learning* side).  The algorithm
is inherently iterative — each merge depends on counts under all previous
merges — so there is no ANSI-SQL oracle (driver records the rows-only
check); correctness is pinned by pytest parity with a pure-Python reference
implementation of the classic algorithm, including the l==r run edge cases.

Scale shape (what makes this Ray-Data-native rather than a driver loop):

1. ONE pass over the corpus builds the distinct-WORD vocabulary with counts
   (per-block ``np.unique`` partials, then one hash-sharded sum exchange) —
   after this, every iteration touches only the vocab table, whose size is
   the number of distinct words, orders of magnitude below corpus rows.
2. Per merge iteration over the materialized vocab:
   a. pair counting: per-block vectorized adjacent-pair partials
      (flattened symbol array + offsets, ``np.unique`` + ``bincount`` —
      no per-word Python), then one sharded sum + per-shard top-1, and a
      <= num_shards-row driver argmax;
   b. merge application: blocks rewrite ONLY the words that contain the
      winning pair (vectorized adjacency detection; the rewrite loop runs
      over matched words only, greedy leftmost non-overlapping like the
      reference implementation).
3. The vocab is re-materialized per iteration so lineage stays one step
   deep; at 10^12 corpus tokens the per-iteration cost is a scan of the
   (bounded) vocab plus a pair-count exchange, never a corpus pass.

Tie-break contract: the winning pair maximizes count, ties broken by the
byte order of ``left + '\\x1f' + right`` (== (left, right) tuple order for
any text without control characters).  Words are whitespace-split; symbols
start as single Unicode characters; no end-of-word marker is appended.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.hashing import hash_tokens
from ..util import sharded_group_map

_SEP = "\x1f"


def _word_count_partial(t: pa.Table, text_col: str) -> pa.Table:
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.cast(t[text_col], pa.string())), r"\s+"
    )
    flat = toks.combine_chunks().flatten()
    flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
    words = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
    uniq, counts = np.unique(words, return_counts=True)
    return pa.table(
        {
            "word": pa.array(uniq, pa.string()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
            "__k": pa.array(hash_tokens(uniq).astype(np.int64), pa.int64()),
        }
    )


def _sum_words_shard(g: dict) -> dict:
    words = np.asarray(g["word"], dtype=object)
    n = np.asarray(g["n"], dtype=np.int64)
    uniq, inv = np.unique(words, return_inverse=True)
    return {"word": uniq, "n": np.bincount(inv, weights=n).astype(np.int64)}


def word_vocab(docs: Dataset, text_col: str = "text", num_shards: int = 64) -> Dataset:
    """corpus -> (word, n): distinct whitespace tokens with exact counts."""
    partials = docs.select_columns([text_col]).map_batches(
        lambda t: _word_count_partial(t, text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return sharded_group_map(partials, ["__k"], _sum_words_shard, num_shards=num_shards)


def _explode(t: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """vocab block -> (flat symbols object[], word offsets int64[], counts)."""
    sym = t["sym"]
    if isinstance(sym, pa.ChunkedArray):
        sym = sym.combine_chunks()
    lens = np.asarray(pc.list_value_length(sym).to_numpy(zero_copy_only=False))
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.asarray(sym.flatten().to_numpy(zero_copy_only=False), dtype=object)
    n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    return flat, offs, n


def _pair_count_partial(t: pa.Table) -> pa.Table:
    flat, offs, n = _explode(t)
    if len(flat) == 0:
        return pa.table(
            {
                "pair": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "__k": pa.array([], pa.int64()),
            }
        )
    # adjacency mask: position i pairs with i+1 unless i+1 starts a new word
    starts = np.zeros(len(flat) + 1, dtype=bool)
    starts[offs] = True
    valid = ~starts[1:-1] if len(flat) > 1 else np.zeros(0, dtype=bool)
    li = np.nonzero(valid)[0]
    if len(li) == 0:
        return pa.table(
            {
                "pair": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "__k": pa.array([], pa.int64()),
            }
        )
    pairs = np.char.add(
        np.char.add(flat[li].astype(str), _SEP), flat[li + 1].astype(str)
    ).astype(object)
    # weight: each occurrence counts the word's corpus frequency
    word_of = np.searchsorted(offs, li, side="right") - 1
    w = n[word_of]
    uniq, inv = np.unique(pairs, return_inverse=True)
    cnt = np.bincount(inv, weights=w).astype(np.int64)
    return pa.table(
        {
            "pair": pa.array(uniq, pa.string()),
            "cnt": pa.array(cnt, pa.int64()),
            "__k": pa.array(hash_tokens(uniq).astype(np.int64), pa.int64()),
        }
    )


def _best_pair_shard(g: dict) -> dict:
    pairs = np.asarray(g["pair"], dtype=object)
    cnt = np.asarray(g["cnt"], dtype=np.int64)
    uniq, inv = np.unique(pairs, return_inverse=True)
    tot = np.bincount(inv, weights=cnt).astype(np.int64)
    # shard winner: max count, ties to smallest pair bytes (uniq is sorted)
    best = int(np.argmax(tot))  # first max == smallest pair on ties
    return {"pair": uniq[best : best + 1], "cnt": tot[best : best + 1]}


def _merge_word(sym: list, left: str, right: str, joined: str) -> list:
    """Greedy leftmost non-overlapping merge — reference semantics."""
    out = []
    i = 0
    m = len(sym)
    while i < m:
        if i + 1 < m and sym[i] == left and sym[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _apply_merge(t: pa.Table, left: str, right: str) -> pa.Table:
    flat, offs, _ = _explode(t)
    if len(flat) > 1:
        starts = np.zeros(len(flat) + 1, dtype=bool)
        starts[offs] = True
        hit = (flat[:-1] == left) & (flat[1:] == right) & ~starts[1:-1]
        hit_words = np.unique(np.searchsorted(offs, np.nonzero(hit)[0], side="right") - 1)
    else:
        hit_words = np.zeros(0, dtype=np.int64)
    if len(hit_words) == 0:
        return t
    joined = left + right
    sym_col = t["sym"]
    if isinstance(sym_col, pa.ChunkedArray):
        sym_col = sym_col.combine_chunks()
    py = sym_col.to_pylist()
    for wi in hit_words:  # loop over MATCHED words only
        py[wi] = _merge_word(py[wi], left, right, joined)
    return pa.table(
        {
            "word": t["word"],
            "n": t["n"],
            "sym": pa.array(py, pa.list_(pa.string())),
        }
    )


def bpe_train(
    docs: Dataset,
    n_merges: int = 8,
    text_col: str = "text",
    num_shards: int = 64,
    min_count: int = 2,
) -> pa.Table:
    """corpus -> (rank, left, right, count): the first ``n_merges`` BPE merges.

    Stops early when no pair reaches ``min_count``; the returned table then
    has fewer than ``n_merges`` rows.
    """
    if n_merges <= 0:
        raise ValueError("bpe_train: n_merges must be > 0")

    def to_sym(t: pa.Table) -> pa.Table:
        words = np.asarray(t["word"].to_numpy(zero_copy_only=False), dtype=object)
        return pa.table(
            {
                "word": t["word"],
                "n": t["n"],
                "sym": pa.array([list(w) for w in words], pa.list_(pa.string())),
            }
        )

    vocab = (
        word_vocab(docs, text_col=text_col, num_shards=num_shards)
        .map_batches(to_sym, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    ranks, lefts, rights, counts = [], [], [], []
    for it in range(n_merges):
        partials = vocab.map_batches(
            _pair_count_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        shard_best = sharded_group_map(
            partials, ["__k"], _best_pair_shard, num_shards=num_shards
        ).to_pandas()
        if shard_best.empty:
            break
        # driver argmax over <= num_shards shard winners
        shard_best = shard_best.sort_values(
            ["cnt", "pair"], ascending=[False, True], kind="stable"
        )
        pair, cnt = shard_best.iloc[0]["pair"], int(shard_best.iloc[0]["cnt"])
        if cnt < min_count:
            break
        left, right = pair.split(_SEP, 1)
        ranks.append(it + 1)
        lefts.append(left)
        rights.append(right)
        counts.append(cnt)
        vocab = vocab.map_batches(
            lambda t, l=left, r=right: _apply_merge(t, l, r),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).materialize()

    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "count": pa.array(counts, pa.int64()),
        }
    )


def bpe_encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge list to one word (training-order priority) —
    the kernel a downstream encoder would broadcast; exposed for tests."""
    sym = list(word)
    for left, right in merges:
        if len(sym) < 2:
            break
        sym = _merge_word(sym, left, right, left + right)
    return sym


def bpe_encode(
    docs: Dataset,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Tokenize the corpus under a learned merge list: (id, n_words,
    n_tokens, compression = chars / tokens).

    The merge list is driver-small (a tokenizer has 10^4-10^5 merges) and
    ships once per actor via closure capture of an immutable tuple.  Each
    block encodes every DISTINCT word once (words repeat heavily in webtext)
    and maps counts back through the inverse index — the per-block cost is
    O(distinct_words x merges), not O(tokens x merges).
    """
    merges = tuple((str(l), str(r)) for l, r in merges)

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.cast(t[text_col], pa.string())), r"\s+"
        )
        toks = toks.combine_chunks()
        lens = np.asarray(pc.list_value_length(toks).to_numpy(zero_copy_only=False))
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False), dtype=object)
        keep = np.array([len(w) > 0 for w in flat], dtype=bool)
        # doc index per word, before dropping empties
        doc_of = np.repeat(np.arange(len(t), dtype=np.int64), lens)[keep]
        flat = flat[keep]
        uniq, inv = np.unique(flat, return_inverse=True)
        merges_list = list(merges)  # hoisted: O(merges) once, not per word
        per_word = np.array(
            [len(bpe_encode_word(w, merges_list)) for w in uniq], dtype=np.int64
        )
        n_tokens = np.zeros(len(t), dtype=np.int64)
        np.add.at(n_tokens, doc_of, per_word[inv])
        n_words = np.zeros(len(t), dtype=np.int64)
        np.add.at(n_words, doc_of, 1)
        chars = np.array([len(w) for w in flat], dtype=np.int64)
        n_chars = np.zeros(len(t), dtype=np.int64)
        np.add.at(n_chars, doc_of, chars)
        comp = np.divide(
            n_chars, n_tokens, out=np.zeros(len(t), dtype=np.float64),
            where=n_tokens > 0,
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_words": pa.array(n_words, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "compression": pa.array(comp, pa.float64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )

"""Text analysis operators: token stats, quality scoring, language id,
document fingerprints.

All vectorized over Arrow batches; semantics for the SQL-checkable ones are
chosen to be exactly expressible in DuckDB (see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.hashing import _ranges, winnow_fingerprints
from ..functions.text import flat_utf8_view, normalize_array


def token_stats(docs: Dataset, batch_size: int = 4096) -> Dataset:
    """(doc_id, text) -> (doc_id, n_chars_norm, n_tokens, mean_token_len).

    Normalization = NFC + lower + whitespace collapse (the pipeline's
    canonical form); tokens = split on single space.  DuckDB-equivalent:
    ``nfc_normalize``, ``lower``, ``regexp_replace('\\s+', ' ', 'g')``, ``trim``.
    """

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        n_chars = pc.utf8_length(norm).cast(pa.int64())
        n_chars_np = np.asarray(n_chars.to_numpy(zero_copy_only=False))
        n_spaces = np.asarray(
            pc.count_substring(norm, " ").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        empty = n_chars_np == 0
        n_tokens = np.where(empty, 0, n_spaces + 1).astype(np.int64)
        mean_len = np.where(
            n_tokens > 0, (n_chars_np - n_spaces) / np.maximum(n_tokens, 1), 0.0
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars_norm": n_chars,
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "mean_token_len": pa.array(mean_len, pa.float64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


# byte -> character class for the BPE-ish pretokenizer: 0 = space,
# 1 = [a-z], 2 = [0-9], 3 = everything else (all UTF-8 bytes >= 0x80 are
# class 3, so a run of non-ASCII characters is ONE punct-class token — the
# same grouping ``[^a-z0-9 ]+`` produces over codepoints).
_BPE_CLS = np.full(256, 3, dtype=np.uint8)
_BPE_CLS[ord(" ")] = 0
_BPE_CLS[ord("a") : ord("z") + 1] = 1
_BPE_CLS[ord("0") : ord("9") + 1] = 2


def bpe_counts(norm: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """NORMALIZED string array -> per-row (word, num, punct) run counts.

    One byte-class run-length pass over the flat UTF-8 buffer; class changes
    and row boundaries mark token starts (see :func:`bpe_token_stats`)."""
    arr = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
    offs, data = flat_utf8_view(arr)
    cls = _BPE_CLS[data]
    start = np.ones(len(cls), dtype=bool)
    if len(cls) > 1:
        start[1:] = cls[1:] != cls[:-1]
    start[offs[:-1][offs[:-1] < len(cls)]] = True  # doc boundary resets runs

    def per_doc(tok_start: np.ndarray) -> np.ndarray:
        cum = np.concatenate(([0], np.cumsum(tok_start, dtype=np.int64)))
        return cum[offs[1:]] - cum[offs[:-1]]

    word = per_doc(start & (cls == 1))
    num = per_doc(start & (cls == 2))
    punct = per_doc(start & (cls == 3))
    return word, num, punct


def bpe_token_stats(docs: Dataset, batch_size: int = 4096) -> Dataset:
    """(doc_id, text) -> GPT-2-style pretokenizer token counts.

    A "BPE-ish" token over the normalized text (NFC + lower + \\s-collapse)
    is one match of `` ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+`` — the shape of the
    GPT-2 pretokenization regex restricted to the lowercased alphabet.  The
    optional leading space never changes match COUNTS (normalization leaves
    single spaces, each absorbed by the following token), so counting
    maximal same-class runs is exact.  Implemented without regex: one
    vectorized byte-class run-length pass over the batch's flat UTF-8
    buffer (class changes + doc boundaries mark token starts), so the hot
    path is a handful of numpy ops per batch, not a per-row ``re.findall``.

    Output: ``doc_id, n_bpe_tokens, n_word_tokens, n_num_tokens,
    n_punct_tokens`` (int64; word/num/punct partition the total).
    Reference analog M9 (cheap per-doc stats,
    /root/reference/modules/feature_extraction.py:108-126).
    """

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        word, num, punct = bpe_counts(norm)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pa.array(word + num + punct, pa.int64()),
                "n_word_tokens": pa.array(word, pa.int64()),
                "n_num_tokens": pa.array(num, pa.int64()),
                "n_punct_tokens": pa.array(punct, pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def _quality_arrays(text: pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """RAW-text quality features: (n_chars f64, digit_ratio, space_ratio, score)."""
    n_chars = np.asarray(
        pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    digits = np.asarray(
        pc.count_substring_regex(text, "[0-9]").cast(pa.int64()).to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    spaces = np.asarray(
        pc.count_substring(text, " ").cast(pa.int64()).to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    denom = np.maximum(n_chars, 1.0)
    digit_ratio = digits / denom
    space_ratio = spaces / denom
    score = np.minimum(n_chars, 2000.0) / 2000.0 * 100.0 * (1.0 - digit_ratio)
    return n_chars, digit_ratio, space_ratio, score


def quality_scores(docs: Dataset, batch_size: int = 4096) -> Dataset:
    """(doc_id, text) -> per-doc quality features + composite score.

    Features (all SQL-expressible): digit_ratio, space_ratio, mean_token_len,
    n_chars; score = n_chars capped at 2000, scaled to 0-100, penalized by
    digit-heavy content — the analog of the reference's 0-100 Laplacian score
    (/root/reference/modules/deduplication.py:1575-1609).
    """

    def fn(t: pa.Table) -> pa.Table:
        n_chars, digit_ratio, space_ratio, score = _quality_arrays(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars.astype(np.int64), pa.int64()),
                "digit_ratio": pa.array(digit_ratio, pa.float64()),
                "space_ratio": pa.array(space_ratio, pa.float64()),
                "quality": pa.array(score, pa.float64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    docs: Dataset,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
    stopwords: tuple = GOPHER_STOPWORDS,
    batch_size: int = 4096,
) -> Dataset:
    """Gopher quality heuristics (Rae et al. 2021, table A1) per document.

    The published rule set over the NORMALIZED text, embarrassingly parallel
    and fully vectorized (no exchange, no state):

    - ``n_words`` in [min_words, max_words];
    - ``mean_word_len`` (non-space chars / words) in [min, max];
    - ``symbol_ratio`` = (count('#') + non-overlapping count('...')) / words
      <= max_symbol_ratio;
    - ``alpha_word_ratio`` = fraction of words containing >= 1 of [a-z]
      >= min_alpha_word_ratio (byte-exact under UTF-8: continuation bytes
      are >= 0x80, so the scan never false-matches inside a multibyte char);
    - at least ``min_stopwords`` DISTINCT ``stopwords`` present as whole
      tokens.

    Output: (doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
    n_stop, keep) — per-rule values plus the composite 0/1 ``keep``, so a
    pipeline can either filter on keep or re-threshold downstream.  The
    line-based Gopher rules (bullet/ellipsis line starts) need newline
    structure this corpus lacks and are intentionally omitted.  Reference
    analog: the extension/validity predicate gate
    (/root/reference/modules/blob_manager.py filter step) upgraded to the
    published web-text rule set.
    """
    sw = tuple(stopwords)
    th = (
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_ratio, min_alpha_word_ratio, min_stopwords,
    )

    def fn(t: pa.Table) -> pa.Table:
        m, keep = _gopher_metrics(t, sw, th)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_words": pa.array(m["n_words"], pa.int64()),
                "mean_word_len": pa.array(m["mean_word_len"], pa.float64()),
                "symbol_ratio": pa.array(m["symbol_ratio"], pa.float64()),
                "alpha_word_ratio": pa.array(m["alpha_word_ratio"], pa.float64()),
                "n_stop": pa.array(m["n_stop"], pa.int64()),
                "keep": pa.array(keep.astype(np.int32), pa.int32()),
            }
        )

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def _gopher_metrics(t: pa.Table, sw: tuple, th: tuple):
    """Batch -> ({rule-value arrays}, composite keep bool array).

    The vectorized Gopher rule kernel shared by :func:`gopher_quality`
    (emit values) and :func:`gopher_filter` (filter rows).  ``th`` packs the
    thresholds in :func:`gopher_quality` parameter order.
    """
    (min_words, max_words, min_mwl, max_mwl, max_sym, min_alpha, min_stop) = th
    norm = normalize_array(t["text"])
    arr = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
    n_chars = np.asarray(
        pc.utf8_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False)
    )
    offs, data = flat_utf8_view(arr)
    ds_, de_ = offs[:-1], offs[1:]
    nonempty = de_ > ds_
    sp = np.nonzero(data == 32)[0]
    n_sp = np.searchsorted(sp, de_) - np.searchsorted(sp, ds_)
    n_words = np.where(nonempty, n_sp + 1, 0).astype(np.int64)
    denom = np.maximum(n_words, 1).astype(np.float64)
    mean_word_len = (n_chars - n_sp) / denom * (n_words > 0)
    # symbols: '#' occurrences + non-overlapping '...' (SQL replace parity)
    hashes = np.asarray(
        pc.count_substring(arr, "#").cast(pa.int64()).to_numpy(zero_copy_only=False)
    )
    replaced = pc.replace_substring(arr, pattern="...", replacement="")
    ell = (
        n_chars
        - np.asarray(
            pc.utf8_length(replaced).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
    ) // 3
    symbol_ratio = (hashes + ell) / denom
    # words containing at least one [a-z] byte
    alpha = (data >= 97) & (data <= 122)
    csum = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(alpha, out=csum[1:])
    tok_starts = np.sort(np.concatenate([ds_[nonempty], sp + 1]))
    tok_ends = np.sort(np.concatenate([sp, de_[nonempty]]))
    has_alpha = (csum[tok_ends] - csum[tok_starts]) > 0
    alpha_counts = np.zeros(len(n_words), dtype=np.int64)
    if len(has_alpha):
        base = np.concatenate([[0], np.cumsum(n_words)])[:-1]
        alpha_counts[nonempty] = np.add.reduceat(
            has_alpha.astype(np.int64), base[nonempty]
        )
    alpha_word_ratio = alpha_counts / denom
    # distinct whole-token stopword presence
    # join [" ", arr, " "] with "" separator (the LAST arg is the separator)
    padded = pc.binary_join_element_wise(" ", arr, " ", "")
    n_stop = np.zeros(len(n_words), dtype=np.int64)
    for w in sw:
        n_stop += np.asarray(
            pc.match_substring(padded, f" {w} ").to_numpy(zero_copy_only=False)
        )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mwl)
        & (mean_word_len <= max_mwl)
        & (symbol_ratio <= max_sym)
        & (alpha_word_ratio >= min_alpha)
        & (n_stop >= min_stop)
    )
    metrics = {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "alpha_word_ratio": alpha_word_ratio,
        "n_stop": n_stop,
    }
    return metrics, keep


def gopher_filter(
    docs: Dataset,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
    stopwords: tuple = GOPHER_STOPWORDS,
    batch_size: int = 4096,
) -> Dataset:
    """Keep only rows passing the composite :func:`gopher_quality` rule —
    the filtering form for pipeline composition (all input columns pass
    through; no exchange)."""
    sw = tuple(stopwords)
    th = (
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_ratio, min_alpha_word_ratio, min_stopwords,
    )

    def fn(t: pa.Table) -> pa.Table:
        _, keep = _gopher_metrics(t, sw, th)
        return t.filter(pa.array(keep))

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu"},
    "fr": {"le", "la", "les", "et", "est", "des", "un", "une", "dans", "que", "pour", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "de", "que", "en", "un", "una", "por"},
}


class LangIdActor:
    """Stopword-count language id — state (compiled vocab) built once per actor.

    The n-gram-heuristic analog of fasttext-style lang id.  Semantics are
    deliberately integer-exact and SQL-expressible (the DuckDB oracle joins
    the same stopword VALUES list): tokens = normalized text split on ' '
    (an empty text yields the single empty token, matching SQL
    ``string_split('', ' ')``); per language, n_hits counts token
    OCCURRENCES in that language's stopword set; the prediction is the
    alphabetically-first language with the maximum hits, demoted to 'und'
    when ``n_hits * 20 < n_tokens`` (a 5% stopword-density floor, kept in
    integers so both sides compare exactly).
    """

    def __init__(self):
        self.langs = sorted(_STOPWORDS)
        self.vocab = {lang: frozenset(_STOPWORDS[lang]) for lang in self.langs}

    def __call__(self, batch: pa.Table) -> pa.Table:
        norm = normalize_array(batch["text"])
        tokens_list = pc.split_pattern(norm, pattern=" ")
        offsets = tokens_list.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = tokens_list.flatten().to_numpy(zero_copy_only=False)
        n_docs = len(offsets) - 1
        n_tokens = np.diff(offsets)
        hits = np.zeros((len(self.langs), n_docs), dtype=np.int64)
        for li, lang in enumerate(self.langs):
            member = np.isin(flat, list(self.vocab[lang])).astype(np.int64)
            if len(member):
                # segmented sum per doc (empty docs contribute 0)
                csum = np.concatenate([[0], np.cumsum(member)])
                hits[li] = csum[offsets[1:]] - csum[offsets[:-1]]
        best_idx = np.argmax(hits, axis=0)  # first max -> alphabetical tie-break
        best_hits = hits[best_idx, np.arange(n_docs)]
        pred = np.array(self.langs, dtype=object)[best_idx]
        pred[(best_hits * 20) < n_tokens] = "und"
        pred[best_hits == 0] = "und"
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(pred, pa.string()),
                "n_hits": pa.array(best_hits, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
            }
        )


def lang_id(docs: Dataset, concurrency: int = 4, batch_size: int = 4096) -> Dataset:
    return docs.map_batches(
        LangIdActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def stopword_sql_values() -> str:
    """The stopword vocabulary as a SQL VALUES list (shared with the oracle)."""
    rows = [
        f"('{lang}', '{w}')" for lang in sorted(_STOPWORDS) for w in sorted(_STOPWORDS[lang])
    ]
    return ", ".join(rows)


def doc_fingerprints(
    docs: Dataset, cfg: DedupConfig = None, k: int = 32, mod: int = 8, batch_size: int = 1024
) -> Dataset:
    """(doc_id, text) -> (doc_id, n_fingerprints, fp_min, fp_xor).

    Content-defined document fingerprint: the set of DISTINCT character
    ``k``-grams of the normalized text whose md5-derived 64-bit hash is
    ``0 mod `mod``` (mod-p sketching — the content-defined sampling family
    winnowing belongs to; the flagship pipeline's true winnowing selection
    lives in ``stages.winnow`` and is pinned by property tests).  The
    md5 anchor (:func:`functions.hashing.md5_u64` == DuckDB
    ``md5_number_lower``) makes this exactly SQL-checkable; see its
    docstring for the speed tradeoff vs the vectorized rolling hash.
    ``cfg`` is accepted for signature compatibility and unused.

    Vectorized batch kernel (round-2 verdict item 2): the batch's grams come
    from ONE zero-copy sliding window over the flat UTF-8 buffer, per-doc
    distinctness is ONE ``np.unique`` over (doc, gram) records, hashing is
    ONE ``md5_u64`` call over the distinct gram stream, and the per-doc
    min/xor/count are segmented ``reduceat`` reduces — no per-doc Python
    loop, no per-doc ``set``.  Byte windows equal the contract's char
    windows only for ASCII (and NUL-free, since numpy 'S' strips trailing
    NULs); the rare non-conforming docs take a per-doc char-sliced fallback
    with identical semantics.
    """
    from ..functions.hashing import md5_u64

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        norm = normalize_array(t["text"])
        arr = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
        n_docs = len(arr)
        offs, data = flat_utf8_view(arr)

        out_n = np.zeros(n_docs, dtype=np.int64)
        out_min = np.zeros(n_docs, dtype=np.uint64)
        out_xor = np.zeros(n_docs, dtype=np.uint64)

        # per-doc eligibility for the byte-window fast path: pure ASCII, no NUL
        bad_byte = (data >= 0x80) | (data == 0)
        if bad_byte.any():
            csum = np.concatenate(([0], np.cumsum(bad_byte, dtype=np.int64)))
            fast = csum[offs[1:]] == csum[offs[:-1]]
        else:
            fast = np.ones(n_docs, dtype=bool)
        lens = np.diff(offs)
        gcounts = np.maximum(lens - k + 1, 0)
        sel = np.nonzero(fast & (gcounts > 0))[0]

        if len(sel):
            from ..functions.hashing import _ranges

            g = gcounts[sel]
            starts = np.repeat(offs[:-1][sel], g) + _ranges(g)
            doc_of = np.repeat(sel.astype(np.int64), g)
            windows = np.lib.stride_tricks.sliding_window_view(data, k)
            rec = np.empty(len(starts), dtype=[("d", "<i8"), ("g", f"S{k}")])
            rec["d"] = doc_of
            rec["g"] = np.ascontiguousarray(windows[starts]).view(f"S{k}").ravel()
            uniq = np.unique(rec)  # sorted by (doc, gram), distinct per doc
            h = md5_u64(uniq["g"])
            keep = h % np.uint64(mod) == 0
            hd, hk = uniq["d"][keep], h[keep]
            if len(hk):
                bounds = np.nonzero(
                    np.concatenate(([True], hd[1:] != hd[:-1]))
                )[0]
                docs_idx = hd[bounds]
                out_n[docs_idx] = np.diff(np.append(bounds, len(hk)))
                out_min[docs_idx] = np.minimum.reduceat(hk, bounds)
                out_xor[docs_idx] = np.bitwise_xor.reduceat(hk, bounds)

        slow = np.nonzero(~fast & (gcounts > 0))[0]
        if len(slow):
            texts = arr.to_pylist()
            for i in slow:  # rare path: non-ASCII/NUL docs, char semantics
                s = texts[i]
                grams = {s[j : j + k] for j in range(len(s) - k + 1)}
                if not grams:
                    continue
                h = md5_u64(list(grams))
                h = h[h % np.uint64(mod) == 0]
                out_n[i] = len(h)
                out_min[i] = h.min() if len(h) else 0
                out_xor[i] = np.bitwise_xor.reduce(h) if len(h) else 0

        return pa.table(
            {
                "doc_id": ids,
                "n_fingerprints": pa.array(out_n, pa.int64()),
                "fp_min": pa.array(out_min, pa.uint64()),
                "fp_xor": pa.array(out_xor, pa.uint64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def _repetition_arrays(text: pa.Array, n: int) -> tuple[np.ndarray, np.ndarray]:
    """RAW-text word-``n``-gram counts: (n_grams, n_distinct_grams) int64 per row.

    One global token-id factorization, then a segmented (doc, id1..idn)
    lexsort + boundary count — no per-doc Python loop, no hashing
    (distinctness is exact string distinctness, matching SQL
    ``count(DISTINCT ...)``)."""
    toks = pc.split_pattern(text, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
    n_docs = len(offs) - 1
    lens = np.diff(offs)
    n_grams = np.maximum(lens - (n - 1), 0)
    # gram start positions: for doc d, offs[d] .. offs[d] + n_grams[d] - 1
    # (_ranges requires strictly positive counts — drop gram-less docs)
    pos = n_grams > 0
    starts = np.repeat(offs[:-1][pos], n_grams[pos]) + _ranges(n_grams[pos])
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64)[pos], n_grams[pos])
    _, tid = np.unique(flat, return_inverse=True)
    cols = [tid[starts + i] for i in range(n)]
    order = np.lexsort((*reversed(cols), doc_of))
    dsorted = doc_of[order]
    neq = np.zeros(len(order), dtype=bool)
    if len(order):
        neq[0] = True
        prev, cur = order[:-1], order[1:]
        diff = dsorted[1:] != dsorted[:-1]
        for c in cols:
            diff |= c[cur] != c[prev]
        neq[1:] = diff
    # distinct grams per doc = count of run starts within the doc segment
    n_distinct = (
        np.bincount(dsorted[neq], minlength=n_docs)
        if len(order)
        else np.zeros(n_docs, np.int64)
    )
    return n_grams.astype(np.int64), n_distinct.astype(np.int64)


def repetition_stats(docs: Dataset, n: int = 3, batch_size: int = 4096) -> Dataset:
    """(doc_id, text) -> (doc_id, n_grams, n_distinct_grams, n_repeated_grams).

    Gopher-style within-document repetition signal: the count of word
    ``n``-grams (split on single space, RAW text — no normalization, matching
    DuckDB ``string_split``) and how many of them are repeats of an earlier
    gram.  Downstream filters drop docs whose ``n_repeated_grams / n_grams``
    exceeds a budget (boilerplate, keyword stuffing, template spam).

    Integer-exact by design so the DuckDB oracle compares without float
    rounding hazards.  Fully vectorized: one global token-id factorization
    per batch, then a segmented (doc, id1..idn) lexsort + boundary count —
    no per-doc Python loop, no hashing (distinctness is exact string
    distinctness, matching SQL ``count(DISTINCT ...)``).
    """

    def fn(t: pa.Table) -> pa.Table:
        n_grams, n_distinct = _repetition_arrays(t["text"], n)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_distinct_grams": pa.array(n_distinct.astype(np.int64), pa.int64()),
                "n_repeated_grams": pa.array((n_grams - n_distinct).astype(np.int64), pa.int64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def _word_ngram_strings(text_col, n: int):
    """Flat word-``n``-gram strings (space-joined) for a string column.

    Returns (grams: np.ndarray[str], doc_of: int64 gram->row map, n_rows).
    Vectorized: one split, one unicode upcast, n-1 np.char.add passes — no
    per-doc loop.  The U-dtype upcast pads every token to the batch's longest
    token; fine for word tokens, a rolling-hash variant would replace it for
    adversarially long tokens.
    """
    toks = pc.split_pattern(text_col, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
    n_rows = len(offs) - 1
    n_grams = np.maximum(np.diff(offs) - (n - 1), 0)
    pos = n_grams > 0
    starts = np.repeat(offs[:-1][pos], n_grams[pos]) + _ranges(n_grams[pos])
    doc_of = np.repeat(np.arange(n_rows, dtype=np.int64)[pos], n_grams[pos])
    if len(starts) == 0:
        return np.empty(0, dtype=np.str_), doc_of, n_rows
    arr = flat.astype(np.str_)
    g = arr[starts]
    for i in range(1, n):
        g = np.char.add(np.char.add(g, " "), arr[starts + i])
    return g, doc_of, n_rows


def _bench_gram_ref(bench: Dataset, n: int):
    """Distinct word-``n``-grams of the (small) benchmark corpus, put ONCE
    into the object store (ray.put) for broadcast reads in every task."""
    import ray as _ray

    bench_tbl = pa.concat_tables(
        [
            t
            for t in _ray.get(bench.select_columns(["text"]).to_arrow_refs())
            if t.num_rows and t.num_columns
        ]
    )
    bg, _, _ = _word_ngram_strings(bench_tbl["text"].combine_chunks(), n)
    return _ray.put(np.unique(bg))


def _count_distinct_flagged(
    g: np.ndarray, doc_of: np.ndarray, n_rows: int, m: np.ndarray
) -> np.ndarray:
    """Per-row count of DISTINCT ``g`` values (str or u64) where ``m`` holds."""
    hits = np.zeros(n_rows, dtype=np.int64)
    gh, dh = g[m], doc_of[m]
    if len(gh):
        order = np.lexsort((gh, dh))
        gh, dh = gh[order], dh[order]
        first = np.ones(len(gh), dtype=bool)
        first[1:] = (dh[1:] != dh[:-1]) | (gh[1:] != gh[:-1])
        hits = np.bincount(dh[first], minlength=n_rows).astype(np.int64)
    return hits


def _contamination_hits(text: pa.Array, bset: np.ndarray, n: int) -> np.ndarray:
    """Per-row count of DISTINCT word-``n``-grams present in ``bset``."""
    g, doc_of, n_rows = _word_ngram_strings(text, n)
    if not (len(g) and len(bset)):
        return np.zeros(n_rows, dtype=np.int64)
    return _count_distinct_flagged(g, doc_of, n_rows, np.isin(g, bset))


def _word_ngram_hashes(text_col, n: int):
    """Hash-domain analog of :func:`_word_ngram_strings`: flat u64 word-
    ``n``-gram hashes (docs with fewer than ``n`` words contribute none).

    Tokens are siphashed (:func:`...functions.hashing.hash_tokens`) and
    combined with the flagship's rolling polynomial shingle kernel
    (:func:`...functions.hashing.shingle_hashes_flat`), so any two sides
    using this helper agree by construction — no gram strings are ever
    materialized.  Returns ``(gram_hashes, doc_of, n_rows)``.
    """
    from ..functions.hashing import hash_tokens, shingle_hashes_flat

    toks = pc.split_pattern(text_col, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
    sh, soffs = shingle_hashes_flat(hash_tokens(flat), offs, n)
    lengths = np.diff(offs)
    n_rows = len(lengths)
    doc_of = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(soffs))
    # shingle_hashes_flat gives short docs one sentinel shingle (the flagship
    # wants exact short-doc copies to collide); n-gram semantics want ZERO
    # grams for docs with < n words — drop those sentinels
    keep = np.ones(len(sh), dtype=bool)
    keep[soffs[:-1][lengths < n]] = False
    return sh[keep], doc_of[keep], n_rows


def _bench_bloom_ref(
    bench: Dataset, n: int, bits_per_gram: int, n_hashes: int, max_bits: int
):
    """Distributed Bloom filter over the benchmark's word-``n``-gram hashes,
    put ONCE into the object store for broadcast reads in every task.

    Pass 1 is a cheap scalar-per-block gram-count upper bound (sizes the
    filter); pass 2 builds per-block partials OR-merged by a task tree
    (:func:`...functions.bloom.build_bloom_distributed`) — no gram hash ever
    reaches the driver, and the broadcast object is ``m_bits/8`` bytes no
    matter how many grams the benchmark holds.
    """
    import ray as _ray

    from ..functions.bloom import BloomFilter, build_bloom_distributed

    bench_text = bench.select_columns(["text"])

    def count_grams(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = np.diff(toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"n": pa.array([int(np.maximum(lengths - (n - 1), 0).sum())])})

    n_upper = sum(
        r["n"]
        for r in bench_text.map_batches(
            count_grams, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).take_all()
    )
    m_bits = BloomFilter.size_bits(max(n_upper, 1), bits_per_gram, max_bits)
    bloom = build_bloom_distributed(
        bench_text, lambda t: _word_ngram_hashes(t["text"], n)[0], m_bits, n_hashes
    )
    return _ray.put(bloom)


def contamination_stats(
    docs: Dataset, bench: Dataset, n: int = 8, batch_size: int = 4096
) -> Dataset:
    """Benchmark decontamination: flag docs sharing any word ``n``-gram with
    a (small) benchmark set.

    The standard LLM-training hygiene step: ``bench`` is the eval/benchmark
    corpus (tiny by construction — broadcast via ``ray.put`` as a sorted
    string array); each training doc reports how many of its DISTINCT
    ``n``-grams appear in the benchmark set.  Matching is exact string
    equality (np.isin against the broadcast set — no hashing, no collision
    caveat), so the DuckDB oracle is a verbatim join on the same gram
    strings.  Output: (doc_id, n_contaminated, contaminated); filtering
    survivors is ``filter(contaminated == 0)`` downstream.
    """
    import ray as _ray

    bench_ref = _bench_gram_ref(bench, n)

    def fn(t: pa.Table) -> pa.Table:
        hits = _contamination_hits(t["text"], _ray.get(bench_ref), n)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_contaminated": pa.array(hits.astype(np.int64), pa.int64()),
                "contaminated": pa.array((hits > 0).astype(np.int32), pa.int32()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def contamination_stats_bloom(
    docs: Dataset,
    bench: Dataset,
    n: int = 8,
    bits_per_gram: int = 12,
    n_hashes: int = 8,
    max_bits: int = 1 << 33,
    batch_size: int = 4096,
) -> Dataset:
    """Decontamination SCALE path: fixed-size Bloom broadcast of the bench set.

    :func:`contamination_stats`' ``ray.put`` object grows with the
    benchmark's distinct gram count — right when the benchmark corpus is
    tiny, impossible when the held-out suite is itself web-scale.  This
    variant broadcasts a Bloom filter of the benchmark's gram HASHES
    (``m_bits/8`` bytes regardless of gram count, capped at ``max_bits``),
    built distributed so no gram ever reaches the driver.

    Error direction is the safe one for training-data hygiene: Bloom false
    positives and 64-bit gram-hash collisions can only ADD contamination
    hits (over-removal of training docs); a doc that truly shares a gram
    with the benchmark is ALWAYS flagged — no false negatives, by
    construction.  ``n_contaminated`` counts distinct contaminated gram
    hashes (== distinct grams absent 64-bit collisions).  Same output
    schema as :func:`contamination_stats`, which remains the exact
    pytest oracle (`tests/test_extras.py`).
    """
    import ray as _ray

    bloom_ref = _bench_bloom_ref(bench, n, bits_per_gram, n_hashes, max_bits)

    def fn(t: pa.Table) -> pa.Table:
        bloom = _ray.get(bloom_ref)
        g, doc_of, n_rows = _word_ngram_hashes(t["text"], n)
        if len(g):
            hits = _count_distinct_flagged(g, doc_of, n_rows, bloom.contains(g))
        else:
            hits = np.zeros(n_rows, dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_contaminated": pa.array(hits, pa.int64()),
                "contaminated": pa.array((hits > 0).astype(np.int32), pa.int32()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def clean_corpus(
    docs: Dataset,
    bench: Dataset,
    lang: str | None = "en",
    min_quality: float = 30.0,
    max_rep_ratio: float = 0.2,
    rep_n: int = 3,
    contam_n: int = 8,
    contam_bloom: bool = False,
    contam_bloom_bits_per_gram: int = 12,
    batch_size: int = 4096,
) -> Dataset:
    """The composed LLM-training-data hygiene filter, fused into ONE pass.

    Keeps docs that clear four gates at once: ``lang`` match (column
    equality), composite quality >= ``min_quality`` (same formula as
    :func:`quality_scores`), word-``rep_n``-gram repetition ratio <=
    ``max_rep_ratio`` (same counts as :func:`repetition_stats`), and ZERO
    shared word-``contam_n``-grams with the broadcast ``bench`` corpus (same
    matching as :func:`contamination_stats`).  All four signals compute
    inside a single ``map_batches`` over the same batch — one read of the
    text, zero shuffles, instead of four separate passes joined on doc_id —
    the operator-fusion shape a 100 TB corpus pass needs.  Output:
    (doc_id, quality, rep_ratio, n_contaminated) for the survivors.

    ``contam_bloom=True`` swaps the exact broadcast gram set for the
    fixed-size Bloom filter of :func:`contamination_stats_bloom` — same
    fused single pass, but the broadcast no longer grows with the benchmark
    (false positives only over-remove; no contaminated doc ever survives).
    """
    import ray as _ray

    if contam_bloom:
        bench_ref = _bench_bloom_ref(
            bench, contam_n, contam_bloom_bits_per_gram, 8, 1 << 33
        )
    else:
        bench_ref = _bench_gram_ref(bench, contam_n)

    def fn(t: pa.Table) -> pa.Table:
        if lang is not None:
            t = t.filter(pc.equal(t["lang"], lang))
        _, _, _, score = _quality_arrays(t["text"])
        n_grams, n_distinct = _repetition_arrays(t["text"], rep_n)
        rep_ratio = (n_grams - n_distinct) / np.maximum(n_grams, 1)
        if contam_bloom:
            bloom = _ray.get(bench_ref)
            g, doc_of, n_rows = _word_ngram_hashes(t["text"], contam_n)
            hits = (
                _count_distinct_flagged(g, doc_of, n_rows, bloom.contains(g))
                if len(g)
                else np.zeros(n_rows, dtype=np.int64)
            )
        else:
            hits = _contamination_hits(t["text"], _ray.get(bench_ref), contam_n)
        keep = (score >= min_quality) & (rep_ratio <= max_rep_ratio) & (hits == 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "quality": pa.array(score, pa.float64()),
                "rep_ratio": pa.array(rep_ratio, pa.float64()),
                "n_contaminated": pa.array(hits, pa.int64()),
            }
        ).filter(pa.array(keep))

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def tfidf_top_terms(
    docs: Dataset, k: int = 3, num_shards: int = 64, join_num_buckets: int = 8,
    batch_size: int = 4096,
) -> Dataset:
    """Top-``k`` most distinctive terms per doc — TF-IDF by exact ordering.

    Terms are ranked per doc by (tf DESC, corpus df ASC, term ASC): frequent
    in the doc, rare in the corpus — the TF-IDF ordering without the float
    ``ln`` (integer-exact, so the DuckDB oracle hash-matches bit-for-bit).
    Output: (doc_id, term, tf, df, rank), rank 1-based.

    Shape: one tokenize pass emits pre-aggregated (doc_id, term, tf) rows
    (vectorized composite-key unique — the per-batch combiner), df is ONE
    ``groupby(term).count()`` over those already-unique rows, the df
    attach is a native hash-shuffle join on the term string, and the final
    per-doc top-k is one ``doc_id``-sharded vectorized selection.
    """
    from ray.data.aggregate import Count

    from ..util import sharded_group_map

    def tf_batch(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        toks = pc.split_pattern(norm, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(offs))
        uniq, tid = np.unique(flat, return_inverse=True)
        key = doc_of * len(uniq) + tid
        ukey, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[ukey // len(uniq)]),
                "term": pa.array(uniq[ukey % len(uniq)], pa.string()),
                "tf": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    tf = docs.map_batches(
        tf_batch, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    # tf rows are unique on (doc_id, term), so df = row count per term
    df = tf.groupby("term").aggregate(Count(alias_name="df"))
    joined = tf.join(df, join_type="inner", num_partitions=join_num_buckets, on=("term",))

    def shard_fn(g: pd.DataFrame) -> pd.DataFrame:
        did = g["doc_id"].to_numpy()
        order = np.lexsort(
            (g["term"].to_numpy(), g["df"].to_numpy(), -g["tf"].to_numpy(), did)
        )
        ds_ = did[order]
        n = len(ds_)
        if n == 0:
            return g.head(0).assign(rank=np.zeros(0, np.int64))
        new = np.ones(n, dtype=bool)
        new[1:] = ds_[1:] != ds_[:-1]
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        keep = rank < k
        out = g.iloc[order[keep]].reset_index(drop=True)
        out["rank"] = rank[keep] + 1
        return out

    return sharded_group_map(
        joined, ["doc_id"], shard_fn, num_shards=num_shards, batch_format="pandas"
    )


def inverted_index(docs: Dataset, num_shards: int = 64, batch_size: int = 4096) -> Dataset:
    """(doc_id, text) -> (term, df, postings): a search-style inverted index.

    ``postings`` is the comma-joined ascending doc_id list (string — exact,
    order-canonical, and SQL-checkable via ``string_agg(... ORDER BY)``);
    ``df`` its length.  One tokenize pass emits DISTINCT (term, doc_id) pairs
    per batch (the combiner — within-doc duplicates never leave the task),
    then ONE term-sharded exchange assembles each term's sorted posting list
    vectorized (lexsort + segment joins).  At 100 TB the posting strings for
    stop-words get long — cap or skip-list them in a real deployment; the
    operator keeps exact semantics here.
    """
    from ..functions.hashing import hash_tokens
    from ..util import sharded_group_map

    def pairs(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        toks = pc.split_pattern(norm, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(offs))
        uniq, tid = np.unique(flat, return_inverse=True)
        key = doc_of * len(uniq) + tid
        ukey = np.unique(key)
        term = uniq[ukey % len(uniq)]
        return pa.table(
            {
                "term": pa.array(term, pa.string()),
                "doc_id": pa.array(ids[ukey // len(uniq)]),
                "__t": pa.array(hash_tokens(term).astype(np.int64), pa.int64()),
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        terms = g["term"].to_numpy()
        dids = g["doc_id"].to_numpy()
        order = np.lexsort((dids, terms))
        terms, dids = terms[order], dids[order]
        new = np.ones(len(terms), dtype=bool)
        new[1:] = terms[1:] != terms[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(terms))
        strs = dids.astype(np.str_)
        postings = [",".join(strs[s:e]) for s, e in zip(starts, ends)]
        return pd.DataFrame(
            {
                "term": terms[starts],
                "df": (ends - starts).astype(np.int64),
                "postings": postings,
            }
        )

    prepped = docs.map_batches(
        pairs, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return sharded_group_map(
        prepped, ["__t"], assemble, num_shards=num_shards, batch_format="pandas"
    )


def vocab_stats(docs: Dataset, batch_size: int = 4096) -> Dataset:
    """Corpus-level vocabulary statistics: one row of
    (n_tokens, n_terms, n_hapax, top_term, top_term_count).

    Zipf-curve health checks for a training corpus (vocabulary growth, hapax
    mass, stop-word skew).  Shape: per-batch partial term counts (one
    ``np.unique`` — the combiner), ONE ``groupby(term)`` sum, then a partial
    reduction of the per-term table to per-block scalars and a final
    driver-size fold over block rows.  The full term table never leaves the
    cluster; only O(blocks) scalar rows reach the driver.
    """
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        toks = pc.split_pattern(norm, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        uniq, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "term": pa.array(uniq, pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    per_term = (
        docs.map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )

    def reduce_block(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
        terms = np.asarray(t["term"].to_numpy(zero_copy_only=False), dtype=object)
        if len(n) == 0:
            return pa.table(
                {
                    "n_tokens": pa.array([], pa.int64()),
                    "n_terms": pa.array([], pa.int64()),
                    "n_hapax": pa.array([], pa.int64()),
                    "top_term": pa.array([], pa.string()),
                    "top_term_count": pa.array([], pa.int64()),
                }
            )
        # deterministic arg-max: highest count, then lexicographically first
        best = np.lexsort((terms, -n))[0]
        return pa.table(
            {
                "n_tokens": pa.array([int(n.sum())], pa.int64()),
                "n_terms": pa.array([len(n)], pa.int64()),
                "n_hapax": pa.array([int((n == 1).sum())], pa.int64()),
                "top_term": pa.array([terms[best]], pa.string()),
                "top_term_count": pa.array([int(n[best])], pa.int64()),
            }
        )

    import pandas as _pd

    blocks = per_term.map_batches(
        reduce_block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    top = blocks.sort_values(
        ["top_term_count", "top_term"], ascending=[False, True]
    ).iloc[0]
    out = _pd.DataFrame(
        {
            "n_tokens": [int(blocks["n_tokens"].sum())],
            "n_terms": [int(blocks["n_terms"].sum())],
            "n_hapax": [int(blocks["n_hapax"].sum())],
            "top_term": [top["top_term"]],
            "top_term_count": [int(top["top_term_count"])],
        }
    )
    import ray.data

    return ray.data.from_pandas(out)


def frequent_terms(
    docs: Dataset,
    k: int = 20,
    capacity: int = 4096,
    batch_size: int = 4096,
    max_candidates: int = 1_000_000,
) -> Dataset:
    """EXACT corpus top-``k`` terms (term, n) without a full-vocabulary shuffle.

    The heavy-hitters two-pass: pass 1 runs a Misra–Gries summary of size
    ``capacity`` inside each batch (count terms, subtract the
    (capacity+1)-th largest count, keep positive residuals — the classic
    mergeable compression; Misra & Gries 1982, Agarwal et al. "Mergeable
    Summaries" PODS'12), sums residuals with ONE small ``groupby`` (at most
    ``capacity`` rows per batch enter the exchange, vs the whole vocabulary
    in ``vocab_stats``), and derives a PROVABLE candidate superset of the
    true top-k; pass 2 re-scans ``docs`` counting ONLY the broadcast
    candidates exactly.  The result is exact, not approximate — hence the
    SQL oracle — or the operator raises.

    Soundness: let ``D`` = the exact sum of all per-batch decrements (each
    term's merged residual undercounts its true count by at most ``D``) and
    ``r_k`` = the k-th largest merged residual.  The k terms carrying those
    residuals have true counts >= their residuals, so the true k-th count
    ``c_k >= r_k``; any true-top-k term therefore has residual
    ``>= c_k - D >= r_k - D``.  If ``r_k <= D`` a true-top-k term could
    have been compressed to zero and the guarantee is void: the operator
    raises ``ValueError`` asking for a larger ``capacity`` (never a silently
    approximate answer).  Ties at the boundary are safe: a non-candidate's
    true count is ``< r_k <= c_k``, strictly below the cut.

    Scale shape: per-batch state is O(capacity); the pass-1 exchange ships
    <= capacity rows per batch; ``D``/``r_k``/the candidate set are the only
    driver-side values (candidates gated by ``max_candidates``, raising —
    not truncating — on overflow); pass 2 is a combiner + a groupby over
    |candidates| rows.  ``docs`` is scanned twice BY DESIGN (the two-pass
    trade that avoids shuffling the term multiset): pass a re-readable
    Dataset (a parquet read), not an expensive unmaterialized chain.
    Output: k rows (term, n), n exact, ordered by (n DESC, term ASC).

    Reference parity: the reference keeps global Counter-style stats on the
    driver (modules/progress_tracker.py); this is the distributed-exact
    form of that audit at corpus scale.
    """
    import ray
    from ray.data.aggregate import Sum

    def _flat_terms(t: pa.Table) -> np.ndarray:
        norm = normalize_array(t["text"])
        toks = pc.split_pattern(norm, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        return np.asarray(toks.flatten().to_numpy(zero_copy_only=False))

    def summarize(t: pa.Table) -> pa.Table:
        uniq, counts = np.unique(_flat_terms(t), return_counts=True)
        counts = counts.astype(np.int64)
        if len(uniq) > capacity:
            # decrement by the (capacity+1)-th largest count: at most
            # `capacity` positive residuals survive
            dec = int(np.partition(counts, -capacity - 1)[-capacity - 1])
            keep = counts > dec
            uniq, counts = uniq[keep], counts[keep] - dec
        else:
            dec = 0
        # the decrement total rides in its own is_dec=1 group; a real token
        # can never land there, whatever its bytes
        return pa.table(
            {
                "term": pa.array(np.append(uniq, [""]), pa.string()),
                "is_dec": pa.array(
                    np.append(np.zeros(len(uniq), np.int8), [1]), pa.int8()
                ),
                "residual": pa.array(np.append(counts, [dec]), pa.int64()),
            }
        )

    merged = (
        docs.map_batches(
            summarize, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby(["term", "is_dec"])
        .aggregate(Sum("residual", alias_name="residual"))
        .materialize()  # pinned: D, r_k and the candidate filter all read it
    )
    def _where_dec(val: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["is_dec"], val))

        return fn

    d_rows = merged.map_batches(
        _where_dec(1), batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    d_total = int(d_rows[0]["residual"]) if d_rows else 0
    terms_only = merged.map_batches(
        _where_dec(0), batch_format="pyarrow", zero_copy_batch=True
    )
    top = terms_only.sort("residual", descending=True).limit(k).take_all()
    if not top:
        return ray.data.from_arrow(
            pa.table({"term": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
        )
    if len(top) == k:
        r_k = int(top[-1]["residual"])
        if r_k <= d_total:
            raise ValueError(
                f"frequent_terms: cannot prove exact top-{k} at "
                f"capacity={capacity} (k-th residual {r_k} <= total "
                f"decrement {d_total}); raise capacity"
            )
        thresh = r_k - d_total
        cand_ds = terms_only.map_batches(
            lambda t: t.filter(pc.greater_equal(t["residual"], thresh)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        cand_ds = terms_only  # fewer than k distinct terms: all are candidates
    try:
        # one pass: take_all's own limit gates BEFORE the driver holds them
        cand_rows = cand_ds.select_columns(["term"]).take_all(limit=max_candidates)
    except ValueError as e:
        raise ValueError(
            f"frequent_terms: candidates exceed max_candidates="
            f"{max_candidates}; raise capacity"
        ) from e
    from ..functions.hashing import hash_tokens

    cand = np.sort(np.asarray([r["term"] for r in cand_rows]))
    # u64-hash prefilter: per-batch membership runs on sorted uint64 (fast C
    # compares) instead of object strings; the few hash hits are confirmed
    # by exact string membership, so collisions cannot admit a wrong term
    cand_h = np.sort(hash_tokens(cand))
    cand_ref = ray.put((cand, cand_h))

    def recount(t: pa.Table) -> pa.Table:
        cset, cset_h = ray.get(cand_ref)
        uniq, counts = np.unique(_flat_terms(t), return_counts=True)
        uh = hash_tokens(uniq)
        pos = np.searchsorted(cset_h, uh)
        pos[pos == len(cset_h)] = 0
        maybe = cset_h[pos] == uh
        hit = maybe.copy()
        if maybe.any():
            hit[maybe] = np.isin(uniq[maybe], cset)
        return pa.table(
            {
                "term": pa.array(uniq[hit], pa.string()),
                "n": pa.array(counts[hit].astype(np.int64), pa.int64()),
            }
        )

    exact = (
        docs.map_batches(
            recount, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )
    return exact.sort(["n", "term"], descending=[True, False]).limit(k)


def frequent_terms_approx(
    docs: Dataset,
    k: int = 20,
    capacity: int = 4096,
    batch_size: int = 4096,
) -> Dataset:
    """ONE-pass approximate corpus top-``k`` terms with certified bounds —
    the scale path for when :func:`frequent_terms`' second exact-recount
    scan is too dear (the input is an expensive unmaterialized chain, or
    the corpus is only reachable once).

    Pass 1 of the Misra–Gries two-pass, alone: per-batch size-``capacity``
    summaries (mergeable residuals + the decrement total ``D``), one small
    groupby, top-``k`` by merged residual.  Output: (term, n_lo, n_hi)
    where the term's TRUE count is certified inside ``[n_lo, n_hi]``
    (``n_lo`` = merged residual — every decrement only subtracts;
    ``n_hi = n_lo + D`` — a term loses at most every decrement).  When
    ``D == 0`` (vocabulary fits ``capacity``) the result is exact and
    ``n_lo == n_hi``.  The top-k BY RESIDUAL may differ from the true
    top-k when true counts are within ``D`` of each other — callers who
    need the exact set use :func:`frequent_terms`, which proves or raises.

    Scale shape: identical to pass 1 of the exact operator — O(capacity)
    per-batch state, <= capacity+1 exchange rows per batch, k rows out.
    """
    import ray
    from ray.data.aggregate import Sum

    def summarize(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        toks = pc.split_pattern(norm, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        uniq, counts = np.unique(flat, return_counts=True)
        counts = counts.astype(np.int64)
        if len(uniq) > capacity:
            dec = int(np.partition(counts, -capacity - 1)[-capacity - 1])
            keep = counts > dec
            uniq, counts = uniq[keep], counts[keep] - dec
        else:
            dec = 0
        return pa.table(
            {
                "term": pa.array(np.append(uniq, [""]), pa.string()),
                "is_dec": pa.array(
                    np.append(np.zeros(len(uniq), np.int8), [1]), pa.int8()
                ),
                "residual": pa.array(np.append(counts, [dec]), pa.int64()),
            }
        )

    merged = (
        docs.map_batches(
            summarize, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby(["term", "is_dec"])
        .aggregate(Sum("residual", alias_name="residual"))
        .materialize()  # pinned: D and the top-k both read it
    )
    d_rows = merged.map_batches(
        lambda t: t.filter(pc.equal(t["is_dec"], 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).take_all()
    d_total = int(d_rows[0]["residual"]) if d_rows else 0
    top = (
        merged.map_batches(
            lambda t: t.filter(pc.equal(t["is_dec"], 0)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort(["residual", "term"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "term": pa.array([r["term"] for r in top], pa.string()),
                "n_lo": pa.array([r["residual"] for r in top], pa.int64()),
                "n_hi": pa.array(
                    [r["residual"] + d_total for r in top], pa.int64()
                ),
            }
        )
    )


def ngram_counts(
    docs: Dataset, n: int = 3, min_count: int = 2, batch_size: int = 4096
) -> Dataset:
    """Exact corpus word-``n``-gram counts, pruned to ``count >= min_count``
    — the classic LM-counts / gram-table product.

    Per batch, ONE vectorized gram pass (:func:`_word_ngram_strings`) and one
    ``np.unique`` pre-aggregate the batch to distinct (gram, count) partials
    (the combiner), then a single ``groupby(gram)`` sum and a map-side
    ``HAVING`` filter.  Exactness requires the full distinct-gram table to
    cross the exchange once (same contract as ``vocab_stats``); when only the
    heavy head is wanted, :func:`frequent_terms`'s two-pass Misra–Gries shape
    is the cheaper tool.  Docs with fewer than ``n`` tokens contribute
    nothing; tokens split the raw text on single spaces (the
    ``contamination_stats`` gram contract, so the SQL oracle reuses its
    ``string_split``/``list_transform`` idiom).

    Output: (gram, n) rows with n >= ``min_count``.
    """
    from ray.data.aggregate import Sum

    if n < 1:
        raise ValueError("ngram_counts: n must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        g, _, _ = _word_ngram_strings(col, n)
        uniq, cnt = np.unique(g, return_counts=True)
        return pa.table(
            {
                "gram": pa.array(uniq.astype(object), pa.string()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grouped = (
        docs.map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
    )
    return grouped.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _group_topk_terms(ds: Dataset, value: str, k: int, num_shards: int = 32) -> Dataset:
    """Per-group top-``k`` rows of a (group, term, value) table, ordered by
    (value DESC, term ASC) — the string tiebreak `group_topk` doesn't take.
    One group-hash-sharded exchange; vectorized selection per shard."""
    from ..functions.hashing import hash_tokens
    from ..util import sharded_group_map

    def add_g(t: pa.Table) -> pa.Table:
        g = np.asarray(t["group"].to_numpy(zero_copy_only=False), dtype=object)
        return t.append_column(
            "__g", pa.array(hash_tokens(g).astype(np.int64), pa.int64())
        )

    def shard_fn(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g["term"].to_numpy(), -g[value].to_numpy(),
                            g["group"].to_numpy()))
        gs = g["group"].to_numpy()[order]
        n = len(gs)
        if n == 0:
            return g.drop(columns="__g").head(0).assign(rank=np.zeros(0, np.int64))
        new = np.ones(n, dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1
        rank = np.arange(n, dtype=np.int64) - starts[seg]
        keep = rank < k
        out = g.iloc[order[keep]].drop(columns="__g").reset_index(drop=True)
        out["rank"] = rank[keep] + 1
        return out

    return sharded_group_map(
        ds.map_batches(add_g, batch_format="pyarrow", zero_copy_batch=True),
        ["__g"], shard_fn, num_shards=num_shards, batch_format="pandas",
    )


def frequent_terms_by_group(
    docs: Dataset,
    group_col: str = "lang",
    k: int = 10,
    capacity: int = 4096,
    batch_size: int = 4096,
    max_candidates: int = 1_000_000,
) -> Dataset:
    """EXACT top-``k`` terms per group (e.g. per language) — the per-group
    generalization of :func:`frequent_terms`, same two-pass Misra–Gries
    shape with every bound tracked PER GROUP.

    Pass 1 compresses each batch's (group, term) counts to ``capacity``
    residuals per group per batch (one composite ``np.unique``, per-group
    decrement via a vectorized segmented rank — no per-group Python), sums
    residuals with one small groupby, and derives each group's provable
    candidate superset from its own ``r_k(g)`` (k-th largest merged
    residual) and ``D(g)`` (exact decrement total): a true-top-k term of
    group g has residual >= r_k(g) - D(g); if ``r_k(g) <= D(g)`` the
    operator raises naming the group.  Pass 2 recounts ONLY the broadcast
    candidates (hash-prefiltered exact membership per group) and one
    group-sharded top-k orders (n DESC, term ASC).

    Groups must be low-cardinality (languages, sources): thresholds and the
    candidate set are driver-bounded (``max_candidates``, raising).
    Output: (group, term, n, rank), rank 1-based.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_tokens

    def _flat_group_terms(t: pa.Table):
        norm = normalize_array(t["text"])
        toks = pc.split_pattern(norm, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
        groups = np.asarray(t[group_col].to_numpy(zero_copy_only=False), dtype=object)
        doc_of = np.repeat(np.arange(len(groups), dtype=np.int64), np.diff(offs))
        return groups[doc_of], flat

    def _pair_counts(gflat: np.ndarray, flat: np.ndarray):
        """distinct (group, term) with counts via one composite unique."""
        ug, gi = np.unique(gflat, return_inverse=True)
        ut, ti = np.unique(flat, return_inverse=True)
        key = gi.astype(np.int64) * len(ut) + ti
        ukey, counts = np.unique(key, return_counts=True)
        return ug[ukey // len(ut)], ut[ukey % len(ut)], counts.astype(np.int64)

    def summarize(t: pa.Table) -> pa.Table:
        gflat, flat = _flat_group_terms(t)
        if len(flat) == 0:
            return pa.table(
                {
                    "group": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "is_dec": pa.array([], pa.int8()),
                    "residual": pa.array([], pa.int64()),
                }
            )
        grp, term, counts = _pair_counts(gflat, flat)
        # per-group decrement: the (capacity+1)-th largest in-batch count,
        # via ONE lexsort + segmented rank (no per-group loop)
        order = np.lexsort((-counts, grp))
        gs, cs = grp[order], counts[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        starts = np.nonzero(new)[0]
        seg = np.cumsum(new) - 1
        rank = np.arange(len(gs), dtype=np.int64) - starts[seg]
        # dec per segment: count at rank == capacity (0 if the group is small)
        dec_seg = np.zeros(len(starts), dtype=np.int64)
        at_cap = rank == capacity
        dec_seg[seg[at_cap]] = cs[at_cap]
        residual = cs - dec_seg[seg]
        keep = residual > 0
        out_g = np.concatenate([gs[keep], gs[starts]])
        out_t = np.concatenate([term[order][keep], np.full(len(starts), "", object)])
        out_d = np.concatenate(
            [np.zeros(int(keep.sum()), np.int8), np.ones(len(starts), np.int8)]
        )
        out_r = np.concatenate([residual[keep], dec_seg])
        return pa.table(
            {
                "group": pa.array(out_g, pa.string()),
                "term": pa.array(out_t, pa.string()),
                "is_dec": pa.array(out_d, pa.int8()),
                "residual": pa.array(out_r, pa.int64()),
            }
        )

    merged = (
        docs.map_batches(
            summarize, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby(["group", "term", "is_dec"])
        .aggregate(Sum("residual", alias_name="residual"))
        .materialize()
    )

    def _where_dec(val: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["is_dec"], val))

        return fn

    d_by_group = {
        r["group"]: int(r["residual"])
        for r in merged.map_batches(
            _where_dec(1), batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
    }
    terms_only = merged.map_batches(
        _where_dec(0), batch_format="pyarrow", zero_copy_batch=True
    )
    # r_k per group from a distributed per-group top-k over residuals
    top_rows = _group_topk_terms(terms_only, "residual", k).take_all()
    per_group_depth: dict = {}
    r_k: dict = {}
    for r in top_rows:
        g = r["group"]
        per_group_depth[g] = per_group_depth.get(g, 0) + 1
        r_k[g] = min(r_k.get(g, 1 << 62), int(r["residual"]))
    thresholds: dict = {}
    for g, depth in per_group_depth.items():
        d_g = d_by_group.get(g, 0)
        if depth < k:
            thresholds[g] = 1  # fewer than k terms: every residual qualifies
        elif r_k[g] <= d_g:
            raise ValueError(
                f"frequent_terms_by_group: cannot prove exact top-{k} for "
                f"group {g!r} at capacity={capacity} (k-th residual "
                f"{r_k[g]} <= total decrement {d_g}); raise capacity"
            )
        else:
            thresholds[g] = r_k[g] - d_g
    thr_ref = ray.put(thresholds)

    def cand_filter(t: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        g = np.asarray(t["group"].to_numpy(zero_copy_only=False), dtype=object)
        res = np.asarray(t["residual"].to_numpy(zero_copy_only=False), np.int64)
        lim = np.asarray([thr.get(x, 1 << 62) for x in g], np.int64)
        return t.filter(pa.array(res >= lim))

    try:
        cand_rows = (
            terms_only.map_batches(
                cand_filter, batch_format="pyarrow", zero_copy_batch=True
            )
            .select_columns(["group", "term"])
            .take_all(limit=max_candidates)
        )
    except ValueError as e:
        raise ValueError(
            f"frequent_terms_by_group: candidates exceed max_candidates="
            f"{max_candidates}; raise capacity"
        ) from e
    by_group: dict = {}
    for r in cand_rows:
        by_group.setdefault(r["group"], []).append(r["term"])
    cand_map = {}
    for g, terms in by_group.items():
        arr = np.sort(np.asarray(terms, dtype=object))
        cand_map[g] = (arr, np.sort(hash_tokens(arr)))
    cand_ref = ray.put(cand_map)

    def recount(t: pa.Table) -> pa.Table:
        cmap = ray.get(cand_ref)
        gflat, flat = _flat_group_terms(t)
        if len(flat) == 0:
            return pa.table(
                {
                    "group": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        grp, term, counts = _pair_counts(gflat, flat)
        keep = np.zeros(len(grp), dtype=bool)
        for g in np.unique(grp):  # loop over GROUPS (low-cardinality), not rows
            if g not in cmap:
                continue
            cset, cset_h = cmap[g]
            m = grp == g
            th = hash_tokens(term[m])
            pos = np.searchsorted(cset_h, th)
            pos[pos == len(cset_h)] = 0
            maybe = cset_h[pos] == th
            sub = keep[m]
            if maybe.any():
                mm = np.zeros(len(th), dtype=bool)
                mm[maybe] = np.isin(term[m][maybe], cset)
                sub = mm
            keep[m] = sub
        return pa.table(
            {
                "group": pa.array(grp[keep], pa.string()),
                "term": pa.array(term[keep], pa.string()),
                "n": pa.array(counts[keep], pa.int64()),
            }
        )

    exact = (
        docs.map_batches(
            recount, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby(["group", "term"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return _group_topk_terms(exact, "n", k)


def _vocab_presence(t: pa.Table, vset: np.ndarray, vset_h: np.ndarray):
    """Batch -> distinct (doc row index, vocab index) presence pairs.

    One tokenize over the normalized text, a u64-hash prefilter against the
    sorted vocab hashes (``np.isin`` string confirm only on maybe-hits), and
    one composite ``np.unique`` for per-doc distinct presence.  Shared by
    :func:`term_cooccurrence` and :func:`collocations`.
    """
    from ..functions.hashing import hash_tokens

    norm = normalize_array(t["text"])
    toks = pc.split_pattern(norm, pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = np.asarray(toks.flatten().to_numpy(zero_copy_only=False))
    doc_of = np.repeat(np.arange(len(offs) - 1, dtype=np.int64), np.diff(offs))
    th = hash_tokens(flat)
    pos = np.searchsorted(vset_h, th)
    pos[pos == len(vset_h)] = 0
    maybe = vset_h[pos] == th
    hit = np.zeros(len(flat), dtype=bool)
    if maybe.any():
        hit[maybe] = np.isin(flat[maybe], vset)
    if not hit.any():
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    d = doc_of[hit]
    vidx = np.searchsorted(vset, flat[hit])  # exact: all are members
    key = np.unique(d * len(vset) + vidx)
    return key // len(vset), key % len(vset)


def _presence_pairs(dd: np.ndarray, vv: np.ndarray):
    """Per-doc unordered vocab-index pairs from distinct presence arrays."""
    from ..util import segment_bounds

    starts = segment_bounds(dd) if len(dd) else np.zeros(1, np.int64)
    a_p, b_p = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        if e - s < 2:
            continue
        ia, ib = np.triu_indices(e - s, k=1)
        a_p.append(vv[s:e][ia])
        b_p.append(vv[s:e][ib])
    return a_p, b_p


def term_cooccurrence(
    docs: Dataset,
    vocab_size: int = 100,
    min_count: int = 2,
    capacity: int = 4096,
    batch_size: int = 4096,
) -> Dataset:
    """Within-document co-occurrence counts over the top-``vocab_size``
    corpus terms — the collocation / PMI base table.

    ``n_docs(a, b)`` = number of docs containing BOTH terms (distinct
    presence, not token counts), for unordered pairs of the exact top-V
    vocabulary (from :func:`frequent_terms`, so the vocabulary itself is
    certified-exact or the operator raises).  Restricting to top-V bounds
    the quadratic blow-up by design: a doc emits at most V*(V-1)/2 pairs
    and the output is <= that, whatever the corpus size.  Per batch: one
    tokenize, a hash-prefiltered vocab membership, one composite
    ``np.unique`` for per-doc distinct presence, and vectorized per-doc
    pair emission pre-summed before ONE small groupby.  Scans ``docs``
    twice (once inside ``frequent_terms``' own two passes, once here) —
    pass a re-readable Dataset.

    Output: (term_a < term_b, n_docs >= ``min_count``).
    """
    import ray
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_tokens
    from ..util import segment_bounds

    vocab_pd = frequent_terms(
        docs, k=vocab_size, capacity=capacity, batch_size=batch_size
    ).to_pandas()
    vocab = np.sort(vocab_pd["term"].to_numpy(dtype=object))
    vocab_h = np.sort(hash_tokens(vocab))
    vref = ray.put((vocab, vocab_h))

    def pairs(t: pa.Table) -> pa.Table:
        vset, vset_h = ray.get(vref)
        dd, vv = _vocab_presence(t, vset, vset_h)
        empty = pa.table(
            {
                "term_a": pa.array([], pa.string()),
                "term_b": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
        a_p, b_p = _presence_pairs(dd, vv)
        if not a_p:
            return empty
        a = np.concatenate(a_p)
        b = np.concatenate(b_p)
        # pre-sum within the batch (combiner)
        pk, cnt = np.unique(a * len(vset) + b, return_counts=True)
        return pa.table(
            {
                "term_a": pa.array(vset[pk // len(vset)], pa.string()),
                "term_b": pa.array(vset[pk % len(vset)], pa.string()),
                "n_docs": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    grouped = (
        docs.map_batches(
            pairs, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
    return grouped.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], min_count)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def collocations(
    docs: Dataset,
    vocab_size: int = 100,
    min_count: int = 2,
    capacity: int = 4096,
    batch_size: int = 4096,
) -> Dataset:
    """Doc-level PMI collocations over the certified-exact top-V vocabulary.

    ``pmi(a, b) = log2(n_ab * N / (n_a * n_b))`` with doc-level
    probabilities: ``n_ab`` = docs containing both terms, ``n_a`` = docs
    containing the term, ``N`` = total docs.  One tagged-union combiner pass
    (kind 0 = pair partials, kind 1 = per-term doc-frequency partials — the
    :func:`_vocab_presence` kernel feeds both) into ONE small groupby; the
    fold-out is <= V + V*(V-1)/2 rows by construction, so the final PMI
    assembly is a bounded driver-side join.  The integer product
    ``n_ab * N`` is formed before the single float division, matching the
    SQL oracle bit-for-bit up to log2's 1-ulp (absorbed by the 1e-6 round).

    Output: (term_a < term_b, n_ab >= min_count, pmi), sorted.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash_tokens

    vocab_pd = frequent_terms(
        docs, k=vocab_size, capacity=capacity, batch_size=batch_size
    ).to_pandas()
    vocab = np.sort(vocab_pd["term"].to_numpy(dtype=object))
    vocab_h = np.sort(hash_tokens(vocab))
    vref = ray.put((vocab, vocab_h))
    n_total = docs.count()

    def fold(t: pa.Table) -> pa.Table:
        vset, vset_h = ray.get(vref)
        dd, vv = _vocab_presence(t, vset, vset_h)
        kinds, tas, tbs, ns = [], [], [], []
        if len(vv):
            uv, cv = np.unique(vv, return_counts=True)
            kinds.append(np.ones(len(uv), np.int8))
            tas.append(vset[uv])
            tbs.append(np.full(len(uv), "", dtype=object))
            ns.append(cv.astype(np.int64))
        a_p, b_p = _presence_pairs(dd, vv)
        if a_p:
            a, b = np.concatenate(a_p), np.concatenate(b_p)
            pk, cnt = np.unique(a * len(vset) + b, return_counts=True)
            kinds.append(np.zeros(len(pk), np.int8))
            tas.append(vset[pk // len(vset)])
            tbs.append(vset[pk % len(vset)])
            ns.append(cnt.astype(np.int64))
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate(kinds) if kinds else np.zeros(0, np.int8),
                    pa.int8(),
                ),
                "term_a": pa.array(
                    np.concatenate(tas) if tas else np.zeros(0, object),
                    pa.string(),
                ),
                "term_b": pa.array(
                    np.concatenate(tbs) if tbs else np.zeros(0, object),
                    pa.string(),
                ),
                "n": pa.array(
                    np.concatenate(ns) if ns else np.zeros(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    small = (
        docs.map_batches(
            fold, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby(["kind", "term_a", "term_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    df = small[small["kind"] == 1].set_index("term_a")["n"]
    prs = small[(small["kind"] == 0) & (small["n"] >= min_count)]
    if len(prs) == 0:
        out = pd.DataFrame(
            {
                "term_a": pd.Series([], dtype=object),
                "term_b": pd.Series([], dtype=object),
                "n_ab": pd.Series([], dtype=np.int64),
                "pmi": pd.Series([], dtype=np.float64),
            }
        )
        return ray.data.from_pandas(out)
    n_ab = prs["n"].to_numpy(np.int64)
    n_a = df.reindex(prs["term_a"]).to_numpy(np.int64)
    n_b = df.reindex(prs["term_b"]).to_numpy(np.int64)
    pmi = np.log2((n_ab * n_total).astype(np.float64) / (n_a * n_b))
    out = (
        pd.DataFrame(
            {
                "term_a": prs["term_a"].to_numpy(dtype=object),
                "term_b": prs["term_b"].to_numpy(dtype=object),
                "n_ab": n_ab,
                "pmi": pmi,
            }
        )
        .sort_values(["term_a", "term_b"])
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(out)


def badwords_filter(
    docs: Dataset, badwords: "list[str]", batch_size: int = 4096,
    keep_all: bool = False,
) -> Dataset:
    """C4-style word-blocklist screening: count blocklisted tokens per doc.

    The "bad words" pass every public web-text recipe runs (C4 §2.2 drops any
    page containing a word from the public blocklist; Gopher and RefinedWeb
    keep variants).  Matching is EXACT token equality over the normalized
    whitespace tokenization (the ``token_stats`` contract), so the DuckDB
    oracle is a verbatim ``IN``-list — no substring surprises ("class" never
    matches a blocklisted "ass").

    Output: (doc_id, n_bad_tokens, flagged int32) — one row per input doc;
    survivors are ``filter(flagged == 0)`` downstream, mirroring the
    :func:`contamination_stats` composition shape.

    Scale shape: stateless scan, no exchange.  The blocklist broadcasts once
    via ``ray.put`` as an Arrow value_set (public lists are a few thousand
    words); per batch, ONE ``pc.is_in`` over the flat token array and one
    segmented ``reduceat`` per doc — no per-row Python.
    """
    import ray as _ray

    bad_ref = _ray.put(pa.array(sorted(set(badwords)), pa.string()))

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        arr = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
        toks = pc.split_pattern(arr, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        flat = toks.flatten()
        hit = np.asarray(
            pc.is_in(flat, value_set=_ray.get(bad_ref)).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(hit)))
        n_bad = csum[offs[1:]] - csum[offs[:-1]]
        nb = pa.array(n_bad, pa.int64())
        fl = pa.array((n_bad > 0).astype(np.int32), pa.int32())
        if keep_all:  # composition form: every input column passes through
            return t.append_column("n_bad_tokens", nb).append_column("flagged", fl)
        return pa.table({"doc_id": t["doc_id"], "n_bad_tokens": nb, "flagged": fl})

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def lexical_diversity(docs: Dataset, batch_size: int = 4096) -> Dataset:
    """Per-doc lexical diversity: token count, type count, type-token ratio
    and Shannon entropy of the token distribution (bits).

    Low entropy / low TTR flags template and keyword-stuffing pages that
    length rules miss — the diversity member of the quality-signal family
    (complements `gopher_quality`'s ratio rules and `repetition_stats`'
    gram ratios).  Tokenization is the normalized ``token_stats`` contract.

    Output: (doc_id, n_tokens, n_types, ttr, token_entropy) with the floats
    rounded to 6 dp on BOTH engines (the shared float-sum convention).
    Scale shape: stateless scan, no exchange — per batch one global token
    factorize + one (doc, type) unique with counts + segmented reduces.
    """

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_array(t["text"])
        arr = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
        toks = pc.split_pattern(arr, pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        n_docs = len(offs) - 1
        n_tok = np.diff(offs)
        flat = pc.dictionary_encode(toks.flatten())
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        code = np.asarray(flat.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_tok)
        rec = doc_of << np.int64(32) | code  # vocab per batch << 2^32
        uniq, cnt = np.unique(rec, return_counts=True)
        ud = (uniq >> np.int64(32)).astype(np.int64)
        b = np.nonzero(np.concatenate(([True], ud[1:] != ud[:-1])))[0]
        n_types = np.diff(np.append(b, len(ud)))
        p = cnt / n_tok[ud]
        h_terms = -p * np.log2(p)
        ent = np.add.reduceat(h_terms, b) if len(b) else h_terms[:0]
        # every doc has >= 1 token post-normalization (empty -> [''])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_types": pa.array(n_types, pa.int64()),
                "ttr": pa.array(np.round(n_types / n_tok, 6), pa.float64()),
                # + 0.0 canonicalizes IEEE -0.0 (single-type docs) so the
                # value hash agrees with SQL regardless of sign-of-zero
                "token_entropy": pa.array(np.round(ent, 6) + 0.0, pa.float64()),
            }
        )

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )

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
from ..functions.hashing import winnow_fingerprints
from ..functions.text import normalize_array


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


def quality_scores(docs: Dataset, batch_size: int = 4096) -> Dataset:
    """(doc_id, text) -> per-doc quality features + composite score.

    Features (all SQL-expressible): digit_ratio, space_ratio, mean_token_len,
    n_chars; score = n_chars capped at 2000, scaled to 0-100, penalized by
    digit-heavy content — the analog of the reference's 0-100 Laplacian score
    (/root/reference/modules/deduplication.py:1575-1609).
    """

    def fn(t: pa.Table) -> pa.Table:
        text = t["text"]
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


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with", "on"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein", "eine", "zu"},
    "fr": {"le", "la", "les", "et", "est", "des", "un", "une", "dans", "que", "pour", "pas"},
    "es": {"el", "la", "los", "las", "y", "es", "de", "que", "en", "un", "una", "por"},
}


class LangIdActor:
    """Stopword-ratio language id — state (compiled vocab) built once per actor.

    The n-gram-heuristic analog of fasttext-style lang id; deterministic
    tie-break by language code.
    """

    def __init__(self):
        self.vocab = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.split()
        langs, scores = [], []
        for ts in toks:
            ts = ts or []
            n = max(len(ts), 1)
            best_lang, best = "und", 0.0
            for lang in sorted(self.vocab):
                r = sum(1 for w in ts if w in self.vocab[lang]) / n
                if r > best:
                    best_lang, best = lang, r
            langs.append(best_lang if best >= 0.05 else "und")
            scores.append(round(best, 6))
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "pred_lang": langs, "stopword_ratio": scores}
        )


def lang_id(docs: Dataset, concurrency: int = 4, batch_size: int = 4096) -> Dataset:
    return docs.map_batches(
        LangIdActor, batch_format="pandas", batch_size=batch_size, concurrency=concurrency
    )


def doc_fingerprints(docs: Dataset, cfg: DedupConfig, batch_size: int = 1024) -> Dataset:
    """(doc_id, text) -> (doc_id, n_fingerprints, fp_min, fp_xor): rolling-hash
    winnowing fingerprint summary per doc (content-defined signature)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"]
        texts = normalize_array(t["text"]).to_pylist()
        n, fmin, fxor = [], [], []
        for s in texts:
            fps, _ = winnow_fingerprints(s, cfg.winnow_kgram, cfg.winnow_window)
            n.append(len(fps))
            fmin.append(int(fps.min()) if len(fps) else 0)
            x = 0
            for v in fps:
                x ^= int(v)
            fxor.append(x)
        return pa.table(
            {
                "doc_id": ids,
                "n_fingerprints": pa.array(n, pa.int64()),
                "fp_min": pa.array(fmin, pa.uint64()),
                "fp_xor": pa.array(fxor, pa.uint64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)

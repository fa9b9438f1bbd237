"""Extract stage: pages -> docs (HTML -> text where needed, normalize, doc ids).

Reference analog: the image-decode + preprocess step of Stage 1
(/root/reference/modules/memory_efficient_deduplication.py:223-246 — download,
decode, compute, drop the raw image).  Here the raw payload (``html``) is
dropped immediately after extraction, so no later stage ever ships multi-MB
binary rows through a shuffle (SURVEY.md §7.4 "very wide rows").

Stateless ``map_batches`` over zero-copy Arrow batches; per-row Python (the
regex extractor) runs ONLY for rows whose ``text`` column is empty.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..config import DedupConfig
from ..functions.extract import extract_text
from ..functions.text import normalize_array


def doc_ids_for_urls(urls: np.ndarray) -> np.ndarray:
    """Deterministic uint64 doc id from the url (the primary key).

    The reference keys every record by its blob-path string
    (/root/reference/modules/feature_cache.py:195-206); a fixed-width integer
    key shuffles far cheaper than a string at 10^12-row scale.  64-bit
    collisions are ~1e-5 probable at 10^12 docs per the birthday bound times
    #docs — acceptable for dedup (a collision merges two docs' identities and
    is caught by verification emitting jaccard<t pairs that simply don't
    cluster); exact-key workloads should keep ``url``.

    The id is the md5 anchor (== DuckDB ``md5_number_lower(url)``), which
    makes every downstream id — cluster labels are min doc_ids — exactly
    recomputable by the SQL oracle.  Cost is ~1 us per url, once per document
    at ingest (never in a hot shuffle), i.e. noise against HTML extraction.
    """
    from ..functions.hashing import md5_u64

    return md5_u64(np.asarray(urls, dtype=object))


def _extract_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
    need = pc.or_kleene(pc.is_null(text), pc.equal(text, pa.scalar(""))).to_numpy(
        zero_copy_only=False
    )
    need = np.asarray(need, dtype=bool)
    if need.any():
        # per-row Python ONLY for rows whose text must come from html: gather
        # just those rows' payloads (take), extract, and scatter the results
        # back with an Arrow kernel — rows that already have text are never
        # converted to Python (the old to_pylist() gathered the whole block)
        idx = np.nonzero(need)[0]
        html_col = batch["html"] if "html" in batch.column_names else None
        if html_col is not None:
            htmls = html_col.take(pa.array(idx, pa.int64())).to_pylist()
        else:
            htmls = [None] * len(idx)
        extracted = [extract_text(raw) if raw else "" for raw in htmls]
        raw_text = pc.replace_with_mask(
            text, pa.array(need), pa.array(extracted, pa.string())
        )
    else:
        raw_text = text  # zero-copy fast path
    norm = normalize_array(raw_text)
    urls = batch["url"].to_numpy(zero_copy_only=False)
    out = pa.table(
        {
            "doc_id": pa.array(doc_ids_for_urls(urls), pa.uint64()),
            "url": batch["url"].combine_chunks()
            if isinstance(batch["url"], pa.ChunkedArray)
            else batch["url"],
            "norm_text": norm,
            "n_chars": pc.utf8_length(raw_text).cast(pa.int64()),
            "lang": batch["lang"].combine_chunks()
            if isinstance(batch["lang"], pa.ChunkedArray)
            else batch["lang"],
        }
    )
    return out


def extract_stage(pages: Dataset, cfg: DedupConfig) -> Dataset:
    """pages(url, warc_ts, html, text, lang) -> docs(doc_id, url, norm_text, n_chars, lang)."""
    return pages.map_batches(
        _extract_batch,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )

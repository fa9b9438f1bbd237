"""Sources: the pages Parquet reader and a documents-table adapter.

Reference analog: the blob lister + downloader (S1-S3,
/root/reference/modules/azure_utils.py:295-325,609-652) — in the target the
payload already lives in Parquet, so the whole ingest surface is
``ray.data.read_parquet`` with column pruning and optional row filters
(SURVEY.md §2.1).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset


def read_pages(
    path: str,
    columns: Optional[Sequence[str]] = None,
    lang: Optional[str] = None,
) -> Dataset:
    """Read a pages Parquet table with column pruning + lang row-filter pushdown."""
    filt = (pc.field("lang") == lang) if lang is not None else None
    return ray.data.read_parquet(path, columns=list(columns) if columns else None, filter=filt)


def read_documents(
    path: str,
    format: str = "parquet",
    columns: Optional[Sequence[str]] = None,
    lang: Optional[str] = None,
) -> Dataset:
    """Format-agnostic documents reader: Parquet (the scale path), CSV, JSONL.

    Parquet gets true read-level pruning (columns + lang row-filter pushed
    into the fragment scan); CSV/JSONL are row-oriented text formats with no
    column projection at the storage layer, so pruning happens in the first
    ``map_batches`` after parse — correct, but ships whole rows off disk,
    which is why Parquet is the recommended interchange format at scale
    (SURVEY.md §2.1; reference CSV feature I/O S8 is n/a-by-design for the
    same reason).
    """
    cols = list(columns) if columns else None
    if format == "parquet":
        filt = (pc.field("lang") == lang) if lang is not None else None
        return ray.data.read_parquet(path, columns=cols, filter=filt)
    if format == "csv":
        ds = ray.data.read_csv(path)
    elif format in ("json", "jsonl"):
        ds = ray.data.read_json(path)
    else:
        raise ValueError(f"unknown format {format!r} (parquet|csv|jsonl)")

    def prune(t: pa.Table) -> pa.Table:
        if lang is not None:
            t = t.filter(pc.equal(t["lang"], lang))
        return t.select(cols) if cols else t

    return ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)


def documents_as_pages(sf_dir: str, num_blocks: int | None = None) -> Dataset:
    """Adapt the driver testdata ``documents`` table (doc_id, text, lang, source,
    n_chars) into the pages shape so the dedup pipeline can run on it.

    ``num_blocks`` splits the single-file read so downstream actor pools get
    enough input blocks to parallelize (a one-file Parquet read otherwise
    yields one block at small scale).
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=num_blocks,
    )

    def to_pages(t: pa.Table) -> pa.Table:
        urls = pc.binary_join_element_wise(
            pa.array(["doc://"] * len(t), pa.string()),
            pc.cast(t["doc_id"], pa.string()),
            "",
        )
        return pa.table(
            {
                "url": urls,
                "warc_ts": pa.array([0] * len(t), pa.timestamp("us")),
                "html": pa.array([b""] * len(t), pa.binary()),
                "text": t["text"],
                "lang": t["lang"],
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)

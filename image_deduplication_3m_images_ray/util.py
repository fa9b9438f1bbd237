"""Small Dataset helpers shared across stages."""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset


def rename_columns(ds: Dataset, mapping: dict) -> Dataset:
    """Rename columns by NAME (not position) via a zero-copy batch map."""

    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

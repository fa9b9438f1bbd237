"""Report sinks: partitioned Parquet outputs.

Reference analog S9: after the CSV report the reference server-side copies
Best/Duplicate blobs into ``best/`` and ``duplicates/`` prefixes
(/root/reference/pipeline.py:642-741, copy_blob azure_utils.py:584-607).
Here the outputs are written as Parquet partitioned by ``status`` — one
directory per status so downstream consumers (e.g. a training-data loader
that only wants the canonical Best docs) read exactly their slice.
"""

from __future__ import annotations

import os

import pyarrow.compute as pc

from ray.data import Dataset

STATUSES = ("Best", "Duplicate", "Unique")


def write_report(report: Dataset, out_dir: str) -> dict:
    """Write the dedup report partitioned by status; returns rows per status.

    Layout: ``out_dir/status=Best/*.parquet`` etc. — each partition written
    independently so a rerun that only needs one slice can target it.
    """
    for status in STATUSES:
        part = report.map_batches(
            lambda t, s=status: t.filter(pc.equal(t["status"], s)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        path = os.path.join(out_dir, f"status={status}")
        os.makedirs(path, exist_ok=True)
        part.write_parquet(path)

    # row counts from Parquet footers (no second pipeline pass)
    import pyarrow.parquet as pq

    counts = {}
    for status in STATUSES:
        path = os.path.join(out_dir, f"status={status}")
        counts[status] = sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return counts

"""Report sinks: partitioned Parquet + reference-parity CSV.

Reference analog S7/S9: the reference's primary artifact is a single sorted
``image_report.csv`` (/root/reference/modules/deduplication.py:1611-1672) and
a server-side copy of Best/Duplicate blobs into per-status prefixes
(/root/reference/pipeline.py:642-741, copy_blob azure_utils.py:584-607).
Here the scale path writes Parquet partitioned by ``status`` in ONE pipeline
pass — one directory per status so downstream consumers (e.g. a training-data
loader that only wants the canonical Best docs) read exactly their slice —
and ``write_report_csv`` streams the same report into one CSV file for
reference parity (inherently serial by format; use the Parquet sink at scale).
"""

from __future__ import annotations

import os

from ray.data import Dataset

STATUSES = ("Best", "Duplicate", "Unique")

REPORT_COLUMNS = ["url", "doc_id", "cluster_id", "cluster_size", "quality", "status"]


def write_report(report: Dataset, out_dir: str) -> dict:
    """Write the dedup report partitioned by status; returns rows per status.

    Layout: ``out_dir/status=Best/*.parquet`` etc., produced by a SINGLE
    execution of the upstream pipeline (``partition_cols`` fans rows out at
    the writer, so a lazy ``report`` is not re-run once per status).
    """
    os.makedirs(out_dir, exist_ok=True)
    report.write_parquet(out_dir, partition_cols=["status"])

    # row counts from Parquet footers (no second pipeline pass)
    import pyarrow.parquet as pq

    counts = {}
    for status in STATUSES:
        path = os.path.join(out_dir, f"status={status}")
        counts[status] = (
            sum(
                pq.read_metadata(os.path.join(path, f)).num_rows
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if os.path.isdir(path)
            else 0
        )
    return counts


def write_report_csv(report: Dataset, out_path: str, batch_size: int = 8192) -> int:
    """Stream the report into ONE csv file (reference ``image_report.csv``
    parity — /root/reference/modules/deduplication.py:1611-1672).

    The caller is expected to pass the already-sorted report (the pipeline
    sorts by (cluster_id, status), mirroring the reference's sort at :1646).
    Streaming ``iter_batches`` keeps driver memory at one batch; a single CSV
    file is inherently a serial artifact — at 100 TB use :func:`write_report`.
    Returns the number of rows written.
    """
    import csv

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    n = 0
    tmp = out_path + ".tmp"
    with open(tmp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(REPORT_COLUMNS)
        for batch in report.iter_batches(batch_size=batch_size, batch_format="pandas"):
            cols = [c for c in REPORT_COLUMNS if c in batch.columns]
            w.writerows(batch[cols].itertuples(index=False, name=None))
            n += len(batch)
    os.replace(tmp, out_path)
    return n

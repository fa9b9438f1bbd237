"""Per-stage Parquet checkpoints with per-partition lineage (resume support).

Reference analog: the progress-JSON + disk feature cache resume path
(/root/reference/pipeline.py:149-173,464-476 — processed-file set +
``BoundedFeatureCache``), except the reference's dedup phase itself is NOT
resumable; here every stage boundary is, and a stage killed mid-write resumes
at the granularity of its output PARTITIONS, not the whole stage.

Protocol (north rule: "resumable from checkpoint with per-partition lineage +
metrics"):

- **partitioned stages** (``partition_key=`` given): the output is written as
  ``data/part-K.parquet`` for K in [0, num_output_partitions) with
  ``part = splitmix64(key) % P``; each partition file is written to a ``.tmp``
  name and atomically renamed, so an existing ``part-K.parquet`` IS a complete
  partition.  ``pending.json`` (written before any compute) pins the config
  hash + upstream lineage of the in-flight attempt: a resume with matching
  lineage recomputes ONLY the missing partitions (existing files are neither
  re-read nor rewritten); a mismatch wipes the stage.  Rows inside a partition
  are sorted by ``sort_keys`` before writing, so a resumed run's recreated
  partitions are byte-identical to an uninterrupted run's.
- **whole stages** (no ``partition_key``): the previous protocol — data
  without a manifest is wiped and recomputed as a unit (used for the terminal
  sorted report, where hash partitioning would destroy the sort contract).
- ``manifest.json`` is the stage-level completeness marker carrying the config
  hash, upstream stage lineage, and per-partition row/byte counters; a
  manifest whose ``config_hash`` or ``parents`` lineage mismatches is stale
  and recomputed (changed config invalidates downstream, not upstream).
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone
from typing import Callable, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data
from ray.data import Dataset

from ..config import DedupConfig

MANIFEST = "manifest.json"
PENDING = "pending.json"


def _part_file(k: int) -> str:
    return f"part-{k:05d}.parquet"


class CheckpointManager:
    """Runs stages with skip-if-complete / resume-missing-partitions semantics.

    ``root=None`` disables checkpointing entirely (pure streaming pipeline) —
    stages pass through lazily.
    """

    def __init__(self, root: Optional[str], cfg: DedupConfig, progress=None):
        self.root = root
        self.cfg = cfg
        self.progress = progress  # per-stage metrics callback (stage, info)
        if root:
            os.makedirs(root, exist_ok=True)

    def _report(self, name: str, t0: float, rows, skipped: bool) -> None:
        if self.progress is not None:
            import time

            self.progress(
                name, {"seconds": round(time.time() - t0, 3), "rows": rows, "skipped": skipped}
            )

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def manifest(self, name: str) -> Optional[dict]:
        if not self.root:
            return None
        path = os.path.join(self._stage_dir(name), MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _lineage(self, parents: Sequence[str]) -> dict:
        return {p: (self.manifest(p) or {}).get("stage_id") for p in parents}

    def is_complete(self, name: str, parents: list[str]) -> bool:
        m = self.manifest(name)
        if m is None:
            return False
        if m.get("config_hash") != self.cfg.config_hash():
            return False
        return m.get("parents") == self._lineage(parents)

    def run(
        self,
        name: str,
        build: Callable[[], Dataset],
        parents: list[str] = (),
        partition_key: Optional[str] = None,
        sort_keys: Optional[list[str]] = None,
    ) -> Dataset:
        """Return the stage's output Dataset, computing + persisting if needed.

        With ``partition_key`` the stage output is hash-partitioned into
        ``cfg.num_output_partitions`` atomic files and a killed run resumes by
        recomputing only the partitions that are missing on disk.
        """
        if not self.root:
            return build()
        import time

        t0 = time.time()
        sdir = self._stage_dir(name)
        data_dir = os.path.join(sdir, "data")
        if self.is_complete(name, list(parents)):
            self._report(name, t0, (self.manifest(name) or {}).get("total_rows"), True)
            return ray.data.read_parquet(data_dir)
        if partition_key is None:
            if os.path.exists(sdir):
                shutil.rmtree(sdir)  # partial / stale output
            os.makedirs(data_dir, exist_ok=True)
            ds = build()
            ds.write_parquet(data_dir)
            partitions, total_rows = self._scan_files(data_dir)
            self._finish(name, sdir, parents, partitions, total_rows)
            self._report(name, t0, total_rows, False)
            return ray.data.read_parquet(data_dir)
        out = self._run_partitioned(name, build, list(parents), partition_key, sort_keys)
        self._report(name, t0, (self.manifest(name) or {}).get("total_rows"), False)
        return out

    # --- partitioned protocol -------------------------------------------------

    def _run_partitioned(
        self,
        name: str,
        build: Callable[[], Dataset],
        parents: list[str],
        key: str,
        sort_keys: Optional[list[str]],
    ) -> Dataset:
        sdir = self._stage_dir(name)
        data_dir = os.path.join(sdir, "data")
        n_parts = self.cfg.num_output_partitions
        want = {
            "config_hash": self.cfg.config_hash(),
            "parents": self._lineage(parents),
            "partitions": n_parts,
            "partition_key": key,
        }
        pending_path = os.path.join(sdir, PENDING)
        pending = None
        if os.path.exists(pending_path):
            with open(pending_path) as f:
                pending = json.load(f)
        stale_manifest = self.manifest(name) is not None  # complete-but-mismatched
        if pending != want or stale_manifest:
            if os.path.exists(sdir):
                shutil.rmtree(sdir)  # different attempt lineage: start clean
        os.makedirs(data_dir, exist_ok=True)
        if not os.path.exists(pending_path):
            tmp = pending_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(want, f, indent=1)
            os.replace(tmp, pending_path)
        for f in os.listdir(data_dir):  # garbage from a killed writer
            if f.endswith(".tmp"):
                os.remove(os.path.join(data_dir, f))
        have = {
            f for f in os.listdir(data_dir) if f.startswith("part-") and f.endswith(".parquet")
        }
        missing = [k for k in range(n_parts) if _part_file(k) not in have]
        if missing:
            write_partitions(build(), data_dir, key, n_parts, missing, sort_keys)
        partitions, total_rows = self._scan_files(data_dir)
        self._finish(name, sdir, parents, partitions, total_rows, extra=want)
        return ray.data.read_parquet(data_dir)

    # --- shared ---------------------------------------------------------------

    def _scan_files(self, data_dir: str):
        files = sorted(f for f in os.listdir(data_dir) if f.endswith(".parquet"))
        partitions, total_rows = [], 0
        for f in files:
            p = os.path.join(data_dir, f)
            md = pq.read_metadata(p)  # footer-only read
            partitions.append({"file": f, "rows": md.num_rows, "bytes": os.path.getsize(p)})
            total_rows += md.num_rows
        return partitions, total_rows

    def _finish(self, name, sdir, parents, partitions, total_rows, extra: dict | None = None):
        manifest = {
            "stage": name,
            "stage_id": f"{name}:{self.cfg.config_hash()}:{total_rows}",
            "config_hash": self.cfg.config_hash(),
            "parents": self._lineage(parents),
            "partitions": partitions,
            "total_rows": total_rows,
            "finished_at": datetime.now(timezone.utc).isoformat(),
        }
        if extra:
            manifest["partition_key"] = extra["partition_key"]
            manifest["num_partitions"] = extra["partitions"]
        tmp = os.path.join(sdir, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(sdir, MANIFEST))  # atomic completeness marker
        return manifest


def write_partitions(
    ds: Dataset,
    data_dir: str,
    key: str,
    n_parts: int,
    missing: Sequence[int],
    sort_keys: Optional[list[str]] = None,
) -> None:
    """Write ``ds`` rows whose partition is in ``missing`` as atomic per-partition
    Parquet files (``part-K.parquet``), sorted by ``sort_keys`` for determinism.

    partition(row) = splitmix64(uint64(key)) % n_parts.  One write task per
    partition (the partition IS the resume unit); renames are atomic, so a
    reader never sees a half-written partition.
    """
    from ..functions.hashing import U64, splitmix64

    missing_arr = np.zeros(n_parts, dtype=bool)
    for k in missing:
        missing_arr[k] = True
    sort_keys = sort_keys or [key]

    def assign(t: pa.Table) -> pa.Table:
        v = np.asarray(t[key].to_numpy(zero_copy_only=False)).astype(U64)
        part = (splitmix64(v) % U64(n_parts)).astype(np.int64)
        t = t.append_column("__part", pa.array(part, pa.int64()))
        return t.filter(pa.array(missing_arr[part]))

    def write_group(g: "pa.Table | dict") -> dict:
        import pandas as pd

        if isinstance(g, dict):
            g = pa.table({k: pa.array(v) for k, v in g.items()})
        elif isinstance(g, pd.DataFrame):
            g = pa.Table.from_pandas(g, preserve_index=False)
        k = int(g["__part"][0].as_py())
        g = g.drop_columns(["__part"])
        order = pa.compute.sort_indices(
            g, sort_keys=[(c, "ascending") for c in sort_keys]
        )
        g = g.take(order).combine_chunks()
        final = os.path.join(data_dir, _part_file(k))
        tmp = final + f".{os.getpid()}.tmp"
        pq.write_table(g, tmp)
        os.replace(tmp, final)  # atomic completeness marker for the partition
        return {"part": np.array([k], dtype=np.int64), "rows": np.array([len(g)], dtype=np.int64)}

    (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(write_group, batch_format="pyarrow")
        .materialize()  # drive the writes; stats come from footers afterwards
    )

    # a partition with zero rows produces no group: write its (empty) file so
    # completeness is decidable from the filesystem alone
    empty_parts = [
        k for k in missing if not os.path.exists(os.path.join(data_dir, _part_file(k)))
    ]
    if empty_parts:
        # prefer a written file's footer for the schema (free); fall back to
        # ds.schema() only when every partition of the stage is empty
        written = sorted(
            f for f in os.listdir(data_dir) if f.startswith("part-") and f.endswith(".parquet")
        )
        if written:
            schema = pq.read_schema(os.path.join(data_dir, written[0]))
        else:
            schema = _arrow_schema(ds)
        empty = pa.table({f.name: pa.array([], f.type) for f in schema})
        for k in empty_parts:
            final = os.path.join(data_dir, _part_file(k))
            tmp = final + f".{os.getpid()}.tmp"
            pq.write_table(empty, tmp)
            os.replace(tmp, final)


def _arrow_schema(ds: Dataset) -> pa.Schema:
    s = ds.schema()
    fields = []
    for n, t in zip(s.names, s.types):
        if not isinstance(t, pa.DataType):
            t = {str: pa.string(), bytes: pa.binary(), int: pa.int64(), float: pa.float64()}.get(
                t, pa.from_numpy_dtype(t)
            )
        fields.append(pa.field(n, t))
    return pa.schema(fields)

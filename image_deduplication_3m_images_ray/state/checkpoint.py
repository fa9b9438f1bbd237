"""Per-stage Parquet checkpoints with lineage manifests (resume support).

Reference analog: the progress-JSON + disk feature cache resume path
(/root/reference/pipeline.py:149-173,464-476 — processed-file set +
``BoundedFeatureCache``), except the reference's dedup phase itself is NOT
resumable; here every stage boundary is.

Protocol (north rule: "resumable from checkpoint with per-partition lineage +
metrics"):
- a stage writes its output Dataset to ``<root>/<stage>/data/`` as partitioned
  Parquet, then atomically writes ``<root>/<stage>/manifest.json`` carrying the
  config hash, upstream stage lineage, per-file row counts and byte sizes;
- the manifest's existence IS the completeness marker: a run killed mid-write
  leaves data without a manifest, and the next run wipes and recomputes that
  stage only — everything upstream with a valid manifest is loaded back with
  ``read_parquet`` (column-pruned by the consumer);
- a manifest whose ``config_hash`` or ``parents`` lineage mismatches is stale
  and recomputed (changed config invalidates downstream, not upstream).
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone
from typing import Callable, Optional

import pyarrow.parquet as pq

import ray.data
from ray.data import Dataset

from ..config import DedupConfig

MANIFEST = "manifest.json"


class CheckpointManager:
    """Runs stages with skip-if-complete semantics.

    ``root=None`` disables checkpointing entirely (pure streaming pipeline) —
    stages pass through lazily.
    """

    def __init__(self, root: Optional[str], cfg: DedupConfig):
        self.root = root
        self.cfg = cfg
        if root:
            os.makedirs(root, exist_ok=True)

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

    def is_complete(self, name: str, parents: list[str]) -> bool:
        m = self.manifest(name)
        if m is None:
            return False
        if m.get("config_hash") != self.cfg.config_hash():
            return False
        want_parents = {p: (self.manifest(p) or {}).get("stage_id") for p in parents}
        return m.get("parents") == want_parents

    def run(
        self,
        name: str,
        build: Callable[[], Dataset],
        parents: list[str] = (),
    ) -> Dataset:
        """Return the stage's output Dataset, computing + persisting if needed."""
        if not self.root:
            return build()
        sdir = self._stage_dir(name)
        data_dir = os.path.join(sdir, "data")
        if self.is_complete(name, list(parents)):
            return ray.data.read_parquet(data_dir)
        if os.path.exists(sdir):
            shutil.rmtree(sdir)  # partial / stale output
        os.makedirs(data_dir, exist_ok=True)
        ds = build()
        ds.write_parquet(data_dir)
        files = sorted(
            f for f in os.listdir(data_dir) if f.endswith(".parquet")
        )
        partitions = []
        total_rows = 0
        for f in files:
            p = os.path.join(data_dir, f)
            md = pq.read_metadata(p)  # footer-only read
            partitions.append({"file": f, "rows": md.num_rows, "bytes": os.path.getsize(p)})
            total_rows += md.num_rows
        manifest = {
            "stage": name,
            "stage_id": f"{name}:{self.cfg.config_hash()}:{total_rows}",
            "config_hash": self.cfg.config_hash(),
            "parents": {p: (self.manifest(p) or {}).get("stage_id") for p in parents},
            "partitions": partitions,
            "total_rows": total_rows,
            "finished_at": datetime.now(timezone.utc).isoformat(),
        }
        tmp = os.path.join(sdir, MANIFEST + ".tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(sdir, MANIFEST))  # atomic completeness marker
        return ray.data.read_parquet(data_dir)

"""Checkpoint / resume layer: per-stage Parquet + lineage manifests."""

from .checkpoint import CheckpointManager

__all__ = ["CheckpointManager"]

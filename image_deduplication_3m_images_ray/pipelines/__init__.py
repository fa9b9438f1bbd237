"""End-to-end pipeline compositions."""

from .dedup import dedup_pipeline

__all__ = ["dedup_pipeline"]

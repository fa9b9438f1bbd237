"""End-to-end pipeline compositions."""

from .dedup import cluster_stats_pipeline, dedup_pipeline, run_dedup_pipeline

__all__ = ["cluster_stats_pipeline", "dedup_pipeline", "run_dedup_pipeline"]

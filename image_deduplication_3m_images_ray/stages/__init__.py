"""Dataset -> Dataset stage functions composing the near-dup pipeline.

Each stage is a pure function over ``ray.data.Dataset`` (plus the frozen
config), mirroring the reference's 5-stage hierarchical deduplicator
(/root/reference/modules/deduplication.py:1019-1205) re-expressed as Ray Data
transforms per SURVEY.md §7.
"""

from .extract import extract_stage
from .exact import exact_rep_stage, reps_only
from .signatures import SignatureActor, SignatureKernel, signature_stage
from .banding import band_postings_stage, lsh_pairs_stage
from .winnow import fingerprint_stage, winnow_pairs_stage
from .verify import prepare_candidates, verify_prepared, verify_stage
from .cluster import cluster_stage
from .report import report_stage

__all__ = [
    "extract_stage",
    "exact_rep_stage",
    "reps_only",
    "SignatureActor",
    "SignatureKernel",
    "signature_stage",
    "band_postings_stage",
    "lsh_pairs_stage",
    "fingerprint_stage",
    "winnow_pairs_stage",
    "prepare_candidates",
    "verify_prepared",
    "verify_stage",
    "cluster_stage",
    "report_stage",
]

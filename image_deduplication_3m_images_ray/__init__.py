"""Ray-Data-native near-duplicate detection + clustering engine for webtext.

A from-scratch reimplementation of the embed-then-cluster dedup pattern of the
reference repo (`JohnLloyd-dev/Image-deduplication-3M-images`, read-only at
/root/reference) for Common-Crawl-style web pages stored in Parquet:

    cheap sketch -> LSH bucketing -> staged pairwise verification
        -> union-find clustering -> canonical-representative selection

(reference: modules/deduplication.py:1019-1205), expressed end-to-end as
``ray.data.Dataset`` transformations over zero-copy Arrow batches.

Package layout
--------------
- ``config``     frozen config dataclass (shingle k, perms, bands, thresholds, seeds)
- ``schemas``    pyarrow schema constants for every stage boundary
- ``functions``  pure, deterministic kernels (normalize, shingle, minhash, simhash,
                 winnowing) shared by the Ray stages AND the single-process oracle
- ``stages``     Dataset -> Dataset stage functions (extract, signatures, banding,
                 fingerprints, verify, cluster, report)
- ``pipelines``  end-to-end composition + checkpointing stage runner
- ``state``      per-stage Parquet checkpoint manifests (resume support)
- ``sources``    readers/writers for the pages table
- ``extras``     training-data-pipeline operators beyond the reference (exact dedup,
                 SimHash dedup, n-gram Jaccard, ANN search, text stats, multimodal)
- ``oracle``     single-process NumPy oracle for conformance testing
- ``fixtures``   deterministic synthetic pages corpus generator (FIXTURES.md)
"""

from .config import DedupConfig

__all__ = ["DedupConfig"]

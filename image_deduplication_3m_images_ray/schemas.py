"""Arrow schema constants for every stage boundary.

The reference has no schema layer — feature dicts are duck-typed and every
consumer re-checks for missing keys (/root/reference/modules/deduplication.py:254-260,
/root/reference/modules/memory_efficient_deduplication.py:207-213).  Here each stage
asserts its input/output schema instead, which is the Ray-Data-native replacement
for those pervasive per-record ``None`` checks (SURVEY.md §1.2).
"""

from __future__ import annotations

import pyarrow as pa

# primary input (BASELINE.json input_hint)
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# extract stage output — the reference analog is the decoded-image record
# (/root/reference/modules/azure_utils.py:525-549)
DOCS = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("url", pa.string()),
        ("norm_text", pa.string()),
        ("n_chars", pa.int64()),
        ("lang", pa.string()),
    ]
)

# signature stage output — analog of the cached feature dict
# {wavelet, global, quality_score} (/root/reference/modules/feature_extraction.py:192-196)
PROFILE = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("url", pa.string()),
        ("norm_text", pa.string()),
        ("minhash", pa.list_(pa.uint64())),
        ("simhash", pa.uint64()),
        ("n_shingles", pa.int64()),
        ("quality", pa.float64()),
    ]
)

# LSH band postings — analog of the wavelet LSH bucket contents
# (/root/reference/modules/deduplication.py:270-283)
BAND_POSTINGS = pa.schema(
    [
        ("band_key", pa.uint64()),
        ("doc_id", pa.uint64()),
    ]
)

# candidate pairs (doc_a < doc_b) — analog of within-bucket pair enumeration
# (/root/reference/modules/deduplication.py:321-338)
CANDIDATE_PAIRS = pa.schema(
    [
        ("doc_a", pa.uint64()),
        ("doc_b", pa.uint64()),
        ("origin", pa.string()),  # 'lsh' | 'winnow'
        ("pos_a", pa.int64()),    # fingerprint byte positions (winnow only; -1 for lsh)
        ("pos_b", pa.int64()),
    ]
)

# verified pairs — analog of the accumulated similarity_scores dict
# (/root/reference/modules/deduplication.py:1049,1254)
VERIFIED_PAIRS = pa.schema(
    [
        ("doc_a", pa.uint64()),
        ("doc_b", pa.uint64()),
        ("jaccard", pa.float64()),
        ("simhash_hamming", pa.int32()),
        ("match_len", pa.int64()),  # longest verified common substring (winnow pairs)
        ("origin", pa.string()),
    ]
)

# cluster assignment — analog of union-find roots
# (/root/reference/modules/deduplication.py:348-352)
CLUSTERS = pa.schema(
    [
        ("doc_id", pa.uint64()),
        ("cluster_id", pa.uint64()),
    ]
)

# final report — analog of image_report.csv
# (/root/reference/modules/deduplication.py:1611-1672)
REPORT = pa.schema(
    [
        ("url", pa.string()),
        ("doc_id", pa.uint64()),
        ("cluster_id", pa.uint64()),
        ("cluster_size", pa.int64()),
        ("quality", pa.float64()),
        ("status", pa.string()),  # Best | Duplicate | Unique
    ]
)


def assert_schema(table: pa.Table, expected: pa.Schema, stage: str) -> None:
    """Cheap structural check at a stage boundary (names + types, order-insensitive)."""
    got = {f.name: f.type for f in table.schema}
    want = {f.name: f.type for f in expected}
    missing = [n for n in want if n not in got]
    wrong = [n for n in want if n in got and got[n] != want[n]]
    if missing or wrong:
        raise TypeError(
            f"stage {stage}: schema mismatch — missing {missing}, "
            f"wrong types {[(n, str(got[n]), str(want[n])) for n in wrong]}"
        )

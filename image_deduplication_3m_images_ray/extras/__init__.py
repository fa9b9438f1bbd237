"""Training-data-pipeline operators beyond the reference's own surface.

These are first-class components for a 100 TB webtext pipeline (task brief):
dedup variants (exact, SimHash, n-gram Jaccard, embedding-cosine), similarity
search (brute-force + LSH-bucketed ANN), text analysis (lang-id, quality,
token stats, fingerprints) and multimodal binary-column plumbing.
"""

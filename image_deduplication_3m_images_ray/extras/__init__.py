"""Training-data-pipeline operators beyond the reference's own surface.

These are first-class components for a 100 TB webtext pipeline (task brief):

- dedup variants: exact, SimHash pigeonhole, n-gram Jaccard, embedding-cosine
  pairs, SemDeDup-style semantic dedup, streaming incremental dedup
  (``streaming`` — sharded mutable index actors);
- similarity search: brute-force, hyperplane-LSH and IVF ANN (``similarity``);
- text analysis: lang-id, quality, token/BPE-token stats, repetition,
  decontamination, fused ``clean_corpus``, TF-IDF top terms, inverted index,
  fingerprints (``textstats``);
- relational: grouped top-k, range join, deterministic sampling (uniform,
  Bernoulli-weighted, exact-size weighted w/o replacement, stratified),
  exact per-group quantiles (``relational``); as-of join + window
  aggregates + sessionization (``windows``);
- clustering: full-data distributed Lloyd's k-means (``clustering``);
  tokenizer training: distributed BPE merges + corpus encode (``bpe``);
- sketches: mergeable HyperLogLog approximate distinct (``sketches``);
- multimodal binary-column plumbing (``multimodal``).
"""

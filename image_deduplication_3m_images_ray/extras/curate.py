"""End-to-end corpus curation: the published web-text recipe as ONE call.

``curate_corpus`` chains the three standard curation stages a
training-data pipeline runs over every crawl snapshot, in the canonical
order (cheap row-local filters first, exchanges over the shrunken
remainder):

1. **Gopher rule filter** (Rae et al. 2021) — stateless vectorized scan
   (:func:`textstats.gopher_filter`), no exchange; typically removes the
   bulk of the junk before anything shuffles.
2. **Exact dedup, keep-first** — one hash-partitioned exchange over the
   SURVIVORS (:func:`dedup_ops.exact_dedup_keep_first_rows`); byte-exact,
   collision-proof.
3. **CCNet perplexity bucketing** (Wenzek et al. 2020) — the bigram LM
   self-trains on the deduplicated survivors (the CCNet setup: the model
   sees clean data) and per-language NTILE(3) terciles are assigned
   (:func:`lm.perplexity_buckets`); only ``keep_buckets`` (default
   head+middle, CCNet's training cut) survive.

Each stage is an existing, individually oracle-checked operator; this
module only composes them, so the composite inherits their scale shapes
(one exchange for dedup, one gram exchange + one sort for the LM stage).
Reference analog: the reference's single main() chaining filter ->
hash -> dedup -> report (/root/reference/pipeline.py) — here as a
Dataset -> Dataset function a user can drop mid-pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: Dataset,
    keep_buckets: tuple = ("head", "middle"),
    min_count: int = 2,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    gopher_kwargs: dict | None = None,
    batch_size: int = 4096,
) -> Dataset:
    """Gopher filter -> exact dedup keep-first -> CCNet bucket cut.

    ``docs`` needs (id_col, text, lang_col).  ``gopher_kwargs`` forwards to
    :func:`textstats.gopher_filter` (thresholds/stopwords).  Output: one row
    per surviving doc — (id_col, lang_col, bits_per_bigram, rank, tile,
    bucket), the curated-corpus manifest a training job joins back to the
    text by id.
    """
    from .dedup_ops import exact_dedup_keep_first_rows
    from .lm import perplexity_buckets
    from .textstats import gopher_filter

    if not keep_buckets or not set(keep_buckets) <= {"head", "middle", "tail"}:
        raise ValueError(
            "curate_corpus: keep_buckets must be a non-empty subset of "
            "{'head', 'middle', 'tail'}"
        )
    filtered = gopher_filter(docs, batch_size=batch_size, **(gopher_kwargs or {}))
    survivors = exact_dedup_keep_first_rows(filtered)
    buckets = perplexity_buckets(
        survivors, min_count=min_count, lang_col=lang_col, id_col=id_col
    )
    keep_set = pa.array(sorted(set(keep_buckets)), pa.string())

    def cut(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["bucket"], value_set=keep_set))

    return buckets.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)

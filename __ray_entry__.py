"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-dup pipeline on sf0.001; ``queries()``
exposes one callable per implemented operator (SURVEY.md §2 + the extras the
task brief mandates); ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every SQL-expressible query, with column names matched exactly.

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

SF_SMOKE = "/root/testdata/sf0.001"


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def _embeddings(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


def entry() -> Any:
    """Flagship: full near-dup detection + clustering report on sf0.001 docs."""
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline
    from image_deduplication_3m_images_ray.sources import documents_as_pages

    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    pages = documents_as_pages(SF_SMOKE)
    return dedup_pipeline(pages, cfg)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_exact_dedup(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.dedup_ops import exact_dedup_clusters

    return exact_dedup_clusters(_docs(sf_dir)).sort("doc_id")


def _q_exact_dedup_survivors(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.dedup_ops import exact_dedup_keep_first

    return exact_dedup_keep_first(_docs(sf_dir)).sort("doc_id")


def _q_token_stats(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import token_stats

    return token_stats(_docs(sf_dir).select_columns(["doc_id", "text"])).sort("doc_id")


def _q_bpe_token_stats(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import bpe_token_stats

    return bpe_token_stats(_docs(sf_dir).select_columns(["doc_id", "text"])).sort("doc_id")


def _q_repetition_stats(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import repetition_stats

    return repetition_stats(_docs(sf_dir).select_columns(["doc_id", "text"])).sort("doc_id")


def _q_contamination(sf_dir: str):
    """Benchmark decontamination: bench set = the src0 docs; every doc
    reports its distinct shared word-8-grams with that set."""
    import pyarrow.compute as pc

    from image_deduplication_3m_images_ray.extras.textstats import contamination_stats

    docs = _docs(sf_dir).select_columns(["doc_id", "text", "source"])
    bench = docs.filter(expr="source == 'src0'")
    return contamination_stats(docs, bench, n=8).sort("doc_id")


def _q_clean_corpus(sf_dir: str):
    """Fused hygiene filter: lang=en + quality floor + repetition budget +
    decontamination vs the src0 bench set, in one map_batches pass."""
    from image_deduplication_3m_images_ray.extras.textstats import clean_corpus

    docs = _docs(sf_dir).select_columns(["doc_id", "text", "lang", "source"])
    bench = docs.filter(expr="source == 'src0'")
    return clean_corpus(
        docs, bench, lang="en", min_quality=10.0, max_rep_ratio=0.05
    ).sort("doc_id")


def _q_tfidf_top_terms(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir).select_columns(["doc_id", "text"]), k=3).sort(
        ["doc_id", "rank"]
    )


def _q_vocab_stats(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import vocab_stats

    return vocab_stats(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_frequent_terms(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import frequent_terms

    return frequent_terms(_docs(sf_dir).select_columns(["doc_id", "text"]), k=25)


def _q_inverted_index(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import inverted_index

    return inverted_index(_docs(sf_dir).select_columns(["doc_id", "text"])).sort("term")


def _q_quality_scores(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import quality_scores

    return quality_scores(_docs(sf_dir).select_columns(["doc_id", "text"])).sort("doc_id")


def _q_char_jaccard_pairs(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.dedup_ops import char_jaccard_pairs

    return char_jaccard_pairs(
        _docs(sf_dir).select_columns(["doc_id", "text", "lang"]), threshold=0.5
    ).sort(["doc_a", "doc_b"])


def _q_join_label_counts(sf_dir: str):
    """documents ⋈ embeddings on doc_id = vec_id, counted per (lang, label) —
    pins the hash-partitioned sort-based equi-join (util.shard_attach, SURVEY
    J1) directly against a SQL oracle."""
    from ray.data.aggregate import Count

    from image_deduplication_3m_images_ray.util import rename_columns, shard_attach

    docs = _docs(sf_dir).select_columns(["doc_id", "lang"])
    emb = rename_columns(
        _embeddings(sf_dir).select_columns(["vec_id", "label"]), {"vec_id": "doc_id"}
    )
    att = shard_attach(docs, emb, key="doc_id", payload={"label": "label"}, how="inner")
    return (
        att.groupby(["lang", "label"])
        .aggregate(Count(alias_name="n"))
        .sort(["lang", "label"])
    )


def _q_lang_counts(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count, Sum

    return (
        _docs(sf_dir)
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"))
        .sort("lang")
    )


def _q_top_docs(sf_dir: str):
    return (
        _docs(sf_dir)
        .select_columns(["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(10)
    )


def _q_distinct_sources(sf_dir: str):
    import pyarrow as pa

    vals = sorted(_docs(sf_dir).unique("source"))
    return pa.table({"source": pa.array(vals, pa.string())})


def _q_filter_en_long(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    return (
        _docs(sf_dir)
        .map_batches(
            lambda t: t.filter(
                pc.and_(pc.equal(t["lang"], "en"), pc.greater(t["n_chars"], 300))
            ).select(["doc_id", "lang", "n_chars"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort("doc_id")
    )


def _q_embedding_cosine_pairs(sf_dir: str):
    import pyarrow as pa

    from image_deduplication_3m_images_ray.extras.dedup_ops import embedding_cosine_pairs

    ds = embedding_cosine_pairs(
        _embeddings(sf_dir).select_columns(["vec_id", "embedding"]), threshold=0.3
    )

    def rnd(t: pa.Table) -> pa.Table:
        cos = np.round(np.asarray(t["cosine"].to_numpy(zero_copy_only=False)), 6)
        return t.set_column(t.column_names.index("cosine"), "cosine", pa.array(cos, pa.float64()))

    return ds.map_batches(rnd, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["vec_a", "vec_b"]
    )


def _q_semantic_dedup(sf_dir: str):
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.dedup_ops import semantic_dedup

    return semantic_dedup(
        _embeddings(sf_dir).select_columns(["vec_id", "embedding"]),
        threshold=0.3,
        cfg=DedupConfig(join_num_buckets=4),
    ).sort("vec_id")


def _q_ann_topk(sf_dir: str):
    import pandas as pd
    import ray as _ray
    import pyarrow as pa

    from image_deduplication_3m_images_ray.extras.dedup_ops import embeddings_to_matrix
    from image_deduplication_3m_images_ray.extras.similarity import ann_brute_force_topk

    emb = _embeddings(sf_dir).select_columns(["vec_id", "embedding"])
    head = pa.concat_tables(
        _ray.get(emb.sort("vec_id").limit(5).to_arrow_refs())
    ).combine_chunks()
    qids, qm = embeddings_to_matrix(head)
    out = ann_brute_force_topk(emb, qm, qids, k=10).to_pandas()
    out["cosine"] = np.round(out["cosine"], 6)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_ann_ivf_topk(sf_dir: str):
    """IVF with nprobe == n_lists scans every inverted list — exactly brute
    force, so the exact top-k SQL oracle applies; the pruned-nprobe path is
    pinned against brute force in tests/test_extras.py."""
    import ray as _ray
    import pyarrow as pa

    from image_deduplication_3m_images_ray.extras.dedup_ops import embeddings_to_matrix
    from image_deduplication_3m_images_ray.extras.similarity import ann_ivf_topk

    emb = _embeddings(sf_dir).select_columns(["vec_id", "embedding"])
    head = pa.concat_tables(
        _ray.get(emb.sort("vec_id").limit(5).to_arrow_refs())
    ).combine_chunks()
    qids, qm = embeddings_to_matrix(head)
    out = ann_ivf_topk(emb, qm, qids, k=10, n_lists=8, nprobe=8).to_pandas()
    out["cosine"] = np.round(out["cosine"], 6)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_lexical_diversity(sf_dir: str):
    """Per-doc type-token ratio + Shannon token entropy (quality signal)."""
    from image_deduplication_3m_images_ray.extras.textstats import lexical_diversity

    return lexical_diversity(
        _docs(sf_dir).select_columns(["doc_id", "text"])
    ).sort("doc_id")


def _q_badwords_filter(sf_dir: str):
    """C4-style blocklist screening (exact token match on normalized text)."""
    from image_deduplication_3m_images_ray.extras.textstats import badwords_filter

    return badwords_filter(
        _docs(sf_dir).select_columns(["doc_id", "text"]), badwords=["spark", "vector"]
    ).sort("doc_id")


def _q_intradoc_dedup(sf_dir: str):
    """Within-doc repeated-segment removal (2-token windows, first wins)."""
    from image_deduplication_3m_images_ray.extras.dedup_ops import intradoc_dedup

    return intradoc_dedup(
        _docs(sf_dir).select_columns(["doc_id", "text"]), seg_tokens=2
    ).sort("doc_id")


def _q_exact_substring_dedup(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.exactsubstr import exact_substring_dedup

    return exact_substring_dedup(
        _docs(sf_dir).select_columns(["doc_id", "text"]), k=8
    ).sort("doc_id")


def _q_segment_dedup(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.dedup_ops import segment_dedup

    return segment_dedup(
        _docs(sf_dir).select_columns(["doc_id", "text"]), seg_tokens=10
    ).sort("doc_id")


def _q_boilerplate_removal(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.dedup_ops import (
        remove_frequent_segments,
    )

    return remove_frequent_segments(
        _docs(sf_dir).select_columns(["doc_id", "text"]), max_docs=2, seg_tokens=10
    ).sort("doc_id")


def _q_minhash_lsh_clusters(sf_dir: str):
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.dedup_ops import minhash_lsh_clusters

    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    return minhash_lsh_clusters(_docs(sf_dir), cfg).sort("doc_id")


def _q_simhash_pairs(sf_dir: str):
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.dedup_ops import simhash_dedup_pairs

    cfg = DedupConfig(signature_concurrency=2)
    return simhash_dedup_pairs(_docs(sf_dir), cfg, max_hamming=3).sort(["doc_a", "doc_b"])


def _q_lang_id(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import lang_id

    return lang_id(_docs(sf_dir).select_columns(["doc_id", "text"])).sort("doc_id")


def _q_doc_fingerprints(sf_dir: str):
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.textstats import doc_fingerprints

    return doc_fingerprints(_docs(sf_dir).select_columns(["doc_id", "text"]), DedupConfig()).sort(
        "doc_id"
    )


def _q_suffix_pairs(sf_dir: str):
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.extras.suffix import suffix_array_pairs_stage

    # oracle mode: one partition + one batch makes the partition-local
    # operator's semantics global, i.e. exactly the SQL L-gram self-join
    return suffix_array_pairs_stage(
        _docs(sf_dir).select_columns(["doc_id", "text"]).repartition(1),
        DedupConfig(),
        batch_size=1 << 20,
    ).sort(["doc_a", "doc_b"])


def _q_dedup_report(sf_dir: str):
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline
    from image_deduplication_3m_images_ray.sources import documents_as_pages

    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    return dedup_pipeline(documents_as_pages(sf_dir), cfg).sort("url")


def _q_dedup_summary(sf_dir: str):
    """Corpus-level outcome of the flagship run: doc counts + mean quality per
    status (the reference's console summary, deduplication.py:1184-1204)."""
    import ray.data
    from ray.data.aggregate import Count, Mean

    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline
    from image_deduplication_3m_images_ray.sources import documents_as_pages

    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    report = dedup_pipeline(documents_as_pages(sf_dir), cfg)
    out = (
        report.groupby("status")
        .aggregate(Count(alias_name="n_docs"), Mean("quality", alias_name="mean_quality"))
        .sort("status")
    )
    import pyarrow as pa
    import pyarrow.compute as pc

    def rnd(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.column_names.index("mean_quality"),
            "mean_quality",
            pc.round(t["mean_quality"], ndigits=6),
        )

    return out.map_batches(rnd, batch_format="pyarrow", zero_copy_batch=True)


def _q_cluster_stats(sf_dir: str):
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.pipelines import cluster_stats_pipeline
    from image_deduplication_3m_images_ray.sources import documents_as_pages

    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    return cluster_stats_pipeline(documents_as_pages(sf_dir), cfg).sort("cluster_id")


def _q_window_agg(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.windows import tumbling_window_agg

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return tumbling_window_agg(events, window_sec=3600).sort(["event_type", "window_start"])


def _q_sliding_window_agg(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.windows import sliding_window_agg

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return sliding_window_agg(events, window_sec=3600, hop_sec=900).sort(
        ["event_type", "window_start"]
    )


def _q_rolling_agg(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.windows import rolling_agg

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    return rolling_agg(events, key="user_id", window_rows=4).sort("event_id")


def _q_sessions(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.windows import sessionize

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return sessionize(events, gap_sec=1800).sort(["user_id", "session_id"])


def _q_asof_join(sf_dir: str):
    """Each purchase event joined to the user's latest at-or-before click."""
    import ray.data

    from image_deduplication_3m_images_ray.extras.windows import asof_join_latest

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    left = events.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "ts", "user_id"]
    )
    right = events.filter(expr="event_type == 'click'")
    return asof_join_latest(left, right, payload={"value": "ref_value"}).sort("event_id")


def _q_group_topk(sf_dir: str):
    """Top-3 longest docs per language (rank by n_chars desc, doc_id asc)."""
    from image_deduplication_3m_images_ray.extras.relational import group_topk

    return group_topk(
        _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"]),
        key="lang",
        value="n_chars",
        k=3,
        tiebreak="doc_id",
    ).sort(["lang", "rank"])


def _q_group_rank(sf_dir: str):
    """Every doc's global length rank + quartile within its language."""
    from image_deduplication_3m_images_ray.extras.relational import group_rank

    return group_rank(
        _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"]),
        key="lang",
        value="n_chars",
        id_col="doc_id",
        descending=True,
        ntile=4,
    )


def _q_pack_sequences(sf_dir: str):
    """Concat-and-cut packing: global token offset + 2048-token bin per doc."""
    from image_deduplication_3m_images_ray.extras.transforms import pack_sequences

    return pack_sequences(
        _docs(sf_dir).select_columns(["doc_id", "text"]), capacity=2048
    )


def _q_frequent_terms_by_lang(sf_dir: str):
    """Exact top-5 terms per language (per-group Misra-Gries two-pass)."""
    from image_deduplication_3m_images_ray.extras.textstats import (
        frequent_terms_by_group,
    )

    return frequent_terms_by_group(
        _docs(sf_dir).select_columns(["doc_id", "text", "lang"]),
        group_col="lang",
        k=5,
    ).sort(["group", "rank"])


def _q_normalize_text(sf_dir: str):
    """The engine's canonical normalization (NFC + lower + ws-collapse +
    trim) exposed as a user-facing transform."""
    import pyarrow as pa

    from image_deduplication_3m_images_ray.functions.text import normalize_array

    def fn(t):
        return pa.table({"doc_id": t["doc_id"], "norm_text": normalize_array(t["text"])})

    return _docs(sf_dir).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def _q_term_cooccurrence(sf_dir: str):
    """Doc-level co-occurrence counts over the exact top-40 corpus terms."""
    from image_deduplication_3m_images_ray.extras.textstats import term_cooccurrence

    return term_cooccurrence(
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        vocab_size=40,
        min_count=3,
    ).sort(["term_a", "term_b"])


def _q_fuzzy_join(sf_dir: str):
    """Even-id docs fuzzily matched against odd-id docs (Jaccard >= 0.4)."""
    import pyarrow.compute as pc

    from image_deduplication_3m_images_ray.extras.setsim import fuzzy_join

    def side(par):
        return _docs(sf_dir).map_batches(
            lambda t, p=par: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1), p)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    return fuzzy_join(side(0), side(1), threshold=0.4).sort(["doc_a", "doc_b"])


def _q_fuzzy_subtract(sf_dir: str):
    """Near-dup decontamination: even-id docs kept only when NO odd-id doc
    is Jaccard-similar at >= 0.4 (the fuzzy counterpart of subtract_corpus)."""
    import pyarrow.compute as pc

    from image_deduplication_3m_images_ray.extras.setsim import fuzzy_subtract

    def side(par):
        return _docs(sf_dir).map_batches(
            lambda t, p=par: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1), p)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    return fuzzy_subtract(side(0), side(1), threshold=0.4).sort("doc_id")


def _q_winsorize(sf_dir: str):
    """Doc lengths clipped to their language's [p1, p99] discrete quantiles."""
    from image_deduplication_3m_images_ray.extras.relational import winsorize_by_group

    return winsorize_by_group(
        _docs(sf_dir).select_columns(["doc_id", "lang", "n_chars"]),
        key="lang",
        value="n_chars",
        p_lo=0.01,
        p_hi=0.99,
    ).sort("doc_id")


def _q_ngram_counts(sf_dir: str):
    """Corpus bigram counts pruned to count >= 3 (LM gram table)."""
    from image_deduplication_3m_images_ray.extras.textstats import ngram_counts

    return ngram_counts(
        _docs(sf_dir).select_columns(["doc_id", "text"]), n=2, min_count=3
    ).sort("gram")


def _q_sample_token_budget(sf_dir: str):
    """Deterministic hash-ordered subsample filling a 10k-token budget."""
    from image_deduplication_3m_images_ray.extras.transforms import (
        sample_token_budget,
    )

    return sample_token_budget(
        _docs(sf_dir).select_columns(["doc_id", "text"]), budget=10_000
    ).sort("doc_id")


def _q_subtract_corpus(sf_dir: str):
    """Drop every non-src0 doc whose text already exists in src0 (the
    dedup-the-new-crawl-against-the-trained-corpus primitive)."""
    import pyarrow.compute as pc

    from image_deduplication_3m_images_ray.extras.dedup_ops import subtract_corpus

    def split(pred):
        return _docs(sf_dir).map_batches(
            lambda t: t.filter(pred(t)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    new = split(lambda t: pc.not_equal(t["source"], "src0"))
    base = split(lambda t: pc.equal(t["source"], "src0"))
    return subtract_corpus(new, base, bloom_min_base=0).sort("doc_id")


def _q_chunk_docs(sf_dir: str):
    """Every doc split into 500-char context windows every 400 chars."""
    from image_deduplication_3m_images_ray.extras.transforms import chunk_docs

    return chunk_docs(
        _docs(sf_dir).select_columns(["doc_id", "text"]), width=500, stride=400
    )


def _q_redact_pii(sf_dir: str):
    """Email / IPv4 / phone-shaped spans scrubbed and counted per doc."""
    from image_deduplication_3m_images_ray.extras.transforms import redact_pii

    return redact_pii(_docs(sf_dir).select_columns(["doc_id", "text"]))


def _q_range_join(sf_dir: str):
    """Every click within one hour AFTER a purchase by the same user."""
    import ray.data

    from image_deduplication_3m_images_ray.extras.relational import range_join_window

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    left = events.filter(expr="event_type == 'click'")
    right = events.filter(expr="event_type == 'purchase'")
    return range_join_window(left, right, width_sec=3600).sort(
        ["event_id", "ref_event_id"]
    )


def _q_pivot_counts(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.relational import pivot_counts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return pivot_counts(events, row_key="user_id", col_key="event_type").sort("user_id")


def _q_group_quantiles(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from image_deduplication_3m_images_ray.extras.relational import group_quantiles

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                # pinned half-up tie convention, identical to the SQL oracle's
                # floor(value * 100 + 0.5) (see extras/windows.py docstring)
                "value_cents": pa.array(
                    np.floor(
                        np.asarray(
                            pc.cast(t["value"], pa.float64()).to_numpy(zero_copy_only=False)
                        )
                        * 100.0
                        + 0.5
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    prepped = events.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return group_quantiles(
        prepped, key="event_type", value="value_cents", qs=(0.25, 0.5, 0.9, 0.99)
    ).sort("event_type")


def _q_sample_uniform(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.relational import sample_uniform

    return sample_uniform(
        _docs(sf_dir).select_columns(["doc_id", "lang"]), mod=10, keep=3
    ).sort("doc_id")


def _q_sample_per_group(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.relational import sample_per_group

    return sample_per_group(
        _docs(sf_dir).select_columns(["doc_id", "lang"]), key="lang", k=5
    ).sort(["lang", "rank"])


def _q_media_frames(sf_dir: str):
    """Frame-sample plan rows over the video slice of the media adaptation."""
    from image_deduplication_3m_images_ray.extras.multimodal import (
        frame_sample_stage,
        media_from_documents,
    )

    media = media_from_documents(_docs(sf_dir).select_columns(["doc_id", "text"]))
    return frame_sample_stage(media, every_ms=50).sort(["media_id", "frame_ts_ms"])


def _q_media_resize(sf_dir: str):
    """Integer resize plan (fit 256, aspect preserved) over the fake decode."""
    from image_deduplication_3m_images_ray.extras.multimodal import (
        decode_stage,
        media_from_documents,
        resize_plan_stage,
    )

    media = media_from_documents(_docs(sf_dir).select_columns(["doc_id", "text"]))
    out = resize_plan_stage(decode_stage(media, fake=True, concurrency=2), max_side=256)
    return out.select_columns(
        ["media_id", "width", "height", "out_width", "out_height"]
    ).sort("media_id")


def _q_media_decode(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.multimodal import (
        decode_stage,
        media_from_documents,
    )

    media = media_from_documents(_docs(sf_dir).select_columns(["doc_id", "text"]))
    out = decode_stage(media, fake=True, concurrency=2)
    # scalar projection for the value-hash compare; the list<float64> feature
    # column is pinned by tests/test_extras.py (deterministic nibble fake)
    return out.select_columns(
        ["media_id", "kind", "payload_bytes", "width", "height", "checksum"]
    ).sort("media_id")


def _q_containment_pairs(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.setsim import containment_pairs

    return containment_pairs(
        _docs(sf_dir).select_columns(["doc_id", "text"]), threshold=0.5, num_shards=16
    ).sort(["doc_a", "doc_b"])


def _q_source_overlap(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.setsim import source_overlap

    return source_overlap(
        _docs(sf_dir).select_columns(["source", "text"]), num_shards=16
    ).sort(["source_a", "source_b"])


def _q_latest_by_key(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.relational import latest_by_key

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet")
    return latest_by_key(
        events, keys=["user_id", "event_type"], order_col="ts", tiebreak="event_id"
    ).sort("event_id")


def _q_lm_perplexity(sf_dir: str):
    """Every doc scored by the add-one bigram LM trained on the corpus
    itself (CCNet-style perplexity bucketing; min_count=2 head pruning)."""
    from image_deduplication_3m_images_ray.extras.lm import lm_score

    return lm_score(
        _docs(sf_dir).select_columns(["doc_id", "text"]), min_count=2
    ).sort("doc_id")


def _q_perplexity_buckets(sf_dir: str):
    """CCNet head/middle/tail: per-language perplexity terciles of the
    self-trained bigram LM score (NTILE(3) over bits, doc_id tiebreak)."""
    from image_deduplication_3m_images_ray.extras.lm import perplexity_buckets

    return perplexity_buckets(
        _docs(sf_dir).select_columns(["doc_id", "text", "lang"]), min_count=2
    ).sort("doc_id")


def _q_collocations(sf_dir: str):
    """PMI collocations over the exact top-40 vocabulary (doc-level
    probabilities, min 3 co-occurring docs)."""
    from image_deduplication_3m_images_ray.extras.textstats import collocations

    out = collocations(
        _docs(sf_dir).select_columns(["doc_id", "text"]), vocab_size=40, min_count=3
    ).to_pandas()
    out["pmi"] = np.round(out["pmi"], 6)
    return out


def _q_importance_sample(sf_dir: str):
    """Deterministic Bernoulli(weight) keep with weight = min(n_chars,2000)/2000."""
    import pyarrow as pa

    from image_deduplication_3m_images_ray.extras.relational import importance_sample

    def add_w(t: pa.Table) -> pa.Table:
        nc = np.asarray(t["n_chars"].to_numpy(zero_copy_only=False), dtype=np.int64)
        w = np.minimum(nc, 2000) / 2000.0
        return t.append_column("weight", pa.array(w, pa.float64()))

    ds = (
        _docs(sf_dir)
        .select_columns(["doc_id", "n_chars"])
        .map_batches(add_w, batch_format="pyarrow", zero_copy_batch=True)
    )
    return importance_sample(ds, "weight").sort("doc_id")


def _q_epoch_shuffle(sf_dir: str):
    """Deterministic epoch-1 global shuffle order (salted-hash rank)."""
    from image_deduplication_3m_images_ray.extras.transforms import epoch_shuffle

    return epoch_shuffle(
        _docs(sf_dir).select_columns(["doc_id"]), epoch=1
    ).sort("doc_id")


def _q_centroid_distances(sf_dir: str):
    """Cosine of every embedding to its label-group centroid (SemDeDup
    cluster-hygiene signal)."""
    from image_deduplication_3m_images_ray.extras.similarity import centroid_distances

    out = centroid_distances(
        _embeddings(sf_dir).select_columns(["vec_id", "embedding", "label"])
    ).to_pandas()
    out["cos_centroid"] = np.round(out["cos_centroid"], 6)
    return out.sort_values("vec_id").reset_index(drop=True)


def _q_semdedup(sf_dir: str):
    """SemDeDup within-cluster duplicate flags (Abbas et al. 2023): drop a
    vector iff a better-ranked same-cluster member (farther from the
    centroid) lies within 0.3 cosine."""
    from image_deduplication_3m_images_ray.extras.similarity import semdedup_prune

    out = semdedup_prune(
        _embeddings(sf_dir).select_columns(["vec_id", "embedding", "label"]),
        threshold=0.3,
    ).to_pandas()
    out["cos_centroid"] = np.round(out["cos_centroid"], 6)
    return out.sort_values("vec_id").reset_index(drop=True)


def _q_graph_pagerank(sf_dir: str):
    """PageRank (d=0.85, 10 iterations) over the exact 5-NN digraph."""
    from image_deduplication_3m_images_ray.extras.graph import pagerank
    from image_deduplication_3m_images_ray.extras.similarity import knn_graph

    edges = knn_graph(_embeddings(sf_dir).select_columns(["vec_id", "embedding"]), k=5)
    out = pagerank(
        edges, src_col="query_id", dst_col="vec_id", node_col="vec_id", n_iters=10
    ).to_pandas()
    out["pr"] = np.round(out.pop("rank"), 6)
    return out.sort_values("vec_id").reset_index(drop=True)


def _q_graph_components(sf_dir: str):
    """Connected components over a deterministic bucket-link edge table
    (doc_id -> its 7-bucket head; ~n/7 planted components).  The generic
    CC operator; its dedup-graph use is pinned by the flagship tests."""
    import pyarrow as pa

    from image_deduplication_3m_images_ray.extras.graph import graph_components

    def to_edges(t: pa.Table) -> pa.Table:
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(did, pa.int64()),
                "dst": pa.array((did // 7) * 7, pa.int64()),
            }
        )

    edges = (
        _docs(sf_dir)
        .select_columns(["doc_id"])
        .map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    )
    return graph_components(edges).sort("node")


def _q_knn_graph(sf_dir: str):
    """Exact 5-NN graph over the embeddings table (self excluded)."""
    from image_deduplication_3m_images_ray.extras.similarity import knn_graph

    out = knn_graph(
        _embeddings(sf_dir).select_columns(["vec_id", "embedding"]), k=5
    ).to_pandas()
    out["cosine"] = np.round(out["cosine"], 6)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _q_hash_split(sf_dir: str):
    """Deterministic 90/5/5 train/val/test assignment by id-hash bucket."""
    from image_deduplication_3m_images_ray.extras.relational import hash_split

    return hash_split(
        _docs(sf_dir).select_columns(["doc_id"]),
        fractions={"train": 0.9, "val": 0.05, "test": 0.05},
    ).sort("doc_id")


def _q_resample_mixture(sf_dir: str):
    """Rebalance three sources to a 50/30/20 mixture of a 40-doc budget,
    keeping each source's floor(w*total) smallest-hash docs."""
    from image_deduplication_3m_images_ray.extras.relational import resample_to_mixture

    return resample_to_mixture(
        _docs(sf_dir).select_columns(["doc_id", "source"]),
        key="source",
        weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        total=40,
    ).sort("doc_id")


def _q_gopher_quality(sf_dir: str):
    """Gopher rule-set quality signals (Rae et al. 2021) per document, with
    the composite keep flag at the published default thresholds."""
    from image_deduplication_3m_images_ray.extras.textstats import gopher_quality

    # min_stopwords=1: the synthetic corpus tops out at one distinct Gopher
    # stopword per doc, so the published default (2) would zero the keep flag.
    return gopher_quality(
        _docs(sf_dir).select_columns(["doc_id", "text"]), min_stopwords=1
    ).sort("doc_id")


def _assert_ascii_texts(docs, query: str):
    """The media_* oracles enumerate CODEPOINTS (ascii(substring(text,i,1)))
    and divide by octet_length, while payload_feature_stage histograms UTF-8
    BYTES — exact only while every fixture text is pure ASCII (codepoints ==
    bytes).  Enforce that invariant here so a non-ASCII testdata change fails
    loudly instead of silently diverging the oracle (ADVICE r4)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def chk(t: pa.Table) -> pa.Table:
        nonascii = pc.sum(
            pc.cast(
                pc.not_equal(
                    pc.utf8_length(t["text"]),
                    pc.binary_length(pc.cast(t["text"], pa.binary())),
                ),
                pa.int64(),
            )
        ).as_py() or 0
        return pa.table({"n": pa.array([nonascii], pa.int64())})

    bad = sum(
        b["n"].to_pylist()[0]
        for b in docs.map_batches(
            chk, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if bad:
        raise AssertionError(
            f"{query}: {bad} non-ASCII fixture texts — the DuckDB oracle "
            "counts codepoints, the implementation counts UTF-8 bytes; "
            "rewrite the oracle over BLOB bytes before using such fixtures"
        )


def _q_media_features(sf_dir: str):
    """Binary-payload feature extraction (the reference's cheap color-stats
    analog, K6): per-payload size + Shannon byte entropy from a vectorized
    256-bin byte histogram — the one multimodal kernel that needs no decode
    library, so it ships real, not stubbed."""
    from image_deduplication_3m_images_ray.extras.multimodal import (
        media_from_documents,
        payload_feature_stage,
    )

    _assert_ascii_texts(_docs(sf_dir).select_columns(["text"]), "media_features")
    media = media_from_documents(_docs(sf_dir).select_columns(["doc_id", "text"]))
    out = (
        payload_feature_stage(media)
        .drop_columns(["hist"])
        .to_pandas()
    )
    out["byte_entropy"] = np.round(out["byte_entropy"], 6)
    return out.sort_values("media_id").reset_index(drop=True)


def _q_media_cosine_pairs(sf_dir: str):
    """Multimodal near-dup end-to-end: byte-histogram features -> cosine
    pairs >= 0.995 (the reference's color-gate K6 flow over opaque
    payloads: cheap per-item features, then pairwise cosine)."""
    import pyarrow as pa

    from image_deduplication_3m_images_ray.extras.dedup_ops import (
        embedding_cosine_pairs,
    )
    from image_deduplication_3m_images_ray.extras.multimodal import (
        media_from_documents,
        payload_feature_stage,
    )

    _assert_ascii_texts(_docs(sf_dir).select_columns(["text"]), "media_cosine_pairs")
    media = media_from_documents(_docs(sf_dir).select_columns(["doc_id", "text"]))
    emb = payload_feature_stage(media).map_batches(
        lambda t: t.select(["media_id", "hist"]).rename_columns(
            ["vec_id", "embedding"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ds = embedding_cosine_pairs(emb, threshold=0.995)

    def rnd(t: pa.Table) -> pa.Table:
        cos = np.round(np.asarray(t["cosine"].to_numpy(zero_copy_only=False)), 6)
        return t.set_column(
            t.column_names.index("cosine"), "cosine", pa.array(cos, pa.float64())
        )

    return ds.map_batches(rnd, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["vec_a", "vec_b"]
    )


def _q_bpe_merges(sf_dir: str):
    """First 8 BPE merges learned from the documents corpus (Sennrich 2016).
    Iterative (each merge depends on counts under all previous merges) so
    there is no SQL oracle — the driver records the rows-only check;
    tests/test_bpe.py pins parity with the classic reference algorithm."""
    from image_deduplication_3m_images_ray.extras.bpe import bpe_train

    return bpe_train(
        _docs(sf_dir).select_columns(["text"]), n_merges=8
    )


def _q_bpe_encode(sf_dir: str):
    """Tokenize the corpus under the first 8 learned BPE merges: per-doc
    word/token counts + chars-per-token compression. Composes bpe_train ->
    bpe_encode; iterative upstream => rows-only driver check (pytest pins
    the encode kernel and count assembly)."""
    from image_deduplication_3m_images_ray.extras.bpe import bpe_encode, bpe_train

    docs = _docs(sf_dir).select_columns(["doc_id", "text"])
    m = bpe_train(docs, n_merges=8)
    merges = list(zip(m["left"].to_pylist(), m["right"].to_pylist()))
    out = bpe_encode(docs, merges).to_pandas()
    out["compression"] = np.round(out["compression"], 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_weighted_sample(sf_dir: str):
    """Exact-size weighted sampling without replacement (Efraimidis-Spirakis
    exponential keys over hash uniforms): 50 docs weighted by length."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from image_deduplication_3m_images_ray.extras.relational import weighted_sample

    def add_w(t: pa.Table) -> pa.Table:
        w = pc.divide(
            pc.cast(pc.min_element_wise(t["n_chars"], 2000), pa.float64()), 2000.0
        )
        return t.append_column("weight", w)

    ds = _docs(sf_dir).select_columns(["doc_id", "n_chars"]).map_batches(
        add_w, batch_format="pyarrow", zero_copy_batch=True
    )
    out = weighted_sample(ds, n=50, weight_col="weight", id_col="doc_id").to_pandas()
    out["skey"] = np.round(out["skey"], 6)
    out["weight"] = np.round(out["weight"], 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_weighted_sample_per_group(sf_dir: str):
    """Stratified weighted draw: 3 docs per source, weighted by length
    (Efraimidis-Spirakis keys within each group)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from image_deduplication_3m_images_ray.extras.relational import (
        weighted_sample_per_group,
    )

    def add_w(t: pa.Table) -> pa.Table:
        w = pc.divide(
            pc.cast(pc.min_element_wise(t["n_chars"], 2000), pa.float64()), 2000.0
        )
        return t.append_column("weight", w)

    ds = _docs(sf_dir).select_columns(["doc_id", "source", "n_chars"]).map_batches(
        add_w, batch_format="pyarrow", zero_copy_batch=True
    )
    out = weighted_sample_per_group(
        ds, key="source", k=3, weight_col="weight", id_col="doc_id"
    ).to_pandas()
    out["skey"] = np.round(out["skey"], 6)
    out["weight"] = np.round(out["weight"], 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_kmeans(sf_dir: str):
    """Full-data distributed Lloyd's k-means (k=8, 3 iterations, init = the
    8 smallest vec_ids): per-vector cluster label + Euclidean distance."""
    from image_deduplication_3m_images_ray.extras.clustering import kmeans

    out = kmeans(
        _embeddings(sf_dir).select_columns(["vec_id", "embedding"]), k=8, n_iter=3
    ).to_pandas()
    out["dist"] = np.round(out["dist"], 6)
    return out.sort_values("vec_id").reset_index(drop=True)


def _q_semdedup_kmeans(sf_dir: str):
    """The full SemDeDup pipeline (Abbas et al. 2023) end-to-end: k-means
    clusters the embeddings (k=8, 3 Lloyd iterations), then within-cluster
    pruning flags semantic duplicates — no pre-assigned labels needed."""
    from image_deduplication_3m_images_ray.extras.clustering import (
        kmeans_assign,
        kmeans_fit,
    )
    from image_deduplication_3m_images_ray.extras.similarity import semdedup_prune

    emb = _embeddings(sf_dir).select_columns(["vec_id", "embedding"]).materialize()
    cent = kmeans_fit(emb, k=8, n_iter=3)
    labeled = kmeans_assign(emb, cent).drop_columns(["dist"])
    out = semdedup_prune(labeled, threshold=0.3, label_col="label_km").to_pandas()
    out["cos_centroid"] = np.round(out["cos_centroid"], 6)
    return out.sort_values("vec_id").reset_index(drop=True)


def _q_dsir_weights(sf_dir: str):
    """DSIR log importance weights (Xie et al. 2023): every doc scored by a
    hashed-bigram target-vs-raw log likelihood ratio; target = the corpus's
    English slice."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from image_deduplication_3m_images_ray.extras.dsir import dsir_weights

    docs = _docs(sf_dir).select_columns(["doc_id", "text", "lang"])

    def en_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["lang"], "en")).select(["doc_id", "text"])

    target = docs.map_batches(en_only, batch_format="pyarrow", zero_copy_batch=True)
    out = dsir_weights(docs.select_columns(["doc_id", "text"]), target).to_pandas()
    out["log_weight"] = np.round(out["log_weight"], 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_nb_classify(sf_dir: str):
    """Multi-class hashed-bigram Naive Bayes (the CCNet-style quality/domain
    classifier): self-trained on the lang labels, every doc re-labeled with
    its argmax class + integer-microbit score and runner-up margin."""
    from image_deduplication_3m_images_ray.extras.dsir import nb_classify

    return nb_classify(
        _docs(sf_dir).select_columns(["doc_id", "text", "lang"])
    ).sort("doc_id")


def _url_docs(sf_dir: str, pages: int = 40):
    """documents + a deterministic synthetic ``url`` column (the testdata has
    no URL column; both engines synthesize the IDENTICAL string per row —
    mixed-case scheme/path, ``www.`` alias, query string, fragment, trailing
    slash — so the canonicalizer has real work to do).  ``pages`` sets the
    path-space size (doc_id % pages): 40 gives the heavy-collapse corpus the
    url_dedup queries pin; crawl_curate uses 350 for a milder collapse."""
    import pyarrow as pa

    docs = _docs(sf_dir).select_columns(["doc_id", "text", "source", "n_chars"])

    def synth(t: pa.Table) -> pa.Table:
        did = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        src = np.asarray(t["source"].to_pylist(), dtype=np.str_)
        scheme = np.select(
            [did % 3 == 0, did % 3 == 1], ["HTTP://", "https://www."], "https://"
        )
        tail = np.select(
            [did % 4 == 0, did % 4 == 1, did % 4 == 2],
            ["?utm_source=feed", "/", "#Frag"],
            "",
        )
        url = np.char.add(
            np.char.add(
                np.char.add(np.char.add(scheme, src), ".example/Page/"),
                (did % pages).astype(np.str_),
            ),
            tail,
        )
        return t.append_column("url", pa.array(url.tolist(), pa.string()))

    return docs.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)


def _q_url_canon(sf_dir: str):
    """Canonical URL keys + domains (RefinedWeb stage-1 key normalizer)."""
    from image_deduplication_3m_images_ray.extras.urltools import canonicalize_urls

    return canonicalize_urls(_url_docs(sf_dir)).sort("doc_id")


def _q_url_dedup(sf_dir: str):
    """Keep-min-id per canonical URL key (recrawl collapse), cluster shape."""
    from image_deduplication_3m_images_ray.extras.urltools import url_dedup

    return url_dedup(_url_docs(sf_dir)).sort("doc_id")


def _q_domain_stats(sf_dir: str):
    """Domain-mix diagnostic: docs / tokens / corpus share per domain."""
    from image_deduplication_3m_images_ray.extras.urltools import domain_stats

    return domain_stats(_url_docs(sf_dir))


def _q_domain_filter(sf_dir: str):
    """Host-level gating: drop blocklisted domains and domains whose mean
    n_chars is below 290 (integer-exact sum >= thr*count gate)."""
    from image_deduplication_3m_images_ray.extras.urltools import domain_filter

    return domain_filter(
        _url_docs(sf_dir),
        min_mean_value=290,
        value_col="n_chars",
        blocklist=["src1.example"],
    ).sort("doc_id")


def _q_crawl_curate(sf_dir: str):
    """Crawl-stage curation composition: URL dedup keep-first -> domain gate
    (mean n_chars >= 290 over survivors + blocklist) -> word-blocklist screen."""
    from image_deduplication_3m_images_ray.extras.urltools import crawl_curate

    return crawl_curate(
        _url_docs(sf_dir, pages=350),
        badwords=["dup"],
        min_mean_value=290,
        value_col="n_chars",
        blocklist=["src1.example"],
    ).sort("doc_id")


def _q_curate_corpus(sf_dir: str):
    """End-to-end curation: Gopher filter -> exact dedup keep-first ->
    CCNet perplexity-bucket cut (head+middle kept), as one composition."""
    from image_deduplication_3m_images_ray.extras.curate import curate_corpus

    # min_stopwords=1 for the same synthetic-corpus reason as _q_gopher_quality
    return curate_corpus(
        _docs(sf_dir).select_columns(["doc_id", "text", "lang"]),
        gopher_kwargs={"min_stopwords": 1},
    ).sort("doc_id")


def _q_histogram(sf_dir: str):
    """Per-language doc-length histogram (12 fixed-width bins over [0, 600))."""
    from image_deduplication_3m_images_ray.extras.relational import histogram

    return histogram(
        _docs(sf_dir).select_columns(["lang", "n_chars"]),
        value="n_chars",
        lo=0,
        hi=600,
        n_bins=12,
        by="lang",
    ).sort(["lang", "bin"])


def _q_bm25_topk(sf_dir: str):
    """Top-10 docs by Okapi BM25 for a mixed rare/common term query."""
    from image_deduplication_3m_images_ray.extras.retrieval import bm25_topk

    return bm25_topk(
        _docs(sf_dir).select_columns(["doc_id", "text"]),
        query_terms=["dup", "spark", "vector"],
        k=10,
    )


def _q_bm25_join(sf_dir: str):
    """Per-query BM25 top-5 for two fixed benchmark-style prompts (the
    retrieval-decontamination join shape)."""
    import ray.data

    from image_deduplication_3m_images_ray.extras.retrieval import bm25_join

    queries_ds = ray.data.from_items(
        [
            {"query_id": 1, "text": "dup spark"},
            {"query_id": 2, "text": "vector window table"},
        ]
    )
    return bm25_join(
        _docs(sf_dir).select_columns(["doc_id", "text"]), queries_ds, k=5
    ).sort(["query_id", "rank"])


def queries() -> dict[str, Callable[[str], Any]]:
    # Order matters: the driver's correctness gate checks the FIRST 50
    # entries only.  Rounds 1-4 green-lit the 50 now at the tail
    # (CORRECTNESS_r0{1..4}.json); the 48 entries the driver has never
    # checked lead so CORRECTNESS_r05 covers them (VERDICT r4, task 4).
    # All 98 stay green under tools/check_queries.py at every scale.
    return {
        "media_resize": _q_media_resize,
        "containment_pairs": _q_containment_pairs,
        "source_overlap": _q_source_overlap,
        "latest_by_key": _q_latest_by_key,
        "chunk_docs": _q_chunk_docs,
        "redact_pii": _q_redact_pii,
        "subtract_corpus": _q_subtract_corpus,
        "pack_sequences": _q_pack_sequences,
        "sample_token_budget": _q_sample_token_budget,
        "ngram_counts": _q_ngram_counts,
        "frequent_terms_by_lang": _q_frequent_terms_by_lang,
        "winsorize": _q_winsorize,
        "fuzzy_join": _q_fuzzy_join,
        "fuzzy_subtract": _q_fuzzy_subtract,
        "term_cooccurrence": _q_term_cooccurrence,
        "normalize_text": _q_normalize_text,
        "lm_perplexity": _q_lm_perplexity,
        "gopher_quality": _q_gopher_quality,
        "perplexity_buckets": _q_perplexity_buckets,
        "hash_split": _q_hash_split,
        "resample_mixture": _q_resample_mixture,
        "knn_graph": _q_knn_graph,
        "graph_pagerank": _q_graph_pagerank,
        "graph_components": _q_graph_components,
        "epoch_shuffle": _q_epoch_shuffle,
        "centroid_distances": _q_centroid_distances,
        "collocations": _q_collocations,
        "importance_sample": _q_importance_sample,
        "curate_corpus": _q_curate_corpus,
        "semdedup": _q_semdedup,
        "kmeans": _q_kmeans,
        "semdedup_kmeans": _q_semdedup_kmeans,
        "weighted_sample": _q_weighted_sample,
        "weighted_sample_per_group": _q_weighted_sample_per_group,
        "bpe_merges": _q_bpe_merges,
        "bpe_encode": _q_bpe_encode,
        "media_features": _q_media_features,
        "media_cosine_pairs": _q_media_cosine_pairs,
        "dsir_weights": _q_dsir_weights,
        "nb_classify": _q_nb_classify,
        "url_canon": _q_url_canon,
        "url_dedup": _q_url_dedup,
        "domain_stats": _q_domain_stats,
        "domain_filter": _q_domain_filter,
        "crawl_curate": _q_crawl_curate,
        "histogram": _q_histogram,
        "bm25_topk": _q_bm25_topk,
        "bm25_join": _q_bm25_join,
        # --- driver-checked green in rounds 1-4 (CORRECTNESS_r0{1..4}.json) ---
        "exact_dedup": _q_exact_dedup,
        "exact_dedup_survivors": _q_exact_dedup_survivors,
        "token_stats": _q_token_stats,
        "bpe_token_stats": _q_bpe_token_stats,
        "repetition_stats": _q_repetition_stats,
        "contamination": _q_contamination,
        "clean_corpus": _q_clean_corpus,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "inverted_index": _q_inverted_index,
        "vocab_stats": _q_vocab_stats,
        "frequent_terms": _q_frequent_terms,
        "quality_scores": _q_quality_scores,
        "char_jaccard_pairs": _q_char_jaccard_pairs,
        "lang_counts": _q_lang_counts,
        "join_label_counts": _q_join_label_counts,
        "top_docs": _q_top_docs,
        "distinct_sources": _q_distinct_sources,
        "filter_en_long": _q_filter_en_long,
        "embedding_cosine_pairs": _q_embedding_cosine_pairs,
        "semantic_dedup": _q_semantic_dedup,
        "lexical_diversity": _q_lexical_diversity,
        "badwords_filter": _q_badwords_filter,
        "intradoc_dedup": _q_intradoc_dedup,
        "exact_substring_dedup": _q_exact_substring_dedup,
        "segment_dedup": _q_segment_dedup,
        "boilerplate_removal": _q_boilerplate_removal,
        "ann_topk": _q_ann_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "minhash_lsh_clusters": _q_minhash_lsh_clusters,
        "simhash_pairs": _q_simhash_pairs,
        "lang_id": _q_lang_id,
        "doc_fingerprints": _q_doc_fingerprints,
        "suffix_pairs": _q_suffix_pairs,
        "dedup_report": _q_dedup_report,
        "dedup_summary": _q_dedup_summary,
        "cluster_stats": _q_cluster_stats,
        "window_agg": _q_window_agg,
        "sliding_window_agg": _q_sliding_window_agg,
        "rolling_agg": _q_rolling_agg,
        "sessions": _q_sessions,
        "asof_join": _q_asof_join,
        "group_topk": _q_group_topk,
        "group_rank": _q_group_rank,
        "range_join": _q_range_join,
        "sample_uniform": _q_sample_uniform,
        "sample_per_group": _q_sample_per_group,
        "group_quantiles": _q_group_quantiles,
        "pivot_counts": _q_pivot_counts,
        "media_decode": _q_media_decode,
        "media_frames": _q_media_frames,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views named after the parquet files)
# ---------------------------------------------------------------------------

# matches functions.text.normalize_array exactly: NFC, then lower, then
# whitespace collapse, then trim
_NORM = "trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))"

# the synthetic url column of _url_docs, as a reusable CTE body (must build
# the IDENTICAL string the Ray-side synth builds, row for row)
def _urls_sql(pages: int = 40) -> str:
    return f"""
    u AS (SELECT doc_id, text, source,
                 (CASE doc_id % 3 WHEN 0 THEN 'HTTP://'
                                  WHEN 1 THEN 'https://www.'
                                  ELSE 'https://' END)
                 || source || '.example/Page/' || CAST(doc_id % {pages} AS VARCHAR)
                 || (CASE doc_id % 4 WHEN 0 THEN '?utm_source=feed'
                                     WHEN 1 THEN '/'
                                     WHEN 2 THEN '#Frag'
                                     ELSE '' END) AS url
          FROM documents)
"""


_URLS_SQL = _urls_sql()

# extras.urltools.CANON_RULES, nested in the same order (RE2 on both engines)
_CANON_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "lower(COALESCE(url, '')), '^https?://', ''), '^www\\.', ''), "
    "'[?#].*$', ''), '/+$', '')"
)

# the self-trained add-one bigram LM score per doc (extras.lm.lm_score with
# min_count=2), as a reusable CTE chain ending in
# lmscored(doc_id, n_bigrams, n_oov, sum_microbits, bits_per_bigram) —
# shared by the lm_perplexity / perplexity_buckets / curate_corpus oracles;
# ``src`` is the (doc_id, text) relation the model trains on AND scores
def _lm_scored_ctes(src: str = "documents") -> str:
    return f"""
            tk AS (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM {src}),
            big AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS gram FROM tk),
            ctxtok AS (SELECT unnest(toks[1:len(toks)-1]) AS tok FROM tk),
            model AS (SELECT gram, count(*) AS c FROM big
                      GROUP BY gram HAVING count(*) >= 2),
            ctx AS (SELECT tok, count(*) AS c1 FROM ctxtok GROUP BY tok),
            voc AS (SELECT count(DISTINCT tok) AS v
                    FROM (SELECT unnest(toks) AS tok FROM tk)),
            term AS (SELECT b.doc_id,
                            CAST(floor(log2(CAST(ctx.c1 + voc.v AS DOUBLE)
                                            / CAST(COALESCE(model.c, 0) + 1
                                                   AS DOUBLE))
                                       * 1000000.0 + 0.5) AS BIGINT) AS mb,
                            CASE WHEN model.c IS NULL THEN 1 ELSE 0 END AS oov
                     FROM big b
                     LEFT JOIN model USING (gram)
                     JOIN ctx ON ctx.tok = split_part(b.gram, ' ', 1)
                     CROSS JOIN voc),
            agg AS (SELECT doc_id, count(*) AS nb, sum(oov) AS noov,
                           sum(mb) AS smb
                    FROM term GROUP BY doc_id),
            lmscored AS (SELECT d.doc_id,
                   CAST(COALESCE(agg.nb, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(agg.noov, 0) AS BIGINT) AS n_oov,
                   CAST(COALESCE(agg.smb, 0) AS BIGINT) AS sum_microbits,
                   CASE WHEN agg.nb IS NULL THEN 0.0
                        ELSE CAST(agg.smb AS DOUBLE) / 1000000.0 / agg.nb
                   END AS bits_per_bigram
            FROM {src} d LEFT JOIN agg USING (doc_id))
"""


_LM_SCORED_CTES = _lm_scored_ctes()


def _pagerank_sql(n_iters: int = 10, d: float = 0.85, k: int = 5) -> str:
    """Unrolled power-iteration PageRank over the exact k-NN digraph (mirrors
    extras.graph.pagerank: uniform dangling redistribution, fixed iterations).
    The k-NN graph has no dangling nodes; the dangling term is kept so the
    oracle pins the operator's general contract, not the special case."""
    ctes = [
        f"""e AS MATERIALIZED (
            SELECT src, dst FROM (
                SELECT a.vec_id AS src, b.vec_id AS dst,
                       row_number() OVER (PARTITION BY a.vec_id
                           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                           CAST(b.embedding AS DOUBLE[])) DESC,
                                    b.vec_id) AS rnk
                FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            ) WHERE rnk <= {k})""",
        "nodes AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e)",
        "nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS v, CAST(count(*) AS DOUBLE) AS d FROM e GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT v, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, n_iters + 1):
        p = f"r{i - 1}"
        ctes.append(
            f"""r{i} AS MATERIALIZED (
            SELECT nd.v,
                   (1 - {d}) / nn.n
                   + {d} * (coalesce(c.s, 0)
                            + (SELECT coalesce(sum(p.r), 0) FROM {p} p
                               LEFT JOIN deg dg ON p.v = dg.v
                               WHERE dg.v IS NULL) / nn.n) AS r
            FROM nodes nd CROSS JOIN nn
            LEFT JOIN (SELECT e.dst AS v, sum(p.r / dg.d) AS s
                       FROM e JOIN {p} p ON e.src = p.v
                              JOIN deg dg ON e.src = dg.v
                       GROUP BY e.dst) c ON nd.v = c.v)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS vec_id, round(r, 6) AS pr FROM r{n_iters} ORDER BY vec_id"
    )


_PAGERANK_SQL = _pagerank_sql()

# Shared Lloyd's k-means CTE chain (k=8, 3 unrolled iterations, init = the 8
# smallest vec_ids, empty clusters keep their previous centroid).  Ends with
# `fin` = (vec_id, label, d2, rn); rn = 1 is the final assignment.  Used by
# the `kmeans` oracle and spliced into `semdedup_kmeans`.
_KMEANS_CTES = """e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            u AS (SELECT vec_id, unnest(v) AS x,
                         generate_subscripts(v, 1) AS pos
                  FROM e),
            init AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS label,
                            vec_id
                     FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT 8)),
            c0 AS (SELECT i.label, u.pos, u.x AS cx
                   FROM init i JOIN u USING (vec_id)),
            a1 AS (SELECT vec_id, label FROM (
                     SELECT u.vec_id, c.label,
                            ROW_NUMBER() OVER (PARTITION BY u.vec_id
                                ORDER BY sum(u.x*u.x) - 2*sum(u.x*c.cx)
                                         + sum(c.cx*c.cx), c.label) AS rn
                     FROM u JOIN c0 c USING (pos)
                     GROUP BY u.vec_id, c.label) WHERE rn = 1),
            m1 AS (SELECT a.label, u.pos, avg(u.x) AS cx
                   FROM a1 a JOIN u USING (vec_id) GROUP BY 1, 2),
            c1 AS (SELECT c0.label, c0.pos, COALESCE(m1.cx, c0.cx) AS cx
                   FROM c0 LEFT JOIN m1 USING (label, pos)),
            a2 AS (SELECT vec_id, label FROM (
                     SELECT u.vec_id, c.label,
                            ROW_NUMBER() OVER (PARTITION BY u.vec_id
                                ORDER BY sum(u.x*u.x) - 2*sum(u.x*c.cx)
                                         + sum(c.cx*c.cx), c.label) AS rn
                     FROM u JOIN c1 c USING (pos)
                     GROUP BY u.vec_id, c.label) WHERE rn = 1),
            m2 AS (SELECT a.label, u.pos, avg(u.x) AS cx
                   FROM a2 a JOIN u USING (vec_id) GROUP BY 1, 2),
            c2 AS (SELECT c1.label, c1.pos, COALESCE(m2.cx, c1.cx) AS cx
                   FROM c1 LEFT JOIN m2 USING (label, pos)),
            a3 AS (SELECT vec_id, label FROM (
                     SELECT u.vec_id, c.label,
                            ROW_NUMBER() OVER (PARTITION BY u.vec_id
                                ORDER BY sum(u.x*u.x) - 2*sum(u.x*c.cx)
                                         + sum(c.cx*c.cx), c.label) AS rn
                     FROM u JOIN c2 c USING (pos)
                     GROUP BY u.vec_id, c.label) WHERE rn = 1),
            m3 AS (SELECT a.label, u.pos, avg(u.x) AS cx
                   FROM a3 a JOIN u USING (vec_id) GROUP BY 1, 2),
            c3 AS (SELECT c2.label, c2.pos, COALESCE(m3.cx, c2.cx) AS cx
                   FROM c2 LEFT JOIN m3 USING (label, pos)),
            fin AS (SELECT u.vec_id, c.label,
                           sum(u.x*u.x) - 2*sum(u.x*c.cx)
                               + sum(c.cx*c.cx) AS d2,
                           ROW_NUMBER() OVER (PARTITION BY u.vec_id
                               ORDER BY sum(u.x*u.x) - 2*sum(u.x*c.cx)
                                        + sum(c.cx*c.cx), c.label) AS rn
                    FROM u JOIN c3 c USING (pos)
                    GROUP BY u.vec_id, c.label)"""


# the Gopher rule metrics per doc (extras.textstats.gopher_quality), as a
# reusable CTE chain ending in gqm(doc_id, n_words, mean_word_len,
# symbol_ratio, alpha_word_ratio, n_stop) — the caller applies its own
# threshold expression.  Shared by the gopher_quality and curate_corpus
# oracles.
def _gopher_metrics_ctes(src: str = "documents") -> str:
    return f"""
            gn AS (SELECT doc_id, {_NORM} AS nt FROM {src}),
            gs AS (SELECT doc_id,
                         length(nt) AS nc,
                         CASE WHEN nt = '' THEN 0
                              ELSE length(nt) - length(replace(nt, ' ', '')) + 1
                         END AS nw,
                         length(nt) - length(replace(nt, ' ', '')) AS nsp,
                         length(nt) - length(replace(nt, '#', '')) AS nhash,
                         (length(nt) - length(replace(nt, '...', ''))) // 3 AS nell,
                         CASE WHEN nt = '' THEN 0
                              ELSE len(list_filter(string_split(nt, ' '),
                                                   x -> regexp_matches(x, '[a-z]')))
                         END AS nalpha,
                         (CASE WHEN contains(' ' || nt || ' ', ' the ') THEN 1 ELSE 0 END
                          + CASE WHEN contains(' ' || nt || ' ', ' be ') THEN 1 ELSE 0 END
                          + CASE WHEN contains(' ' || nt || ' ', ' to ') THEN 1 ELSE 0 END
                          + CASE WHEN contains(' ' || nt || ' ', ' of ') THEN 1 ELSE 0 END
                          + CASE WHEN contains(' ' || nt || ' ', ' and ') THEN 1 ELSE 0 END
                          + CASE WHEN contains(' ' || nt || ' ', ' that ') THEN 1 ELSE 0 END
                          + CASE WHEN contains(' ' || nt || ' ', ' have ') THEN 1 ELSE 0 END
                          + CASE WHEN contains(' ' || nt || ' ', ' with ') THEN 1 ELSE 0 END
                         ) AS nstop
                  FROM gn),
            gqm AS (SELECT doc_id,
                         CAST(nw AS BIGINT) AS n_words,
                         CASE WHEN nw > 0 THEN CAST(nc - nsp AS DOUBLE) / nw
                              ELSE 0.0 END AS mean_word_len,
                         CAST(nhash + nell AS DOUBLE) / greatest(nw, 1) AS symbol_ratio,
                         CAST(nalpha AS DOUBLE) / greatest(nw, 1) AS alpha_word_ratio,
                         CAST(nstop AS BIGINT) AS n_stop
                  FROM gs)
"""


# the keep predicate at the thresholds every driver query uses
# (published defaults except min_stopwords=1 — see _q_gopher_quality)
_GOPHER_KEEP = """(n_words >= 50 AND n_words <= 100000
                             AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                             AND symbol_ratio <= 0.1
                             AND alpha_word_ratio >= 0.8
                             AND n_stop >= 1)"""


# the redact_pii oracle interpolates the SAME RE2 patterns the operator runs
from image_deduplication_3m_images_ray.extras.transforms import PII_PATTERNS as _PII

_PII_EMAIL, _PII_IP, _PII_PHONE = (p for _, p, _ in _PII)

# distinct 5-token shingles of a normalized text column ``nt`` (a doc with
# fewer than 5 tokens contributes its whole text as its single shingle —
# matches functions.hashing.shingle_hashes_flat's short-doc sentinel), plus
# exact-Jaccard >= t edges over those shingle sets.  Shared by the
# minhash_lsh_clusters and dedup_report oracles; ``src`` must expose
# (id, nt) columns.
def _shingle_jaccard_edges_sql(src: str, threshold: float) -> str:
    return f"""
    toks_ AS (SELECT id, nt, string_split(nt, ' ') AS toks FROM {src}),
    sh_ AS (SELECT id,
              CASE WHEN len(toks) >= 5
                   THEN list_distinct(
                        [array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)])
                   ELSE [nt] END AS sh
            FROM toks_),
    grams_ AS (SELECT id, unnest(sh) AS gram FROM sh_),
    sz_ AS (SELECT id, count(*) AS sz FROM grams_ GROUP BY id),
    inter_ AS (SELECT a.id AS da, b.id AS db, count(*) AS i
               FROM grams_ a JOIN grams_ b ON a.gram = b.gram AND a.id < b.id
               GROUP BY 1, 2),
    jedges_ AS (SELECT da, db,
                       CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS j
                FROM inter_
                JOIN sz_ sa ON sa.id = da
                JOIN sz_ sb ON sb.id = db
                WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= {threshold})
    """


# pairs of ids whose ``nt`` texts share an identical length-L substring
# (== "common substring >= L chars": every run >= L contains an L-window)
def _lgram_edges_sql(src: str, L: int) -> str:
    return f"""
    lg_ AS (SELECT DISTINCT id, substr(nt, CAST(i AS INTEGER), {L}) AS gram
            FROM (SELECT id, nt, unnest(range(1, length(nt) - {L - 2})) AS i
                  FROM {src} WHERE length(nt) >= {L})),
    sedges_ AS (SELECT DISTINCT a.id AS da, b.id AS db
                FROM lg_ a JOIN lg_ b ON a.gram = b.gram AND a.id < b.id)
    """


# min-label connected components over ``edges_(da, db)`` with node set
# ``nodes_(id)``: a label l propagates along every edge to any larger node id,
# so min(l) per node is the component minimum (finite closure, UNION dedups)
_CC_SQL = """
    bidir_ AS (SELECT da AS a, db AS b FROM edges_
               UNION ALL SELECT db, da FROM edges_),
    cc_(nd, l) AS (
        SELECT id, id FROM nodes_
        UNION
        SELECT bidir_.b, cc_.l FROM cc_ JOIN bidir_ ON bidir_.a = cc_.nd
        WHERE cc_.l < bidir_.b
    ),
    labels_ AS (SELECT nd, min(l) AS cid FROM cc_ GROUP BY nd)
"""


def _dedup_report_sql() -> str:
    return f"""
            WITH RECURSIVE
            base AS (SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                            md5_number_lower('doc://' || CAST(doc_id AS VARCHAR)) AS did,
                            {_NORM} AS nt,
                            CAST(length(text) AS DOUBLE) AS quality
                     FROM documents),
            rep AS (SELECT url, did, nt, quality,
                           min(did) OVER (PARTITION BY nt) AS rid
                    FROM base),
            nodes_ AS (SELECT DISTINCT rid AS id, nt FROM rep),
            {_shingle_jaccard_edges_sql("nodes_", 0.7)},
            {_lgram_edges_sql("nodes_", 200)},
            edges_ AS (SELECT da, db FROM jedges_ UNION SELECT da, db FROM sedges_),
            {_CC_SQL},
            r AS (SELECT rep.url, rep.did AS doc_id, labels_.cid AS cluster_id,
                         rep.quality
                  FROM rep JOIN labels_ ON labels_.nd = rep.rid),
            w AS (SELECT *,
                         count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
                         row_number() OVER (PARTITION BY cluster_id
                                            ORDER BY quality DESC, url ASC) AS rn
                  FROM r)
            SELECT url, doc_id, cluster_id, cluster_size, quality,
                   CASE WHEN cluster_size = 1 THEN 'Unique'
                        WHEN rn = 1 THEN 'Best'
                        ELSE 'Duplicate' END AS status
            FROM w ORDER BY url
    """


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup": """
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY text) AS cluster_id,
                   count(*)   OVER (PARTITION BY text) AS cluster_size
            FROM documents
            ORDER BY doc_id
        """,
        "exact_dedup_survivors": """
            SELECT doc_id FROM (
                SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS cid
                FROM documents
            ) WHERE doc_id = cid ORDER BY doc_id
        """,
        "token_stats": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            s AS (
                SELECT doc_id,
                       length(nt) AS n_chars_norm,
                       length(nt) - length(replace(nt, ' ', '')) AS n_spaces
                FROM n
            )
            SELECT doc_id,
                   n_chars_norm,
                   CASE WHEN n_chars_norm = 0 THEN 0 ELSE n_spaces + 1 END AS n_tokens,
                   CASE WHEN n_chars_norm = 0 THEN 0.0
                        ELSE (n_chars_norm - n_spaces) / CAST(n_spaces + 1 AS DOUBLE)
                   END AS mean_token_len
            FROM s ORDER BY doc_id
        """,
        "bpe_token_stats": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            c AS (SELECT doc_id,
                         len(regexp_extract_all(nt, '[a-z]+')) AS w,
                         len(regexp_extract_all(nt, '[0-9]+')) AS d,
                         len(regexp_extract_all(nt, '[^a-z0-9 ]+')) AS p
                  FROM n)
            SELECT doc_id,
                   CAST(w + d + p AS BIGINT) AS n_bpe_tokens,
                   CAST(w AS BIGINT) AS n_word_tokens,
                   CAST(d AS BIGINT) AS n_num_tokens,
                   CAST(p AS BIGINT) AS n_punct_tokens
            FROM c ORDER BY doc_id
        """,
        "repetition_stats": """
            WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            grams AS (
                SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
                FROM base
            )
            SELECT b.doc_id,
                   count(g.gram) AS n_grams,
                   count(DISTINCT g.gram) AS n_distinct_grams,
                   count(g.gram) - count(DISTINCT g.gram) AS n_repeated_grams
            FROM base b LEFT JOIN grams g USING (doc_id)
            GROUP BY b.doc_id ORDER BY b.doc_id
        """,
        "contamination": """
            WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
            g AS (SELECT doc_id, source, unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS gram FROM toks),
            bench AS (SELECT DISTINCT gram FROM g WHERE source = 'src0'),
            hits AS (SELECT d.doc_id, count(DISTINCT d.gram) AS n_contaminated
                     FROM g d JOIN bench b USING (gram) GROUP BY d.doc_id)
            SELECT t.doc_id,
                   CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
                   CAST(CASE WHEN coalesce(h.n_contaminated, 0) > 0 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
            FROM toks t LEFT JOIN hits h USING (doc_id)
            ORDER BY doc_id
        """,
        "clean_corpus": """
            WITH q AS (
                SELECT doc_id, lang,
                       CAST(length(text) AS DOUBLE) AS nc,
                       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS nd
                FROM documents
            ),
            qs AS (SELECT doc_id, lang,
                          least(nc, 2000.0) / 2000.0 * 100.0 * (1.0 - nd / greatest(nc, 1.0)) AS quality
                   FROM q),
            base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            grams AS (
                SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
                FROM base
            ),
            rep AS (SELECT b.doc_id,
                           count(g.gram) AS n_grams,
                           count(DISTINCT g.gram) AS n_distinct
                    FROM base b LEFT JOIN grams g USING (doc_id) GROUP BY b.doc_id),
            toks8 AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
            g8 AS (SELECT doc_id, source, unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS gram FROM toks8),
            bench AS (SELECT DISTINCT gram FROM g8 WHERE source = 'src0'),
            hits AS (SELECT d.doc_id, count(DISTINCT d.gram) AS n_contaminated
                     FROM g8 d JOIN bench b USING (gram) GROUP BY d.doc_id),
            sel AS (SELECT qs.doc_id, qs.quality,
                           CAST(rep.n_grams - rep.n_distinct AS DOUBLE)
                               / greatest(rep.n_grams, 1) AS rep_ratio,
                           CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated
                    FROM qs JOIN rep USING (doc_id) LEFT JOIN hits h USING (doc_id)
                    WHERE qs.lang = 'en')
            SELECT doc_id, quality, rep_ratio, n_contaminated FROM sel
            WHERE quality >= 10.0 AND rep_ratio <= 0.05 AND n_contaminated = 0
            ORDER BY doc_id
        """,
        "tfidf_top_terms": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM n),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
            r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                         row_number() OVER (PARTITION BY tf.doc_id
                             ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rank
                  FROM tf JOIN df USING (term))
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, rank
            FROM r WHERE rank <= 3 ORDER BY doc_id, rank
        """,
        "vocab_stats": f"""
            WITH n AS (SELECT {_NORM} AS nt FROM documents),
            tok AS (SELECT unnest(string_split(nt, ' ')) AS term FROM n),
            tc AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
            top AS (SELECT term, c FROM tc ORDER BY c DESC, term ASC LIMIT 1)
            SELECT CAST((SELECT sum(c) FROM tc) AS BIGINT) AS n_tokens,
                   (SELECT count(*) FROM tc) AS n_terms,
                   (SELECT count(*) FROM tc WHERE c = 1) AS n_hapax,
                   (SELECT term FROM top) AS top_term,
                   CAST((SELECT c FROM top) AS BIGINT) AS top_term_count
        """,
        "frequent_terms": f"""
            WITH n AS (SELECT {_NORM} AS nt FROM documents),
            tok AS (SELECT unnest(string_split(nt, ' ')) AS term FROM n),
            tc AS (SELECT term, count(*) AS n FROM tok GROUP BY term)
            SELECT term, CAST(n AS BIGINT) AS n
            FROM tc ORDER BY n DESC, term ASC LIMIT 25
        """,
        "inverted_index": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tok AS (SELECT DISTINCT * FROM
                    (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM n))
            SELECT term, count(*) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
            FROM tok GROUP BY term ORDER BY term
        """,
        "quality_scores": """
            WITH s AS (
                SELECT doc_id,
                       CAST(length(text) AS DOUBLE) AS nc,
                       CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE) AS nd,
                       CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE) AS ns
                FROM documents
            )
            SELECT doc_id,
                   CAST(nc AS BIGINT) AS n_chars,
                   nd / greatest(nc, 1.0) AS digit_ratio,
                   ns / greatest(nc, 1.0) AS space_ratio,
                   least(nc, 2000.0) / 2000.0 * 100.0 * (1.0 - nd / greatest(nc, 1.0)) AS quality
            FROM s ORDER BY doc_id
        """,
        "char_jaccard_pairs": """
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   jaccard(a.text, b.text) AS char_jaccard
            FROM documents a JOIN documents b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
            WHERE jaccard(a.text, b.text) >= 0.5
            ORDER BY doc_a, doc_b
        """,
        "join_label_counts": """
            SELECT d.lang, e.label, count(*) AS n
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
            GROUP BY d.lang, e.label ORDER BY d.lang, e.label
        """,
        "lang_counts": """
            SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "top_docs": """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id ASC LIMIT 10
        """,
        "distinct_sources": """
            SELECT DISTINCT source FROM documents ORDER BY source
        """,
        "filter_en_long": """
            SELECT doc_id, lang, n_chars FROM documents
            WHERE lang = 'en' AND n_chars > 300 ORDER BY doc_id
        """,
        "embedding_cosine_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.3
            ORDER BY vec_a, vec_b
        """,
        "lexical_diversity": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tk FROM n),
            tc AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk),
            pt AS (SELECT doc_id, c,
                          CAST(c AS DOUBLE)
                          / sum(c) OVER (PARTITION BY doc_id) AS p
                   FROM tc),
            agg AS (SELECT doc_id,
                           CAST(sum(c) AS BIGINT) AS n_tokens,
                           CAST(count(*) AS BIGINT) AS n_types,
                           -sum(p * log2(p)) AS h
                    FROM pt GROUP BY doc_id)
            SELECT doc_id, n_tokens, n_types,
                   round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr,
                   round(h, 6) + 0.0 AS token_entropy
            FROM agg ORDER BY doc_id
        """,
        "badwords_filter": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tk FROM n),
            c AS (SELECT doc_id,
                         CAST(count(*) FILTER (WHERE tk IN ('spark', 'vector'))
                              AS BIGINT) AS n_bad_tokens
                  FROM tok GROUP BY doc_id)
            SELECT doc_id, n_bad_tokens,
                   CAST(n_bad_tokens > 0 AS INTEGER) AS flagged
            FROM c ORDER BY doc_id
        """,
        "intradoc_dedup": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tk AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM n),
            ex AS (SELECT doc_id, toks,
                          unnest(range(0, (len(toks) + 1) // 2)) AS pidx
                   FROM tk),
            seg AS (SELECT doc_id, pidx,
                           array_to_string(
                               toks[pidx*2+1 : least(pidx*2+2, len(toks))], ' ') AS seg
                    FROM ex),
            r AS (SELECT *, row_number() OVER (PARTITION BY doc_id, seg
                                               ORDER BY pidx) AS rn
                  FROM seg)
            SELECT doc_id,
                   COALESCE(string_agg(seg, ' ' ORDER BY pidx) FILTER (WHERE rn = 1), '') AS clean_text,
                   count(*) AS n_segs,
                   CAST(count(*) - count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_removed
            FROM r GROUP BY doc_id ORDER BY doc_id
        """,
        "exact_substring_dedup": """
            WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            occ AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)-8+2),
                           i -> array_to_string(toks[i:i+8-1], ' '))) AS gram,
                       unnest(range(1, len(toks)-8+2)) AS pos
                FROM base),
            dup AS (SELECT gram FROM occ GROUP BY gram HAVING count(*) >= 2),
            cover AS (SELECT o.doc_id, o.pos FROM occ o JOIN dup USING (gram)),
            tok AS (SELECT doc_id, unnest(toks) AS tok,
                           generate_subscripts(toks, 1) AS pos FROM base),
            keep AS (SELECT t.doc_id, t.tok, t.pos FROM tok t
                WHERE NOT EXISTS (SELECT 1 FROM cover c WHERE c.doc_id = t.doc_id
                                  AND t.pos BETWEEN c.pos AND c.pos + 8 - 1)),
            agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                           count(*) AS n_kept FROM keep GROUP BY doc_id)
            SELECT b.doc_id, coalesce(a.clean_text, '') AS clean_text,
                   CAST(len(b.toks) AS BIGINT) AS n_tokens,
                   CAST(len(b.toks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
            FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY doc_id
        """,
        "segment_dedup": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tk AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM n),
            ex AS (SELECT doc_id, toks,
                          unnest(range(0, (len(toks) + 9) // 10)) AS pidx
                   FROM tk),
            seg AS (SELECT doc_id, pidx,
                           array_to_string(
                               toks[pidx*10+1 : least(pidx*10+10, len(toks))], ' ') AS seg
                    FROM ex),
            r AS (SELECT *, row_number() OVER (PARTITION BY seg
                                               ORDER BY doc_id, pidx) AS rn
                  FROM seg)
            SELECT doc_id,
                   COALESCE(string_agg(seg, ' ' ORDER BY pidx) FILTER (WHERE rn = 1), '') AS clean_text,
                   count(*) AS n_segs,
                   CAST(count(*) - count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_removed
            FROM r GROUP BY doc_id ORDER BY doc_id
        """,
        "boilerplate_removal": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tk AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM n),
            ex AS (SELECT doc_id, toks,
                          unnest(range(0, (len(toks) + 9) // 10)) AS pidx
                   FROM tk),
            seg AS (SELECT doc_id, pidx,
                           array_to_string(
                               toks[pidx*10+1 : least(pidx*10+10, len(toks))], ' ') AS seg
                    FROM ex),
            freq AS (SELECT seg FROM seg
                     GROUP BY seg HAVING count(DISTINCT doc_id) > 2)
            SELECT doc_id,
                   COALESCE(string_agg(seg, ' ' ORDER BY pidx)
                            FILTER (WHERE seg NOT IN (SELECT seg FROM freq)), '') AS clean_text,
                   count(*) AS n_segs,
                   CAST(count(*) FILTER (WHERE seg IN (SELECT seg FROM freq)) AS BIGINT) AS n_removed
            FROM seg GROUP BY doc_id ORDER BY doc_id
        """,
        "semantic_dedup": f"""
            WITH RECURSIVE
            nodes_ AS (SELECT vec_id AS id FROM embeddings),
            edges_ AS (
                SELECT a.vec_id AS da, b.vec_id AS db
                FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])) >= 0.3
            ),
            {_CC_SQL}
            SELECT nd AS vec_id, cid AS cluster_id,
                   CAST(nd = cid AS INTEGER) AS keep
            FROM labels_ ORDER BY vec_id
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                       ORDER BY vec_id LIMIT 5),
            s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])) AS c
                FROM q CROSS JOIN embeddings e
            ),
            r AS (
                SELECT query_id, vec_id, c,
                       row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
                FROM s
            )
            SELECT query_id, vec_id, round(c, 6) AS cosine, rank
            FROM r WHERE rank <= 10 ORDER BY query_id, rank
        """,
        "ann_ivf_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
                       ORDER BY vec_id LIMIT 5),
            s AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])) AS c
                FROM q CROSS JOIN embeddings e
            ),
            r AS (
                SELECT query_id, vec_id, c,
                       row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
                FROM s
            )
            SELECT query_id, vec_id, round(c, 6) AS cosine, rank
            FROM r WHERE rank <= 10 ORDER BY query_id, rank
        """,
        "window_agg": """
            SELECT event_type,
                   (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events
            GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "sliding_window_agg": """
            SELECT event_type,
                   ((CAST(floor(epoch(ts)) AS BIGINT) // 900) - i) * 900 AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events CROSS JOIN (SELECT unnest(range(4)) AS i)
            GROUP BY event_type, window_start
            ORDER BY event_type, window_start
        """,
        "rolling_agg": """
            SELECT event_id, user_id, ts,
                   CAST(sum(cents) OVER w AS BIGINT) AS roll_sum_cents,
                   CAST(count(*) OVER w AS BIGINT) AS roll_n
            FROM (SELECT event_id, user_id, ts,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        "sessions": """
            WITH o AS (
                SELECT user_id, ts, event_id,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events
            ),
            f AS (
                SELECT *, CASE WHEN prev_ts IS NULL
                                 OR date_diff('microsecond', prev_ts, ts) > 1800000000
                               THEN 1 ELSE 0 END AS new_s
                FROM o
            ),
            s AS (
                SELECT *, CAST(sum(new_s) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1 AS session_id
                FROM f
            )
            SELECT user_id, session_id, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end
            FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
        """,
        "asof_join": """
            WITH l AS (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'purchase'),
            r AS (SELECT event_id, ts, user_id, value FROM events
                  WHERE event_type = 'click'),
            m AS (SELECT l.event_id, r.event_id AS ref_event_id, r.value AS ref_value,
                         date_diff('microsecond', r.ts, l.ts) AS lag_us,
                         row_number() OVER (PARTITION BY l.event_id
                                            ORDER BY r.ts DESC, r.event_id DESC) AS rn
                  FROM l JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts)
            SELECT l.event_id, l.ts, l.user_id,
                   COALESCE(m.ref_value, 0.0) AS ref_value,
                   CAST(COALESCE(m.ref_event_id, -1) AS BIGINT) AS ref_event_id,
                   CAST(COALESCE(m.lag_us, -1) AS BIGINT) AS lag_us
            FROM l LEFT JOIN m ON m.event_id = l.event_id AND m.rn = 1
            ORDER BY l.event_id
        """,
        "group_topk": """
            SELECT doc_id, lang, n_chars, rank FROM (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (PARTITION BY lang
                                          ORDER BY n_chars DESC, doc_id ASC) AS rank
                FROM documents
            ) WHERE rank <= 3 ORDER BY lang, rank
        """,
        "group_rank": """
            SELECT doc_id, lang, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY n_chars DESC, doc_id ASC) AS rank,
                   ntile(4) OVER (PARTITION BY lang
                                  ORDER BY n_chars DESC, doc_id ASC) AS tile
            FROM documents ORDER BY lang, rank
        """,
        "range_join": """
            WITH l AS (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'click'),
            r AS (SELECT event_id, ts, user_id FROM events
                  WHERE event_type = 'purchase')
            SELECT l.event_id, l.user_id,
                   epoch_us(l.ts) AS ts_us,
                   r.event_id AS ref_event_id,
                   date_diff('microsecond', r.ts, l.ts) AS offset_us
            FROM l JOIN r ON l.user_id = r.user_id
                         AND r.ts <= l.ts
                         AND l.ts <= r.ts + INTERVAL 3600 SECOND
            ORDER BY l.event_id, ref_event_id
        """,
        "pivot_counts": """
            SELECT user_id,
                   CAST(count(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS n_click,
                   CAST(count(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS n_error,
                   CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
                   CAST(count(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS n_signup,
                   CAST(count(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS n_view
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "group_quantiles": """
            SELECT event_type, count(*) AS n_rows,
                   quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.25) AS p25,
                   quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.5)  AS p50,
                   quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.9)  AS p90,
                   quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT), 0.99) AS p99
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "sample_uniform": """
            SELECT doc_id, lang FROM documents
            WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 < 3
            ORDER BY doc_id
        """,
        "sample_per_group": """
            SELECT doc_id, lang, rank FROM (
                SELECT doc_id, lang,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id) AS rank
                FROM documents
            ) WHERE rank <= 5 ORDER BY lang, rank
        """,
        "simhash_pairs": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tk FROM n),
            th AS (SELECT doc_id, md5_number_lower(tk) AS h FROM tok),
            bits AS (
                SELECT doc_id, b AS bit,
                       sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
                FROM th CROSS JOIN (SELECT unnest(range(64)) AS b)
                GROUP BY doc_id, b
            ),
            sh AS (
                SELECT doc_id,
                       CAST(sum(CASE WHEN s > 0
                                     THEN CAST(1 AS UBIGINT) << CAST(bit AS INTEGER)
                                     ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS simhash
                FROM bits GROUP BY doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
            ORDER BY doc_a, doc_b
        """,
        "lang_id": _lang_id_sql(),
        "doc_fingerprints": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            g AS (
                SELECT DISTINCT doc_id, substr(nt, CAST(i AS INTEGER), 32) AS gram
                FROM (SELECT doc_id, nt, unnest(range(1, length(nt) - 30)) AS i
                      FROM n WHERE length(nt) >= 32)
            ),
            h AS (SELECT doc_id, md5_number_lower(gram) AS hv FROM g
                  WHERE md5_number_lower(gram) % 8 = 0),
            agg AS (SELECT doc_id, count(*) AS n_fingerprints, min(hv) AS fp_min,
                           bit_xor(hv) AS fp_xor
                    FROM h GROUP BY doc_id)
            SELECT n.doc_id,
                   COALESCE(agg.n_fingerprints, 0) AS n_fingerprints,
                   COALESCE(agg.fp_min, CAST(0 AS UBIGINT)) AS fp_min,
                   COALESCE(agg.fp_xor, CAST(0 AS UBIGINT)) AS fp_xor
            FROM n LEFT JOIN agg USING (doc_id) ORDER BY doc_id
        """,
        "media_decode": """
            WITH m AS (
                SELECT doc_id AS media_id,
                       CASE doc_id % 3 WHEN 0 THEN 'image'
                                       WHEN 1 THEN 'audio'
                                       ELSE 'video' END AS kind,
                       md5_number_lower(text) AS h,
                       strlen(text) AS payload_bytes
                FROM documents
            )
            SELECT media_id, kind, payload_bytes,
                   CAST(h % 1920 + 1 AS INTEGER) AS width,
                   CAST((h >> 32) % 1080 + 1 AS INTEGER) AS height,
                   h AS checksum
            FROM m ORDER BY media_id
        """,
        "media_frames": """
            WITH m AS (SELECT doc_id AS media_id, strlen(text) AS dur
                       FROM documents WHERE doc_id % 3 = 2)
            SELECT media_id,
                   CAST(unnest(range(0, dur // 50)) * 50 AS BIGINT) AS frame_ts_ms
            FROM m ORDER BY media_id, frame_ts_ms
        """,
        "media_resize": """
            WITH m AS (
                SELECT doc_id AS media_id, md5_number_lower(text) AS h FROM documents
            ),
            d AS (
                SELECT media_id,
                       CAST(h % 1920 + 1 AS INTEGER) AS width,
                       CAST((h >> 32) % 1080 + 1 AS INTEGER) AS height
                FROM m
            )
            SELECT media_id, width, height,
                   CAST(CASE WHEN greatest(width, height) > 256
                        THEN greatest(1, (width * 256) // greatest(width, height))
                        ELSE width END AS INTEGER) AS out_width,
                   CAST(CASE WHEN greatest(width, height) > 256
                        THEN greatest(1, (height * 256) // greatest(width, height))
                        ELSE height END AS INTEGER) AS out_height
            FROM d ORDER BY media_id
        """,
        "suffix_pairs": f"""
            WITH n AS (SELECT doc_id AS id, {_NORM} AS nt FROM documents),
            {_lgram_edges_sql("n", 200)}
            SELECT da AS doc_a, db AS doc_b, 'suffix' AS origin
            FROM sedges_ ORDER BY doc_a, doc_b
        """,
        "minhash_lsh_clusters": f"""
            WITH RECURSIVE
            nodes_ AS (SELECT doc_id AS id, {_NORM} AS nt FROM documents),
            {_shingle_jaccard_edges_sql("nodes_", 0.7)},
            edges_ AS (SELECT da, db FROM jedges_),
            {_CC_SQL}
            SELECT nd AS doc_id, cid AS cluster_id
            FROM labels_ ORDER BY doc_id
        """,
        "dedup_report": _dedup_report_sql(),
        "dedup_summary": f"""
            SELECT status, count(*) AS n_docs,
                   round(avg(quality), 6) AS mean_quality
            FROM ({_dedup_report_sql()})
            GROUP BY status ORDER BY status
        """,
        "cluster_stats": f"""
            WITH RECURSIVE
            base AS (SELECT md5_number_lower('doc://' || CAST(doc_id AS VARCHAR)) AS did,
                            {_NORM} AS nt
                     FROM documents),
            rep AS (SELECT did, nt, min(did) OVER (PARTITION BY nt) AS rid FROM base),
            nodes_ AS (SELECT DISTINCT rid AS id, nt FROM rep),
            {_shingle_jaccard_edges_sql("nodes_", 0.7)},
            {_lgram_edges_sql("nodes_", 200)},
            edges_ AS (SELECT da, db FROM jedges_ UNION SELECT da, db FROM sedges_),
            {_CC_SQL},
            doccl AS (SELECT rep.did, labels_.cid FROM rep
                      JOIN labels_ ON labels_.nd = rep.rid),
            sizes AS (SELECT cid AS cluster_id, count(*) AS cluster_size
                      FROM doccl GROUP BY cid),
            jp AS (SELECT labels_.cid AS cluster_id, jedges_.j
                   FROM jedges_ JOIN labels_ ON labels_.nd = jedges_.da),
            ps AS (SELECT cluster_id, count(*) AS n_pairs,
                          round(avg(j), 6) AS mean_jaccard
                   FROM jp GROUP BY cluster_id)
            SELECT s.cluster_id, s.cluster_size,
                   COALESCE(ps.n_pairs, 0) AS n_pairs,
                   COALESCE(ps.mean_jaccard, 0.0) AS mean_jaccard
            FROM sizes s LEFT JOIN ps USING (cluster_id) ORDER BY cluster_id
        """,
        "containment_pairs": f"""
            WITH
            nodes_ AS (SELECT doc_id AS id, {_NORM} AS nt FROM documents),
            {_shingle_jaccard_edges_sql("nodes_", 0.0)}
            SELECT inter_.da AS doc_a, inter_.db AS doc_b,
                   CAST(i AS BIGINT) AS n_shared,
                   round(CAST(i AS DOUBLE) / sa.sz, 6) AS containment_a,
                   round(CAST(i AS DOUBLE) / sb.sz, 6) AS containment_b
            FROM inter_
            JOIN sz_ sa ON sa.id = inter_.da
            JOIN sz_ sb ON sb.id = inter_.db
            WHERE CAST(i AS DOUBLE) / sa.sz >= 0.5
               OR CAST(i AS DOUBLE) / sb.sz >= 0.5
            ORDER BY doc_a, doc_b
        """,
        "source_overlap": f"""
            WITH base AS (SELECT source, {_NORM} AS nt FROM documents),
            toks AS (SELECT source, nt, string_split(nt, ' ') AS toks FROM base),
            sh AS (SELECT source,
                     CASE WHEN len(toks) >= 5
                          THEN list_distinct(
                               [array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)])
                          ELSE [nt] END AS sh
                   FROM toks),
            g AS (SELECT DISTINCT source, gram
                  FROM (SELECT source, unnest(sh) AS gram FROM sh)),
            tot AS (SELECT source, count(*) AS n FROM g GROUP BY source),
            inter AS (SELECT a.source AS sa, b.source AS sb, count(*) AS shared
                      FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
                      GROUP BY 1, 2)
            SELECT sa AS source_a, sb AS source_b,
                   ta.n AS n_a, tb.n AS n_b,
                   CAST(shared AS BIGINT) AS n_shared,
                   round(CAST(shared AS DOUBLE) / (ta.n + tb.n - shared), 6) AS jaccard
            FROM inter
            JOIN tot ta ON ta.source = sa
            JOIN tot tb ON tb.source = sb
            ORDER BY source_a, source_b
        """,
        "latest_by_key": """
            SELECT event_id, ts, user_id, event_type, value, props
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events)
            WHERE rn = 1 ORDER BY event_id
        """,
        "chunk_docs": """
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                   substr(text, CAST(i * 400 + 1 AS BIGINT), 500) AS chunk_text
            FROM (SELECT doc_id, text,
                         unnest(range(0,
                             (greatest(length(text) - 500, 0) + 399) // 400 + 1
                         )) AS i
                  FROM documents)
            ORDER BY doc_id, chunk_id
        """,
        # nested exactly like the operator: each pattern counts on the text
        # it actually sees (post earlier replacements); RE2 on both sides
        "redact_pii": (
            "WITH a AS (SELECT doc_id,"
            " CAST(len(regexp_extract_all(text, '" + _PII_EMAIL + "')) AS BIGINT) AS n_emails,"
            " regexp_replace(text, '" + _PII_EMAIL + "', '<EMAIL>', 'g') AS t1"
            " FROM documents),"
            " b AS (SELECT doc_id, n_emails,"
            " CAST(len(regexp_extract_all(t1, '" + _PII_IP + "')) AS BIGINT) AS n_ips,"
            " regexp_replace(t1, '" + _PII_IP + "', '<IP>', 'g') AS t2 FROM a),"
            " c AS (SELECT doc_id, n_emails, n_ips,"
            " CAST(len(regexp_extract_all(t2, '" + _PII_PHONE + "')) AS BIGINT) AS n_phones,"
            " regexp_replace(t2, '" + _PII_PHONE + "', '<PHONE>', 'g') AS clean_text FROM b)"
            " SELECT doc_id, clean_text, n_emails, n_ips, n_phones FROM c ORDER BY doc_id"
        ),
        "subtract_corpus": """
            SELECT doc_id, text, lang, source, n_chars FROM documents
            WHERE source <> 'src0'
              AND text NOT IN (SELECT text FROM documents WHERE source = 'src0')
            ORDER BY doc_id
        """,
        "pack_sequences": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            s AS (SELECT doc_id,
                         CASE WHEN length(nt) = 0 THEN 0
                              ELSE length(nt) - length(replace(nt, ' ', '')) + 1
                         END AS n_tokens
                  FROM n),
            o AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                         CAST(coalesce(sum(n_tokens) OVER (
                             ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                         ), 0) AS BIGINT) AS tok_offset
                  FROM s)
            SELECT doc_id, n_tokens, tok_offset, tok_offset // 2048 AS bin_id
            FROM o ORDER BY doc_id
        """,
        "sample_token_budget": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            s AS (SELECT doc_id,
                         CASE WHEN length(nt) = 0 THEN 0
                              ELSE length(nt) - length(replace(nt, ' ', '')) + 1
                         END AS n_tokens
                  FROM n),
            h AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                         md5_number_lower(CAST(doc_id AS VARCHAR)) AS hk
                  FROM s),
            o AS (SELECT doc_id, n_tokens,
                         CAST(coalesce(sum(n_tokens) OVER (
                             ORDER BY hk, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                         ), 0) AS BIGINT) AS tok_offset
                  FROM h)
            SELECT doc_id, n_tokens, tok_offset FROM o
            WHERE tok_offset < 10000 ORDER BY doc_id
        """,
        "ngram_counts": """
            WITH base AS (SELECT string_split(text, ' ') AS toks FROM documents),
            grams AS (
                SELECT unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1])) AS gram
                FROM base
            )
            SELECT gram, CAST(count(*) AS BIGINT) AS n FROM grams
            GROUP BY gram HAVING count(*) >= 3 ORDER BY gram
        """,
        "frequent_terms_by_lang": f"""
            WITH n AS (SELECT lang, {_NORM} AS nt FROM documents),
            tok AS (SELECT lang AS "group", unnest(string_split(nt, ' ')) AS term
                    FROM n),
            tc AS (SELECT "group", term, count(*) AS n
                   FROM tok GROUP BY "group", term),
            r AS (SELECT "group", term, CAST(n AS BIGINT) AS n,
                         row_number() OVER (PARTITION BY "group"
                             ORDER BY n DESC, term ASC) AS rank
                  FROM tc)
            SELECT "group", term, n, rank FROM r
            WHERE rank <= 5 ORDER BY "group", rank
        """,
        "normalize_text": f"""
            SELECT doc_id, {_NORM} AS norm_text FROM documents ORDER BY doc_id
        """,
        "term_cooccurrence": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tok AS (SELECT DISTINCT doc_id, term FROM
                    (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM n)),
            alltok AS (SELECT unnest(string_split(nt, ' ')) AS term FROM n),
            tc AS (SELECT term, count(*) AS c FROM alltok GROUP BY term),
            vocab AS (SELECT term FROM tc ORDER BY c DESC, term ASC LIMIT 40),
            hits AS (SELECT doc_id, term FROM tok JOIN vocab USING (term))
            SELECT a.term AS term_a, b.term AS term_b,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY 1, 2 HAVING count(*) >= 3
            ORDER BY term_a, term_b
        """,
        "fuzzy_join": f"""
            WITH
            l0 AS (SELECT doc_id AS id, {_NORM} AS nt FROM documents
                   WHERE doc_id % 2 = 0),
            r0 AS (SELECT doc_id AS id, {_NORM} AS nt FROM documents
                   WHERE doc_id % 2 = 1),
            lt AS (SELECT id, nt, string_split(nt, ' ') AS toks FROM l0),
            rt AS (SELECT id, nt, string_split(nt, ' ') AS toks FROM r0),
            lsh AS (SELECT id,
                      CASE WHEN len(toks) >= 5
                           THEN list_distinct(
                                [array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)])
                           ELSE [nt] END AS sh
                    FROM lt),
            rsh AS (SELECT id,
                      CASE WHEN len(toks) >= 5
                           THEN list_distinct(
                                [array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)])
                           ELSE [nt] END AS sh
                    FROM rt),
            lg AS (SELECT id, unnest(sh) AS gram FROM lsh),
            rg AS (SELECT id, unnest(sh) AS gram FROM rsh),
            lsz AS (SELECT id, count(*) AS sz FROM lg GROUP BY id),
            rsz AS (SELECT id, count(*) AS sz FROM rg GROUP BY id),
            inter AS (SELECT a.id AS da, b.id AS db, count(*) AS i
                      FROM lg a JOIN rg b ON a.gram = b.gram GROUP BY 1, 2)
            SELECT da AS doc_a, db AS doc_b, CAST(i AS BIGINT) AS n_shared,
                   round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter
            JOIN lsz sa ON sa.id = da
            JOIN rsz sb ON sb.id = db
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.4
            ORDER BY doc_a, doc_b
        """,
        "fuzzy_subtract": f"""
            WITH
            l0 AS (SELECT doc_id AS id, {_NORM} AS nt FROM documents
                   WHERE doc_id % 2 = 0),
            r0 AS (SELECT doc_id AS id, {_NORM} AS nt FROM documents
                   WHERE doc_id % 2 = 1),
            lt AS (SELECT id, nt, string_split(nt, ' ') AS toks FROM l0),
            rt AS (SELECT id, nt, string_split(nt, ' ') AS toks FROM r0),
            lsh AS (SELECT id,
                      CASE WHEN len(toks) >= 5
                           THEN list_distinct(
                                [array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)])
                           ELSE [nt] END AS sh
                    FROM lt),
            rsh AS (SELECT id,
                      CASE WHEN len(toks) >= 5
                           THEN list_distinct(
                                [array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)])
                           ELSE [nt] END AS sh
                    FROM rt),
            lg AS (SELECT id, unnest(sh) AS gram FROM lsh),
            rg AS (SELECT id, unnest(sh) AS gram FROM rsh),
            lsz AS (SELECT id, count(*) AS sz FROM lg GROUP BY id),
            rsz AS (SELECT id, count(*) AS sz FROM rg GROUP BY id),
            inter AS (SELECT a.id AS da, b.id AS db, count(*) AS i
                      FROM lg a JOIN rg b ON a.gram = b.gram GROUP BY 1, 2),
            m AS (SELECT DISTINCT da AS id
                  FROM inter
                  JOIN lsz sa ON sa.id = da
                  JOIN rsz sb ON sb.id = db
                  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.4)
            SELECT doc_id, text, lang, source, n_chars FROM documents
            WHERE doc_id % 2 = 0 AND doc_id NOT IN (SELECT id FROM m)
            ORDER BY doc_id
        """,
        "lm_perplexity": f"""
            WITH {_LM_SCORED_CTES}
            SELECT doc_id, n_bigrams, n_oov, sum_microbits, bits_per_bigram
            FROM lmscored ORDER BY doc_id
        """,
        "perplexity_buckets": f"""
            WITH {_LM_SCORED_CTES},
            j AS (SELECT s.doc_id, d.lang, s.bits_per_bigram
                  FROM lmscored s JOIN documents d USING (doc_id)),
            r AS (SELECT doc_id, lang, bits_per_bigram,
                         CAST(row_number() OVER w AS BIGINT) AS rank,
                         CAST(ntile(3) OVER w AS BIGINT) AS tile
                  FROM j
                  WINDOW w AS (PARTITION BY lang
                               ORDER BY bits_per_bigram, doc_id))
            SELECT doc_id, lang, bits_per_bigram, rank, tile,
                   CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM r ORDER BY doc_id
        """,
        "collocations": f"""
            WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
            tok AS (SELECT DISTINCT doc_id, term FROM
                    (SELECT doc_id, unnest(string_split(nt, ' ')) AS term FROM n)),
            alltok AS (SELECT unnest(string_split(nt, ' ')) AS term FROM n),
            tc AS (SELECT term, count(*) AS c FROM alltok GROUP BY term),
            vocab AS (SELECT term FROM tc ORDER BY c DESC, term ASC LIMIT 40),
            hits AS (SELECT doc_id, term FROM tok JOIN vocab USING (term)),
            df AS (SELECT term, count(*) AS nd FROM hits GROUP BY term),
            nn AS (SELECT count(*) AS n_total FROM documents),
            prs AS (SELECT a.term AS term_a, b.term AS term_b,
                           count(*) AS n_ab
                    FROM hits a JOIN hits b
                      ON a.doc_id = b.doc_id AND a.term < b.term
                    GROUP BY 1, 2 HAVING count(*) >= 3)
            SELECT term_a, term_b, CAST(n_ab AS BIGINT) AS n_ab,
                   round(log2(CAST(n_ab * nn.n_total AS DOUBLE)
                              / (da.nd * db.nd)), 6) AS pmi
            FROM prs
            CROSS JOIN nn
            JOIN df da ON da.term = prs.term_a
            JOIN df db ON db.term = prs.term_b
            ORDER BY term_a, term_b
        """,
        "importance_sample": """
            SELECT doc_id, n_chars,
                   least(n_chars, 2000) / 2000.0 AS weight
            FROM documents
            WHERE CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                       % 9223372036854775808 AS DOUBLE)
                  / 9223372036854775808.0
                  < least(n_chars, 2000) / 2000.0
            ORDER BY doc_id
        """,
        "epoch_shuffle": """
            SELECT doc_id,
                   CAST(row_number() OVER (
                        ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)
                                                  || ':' || '1')
                                 % 9223372036854775808,
                                 doc_id) AS BIGINT) AS pos
            FROM documents ORDER BY doc_id
        """,
        "centroid_distances": """
            WITH e AS (SELECT vec_id, label,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            u AS (SELECT vec_id, label, unnest(v) AS x,
                         generate_subscripts(v, 1) AS pos
                  FROM e),
            c AS (SELECT label, pos, avg(x) AS cx FROM u GROUP BY label, pos),
            d AS (SELECT u.vec_id, u.label,
                         sum(u.x * c.cx) AS dot,
                         sum(u.x * u.x) AS vv,
                         sum(c.cx * c.cx) AS cc
                  FROM u JOIN c USING (label, pos)
                  GROUP BY u.vec_id, u.label)
            SELECT vec_id, label,
                   round(dot / (sqrt(vv) * sqrt(cc)), 6) AS cos_centroid
            FROM d ORDER BY vec_id
        """,
        "dsir_weights": """
            WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents),
            big AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS gram FROM tk),
            bb AS (SELECT doc_id,
                          CAST(md5_number_lower(gram) % 10000 AS BIGINT)
                              AS bucket
                   FROM big),
            tb AS (SELECT bucket FROM bb JOIN documents USING (doc_id)
                   WHERE lang = 'en'),
            tc AS (SELECT bucket, count(*) AS c FROM tb GROUP BY bucket),
            qc AS (SELECT bucket, count(*) AS c FROM bb GROUP BY bucket),
            tt AS (SELECT count(*) AS n FROM tb),
            qt AS (SELECT count(*) AS n FROM bb),
            r AS (SELECT qc.bucket,
                         ln((COALESCE(tc.c, 0) + 1.0) / (tt.n + 10000))
                       - ln((qc.c + 1.0) / (qt.n + 10000)) AS lr
                  FROM qc CROSS JOIN tt CROSS JOIN qt
                  LEFT JOIN tc ON tc.bucket = qc.bucket),
            s AS (SELECT bb.doc_id, count(*) AS n_grams, sum(lr) AS lw
                  FROM bb JOIN r USING (bucket) GROUP BY doc_id)
            SELECT d.doc_id, COALESCE(s.n_grams, 0) AS n_grams,
                   round(COALESCE(s.lw, 0.0), 6) AS log_weight
            FROM documents d LEFT JOIN s USING (doc_id)
            ORDER BY d.doc_id
        """,
        "nb_classify": """
            WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
                        FROM documents),
            big AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                        i -> toks[i] || ' ' || toks[i+1])) AS gram FROM tk),
            bb AS (SELECT doc_id,
                          CAST(md5_number_lower(gram) % 10000 AS BIGINT)
                              AS bucket
                   FROM big),
            cls AS (SELECT lang AS label, count(*) AS n_docs
                    FROM documents GROUP BY 1),
            tot AS (SELECT count(*) AS n FROM documents),
            cb AS (SELECT d.lang AS label, bb.bucket, count(*) AS c
                   FROM bb JOIN documents d USING (doc_id) GROUP BY 1, 2),
            ctot AS (SELECT label, CAST(sum(c) AS BIGINT) AS tc
                     FROM cb GROUP BY 1),
            prior AS (SELECT cls.label, COALESCE(ctot.tc, 0) AS tc,
                             CAST(floor(ln(CAST(cls.n_docs AS DOUBLE) / tot.n)
                                        * 1e6 + 0.5) AS BIGINT) AS pm
                      FROM cls LEFT JOIN ctot USING (label) CROSS JOIN tot),
            gsc AS (SELECT bb.doc_id, p.label,
                           CAST(floor(ln((COALESCE(cb.c, 0) + 1.0)
                                         / (p.tc + 10000)) * 1e6 + 0.5)
                                AS BIGINT) AS mlp
                    FROM bb CROSS JOIN prior p
                    LEFT JOIN cb ON cb.label = p.label
                                AND cb.bucket = bb.bucket),
            ds AS (SELECT doc_id, label, CAST(sum(mlp) AS BIGINT) AS gs
                   FROM gsc GROUP BY 1, 2),
            alldc AS (SELECT d.doc_id, p.label,
                             p.pm + COALESCE(ds.gs, 0) AS score
                      FROM documents d CROSS JOIN prior p
                      LEFT JOIN ds ON ds.doc_id = d.doc_id
                                  AND ds.label = p.label),
            r AS (SELECT doc_id, label, score,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY score DESC, label ASC)
                             AS rn
                  FROM alldc)
            SELECT a.doc_id, a.label AS pred_label, a.score AS score_micro,
                   a.score - COALESCE(b.score, a.score) AS margin_micro
            FROM r a LEFT JOIN r b ON b.doc_id = a.doc_id AND b.rn = 2
            WHERE a.rn = 1 ORDER BY a.doc_id
        """,
        "url_canon": f"""
            WITH {_URLS_SQL},
            c AS (SELECT doc_id, {_CANON_SQL} AS canon_url FROM u)
            SELECT doc_id, canon_url,
                   regexp_replace(canon_url, '/.*$', '') AS domain
            FROM c ORDER BY doc_id
        """,
        "url_dedup": f"""
            WITH {_URLS_SQL},
            c AS (SELECT doc_id, {_CANON_SQL} AS canon_url FROM u)
            SELECT doc_id, canon_url,
                   min(doc_id) OVER (PARTITION BY canon_url) AS keeper_id,
                   count(*) OVER (PARTITION BY canon_url) AS n_same_url
            FROM c ORDER BY doc_id
        """,
        "domain_filter": f"""
            WITH {_URLS_SQL},
            c AS (SELECT u.doc_id,
                         regexp_replace({_CANON_SQL}, '/.*$', '') AS domain,
                         d.n_chars
                  FROM u JOIN documents d USING (doc_id)),
            g AS (SELECT domain FROM c GROUP BY domain
                  HAVING sum(n_chars) >= 290 * count(*))
            SELECT c.doc_id, c.domain, c.n_chars
            FROM c JOIN g USING (domain)
            WHERE c.domain <> 'src1.example'
            ORDER BY c.doc_id
        """,
        "crawl_curate": f"""
            WITH {_urls_sql(350)},
            c AS (SELECT u.doc_id, u.text, {_CANON_SQL} AS canon_url, d.n_chars
                  FROM u JOIN documents d USING (doc_id)),
            c2 AS (SELECT *, regexp_replace(canon_url, '/.*$', '') AS domain FROM c),
            s1 AS (SELECT * FROM c2
                   QUALIFY doc_id = min(doc_id) OVER (PARTITION BY canon_url)),
            g AS (SELECT domain FROM s1 GROUP BY domain
                  HAVING sum(n_chars) >= 290 * count(*)),
            s2 AS (SELECT s1.* FROM s1 JOIN g USING (domain)
                   WHERE s1.domain <> 'src1.example'),
            n AS (SELECT doc_id, {_NORM} AS nt FROM s2),
            bad AS (SELECT DISTINCT doc_id FROM
                    (SELECT doc_id, unnest(string_split(nt, ' ')) AS tk FROM n)
                    WHERE tk IN ('dup'))
            SELECT s2.doc_id, s2.canon_url, s2.domain, s2.n_chars
            FROM s2 LEFT JOIN bad USING (doc_id)
            WHERE bad.doc_id IS NULL ORDER BY s2.doc_id
        """,
        "domain_stats": f"""
            WITH {_URLS_SQL},
            c AS (SELECT doc_id, text,
                         regexp_replace({_CANON_SQL}, '/.*$', '') AS domain
                  FROM u),
            n AS (SELECT domain, {_NORM} AS nt FROM c),
            s AS (SELECT domain, count(*) AS n_docs,
                         CAST(sum(CASE WHEN length(nt) = 0 THEN 0
                                       ELSE length(nt)
                                            - length(replace(nt, ' ', '')) + 1
                                  END) AS BIGINT) AS n_tokens
                  FROM n GROUP BY domain),
            t AS (SELECT sum(n_docs) AS tot FROM s)
            SELECT domain, n_docs, n_tokens,
                   round(n_docs / tot, 6) AS doc_share
            FROM s CROSS JOIN t ORDER BY domain
        """,
        # NOTE (media_features / media_cosine_pairs): ascii(substring(...))
        # enumerates CODEPOINTS and n_bytes counts octets — equal only for
        # pure-ASCII fixture text.  _assert_ascii_texts() in both query fns
        # enforces that invariant at run time (ADVICE r4).
        "media_features": """
            WITH m AS (SELECT doc_id AS media_id,
                              CASE CAST(doc_id % 3 AS INTEGER)
                                   WHEN 0 THEN 'image'
                                   WHEN 1 THEN 'audio'
                                   ELSE 'video' END AS kind,
                              text,
                              CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)
                                  AS n_bytes
                       FROM documents),
            b AS (SELECT media_id,
                         ascii(substring(text, CAST(i AS INTEGER), 1)) AS byte
                  FROM (SELECT media_id, text,
                               unnest(range(1, length(text) + 1)) AS i
                        FROM m)),
            c AS (SELECT media_id, byte, count(*) AS c
                  FROM b GROUP BY media_id, byte),
            e AS (SELECT c.media_id,
                         -sum((c.c * 1.0 / m.n_bytes)
                              * log2(c.c * 1.0 / m.n_bytes)) AS ent
                  FROM c JOIN m USING (media_id)
                  GROUP BY c.media_id)
            SELECT m.media_id, m.kind, m.n_bytes,
                   round(COALESCE(e.ent, 0.0), 6) AS byte_entropy
            FROM m LEFT JOIN e USING (media_id)
            ORDER BY m.media_id
        """,
        "media_cosine_pairs": """
            WITH m AS (SELECT doc_id AS media_id, text,
                              CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)
                                  AS n_bytes
                       FROM documents
                       WHERE octet_length(CAST(text AS BLOB)) > 0),
            b AS (SELECT media_id,
                         ascii(substring(text, CAST(i AS INTEGER), 1)) AS byte
                  FROM (SELECT media_id, text,
                               unnest(range(1, length(text) + 1)) AS i
                        FROM m)),
            c AS (SELECT b.media_id, b.byte,
                         count(*) * 1.0 / m.n_bytes AS p
                  FROM b JOIN m USING (media_id)
                  GROUP BY b.media_id, b.byte, m.n_bytes),
            nrm AS (SELECT media_id, sqrt(sum(p * p)) AS nn
                    FROM c GROUP BY media_id),
            dot AS (SELECT a.media_id AS vec_a, b.media_id AS vec_b,
                           sum(a.p * b.p) AS d
                    FROM c a JOIN c b
                      ON a.byte = b.byte AND a.media_id < b.media_id
                    GROUP BY 1, 2),
            cos AS (SELECT dot.vec_a, dot.vec_b,
                           dot.d / (na.nn * nb.nn) AS cosine
                    FROM dot
                    JOIN nrm na ON na.media_id = dot.vec_a
                    JOIN nrm nb ON nb.media_id = dot.vec_b)
            SELECT vec_a, vec_b, round(cosine, 6) AS cosine
            FROM cos WHERE cosine >= 0.995
            ORDER BY vec_a, vec_b
        """,
        "weighted_sample": """
            WITH k AS (
                SELECT doc_id, n_chars,
                       least(n_chars, 2000) / 2000.0 AS weight,
                       CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                            % 9223372036854775808 AS DOUBLE)
                           / 9223372036854775808.0 AS u
                FROM documents),
            s AS (SELECT doc_id, n_chars, weight, ln(u) / weight AS skey
                  FROM k WHERE weight > 0 AND u > 0),
            top AS (SELECT * FROM s ORDER BY skey DESC, doc_id LIMIT 50),
            r AS (SELECT *, CAST(row_number() OVER (
                                ORDER BY skey DESC, doc_id) AS BIGINT) AS rank
                  FROM top)
            SELECT doc_id, n_chars, round(weight, 6) AS weight,
                   round(skey, 6) AS skey, rank
            FROM r ORDER BY doc_id
        """,
        "weighted_sample_per_group": """
            WITH k AS (
                SELECT doc_id, source, n_chars,
                       least(n_chars, 2000) / 2000.0 AS weight,
                       CAST(md5_number_lower(CAST(doc_id AS VARCHAR))
                            % 9223372036854775808 AS DOUBLE)
                           / 9223372036854775808.0 AS u
                FROM documents),
            s AS (SELECT doc_id, source, n_chars, weight,
                         ln(u) / weight AS skey
                  FROM k WHERE weight > 0 AND u > 0),
            r AS (SELECT *, CAST(row_number() OVER (
                                PARTITION BY source
                                ORDER BY skey DESC, doc_id) AS BIGINT) AS rank
                  FROM s)
            SELECT doc_id, source, n_chars, round(weight, 6) AS weight,
                   round(skey, 6) AS skey, rank
            FROM r WHERE rank <= 3 ORDER BY doc_id
        """,
        "kmeans": f"""
            WITH {_KMEANS_CTES}
            SELECT vec_id, CAST(label AS INTEGER) AS label_km,
                   round(sqrt(greatest(d2, 0)), 6) AS dist
            FROM fin WHERE rn = 1 ORDER BY vec_id
        """,
        "semdedup_kmeans": f"""
            WITH {_KMEANS_CTES},
            asn AS (SELECT vec_id, CAST(label AS BIGINT) AS label
                    FROM fin WHERE rn = 1),
            e2 AS (SELECT e.vec_id, asn.label, e.v
                   FROM e JOIN asn USING (vec_id)),
            u2 AS (SELECT vec_id, label, unnest(v) AS x,
                          generate_subscripts(v, 1) AS pos
                   FROM e2),
            cm AS (SELECT label, pos, avg(x) AS cx
                   FROM u2 GROUP BY label, pos),
            dm AS (SELECT u2.vec_id, u2.label,
                          sum(u2.x * cm.cx) AS dot,
                          sum(u2.x * u2.x) AS vv,
                          sum(cm.cx * cm.cx) AS cc
                   FROM u2 JOIN cm USING (label, pos)
                   GROUP BY u2.vec_id, u2.label),
            cd AS (SELECT vec_id, label, dot / (sqrt(vv) * sqrt(cc)) AS cosc
                   FROM dm),
            dup AS (SELECT DISTINCT i.vec_id
                    FROM cd i
                    JOIN cd j ON i.label = j.label AND i.vec_id <> j.vec_id
                    JOIN e2 ei ON ei.vec_id = i.vec_id
                    JOIN e2 ej ON ej.vec_id = j.vec_id
                    WHERE list_cosine_similarity(ei.v, ej.v) >= 0.3
                      AND (j.cosc < i.cosc
                           OR (j.cosc = i.cosc AND j.vec_id < i.vec_id)))
            SELECT cd.vec_id, cd.label AS label_km,
                   round(cd.cosc, 6) AS cos_centroid,
                   CAST(CASE WHEN dup.vec_id IS NULL THEN 0 ELSE 1 END
                        AS INTEGER) AS is_dup
            FROM cd LEFT JOIN dup ON dup.vec_id = cd.vec_id
            ORDER BY cd.vec_id
        """,
        "semdedup": """
            WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                              CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings),
            u AS (SELECT vec_id, label, unnest(v) AS x,
                         generate_subscripts(v, 1) AS pos
                  FROM e),
            c AS (SELECT label, pos, avg(x) AS cx FROM u GROUP BY label, pos),
            d AS (SELECT u.vec_id, u.label,
                         sum(u.x * c.cx) AS dot,
                         sum(u.x * u.x) AS vv,
                         sum(c.cx * c.cx) AS cc
                  FROM u JOIN c USING (label, pos)
                  GROUP BY u.vec_id, u.label),
            cd AS (SELECT vec_id, label, dot / (sqrt(vv) * sqrt(cc)) AS cosc
                   FROM d),
            dup AS (SELECT DISTINCT i.vec_id
                    FROM cd i
                    JOIN cd j ON i.label = j.label AND i.vec_id <> j.vec_id
                    JOIN e ei ON ei.vec_id = i.vec_id
                    JOIN e ej ON ej.vec_id = j.vec_id
                    WHERE list_cosine_similarity(ei.v, ej.v) >= 0.3
                      AND (j.cosc < i.cosc
                           OR (j.cosc = i.cosc AND j.vec_id < i.vec_id)))
            SELECT cd.vec_id, cd.label, round(cd.cosc, 6) AS cos_centroid,
                   CAST(CASE WHEN dup.vec_id IS NULL THEN 0 ELSE 1 END
                        AS INTEGER) AS is_dup
            FROM cd LEFT JOIN dup ON dup.vec_id = cd.vec_id
            ORDER BY cd.vec_id
        """,
        "graph_pagerank": _PAGERANK_SQL,
        "graph_components": f"""
            WITH RECURSIVE
            edges_ AS (SELECT doc_id AS da, (doc_id // 7) * 7 AS db FROM documents),
            nodes_ AS (SELECT da AS id FROM edges_ UNION SELECT db FROM edges_),
            {_CC_SQL}
            SELECT nd AS node, cid AS component_id FROM labels_ ORDER BY node
        """,
        "knn_graph": """
            WITH s AS (
                SELECT a.vec_id AS query_id, b.vec_id AS vec_id,
                       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                              CAST(b.embedding AS DOUBLE[])) AS c
                FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
            ),
            r AS (
                SELECT query_id, vec_id, c,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY c DESC, vec_id) AS rank
                FROM s
            )
            SELECT query_id, vec_id, round(c, 6) AS cosine, rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "hash_split": """
            WITH b AS (SELECT doc_id,
                   CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000
                        AS BIGINT) AS bucket
                 FROM documents)
            SELECT doc_id, bucket,
                   CASE WHEN bucket < 9000 THEN 'train'
                        WHEN bucket < 9500 THEN 'val'
                        ELSE 'test' END AS split
            FROM b ORDER BY doc_id
        """,
        "resample_mixture": """
            WITH r AS (SELECT doc_id, source,
                   CAST(row_number() OVER (
                        PARTITION BY source
                        ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR))
                                 % 9223372036854775808,
                                 doc_id) AS BIGINT) AS rank
                 FROM documents)
            SELECT doc_id, source, rank FROM r
            WHERE (source = 'src0' AND rank <= 20)
               OR (source = 'src1' AND rank <= 12)
               OR (source = 'src2' AND rank <= 8)
            ORDER BY doc_id
        """,
        "gopher_quality": f"""
            WITH {_gopher_metrics_ctes()}
            SELECT doc_id, n_words, mean_word_len, symbol_ratio,
                   alpha_word_ratio, n_stop,
                   CASE WHEN {_GOPHER_KEEP} THEN 1 ELSE 0 END AS keep
            FROM gqm ORDER BY doc_id
        """,
        "curate_corpus": f"""
            WITH {_gopher_metrics_ctes()},
            kept AS (SELECT doc_id FROM gqm WHERE {_GOPHER_KEEP}),
            surv AS (SELECT d.doc_id, d.text, d.lang
                     FROM documents d JOIN kept USING (doc_id)
                     QUALIFY row_number() OVER (PARTITION BY d.text
                                                ORDER BY d.doc_id) = 1),
            {_lm_scored_ctes("surv")},
            j AS (SELECT s.doc_id, v.lang, s.bits_per_bigram
                  FROM lmscored s JOIN surv v USING (doc_id)),
            r AS (SELECT doc_id, lang, bits_per_bigram,
                         CAST(row_number() OVER w AS BIGINT) AS rank,
                         CAST(ntile(3) OVER w AS BIGINT) AS tile
                  FROM j
                  WINDOW w AS (PARTITION BY lang
                               ORDER BY bits_per_bigram, doc_id))
            SELECT doc_id, lang, bits_per_bigram, rank, tile,
                   CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM r WHERE tile <= 2 ORDER BY doc_id
        """,
        "winsorize": """
            WITH b AS (SELECT lang,
                              quantile_disc(n_chars, 0.01) AS lo,
                              quantile_disc(n_chars, 0.99) AS hi
                       FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang, d.n_chars,
                   CAST(least(greatest(d.n_chars, b.lo), b.hi) AS BIGINT)
                       AS n_chars_w
            FROM documents d JOIN b USING (lang) ORDER BY d.doc_id
        """,
        "histogram": """
            WITH b AS (SELECT lang,
                              LEAST((LEAST(GREATEST(CAST(n_chars AS BIGINT), 0),
                                           600) - 0) * 12 // 600, 11) AS bin
                       FROM documents)
            SELECT lang, CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n
            FROM b GROUP BY lang, bin ORDER BY lang, bin
        """,
        # mirrors extras/retrieval.py's pinned float64 operation order
        # parenthesis-for-parenthesis (see that module's docstring)
        "bm25_topk": """
            WITH q(term) AS (SELECT unnest(['dup', 'spark', 'vector'])),
            stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                                 AS n_tokens
                      FROM documents),
            dl AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                   FROM documents),
            tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
                   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                         FROM documents)
                   WHERE tok IN (SELECT term FROM q) GROUP BY 1, 2),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
            idf AS (SELECT q.term,
                      CAST(floor(log2((2.0*(s.n_docs - coalesce(df.df, 0)) + 1.0)
                                      / (2.0*coalesce(df.df, 0) + 1.0))
                                 * 1000000 + 0.5) AS BIGINT) AS idf_micro
                    FROM q LEFT JOIN df USING (term) CROSS JOIN stats s),
            contrib AS (SELECT tf.doc_id,
                 CAST(floor(idf.idf_micro * (((22.0*tf.tf) * s.n_tokens)
                      / (((10.0*tf.tf) * s.n_tokens + 3.0*s.n_tokens)
                         + (9.0*dl.dl) * s.n_docs)) + 0.5) AS BIGINT) AS c
                 FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
                 CROSS JOIN stats s),
            scores AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS score_micro
                       FROM contrib GROUP BY doc_id)
            SELECT doc_id, score_micro FROM scores
            ORDER BY score_micro DESC, doc_id LIMIT 10
        """,
        # mirrors extras/retrieval.py's pinned float64 operation order;
        # df/idf are over the UNION of all query terms (operator contract)
        "bm25_join": """
            WITH q AS (SELECT * FROM (VALUES (1, 'dup spark'),
                                             (2, 'vector window table'))
                       AS t(query_id, qtext)),
            qt AS (SELECT DISTINCT query_id,
                          unnest(string_split(qtext, ' ')) AS term FROM q),
            terms AS (SELECT DISTINCT term FROM qt),
            stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                                 AS n_tokens
                      FROM documents),
            dl AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                   FROM documents),
            tf AS (SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
                   FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                         FROM documents)
                   WHERE tok IN (SELECT term FROM terms) GROUP BY 1, 2),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
            idf AS (SELECT terms.term,
                      CAST(floor(log2((2.0*(s.n_docs - coalesce(df.df, 0)) + 1.0)
                                      / (2.0*coalesce(df.df, 0) + 1.0))
                                 * 1000000 + 0.5) AS BIGINT) AS idf_micro
                    FROM terms LEFT JOIN df USING (term) CROSS JOIN stats s),
            contrib AS (SELECT tf.doc_id, tf.term,
                 CAST(floor(idf.idf_micro * (((22.0*tf.tf) * s.n_tokens)
                      / (((10.0*tf.tf) * s.n_tokens + 3.0*s.n_tokens)
                         + (9.0*dl.dl) * s.n_docs)) + 0.5) AS BIGINT) AS c
                 FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
                 CROSS JOIN stats s),
            perq AS (SELECT qt.query_id, c.doc_id,
                            CAST(sum(c.c) AS BIGINT) AS score_micro
                     FROM contrib c JOIN qt USING (term) GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id) AS rn
                  FROM perq)
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_micro,
                   CAST(rn AS BIGINT) AS rank
            FROM r WHERE rn <= 5 ORDER BY query_id, rank
        """,
    }


def _lang_id_sql() -> str:
    from image_deduplication_3m_images_ray.extras.textstats import stopword_sql_values

    return f"""
        WITH n AS (SELECT doc_id, {_NORM} AS nt FROM documents),
        tok AS (SELECT doc_id, unnest(string_split(nt, ' ')) AS tk FROM n),
        ntok AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY doc_id),
        sw(lang, w) AS (VALUES {stopword_sql_values()}),
        hit AS (
            SELECT t.doc_id, s.lang, count(*) AS hits
            FROM tok t JOIN sw s ON t.tk = s.w
            GROUP BY t.doc_id, s.lang
        ),
        best AS (
            SELECT doc_id, lang, hits,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY hits DESC, lang ASC) AS rn
            FROM hit
        ),
        b1 AS (SELECT doc_id, lang, hits FROM best WHERE rn = 1)
        SELECT ntok.doc_id,
               CASE WHEN b1.hits IS NULL OR b1.hits * 20 < ntok.n_tokens
                    THEN 'und' ELSE b1.lang END AS pred_lang,
               COALESCE(b1.hits, 0) AS n_hits,
               ntok.n_tokens
        FROM ntok LEFT JOIN b1 USING (doc_id)
        ORDER BY doc_id
    """

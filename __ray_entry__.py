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


def _q_quality_scores(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.textstats import quality_scores

    return quality_scores(_docs(sf_dir).select_columns(["doc_id", "text"])).sort("doc_id")


def _q_char_jaccard_pairs(sf_dir: str):
    from image_deduplication_3m_images_ray.extras.dedup_ops import char_jaccard_pairs

    return char_jaccard_pairs(
        _docs(sf_dir).select_columns(["doc_id", "text", "lang"]), threshold=0.5
    ).sort(["doc_a", "doc_b"])


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

    return suffix_array_pairs_stage(
        _docs(sf_dir).select_columns(["doc_id", "text"]), DedupConfig()
    ).sort(["doc_a", "doc_b"])


def _q_dedup_report(sf_dir: str):
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline
    from image_deduplication_3m_images_ray.sources import documents_as_pages

    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    return dedup_pipeline(documents_as_pages(sf_dir), cfg).sort("url")


def _q_window_agg(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.windows import tumbling_window_agg

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )
    return tumbling_window_agg(events, window_sec=3600).sort(["event_type", "window_start"])


def _q_sessions(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.windows import sessionize

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return sessionize(events, gap_sec=1800).sort(["user_id", "session_id"])


def _q_media_decode(sf_dir: str):
    import ray.data

    from image_deduplication_3m_images_ray.extras.multimodal import (
        decode_stage,
        make_fake_media,
    )

    media = ray.data.from_arrow(make_fake_media(64, seed=42))
    return decode_stage(media, fake=True, concurrency=2).sort("media_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "exact_dedup": _q_exact_dedup,
        "exact_dedup_survivors": _q_exact_dedup_survivors,
        "token_stats": _q_token_stats,
        "quality_scores": _q_quality_scores,
        "char_jaccard_pairs": _q_char_jaccard_pairs,
        "lang_counts": _q_lang_counts,
        "top_docs": _q_top_docs,
        "distinct_sources": _q_distinct_sources,
        "filter_en_long": _q_filter_en_long,
        "embedding_cosine_pairs": _q_embedding_cosine_pairs,
        "ann_topk": _q_ann_topk,
        "minhash_lsh_clusters": _q_minhash_lsh_clusters,
        "simhash_pairs": _q_simhash_pairs,
        "lang_id": _q_lang_id,
        "doc_fingerprints": _q_doc_fingerprints,
        "suffix_pairs": _q_suffix_pairs,
        "dedup_report": _q_dedup_report,
        "window_agg": _q_window_agg,
        "sessions": _q_sessions,
        "media_decode": _q_media_decode,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB; views named after the parquet files)
# ---------------------------------------------------------------------------

# matches functions.text.normalize_array exactly: NFC, then lower, then
# whitespace collapse, then trim
_NORM = "trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))"


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
        "window_agg": """
            SELECT event_type,
                   (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events
            GROUP BY event_type, window_start
            ORDER BY event_type, window_start
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
        # minhash_lsh_clusters / simhash_pairs / lang_id / doc_fingerprints /
        # suffix_pairs / dedup_report / media_decode: hash-seeded or
        # model-style operators with no ANSI-SQL equivalent -> rows-only check.
    }

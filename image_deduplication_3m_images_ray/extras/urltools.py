"""URL canonicalization, URL-key dedup and domain-mix statistics.

The cheapest, highest-yield dedup stage in a web-crawl pipeline runs BEFORE
any content is fetched or compared: collapse recrawls of the same page by a
canonical URL key (RefinedWeb's stage-1 "URL deduplication"; CommonCrawl
curation does the same).  Three operators:

- :func:`canonicalize_urls` — the key normalizer, a stateless vectorized
  RE2 scan (no exchange): lowercase, strip scheme / leading ``www.``, drop
  query + fragment, strip trailing slashes; also emits the registrable
  ``domain`` (host part).  This builds a DEDUP KEY — it does not claim the
  lowercased path is the same resource, which is why the original URL column
  passes through untouched.
- :func:`url_dedup` — keep-min-id per canonical key.  One hash-partitioned
  exchange on a 64-bit key hash (the :func:`dedup_ops.exact_dedup_clusters`
  shape), with groups split by the ACTUAL key string inside the group fn, so
  hash collisions can never merge two URLs.
- :func:`domain_stats` — the domain-mix diagnostic (docs / tokens / corpus
  share per domain) used to spot domain skew before training (Gopher §A2.1
  reports exactly this table).  Per-batch ``np.unique`` combiner partials →
  one SMALL groupby on domain; the final share assembly touches one row per
  domain on the driver (bounded by design — web corpora have ~1e7 domains,
  24 B/row).

Reference analog: the reference keys its blobs by path and skips
already-seen paths before download (SURVEY.md S1/M4); these operators are
that idea as first-class relational stages.  All RE2 patterns are shared
with the DuckDB oracle verbatim, so every operator is exactly SQL-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

__all__ = ["CANON_RULES", "canonical_url_array", "canonicalize_urls",
           "url_dedup", "domain_stats", "domain_filter"]

# (pattern, replacement) applied IN ORDER to the lowercased URL.  RE2 on both
# engines (pyarrow and DuckDB), and the oracle nests its regexp_replace calls
# in the same order, so the key agrees bit-for-bit.
CANON_RULES: tuple[tuple[str, str], ...] = (
    (r"^https?://", ""),   # scheme
    (r"^www\.", ""),       # canonical host alias
    (r"[?#].*$", ""),      # query string + fragment (aggressive by design)
    (r"/+$", ""),          # trailing slashes
)


def canonical_url_array(url_col) -> pa.Array:
    """The canonical-key kernel: lowercased URL through :data:`CANON_RULES`.

    Null URLs canonicalize to ``''`` (they still need a well-defined dedup
    key; SQL mirrors with COALESCE)."""
    arr = url_col.combine_chunks() if isinstance(url_col, pa.ChunkedArray) else url_col
    cur = pc.utf8_lower(pc.fill_null(arr, ""))
    for pat, repl in CANON_RULES:
        cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
    return cur


def _domain_array(canon: pa.Array) -> pa.Array:
    """Host part of a canonical key (everything before the first ``/``)."""
    return pc.replace_substring_regex(canon, pattern=r"/.*$", replacement="")


def canonicalize_urls(
    docs: Dataset, url_col: str = "url", id_col: str = "doc_id",
    batch_size: int = 8192,
) -> Dataset:
    """(id, url) -> (id, canon_url, domain) — stateless scan, no exchange."""

    def fn(t: pa.Table) -> pa.Table:
        canon = canonical_url_array(t[url_col])
        return pa.table(
            {id_col: t[id_col], "canon_url": canon, "domain": _domain_array(canon)}
        )

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def url_dedup(
    docs: Dataset, url_col: str = "url", id_col: str = "doc_id",
    num_shards: int = 64, batch_size: int = 8192,
) -> Dataset:
    """Keep-min-``id_col`` per canonical URL key.

    Output: one row per INPUT row — (id_col, canon_url, keeper_id,
    n_same_url); survivors are the rows with ``id == keeper_id`` (the
    composable cluster shape of :func:`dedup_ops.exact_dedup_clusters`, so
    callers can either filter survivors or audit the collapse rate).

    Scale shape: canonicalization is map-side; the ONE exchange ships
    (id, canon_url) hash-partitioned on a 64-bit key hash — group splits
    compare the actual key string, so collisions never merge."""
    import pandas as pd

    from ..functions.hashing import U64, splitmix64
    from ..util import sharded_group_map

    def add_key(t: pa.Table) -> pa.Table:
        canon = canonical_url_array(t[url_col])
        keys = np.asarray(canon.to_pylist(), dtype=object)
        h = splitmix64(pd.util.hash_array(keys).astype(U64))
        return pa.table(
            {
                id_col: t[id_col],
                "canon_url": canon,
                "__kh": pa.array(h, pa.uint64()),
            }
        )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(["__kh", "canon_url"], sort=False)[id_col]
        out = g[[id_col, "canon_url"]].copy()
        out["keeper_id"] = grp.transform("min").astype(np.int64)
        out["n_same_url"] = grp.transform("size").astype(np.int64)
        return out

    keyed = docs.map_batches(
        add_key, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return sharded_group_map(
        keyed, ["__kh"], first, num_shards=num_shards, batch_format="pandas"
    )


def domain_stats(
    docs: Dataset, url_col: str = "url", id_col: str = "doc_id",
    text_col: str = "text", batch_size: int = 8192,
) -> "pa.Table":
    """Domain-mix table: (domain, n_docs, n_tokens, doc_share) per domain.

    ``n_tokens`` follows the ``token_stats`` normalized-whitespace contract
    (so the SQL oracle is bit-exact); ``doc_share`` = n_docs / corpus docs,
    rounded to 6 dp.  Per-batch combiner folds each block to one row per
    domain IT saw (np.unique + np.add.at) → one small domain groupby → the
    share division happens on the per-domain result (driver-side, bounded:
    one 24 B row per distinct domain).  Returns an in-memory
    ``pyarrow.Table`` sorted by domain — the result IS driver-small.
    """
    from ..functions.text import normalize_array

    def partial(t: pa.Table) -> pa.Table:
        dom = _domain_array(canonical_url_array(t[url_col]))
        norm = normalize_array(pc.fill_null(t[text_col], ""))
        n_chars = np.asarray(
            pc.utf8_length(norm).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        n_spaces = np.asarray(
            pc.count_substring(norm, " ").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        toks = np.where(n_chars == 0, 0, n_spaces + 1).astype(np.int64)
        keys = np.asarray(dom.to_pylist(), dtype=object)
        uk, inv = np.unique(keys, return_inverse=True)
        nd = np.zeros(len(uk), np.int64)
        nt = np.zeros(len(uk), np.int64)
        np.add.at(nd, inv, 1)
        np.add.at(nt, inv, toks)
        return pa.table(
            {
                "domain": pa.array(list(uk), pa.string()),
                "n_docs": pa.array(nd, pa.int64()),
                "n_tokens": pa.array(nt, pa.int64()),
            }
        )

    grouped = (
        docs.map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size,
            zero_copy_batch=True,
        )
        .groupby("domain")
        .sum(["n_docs", "n_tokens"])
    )
    small = grouped.to_pandas()  # one row per domain — bounded by design
    small = small.rename(
        columns={"sum(n_docs)": "n_docs", "sum(n_tokens)": "n_tokens"}
    )
    total = int(small["n_docs"].sum())
    small["doc_share"] = np.round(small["n_docs"] / total, 6) if total else 0.0
    small = small.sort_values("domain").reset_index(drop=True)
    return pa.Table.from_pandas(small, preserve_index=False)


def domain_filter(
    docs: Dataset,
    min_mean_value: int,
    value_col: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocklist: "list[str] | None" = None,
    broadcast_max_domains: int = 20_000_000,
    batch_size: int = 8192,
    keep_all: bool = False,
) -> Dataset:
    """Host-level quality gating (RefinedWeb/UT1-style): drop every doc whose
    domain either appears in ``blocklist`` or has a corpus-wide MEAN of
    ``value_col`` below ``min_mean_value``.

    ``keep_all=True`` passes every input column through (plus ``domain``)
    instead of the (id, domain, value) projection — the composition form.

    The mean gate is evaluated in INTEGER arithmetic — keep iff
    ``sum(value) >= min_mean_value * count`` over int64 sums — so the engine
    and the SQL oracle agree bit-for-bit with no float-mean boundary risk
    (``value_col`` is cast to int64; ``min_mean_value`` must be an int).

    Output: the surviving rows as (id_col, domain, value_col), one per kept
    doc.  Scale shape: one per-block (domain, sum, n) combiner scan folded by
    a small domain groupby (one 24 B row per distinct domain — the
    ``domain_stats`` bound, ~1e7 domains on the open web); the drop set is
    broadcast once as an Arrow value_set for a vectorized ``is_in`` filter
    scan.  ``broadcast_max_domains`` gates the driver-resident domain table
    with an explicit raise.
    """
    import ray

    if int(min_mean_value) != min_mean_value:
        raise ValueError("min_mean_value must be an integer (integer-exact gate)")

    def partial(t: pa.Table) -> pa.Table:
        dom = _domain_array(canonical_url_array(t[url_col]))
        val = np.asarray(
            t[value_col].cast(pa.int64()).to_numpy(zero_copy_only=False), dtype=np.int64
        )
        keys = np.asarray(dom.to_pylist(), dtype=object)
        uk, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        n = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, val)
        np.add.at(n, inv, 1)
        return pa.table(
            {
                "domain": pa.array(list(uk), pa.string()),
                "s": pa.array(s, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    grouped = (
        docs.map_batches(
            partial, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
        )
        .groupby("domain")
        .sum(["s", "n"])
    )
    per_domain = grouped.to_pandas()  # one row per domain — bounded by design
    if len(per_domain) > broadcast_max_domains:
        raise ValueError(
            f"distinct domains ({len(per_domain)}) exceed broadcast_max_domains "
            f"({broadcast_max_domains}); raise the bound (24 B/domain) or shard"
        )
    bad = set(
        per_domain.loc[
            per_domain["sum(s)"] < int(min_mean_value) * per_domain["sum(n)"], "domain"
        ]
    )
    bad.update(blocklist or ())
    bad_ref = ray.put(pa.array(sorted(bad), pa.string()))

    def keep(t: pa.Table) -> pa.Table:
        dom = _domain_array(canonical_url_array(t[url_col]))
        mask = pc.invert(pc.is_in(dom, value_set=ray.get(bad_ref)))
        if keep_all:
            return t.append_column("domain", dom).filter(mask)
        out = pa.table(
            {
                id_col: t[id_col],
                "domain": dom,
                value_col: t[value_col].cast(pa.int64())
                if not isinstance(t[value_col], pa.ChunkedArray)
                else t[value_col].combine_chunks().cast(pa.int64()),
            }
        )
        return out.filter(mask)

    return docs.map_batches(
        keep, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def url_dedup_keep_first_rows(
    docs: Dataset, url_col: str = "url", id_col: str = "doc_id",
    num_shards: int = 64, batch_size: int = 8192,
) -> Dataset:
    """Keep-min-``id_col`` per canonical URL key, passing ALL input columns
    through (plus ``canon_url``) — the survivor-rows form of
    :func:`url_dedup`, for compositions that keep processing the winners
    (mirrors :func:`dedup_ops.exact_dedup_keep_first_rows` vs the cluster
    form).  One hash-partitioned exchange that ships the full row once;
    groups compare the actual key string, so hash collisions never merge."""
    import pandas as pd

    from ..functions.hashing import U64, splitmix64
    from ..util import sharded_group_map

    def add_key(t: pa.Table) -> pa.Table:
        canon = canonical_url_array(t[url_col])
        keys = np.asarray(canon.to_pylist(), dtype=object)
        h = splitmix64(pd.util.hash_array(keys).astype(U64))
        return t.append_column("canon_url", canon).append_column(
            "__kh", pa.array(h, pa.uint64())
        )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        keep = g[id_col] == g.groupby(["__kh", "canon_url"], sort=False)[id_col].transform("min")
        return g.loc[keep].drop(columns="__kh")

    keyed = docs.map_batches(
        add_key, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )
    return sharded_group_map(
        keyed, ["__kh"], first, num_shards=num_shards, batch_format="pandas"
    )


def crawl_curate(
    docs: Dataset,
    badwords: "list[str]",
    min_mean_value: int,
    value_col: str,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
    blocklist: "list[str] | None" = None,
    num_shards: int = 64,
) -> Dataset:
    """RefinedWeb-style crawl-stage curation as ONE Dataset -> Dataset call:

    1. **URL dedup, keep-first** — collapse recrawls by canonical key
       (:func:`url_dedup_keep_first_rows`; the one full-row exchange).
    2. **Domain gating** — blocklist + integer-exact mean-``value_col`` gate
       over the SURVIVORS (:func:`domain_filter` semantics; stage order
       matters — the domain means are computed post-URL-dedup, matching the
       published recipes' "dedup before aggregate signals" ordering).
    3. **Word-blocklist screen** — drop docs containing any blocklisted
       token (:func:`textstats.badwords_filter` semantics).

    Output: (id_col, canon_url, domain, value_col) per surviving doc.  The
    content-side sibling (:func:`curate.curate_corpus`: Gopher -> exact dedup
    -> CCNet cut) picks up downstream; each stage here is an existing,
    individually oracle-checked operator — this module only composes them.
    """
    from .textstats import badwords_filter

    s1 = url_dedup_keep_first_rows(
        docs, url_col=url_col, id_col=id_col, num_shards=num_shards
    )
    s2 = domain_filter(
        s1,
        min_mean_value,
        value_col,
        url_col=url_col,
        id_col=id_col,
        blocklist=blocklist,
        keep_all=True,
    )
    s3 = badwords_filter(s2, badwords, keep_all=True)

    def project(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                id_col: t[id_col],
                "canon_url": t["canon_url"],
                "domain": t["domain"],
                value_col: t[value_col],
            }
        )
        return out.filter(pc.equal(t["flagged"], 0))

    return s3.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)

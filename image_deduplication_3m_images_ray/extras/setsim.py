"""Set-similarity operators over token-shingle sets: containment join and
corpus-overlap analysis.

Containment C(A→B) = |S_A ∩ S_B| / |S_A| (Broder's containment measure) is
the near-SUPERSET detector Jaccard misses: a short page embedded verbatim in
a much longer one has tiny Jaccard but containment ≈ 1 on the short side.
Reference analog: the stage-4 local-descriptor ratio-test match
(/root/reference/modules/deduplication.py:1285-1351) plays exactly this role
for images — a crop/pad of another image matches nearly all of its local
descriptors while global (whole-image) similarity is low.

``source_overlap`` is the corpus-level companion: pairwise Jaccard between
the distinct-shingle sets of whole sources — the standard
train/bench-overlap and crawl-snapshot-overlap diagnostic.

Scale shape (both operators): the map stage reduces every doc to its
distinct shingle hashes (the text never enters an exchange), candidate
generation is one hash-sharded exchange on the shingle, and per-pair counts
are summed in a second, much smaller exchange.  Unlike Jaccard (see
``dedup_ops.char_jaccard_pairs``), containment admits NO size-ratio blocking
— a 10-shingle doc can be 100%-contained in a 10^6-shingle doc — and prefix
filtering gives no guarantee either (the required overlap τ·min(|A|,|B|)
depends on the PARTNER's size, so the bigger side would have to index almost
everything).  The exact operator therefore generates a candidate from every
shared shingle; on boilerplate-heavy corpora cap the hot shingles with
``drop_gram_docs_above`` (document-frequency cutoff applied to sizes AND
intersections, i.e. IDF-style stop-shingle removal — a semantic knob, not a
silent truncation; the SQL oracle takes the same cutoff).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from ..functions.hashing import unique_per_doc
from ..functions.text import normalize_array, shingle_batch
from ..util import segment_bounds, sharded_group_map

U64 = np.uint64


def _doc_gram_postings(t: pa.Table, k: int) -> pa.Table:
    """(doc_id, text) batch -> one (gram, doc_id, sz) row per DISTINCT
    doc-shingle; ``sz`` is the doc's distinct-shingle count (carried on every
    posting so the pair stage needs no size join)."""
    ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False), dtype=np.int64)
    norm = normalize_array(t["text"])
    sh, offs = shingle_batch(norm, k)
    uniq, uoffs = unique_per_doc(sh, offs)
    sizes = np.diff(uoffs)
    return pa.table(
        {
            "gram": pa.array(uniq.astype(U64), pa.uint64()),
            "doc_id": pa.array(np.repeat(ids, sizes), pa.int64()),
            "sz": pa.array(np.repeat(sizes, sizes), pa.int64()),
        }
    )


def _emit_pair_partials(g: dict, drop_above: int | None) -> dict:
    """One gram-hash shard -> per-(doc_a, doc_b) partial intersection counts.

    Every gram bucket of c docs contributes 1 to each of its c*(c-1)/2 pairs;
    partials are pre-summed WITHIN the shard (lexsort + reduceat) so the
    second exchange ships one row per (pair, shard), not per shared gram.
    """
    empty = {
        "doc_a": np.empty(0, np.int64),
        "doc_b": np.empty(0, np.int64),
        "shared": np.empty(0, np.int64),
        "sz_a": np.empty(0, np.int64),
        "sz_b": np.empty(0, np.int64),
    }
    gram = np.asarray(g["gram"], dtype=U64)
    doc = np.asarray(g["doc_id"], dtype=np.int64)
    sz = np.asarray(g["sz"], dtype=np.int64)
    order = np.lexsort((doc, gram))
    gram, doc, sz = gram[order], doc[order], sz[order]
    bounds = segment_bounds(gram)
    counts = np.diff(bounds)
    a_p, b_p, sa_p, sb_p = [], [], [], []
    mask = counts >= 2
    if drop_above is not None:
        mask &= counts <= drop_above
    for m in np.nonzero(mask)[0]:
        lo, hi = bounds[m], bounds[m + 1]
        d, s = doc[lo:hi], sz[lo:hi]
        ia, ib = np.triu_indices(hi - lo, k=1)
        a_p.append(d[ia])
        b_p.append(d[ib])
        sa_p.append(s[ia])
        sb_p.append(s[ib])
    if not a_p:
        return empty
    a = np.concatenate(a_p)
    b = np.concatenate(b_p)
    sa = np.concatenate(sa_p)
    sb = np.concatenate(sb_p)
    # pre-sum within the shard: one row per distinct (a, b)
    o = np.lexsort((b, a))
    a, b, sa, sb = a[o], b[o], sa[o], sb[o]
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(first)[0]
    shared = np.diff(np.append(starts, len(a))).astype(np.int64)
    return {
        "doc_a": a[starts],
        "doc_b": b[starts],
        "shared": shared,
        "sz_a": sa[starts],
        "sz_b": sb[starts],
    }


def containment_pairs(
    docs: Dataset,
    threshold: float = 0.5,
    shingle_k: int = 5,
    num_shards: int = 64,
    drop_gram_docs_above: int | None = None,
) -> Dataset:
    """All (doc_a < doc_b) pairs with max-containment >= ``threshold``.

    Output: (doc_a, doc_b, n_shared, containment_a, containment_b) where
    ``containment_a`` = |S_a ∩ S_b| / |S_a| (how much of a is inside b) and
    the filter keeps pairs where EITHER direction reaches ``threshold``
    (equivalently shared / min(|S_a|, |S_b|) >= threshold).  Shingle sets are
    the engine-standard distinct ``shingle_k``-token shingles of the
    normalized text (short docs contribute one whole-text shingle, so the
    empty/short-doc identity semantics match the flagship's).  Containments
    are rounded to 6 decimals AFTER thresholding on the exact quotient.

    ``drop_gram_docs_above=N`` excludes shingles borne by more than N docs
    from candidate generation; counts then measure the non-boilerplate
    overlap.  Default None = exact (matches the SQL oracle verbatim).
    """
    if not (0 < threshold <= 1):
        raise ValueError("threshold must be in (0, 1]")
    postings = docs.select_columns(["doc_id", "text"]).map_batches(
        _doc_gram_postings,
        fn_args=(shingle_k,),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    partials = sharded_group_map(
        postings,
        ["gram"],
        lambda g: _emit_pair_partials(g, drop_gram_docs_above),
        num_shards=num_shards,
    )

    def finish(g: dict) -> dict:
        a = np.asarray(g["doc_a"], dtype=np.int64)
        b = np.asarray(g["doc_b"], dtype=np.int64)
        sh = np.asarray(g["shared"], dtype=np.int64)
        sa = np.asarray(g["sz_a"], dtype=np.int64)
        sb = np.asarray(g["sz_b"], dtype=np.int64)
        o = np.lexsort((b, a))
        a, b, sh, sa, sb = a[o], b[o], sh[o], sa[o], sb[o]
        first = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(first)[0]
        tot = np.add.reduceat(sh, starts) if len(starts) else np.empty(0, np.int64)
        a, b, sa, sb = a[starts], b[starts], sa[starts], sb[starts]
        ca = tot / sa
        cb = tot / sb
        keep = (ca >= threshold) | (cb >= threshold)
        return {
            "doc_a": a[keep],
            "doc_b": b[keep],
            "n_shared": tot[keep],
            "containment_a": np.round(ca[keep], 6),
            "containment_b": np.round(cb[keep], 6),
        }

    return sharded_group_map(partials, ["doc_a", "doc_b"], finish, num_shards=num_shards)


def _source_gram_postings(t: pa.Table, k: int) -> pa.Table:
    """Batch -> distinct (gram, source) rows (batch-local dedup; the
    gram-sharded reducer re-dedups globally)."""
    srcs = np.asarray(t["source"].to_pylist(), dtype=object)
    norm = normalize_array(t["text"])
    sh, offs = shingle_batch(norm, k)
    uniq, uoffs = unique_per_doc(sh, offs)
    sizes = np.diff(uoffs)
    gram = uniq.astype(U64)
    src = np.repeat(srcs, sizes)
    # batch-local (gram, source) dedup to shrink the exchange
    codes, inv = np.unique(src.astype(str), return_inverse=True)
    o = np.lexsort((inv, gram))
    gram, inv = gram[o], inv[o]
    first = np.ones(len(gram), dtype=bool)
    if len(gram) > 1:
        first[1:] = (gram[1:] != gram[:-1]) | (inv[1:] != inv[:-1])
    return pa.table(
        {
            "gram": pa.array(gram[first], pa.uint64()),
            "source": pa.array(codes[inv[first]].astype(object), pa.string()),
        }
    )


def source_overlap(docs: Dataset, shingle_k: int = 5, num_shards: int = 64) -> Dataset:
    """Pairwise shingle-set overlap between sources.

    Output: (source_a < source_b, n_a, n_b, n_shared, jaccard) for every
    source pair sharing at least one distinct shingle, where ``n_x`` is the
    source's distinct-shingle count over all of its docs and ``jaccard`` =
    n_shared / (n_a + n_b − n_shared), rounded to 6 decimals.  The
    train/benchmark-overlap and crawl-snapshot-overlap diagnostic.

    Scale shape: one gram-sharded exchange computes per-shard EXACT partial
    counts (a gram's rows all land in one shard, so global (gram, source)
    dedup is shard-local); the partials are O(num_shards * n_sources^2) rows
    — trivially collected whatever the corpus size.
    """
    postings = docs.select_columns(["source", "text"]).map_batches(
        _source_gram_postings,
        fn_args=(shingle_k,),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def shard_counts(g: dict) -> dict:
        gram = np.asarray(g["gram"], dtype=U64)
        src = np.asarray(g["source"], dtype=object)
        codes, inv = np.unique(src.astype(str), return_inverse=True)
        o = np.lexsort((inv, gram))
        gram, inv = gram[o], inv[o]
        first = np.ones(len(gram), dtype=bool)  # global (gram, source) dedup
        if len(gram) > 1:
            first[1:] = (gram[1:] != gram[:-1]) | (inv[1:] != inv[:-1])
        gram, inv = gram[first], inv[first]
        bounds = segment_bounds(gram)
        counts = np.diff(bounds)
        # per-source totals (emitted as source_b = "" rows)
        tot = np.bincount(inv, minlength=len(codes)).astype(np.int64)
        a_out = list(codes.astype(object))
        b_out = [""] * len(codes)
        n_out = list(tot)
        # per-pair shared counts across this shard's gram buckets
        pair_counts: dict = {}
        for m in np.nonzero(counts >= 2)[0]:
            lo, hi = bounds[m], bounds[m + 1]
            members = inv[lo:hi]  # sorted, distinct
            ia, ib = np.triu_indices(hi - lo, k=1)
            for x, y in zip(members[ia].tolist(), members[ib].tolist()):
                pair_counts[(x, y)] = pair_counts.get((x, y), 0) + 1
        for (x, y), c in pair_counts.items():
            a_out.append(codes[x])
            b_out.append(codes[y])
            n_out.append(c)
        return {
            "source_a": np.asarray(a_out, dtype=object),
            "source_b": np.asarray(b_out, dtype=object),
            "n": np.asarray(n_out, dtype=np.int64),
        }

    partials = sharded_group_map(postings, ["gram"], shard_counts, num_shards=num_shards)
    # final combine: O(num_shards * n_sources^2) rows — tiny by construction
    parts = [t for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if not parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "source_a": pa.array([], pa.string()),
                    "source_b": pa.array([], pa.string()),
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    tbl = pa.concat_tables(parts)
    sa = np.asarray(tbl["source_a"].to_pylist(), dtype=object)
    sb = np.asarray(tbl["source_b"].to_pylist(), dtype=object)
    n = np.asarray(tbl["n"].to_numpy(zero_copy_only=False), dtype=np.int64)
    totals: dict = {}
    shared: dict = {}
    for x, y, c in zip(sa.tolist(), sb.tolist(), n.tolist()):
        if y == "":
            totals[x] = totals.get(x, 0) + c
        else:
            shared[(x, y)] = shared.get((x, y), 0) + c
    rows_a, rows_b, na, nb, ns, jc = [], [], [], [], [], []
    for (x, y), c in sorted(shared.items()):
        rows_a.append(x)
        rows_b.append(y)
        na.append(totals[x])
        nb.append(totals[y])
        ns.append(c)
        jc.append(round(c / (totals[x] + totals[y] - c), 6))
    return ray.data.from_arrow(
        pa.table(
            {
                "source_a": pa.array(rows_a, pa.string()),
                "source_b": pa.array(rows_b, pa.string()),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nb, pa.int64()),
                "n_shared": pa.array(ns, pa.int64()),
                "jaccard": pa.array(jc, pa.float64()),
            }
        )
    )


def _emit_cross_pair_partials(g: dict, drop_above: int | None) -> dict:
    """One gram-hash shard -> per-(left, right) partial intersection counts.

    Like :func:`_emit_pair_partials` but pairs only ACROSS sides: each gram
    bucket contributes (every left doc) x (every right doc) bearing it.
    """
    empty = {
        "doc_a": np.empty(0, np.int64),
        "doc_b": np.empty(0, np.int64),
        "shared": np.empty(0, np.int64),
        "sz_a": np.empty(0, np.int64),
        "sz_b": np.empty(0, np.int64),
    }
    gram = np.asarray(g["gram"], dtype=U64)
    doc = np.asarray(g["doc_id"], dtype=np.int64)
    sz = np.asarray(g["sz"], dtype=np.int64)
    side = np.asarray(g["side"], dtype=np.int8)
    order = np.lexsort((doc, side, gram))
    gram, doc, sz, side = gram[order], doc[order], sz[order], side[order]
    bounds = segment_bounds(gram)
    counts = np.diff(bounds)
    a_p, b_p, sa_p, sb_p = [], [], [], []
    mask = counts >= 2
    if drop_above is not None:
        mask &= counts <= drop_above
    for m in np.nonzero(mask)[0]:
        lo, hi = bounds[m], bounds[m + 1]
        s = side[lo:hi]
        nl = int((s == 0).sum())
        nr = (hi - lo) - nl
        if nl == 0 or nr == 0:
            continue  # gram lives on one side only: no cross pair
        ld, ls = doc[lo : lo + nl], sz[lo : lo + nl]  # side sorts 0 first
        rd, rs = doc[lo + nl : hi], sz[lo + nl : hi]
        a_p.append(np.repeat(ld, nr))
        sa_p.append(np.repeat(ls, nr))
        b_p.append(np.tile(rd, nl))
        sb_p.append(np.tile(rs, nl))
    if not a_p:
        return empty
    a = np.concatenate(a_p)
    b = np.concatenate(b_p)
    sa = np.concatenate(sa_p)
    sb = np.concatenate(sb_p)
    o = np.lexsort((b, a))
    a, b, sa, sb = a[o], b[o], sa[o], sb[o]
    first = np.ones(len(a), dtype=bool)
    if len(a) > 1:
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.nonzero(first)[0]
    shared = np.diff(np.append(starts, len(a))).astype(np.int64)
    return {
        "doc_a": a[starts],
        "doc_b": b[starts],
        "shared": shared,
        "sz_a": sa[starts],
        "sz_b": sb[starts],
    }


def fuzzy_join(
    left: Dataset,
    right: Dataset,
    threshold: float = 0.5,
    shingle_k: int = 5,
    num_shards: int = 64,
    drop_gram_docs_above: int | None = None,
) -> Dataset:
    """Similarity JOIN across two tables: every (left doc, right doc) pair
    whose distinct-shingle Jaccard reaches ``threshold``.

    The cross-corpus record-linkage primitive ("which fresh-crawl pages
    nearly match something in the reference set?") — the set-similarity-join
    literature's Jaccard join (Vernica et al., SIGMOD'10 shapes it the same
    way: tokens -> gram postings -> gram-keyed candidate exchange -> exact
    verify), built from the same postings/partials machinery as
    :func:`containment_pairs` but pairing only ACROSS sides.  Both inputs
    need (doc_id, text); text never enters an exchange (postings ship
    (gram-hash, id, sz) rows, partial pair counts pre-sum per shard).

    Output: (doc_a = left id, doc_b = right id, n_shared, jaccard >=
    ``threshold``), jaccard rounded to 6 decimals after thresholding on the
    exact quotient.  ``drop_gram_docs_above`` is the same IDF-style
    stop-shingle knob as :func:`containment_pairs` (counts both sides).

    Scale note: like ``containment_pairs``, candidate generation is EXACT —
    every shared shingle proposes its pair — so boilerplate-heavy corpora
    should set ``drop_gram_docs_above``.  When only high-Jaccard matches are
    wanted at full corpus scale, the flagship MinHash-LSH pipeline
    (``stages/banding.py`` -> ``stages/verify.py``) is the
    recall-tunable candidate generator; this operator is the exact,
    oracle-checkable join.
    """
    if not (0 < threshold <= 1):
        raise ValueError("threshold must be in (0, 1]")

    def postings(side_val: int):
        def fn(t: pa.Table) -> pa.Table:
            p = _doc_gram_postings(t, shingle_k)
            return p.append_column(
                "side", pa.array(np.full(len(p), side_val, np.int8), pa.int8())
            )

        return fn

    lp = left.select_columns(["doc_id", "text"]).map_batches(
        postings(0), batch_format="pyarrow", zero_copy_batch=True
    )
    rp = right.select_columns(["doc_id", "text"]).map_batches(
        postings(1), batch_format="pyarrow", zero_copy_batch=True
    )
    partials = sharded_group_map(
        lp.union(rp),
        ["gram"],
        lambda g: _emit_cross_pair_partials(g, drop_gram_docs_above),
        num_shards=num_shards,
    )

    def finish(g: dict) -> dict:
        a = np.asarray(g["doc_a"], dtype=np.int64)
        b = np.asarray(g["doc_b"], dtype=np.int64)
        sh = np.asarray(g["shared"], dtype=np.int64)
        sa = np.asarray(g["sz_a"], dtype=np.int64)
        sb = np.asarray(g["sz_b"], dtype=np.int64)
        o = np.lexsort((b, a))
        a, b, sh, sa, sb = a[o], b[o], sh[o], sa[o], sb[o]
        first = np.ones(len(a), dtype=bool)
        if len(a) > 1:
            first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(first)[0]
        tot = np.add.reduceat(sh, starts) if len(starts) else np.empty(0, np.int64)
        a, b, sa, sb = a[starts], b[starts], sa[starts], sb[starts]
        j = tot / (sa + sb - tot)
        keep = j >= threshold
        return {
            "doc_a": a[keep],
            "doc_b": b[keep],
            "n_shared": tot[keep],
            "jaccard": np.round(j[keep], 6),
        }

    return sharded_group_map(partials, ["doc_a", "doc_b"], finish, num_shards=num_shards)


def fuzzy_subtract(
    new: Dataset,
    base: Dataset,
    threshold: float = 0.5,
    shingle_k: int = 5,
    num_shards: int = 64,
    drop_gram_docs_above: int | None = None,
    broadcast_max_drops: int = 5_000_000,
) -> Dataset:
    """Near-duplicate decontamination: keep ``new`` rows whose text is NOT
    Jaccard-similar (>= ``threshold``) to ANY ``base`` row.

    The fuzzy counterpart of :func:`dedup_ops.subtract_corpus` (which is
    byte-exact) — the doc-level "remove anything that nearly matches a
    benchmark / already-trained corpus" stage.  Composition: one
    :func:`fuzzy_join` for the match pairs, a tiny groupby to distinct the
    matched new-side ids, then the shared size-gated anti-join filter
    (:func:`util.filter_out_ids`: sorted-array broadcast below
    ``broadcast_max_drops``, hash-sharded marker attach above).  ``new`` is
    consumed twice (join + final filter) and is materialized ONCE here.

    Output: the surviving ``new`` rows, all input columns.
    """
    import pyarrow.compute as pc

    from ..util import filter_out_ids

    pinned = new.materialize()
    pairs = fuzzy_join(
        pinned, base, threshold=threshold, shingle_k=shingle_k,
        num_shards=num_shards, drop_gram_docs_above=drop_gram_docs_above,
    )
    matched = pairs.groupby("doc_a").count()

    def as_drop(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": pc.cast(t["doc_a"], pa.uint64())})

    drops = matched.map_batches(as_drop, batch_format="pyarrow", zero_copy_batch=True)
    return filter_out_ids(
        pinned, drops, id_col="doc_id",
        broadcast_max_drops=broadcast_max_drops, num_shards=num_shards,
    )

"""Row-local corpus transforms: fixed-window document chunking and PII
redaction.

Both are embarrassingly parallel ``map_batches`` stages (no exchange at all —
the cheapest shape this engine has), included because a training-data
pipeline runs them over every byte of the corpus, so the per-batch kernel
must be vectorized: chunking gathers chunk bytes with ONE fancy-index over
the batch's flat UTF-8 buffer (the ``segment_dedup`` byte-gather idiom,
dedup_ops.py:659), redaction runs compiled RE2 kernels
(``pyarrow.compute.replace_substring_regex``) column-at-a-time.  Reference
analog: the per-image local transforms M1/M2 (SURVEY.md §2.2) — pure
row-local work on an actor-free task pool.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from ..functions.hashing import _ranges
from ..functions.text import flat_utf8_view


def chunk_docs(
    docs: Dataset, width: int = 1000, stride: int = 800, batch_size: int = 1024
) -> Dataset:
    """Split every doc into ``width``-CHAR windows every ``stride`` chars —
    the context-window packing primitive (overlap = ``width - stride``).

    Chunk ``i`` covers chars ``[i*stride, i*stride + width)``;
    ``n_chunks = ceil(max(len - width, 0) / stride) + 1`` so the final chunk
    always reaches the end and an empty doc yields one empty chunk.  Matches
    SQL ``substr(text, i*stride + 1, width)`` character semantics exactly:
    ASCII batches (the webtext common case) take a single byte-gather over
    the flat UTF-8 buffer — no per-row Python; any non-ASCII batch falls
    back to per-doc codepoint slicing with identical semantics (the
    ``doc_fingerprints`` fallback convention, textstats.py).

    Output: (doc_id, chunk_id, chunk_text), one row per chunk.
    """
    if stride <= 0 or width <= 0:
        raise ValueError("chunk_docs: width and stride must be positive")
    W, S = width, stride

    def fn(t: pa.Table) -> pa.Table:
        return chunk_table(t, W, S)

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def chunk_table(t: pa.Table, W: int, S: int) -> pa.Table:
    """The :func:`chunk_docs` per-batch kernel (module-level so the property
    suite can drive it on arbitrary unicode without a Ray session).

    Null text is treated as an empty document (one empty chunk) — a NaN
    length would otherwise cast to INT64_MIN garbage and null rows would
    skew the batch's ASCII gate."""
    text = t["text"]
    arr = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    arr = pc.fill_null(arr, "")
    ids = np.asarray(t["doc_id"].to_numpy(zero_copy_only=False))
    n = np.asarray(pc.utf8_length(arr).to_numpy(zero_copy_only=False), np.int64)
    c = (np.maximum(n - W, 0) + S - 1) // S + 1
    chunk_doc = np.repeat(np.arange(len(ids), dtype=np.int64), c)
    cidx = _ranges(c)
    all_ascii = len(arr) == 0 or bool(pc.all(pc.string_is_ascii(arr)).as_py())
    if all_ascii:
        offs, data = flat_utf8_view(arr)
        start = offs[:-1][chunk_doc] + cidx * S
        lens = np.minimum(W, n[chunk_doc] - cidx * S)
        lens = np.maximum(lens, 0)  # empty docs: one zero-length chunk
        pos = lens > 0  # _ranges requires positive counts; empty chunks
        gather = (     # still get rows via the offsets below
            np.repeat(start[pos], lens[pos]) + _ranges(lens[pos])
            if lens.sum()
            else np.zeros(0, np.int64)
        )
        buf = data[gather]
        out_offs = np.zeros(len(lens) + 1, dtype=np.int64)
        if len(lens):
            out_offs[1:] = np.cumsum(lens)
        # emitted as large_utf8 (offsets already int64): a >2 GiB chunk batch
        # would overflow an int32-offset cast to utf8
        chunk_arr = pa.Array.from_buffers(
            pa.large_utf8(),
            len(lens),
            [None, pa.py_buffer(out_offs.tobytes()), pa.py_buffer(buf.tobytes())],
        )
    else:
        # unicode fallback: identical char semantics, per-doc Python
        texts = arr.to_pylist()
        chunks = [
            texts[d][i * S : i * S + W]
            for d, i in zip(chunk_doc, cidx)
        ]
        chunk_arr = pa.array(chunks, pa.large_string())
    return pa.table(
        {
            "doc_id": pa.array(ids[chunk_doc]),
            "chunk_id": pa.array(cidx, pa.int64()),
            "chunk_text": chunk_arr,
        }
    )


# (label, RE2 pattern, replacement) applied IN ORDER — later patterns see the
# earlier replacements, and the SQL oracle nests its regexp_replace calls the
# same way.  RE2 on both sides (pyarrow and DuckDB), so match semantics
# (leftmost, non-POSIX) agree bit-for-bit.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phones", r"\+?[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(docs: Dataset, batch_size: int = 4096) -> Dataset:
    """Scrub email / IPv4 / phone-shaped spans, counting each kind.

    Output: (doc_id, clean_text, n_emails, n_ips, n_phones).  Counts are
    taken on the text each pattern actually saw (post earlier replacements),
    which is also what the nested SQL oracle computes.  Pure vectorized RE2
    kernels; no exchange.
    """

    def fn(t: pa.Table) -> pa.Table:
        cur = t["text"]
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        out = {"doc_id": t["doc_id"]}
        counts = {}
        for name, pat, repl in PII_PATTERNS:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(cur, pat), pa.int64()
            )
            cur = pc.replace_substring_regex(cur, pattern=pat, replacement=repl)
        out["clean_text"] = cur
        out.update(counts)
        return pa.table(out)

    return docs.map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True
    )


def pack_sequences(
    docs: Dataset, capacity: int = 2048, id_col: str = "doc_id",
    batch_size: int = 4096,
) -> Dataset:
    """Concat-and-cut sequence packing: assign every doc its global token
    offset in the ``id_col``-ordered corpus stream and the training bin
    (``bin_id = tok_offset // capacity``) its first token lands in.

    The standard LLM pretraining layout (documents concatenated in a fixed
    order, cut every ``capacity`` tokens) needs a GLOBAL exclusive prefix sum
    — a scan, not an aggregate, so neither ``groupby`` nor a sharded exchange
    expresses it.  Shape: token counts per row (the ``token_stats``
    normalized-whitespace contract, so the SQL window-sum oracle matches
    exactly), ONE distributed sort on ``id_col``, then per-block token SUMS
    (one scalar per block) come back to the driver, an exclusive prefix over
    O(blocks) integers hands each block its base offset, and per-block tasks
    attach ``tok_offset = base + local exclusive cumsum``.  Block payloads
    move by object ref only; the :func:`group_rank` scan idiom with scalar
    (not per-group) driver state.

    Output: (id_col, n_tokens, tok_offset, bin_id), exact.
    """
    if capacity <= 0:
        raise ValueError("pack_sequences: capacity must be positive")
    offsets = _scan_token_offsets(
        _count_tokens_ds(docs, id_col, batch_size), [id_col]
    )
    if offsets is None:
        import ray.data

        return ray.data.from_arrow(_empty_pack(id_col, with_bin=True))

    def add_bin(t: pa.Table) -> pa.Table:
        off = np.asarray(t["tok_offset"].to_numpy(zero_copy_only=False), np.int64)
        return t.append_column("bin_id", pa.array(off // capacity, pa.int64()))

    return offsets.map_batches(add_bin, batch_format="pyarrow", zero_copy_batch=True)


def _empty_pack(id_col: str, with_bin: bool) -> pa.Table:
    cols = {
        id_col: pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "tok_offset": pa.array([], pa.int64()),
    }
    if with_bin:
        cols["bin_id"] = pa.array([], pa.int64())
    return pa.table(cols)


def _count_tokens_ds(docs: Dataset, id_col: str, batch_size: int) -> Dataset:
    """(id, text) -> (id, n_tokens) under the ``token_stats`` contract."""
    from ..functions.text import normalize_array

    def count_tokens(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # null text counts as an empty doc (0 tokens), not NaN-cast garbage
        norm = normalize_array(pc.fill_null(col, ""))
        n_chars = np.asarray(
            pc.utf8_length(norm).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        n_spaces = np.asarray(
            pc.count_substring(norm, " ").cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        n_tokens = np.where(n_chars == 0, 0, n_spaces + 1).astype(np.int64)
        return pa.table(
            {id_col: t[id_col], "n_tokens": pa.array(n_tokens, pa.int64())}
        )

    return docs.map_batches(
        count_tokens, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def _scan_token_offsets(counted: Dataset, sort_cols: list) -> Dataset | None:
    """The distributed exclusive-prefix-sum scan: sort, per-block SUM scalars
    to the driver, O(blocks) prefix, per-block ``tok_offset`` attach by
    object ref.  Returns None on an empty dataset."""
    import ray
    import ray.data

    pinned = counted.sort(sort_cols).materialize()
    refs = pinned.to_arrow_refs()
    if not refs or pinned.count() == 0:
        return None

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        return int(
            np.asarray(t["n_tokens"].to_numpy(zero_copy_only=False), np.int64).sum()
        )

    sums = ray.get([block_sum.remote(r) for r in refs])
    bases = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote
    def attach(t: pa.Table, base: int) -> pa.Table:
        n = np.asarray(t["n_tokens"].to_numpy(zero_copy_only=False), np.int64)
        off = base + np.concatenate([[0], np.cumsum(n)[:-1]]).astype(np.int64) \
            if len(n) else np.zeros(0, np.int64)
        return t.append_column("tok_offset", pa.array(off, pa.int64()))

    out_refs = [attach.remote(r, int(b)) for r, b in zip(refs, bases)]
    return ray.data.from_arrow_refs(out_refs)


def sample_token_budget(
    docs: Dataset, budget: int, id_col: str = "doc_id", batch_size: int = 4096
) -> Dataset:
    """Deterministic "train on N tokens" subsample: walk the corpus in
    id-hash order and keep docs until the global token budget fills.

    Order = ``md5(id)`` (the :func:`sample_uniform` hash — equals DuckDB
    ``md5_number_lower(CAST(id AS VARCHAR))``, so the oracle replays the
    identical walk) with id tiebreak; a doc is kept iff the budget was not
    yet full when it arrived (``tok_offset < budget`` — the straddling doc
    is INCLUDED, "fill until reached").  Same scan shape as
    :func:`pack_sequences`: driver state is O(blocks) scalars.

    Output: (id_col, n_tokens, tok_offset) for the kept docs.
    """
    from .relational import _md5_id_column

    if budget <= 0:
        raise ValueError("sample_token_budget: budget must be positive")

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__hk", pa.array(_md5_id_column(t, id_col), pa.uint64())
        )

    counted = _count_tokens_ds(docs, id_col, batch_size).map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True
    )
    offsets = _scan_token_offsets(counted, ["__hk", id_col])
    if offsets is None:
        import ray.data

        return ray.data.from_arrow(_empty_pack(id_col, with_bin=False))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["tok_offset"], budget)).drop_columns(["__hk"])

    return offsets.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def epoch_shuffle(ds: Dataset, epoch: int = 0, id_col: str = "doc_id") -> Dataset:
    """Deterministic global training order for one epoch: every row's
    position is the rank of ``md5(id ':' epoch)`` — a full reshuffle per
    epoch that is reproducible across runs, machines and partitionings
    (unlike ``random_shuffle``, whose order depends on block layout).

    A training job consumes the corpus in ``pos`` order (or range-partitions
    by ``pos`` into worker shards); resuming mid-epoch is "skip pos < N",
    which a seeded in-memory shuffle cannot offer at 100 TB.  ONE
    distributed sort (reuses :func:`relational.group_rank` under a constant
    group key); the salted hash is reduced mod 2**63 so int64 rank order
    matches the SQL oracle's UBIGINT order.

    Output: (id_col, pos), pos = 1-based position in the epoch's order.
    """
    from ..functions.hashing import md5_u64
    from .relational import group_rank

    if epoch < 0:
        raise ValueError("epoch_shuffle: epoch must be >= 0")
    salt = str(epoch)

    def add_h(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.string())
        salted = pc.binary_join_element_wise(ids, salt, ":")
        h = (md5_u64(salted.to_pylist()) % np.uint64(2**63)).astype(np.int64)
        out = t.select([id_col])
        out = out.append_column("__h", pa.array(h, pa.int64()))
        return out.append_column("__k", pa.array(np.zeros(len(h), np.int8), pa.int8()))

    withh = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True)
    ranked = group_rank(
        withh, key="__k", value="__h", id_col=id_col, descending=False, ntile=1
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col], "pos": t["rank"]})

    return ranked.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)

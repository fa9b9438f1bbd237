"""Unit tests for the row-local transforms: chunking and PII redaction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _chunk_ref(text: str, w: int, s: int) -> list[str]:
    n_chunks = (max(len(text) - w, 0) + s - 1) // s + 1
    return [text[i * s : i * s + w] for i in range(n_chunks)]


def test_chunk_docs_matches_python_slicing(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import chunk_docs

    texts = [
        "",                      # empty -> one empty chunk
        "a" * 9,                 # < width
        "b" * 10,                # == width
        "c" * 11,                # width + 1 -> 2 chunks
        "d" * 26,                # multi-chunk, last partial
        "xy" * 8,                # exact multiple of stride
    ]
    w, s = 10, 8
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    for parts in (1, 4):
        out = (
            chunk_docs(ray.data.from_arrow(t).repartition(parts), width=w, stride=s)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        exp_rows = [
            (d, i, ch)
            for d, txt in enumerate(texts)
            for i, ch in enumerate(_chunk_ref(txt, w, s))
        ]
        got_rows = list(zip(out["doc_id"], out["chunk_id"], out["chunk_text"]))
        assert got_rows == exp_rows, f"parts={parts}"


def test_chunk_docs_unicode_char_semantics(ray_session):
    """Non-ASCII batches take the fallback but keep CHARACTER windows —
    multi-byte codepoints must never split."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import chunk_docs

    text = "é" * 7 + "日本語" + "a" * 5  # 15 chars, 25 UTF-8 bytes
    t = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array([text], pa.string())}
    )
    out = (
        chunk_docs(ray.data.from_arrow(t), width=6, stride=4)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    assert list(out["chunk_text"]) == _chunk_ref(text, 6, 4)


def test_chunk_docs_rejects_bad_params(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import chunk_docs

    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["x"])})
    with pytest.raises(ValueError):
        chunk_docs(ray.data.from_arrow(t), width=0, stride=5)
    with pytest.raises(ValueError):
        chunk_docs(ray.data.from_arrow(t), width=5, stride=0)


def test_redact_pii_counts_and_replacements(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import redact_pii

    texts = [
        "contact bob.smith+x@example.co.uk or admin@host.io today",
        "server at 10.0.255.3 and 192.168.1.1 responded",
        "call +1 (555) 123-4567 now",
        "clean text with no pii at all",
        "mixed a@b.io from 8.8.8.8 dial 555-123-9999",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        redact_pii(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_emails"]) == [2, 0, 0, 0, 1]
    assert list(out["n_ips"]) == [0, 2, 0, 0, 1]
    assert list(out["n_phones"]) == [0, 0, 1, 0, 1]
    assert out.loc[0, "clean_text"] == "contact <EMAIL> or <EMAIL> today"
    assert out.loc[1, "clean_text"] == "server at <IP> and <IP> responded"
    assert out.loc[2, "clean_text"] == "call <PHONE> now"
    assert out.loc[3, "clean_text"] == texts[3]
    assert out.loc[4, "clean_text"] == "mixed <EMAIL> from <IP> dial <PHONE>"


def test_pack_sequences_matches_cumsum(ray_session):
    """Global exclusive prefix sum is exact and partitioning-invariant."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import pack_sequences

    rng = np.random.default_rng(4)
    n = 300
    texts = [" ".join(f"w{j}" for j in range(k)) for k in rng.integers(0, 50, n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    tokens = np.array([0 if s == "" else s.count(" ") + 1 for s in texts])
    offsets = np.concatenate([[0], np.cumsum(tokens)[:-1]])
    for parts in (1, 16):
        out = (
            pack_sequences(
                ray.data.from_pandas(df).repartition(parts), capacity=64
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out["n_tokens"]) == list(tokens)
        assert list(out["tok_offset"]) == list(offsets)
        assert list(out["bin_id"]) == list(offsets // 64)


def test_pack_sequences_rejects_bad_capacity(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import pack_sequences

    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["x"])})
    with pytest.raises(ValueError):
        pack_sequences(ray.data.from_arrow(t), capacity=0)


def test_sample_token_budget_matches_reference(ray_session):
    """Hash-ordered walk keeps exactly the docs whose exclusive prefix sum
    is under budget (straddler included), at several partitionings."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import sample_token_budget
    from image_deduplication_3m_images_ray.functions.hashing import md5_u64

    rng = np.random.default_rng(12)
    n = 200
    texts = [" ".join(f"w{j}" for j in range(k)) for k in rng.integers(0, 30, n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    tokens = np.array([0 if s == "" else s.count(" ") + 1 for s in texts])
    h = md5_u64([str(i) for i in range(n)])
    order = np.lexsort((np.arange(n), h))
    csum = np.concatenate([[0], np.cumsum(tokens[order])[:-1]])
    budget = 800
    want = sorted(int(d) for d, off in zip(order, csum) if off < budget)
    for parts in (1, 8):
        got = sample_token_budget(
            ray.data.from_pandas(df).repartition(parts), budget=budget
        ).to_pandas()
        assert sorted(got["doc_id"]) == want, f"parts={parts}"
    with pytest.raises(ValueError):
        sample_token_budget(ray.data.from_pandas(df), budget=0)


def test_chunk_and_pack_handle_null_text(ray_session):
    """Null text rows are treated as empty docs — no NaN-cast garbage, no
    ASCII-gate skew (review finding)."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import (
        chunk_docs,
        pack_sequences,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["abcd", None, "xy"], pa.string()),
        }
    )
    ch = (
        chunk_docs(ray.data.from_arrow(t), width=3, stride=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    assert list(zip(ch["doc_id"], ch["chunk_text"])) == [
        (0, "abc"), (0, "cd"), (1, ""), (2, "xy")
    ]
    pk = pack_sequences(ray.data.from_arrow(t), capacity=4).to_pandas()
    pk = pk.sort_values("doc_id").reset_index(drop=True)
    assert list(pk["n_tokens"]) == [1, 0, 1]
    assert list(pk["tok_offset"]) == [0, 1, 1]


def test_epoch_shuffle_deterministic_permutation(ray_session):
    import hashlib
    import struct

    import ray.data
    from image_deduplication_3m_images_ray.extras.transforms import epoch_shuffle

    n = 200
    ids = (np.arange(n, dtype=np.int64) * 13 + 5)[::-1].copy()
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})

    def h(i, epoch):
        d = hashlib.md5(f"{i}:{epoch}".encode()).digest()
        return struct.unpack("<Q", d[8:16])[0] % 2**63

    out = (
        epoch_shuffle(ray.data.from_arrow(tbl).repartition(7), epoch=3)
        .to_pandas()
        .set_index("doc_id")
    )
    assert sorted(out["pos"]) == list(range(1, n + 1))  # a permutation
    expect = sorted(ids, key=lambda i: (h(i, 3), i))
    for rank, i in enumerate(expect, 1):
        assert out.loc[i, "pos"] == rank
    # a different epoch is a different permutation of the same ids
    out0 = epoch_shuffle(ray.data.from_arrow(tbl), epoch=0).to_pandas().set_index("doc_id")
    assert sorted(out0["pos"]) == list(range(1, n + 1))
    assert (out0["pos"].reindex(out.index) != out["pos"]).any()
    # partitioning does not change the order
    out2 = epoch_shuffle(ray.data.from_arrow(tbl), epoch=3).to_pandas().set_index("doc_id")
    assert (out2["pos"].reindex(out.index) == out["pos"]).all()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="epoch"):
        epoch_shuffle(ray.data.from_arrow(tbl), epoch=-1)


# --- normalize_array whitespace-collapse fast path (round 5) ---------------

_WS_REF_CASES = [
    "", " ", "  ", "a", " a ", "a  b", "\t\n\f\r", "a\t\tb\nc", "a \t b",
    "\x0b", "a\x0bb", " \x0b ", "a \x0b b",            # \x0b forces the regex path
    "\xa0", "a\xa0b", " \xa0a\xa0 ", "\x85x\x85",       # unicode ws: neither path splits
    "é  Ü", "İstanbul  ŞEHIR", "\r\n\r\n", "x \t y \n z", "a　b", "ffi  ı",
]


def _normalize_regex_ref(texts):
    """The pre-round-5 composition normalize_array must stay equal to:
    unicodedata NFC -> pc.utf8_lower -> RE2 \\s+ collapse -> unicode trim."""
    import unicodedata

    import pyarrow.compute as pc

    arr = pc.utf8_lower(
        pa.array([unicodedata.normalize("NFC", t) for t in texts], pa.string())
    )
    arr = pc.replace_substring_regex(arr, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(arr).to_pylist()


def test_normalize_fast_path_matches_regex_reference():
    from image_deduplication_3m_images_ray.functions.text import normalize_array

    got = normalize_array(pa.array(_WS_REF_CASES, pa.string())).to_pylist()
    ref = _normalize_regex_ref(_WS_REF_CASES)
    assert got == ref


def test_normalize_fast_path_fuzz():
    from image_deduplication_3m_images_ray.functions.text import normalize_array

    rng = np.random.default_rng(7)
    alphabet = list("ab .\t\n\f\r\x0b\xa0\x85é　")
    fuzz = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 60)))
        for _ in range(4000)
    ]
    got = normalize_array(pa.array(fuzz, pa.string())).to_pylist()
    assert got == _normalize_regex_ref(fuzz)


def test_normalize_nulls_take_regex_path():
    from image_deduplication_3m_images_ray.functions.text import normalize_array

    arr = pa.array(["a  b", None, " c\t"], pa.string())
    assert normalize_array(arr).to_pylist() == ["a b", None, "c"]

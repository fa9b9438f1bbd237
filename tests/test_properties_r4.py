"""Property tests for round-4 kernels (no Ray session needed)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from image_deduplication_3m_images_ray.extras.transforms import chunk_table


@given(
    st.lists(st.text(min_size=0, max_size=120), min_size=0, max_size=8),
    st.integers(1, 40),
    st.integers(1, 40),
)
@settings(max_examples=300, deadline=None)
def test_chunk_table_matches_python_slicing(texts, width, stride):
    """chunk_table == per-doc Python slicing on arbitrary unicode, for any
    width/stride — covers the ASCII byte-gather and the codepoint fallback
    (mixed batches route whole-batch to the fallback)."""
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = chunk_table(t, width, stride)
    got = list(
        zip(
            out["doc_id"].to_pylist(),
            out["chunk_id"].to_pylist(),
            out["chunk_text"].to_pylist(),
        )
    )
    exp = []
    for d, s in enumerate(texts):
        n_chunks = (max(len(s) - width, 0) + stride - 1) // stride + 1
        for i in range(n_chunks):
            exp.append((d, i, s[i * stride : i * stride + width]))
    assert got == exp


@given(st.text(min_size=0, max_size=200), st.integers(1, 30))
@settings(max_examples=200, deadline=None)
def test_chunk_table_reconstruction(text, stride):
    """With width == 2*stride, dropping each later chunk's leading overlap
    and concatenating reproduces the document exactly."""
    width = 2 * stride
    t = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array([text], pa.string())}
    )
    out = chunk_table(t, width, stride)
    chunks = out["chunk_text"].to_pylist()
    overlap = width - stride
    rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
    # trailing chunks may re-cover already-seen text when len < width;
    # reconstruction only claims prefix equality up to the doc end
    assert rebuilt[: len(text)] == text


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=12
    ),
    st.integers(2, 5),
)
@settings(max_examples=60, deadline=None)
def test_exact_substring_layout_kernel(texts, k):
    """The batch layout kernel's token/occurrence geometry matches Python
    split semantics on arbitrary space-separated (incl. empty-token) text."""
    import pyarrow as pa

    from image_deduplication_3m_images_ray.extras.exactsubstr import _layout

    arr = pa.array(texts, pa.string())
    lay = _layout(arr, k)
    toks = [t.split(" ") for t in texts]
    assert list(lay.n_tok) == [len(t) for t in toks]
    # every gram occurrence slice equals the joined token window
    grams = lay.gram_arr.to_pylist()
    j = 0
    for d, t in enumerate(toks):
        for i in range(max(len(t) - k + 1, 0)):
            want = " ".join(t[i : i + k]).encode()
            assert grams[j] == want
            assert lay.occ_doc[j] == d and lay.occ_pos[j] == i
            j += 1
    assert j == len(grams)


@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab é中")), min_size=0, max_size=40
        ),
        min_size=0,
        max_size=6,
    ),
    st.lists(
        st.text(alphabet=st.sampled_from(list("abé")), min_size=1, max_size=3),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=300, deadline=None)
def test_bm25_hit_kernel_matches_python_split(texts, terms):
    """The BM25 tokenizer + query-hit kernel == Python str.split(' ') counts
    on arbitrary unicode, including empty tokens from repeated spaces."""
    import numpy as np

    from image_deduplication_3m_images_ray.extras.retrieval import (
        _block_tokens,
        _term_hits,
    )

    qarr = np.asarray(sorted(set(terms)), dtype=np.str_)
    col = pa.chunked_array([pa.array(texts, pa.string())])
    flat, offs = _block_tokens(col)
    doc_of, qi, n_rows = _term_hits(flat, offs, qarr)
    assert n_rows == len(texts)
    got = {}
    for d, q in zip(doc_of, qi):
        got[(int(d), str(qarr[q]))] = got.get((int(d), str(qarr[q])), 0) + 1
    exp = {}
    for d, s in enumerate(texts):
        toks = s.split(" ")
        for q in set(terms):
            c = toks.count(q)
            if c:
                exp[(d, q)] = c
    assert got == exp
    # per-doc token counts match the string_split contract
    assert np.diff(offs).tolist() == [len(s.split(" ")) for s in texts]

"""Fixture-generator determinism + HTML-extraction invariant (no Ray)."""

import numpy as np
import pyarrow.compute as pc

from image_deduplication_3m_images_ray.fixtures import generate_corpus
from image_deduplication_3m_images_ray.functions.extract import extract_text


def test_generator_deterministic():
    p1, t1 = generate_corpus(300, seed=42)
    p2, t2 = generate_corpus(300, seed=42)
    assert p1.equals(p2)
    assert t1.equals(t2)
    p3, _ = generate_corpus(300, seed=43)
    assert not p3.equals(p1)


def test_row_classes_present(tiny_corpus):
    _, truth = tiny_corpus
    classes = set(truth["class"].to_pylist())
    assert {
        "unique",
        "exact_dup",
        "near_dup_light",
        "near_dup_heavy",
        "substring_dup",
        "boilerplate_nondup",
    } <= classes


def test_giant_cluster_planted(tiny_corpus):
    _, truth = tiny_corpus
    cids = np.array(truth["true_cluster_id"].to_pylist())
    sizes = np.bincount(cids)
    assert sizes.max() >= 5  # the planted giant cluster (200 rows -> size 5)


def test_extraction_byte_identical(tiny_corpus):
    """north rule: byte-identical extracted text per url vs the text column."""
    pages, truth = tiny_corpus
    body = {u: b for u, b in zip(truth["url"].to_pylist(), truth["body"].to_pylist())}
    for url, html, text in zip(
        pages["url"].to_pylist(), pages["html"].to_pylist(), pages["text"].to_pylist()
    ):
        got = extract_text(html)
        assert got == body[url], url
        if text:  # populated rows: text column must equal extraction exactly
            assert got == text


def test_some_rows_need_extraction(tiny_corpus):
    pages, _ = tiny_corpus
    n_empty = pc.sum(pc.equal(pages["text"], "").cast("int64")).as_py()
    assert 0.1 * len(pages) < n_empty < 0.3 * len(pages)

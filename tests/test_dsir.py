"""Tests for DSIR hashed-bigram importance weights (extras/dsir.py)."""

import hashlib
import math

import numpy as np
import pyarrow as pa


def _bucket(gram: str, n_buckets: int) -> int:
    return int.from_bytes(hashlib.md5(gram.encode()).digest()[8:16], "little") % n_buckets


def _naive_dsir(raw_texts, target_texts, n_buckets):
    """Pure-Python reference: add-one-smoothed hashed-bigram log ratio."""

    def grams(text):
        toks = text.split(" ")
        return [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]

    def counts(texts):
        c = np.zeros(n_buckets, dtype=np.int64)
        for t in texts:
            for g in grams(t):
                c[_bucket(g, n_buckets)] += 1
        return c

    tc, qc = counts(target_texts), counts(raw_texts)
    lr = np.log((tc + 1.0) / (tc.sum() + n_buckets)) - np.log(
        (qc + 1.0) / (qc.sum() + n_buckets)
    )
    out = []
    for t in raw_texts:
        gs = grams(t)
        out.append((len(gs), float(sum(lr[_bucket(g, n_buckets)] for g in gs))))
    return out


def _naive_nb(score_texts, train, n_buckets):
    """Pure-Python multinomial NB with microbit quantization."""

    def grams(text):
        toks = text.split(" ")
        return [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]

    classes = sorted({lab for lab, _ in train})
    mat = {c: np.zeros(n_buckets, np.int64) for c in classes}
    nd = {c: 0 for c in classes}
    for lab, text in train:
        nd[lab] += 1
        for g in grams(text):
            mat[lab][_bucket(g, n_buckets)] += 1
    tot = sum(nd.values())
    mlp = {
        c: np.floor(
            np.log((mat[c] + 1.0) / (mat[c].sum() + n_buckets)) * 1e6 + 0.5
        ).astype(np.int64)
        for c in classes
    }
    prior = {
        c: int(np.floor(math.log(nd[c] / tot) * 1e6 + 0.5)) for c in classes
    }
    out = []
    for text in score_texts:
        scores = [
            prior[c] + int(sum(mlp[c][_bucket(g, n_buckets)] for g in grams(text)))
            for c in classes
        ]
        best = max(range(len(classes)), key=lambda i: (scores[i], -i))
        second = (
            max(s for i, s in enumerate(scores) if i != best)
            if len(classes) > 1
            else scores[best]
        )
        out.append((classes[best], scores[best], scores[best] - second))
    return out


def test_nb_classify_matches_naive_reference(ray_session):
    import ray.data

    from image_deduplication_3m_images_ray.extras.dsir import nb_classify

    train = [
        ("cat", "meow purr meow whiskers purr"),
        ("cat", "whiskers meow nap purr"),
        ("dog", "woof bark fetch woof"),
        ("dog", "bark fetch bone woof bark"),
        ("dog", "bone fetch walk bark"),
    ]
    score = [
        "meow purr nap",
        "bark bone fetch",
        "walk fetch whiskers",
        "",            # gram-less -> prior argmax
        "single",      # single token -> no bigrams
    ]
    expect = _naive_nb(score, train, 256)
    train_t = pa.table(
        {
            "doc_id": pa.array(range(len(train)), pa.int64()),
            "lang": pa.array([l for l, _ in train]),
            "text": pa.array([t for _, t in train]),
        }
    )
    score_t = pa.table(
        {
            "doc_id": pa.array(range(len(score)), pa.int64()),
            "text": pa.array(score),
        }
    )
    for blocks in (1, 3):
        out = (
            nb_classify(
                ray.data.from_arrow(score_t).repartition(blocks),
                train=ray.data.from_arrow(train_t).repartition(blocks),
                n_buckets=256,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        got = list(
            zip(out["pred_label"], out["score_micro"], out["margin_micro"])
        )
        assert got == expect


def test_nb_classify_max_classes_raises(ray_session):
    import pytest
    import ray.data

    from image_deduplication_3m_images_ray.extras.dsir import nb_classify

    t = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "lang": pa.array([f"l{i}" for i in range(6)]),
            "text": pa.array(["a b"] * 6),
        }
    )
    with pytest.raises(ValueError, match="max_classes"):
        nb_classify(ray.data.from_arrow(t), n_buckets=64, max_classes=3).to_pandas()


def test_dsir_weights_match_naive_reference(ray_session):
    import ray.data

    from image_deduplication_3m_images_ray.extras.dsir import dsir_weights

    rng = np.random.RandomState(11)
    en = ["the", "and", "market", "river", "story", "window", "before"]
    de = ["und", "der", "markt", "fluss", "fenster", "vorher", "einfach"]
    raw_texts = []
    for i in range(40):
        vocab = en if i % 2 else de
        raw_texts.append(" ".join(vocab[j] for j in rng.randint(0, len(vocab), 25)))
    raw_texts.append("")  # no bigrams -> weight exactly 0
    target_texts = [
        " ".join(en[j] for j in rng.randint(0, len(en), 30)) for _ in range(15)
    ]
    n_buckets = 64

    raw = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(raw_texts)), pa.int64()),
                "text": pa.array(raw_texts, pa.string()),
            }
        )
    )
    target = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(target_texts)), pa.int64()),
                "text": pa.array(target_texts, pa.string()),
            }
        )
    )
    got = (
        dsir_weights(raw, target, n_buckets=n_buckets, batch_size=7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _naive_dsir(raw_texts, target_texts, n_buckets)
    assert list(got.columns) == ["doc_id", "n_grams", "log_weight"]
    assert len(got) == len(raw_texts)
    for i, (n_g, lw) in enumerate(want):
        assert got.loc[i, "n_grams"] == n_g
        assert math.isclose(got.loc[i, "log_weight"], lw, abs_tol=1e-9)
    # empty doc: defined, zero
    assert got.iloc[-1]["n_grams"] == 0 and got.iloc[-1]["log_weight"] == 0.0

    # semantic sanity: English docs (the target language) outscore German ones
    en_w = got.loc[[i for i in range(40) if i % 2], "log_weight"]
    de_w = got.loc[[i for i in range(40) if not i % 2], "log_weight"]
    assert en_w.min() > de_w.max()

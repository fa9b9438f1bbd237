"""Bigram LM scoring (extras/lm.py) — Python-reference parity, pruning,
cross-corpus scoring, and the broadcast-bound raise."""

import collections
import math

import numpy as np
import pyarrow as pa
import pytest


def _ds(texts, ids=None, parts=1):
    import ray.data

    ids = list(range(len(texts))) if ids is None else ids
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(parts) if parts > 1 else ds


def _reference(score_texts, model_texts, min_count):
    """Pure-Python add-one bigram LM with microbit pinning."""
    big = collections.Counter()
    ctx = collections.Counter()
    vocab = set()
    for t in model_texts:
        tk = t.split(" ")
        vocab.update(tk)
        for i in range(len(tk) - 1):
            big[(tk[i], tk[i + 1])] += 1
            ctx[tk[i]] += 1
    v = len(vocab)
    model = {g: c for g, c in big.items() if c >= min_count}
    out = []
    for t in score_texts:
        tk = t.split(" ")
        smb = noov = nb = 0
        for i in range(len(tk) - 1):
            c12 = model.get((tk[i], tk[i + 1]), 0)
            noov += c12 == 0
            y = math.log2((ctx[tk[i]] + v) / (c12 + 1))
            smb += math.floor(y * 1e6 + 0.5)
            nb += 1
        out.append((nb, noov, smb, (smb / 1e6) / nb if nb else 0.0))
    return out


TEXTS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "a dog ran in the park",
    "the cat sat on the mat",
    "completely different words entirely here now",
    "x",
    "",
    "the the the the",
    "on the mat the cat sat quietly near the mat",
]


@pytest.mark.parametrize("parts", [1, 5])
def test_lm_score_matches_reference(ray_session, parts):
    from image_deduplication_3m_images_ray.extras.lm import lm_score

    got = (
        lm_score(_ds(TEXTS, parts=parts), min_count=2)
        .sort("doc_id")
        .to_pandas()
    )
    ref = _reference(TEXTS, TEXTS, 2)
    for i, (nb, noov, smb, bits) in enumerate(ref):
        row = got.iloc[i]
        assert (row.n_bigrams, row.n_oov, row.sum_microbits) == (nb, noov, smb)
        assert row.bits_per_bigram == bits


def test_lm_score_min_count_prunes(ray_session):
    from image_deduplication_3m_images_ray.extras.lm import lm_score

    # min_count=1 keeps every bigram -> zero OOV when self-scored
    full = lm_score(_ds(TEXTS), min_count=1).sort("doc_id").to_pandas()
    assert int(full.n_oov.sum()) == 0
    pruned = lm_score(_ds(TEXTS), min_count=3).sort("doc_id").to_pandas()
    assert int(pruned.n_oov.sum()) > 0
    ref = _reference(TEXTS, TEXTS, 3)
    assert list(pruned.sum_microbits) == [r[2] for r in ref]


def test_lm_score_cross_corpus(ray_session):
    """Scoring a different corpus: unseen contexts fall back to c1 = 0."""
    from image_deduplication_3m_images_ray.extras.lm import lm_score

    model_texts = TEXTS
    score_texts = ["the cat sat on the mat", "zz yy xx ww vv", "the cat drank milk"]
    got = (
        lm_score(
            _ds(score_texts), model_docs=_ds(model_texts), min_count=2
        )
        .sort("doc_id")
        .to_pandas()
    )
    big = collections.Counter()
    ctx = collections.Counter()
    vocab = set()
    for t in model_texts:
        tk = t.split(" ")
        vocab.update(tk)
        for i in range(len(tk) - 1):
            big[(tk[i], tk[i + 1])] += 1
            ctx[tk[i]] += 1
    v = len(vocab)
    model = {g: c for g, c in big.items() if c >= 2}
    for i, t in enumerate(score_texts):
        tk = t.split(" ")
        smb = 0
        for j in range(len(tk) - 1):
            c12 = model.get((tk[j], tk[j + 1]), 0)
            smb += math.floor(math.log2((ctx.get(tk[j], 0) + v) / (c12 + 1)) * 1e6 + 0.5)
        assert got.iloc[i].sum_microbits == smb
    # model-like text scores strictly better than gibberish
    assert got.iloc[0].bits_per_bigram < got.iloc[1].bits_per_bigram


def test_lm_score_model_bound_raises(ray_session):
    from image_deduplication_3m_images_ray.extras.lm import lm_score

    with pytest.raises(ValueError, match="max_model_rows"):
        lm_score(_ds(TEXTS), min_count=1, max_model_rows=3).materialize()


def test_lm_score_validates_min_count(ray_session):
    from image_deduplication_3m_images_ray.extras.lm import lm_score

    with pytest.raises(ValueError, match="min_count"):
        lm_score(_ds(TEXTS), min_count=0)


def test_lm_score_sum_is_order_exact(ray_session):
    """Partitioning must not change a single microbit (integer sums)."""
    from image_deduplication_3m_images_ray.extras.lm import lm_score

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(0, 60)))
        for _ in range(120)
    ]
    a = lm_score(_ds(texts, parts=1), min_count=2).sort("doc_id").to_pandas()
    b = lm_score(_ds(texts, parts=16), min_count=2).sort("doc_id").to_pandas()
    assert list(a.sum_microbits) == list(b.sum_microbits)
    assert list(a.bits_per_bigram) == list(b.bits_per_bigram)


def test_perplexity_buckets_ccnet_terciles(ray_session):
    """Bucket = NTILE(3) per lang over (bits asc, doc_id); sizes and
    membership match a Python replay of lm_score's own output."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.lm import lm_score, perplexity_buckets

    rng = np.random.default_rng(7)
    langs, texts, ids = [], [], []
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    for i in range(40):
        lang = "aa" if i % 3 else "bb"
        n = int(rng.integers(2, 30))
        texts.append(" ".join(rng.choice(words, n)))
        langs.append(lang)
        ids.append(1000 - i)  # non-monotone ids exercise the tiebreak
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = perplexity_buckets(ds, min_count=2).to_pandas()

    scored = lm_score(ds, min_count=2).to_pandas().set_index("doc_id")
    bits = {i: scored.loc[i, "bits_per_bigram"] for i in ids}
    for lang in ("aa", "bb"):
        members = sorted(
            (i for i, l in zip(ids, langs) if l == lang),
            key=lambda i: (bits[i], i),
        )
        n, q = len(members), 3
        hi, cut = -(-n // q), n % q  # ceil, and how many buckets get it
        expect = {}
        pos = 0
        for tile in range(1, q + 1):
            size = hi if (cut == 0 or tile <= cut) else n // q
            for j, m in enumerate(members[pos : pos + size]):
                expect[m] = (pos + j + 1, tile)
            pos += size
        sub = out[out["lang"] == lang].set_index("doc_id")
        assert len(sub) == n
        for m in members:
            assert sub.loc[m, "rank"] == expect[m][0], m
            assert sub.loc[m, "tile"] == expect[m][1], m
        name = {1: "head", 2: "middle", 3: "tail"}
        assert (sub["bucket"] == sub["tile"].map(name)).all()

"""Unit tests for the set-similarity extras: containment join, source
overlap, and the keep-latest recrawl dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_containment(df, threshold, k=5):
    """Per-pair exact containment over distinct shingle sets (oracle)."""
    from image_deduplication_3m_images_ray.functions.text import shingle_set

    sets = {r.doc_id: set(shingle_set(r.text, k).tolist()) for r in df.itertuples()}
    rows = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            ca, cb = inter / len(sets[a]), inter / len(sets[b])
            if ca >= threshold or cb >= threshold:
                rows.append((a, b, inter, round(ca, 6), round(cb, 6)))
    return pd.DataFrame(
        rows, columns=["doc_a", "doc_b", "n_shared", "containment_a", "containment_b"]
    )


def _containment_corpus():
    base = " ".join(f"tok{i}" for i in range(60))
    long_doc = base + " " + " ".join(f"extra{i}" for i in range(400))
    return pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                base,                      # 0: fully contained in 1
                long_doc,                  # 1: superset of 0
                " ".join(f"other{i}" for i in range(80)),   # 2: unrelated
                base,                      # 3: exact copy of 0
                " ".join(f"tok{i}" for i in range(30)),      # 4: half of 0
                "short text",              # 5: short-doc sentinel path
            ],
        }
    )


def test_containment_pairs_matches_bruteforce(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.setsim import containment_pairs

    df = _containment_corpus()
    got = (
        containment_pairs(ray.data.from_pandas(df).repartition(3), threshold=0.4, num_shards=4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    exp = (
        _brute_containment(df, 0.4)
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the planted near-superset: doc 0 inside doc 1, low Jaccard but c_a == 1
    row = got[(got.doc_a == 0) & (got.doc_b == 1)].iloc[0]
    assert row.containment_a == 1.0
    assert row.containment_a >= row.containment_b


def test_containment_detects_what_jaccard_misses(ray_session):
    """The short-in-long pair passes containment 0.9 but NOT Jaccard 0.9."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.setsim import containment_pairs

    df = _containment_corpus().iloc[:2]
    got = containment_pairs(
        ray.data.from_pandas(df), threshold=0.9, num_shards=2
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    jaccard = r.n_shared / (
        r.n_shared / r.containment_a + r.n_shared / r.containment_b - r.n_shared
    )
    assert r.containment_a >= 0.9 and jaccard < 0.9


def test_containment_drop_hot_grams(ray_session):
    """drop_gram_docs_above excludes boilerplate grams from candidates AND counts."""
    import ray.data
    from image_deduplication_3m_images_ray.extras.setsim import containment_pairs

    boiler = " ".join(f"b{i}" for i in range(20))
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [boiler + f" unique{i} " + " ".join(f"u{i}x{j}" for j in range(30)) for i in range(4)],
        }
    )
    exact = containment_pairs(
        ray.data.from_pandas(df), threshold=0.1, num_shards=2
    ).to_pandas()
    assert len(exact) == 6  # all pairs share the boilerplate grams
    dropped = containment_pairs(
        ray.data.from_pandas(df), threshold=0.1, num_shards=2, drop_gram_docs_above=3
    ).to_pandas()
    assert len(dropped) == 0  # boilerplate (in all 4 docs) no longer counts


def test_containment_threshold_validation(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.setsim import containment_pairs

    with pytest.raises(ValueError):
        containment_pairs(ray.data.range(1), threshold=0.0)


def test_source_overlap_manual(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.setsim import source_overlap

    shared = " ".join(f"s{i}" for i in range(20))  # 16 shingles, in A and B
    df = pd.DataFrame(
        {
            "source": ["A", "A", "B", "C"],
            "text": [
                shared,
                " ".join(f"a{i}" for i in range(14)),  # 10 shingles, A only
                shared,
                " ".join(f"c{i}" for i in range(9)),   # 5 shingles, C only
            ],
        }
    )
    got = (
        source_overlap(ray.data.from_pandas(df).repartition(2), num_shards=4)
        .to_pandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    # only (A, B) share grams; C is disjoint and must be absent
    assert got[["source_a", "source_b"]].values.tolist() == [["A", "B"]]
    r = got.iloc[0]
    assert (r.n_a, r.n_b, r.n_shared) == (26, 16, 16)
    assert r.jaccard == round(16 / 26, 6)


def test_source_overlap_empty(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.setsim import source_overlap

    df = pd.DataFrame({"source": ["A"], "text": ["only one source"]})
    got = source_overlap(ray.data.from_pandas(df))
    assert got.count() == 0
    # schema survives the empty result (Ray's to_pandas drops cols at 0 rows)
    assert got.schema().names == ["source_a", "source_b", "n_a", "n_b", "n_shared", "jaccard"]


def test_latest_by_key_matches_pandas(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.relational import latest_by_key

    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 50, n), unit="s"),  # many ts ties
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "event_type": rng.choice(["view", "click", "buy"], n),
            "value": rng.random(n),
        }
    )
    got = (
        latest_by_key(
            ray.data.from_pandas(df).repartition(8),
            keys=["user_id", "event_type"],
            order_col="ts",
            tiebreak="event_id",
            num_shards=4,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["user_id", "event_type", "ts", "event_id"],
                       ascending=[True, True, False, False])
        .groupby(["user_id", "event_type"], as_index=False)
        .head(1)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fuzzy_join_matches_bruteforce(ray_session):
    """Cross-table Jaccard join equals per-pair set arithmetic; within-side
    pairs never emit."""
    import ray.data
    import numpy as np
    import pyarrow as pa
    from image_deduplication_3m_images_ray.extras.setsim import fuzzy_join
    from image_deduplication_3m_images_ray.functions.text import normalize_array

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(300)]
    base = list(rng.choice(vocab, 40))
    left_texts = [
        " ".join(base),                      # near-identical to right 0
        " ".join(rng.choice(vocab, 40)),     # unrelated
        " ".join(base[:20]),                 # partial overlap
        "tiny",                              # short-doc sentinel
    ]
    right_texts = [
        " ".join(base[:-1] + ["extra"]),     # near dup of left 0
        " ".join(rng.choice(vocab, 40)),
        "tiny",                              # short-doc exact match of left 3
        " ".join(base),                      # exact dup of left 0
    ]

    def shingles(s):
        toks = s.split(" ")
        if len(toks) >= 5:
            return {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
        return {s}

    want = []
    for i, lt in enumerate(left_texts):
        for j, rt in enumerate(right_texts):
            a, b = shingles(lt), shingles(rt)
            jac = len(a & b) / len(a | b)
            if jac >= 0.3:
                want.append((i, 100 + j, len(a & b), round(jac, 6)))
    want.sort()
    lds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(left_texts)), pa.int64()),
                "text": pa.array(left_texts, pa.string()),
            }
        )
    ).repartition(2)
    rds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100, 100 + len(right_texts)), pa.int64()),
                "text": pa.array(right_texts, pa.string()),
            }
        )
    ).repartition(3)
    out = (
        fuzzy_join(lds, rds, threshold=0.3, num_shards=4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
    )
    got = list(zip(out["doc_a"], out["doc_b"], out["n_shared"], out["jaccard"]))
    assert got == want
    assert all(a < 100 <= b for a, b, *_ in got)  # strictly cross-side


def test_fuzzy_subtract_matches_bruteforce_both_plans(ray_session):
    """fuzzy_subtract == brute-force NOT-EXISTS over per-pair Jaccard, on
    both the broadcast and the marker-attach drop plans; no-match corpora
    pass through unchanged."""
    import ray.data
    import numpy as np
    import pyarrow as pa
    from image_deduplication_3m_images_ray.extras.setsim import fuzzy_subtract

    rng = np.random.default_rng(77)
    vocab = [f"w{i}" for i in range(300)]
    base = list(rng.choice(vocab, 40))
    new_texts = [
        " ".join(base),                   # near-dup of base 0 -> dropped
        " ".join(rng.choice(vocab, 40)),  # unrelated -> kept
        " ".join(base[:20]),              # partial -> depends on threshold
        "tiny",                           # exact short match -> dropped
    ]
    base_texts = [
        " ".join(base[:-1] + ["extra"]),
        " ".join(rng.choice(vocab, 40)),
        "tiny",
    ]

    def shingles(s):
        toks = s.split(" ")
        if len(toks) >= 5:
            return {" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)}
        return {s}

    thr = 0.3
    want = [
        i
        for i, nt in enumerate(new_texts)
        if not any(
            len(shingles(nt) & shingles(bt)) / len(shingles(nt) | shingles(bt))
            >= thr
            for bt in base_texts
        )
    ]
    assert 0 < len(want) < len(new_texts)  # both outcomes exercised
    nds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(new_texts)), pa.int64()),
                "text": pa.array(new_texts, pa.string()),
                "extra_col": pa.array([f"x{i}" for i in range(len(new_texts))]),
            }
        )
    ).repartition(2)
    bds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100, 100 + len(base_texts)), pa.int64()),
                "text": pa.array(base_texts, pa.string()),
            }
        )
    ).repartition(2)
    for max_drops in (5_000_000, 1):  # broadcast plan, then marker-attach plan
        out = (
            fuzzy_subtract(nds, bds, threshold=thr, broadcast_max_drops=max_drops)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out["doc_id"].tolist() == want
        assert out.columns.tolist() == ["doc_id", "text", "extra_col"]

    # disjoint corpora: everything survives
    far = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([500], pa.int64()),
                "text": pa.array(["zz qq pp totally different words here ok"]),
            }
        )
    )
    out = fuzzy_subtract(nds, far, threshold=thr).to_pandas()
    assert sorted(out["doc_id"].tolist()) == list(range(len(new_texts)))

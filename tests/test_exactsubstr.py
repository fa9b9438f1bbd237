"""Exact substring (duplicated k-gram span) removal — plan equivalence,
brute-force oracle, and edge cases (short docs, within-doc repeats, empty
tokens, unicode, full removal)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from image_deduplication_3m_images_ray.extras.exactsubstr import exact_substring_dedup


def _brute(df, k, min_count=2):
    """Reference implementation: literal gram strings, Python sets."""
    from collections import Counter

    toks = {r.doc_id: r.text.split(" ") for r in df.itertuples()}
    counts = Counter()
    for t in toks.values():
        for i in range(len(t) - k + 1):
            counts[" ".join(t[i : i + k])] += 1
    rows = []
    for doc_id in sorted(toks):
        t = toks[doc_id]
        covered = np.zeros(len(t), dtype=bool)
        for i in range(len(t) - k + 1):
            if counts[" ".join(t[i : i + k])] >= min_count:
                covered[i : i + k] = True
        kept = [w for w, c in zip(t, covered) if not c]
        rows.append((doc_id, " ".join(kept), len(t), int(covered.sum())))
    return pd.DataFrame(rows, columns=["doc_id", "clean_text", "n_tokens", "n_removed"])


def _run(df, ray_session, **kw):
    import ray

    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = exact_substring_dedup(ds, **kw).sort("doc_id").to_pandas()
    return out.reset_index(drop=True)


def _corpus():
    base = " ".join(f"w{i}" for i in range(30))
    shared = " ".join(f"s{i}" for i in range(12))
    return pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                base,                                    # 0: exact copy of 1 -> fully removed
                base,                                    # 1
                "alpha " + shared + " omega",            # 2: shares a 12-token span with 3
                "prefix words " + shared + " tail bit",  # 3
                " ".join(f"u{i}" for i in range(25)),    # 4: unique -> untouched
                "tiny doc",                              # 5: < k tokens -> untouched
                ("r0 r1 r2 r3 r4 r5 r6 r7 " * 2).strip(),  # 6: WITHIN-doc repeat of an 8-gram
                "",                                      # 7: empty text
            ],
        }
    )


@pytest.mark.parametrize("plan", ["broadcast", "sharded"])
def test_matches_bruteforce(ray_session, plan):
    df = _corpus()
    for k in (5, 8):
        out = _run(df, ray_session, k=k, plan=plan, num_shards=4, batch_size=3)
        pd.testing.assert_frame_equal(out, _brute(df, k))


def test_planted_structure(ray_session):
    df = _corpus()
    out = _run(df, ray_session, k=8, plan="broadcast", num_shards=4)
    by = out.set_index("doc_id")
    # exact copies fully removed
    assert by.loc[0, "clean_text"] == "" and by.loc[1, "clean_text"] == ""
    assert by.loc[0, "n_removed"] == 30
    # shared 12-token span removed from both carriers, unique context kept
    assert "s0" not in by.loc[2, "clean_text"] and "alpha" in by.loc[2, "clean_text"]
    assert "s11" not in by.loc[3, "clean_text"] and "prefix" in by.loc[3, "clean_text"]
    # unique + short + empty docs untouched
    assert by.loc[4, "n_removed"] == 0
    assert by.loc[5, "clean_text"] == "tiny doc" and by.loc[5, "n_tokens"] == 2
    assert by.loc[7, "clean_text"] == "" and by.loc[7, "n_tokens"] == 1
    # within-doc repetition counts toward min_count
    assert by.loc[6, "n_removed"] > 0


def test_min_count_and_auto_plan(ray_session):
    df = _corpus()
    # min_count=3: the pairwise duplicates (2 occurrences) no longer qualify
    out3 = _run(df, ray_session, k=8, min_count=3)
    assert (out3.set_index("doc_id").loc[[0, 1, 2, 3], "n_removed"] == 0).all()
    # auto plan falls over to sharded above the broadcast bound; results equal
    auto_small = _run(df, ray_session, k=8, plan="auto", broadcast_max_grams=0)
    pd.testing.assert_frame_equal(auto_small, _brute(df, 8))
    with pytest.raises(ValueError):
        _run(df, ray_session, k=8, plan="broadcast", broadcast_max_grams=0)


def test_unicode_and_empty_tokens(ray_session):
    # multi-byte chars and consecutive spaces (empty tokens) round-trip
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "héllo wörld ñ é ü ç ö ß",
                "héllo wörld ñ é ü ç ö ß",
                "a  b   c a  b   c a  b   c",  # empty tokens, repeated 3-gram runs
                "日本語 テスト 漢字 かな カナ 混合 文字 列",
            ],
        }
    )
    for k in (3, 4):
        out = _run(df, ray_session, k=k, num_shards=2, batch_size=2)
        pd.testing.assert_frame_equal(out, _brute(df, k))


def test_reconstruction_identity(ray_session):
    # with min_count high enough that nothing is duplicated, clean_text == text
    df = _corpus()
    out = _run(df, ray_session, k=8, min_count=99)
    assert (out["clean_text"] == df.sort_values("doc_id")["text"].to_numpy()).all()
    assert (out["n_removed"] == 0).all()

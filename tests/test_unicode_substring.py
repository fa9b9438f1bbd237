"""Character-unit substring-dup contract on non-ASCII text (ADVICE item 2).

The suffix operator windows codepoints directly; the winnow/verify chain
keeps byte machinery (recall-safe) but measures match length in complete
codepoints — both must agree with the SQL oracle's substr/length character
semantics on multi-byte text.
"""

import numpy as np
import pyarrow as pa


GREEK = "αβγδεζηθικλμνξοπρστυφχψω"  # 2 UTF-8 bytes per char


def _greek_run(n_chars: int, salt: str = "") -> str:
    s = (GREEK * (n_chars // len(GREEK) + 2))[:n_chars]
    return salt + s


def test_utf8_run_chars_unit():
    from image_deduplication_3m_images_ray.stages.verify import _utf8_run_chars

    data = "aé𝄞b".encode("utf-8")  # 1 + 2 + 4 + 1 bytes
    assert _utf8_run_chars(data, 0, len(data)) == 4
    assert _utf8_run_chars(data, 0, 2) == 1  # é cut mid-char
    assert _utf8_run_chars(data, 0, 3) == 2
    assert _utf8_run_chars(data, 1, 3) == 1  # starts at é, full é
    assert _utf8_run_chars(data, 2, 3) == 0  # only a continuation byte
    assert _utf8_run_chars(data, 3, 6) == 0  # 𝄞 cut (needs 4 bytes)
    assert _utf8_run_chars(data, 3, 7) == 1
    assert _utf8_run_chars(data, 0, 0) == 0


def test_extend_match_counts_chars_not_bytes():
    from image_deduplication_3m_images_ray.stages.verify import extend_match

    shared = _greek_run(150)  # 150 chars = 300 bytes
    ba = ("X" + shared + "Y").encode("utf-8")
    bb = ("QQ" + shared + "Z").encode("utf-8")
    k = 100  # byte k-gram inside the shared run
    pos_a = 1 + 20
    pos_b = 2 + 20
    got = extend_match(ba, bb, pos_a, pos_b, k)
    assert got == 150, got  # chars, not the 300-byte run length


def test_suffix_pairs_char_windows():
    from image_deduplication_3m_images_ray.extras.suffix import suffix_pairs_in_batch

    L = 50
    shared_chars = _greek_run(L)  # 50 chars = 100 bytes
    short_chars = _greek_run(30)  # 30 chars = 60 bytes >= L bytes but < L chars
    texts = [
        "doc one prefix " + shared_chars,
        "another beginning " + shared_chars + " trailer",
        "third " + short_chars + " unrelated tail one",
        "fourth " + short_chars + " different tail here",
    ]
    ids = np.arange(1, 5)
    pairs = suffix_pairs_in_batch(texts, ids, L)
    assert (1, 2) in pairs  # 50 shared CHARS
    # docs 3,4 share 30 chars (60 bytes): byte unit would emit at L=50, chars must not
    assert (3, 4) not in pairs


def test_dedup_pipeline_winnow_char_unit(ray_session):
    """End-to-end: a 200-CHAR (400-byte) greek overlap pairs two docs; a
    120-char (240-byte) overlap — over the old 200-BYTE bar — must not."""
    import ray.data
    from image_deduplication_3m_images_ray.config import DedupConfig
    from image_deduplication_3m_images_ray.pipelines import dedup_pipeline

    long_shared = _greek_run(200)
    short_shared = _greek_run(120)
    rng = np.random.default_rng(9)

    def filler(i, n=120):
        return " ".join(f"w{i}q{j}x{rng.integers(1e6)}" for j in range(n))

    rows = [
        ("u1", filler(1) + " " + long_shared),
        ("u2", long_shared + " " + filler(2)),
        ("u3", filler(3) + " " + short_shared),
        ("u4", short_shared + " " + filler(4)),
    ]
    pages = pa.table(
        {
            "url": pa.array([f"https://ex.com/{u}" for u, _ in rows], pa.string()),
            "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "html": pa.array([b""] * len(rows), pa.binary()),
            "text": pa.array([t for _, t in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )
    cfg = DedupConfig(signature_concurrency=2, join_num_buckets=4)
    rep = dedup_pipeline(ray.data.from_arrow(pages), cfg).to_pandas()
    by_url = rep.set_index("url")
    c1 = by_url.loc["https://ex.com/u1", "cluster_id"]
    c2 = by_url.loc["https://ex.com/u2", "cluster_id"]
    c3 = by_url.loc["https://ex.com/u3", "cluster_id"]
    c4 = by_url.loc["https://ex.com/u4", "cluster_id"]
    assert c1 == c2, "200 shared chars must cluster"
    assert c3 != c4, "120 shared chars (240 bytes) must NOT cluster under the char unit"

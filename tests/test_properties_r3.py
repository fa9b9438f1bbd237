"""Property tests for round-3 kernels: UTF-8 run counting, DDSketch codes,
Bloom membership.  No Ray needed — pure numpy kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(min_size=0, max_size=60), st.integers(0, 80), st.integers(0, 80))
@settings(max_examples=300, deadline=None)
def test_utf8_run_chars_matches_decode(s, a, b):
    """_utf8_run_chars == len() of the decoded run when the run is cut at
    character boundaries; never negative, never overcounts on torn edges."""
    from image_deduplication_3m_images_ray.stages.verify import _utf8_run_chars

    data = s.encode("utf-8")
    lo, hi = sorted((min(a, len(data)), min(b, len(data))))
    got = _utf8_run_chars(data, lo, hi)
    # oracle: count complete codepoints that START in [lo, hi) and END <= hi
    count = 0
    pos = 0
    for ch in s:
        n = len(ch.encode("utf-8"))
        if pos >= lo and pos + n <= hi:
            count += 1
        pos += n
    assert got == count, (s, lo, hi, got, count)


@given(
    st.lists(st.integers(-(2**62), 2**62), min_size=1, max_size=200),
    st.floats(0.005, 0.2),
)
@settings(max_examples=150, deadline=None)
def test_ddsketch_code_roundtrip_relative_error(vals, alpha):
    """Representative value of each bucket is within alpha of every member,
    and code order equals value order."""
    from image_deduplication_3m_images_ray.extras.sketches import _dd_codes, _dd_values

    gamma = (1 + alpha) / (1 - alpha)
    v = np.asarray(vals, dtype=np.int64)
    codes = _dd_codes(v, gamma)
    reps = _dd_values(codes, gamma)
    nz = v != 0
    rel = np.abs(reps[nz] - v[nz]) / np.abs(v[nz])
    assert (rel <= alpha + 1e-9).all(), rel.max()
    assert (reps[~nz] == 0).all()
    # order preservation: sorting by code never inverts a strict value order
    order = np.argsort(v, kind="stable")
    assert (np.diff(codes[order]) >= 0).all()


@given(
    st.lists(
        st.floats(-1e12, 1e12, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=200,
    ),
    st.floats(0.005, 0.2),
)
@settings(max_examples=150, deadline=None)
def test_ddsketch_code_roundtrip_float(vals, alpha):
    """Float support (round-3 verdict item 6): the alpha bound and the code
    ordering hold for magnitudes below 1 and fractional values too."""
    from image_deduplication_3m_images_ray.extras.sketches import _dd_codes, _dd_values

    gamma = (1 + alpha) / (1 - alpha)
    v = np.asarray(vals, dtype=np.float64)
    codes = _dd_codes(v, gamma)
    reps = _dd_values(codes, gamma)
    nz = v != 0
    rel = np.abs(reps[nz] - v[nz]) / np.abs(v[nz])
    assert (rel <= alpha + 1e-9).all(), rel.max()
    assert (reps[~nz] == 0).all()
    order = np.argsort(v, kind="stable")
    assert (np.diff(codes[order]) >= 0).all()


def test_ddsketch_rejects_non_finite():
    import pytest

    from image_deduplication_3m_images_ray.extras.sketches import _dd_codes

    with pytest.raises(ValueError):
        _dd_codes(np.array([1.0, np.nan]), 1.02)
    with pytest.raises(ValueError):
        _dd_codes(np.array([np.inf]), 1.02)


@given(
    st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=500),
    st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=500),
)
@settings(max_examples=100, deadline=None)
def test_bloom_never_false_negative(members, probes):
    from image_deduplication_3m_images_ray.functions.bloom import BloomFilter

    m = np.asarray(members, dtype=np.uint64)
    bf = BloomFilter(1 << 14, 8).add(m)
    assert bf.contains(m).all()
    p = np.asarray(probes, dtype=np.uint64)
    hit = bf.contains(p)
    in_set = np.isin(p, m)
    assert hit[in_set].all()  # members always hit regardless of other probes

"""payload_feature_stage — byte histogram/entropy vs a pure-Python reference,
including sliced blocks and cosine-compat of the hist column."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from image_deduplication_3m_images_ray.extras.multimodal import (
    make_fake_media,
    payload_feature_stage,
)


def _ref(payload: bytes):
    n = len(payload)
    if n == 0:
        return 0, 0.0, [0.0] * 256
    from collections import Counter

    c = Counter(payload)
    p = [c.get(i, 0) / n for i in range(256)]
    ent = -sum(x * math.log2(x) for x in p if x > 0)
    return n, ent, p


def test_payload_features_match_reference(ray_session):
    t = make_fake_media(40, seed=7)
    for parts in (1, 4):
        ds = ray.data.from_arrow(t).repartition(parts)
        out = (
            payload_feature_stage(ds, batch_size=16)
            .to_pandas()
            .sort_values("media_id")
            .reset_index(drop=True)
        )
        payloads = t["payload"].to_pylist()
        for i in range(40):
            n, ent, p = _ref(payloads[i])
            assert out.loc[i, "n_bytes"] == n
            assert abs(out.loc[i, "byte_entropy"] - ent) < 1e-9
            np.testing.assert_allclose(out.loc[i, "hist"], p, atol=1e-12)


def test_payload_features_empty_and_hist_sums(ray_session):
    t = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "kind": pa.array(["image", "audio"], pa.string()),
            "payload": pa.array([b"", b"\x00\xff\x00"], pa.binary()),
        }
    )
    out = (
        payload_feature_stage(ray.data.from_arrow(t))
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "n_bytes"] == 0 and out.loc[0, "byte_entropy"] == 0.0
    assert sum(out.loc[0, "hist"]) == 0.0  # empty payload: all-zero hist
    assert abs(sum(out.loc[1, "hist"]) - 1.0) < 1e-12
    assert abs(out.loc[1, "byte_entropy"] - (-(2 / 3) * math.log2(2 / 3) - (1 / 3) * math.log2(1 / 3))) < 1e-12

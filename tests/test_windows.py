"""Unit tests for windowed aggregates + sessionization."""

import numpy as np
import pyarrow as pa


def _events():
    base = 1_700_000_000_000_000  # us
    rows = [
        # user 1: two sessions (gap > 30 min between idx 1 and 2)
        (0, base + 0, 1, "click", 1.00),
        (1, base + 60_000_000, 1, "click", 2.50),
        (2, base + 3_600_000_000, 1, "view", 3.00),
        # user 2: one session
        (3, base + 10_000_000, 2, "click", 4.25),
        (4, base + 20_000_000, 2, "click", 0.75),
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def test_tumbling_window_agg(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.windows import tumbling_window_agg

    out = (
        tumbling_window_agg(ray.data.from_arrow(_events()), window_sec=3600)
        .to_pandas()
        .set_index(["event_type", "window_start"])
        .sort_index()
    )
    w0 = 1_700_000_000 // 3600 * 3600
    assert out.loc[("click", w0), "n_events"] == 4
    assert out.loc[("click", w0), "sum_cents"] == 100 + 250 + 425 + 75
    assert out.loc[("view", w0 + 3600), "n_events"] == 1


def test_sessionize(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.windows import sessionize

    out = (
        sessionize(ray.data.from_arrow(_events()), gap_sec=1800)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    u1 = out[out["user_id"] == 1]
    assert list(u1["session_id"]) == [0, 1]
    assert list(u1["n_events"]) == [2, 1]
    u2 = out[out["user_id"] == 2]
    assert list(u2["session_id"]) == [0]
    assert list(u2["n_events"]) == [2]

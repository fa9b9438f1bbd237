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


def test_sliding_window_agg(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.windows import sliding_window_agg

    out = (
        sliding_window_agg(ray.data.from_arrow(_events()), window_sec=3600, hop_sec=900)
        .to_pandas()
        .set_index(["event_type", "window_start"])
        .sort_index()
    )
    # every event appears in exactly 4 windows
    assert int(out["n_events"].sum()) == 4 * 5
    t0 = 1_700_000_000
    w = t0 // 900 * 900
    # the window containing all 4 clicks (they span < 900s starting at t0)
    assert out.loc[("click", w), "n_events"] == 4
    assert out.loc[("click", w), "sum_cents"] == 100 + 250 + 425 + 75
    # the same 4 clicks also count in the 3 preceding hop windows
    for i in (1, 2, 3):
        assert out.loc[("click", w - 900 * i), "n_events"] == 4


def test_asof_join_latest(ray_session):
    """Hand-built expectations + pandas.merge_asof as an independent oracle."""
    import pandas as pd
    import ray.data
    from image_deduplication_3m_images_ray.extras.windows import asof_join_latest

    ev = ray.data.from_arrow(_events())
    left = ev.filter(expr="event_type == 'view'").select_columns(
        ["event_id", "ts", "user_id"]
    )
    right = ev.filter(expr="event_type == 'click'")
    out = (
        asof_join_latest(left, right, payload={"value": "ref_value"})
        .to_pandas()
        .set_index("event_id")
    )
    # user 1's view at base+3600s matches their click at base+60s
    assert out.loc[2, "ref_event_id"] == 1
    assert out.loc[2, "ref_value"] == 2.50
    assert out.loc[2, "lag_us"] == 3_600_000_000 - 60_000_000

    # randomized cross-check vs pandas.merge_asof (backward, inclusive);
    # duplicate timestamps exercise the largest-event_id tie-break
    rng = np.random.default_rng(7)
    n = 600
    base = 1_700_000_000_000_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(
                base + rng.integers(0, 50, n).astype(np.int64) * 1_000_000, unit="us"
            ),
            "user_id": rng.integers(0, 8, n).astype(np.int64),
            "side": rng.integers(0, 2, n),
            "value": np.round(rng.uniform(0, 10, n), 2),
        }
    )
    lpd = df[df["side"] == 1][["event_id", "ts", "user_id"]].reset_index(drop=True)
    rpd = df[df["side"] == 0][["event_id", "ts", "user_id", "value"]].reset_index(drop=True)
    got = (
        asof_join_latest(
            ray.data.from_pandas(lpd),
            ray.data.from_pandas(rpd),
            payload={"value": "ref_value"},
            num_shards=5,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpd.sort_values(["ts", "event_id"], kind="mergesort"),
        rpd.sort_values(["ts", "event_id"], kind="mergesort"),
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
        suffixes=("", "_r"),
    ).sort_values("event_id")
    exp["ref_event_id"] = exp["event_id_r"].fillna(-1).astype(np.int64)
    exp["ref_value"] = exp["value"].fillna(0.0)
    exp = exp.reset_index(drop=True)
    assert len(got) == len(exp)
    assert list(got["ref_event_id"]) == list(exp["ref_event_id"])
    assert list(got["ref_value"]) == list(exp["ref_value"])
    unmatched = got["ref_event_id"] == -1
    assert (got.loc[unmatched, "lag_us"] == -1).all()
    assert (got.loc[~unmatched, "lag_us"] >= 0).all()


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


def test_rolling_agg(ray_session):
    import ray.data
    from image_deduplication_3m_images_ray.extras.windows import rolling_agg

    out = (
        rolling_agg(ray.data.from_arrow(_events()), window_rows=2, num_shards=2)
        .to_pandas()
        .set_index("event_id")
        .sort_index()
    )
    # user 1 events in ts order: 0 (100c), 1 (250c), 2 (300c)
    assert out.loc[0, "roll_sum_cents"] == 100 and out.loc[0, "roll_n"] == 1
    assert out.loc[1, "roll_sum_cents"] == 350 and out.loc[1, "roll_n"] == 2
    assert out.loc[2, "roll_sum_cents"] == 550 and out.loc[2, "roll_n"] == 2
    # user 2: 3 (425c), 4 (75c)
    assert out.loc[3, "roll_sum_cents"] == 425 and out.loc[3, "roll_n"] == 1
    assert out.loc[4, "roll_sum_cents"] == 500 and out.loc[4, "roll_n"] == 2

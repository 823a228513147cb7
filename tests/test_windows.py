"""Windowed event operators: sessionize, sliding windows, as-of join."""

import pandas as pd


def _events():
    rows = []
    base = pd.Timestamp("2024-01-01")
    # user 1: two sessions (gap 3600s > 1800s threshold)
    for m in (0, 10, 20, 80, 90):
        rows.append({"user_id": 1, "ts": base + pd.Timedelta(minutes=m), "value": 1.0,
                     "event_type": "click", "event_id": len(rows)})
    # user 2: one session
    for m in (5, 6):
        rows.append({"user_id": 2, "ts": base + pd.Timedelta(minutes=m), "value": 2.0,
                     "event_type": "error", "event_id": len(rows)})
    return rows


def test_sessionize(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.windows import sessionize

    out = sessionize(rd.from_items(_events()), "user_id", "ts", 1800).to_pandas()
    out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert out[["user_id", "session_id", "n_events"]].values.tolist() == [
        [1, 1, 3], [1, 2, 2], [2, 1, 2],
    ]
    s1 = out.iloc[0]
    assert s1["session_start"] == pd.Timestamp("2024-01-01 00:00:00")
    assert s1["session_end"] == pd.Timestamp("2024-01-01 00:20:00")


def test_sliding_window_agg(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.windows import sliding_window_agg

    out = sliding_window_agg(
        rd.from_items(_events()), "ts", "value", width_s=3600, slide_s=1800
    ).to_pandas()
    # events at minutes 0..20 + 5,6 fall in windows starting at -1800 and 0;
    # events at 80,90 in windows starting 3600 and 5400... verify counts by
    # brute force
    df = pd.DataFrame(_events())
    sec = (df["ts"].astype("int64") // 10**9)
    want = {}
    for s in sec:
        for k in (0, 1):
            w = (s - k * 1800) // 1800 * 1800
            if w <= s < w + 3600:
                want[w] = want.get(w, 0) + 1
    got = dict(zip(out["window_start"], out["n_events"]))
    assert got == want


def test_asof_join(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.windows import asof_join

    rows = _events()
    ds = rd.from_items(rows)
    clicks = ds.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id"]
    )
    errors = ds.filter(expr="event_type == 'error'").select_columns(
        ["ts", "user_id", "value"]
    )
    out = asof_join(clicks, errors, "user_id", "ts", ["value"]).to_pandas()
    # clicks belong to user 1, errors to user 2 -> no matches at all
    assert out["ts_right"].isna().all() and len(out) == 5

    # now same-user: errors for user 1 at minute 15
    rows.append({"user_id": 1, "ts": pd.Timestamp("2024-01-01 00:15:00"),
                 "value": 9.0, "event_type": "error", "event_id": 99})
    ds = rd.from_items(rows)
    clicks = ds.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "ts", "user_id"]
    )
    errors = ds.filter(expr="event_type == 'error'").select_columns(
        ["ts", "user_id", "value"]
    )
    out = asof_join(clicks, errors, "user_id", "ts", ["value"]).to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    # clicks at minutes 0,10 precede the error -> unmatched; 20,80,90 match it
    matched = out[out["ts_right"].notna()]
    assert sorted(matched["event_id"]) == [2, 3, 4]
    assert (matched["value_right"] == 9.0).all()


def test_time_band_join(ray_session):
    import pandas as pd
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.windows import time_band_join

    # u1: error at t=100s; clicks at 40 (in, -60), 160 (in, +60), 161 (out)
    # u2: error at 99s and click at 160s (out by 1s); u3: click only
    left = pd.DataFrame({
        "err_id": [1, 2],
        "ts": pd.to_datetime([100, 99], unit="s"),
        "user_id": ["u1", "u2"],
    })
    right = pd.DataFrame({
        "click_id": [10, 11, 12, 13, 14],
        "ts": pd.to_datetime([40, 160, 161, 160, 50], unit="s"),
        "user_id": ["u1", "u1", "u1", "u2", "u3"],
    })
    out = time_band_join(
        rd.from_pandas(left).repartition(2), rd.from_pandas(right).repartition(2),
        "user_id", "ts", 60, "err_id", "click_id", n_buckets=4,
    ).to_pandas().sort_values(["err_id", "click_id"]).reset_index(drop=True)
    got = list(zip(out["err_id"], out["click_id"], out["dt_us"]))
    assert got == [(1, 10, 60_000_000), (1, 11, -60_000_000)]

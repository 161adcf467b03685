"""CasRel-style cascade extraction (stages/cascade) and event
windowing (stages/windows)."""

import numpy as np
import pandas as pd


def test_cascade_equals_oneshot_extractor():
    """The two-step cascade must emit exactly the one-shot extractor's
    triples (same deterministic rules, different decode path)."""
    from rex_ray.stages.cascade import CascadeExtractor
    from rex_ray.stages.extract import TripleExtractor

    batch = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the join uses hash and table now",
                "spark join merge sort table",
                "nothing here at all",
            ],
        }
    )
    got = CascadeExtractor()(batch).to_pandas()
    want = TripleExtractor()(batch).to_pandas()
    key = ["doc_id", "subj_pos", "obj_pos", "pred", "score"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True),
    )


def test_sessionize_gap_semantics():
    import ray.data as rd

    from rex_ray.stages.windows import sessionize

    m = 60_000_000  # 1 minute in us
    rows = []
    # user 1: events at 0, 10m, 50m (gap 40m > 30m -> 2 sessions)
    for t in (0, 10 * m, 50 * m):
        rows.append({"user_id": 1, "ts": np.datetime64(t, "us")})
    # user 2: single event
    rows.append({"user_id": 2, "ts": np.datetime64(5 * m, "us")})
    ds = rd.from_pandas(pd.DataFrame(rows))
    got = (
        sessionize(ds)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    u1 = got[got["user_id"] == 1]
    assert list(u1["n_events"]) == [2, 1]
    assert list(u1["duration_us"]) == [10 * m, 0]
    u2 = got[got["user_id"] == 2]
    assert list(u2["n_events"]) == [1] and u2["session_id"].iloc[0] == 0


def test_sliding_windows_cover_each_event_k_times():
    import ray.data as rd

    from rex_ray.stages.windows import sliding_window_counts

    h = 3_600_000_000
    ts = [np.datetime64(int(0.5 * h), "us"), np.datetime64(int(1.25 * h), "us")]
    ds = rd.from_pandas(pd.DataFrame({"ts": ts}))
    got = (
        sliding_window_counts(ds, width_us=2 * h, slide_us=h)
        .to_pandas()
        .sort_values("window_start_us")
    )
    # event@0.5h -> windows starting -1h, 0h; event@1.25h -> 0h, 1h
    assert list(got["window_start_us"]) == [-h, 0, h]
    assert list(got["n_events"]) == [1, 2, 1]


def test_winnow_kernel_bruteforce():
    """Winnowing == brute-force window minima (rightmost tie-break)."""
    import numpy as np

    from rex_ray.functions.hashing import winnow

    rng = np.random.RandomState(3)
    for trial in range(20):
        m = rng.randint(0, 30)
        hv = rng.randint(0, 8, size=m).astype(np.int64)  # small range → ties
        w = rng.randint(2, 6)
        pos, hs = winnow(hv, w)
        expected = set()
        for s in range(max(0, m - w + 1)):
            win = hv[s : s + w]
            mn = win.min()
            p = s + max(np.nonzero(win == mn)[0])
            expected.add((int(p), int(mn)))
        assert set(zip(pos.tolist(), hs.tolist())) == expected
        assert (np.diff(pos) > 0).all() if len(pos) > 1 else True


def test_asof_join_matches_pandas_merge_asof(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rex_ray.stages.windows import asof_join_events

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    got = (
        asof_join_events(ds)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("int64")
    left = ev[ev["event_type"] == "click"].sort_values("ts_us")
    right = (
        ev[ev["event_type"] == "view"]
        .sort_values(["ts_us", "event_id"])
        .drop_duplicates(["user_id", "ts_us"], keep="last")
        .sort_values("ts_us")
    )
    exp = pd.merge_asof(
        left[["event_id", "user_id", "ts_us"]],
        right[["user_id", "ts_us", "value"]].rename(
            columns={"ts_us": "asof_ts_us", "value": "asof_value"}
        ),
        left_on="ts_us",
        right_on="asof_ts_us",
        by="user_id",
        direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    # inner as-of semantics: the engine drops clicks with no prior view
    exp = exp.dropna(subset=["asof_ts_us"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["event_id"] == exp["event_id"]).all()
    pd.testing.assert_series_equal(
        got["asof_ts_us"].astype("float64"),
        exp["asof_ts_us"].astype("float64"),
        check_names=False,
    )
    pd.testing.assert_series_equal(
        got["asof_value"].astype("float64"),
        exp["asof_value"].astype("float64"),
        check_names=False,
    )


def test_grouped_exact_quantiles_vs_numpy(ray_session):
    """3-pass drill-down == numpy exact order statistic, including a
    constant-value group (degenerate lo == hi histogram)."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rex_ray.stages.quantiles import grouped_exact_quantiles

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "event_type": (
                ["a"] * 10000 + ["b"] * 333 + ["const"] * 50
            ),
            "value": np.concatenate(
                [
                    rng.lognormal(0, 2, 10000),  # skewed
                    rng.uniform(-5, 5, 333),
                    np.full(50, 3.14),
                ]
            ),
        }
    )
    ps = (0.5, 0.9, 0.99)
    got = (
        grouped_exact_quantiles(
            rd.from_pandas(df).repartition(8), "event_type", "value", ps=ps,
            n_bins=64,
        )
        .to_pandas()
        .set_index(["event_type", "p"])["q"]
    )
    for g, sub in df.groupby("event_type"):
        vals = np.sort(sub["value"].to_numpy())
        for p in ps:
            k = max(1, math.ceil(p * len(vals)))
            assert got[(g, p)] == vals[k - 1], (g, p)


def test_interval_join_hand_computed(ray_session):
    """Cohort session windows vs all events, inclusive BETWEEN: counts
    and distinct users match a hand-derived answer."""
    import pandas as pd
    import ray.data as rd

    from rex_ray.stages.windows import interval_join_events

    ev = pd.DataFrame(
        {
            "user_id": [0, 1, 0, 3, 2],
            "ts": pd.to_datetime([100, 150, 200, 250, 1000], unit="us"),
        }
    )
    out = (
        interval_join_events(
            rd.from_pandas(ev).repartition(3), cohort_mod=2
        )
        .to_pandas()
        .sort_values(["user_id", "session_id"], ignore_index=True)
    )
    # monitored users 0 and 2; u0 session [100,200], u2 session [1000,1000]
    assert out["user_id"].tolist() == [0, 2]
    assert out["start_ts_us"].tolist() == [100, 1000]
    assert out["end_ts_us"].tolist() == [200, 1000]
    assert out["n_events"].tolist() == [3, 1]   # u0@100, u1@150, u0@200
    assert out["n_users"].tolist() == [2, 1]


def test_burst_hours_hand_computed(ray_session):
    """Row-window burst rule on a hand series; first bucket has no
    lookback; empty hours are skipped on both engines."""
    import pandas as pd
    import ray.data as rd

    from rex_ray.stages.windows import burst_hours

    H = 3_600_000_000
    # type 'a' hourly counts: h0:2, h1:1, h5:7 (h2-4 empty, skipped)
    ts = [0] * 2 + [H] * 1 + [5 * H] * 7
    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts, unit="us"),
            "event_type": ["a"] * len(ts),
        }
    )
    out = (
        burst_hours(rd.from_pandas(ev).repartition(3), lookback=3, mult=2)
        .to_pandas()
        .sort_values("bucket_start_us", ignore_index=True)
    )
    assert out["n_events"].tolist() == [2, 1, 7]
    assert out["prev_max"].tolist()[0] is pd.NA or pd.isna(
        out["prev_max"].tolist()[0]
    )
    assert out["prev_max"].tolist()[1:] == [2, 2]
    assert out["is_burst"].tolist() == [False, False, True]  # 7 > 2*2

"""As-of join operator tests: interleaved timestamps, carried right
columns, no-match drops, and a brute-force reference comparison."""

import numpy as np
import pandas as pd
import pytest

from opengauss_tools_datachecker_performance_ray.stages.joins import asof_join


def _brute(left: pd.DataFrame, right: pd.DataFrame, key, lts, rts):
    rows = []
    for r in left.itertuples(index=False):
        cand = right[(right[key] == getattr(r, key))
                     & (right[rts] <= getattr(r, lts))]
        if not len(cand):
            continue
        best = cand.loc[cand[rts].idxmax()]
        rows.append({**r._asdict(), f"{rts}_matched": best[rts],
                     "px": best["px"]})
    return pd.DataFrame(rows)


class TestAsofJoin:
    def test_interleaved_matches_brute_force(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(21)
        n_l, n_r = 400, 300
        left = pd.DataFrame({
            "uid": rng.integers(0, 20, n_l),
            "ets": pd.to_datetime(rng.integers(0, 10**6, n_l), unit="s")
            .astype("datetime64[us]"),
            "eid": np.arange(n_l, dtype=np.int64),
        })
        right = pd.DataFrame({
            "uid": rng.integers(0, 25, n_r),  # some uids never in left
            "qts": pd.to_datetime(rng.integers(0, 10**6, n_r), unit="s")
            .astype("datetime64[us]"),
            "px": rng.random(n_r).round(6),
        })
        # unique (uid, qts) on the right => deterministic carried px
        right = right.drop_duplicates(["uid", "qts"]).reset_index(drop=True)
        out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        key="uid", left_ts="ets", right_ts="qts",
                        left_cols=["eid"], right_cols=["px"],
                        num_buckets=8).to_pandas()
        want = _brute(left, right, "uid", "ets", "qts")
        assert len(out) == len(want)
        o = out.sort_values("eid").reset_index(drop=True)
        w = want.sort_values("eid").reset_index(drop=True)
        assert list(o["eid"]) == list(w["eid"])
        assert list(o["qts_matched"]) == list(w["qts_matched"])
        assert np.allclose(o["px"], w["px"])
        assert o["eid"].dtype == np.int64  # no float upcast survives

    def test_no_match_side_dropped_and_empty_buckets_ok(self, ray_session):
        import ray.data as rd

        left = pd.DataFrame({
            "uid": [1, 2, 3],
            "ets": pd.to_datetime([100, 200, 300], unit="s")
            .astype("datetime64[us]"),
            "eid": np.array([0, 1, 2], np.int64)})
        right = pd.DataFrame({
            "uid": [1, 9],  # uid 2,3 have no quotes; uid 9 no events
            "qts": pd.to_datetime([50, 10], unit="s")
            .astype("datetime64[us]"),
            "px": [1.5, 9.9]})
        out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        key="uid", left_ts="ets", right_ts="qts",
                        left_cols=["eid"], right_cols=["px"],
                        num_buckets=4).to_pandas()
        assert list(out["eid"]) == [0]
        assert out["px"].iloc[0] == pytest.approx(1.5)

    def test_range_join_matches_brute_force(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.joins import (
            range_join,
        )

        rng = np.random.default_rng(31)
        left = pd.DataFrame({
            "uid": rng.integers(0, 10, 500),
            "v": rng.integers(0, 500, 500).astype(np.int64),
            "eid": np.arange(500, dtype=np.int64)})
        lo = rng.integers(0, 480, 200).astype(np.int64)
        right = pd.DataFrame({
            "uid": rng.integers(0, 12, 200),
            "lo": lo, "hi": lo + rng.integers(0, 120, 200),
            "rid": np.arange(200, dtype=np.int64)})
        out = range_join(rd.from_pandas(left), rd.from_pandas(right),
                         key="uid", left_val="v", right_lo="lo",
                         right_hi="hi", left_cols=["eid"],
                         right_cols=["rid"], band_width=64,
                         num_buckets=8).to_pandas()
        want = left.merge(right, on="uid")
        want = want[(want["v"] >= want["lo"]) & (want["v"] <= want["hi"])]
        assert len(out) == len(want)
        got_pairs = set(zip(out["eid"], out["rid"]))
        want_pairs = set(zip(want["eid"], want["rid"]))
        assert got_pairs == want_pairs  # no dupes, no misses
        assert out["eid"].dtype == np.int64

    def test_range_join_empty_sides(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.joins import (
            range_join,
        )

        left = pd.DataFrame({"uid": [1], "v": np.array([5], np.int64),
                             "eid": np.array([0], np.int64)})
        right = pd.DataFrame({"uid": [2], "lo": np.array([0], np.int64),
                              "hi": np.array([10], np.int64),
                              "rid": np.array([0], np.int64)})
        out = range_join(rd.from_pandas(left), rd.from_pandas(right),
                         key="uid", left_val="v", right_lo="lo",
                         right_hi="hi", left_cols=["eid"],
                         right_cols=["rid"]).to_pandas()
        assert len(out) == 0  # different keys never pair

    def test_future_quotes_excluded(self, ray_session):
        import ray.data as rd

        left = pd.DataFrame({
            "uid": [1], "eid": np.array([0], np.int64),
            "ets": pd.to_datetime([100], unit="s").astype("datetime64[us]")})
        right = pd.DataFrame({
            "uid": [1, 1],
            "qts": pd.to_datetime([99, 101], unit="s")
            .astype("datetime64[us]"),
            "px": [1.0, 2.0]})
        out = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                        key="uid", left_ts="ets", right_ts="qts",
                        left_cols=["eid"], right_cols=["px"]).to_pandas()
        assert out["px"].iloc[0] == 1.0  # the later quote never matches


class TestSessionization:
    def test_pathological_user_bounded(self, ray_session):
        """Round-2 verdict #10: one user with 500k events must complete
        in bounded memory (pure-numpy in-group kernel) with correct
        session boundaries."""
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines.queries import (
            sessionize_events,
        )

        n = 500_000
        # one event per minute, a >30min gap every 50k events
        step = np.full(n, 60 * 1_000_000, dtype=np.int64)
        step[::50_000] = 31 * 60 * 1_000_000  # 10 gaps -> 10 sessions
        us = np.cumsum(step)
        df = pd.DataFrame({
            "user_id": np.zeros(n, dtype=np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(us, unit="us").astype("datetime64[us]")})
        out = sessionize_events(rd.from_pandas(df)).to_pandas()
        assert len(out) == 10
        assert out["n_events"].sum() == n
        assert (out["user_id"] == 0).all()
        assert sorted(out["session_id"]) == list(range(10))

    def test_matches_manual_two_users(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines.queries import (
            sessionize_events,
        )

        ts = pd.to_datetime([0, 10, 2000, 2010, 5000, 0, 4000],
                            unit="s").astype("datetime64[us]")
        df = pd.DataFrame({"user_id": [1, 1, 1, 1, 1, 2, 2],
                           "event_id": np.arange(7, dtype=np.int64),
                           "ts": ts})
        out = sessionize_events(rd.from_pandas(df)).to_pandas() \
            .sort_values(["user_id", "session_id"]).reset_index(drop=True)
        # user 1: [0,10] [2000,2010] [5000]; user 2: [0] [4000]
        assert list(out["user_id"]) == [1, 1, 1, 2, 2]
        assert list(out["n_events"]) == [2, 2, 1, 1, 1]


class TestMonotonicAudit:
    def test_known_regressions_and_nan_exclusion(self, ray_session,
                                                 tmp_path):
        """user 1: values 5, 3, 7, 6 in ts order -> regressions at 3
        and 6; user 2 monotone -> no row; NaN / null values and a
        null-ts row are excluded on both engines."""
        import duckdb

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 1, 2, 2, 1, 1, 2],
            "ts": pd.to_datetime([
                "2024-01-01 00:00", "2024-01-01 00:01",
                "2024-01-01 00:02", "2024-01-01 00:03",
                "2024-01-01 00:00", "2024-01-01 00:05",
                "2024-01-01 00:04", None, "2024-01-01 00:06"]),
            "event_id": [10, 11, 12, 13, 20, 21, 14, 15, 22],
            "value": [5.0, 3.0, 7.0, 6.0, 1.0, 2.0,
                      float("nan"), 0.0, None],
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )
        out = q.monotonic_audit_events(str(sf)) \
            .sort_values("user_id").reset_index(drop=True)
        assert out.to_dict("records") == [
            {"user_id": 1, "n_events": 4, "n_regressions": 2}]
        con = duckdb.connect()
        con.register("events", df)
        oracle = con.execute(q.MONOTONIC_AUDIT_EVENTS_SQL).df() \
            .sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            out.astype({"n_events": "int64",
                        "n_regressions": "int64"}),
            oracle.astype({"n_events": "int64",
                           "n_regressions": "int64"}))

    def test_tie_order_deterministic(self, ray_session, tmp_path):
        """Equal timestamps order by event_id on both engines, so a
        regression hidden inside a tie is counted identically."""
        import duckdb

        df = pd.DataFrame({
            "user_id": [7, 7, 7],
            "ts": pd.to_datetime(["2024-01-01"] * 3),
            "event_id": [3, 1, 2],
            "value": [0.5, 9.0, 1.0],  # by event_id: 9.0, 1.0, 0.5
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        df.to_parquet(sf / "events.parquet")
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )
        out = q.monotonic_audit_events(str(sf))
        assert out.to_dict("records") == [
            {"user_id": 7, "n_events": 3, "n_regressions": 2}]
        con = duckdb.connect()
        con.register("events", df)
        oracle = con.execute(q.MONOTONIC_AUDIT_EVENTS_SQL).df()
        assert int(oracle.loc[0, "n_regressions"]) == 2

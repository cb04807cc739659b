"""Per-group exact-moment Pearson correlation
(`checks.grouped_correlation`): known values, degenerate groups, the
loud guards, and the gate oracle."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.pipelines import (
    checks,
    queries as q,
)

SF = "/root/testdata/sf0.001"


def _run(df, **kw):
    return checks.grouped_correlation(rd.from_pandas(df), "g", "x", "y",
                                      **kw)


class TestGroupedCorrelation:
    def test_perfect_and_anti_correlation(self, ray_session):
        df = pd.DataFrame({
            "g": ["a"] * 4 + ["b"] * 4,
            "x": [1, 2, 3, 4, 1, 2, 3, 4],
            "y": [2, 4, 6, 8, 8, 6, 4, 2],
        })
        out = _run(df).set_index("g")
        # the r EXPRESSION is float64 (sqrt·sqrt), so ±1 lands within
        # one ulp — exactness lives in the moments, parity in the
        # shared expression
        assert abs(out.loc["a", "r"] - 1.0) < 1e-14
        assert abs(out.loc["b", "r"] + 1.0) < 1e-14
        assert out.loc["a", "n"] == 4

    def test_matches_numpy(self, ray_session):
        rng = np.random.default_rng(11)
        x = rng.integers(0, 1000, 300)
        y = (2 * x + rng.integers(-50, 50, 300)).astype(np.int64)
        df = pd.DataFrame({"g": ["a"] * 300, "x": x, "y": y})
        out = _run(df)
        ref = np.corrcoef(x, y)[0, 1]
        assert abs(float(out["r"].iloc[0]) - ref) < 1e-12

    def test_degenerate_groups_none(self, ray_session):
        df = pd.DataFrame({
            "g": ["z", "z", "one"],
            "x": [5, 5, 1],     # zero variance in z
            "y": [1, 2, 1],
        })
        out = _run(df).set_index("g")
        assert out.loc["z", "r"] is None or pd.isna(out.loc["z", "r"])
        assert out.loc["one", "n"] == 1
        assert pd.isna(out.loc["one", "r"])

    def test_nulls_pairwise_excluded(self, ray_session):
        df = pd.DataFrame({
            "g": ["a"] * 5,
            "x": pd.array([1, 2, None, 4, 5], dtype="Int64"),
            "y": pd.array([2, 4, 6, None, 10], dtype="Int64"),
        })
        out = _run(df)
        assert int(out["n"].iloc[0]) == 3  # rows with BOTH present
        assert abs(out["r"].iloc[0] - 1.0) < 1e-14  # remaining: y=2x

    def test_float_rejected(self, ray_session):
        df = pd.DataFrame({"g": ["a"], "x": [1.5], "y": [2]})
        with pytest.raises(Exception) as e:
            _run(df)
        assert "integer" in str(e.value)

    def test_block_overflow_guard(self, ray_session):
        big = 2 ** 31
        df = pd.DataFrame({"g": ["a"] * 4,
                           "x": [big, big, big, big],
                           "y": [1, 2, 3, 4]})
        with pytest.raises(Exception) as e:
            _run(df)
        assert "int64" in str(e.value)

    def test_gate_query_matches_oracle(self, ray_session):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{SF}/lineitem.parquet')")
        res = q.correlation_lineitem(SF).reset_index(drop=True)
        orc = con.execute(q.CORRELATION_LINEITEM_SQL).df()
        pd.testing.assert_frame_equal(res, orc)


class TestCorrelationMetamorphic:
    def test_sign_flip_negates_r(self, ray_session):
        rng = np.random.default_rng(13)
        x = rng.integers(0, 100, 80)
        y = (3 * x + rng.integers(-20, 20, 80)).astype(np.int64)
        df = pd.DataFrame({"g": ["a"] * 80, "x": x, "y": y})
        r_pos = float(_run(df)["r"].iloc[0])
        r_neg = float(_run(df.assign(y=-df["y"]))["r"].iloc[0])
        assert abs(r_pos + r_neg) < 1e-12

    def test_affine_invariance(self, ray_session):
        rng = np.random.default_rng(17)
        x = rng.integers(0, 50, 60)
        y = (2 * x + rng.integers(-5, 5, 60)).astype(np.int64)
        df = pd.DataFrame({"g": ["a"] * 60, "x": x, "y": y})
        base = float(_run(df)["r"].iloc[0])
        tr = float(_run(df.assign(x=3 * df["x"] + 7,
                                  y=5 * df["y"] - 11))["r"].iloc[0])
        assert abs(base - tr) < 1e-12

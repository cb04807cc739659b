"""Per-group Tukey-fence outlier audit (`checks.iqr_outlier_counts`):
known values, DuckDB parity (incl. double columns), null/NaN hygiene."""

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


def _oracle(df: pd.DataFrame, k: float = 1.5) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(f"""
        WITH f AS (SELECT g, v FROM t
                   WHERE v IS NOT NULL AND isfinite(v)
                     AND g IS NOT NULL),
        q AS (SELECT g, quantile_disc(v, 0.25) AS q1,
                     quantile_disc(v, 0.75) AS q3 FROM f GROUP BY g)
        SELECT f.g, q.q1, q.q3,
               CAST(count(*) FILTER (
                   WHERE f.v < q.q1 - {k} * (q.q3 - q.q1)
                      OR f.v > q.q3 + {k} * (q.q3 - q.q1)) AS BIGINT)
                   AS n_out,
               CAST(count(*) AS BIGINT) AS n
        FROM f JOIN q USING (g)
        GROUP BY f.g, q.q1, q.q3 ORDER BY f.g""").df()


class TestIqrOutlierCounts:
    def test_known_single_spike(self, ray_session):
        df = pd.DataFrame({"g": ["a"] * 11,
                           "v": list(range(10)) + [100]})
        out = checks.iqr_outlier_counts(rd.from_pandas(df), "g", "v")
        assert int(out["n_out"].iloc[0]) == 1  # only the 100
        assert int(out["n"].iloc[0]) == 11
        pd.testing.assert_frame_equal(
            out, _oracle(df).rename(columns={"g": "g"}),
            check_dtype=False)

    def test_matches_oracle_doubles_and_nans(self, ray_session):
        rng = np.random.default_rng(3)
        v = rng.normal(50, 5, 200)
        v[::17] = np.nan
        v[5] = 1e6
        v[60] = -1e6
        df = pd.DataFrame({
            "g": np.where(np.arange(200) % 2 == 0, "a", "b"),
            "v": v})
        out = checks.iqr_outlier_counts(rd.from_pandas(df), "g", "v")
        orc = _oracle(df)
        pd.testing.assert_frame_equal(out, orc, check_dtype=False)
        assert out["n_out"].sum() >= 2  # the injected spikes count

    def test_custom_k_widens_fences(self, ray_session):
        df = pd.DataFrame({"g": ["a"] * 11,
                           "v": list(range(10)) + [100]})
        wide = checks.iqr_outlier_counts(rd.from_pandas(df), "g", "v",
                                         k=50.0)
        assert int(wide["n_out"].iloc[0]) == 0
        pd.testing.assert_frame_equal(wide, _oracle(df, k=50.0),
                                      check_dtype=False)

    def test_empty_input(self, ray_session):
        df = pd.DataFrame({"g": pd.Series(dtype=object),
                           "v": pd.Series(dtype=float)})
        out = checks.iqr_outlier_counts(rd.from_pandas(df), "g", "v")
        assert len(out) == 0

    def test_gate_query_matches_oracle(self, ray_session):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{SF}/events.parquet')")
        res = q.outliers_events_by_type(SF).reset_index(drop=True)
        orc = con.execute(q.OUTLIERS_EVENTS_BY_TYPE_SQL).df()
        pd.testing.assert_frame_equal(res, orc)


class TestFanoutHistogram:
    """`checks.fanout_histogram` — per-key child-count histogram."""

    def test_known_fanouts(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"k": ["a", "a", "a", "b", "b", "c", None]})
        out = checks.fanout_histogram(rd.from_pandas(df), "k")
        assert out.values.tolist() == [[1, 1], [2, 1], [3, 1]]

    def test_empty(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"k": pd.Series(dtype=object)})
        out = checks.fanout_histogram(rd.from_pandas(df), "k")
        assert len(out) == 0

    def test_cross_block_key_totals(self, ray_session):
        """A key split across blocks folds to ONE total before the
        histogram (the bucketed groupby co-locates its partials)."""
        import ray.data as rd

        df = pd.DataFrame({"k": ["x"] * 100 + ["y"]})
        ds = rd.from_pandas(df).repartition(8)
        out = checks.fanout_histogram(ds, "k")
        assert out.values.tolist() == [[1, 1], [100, 1]]

    def test_gate_query_matches_oracle(self, ray_session):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{SF}/lineitem.parquet')")
        res = q.fanout_lineitem_orders(SF).reset_index(drop=True)
        orc = con.execute(q.FANOUT_LINEITEM_ORDERS_SQL).df()
        pd.testing.assert_frame_equal(res, orc)


class TestOutlierMetamorphic:
    def test_shift_invariance(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(9)
        df = pd.DataFrame({
            "g": ["a"] * 60,
            "v": np.r_[rng.integers(0, 20, 58), [500, -500]]
                 .astype(float)})
        base = checks.iqr_outlier_counts(rd.from_pandas(df), "g", "v")
        shifted = checks.iqr_outlier_counts(
            rd.from_pandas(df.assign(v=df["v"] + 250.0)), "g", "v")
        assert shifted["n_out"].tolist() == base["n_out"].tolist()
        assert shifted["n"].tolist() == base["n"].tolist()



def test_fanout_hypothesis_fuzz_vs_sql(ray_session):
    """fanout_histogram == the nested GROUP BY oracle on arbitrary
    key multisets (nulls excluded on both engines)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data as rd

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.sampled_from(["a", "b", "c", "d", None]),
                    min_size=0, max_size=30))
    def check(keys):
        df = pd.DataFrame({"k": pd.Series(keys, dtype=object)})
        out = checks.fanout_histogram(rd.from_pandas(df), "k")
        con = duckdb.connect()
        con.register("t", df)
        orc = con.execute(
            "SELECT n AS fanout, CAST(count(*) AS BIGINT) AS "
            "n_keys FROM (SELECT k, CAST(count(*) AS BIGINT) AS n "
            "FROM t WHERE k IS NOT NULL GROUP BY k) GROUP BY n "
            "ORDER BY n").df()
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), orc, check_dtype=False)

    check()


class TestSequenceGapAudit:
    def test_known_gaps_and_duplicates(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"id": pd.array(
            [10, 11, 13, 13, 17, None], dtype="Int64")})
        res = checks.sequence_gap_audit(rd.from_pandas(df), "id")
        assert res == {"vmin": 10, "vmax": 17, "n": 5,
                       "n_distinct": 4, "n_missing": 4,
                       "n_duplicate": 1}  # missing: 12,14,15,16

    def test_dense_clean(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"id": np.arange(100, dtype=np.int64)})
        res = checks.sequence_gap_audit(
            rd.from_pandas(df).repartition(4), "id")
        assert res["n_missing"] == 0 and res["n_duplicate"] == 0

    def test_empty_and_float_rejected(self, ray_session):
        import ray.data as rd

        empty = pd.DataFrame({"id": pd.Series(dtype="Int64")})
        res = checks.sequence_gap_audit(rd.from_pandas(empty), "id")
        assert res["n"] == 0 and res["vmin"] is None
        with pytest.raises(Exception) as e:
            checks.sequence_gap_audit(
                rd.from_pandas(pd.DataFrame({"id": [1.5]})), "id")
        assert "integer" in str(e.value)

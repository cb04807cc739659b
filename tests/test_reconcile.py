"""Aggregate reconciliation ("quick verify") + daily volume profile."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opengauss_tools_datachecker_performance_ray.pipelines import (
    reconcile as rc,
)


def _orders(sf_dir):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/orders.parquet")


def _row(df: pd.DataFrame, col: str, metric: str) -> pd.Series:
    hit = df[(df["col"] == col) & (df["metric"] == metric)]
    assert len(hit) == 1, (col, metric)
    return hit.iloc[0]


def test_identical_pair_all_match(ray_session, sf_dir):
    df = rc.reconcile_aggregates(_orders(sf_dir), _orders(sf_dir))
    assert df["is_match"].all()
    # one n_rows row + per-column metric rows, sorted, unique
    assert _row(df, "_table", "n_rows")["src_val"].isdigit()
    assert not df.duplicated(["col", "metric"]).any()


def test_mutated_sink_localizes_mismatch(ray_session, sf_dir):
    def mut(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy()
        return batch.filter(pa.array(k % 97 != 0))

    snk = _orders(sf_dir).map_batches(mut, batch_format="pyarrow")
    df = rc.reconcile_aggregates(_orders(sf_dir), snk)
    assert not _row(df, "_table", "n_rows")["is_match"]
    assert not _row(df, "o_orderkey", "sum")["is_match"]
    # dropping keys 0, 97, ... moves the min but not the max
    assert not _row(df, "o_orderkey", "min")["is_match"]
    assert _row(df, "o_orderkey", "max")["is_match"]
    # untouched columns' min/max still reconcile
    assert _row(df, "o_totalprice", "min")["is_match"]
    assert _row(df, "o_orderdate", "max")["is_match"]


def test_aggregates_match_pyarrow_exactly(ray_session, sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/orders.parquet")
    df = rc.reconcile_aggregates(_orders(sf_dir), _orders(sf_dir))
    assert _row(df, "_table", "n_rows")["src_val"] == str(t.num_rows)
    import pyarrow.compute as pc

    assert (_row(df, "o_custkey", "sum")["src_val"]
            == str(pc.sum(t.column("o_custkey")).as_py()))
    mm = pc.min_max(t.column("o_totalprice"))
    assert _row(df, "o_totalprice", "min")["src_val"] == repr(
        mm["min"].as_py())
    assert _row(df, "o_totalprice", "max")["src_val"] == repr(
        mm["max"].as_py())
    # timestamps as epoch microseconds
    mmd = pc.min_max(t.column("o_orderdate"))
    assert _row(df, "o_orderdate", "min")["src_val"] == str(
        mmd["min"].cast(pa.timestamp("us")).value)


def test_schema_drift_absent_column(ray_session, sf_dir):
    import ray.data as rd

    snk = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
    df = rc.reconcile_aggregates(_orders(sf_dir), snk)
    r = _row(df, "o_totalprice", "min")
    assert r["snk_val"] == "<absent>" and not r["is_match"]
    assert _row(df, "o_orderkey", "sum")["is_match"]


def test_nulls_and_all_null_blocks(ray_session):
    import ray.data as rd

    t = pa.table({
        "k": pa.array([1, 2, None, 4], pa.int64()),
        "s": pa.array([None, None, None, None], pa.string()),
        "f": pa.array([1.5, None, 2.5, None], pa.float64()),
    })
    ds = rd.from_arrow(t)
    df = rc.reconcile_aggregates(ds, ds)
    assert df["is_match"].all()
    assert _row(df, "k", "nulls")["src_val"] == "1"
    assert _row(df, "k", "sum")["src_val"] == "7"
    assert _row(df, "s", "nulls")["src_val"] == "4"
    assert _row(df, "s", "min")["src_val"] == "<null>"
    assert _row(df, "f", "max")["src_val"] == repr(2.5)


def test_daily_volume_profile_counts(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    prof = rc.daily_volume_profile(ds, "ts")
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows
    assert int(prof["n_rows"].sum()) == n
    assert prof["day"].is_monotonic_increasing
    assert not prof["day"].duplicated().any()


def test_daily_volume_profile_flags_gap_day(ray_session, sf_dir):
    """Starving one day to ~10% of its rows must flag exactly it."""
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    gap_day = rc.daily_volume_profile(ds, "ts")["day"].iloc[2]

    def starve(batch: pa.Table) -> pa.Table:
        day = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        hit = np.asarray(pc.equal(day, gap_day)) & (uid % 10 != 0)
        return batch.filter(pa.array(~hit))

    prof = rc.daily_volume_profile(
        ds.map_batches(starve, batch_format="pyarrow"), "ts")
    flagged = set(prof.loc[prof["anomaly"], "day"])
    assert gap_day in flagged


@pytest.mark.parametrize("n,d,t,expect", [
    (10, 10, 100, False),   # exactly the mean
    (4, 10, 100, True),     # under half the mean (2*4*10 < 100)
    (5, 10, 100, False),    # exactly half: boundary stays clean
    (21, 10, 100, True),    # over double
    (20, 10, 100, False),   # exactly double: boundary stays clean
])
def test_anomaly_rule_integer_boundaries(n, d, t, expect):
    assert ((2 * n * d < t) or (n * d > 2 * t)) == expect


@pytest.mark.parametrize("name", ["reconcile_orders_pair",
                                  "compare_orders_sampled",
                                  "volume_anomaly_events"])
def test_gate_parity_sf0001(ray_session, sf_dir, name):
    """Driver-gate simulation for the round-5 reconcile family."""
    import duckdb

    import __ray_entry__ as e

    res = e.queries()[name](sf_dir)
    got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    con = duckdb.connect()
    for t in ("orders", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    want = con.execute(e.oracle_sql()[name]).df()
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(want)
    for c in cols:
        assert (got[c].astype(str).values
                == want[c].astype(str).values).all(), c


def test_sampled_compare_subset_of_full(ray_session, sf_dir):
    """Every violation the sampled compare reports is in the full
    compare's violation set (a sampled diff is a real diff)."""
    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q,
    )

    sampled = q.compare_orders_sampled(sf_dir)
    full = q.compare_orders_pair(sf_dir)
    s = set(map(tuple, sampled.values))
    f = set(map(tuple, full.values))
    assert s <= f
    assert len(s) > 0  # the 25% sample does catch diffs on testdata


from hypothesis import given, settings
from hypothesis import strategies as st

_cells = st.one_of(st.none(),
                   st.integers(min_value=-2**40, max_value=2**40))


@settings(max_examples=20, deadline=None)
@given(st.lists(_cells, min_size=1, max_size=40), st.data())
def test_reconcile_property(ray_session_holder, ks, data):
    """Self-pair always reconciles clean regardless of block split;
    dropping a row or shifting a non-null value is always detected."""
    import ray.data as rd

    t = pa.table({"k": pa.array(ks, pa.int64())})
    nblocks = data.draw(st.integers(min_value=1, max_value=4))
    ds = rd.from_arrow(t).repartition(nblocks)
    same = rc.reconcile_aggregates(ds, rd.from_arrow(t))
    assert same["is_match"].all()

    df = rc.reconcile_aggregates(ds, rd.from_arrow(t.slice(1)))
    assert not _row(df, "_table", "n_rows")["is_match"]

    nn = [v for v in ks if v is not None]
    if nn:
        i = ks.index(nn[0])
        mut = ks.copy()
        mut[i] = nn[0] + 1
        df = rc.reconcile_aggregates(
            ds, rd.from_arrow(pa.table({"k": pa.array(mut, pa.int64())})))
        assert not _row(df, "k", "sum")["is_match"]


class TestReconcileByGroup:
    def test_self_pair_clean_and_groups_sorted(self, ray_session, sf_dir):
        df = rc.reconcile_aggregates_by_group(
            _orders(sf_dir), _orders(sf_dir), "o_orderstatus",
            "o_custkey")
        assert df["is_match"].all()
        assert list(df["grp"]) == sorted(df["grp"])
        assert set(df["metric"]) == {"n_rows", "nulls", "sum", "min",
                                     "max"}

    def test_localizes_to_group(self, ray_session, sf_dir):
        """Mutating only one status group's rows flags only it."""
        import ray.data as rd

        def mut(batch: pa.Table) -> pa.Table:
            st = batch.column("o_orderstatus").to_pandas()
            k = batch.column("o_orderkey").to_numpy()
            return batch.filter(pa.array(~((st == "F").values
                                           & (k % 7 == 0))))

        snk = _orders(sf_dir).map_batches(mut, batch_format="pyarrow")
        df = rc.reconcile_aggregates_by_group(
            _orders(sf_dir), snk, "o_orderstatus", "o_custkey")
        bad_groups = set(df.loc[~df["is_match"], "grp"])
        assert bad_groups == {"F"}

    def test_null_group_and_absent_group(self, ray_session):
        import ray.data as rd

        a = pa.table({"g": ["x", None, "y"],
                      "c": pa.array([1, 2, 3], pa.int64())})
        b = pa.table({"g": ["x", None],
                      "c": pa.array([1, 2], pa.int64())})
        df = rc.reconcile_aggregates_by_group(
            rd.from_arrow(a), rd.from_arrow(b), "g", "c")
        null_rows = df[df["grp"] == "<null>"]
        assert len(null_rows) == 5 and null_rows["is_match"].all()
        y = df[(df["grp"] == "y") & (df["metric"] == "sum")].iloc[0]
        assert y["snk_val"] == "<absent>" and not y["is_match"]

    def test_float_column_rejected(self, ray_session, sf_dir):
        with pytest.raises(Exception, match="integer column"):
            rc.reconcile_aggregates_by_group(
                _orders(sf_dir), _orders(sf_dir), "o_orderstatus",
                "o_totalprice")

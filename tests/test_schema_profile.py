"""Metadata-only schema profile: the footer-driven catalog surface
(`sources/parquet.py schema_profile` / `duckdb_type_name`) must agree
verbatim with DuckDB's own read of the same files — the vocabulary the
`schema_profile_tables` gate oracle relies on."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opengauss_tools_datachecker_performance_ray.pipelines import (
    queries as q,
)
from opengauss_tools_datachecker_performance_ray.sources.parquet import (
    duckdb_type_name,
    schema_profile,
)

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


def _exotic_table() -> pa.Table:
    fields = [
        ("b", pa.bool_()), ("i8", pa.int8()), ("i16", pa.int16()),
        ("i32", pa.int32()), ("i64", pa.int64()),
        ("u8", pa.uint8()), ("u16", pa.uint16()), ("u32", pa.uint32()),
        ("u64", pa.uint64()),
        ("f32", pa.float32()), ("f64", pa.float64()),
        ("dec", pa.decimal128(10, 3)),
        ("s", pa.string()), ("ls", pa.large_string()),
        ("bin", pa.binary()), ("fsb", pa.binary(4)),
        ("d32", pa.date32()), ("t64", pa.time64("us")),
        # parquet stores no seconds unit; ms/us/ns all read back as
        # DuckDB's us-resolution TIMESTAMP
        ("ts_ms", pa.timestamp("ms")), ("ts_us", pa.timestamp("us")),
        ("ts_ns", pa.timestamp("ns")),
        ("ts_tz", pa.timestamp("us", tz="UTC")),
        ("lst", pa.list_(pa.float32())),
        ("lst_i", pa.large_list(pa.int64())),
        ("fsl", pa.list_(pa.int32(), 3)),
        ("st", pa.struct([("a", pa.int64()), ("b", pa.string())])),
        # quoting rule probes: uppercase stays bare, spaces and
        # keywords get quoted
        ("st2", pa.struct([("A", pa.int64()), ("my field", pa.string()),
                           ("select", pa.int64()), ("_x", pa.int64())])),
        ("mp", pa.map_(pa.string(), pa.int64())),
    ]
    return pa.table(
        [pa.array([None], type=t) for _, t in fields],
        schema=pa.schema([pa.field(n, t) for n, t in fields]))


def test_type_names_match_duckdb_read_of_same_file(tmp_path):
    """Every mapping branch pinned against DuckDB's information_schema
    over a parquet ROUND-TRIP (footer types differ from construction
    types: ts coercion, time isAdjustedToUTC)."""
    p = str(tmp_path / "exotic.parquet")
    pq.write_table(_exotic_table(), p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ex AS SELECT * FROM read_parquet('{p}')")
    duck = dict(con.execute(
        "SELECT column_name, data_type FROM information_schema.columns"
        " WHERE table_name='ex'").fetchall())
    for f in pq.read_schema(p):
        assert duckdb_type_name(f.type) == duck[f.name], f.name


def test_schema_profile_footer_only_matches_oracle():
    res = schema_profile({n: f"{SF}/{n}.parquet" for n in TABLES})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    orc = con.execute(q.SCHEMA_PROFILE_TABLES_SQL).df()
    a = res.sort_values(["table_name", "ordinal"]).reset_index(drop=True)
    b = orc.sort_values(["table_name", "ordinal"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # footer row counts are exact, not estimates
    assert set(a.loc[a.table_name == "documents", "n_rows"]) == {
        len(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]))}


def test_schema_profile_multi_file_table(tmp_path):
    """A directory of shards catalogs as ONE logical table: rows sum
    across footers, schema from the first shard."""
    d = tmp_path / "sharded"
    d.mkdir()
    t = pa.table({"k": pa.array([1, 2], pa.int64()), "v": ["a", "b"]})
    pq.write_table(t, str(d / "part-0.parquet"))
    pq.write_table(t, str(d / "part-1.parquet"))
    out = schema_profile({"sharded": str(d)})
    assert set(out["n_rows"]) == {4}
    assert list(out["column_name"]) == ["k", "v"]
    assert list(out["data_type"]) == ["BIGINT", "VARCHAR"]
    assert list(out["ordinal"]) == [1, 2]


def test_gate_query_entry(ray_session):
    res = q.schema_profile_tables(SF)
    assert len(res) == 51  # 10 tables, 51 columns total
    assert res["data_type"].iloc[0] in ("BIGINT", "VARCHAR", "INTEGER",
                                        "DOUBLE")


class TestNullPatternProfile:
    """`checks.null_pattern_profile` — missingness co-occurrence."""

    def test_known_patterns(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import (
            checks,
        )
        df = pd.DataFrame({
            "a": [1, None, None, 4, None],
            "b": ["x", None, "y", None, None],
        })
        out = checks.null_pattern_profile(
            rd.from_pandas(df), ["a", "b"]).to_pandas() \
            .sort_values(["a_null", "b_null"]).reset_index(drop=True)
        assert out.values.tolist() == [
            [False, False, 1],   # (1, x)
            [False, True, 1],    # (4, None)
            [True, False, 1],    # (None, y)
            [True, True, 2],     # the correlated rows
        ]

    def test_no_nulls_single_pattern(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import (
            checks,
        )
        df = pd.DataFrame({"a": [1, 2], "b": ["x", "y"]})
        out = checks.null_pattern_profile(
            rd.from_pandas(df), ["a", "b"]).to_pandas()
        assert len(out) == 1
        assert out.iloc[0].tolist() == [False, False, 2]

    def test_width_cap(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import (
            checks,
        )
        df = pd.DataFrame({f"c{i}": [1] for i in range(17)})
        with pytest.raises(ValueError):
            checks.null_pattern_profile(rd.from_pandas(df),
                                        [f"c{i}" for i in range(17)])

    def test_gate_query_matches_oracle(self, ray_session):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        res = q.null_patterns_documents(SF).reset_index(drop=True)
        orc = con.execute(q.NULL_PATTERNS_DOCUMENTS_SQL).df()
        pd.testing.assert_frame_equal(res, orc)


def test_null_pattern_empty_input(ray_session):
    import ray.data as rd

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        checks,
    )
    df = pd.DataFrame({"a": pd.Series(dtype="Int64"),
                       "b": pd.Series(dtype=object)})
    out = checks.null_pattern_profile(rd.from_pandas(df), ["a", "b"])
    assert out.count() == 0


def test_null_pattern_hypothesis_fuzz_vs_sql(ray_session):
    """null_pattern_profile == SQL GROUP BY over is-null flags on
    arbitrary null layouts."""
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        checks,
    )

    cell = st.one_of(st.none(), st.integers(0, 3))

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.tuples(cell, cell), min_size=1, max_size=25))
    def check(rows):
        df = pd.DataFrame({
            "a": pd.array([r[0] for r in rows], dtype="Int64"),
            "b": pd.array([r[1] for r in rows], dtype="Int64"),
        })
        out = checks.null_pattern_profile(rd.from_pandas(df),
                                          ["a", "b"]).to_pandas() \
            .sort_values(["a_null", "b_null"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", df)
        orc = con.execute(
            "SELECT a IS NULL AS a_null, b IS NULL AS b_null, "
            "count(*) AS n FROM t GROUP BY 1, 2 "
            "ORDER BY 1, 2").df()
        pd.testing.assert_frame_equal(out, orc, check_dtype=False)

    check()

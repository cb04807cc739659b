"""Format-inference profile (`checks.format_profile` +
`checks.FORMAT_CLASSES`): first-match classification, parity with the
generated SQL CASE chain, fuzz over adversarial strings."""

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


def _classify_oracle(values: list) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": pd.Series(values,
                                                   dtype=object)}))
    return con.execute(
        f"SELECT {checks.format_case_sql('v')} AS format, "
        f"CAST(count(*) AS BIGINT) AS n FROM t WHERE v IS NOT NULL "
        f"GROUP BY 1 ORDER BY 1").df()


class TestFormatProfile:
    def test_known_classes_first_match(self, ray_session):
        vals = ["", "42", "-7", "+3", "3.14", ".5", "1e9", "1.5E-3",
                "2024-01-31", "123e4567-e89b-12d3-a456-426614174000",
                '{"k": 1}', "{}", "abc_1#x-2.z", "two words here",
                "naïve", "a  b", None]
        df = pd.DataFrame({"v": pd.Series(vals, dtype=object)})
        out = checks.format_profile(rd.from_pandas(df), ["v"])
        got = dict(zip(out["format"], out["n"]))
        assert got == {"empty": 1, "int": 3, "float": 4, "date": 1,
                       "uuid": 1, "json_object": 2, "token": 1,
                       "words": 1, "other": 2}
        # a numeric string is int, never token — order matters
        assert got["int"] == 3

    def test_matches_generated_sql(self, ray_session):
        vals = ["42", "x", "1.5", "", "Customer#1", "a b", "{}",
                "9999-12-31", "not-a-date-2024-01-31", "-.5", "1e", "+"]
        df = pd.DataFrame({"v": pd.Series(vals, dtype=object)})
        out = checks.format_profile(rd.from_pandas(df), ["v"]) \
            .drop(columns=["col"]).reset_index(drop=True)
        orc = _classify_oracle(vals)
        pd.testing.assert_frame_equal(out, orc, check_dtype=False)

    def test_fuzz_random_strings_vs_sql(self, ray_session):
        rng = np.random.default_rng(23)
        alphabet = list("01ae.-+{} #_")
        vals = ["".join(rng.choice(alphabet,
                                   size=rng.integers(0, 8)))
                for _ in range(400)]
        df = pd.DataFrame({"v": pd.Series(vals, dtype=object)})
        out = checks.format_profile(rd.from_pandas(df), ["v"]) \
            .drop(columns=["col"]).reset_index(drop=True)
        orc = _classify_oracle(vals)
        pd.testing.assert_frame_equal(out, orc, check_dtype=False)

    def test_multi_column_and_empty(self, ray_session):
        df = pd.DataFrame({"a": ["1", None], "b": ["x y", "z"]})
        out = checks.format_profile(rd.from_pandas(df), ["a", "b"])
        assert set(out["col"]) == {"a", "b"}
        empty = checks.format_profile(
            rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype=object)})),
            ["a"])
        assert len(empty) == 0

    def test_gate_query_matches_oracle(self, ray_session):
        con = duckdb.connect()
        for t in ["customer", "orders", "part", "events"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        res = q.format_profile_strings(SF).reset_index(drop=True)
        orc = con.execute(q.FORMAT_PROFILE_STRINGS_SQL).df()
        pd.testing.assert_frame_equal(res, orc)

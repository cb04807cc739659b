"""Edge-case corpus (FIXTURES.md §5): single-row table, non-ASCII
keys, null-only columns, duplicate keys within one side, tiny-table
single-bucket path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
    ValidationConfig, validate_table_pair,
)
from opengauss_tools_datachecker_performance_ray.stages import compare as cmp
from opengauss_tools_datachecker_performance_ray.stages.digest import DigestConfig


def _pair(tmp_path, src_tbl: pa.Table, snk_tbl: pa.Table):
    a, b = tmp_path / "src", tmp_path / "snk"
    a.mkdir(); b.mkdir()
    pq.write_table(src_tbl, str(a / "p.parquet"))
    pq.write_table(snk_tbl, str(b / "p.parquet"))
    return str(a), str(b)


CFG = ValidationConfig(key_columns=("k",), check_uniqueness=False,
                       check_drift=False)


class TestEdgeCases:
    def test_single_row_table(self, ray_session, tmp_path):
        t = pa.table({"k": ["only"], "v": ["x"]})
        src, snk = _pair(tmp_path, t, t)
        res = validate_table_pair(src, snk, CFG, table="single")
        assert res.summary["result"] == "success"
        assert res.summary["rowCount"] == 1

    def test_non_ascii_keys(self, ray_session, tmp_path):
        keys = ["https://例え.テスト/パス", "https://пример.испытание/п",
                "https://emoji.example/🎉", "plain"]
        src_t = pa.table({"k": keys, "v": ["a", "b", "c", "d"]})
        snk_t = pa.table({"k": keys, "v": ["a", "b", "MUTATED", "d"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="nonascii")
        v = res.compare.violations
        assert list(v["kind"]) == ["update"]
        assert v["key"].iloc[0] == "https://emoji.example/🎉"

    def test_null_only_value_column(self, ray_session, tmp_path):
        t = pa.table({"k": ["a", "b"], "v": pa.array([None, None], pa.string())})
        src, snk = _pair(tmp_path, t, t)
        res = validate_table_pair(src, snk, CFG, table="nullonly")
        assert res.summary["result"] == "success"

    def test_duplicate_keys_one_side_detected_by_uniqueness(
            self, ray_session, tmp_path):
        src_t = pa.table({"k": ["a", "b", "b"], "v": ["1", "2", "3"]})
        snk_t = pa.table({"k": ["a", "b"], "v": ["1", "2"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        cfg = ValidationConfig(key_columns=("k",), check_uniqueness=True,
                               check_drift=False)
        res = validate_table_pair(src, snk, cfg, table="dups")
        dup = res.uniqueness
        assert list(dup.loc[dup["side"] == "source", "key"]) == ["b"]
        # compare collapses dup keys deterministically (first by vhash);
        # overall run fails because of the uniqueness violation
        assert res.summary["result"] == "failed"
        assert res.summary["uniquenessViolations"] == 1

    def test_tiny_table_single_bucket_path(self, ray_session):
        """region/nation-sized tables: one partition, one bucket —
        the no-Merkle-descend path (SliceCheckWorker.java:172-196)."""
        import ray.data as rd

        a = rd.read_parquet("/root/testdata/sf0.001/region.parquet")
        b = rd.read_parquet("/root/testdata/sf0.001/region.parquet")
        cfg = DigestConfig(key_columns=("r_regionkey",),
                           num_partitions=1, buckets_per_partition=1)
        res = cmp.compare_tables(a, b, cfg, table="region")
        assert res.summary["result"] == "success"
        assert res.summary["rowCount"] == 5

    def test_float_edge_values_compare_equal(self, ray_session, tmp_path):
        vals = [0.0, -0.0, 1e-300, 1e300, float("inf"), float("-inf"),
                3.14159, None]
        t = pa.table({"k": [str(i) for i in range(len(vals))],
                      "v": pa.array(vals, pa.float64())})
        src, snk = _pair(tmp_path, t, t)
        res = validate_table_pair(src, snk, CFG, table="floats")
        assert res.summary["result"] == "success"

    def test_nan_compares_equal_to_itself(self, ray_session, tmp_path):
        """NaN canonicalizes to the same bytes on both sides, so a
        NaN-vs-NaN row is equal (bytewise compare semantics, unlike
        SQL NaN != NaN)."""
        t = pa.table({"k": ["a"], "v": pa.array([float("nan")], pa.float64())})
        src, snk = _pair(tmp_path, t, t)
        res = validate_table_pair(src, snk, CFG, table="nan")
        assert res.summary["result"] == "success"

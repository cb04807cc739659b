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
    a.mkdir(parents=True, exist_ok=True); b.mkdir(parents=True, exist_ok=True)
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


class TestTypedColumnCoverage:
    """Full validate over every canonicalizer type family (M1 parity):
    identical pairs compare clean, a single mutated value is classified
    as exactly one update."""

    @pytest.mark.parametrize("name,values,mutated", [
        ("decimal", pa.array(["1.50", "2.00", "3.25"]).cast(
            pa.decimal128(10, 2)),
         pa.array(["1.50", "2.00", "9.99"]).cast(pa.decimal128(10, 2))),
        ("date32", pa.array([18000, 18001, 18002], pa.date32()),
         pa.array([18000, 18001, 19000], pa.date32())),
        ("time64", pa.array([1, 2, 3], pa.time64("us")),
         pa.array([1, 2, 999], pa.time64("us"))),
        ("bool", pa.array([True, False, True]),
         pa.array([True, False, False])),
        ("large_string", pa.array(["x", "y", "z"], pa.large_string()),
         pa.array(["x", "y", "Q"], pa.large_string())),
        ("dictionary", pa.array(["lo", "hi", "lo"]).dictionary_encode(),
         pa.array(["lo", "hi", "hi"]).dictionary_encode()),
        ("binary", pa.array([b"\x00", b"\x01\x02", b""], pa.binary()),
         pa.array([b"\x00", b"\x01\x02", b"\xff"], pa.binary())),
    ])
    def test_type_family_clean_and_single_update(self, ray_session,
                                                 tmp_path, name, values,
                                                 mutated):
        keys = pa.array(["a", "b", "c"])
        src_t = pa.table({"k": keys, "v": values})
        clean_src, clean_snk = _pair(tmp_path / "clean", src_t, src_t)
        res = validate_table_pair(clean_src, clean_snk, CFG,
                                  table=f"{name}_clean")
        assert res.summary["result"] == "success", name
        snk_t = pa.table({"k": keys, "v": mutated})
        d_src, d_snk = _pair(tmp_path / "diff", src_t, snk_t)
        res = validate_table_pair(d_src, d_snk, CFG, table=f"{name}_diff")
        v = res.compare.violations
        assert list(v["kind"]) == ["update"], name
        assert v["key"].iloc[0] == "c", name
    """Round-1 advisor findings, each pinned by a regression test."""

    def test_xor_cancelling_duplicates_fail_compare(self, ray_session,
                                                    tmp_path):
        """Duplicate-key multiplicity whose vhashes XOR-cancel: sink =
        source + 2 extra exact copies of one row. The XOR signature is
        unchanged (x ^ x = 0) but the per-bucket count differs — the
        compare must fail on the count, not report clean."""
        n = 100
        src_t = pa.table({"k": [f"k{i:03d}" for i in range(n)],
                          "v": [f"v{i}" for i in range(n)]})
        dup = src_t.slice(7, 1)
        snk_t = pa.concat_tables([src_t, dup, dup])
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="xorcancel")
        assert res.summary["result"] == "failed"
        assert res.summary["countMismatchPartitions"] >= 1
        failed = [p for p in res.compare.partitions
                  if p["result"] == "failed"]
        assert failed and "row count mismatch" in failed[0]["message"]

    def test_cross_key_compensating_duplicates_fail(self, ray_session,
                                                    tmp_path):
        """src=[a,a,b] vs snk=[a,b,b]: same values per key, equal
        PARTITION totals, but per-bucket counts differ — must fail
        (round-2 review finding: partition-total check alone passed)."""
        src_t = pa.table({"k": ["a", "a", "b"], "v": ["1", "1", "2"]})
        snk_t = pa.table({"k": ["a", "b", "b"], "v": ["1", "2", "2"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="crosskey")
        assert res.summary["result"] == "failed"
        assert res.summary["countMismatchPartitions"] >= 1
        failed = [p for p in res.compare.partitions
                  if p["result"] == "failed"]
        assert any("mismatch" in p.get("message", "") for p in failed)

    def test_row_rule_zero_count_empty(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
            apply_row_rule,
        )

        ds = rd.from_pandas(pd.DataFrame({"k": ["a", "b", "c"]}))
        out = apply_row_rule(ds, "k", offset=0, count=0)
        assert out.count() == 0

    def test_odd_multiplicity_duplicate_detected(self, ray_session,
                                                 tmp_path):
        """1 vs 3 copies: signature ALSO cancels (x ^ x ^ x = x) —
        only the count catches it."""
        src_t = pa.table({"k": ["a", "b"], "v": ["1", "2"]})
        one = src_t.slice(0, 1)
        snk_t = pa.concat_tables([src_t, one, one])
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="odd_mult")
        assert res.summary["result"] == "failed"

    def test_uint64_high_values_hash_and_compare(self, ray_session,
                                                 tmp_path):
        """uint64 values >= 2^63 (MySQL BIGINT UNSIGNED) must digest
        without ArrowInvalid and compare correctly."""
        from opengauss_tools_datachecker_performance_ray.functions import hashing

        big = [2**63, 2**64 - 1, 5, 0, None]
        arr = pa.array(big, type=pa.uint64())
        h = hashing.column_hash(arr)
        assert len(set(h[:4].tolist())) == 4  # distinct values, no crash
        # same bit pattern as int64 for values < 2^63 => equal hashes
        h_i = hashing.column_hash(pa.array([5, 0], type=pa.int64()))
        assert h[2] == h_i[0] and h[3] == h_i[1]

        src_t = pa.table({"k": ["a", "b", "c"],
                          "v": pa.array([2**63 + 7, 2**64 - 1, 1],
                                        type=pa.uint64())})
        snk_t = pa.table({"k": ["a", "b", "c"],
                          "v": pa.array([2**63 + 7, 2**64 - 2, 1],
                                        type=pa.uint64())})
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="u64")
        v = res.compare.violations
        assert list(v["kind"]) == ["update"] and v["key"].iloc[0] == "b"

    def test_referential_null_parent_key_no_crash(self, ray_session):
        """A null in the parent key column must not crash the sort in
        the broadcast path; nulls match nothing."""
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        parent = rd.from_pandas(pd.DataFrame({"pk": ["a", None, "b"]}))
        child = rd.from_pandas(pd.DataFrame({"fk": ["a", "b", "zz", None]}))
        bad = checks.referential_violations(child, "fk", parent, "pk")
        assert sorted(r["fk"] for r in bad.take_all()) == ["zz"]

    def test_structure_type_mismatch_fails_fast(self, ray_session,
                                                tmp_path):
        """int64 vs float64 value column: raw-bit hashing would report
        100% false updates — structure check must fail the pair up
        front with the type mismatch named."""
        src_t = pa.table({"k": ["a", "b"],
                          "v": pa.array([5, 6], pa.int64())})
        snk_t = pa.table({"k": ["a", "b"],
                          "v": pa.array([5.0, 6.0], pa.float64())})
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="typemix")
        assert res.summary["result"] == "failed"
        assert res.structure["structureResult"] == "failed"
        assert any("v:" in m for m in res.structure["typeMismatches"])

    def test_referential_byte_budget_routes_partitioned(self, ray_session,
                                                        monkeypatch):
        """Round-2 verdict #3: a parent whose KEY BYTES blow the
        broadcast budget must take the partitioned anti-join even when
        its row count is under the row threshold — with identical
        violations either way."""
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        wide = ["http://example.com/very/long/path/segment/%06d" % i
                for i in range(3000)]
        parent = rd.from_pandas(pd.DataFrame({"pk": wide}))
        child = rd.from_pandas(pd.DataFrame(
            {"fk": wide[:100] + ["http://missing/x", "http://missing/y"]}))
        routed = {}
        real = checks.referential_violations_partitioned

        def spy(*a, **k):
            routed["partitioned"] = True
            return real(*a, **k)

        monkeypatch.setattr(checks, "referential_violations_partitioned",
                            spy)
        bad = checks.referential_violations(
            child, "fk", parent, "pk",
            broadcast_bytes_budget=64 * 1024)  # ~300KB of keys > 64KB
        assert routed.get("partitioned")
        assert sorted(r["fk"] for r in bad.take_all()) == \
            ["http://missing/x", "http://missing/y"]
        # same parent under the default budget broadcasts (no spy hit)
        routed.clear()
        bad2 = checks.referential_violations(child, "fk", parent, "pk")
        assert "partitioned" not in routed
        assert sorted(r["fk"] for r in bad2.take_all()) == \
            ["http://missing/x", "http://missing/y"]

    def test_structure_signed_unsigned_bigint_fails_fast(self, ray_session,
                                                         tmp_path):
        """int64 -1 and uint64 2^64-1 share raw bits, so data compare
        would report a false 'success' — the pair must fail
        structure_check instead (advisor finding, round 2)."""
        src_t = pa.table({"k": ["a", "b"],
                          "v": pa.array([-1, 6], pa.int64())})
        snk_t = pa.table({"k": ["a", "b"],
                          "v": pa.array([2**64 - 1, 6], pa.uint64())})
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="signmix")
        assert res.summary["result"] == "failed"
        assert res.structure["structureResult"] == "failed"
        assert any("v:" in m for m in res.structure["typeMismatches"])

    def test_structure_tz_aware_vs_naive_timestamp_fails_fast(
            self, ray_session, tmp_path):
        """A tz-aware timestamp stores a UTC instant; a naive one a
        wall-clock reading — identical int64 epochs are different
        instants, so the pair must fail structure_check instead of
        comparing falsely clean (round-3 verdict #9, same false-clean
        family as the uint64 fix)."""
        ts = [1_700_000_000_000_000, 1_700_000_100_000_000]
        src_t = pa.table({"k": ["a", "b"],
                          "v": pa.array(ts, pa.timestamp("us"))})
        snk_t = pa.table({"k": ["a", "b"],
                          "v": pa.array(ts, pa.timestamp("us", tz="UTC"))})
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="tzmix")
        assert res.summary["result"] == "failed"
        assert res.structure["structureResult"] == "failed"
        assert any("v:" in m for m in res.structure["typeMismatches"])

    def test_structure_two_aware_zones_pass(self, ray_session, tmp_path):
        """Two tz-AWARE columns compare safely whatever their display
        zones: Arrow normalizes the stored epoch to UTC, so equal
        instants digest equal."""
        ts = [1_700_000_000_000_000, 1_700_000_100_000_000]
        src_t = pa.table({"k": ["a", "b"],
                          "v": pa.array(ts, pa.timestamp("us", tz="UTC"))})
        snk_t = pa.table({
            "k": ["a", "b"],
            "v": pa.array(ts, pa.timestamp("us", tz="Europe/Berlin"))})
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="tzpair")
        assert res.summary["result"] == "success"

    def test_structure_compatible_widths_pass(self, ray_session, tmp_path):
        """int32 vs int64 share a hash class (lossless cast) — equal
        values compare equal across the width difference."""
        src_t = pa.table({"k": ["a", "b"], "v": pa.array([5, 6], pa.int32())})
        snk_t = pa.table({"k": ["a", "b"], "v": pa.array([5, 6], pa.int64())})
        src, snk = _pair(tmp_path, src_t, snk_t)
        res = validate_table_pair(src, snk, CFG, table="widths")
        assert res.summary["result"] == "success"

    def test_schema_run_survives_one_bad_table(self, ray_session,
                                               tmp_path):
        """A corrupt parquet in one table must yield a per-table failed
        verdict, not abort the whole schema run."""
        from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
            validate_schema,
        )

        for side in ("src", "snk"):
            d = tmp_path / side
            (d / "good").mkdir(parents=True)
            (d / "bad").mkdir()
            pq.write_table(pa.table({"k": ["a"], "v": ["1"]}),
                           str(d / "good" / "p.parquet"))
            (d / "bad" / "p.parquet").write_bytes(b"not a parquet file")
        out = validate_schema(str(tmp_path / "src"), str(tmp_path / "snk"),
                              {"*": ("k",)}, CFG)
        by = {s["table"]: s for s in out["summaries"]}
        assert by["good"]["result"] == "success"
        assert by["bad"]["result"] == "failed"
        assert "message" in by["bad"]

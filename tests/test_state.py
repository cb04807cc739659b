"""Tests: repair SQL with rows, winnowing fingerprints, drift fixture
partition, resumable partitioned sink."""

import os

import numpy as np
import pandas as pd
import pytest

from opengauss_tools_datachecker_performance_ray.functions import textfn
from opengauss_tools_datachecker_performance_ray.sources import fixtures
from opengauss_tools_datachecker_performance_ray.state import report, sinks


class TestRepairSql:
    def test_full_row_statements(self):
        vio = pd.DataFrame({"key": ["1", "2", "3"],
                            "kind": ["insert", "update", "delete"]})
        src = pd.DataFrame({"id": ["1", "2"],
                            "name": ["o'neil", None],
                            "blob": [b"\x01\x02", b""]})
        stmts = report.render_repair_sql_with_rows("t", "id", vio, src)
        assert stmts[0] == \
            "INSERT INTO t (id, name, blob) VALUES ('1', 'o''neil', X'0102');"
        assert stmts[1].startswith("REPLACE INTO t (id, name, blob) "
                                   "VALUES ('2', NULL,")
        assert stmts[2] == "DELETE FROM t WHERE id = '3';"

    def test_update_style_column_wise(self):
        """UpdateDmlBuilder shape: UPDATE ... SET non-key cols WHERE pk."""
        vio = pd.DataFrame({"key": ["2"], "kind": ["update"]})
        src = pd.DataFrame({"id": ["2"], "name": ["x"], "n": [7]})
        stmts = report.render_repair_sql_with_rows(
            "t", "id", vio, src, update_style="update")
        assert stmts == ["UPDATE t SET name = 'x', n = 7 WHERE id = '2';"]

    def test_batch_delete_golden(self):
        """BatchDeleteDmlBuilder shape: one IN list per batch_size keys."""
        stmts = report.render_batch_delete_sql("t", ["id"],
                                               [str(i) for i in range(5)],
                                               batch_size=3)
        assert stmts == [
            "DELETE FROM t WHERE id IN ('0', '1', '2');",
            "DELETE FROM t WHERE id IN ('3', '4');",
        ]

    def test_batch_delete_via_repair(self):
        vio = pd.DataFrame({"key": ["a", "b", "c"],
                            "kind": ["delete"] * 3})
        src = pd.DataFrame({"id": pd.Series(dtype=object)})
        stmts = report.render_repair_sql_with_rows(
            "t", "id", vio, src, batch_delete=True)
        assert stmts == ["DELETE FROM t WHERE id IN ('a', 'b', 'c');"]

    def test_composite_key_repair(self):
        """Composite PKs splice with _#_ in violation keys; every key
        column must land in the WHERE (round-1 known rough edge)."""
        vio = pd.DataFrame({"key": ["5_#_1", "6_#_2"],
                            "kind": ["update", "delete"]})
        src = pd.DataFrame({"ok": ["5"], "line": ["1"], "v": ["new"]})
        stmts = report.render_repair_sql_with_rows(
            "t", ["ok", "line"], vio, src, update_style="update")
        assert stmts[0] == ("UPDATE t SET v = 'new' "
                            "WHERE ok = '5' and line = '1';")
        assert stmts[1] == ("DELETE FROM t "
                            "WHERE ok = '6' and line = '2';")


class TestWinnowing:
    def test_identical_docs_full_overlap(self):
        a = textfn.winnowing_fingerprints("the quick brown fox jumps")
        b = textfn.winnowing_fingerprints("the quick brown fox jumps")
        assert textfn.fingerprint_overlap(a, b) == 1.0

    def test_local_edit_keeps_high_overlap(self):
        base = "the quick brown fox jumps over the lazy dog " * 5
        edited = base.replace("lazy", "hazy", 1)
        a = textfn.winnowing_fingerprints(base)
        b = textfn.winnowing_fingerprints(edited)
        assert 0.5 < textfn.fingerprint_overlap(a, b) < 1.0

    def test_disjoint_docs_low_overlap(self):
        a = textfn.winnowing_fingerprints("alpha beta gamma delta " * 5)
        b = textfn.winnowing_fingerprints("zXq wVu tSr qPo " * 5)
        assert textfn.fingerprint_overlap(a, b) < 0.1

    def test_short_doc(self):
        assert len(textfn.winnowing_fingerprints("ab")) == 0


class TestDriftFixture:
    def test_shifted_day_flagged(self, ray_session, tmp_path):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        spec = fixtures.PagesSpec(n_rows=6000, n_files=4, html_mean=4.0,
                                  drift_day=5)
        fixtures.generate(str(tmp_path), spec)
        ds = rd.read_parquet(f"{tmp_path}/pages_source",
                             columns=["warc_ts", "lang"])

        def add_day(batch: pd.DataFrame) -> pd.DataFrame:
            epoch = pd.Timestamp("1970-01-01")
            us = (batch["warc_ts"] - epoch) // pd.Timedelta(microseconds=1)
            day = (us - 1_700_000_000_000_000) // (86400 * 1_000_000)
            batch["day"] = "d" + day.astype(str)
            return batch

        keyed = ds.map_batches(add_day, batch_format="pandas")
        rep = checks.drift_by_group(keyed, "day", ["lang"])
        flagged = set(rep.loc[rep["result"] == "failed", "grp"])
        assert flagged == {"d5"}


class TestPartitionedSink:
    def test_write_skip_resume(self, ray_session, tmp_path):
        import ray.data as rd

        df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 5 + ["c"] * 5,
                           "v": np.arange(15)})
        ds = rd.from_pandas(df)
        out = str(tmp_path / "out")
        r1 = sinks.write_partitioned(ds, out, "k")
        assert sorted(r1["written"]) == ["a", "b", "c"]
        # simulate a crashed partition: remove one marker
        os.remove(os.path.join(out, "part=b", "_SUCCESS"))
        r2 = sinks.write_partitioned(ds, out, "k", values=["a", "b", "c"])
        assert r2["written"] == ["b"] and sorted(r2["skipped"]) == ["a", "c"]
        back = sinks.read_partitioned(out).to_pandas()
        assert len(back) == 15
        assert back.groupby("k")["v"].count().to_dict() == {"a": 5, "b": 5, "c": 5}


class TestSketchMergerActorPool:
    def test_actor_merge_equals_driver_merge(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.profile import (
            profile_dataset,
        )

        rng = np.random.default_rng(7)
        df = pd.DataFrame({"x": rng.normal(0, 1, 20000),
                           "s": rng.choice(["a", "b", "c"], 20000)})
        ds = rd.from_pandas(df).repartition(16)
        p1 = profile_dataset(ds, batch_size=1000)
        p2 = profile_dataset(ds, batch_size=1000, merge_concurrency=2)
        assert p1["x"].count == p2["x"].count == 20000
        assert p1["x"].vmin == p2["x"].vmin
        assert p1["s"].hll.estimate() == p2["s"].hll.estimate()
        assert p1["s"].topk.counts == p2["s"].topk.counts
        assert abs(p1["x"].tdigest.quantile(0.5)
                   - p2["x"].tdigest.quantile(0.5)) < 0.05

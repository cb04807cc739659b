"""Tests: multi-table schema runner, rules, incremental mode, CSV
source, registry."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opengauss_tools_datachecker_performance_ray.pipelines import incremental
from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
    RuleConfig, ValidationConfig, apply_column_rule, apply_row_rule,
    validate_schema,
)
from opengauss_tools_datachecker_performance_ray.sources import csvsrc
from opengauss_tools_datachecker_performance_ray.state import registry


def _write(df: pd.DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


@pytest.fixture(scope="module")
def schema_dirs(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("schema")
    src, snk = str(base / "src"), str(base / "snk")
    users = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                          "name": [f"u{i}" for i in range(100)]})
    _write(users, f"{src}/users.parquet")
    users2 = users.copy()
    users2.loc[users2["id"] == 7, "name"] = "MUTATED"
    _write(users2, f"{snk}/users.parquet")
    items = pd.DataFrame({"id": np.arange(50, dtype=np.int64),
                          "price": np.arange(50) * 1.5})
    _write(items, f"{src}/items.parquet")
    _write(items, f"{snk}/items.parquet")
    # table only on source -> table miss
    _write(items, f"{src}/only_src.parquet")
    return src, snk


class TestSchemaRunner:
    def test_validate_schema_end_to_end(self, schema_dirs):
        src, snk = schema_dirs
        out = validate_schema(
            src, snk,
            key_columns={"users": ("id",), "items": ("id",)},
            cfg=ValidationConfig(key_columns=("id",), check_drift=False,
                                 check_uniqueness=False))
        by_table = {s["table"]: s for s in out["summaries"]}
        assert by_table["items"]["result"] == "success"
        assert by_table["users"]["result"] == "failed"
        assert by_table["users"]["updateTotal"] == 1
        assert by_table["only_src"]["result"] == "failed"
        assert "table miss" in by_table["only_src"]["message"]
        assert out["summary"]["tableCount"] == 3
        assert out["register"].is_complete("items")

    def test_table_rules_filter(self, schema_dirs):
        src, snk = schema_dirs
        out = validate_schema(
            src, snk, key_columns={"items": ("id",)},
            cfg=ValidationConfig(key_columns=("id",), check_drift=False,
                                 check_uniqueness=False),
            rules=RuleConfig(table_white=["items"]))
        assert [s["table"] for s in out["summaries"]] == ["items"]

    def test_column_rule_keeps_pk(self):
        cols = apply_column_rule(["id", "a", "b"], "t",
                                 RuleConfig(column_exclude={"t": ["id", "b"]}),
                                 ("id",))
        assert cols == ["id", "a"]
        cols2 = apply_column_rule(["id", "a", "b"], "t",
                                  RuleConfig(column_include={"t": ["a"]}),
                                  ("id",))
        assert cols2 == ["id", "a"]

    def test_row_rule_window(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"id": np.arange(100, dtype=np.int64),
                           "v": np.arange(100)})
        ds = rd.from_pandas(df.sample(frac=1.0, random_state=0))
        out = apply_row_rule(ds, "id", 10, 20).to_pandas()
        assert sorted(out["id"]) == list(range(10, 30))


class TestIncremental:
    def test_window_flush_by_count(self):
        w = incremental.ChangeLogWindow(
            incremental.IncrementConfig(count_period=5, time_period_s=1e9))
        assert w.offer(["a", "b"]) is None
        flushed = w.offer(["c", "d", "e", "a"])
        assert flushed == ["a", "b", "c", "d", "e"]  # deduped, sorted

    def test_window_flush_by_time(self):
        clock = {"t": 0.0}
        w = incremental.ChangeLogWindow(
            incremental.IncrementConfig(count_period=10**9, time_period_s=5),
            clock=lambda: clock["t"])
        assert w.offer(["k1"]) is None
        clock["t"] = 6.0
        assert w.offer(["k2"]) == ["k1", "k2"]

    def test_incremental_check_two_phase(self, schema_dirs):
        import ray.data as rd

        src, snk = schema_dirs

        def src_f():
            return rd.read_parquet(f"{src}/users.parquet")

        def snk_f():
            return rd.read_parquet(f"{snk}/users.parquet")

        # changed keys include the mutated row 7 and clean rows
        res = incremental.incremental_check(
            src_f, snk_f, ["id"], ["7", "8", "9"], table="users")
        assert res.result == "failed"
        assert list(res.violations["key"]) == ["7"]
        assert res.violations["kind"].iloc[0] == "update"
        assert [p["phase"] for p in res.phases] == ["primary", "secondary"]
        # clean keys -> success, single phase
        res2 = incremental.incremental_check(
            src_f, snk_f, ["id"], ["1", "2"], table="users")
        assert res2.result == "success"
        assert len(res2.phases) == 1

    def test_max_diff_guard(self, schema_dirs):
        import ray.data as rd

        src, snk = schema_dirs
        res = incremental.incremental_check(
            lambda: rd.read_parquet(f"{src}/users.parquet"),
            lambda: rd.read_parquet(f"{snk}/users.parquet"),
            ["id"], [str(i) for i in range(100)], table="users",
            cfg=incremental.IncrementConfig(max_diff_count=10))
        assert res.result == "failed"
        assert "exceeds" in res.message


class TestCsvSource:
    def test_real_table_shapes_self_validate(self, ray_session, tmp_path):
        """Every real testdata schema shape — including the embeddings
        table's list<float> column through the canonical fallback —
        self-validates clean at sf0.001."""
        import os

        from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
            ValidationConfig, validate_schema,
        )

        keys = {"region": ("r_regionkey",), "nation": ("n_nationkey",),
                "embeddings": ("vec_id",), "documents": ("doc_id",)}
        for side in ("src", "snk"):
            os.makedirs(tmp_path / side)
            for t in keys:
                os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                           tmp_path / side / f"{t}.parquet")
        out = validate_schema(str(tmp_path / "src"), str(tmp_path / "snk"),
                              keys, ValidationConfig(check_drift=False))
        assert out["summary"]["failedCount"] == 0
        assert out["summary"]["successCount"] == 4

    def test_validate_csv_pair_end_to_end(self, ray_session, tmp_path):
        """CSV-mode validation (§3.2): clean pair passes and writes
        completion markers; a mutated pair localizes the diff and
        leaves shards pending for the rerun."""
        import csv

        from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
            ValidationConfig, validate_csv_pair,
        )
        from opengauss_tools_datachecker_performance_ray.sources import (
            csvsrc,
        )

        def write(dirname, rows):
            d = tmp_path / dirname
            d.mkdir(parents=True, exist_ok=True)
            for i in range(2):
                with open(d / f"shard{i}.csv", "w", newline="") as f:
                    w = csv.writer(f)
                    w.writerow(["k", "v"])
                    w.writerows(rows[i::2])
            return str(d)

        rows = [[f"k{i}", f"v{i}"] for i in range(40)]
        src = write("src", rows)
        snk = write("snk", rows)
        cfg = ValidationConfig(key_columns=("k",))
        res = validate_csv_pair(src, snk, cfg, table="t")
        assert res.summary["result"] == "success"
        assert csvsrc.pending_shards(src) == []  # markers written
        bad = [r[:] for r in rows]
        bad[7][1] = "MUT"
        snk2 = write("snk2", bad)
        res2 = validate_csv_pair(src, snk2, cfg, table="t")
        v = res2.compare.violations
        assert list(v["kind"]) == ["update"] and v["key"].iloc[0] == "k7"

    def test_csv_failed_detail_locates_bad_rows(self, ray_session,
                                                tmp_path):
        """Round-2 verdict #6: failed_detail.log must locate each
        violation by (shard file, 1-based row idx) per diff kind —
        the reference's CheckCsvFailed/CsvFileFailed shapes."""
        import csv
        import json

        from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
            ValidationConfig, validate_csv_pair,
        )

        def write(dirname, rows):
            d = tmp_path / dirname
            d.mkdir(parents=True, exist_ok=True)
            for i in range(2):
                with open(d / f"shard{i}.csv", "w", newline="") as f:
                    w = csv.writer(f)
                    w.writerow(["k", "v"])
                    w.writerows(rows[i::2])
            return str(d)

        rows = [[f"k{i:02d}", f"v{i}"] for i in range(40)]
        bad = [r[:] for r in rows]
        bad[7][1] = "MUT"                     # update @ src+snk
        src_rows = rows + [["zz_src_only", "x"]]   # insert (src only)
        snk_rows = bad + [["zz_snk_only", "y"]]    # delete (snk only)
        src = write("src", src_rows)
        snk = write("snk", snk_rows)
        report = str(tmp_path / "report")
        cfg = ValidationConfig(key_columns=("k",), report_dir=report)
        res = validate_csv_pair(src, snk, cfg, table="t")
        assert res.summary["result"] == "failed"
        with open(f"{report}/failed_detail.log") as f:
            recs = [json.loads(line.rstrip().rstrip(","))
                    for line in f if line.strip()]
        by_file = {r["fileFailed"]["fileName"]: r["fileFailed"]
                   for r in recs}
        assert all(r["table"] == "t" for r in recs)
        # k07 (odd) lives in src's shard1 at data row (7-1)/2 + 1 = 4
        upd = by_file["src/shard1.csv"]["keyUpdate"]
        assert {"key": "k07", "idx": 4} in upd
        # the appended rows are the LAST data row of shard0 (21 rows);
        # insert located at SOURCE, delete at SINK
        ins = by_file["src/shard0.csv"]["keyInsert"]
        assert {"key": "zz_src_only", "idx": 21} in ins
        dele = by_file["snk/shard0.csv"]["keyDelete"]
        assert {"key": "zz_snk_only", "idx": 21} in dele
        for ff in by_file.values():
            assert ff["size"] == (len(ff["keyInsert"])
                                  + len(ff["keyUpdate"])
                                  + len(ff["keyDelete"]))

    def test_read_and_markers(self, ray_session, tmp_path):
        d = tmp_path / "csvdir"
        d.mkdir()
        for i in range(3):
            pd.DataFrame({"id": range(i * 10, i * 10 + 10),
                          "v": range(10)}).to_csv(
                str(d / f"shard{i}.csv"), index=False)
        ds = csvsrc.read_csv_table(str(d))
        assert ds.count() == 30
        assert len(csvsrc.pending_shards(str(d))) == 3
        csvsrc.mark_shard_done(str(d / "shard1.csv"))
        pending = csvsrc.pending_shards(str(d))
        assert len(pending) == 2
        assert not any("shard1" in p for p in pending)

    def test_schema_sidecar(self, ray_session, tmp_path):
        import json

        d = tmp_path / "csvtyped"
        d.mkdir()
        pd.DataFrame({"id": [1, 2], "v": ["x", "y"]}).to_csv(
            str(d / "a.csv"), index=False)
        (d / "schema.json").write_text(json.dumps(
            {"id": "int64", "v": "string"}))
        ds = csvsrc.read_csv_table(str(d))
        schema = ds.schema()
        assert dict(zip(schema.names, map(str, schema.types))) == {
            "id": "int64", "v": "string"}


class TestRegistry:
    def test_status_bitmask(self):
        r = registry.TableStatusRegister(["t1", "t2"])
        r.update("t1", registry.SOURCE_EXTRACTED)
        r.update("t1", registry.SINK_EXTRACTED)
        assert not r.is_complete("t1")
        r.update("t1", registry.CHECKED)
        assert r.is_complete("t1")
        assert r.complete_count() == 1
        assert not r.all_complete()

    def test_rate_window(self):
        clock = {"t": 0.0}
        w = registry.CheckRateWindow(window_s=10, clock=lambda: clock["t"])
        w.record(100)
        clock["t"] = 2.0
        w.record(100)
        assert w.rate() == pytest.approx(100.0)  # 200 rows / 2 s
        assert w.total_rows == 200

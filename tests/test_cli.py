"""CLI surface tests (`python -m opengauss_tools_datachecker_performance_ray ...`) —
run in-process against the shared Ray session (main() must not tear
down a session it didn't create)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from opengauss_tools_datachecker_performance_ray.__main__ import main


def _pair(tmp_path, src_tbl, snk_tbl):
    a, b = tmp_path / "src", tmp_path / "snk"
    a.mkdir(exist_ok=True); b.mkdir(exist_ok=True)
    pq.write_table(src_tbl, str(a / "p.parquet"))
    pq.write_table(snk_tbl, str(b / "p.parquet"))
    return str(a), str(b)


class TestCli:
    def test_validate_clean_pair_exit_zero(self, ray_session, tmp_path,
                                           capsys):
        t = pa.table({"k": ["a", "b"], "v": ["1", "2"]})
        src, snk = _pair(tmp_path, t, t)
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--no-drift"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["result"] == "success"
        import ray

        assert ray.is_initialized()  # session NOT torn down

    def test_validate_diff_pair_exit_one(self, ray_session, tmp_path,
                                         capsys):
        src_t = pa.table({"k": ["a", "b"], "v": ["1", "2"]})
        snk_t = pa.table({"k": ["a", "b"], "v": ["1", "X"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--no-drift"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        assert out["updateTotal"] == 1

    def test_increment_from_change_log(self, ray_session, tmp_path,
                                       capsys):
        src_t = pa.table({"id": ["1", "2", "3"], "v": ["a", "b", "c"]})
        snk_t = pa.table({"id": ["1", "2", "3"], "v": ["a", "B", "c"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        events = [json.dumps({"payload": {
            "before": None, "after": {"id": k, "v": "?"},
            "source": {"table": "t"}, "op": "u", "ts_ms": 1}})
            for k in ("1", "2")]
        log = tmp_path / "log.jsonl"
        log.write_text("\n".join(events) + "\n")
        rc = main(["increment", "--source", src, "--sink", snk,
                   "--change-log", str(log), "--table", "t",
                   "--keys", "id", "--count-period", "10"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        assert out["diffKeys"] == ["2"]  # only the genuinely changed key
        assert out["checkedKeys"] == 2

    def test_increment_stream_mode(self, ray_session, tmp_path, capsys):
        """--stream tails a change-log DIRECTORY until idle polls."""
        src_t = pa.table({"id": ["1", "2", "3"], "v": ["a", "b", "c"]})
        snk_t = pa.table({"id": ["1", "2", "3"], "v": ["a", "B", "c"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        d = tmp_path / "cdc"
        d.mkdir()
        events = [json.dumps({"payload": {
            "before": None, "after": {"id": k, "v": "?"},
            "source": {"table": "t"}, "op": "u", "ts_ms": 1}})
            for k in ("1", "2", "3")]
        (d / "a.jsonl").write_text("\n".join(events) + "\n")
        rc = main(["increment", "--source", src, "--sink", snk,
                   "--change-log", str(d), "--table", "t", "--keys", "id",
                   "--count-period", "2", "--stream",
                   "--poll-interval", "0.01", "--idle-polls", "2"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        assert out["diffKeys"] == ["2"]
        assert out["windows"] == 2  # flush of 2 + tail flush of 1
        assert out["checkedKeys"] == 3

    def test_repair_style_flags(self, ray_session, tmp_path, capsys):
        """--emit-repair with UPDATE style + batched DELETE writes the
        UpdateDmlBuilder/BatchDeleteDmlBuilder-shaped statements."""
        src_t = pa.table({"k": ["a", "b"], "v": ["1", "2"]})
        snk_t = pa.table({"k": ["a", "b", "c"], "v": ["1", "X", "3"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        rep = tmp_path / "rep"
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--table", "t", "--no-drift",
                   "--no-uniqueness", "--emit-repair",
                   "--report-dir", str(rep),
                   "--repair-update-style", "update",
                   "--repair-batch-delete"])
        capsys.readouterr()
        assert rc == 1
        sql = (rep / "repair_t.sql").read_text()
        # repair applies the SOURCE side's value over the sink
        assert "UPDATE t SET v = '2' WHERE k = 'b';" in sql
        assert "DELETE FROM t WHERE k IN ('c');" in sql

    def test_schema_subcommand(self, ray_session, tmp_path, capsys):
        for side in ("s", "k"):
            d = tmp_path / side / "t1"
            d.mkdir(parents=True)
            pq.write_table(pa.table({"k": ["x"], "v": ["1"]}),
                           str(d / "p.parquet"))
        rc = main(["schema", "--source", str(tmp_path / "s"),
                   "--sink", str(tmp_path / "k"), "--keys", "k"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["failedCount"] == 0

    def test_missing_input_clean_error(self, ray_session, tmp_path,
                                       capsys):
        rc = main(["validate", "--source", str(tmp_path / "nope"),
                   "--sink", str(tmp_path / "nope2"), "--keys", "k"])
        assert rc == 2
        err = capsys.readouterr().err
        assert "error" in err


class TestStreamPathValidation:
    def test_stream_rejects_file_path(self, ray_session, tmp_path,
                                      capsys):
        """Review finding: --stream on a FILE (the non-stream shape)
        must fail loudly, not report a vacuous 0-window success."""
        import pyarrow as pa

        src_t = pa.table({"id": ["1"], "v": ["a"]})
        src, snk = _pair(tmp_path, src_t, src_t)
        log = tmp_path / "events.jsonl"
        log.write_text("")
        rc = main(["increment", "--source", src, "--sink", snk,
                   "--change-log", str(log), "--table", "t",
                   "--keys", "id", "--stream", "--idle-polls", "2",
                   "--poll-interval", "0.01"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 2 and out["result"] == "failed"
        assert "directory" in out["message"]


class TestCurateCli:
    def test_curate_writes_and_resumes(self, ray_session, tmp_path,
                                       capsys):
        docs = pa.table({
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(["dup line\nown %d" % i for i in range(6)]),
            "lang": pa.array(["en", "en", "fr", "fr", "de", "de"]),
        })
        src = str(tmp_path / "documents.parquet")
        pq.write_table(docs, src)
        out = str(tmp_path / "out")
        rc = main(["curate", "--input", src, "--out", out])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert sorted(rep["written"]) == ["de", "en", "fr"]
        # rebuilt corpus: 'dup line' survives only in doc 0
        back = pq.read_table(out + "/part=en").to_pandas() \
            .sort_values("doc_id")
        assert list(back["text"]) == ["dup line\nown 0", "own 1"]
        # resume: everything already receipted
        rc = main(["curate", "--input", src, "--out", out])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["written"] == [] and sorted(rep["skipped"]) == \
            ["de", "en", "fr"]

    def test_curate_redact_and_span_filter(self, ray_session, tmp_path,
                                           capsys):
        span = "alpha beta gamma delta epsilon zeta eta theta"
        docs = pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array([
                span,                                   # contaminated
                span + " unique tail words here now",   # partly shared
                "mail me at bob@example.com for info please today",
                "plain words only in this one document here",
            ]),
            "lang": pa.array(["en"] * 4),
        })
        src = str(tmp_path / "documents.parquet")
        pq.write_table(docs, src)
        out = str(tmp_path / "out_red")
        rc = main(["curate", "--input", src, "--out", out,
                   "--max-span-dup-ratio", "0.9", "--redact", "email"])
        assert rc == 0
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        back = pq.read_table(out + "/part=en").to_pandas() \
            .sort_values("doc_id")
        # doc 0: every shingle shared with doc 1 -> ratio 1.0 > 0.9,
        # dropped; doc 1 keeps (its tail shingles are unique)
        assert 0 not in set(back["doc_id"])
        assert {1, 2, 3} <= set(back["doc_id"])
        redacted = back.loc[back["doc_id"] == 2, "text"].iloc[0]
        assert "bob@example.com" not in redacted
        assert "[REDACTED]" in redacted or "[X]" in redacted

    def test_curate_unknown_redact_preset(self, ray_session, tmp_path,
                                          capsys):
        docs = pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["some words"]),
            "lang": pa.array(["en"]),
        })
        src = str(tmp_path / "documents.parquet")
        pq.write_table(docs, src)
        rc = main(["curate", "--input", src,
                   "--out", str(tmp_path / "o2"), "--redact", "ssn"])
        err = json.loads(capsys.readouterr().err.strip().splitlines()[-1])
        assert rc == 2 and "unknown --redact preset" in err["error"]


class TestCurateGopherFilter:
    def test_quality_gate_drops_short_docs(self, ray_session, tmp_path,
                                           capsys):
        passing = "the a " + " ".join(f"w{j}" for j in range(30))
        docs = pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array([passing, "tiny doc",
                              passing + " extra tok", "the a"]),
            "lang": pa.array(["en", "en", "en", "en"]),
        })
        src = str(tmp_path / "documents.parquet")
        pq.write_table(docs, src)
        out = str(tmp_path / "out")
        rc = main(["curate", "--input", src, "--out", out,
                   "--gopher-filter"])
        assert rc == 0
        capsys.readouterr()
        back = pq.read_table(out + "/part=en").to_pandas()
        # docs 1 and 3 fail the word-count rule and never reach dedup
        assert sorted(back["doc_id"]) == [0, 2]


class TestRulesCli:
    def _write(self, tmp_path):
        t = pa.table({
            "id": pa.array([1, 2, 3, 3], pa.int64()),
            "grp": ["a", "a", "b", "b"],
            "v": pa.array([5, 500, 7, None], pa.int64()),
        })
        inp = tmp_path / "t.parquet"
        pq.write_table(t, str(inp))
        spec = {"partition_col": "grp", "rules": [
            {"kind": "not_null", "column": "v"},
            {"kind": "range", "column": "v", "lo": 0, "hi": 100},
            {"kind": "unique", "column": "id"},
        ]}
        sp = tmp_path / "spec.json"
        sp.write_text(json.dumps(spec))
        return str(inp), str(sp)

    def test_rules_failing_table(self, ray_session, tmp_path, capsys):
        inp, sp = self._write(tmp_path)
        rep_out = tmp_path / "rep.parquet"
        viol_out = tmp_path / "viol"
        rc = main(["rules", "--input", inp, "--spec", sp,
                   "--report-out", str(rep_out),
                   "--violations-out", str(viol_out),
                   "--violation-columns", "id,v"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        assert sorted(out["failed_rules"]) == [
            "not_null(v)", "range(v)", "unique(id)"]
        assert out["total_violations"] == 4  # 1 null + 1 range + 2 dup

        import pandas as pd

        rep = pd.read_parquet(str(rep_out))
        # 2 scopes x 2 row-local + 1 table-level unique
        assert len(rep) == 5
        viol = pd.read_parquet(str(viol_out / "range_v_"))
        assert list(viol.columns) == ["id", "v"]
        assert viol["id"].tolist() == [2]
        # cross-row kinds export their natural evidence too
        dup = pd.read_parquet(str(viol_out / "unique_id_"))
        assert dup["id"].tolist() == [3] and int(dup["n"].iloc[0]) == 2

    def test_rules_quantile_kind_via_spec(self, ray_session, tmp_path,
                                          capsys):
        """The quantile aggregate kind flows through the JSON spec +
        CLI unchanged: p50(v) per grp against a declared band."""
        t = pa.table({
            "grp": ["a", "a", "a", "b", "b"],
            "v": pa.array([1, 2, 30, 5, 6], pa.int64()),
        })
        inp = tmp_path / "t.parquet"
        pq.write_table(t, str(inp))
        sp = tmp_path / "spec.json"
        sp.write_text(json.dumps({"partition_col": "grp", "rules": [
            {"kind": "quantile", "column": "v", "q": 0.5,
             "lo": 0, "hi": 4}]}))
        rc = main(["rules", "--input", str(inp), "--spec", str(sp)])
        out = json.loads(capsys.readouterr().out.strip())
        # p50(a) = 2 in [0,4]; p50(b) = 5 > 4 -> failed
        assert rc == 1 and out["result"] == "failed"
        assert out["failed_rules"] == ["quantile[0.5](v)"]

    def test_rules_clean_table_exit_zero(self, ray_session, tmp_path,
                                         capsys):
        t = pa.table({"id": pa.array([1, 2], pa.int64()),
                      "v": pa.array([5, 6], pa.int64())})
        inp = tmp_path / "clean.parquet"
        pq.write_table(t, str(inp))
        sp = tmp_path / "spec.json"
        sp.write_text(json.dumps({"rules": [
            {"kind": "range", "column": "v", "lo": 0, "hi": 100},
            {"kind": "unique", "column": "id"}]}))
        rc = main(["rules", "--input", str(inp), "--spec", str(sp)])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["result"] == "success"

    def test_rules_bad_spec_exit_two(self, ray_session, tmp_path,
                                     capsys):
        inp, _ = self._write(tmp_path)
        sp = tmp_path / "bad.json"
        sp.write_text(json.dumps({"rules": [
            {"kind": "nope", "column": "v"}]}))
        rc = main(["rules", "--input", inp, "--spec", str(sp)])
        err = capsys.readouterr().err
        assert rc == 2 and "bad rule spec" in err


class TestCurateMixChunk:
    def test_curate_mix_and_chunk(self, ray_session, tmp_path, capsys):
        import numpy as np

        n = 400
        t = pa.table({
            "doc_id": pa.array(range(1, n + 1), pa.int64()),
            "lang": pa.array((["en", "zh"] * (n // 2))),
            "text": pa.array([" ".join(f"t{i}_{j}" for j in range(12))
                              for i in range(n)]),
        })
        inp = tmp_path / "docs.parquet"
        pq.write_table(t, str(inp))
        out = tmp_path / "out"
        rc = main(["curate", "--input", str(inp), "--out", str(out),
                   "--mix", "en=0.1,zh=0.9",
                   "--chunk-window", "5", "--chunk-stride", "4",
                   "--partition-col", "lang"])
        res = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and res["result"] == "success"

        import pandas as pd

        df = pd.concat(pd.read_parquet(f"{out}/part={v}")
                       .assign(lang=v) for v in ("en", "zh"))
        # chunk rows, not docs: window/stride decomposition applied
        assert {"win_no", "n_tok", "win_text"} <= set(df.columns)
        # the mix kept far fewer en than zh docs
        n_en = df[(df.lang == "en") & (df.win_no == 0)].shape[0]
        n_zh = df[(df.lang == "zh") & (df.win_no == 0)].shape[0]
        assert n_en < n_zh
        # 12 tokens @ window 5 stride 4 -> 3 windows of 5,5,4 tokens
        one = df.sort_values(["doc_id", "win_no"]) \
            .groupby("doc_id")["n_tok"].agg(list)
        assert all(v == [5, 5, 4] for v in one)

    def test_curate_bad_mix_exit_two(self, ray_session, tmp_path,
                                     capsys):
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "lang": ["en"], "text": ["a b"]})
        inp = tmp_path / "d.parquet"
        pq.write_table(t, str(inp))
        rc = main(["curate", "--input", str(inp),
                   "--out", str(tmp_path / "o"), "--mix", "en:0.5"])
        assert rc == 2
        assert "bad --mix" in capsys.readouterr().err


class TestValidateRulesSpec:
    def test_validate_with_rules_spec(self, ray_session, tmp_path,
                                      capsys):
        t = pa.table({"k": ["a", "b"], "v": pa.array([1, 500],
                                                     pa.int64())})
        src, snk = _pair(tmp_path, t, t)
        sp = tmp_path / "spec.json"
        sp.write_text(json.dumps({"rules": [
            {"kind": "range", "column": "v", "lo": 0, "hi": 100}]}))
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--no-drift",
                   "--rules-spec", str(sp)])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        assert out["rulesFailed"] == 1 and out["ruleViolations"] == 1


class TestRulesSpecEdges:
    def test_csv_mode_rejects_rules_spec(self, ray_session, tmp_path,
                                         capsys):
        sp = tmp_path / "s.json"
        sp.write_text(json.dumps({"rules": [
            {"kind": "not_null", "column": "v"}]}))
        rc = main(["validate", "--source", str(tmp_path / "a"),
                   "--sink", str(tmp_path / "b"), "--keys", "k",
                   "--format", "csv", "--rules-spec", str(sp)])
        assert rc == 2
        assert "not supported" in capsys.readouterr().err

    def test_malformed_spec_json_clean_error(self, ray_session,
                                             tmp_path, capsys):
        t = pa.table({"k": ["a"], "v": ["1"]})
        src, snk = _pair(tmp_path, t, t)
        sp = tmp_path / "bad.json"
        sp.write_text("{not json")
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--rules-spec", str(sp)])
        assert rc == 2
        assert "bad rule spec" in capsys.readouterr().err

    def test_compare_cols_violations_exported(self, ray_session,
                                              tmp_path, capsys):
        t = pa.table({"n": pa.array([2, 9], pa.int64()),
                      "s": ["ab", "abc"],
                      "id": pa.array([1, 2], pa.int64())})
        inp = tmp_path / "t.parquet"
        pq.write_table(t, str(inp))
        sp = tmp_path / "spec.json"
        sp.write_text(json.dumps({"rules": [
            {"kind": "compare_cols", "column": "n", "right": "s",
             "op": "==", "right_fn": "length"}]}))
        vout = tmp_path / "viol"
        rc = main(["rules", "--input", str(inp), "--spec", str(sp),
                   "--violations-out", str(vout),
                   "--violation-columns", "id,n"])
        capsys.readouterr()
        assert rc == 1

        import glob

        import pandas as pd

        dirs = glob.glob(str(vout / "*"))
        assert len(dirs) == 1  # compare_cols rule exported its rows
        rows = pd.read_parquet(dirs[0])
        assert rows["id"].tolist() == [2]


class TestReconcileCli:
    def test_reconcile_clean_pair_exit_zero(self, ray_session, tmp_path,
                                            capsys):
        t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "v": ["a", "b", "c"]})
        src, snk = _pair(tmp_path, t, t)
        rc = main(["reconcile", "--source", src, "--sink", snk])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["result"] == "success"
        assert out["mismatched"] == 0 and out["metrics"] > 0

    def test_reconcile_mismatch_exit_one_and_report(self, ray_session,
                                                    tmp_path, capsys):
        src_t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                          "v": ["a", "b", "c"]})
        snk_t = pa.table({"k": pa.array([1, 2, 9], pa.int64()),
                          "v": ["a", "b", "c"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        report = str(tmp_path / "reconcile.parquet")
        rc = main(["reconcile", "--source", src, "--sink", snk,
                   "--report-out", report])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        assert out["mismatchedColumns"] == ["k"]
        rep = pq.read_table(report).to_pandas()
        assert set(rep.columns) == {"col", "metric", "src_val",
                                    "snk_val", "is_match"}
        bad = rep[~rep["is_match"]]
        assert set(bad["metric"]) == {"sum", "max"}

    def test_validate_sample_rate_detects_subset(self, ray_session,
                                                 tmp_path, capsys):
        """Sampled validate flags diffs whose key lands in the sample
        and stays deterministic about which rows it checks."""
        n = 400
        ks = pa.array(range(n), pa.int64())
        src_t = pa.table({"k": ks, "v": [str(i) for i in range(n)]})
        snk_t = pa.table({"k": ks,
                          "v": [("X" if i % 5 == 0 else str(i))
                                for i in range(n)]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--no-drift", "--sample-rate", "0.5"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        assert out["sampleRate"] == 0.5
        # the sample holds ~half the rows, so ~half the diffs
        assert 0 < out["updateTotal"] < 80
        # sampled rowCount is well under the full 2n
        assert out["rowCount"] < int(2 * n * 0.75)

    def test_validate_sample_rate_requires_integer_key(self, ray_session,
                                                       tmp_path, capsys):
        t = pa.table({"k": ["a", "b"], "v": ["1", "2"]})
        src, snk = _pair(tmp_path, t, t)
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--no-drift", "--sample-rate", "0.5"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        assert "integer key" in out["message"]

    def test_validate_sample_rate_rejects_csv_and_bad_rate(
            self, ray_session, tmp_path, capsys):
        t = pa.table({"k": pa.array([1], pa.int64())})
        src, snk = _pair(tmp_path, t, t)
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--format", "csv",
                   "--sample-rate", "0.5"])
        assert rc == 2
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--sample-rate", "0.0"])
        assert rc == 2
        capsys.readouterr()


class TestQuickReconcilePhase:
    def test_validate_quick_reconcile_clean(self, ray_session, tmp_path,
                                            capsys):
        t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "v": ["a", "b", "c"]})
        src, snk = _pair(tmp_path, t, t)
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--no-drift", "--quick-reconcile"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["result"] == "success"
        assert out["reconcileMismatched"] == 0

    def test_validate_quick_reconcile_counts_mismatches(
            self, ray_session, tmp_path, capsys):
        src_t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                          "v": ["a", "b", "c"]})
        snk_t = pa.table({"k": pa.array([1, 2], pa.int64()),
                          "v": ["a", "b"]})
        src, snk = _pair(tmp_path, src_t, snk_t)
        rc = main(["validate", "--source", src, "--sink", snk,
                   "--keys", "k", "--no-drift", "--quick-reconcile"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        # n_rows + k sum/max + v max all shift
        assert out["reconcileMismatched"] >= 3
        # compare phase agrees: the row missing at sink needs an INSERT
        assert out["insertTotal"] == 1


def test_reconcile_cli_by_group(ray_session, tmp_path, capsys):
    src_t = pa.table({"g": ["a", "a", "b"],
                      "c": pa.array([1, 2, 3], pa.int64())})
    snk_t = pa.table({"g": ["a", "a", "b"],
                      "c": pa.array([1, 2, 9], pa.int64())})
    src, snk = _pair(tmp_path, src_t, snk_t)
    rc = main(["reconcile", "--source", src, "--sink", snk,
               "--group-col", "g", "--column", "c"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 1 and out["mismatchedColumns"] == ["b"]
    # --group-col without --column is a usage error
    rc = main(["reconcile", "--source", src, "--sink", snk,
               "--group-col", "g"])
    assert rc == 2
    capsys.readouterr()


def test_quick_reconcile_rejects_csv(ray_session, tmp_path, capsys):
    t = pa.table({"k": pa.array([1], pa.int64())})
    src, snk = _pair(tmp_path, t, t)
    rc = main(["validate", "--source", src, "--sink", snk,
               "--keys", "k", "--format", "csv", "--quick-reconcile"])
    assert rc == 2
    assert "quick-reconcile" in capsys.readouterr().err


def test_reconcile_cli_pruned_columns(ray_session, tmp_path, capsys):
    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": ["a", "b"], "w": ["x", "y"]})
    src, snk = _pair(tmp_path, t, t)
    rc = main(["reconcile", "--source", src, "--sink", snk,
               "--columns", "k,v"])
    out = json.loads(capsys.readouterr().out.strip())
    assert rc == 0
    # n_rows + k(nulls,sum,min,max) + v(nulls,min,max) — w never read
    assert out["metrics"] == 8


class TestRulesFdSpec:
    def test_fd_kind_via_spec(self, ray_session, tmp_path, capsys):
        """The functional_dependency kind flows through the JSON spec
        + CLI unchanged, composite determinant as a list."""
        t = pa.table({
            "a": pa.array([1, 1, 2, 2], pa.int64()),
            "g": ["p", "p", "q", "q"],
            "b": ["x", "y", "z", "z"],
        })
        inp = tmp_path / "t.parquet"
        pq.write_table(t, str(inp))
        sp = tmp_path / "spec.json"
        sp.write_text(json.dumps({"rules": [
            {"kind": "functional_dependency", "column": "a",
             "determines": "b"},
            {"kind": "functional_dependency", "column": ["a", "g"],
             "determines": "b"},
        ]}))
        rc = main(["rules", "--input", str(inp), "--spec", str(sp)])
        out = json.loads(capsys.readouterr().out.strip())
        # a=1 -> {x, y} violates both; (a,g)=(1,p) likewise
        assert rc == 1 and out["result"] == "failed"
        assert sorted(out["failed_rules"]) == [
            "fd(a,g->b)", "fd(a->b)"]

    def test_fd_kind_partition_scoped_via_spec(self, ray_session,
                                               tmp_path, capsys):
        """partition_col in the spec makes the FD per-scope: grp 'p'
        violates (a=1 -> {x, y}), grp 'q' holds."""
        t = pa.table({
            "a": pa.array([1, 1, 1, 2], pa.int64()),
            "g": ["p", "p", "q", "q"],
            "b": ["x", "y", "z", "z"],
        })
        inp = tmp_path / "t.parquet"
        pq.write_table(t, str(inp))
        sp = tmp_path / "spec.json"
        sp.write_text(json.dumps({"partition_col": "g", "rules": [
            {"kind": "functional_dependency", "column": "a",
             "determines": "b"}]}))
        rep_out = tmp_path / "rep.parquet"
        rc = main(["rules", "--input", str(inp), "--spec", str(sp),
                   "--report-out", str(rep_out)])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        import pandas as pd
        rep = pd.read_parquet(str(rep_out))
        assert len(rep) == 2  # one verdict row per scope
        byscope = rep.set_index("scope")
        assert byscope.loc["p", "passed"] == 0
        assert byscope.loc["p", "n_violations"] == 1
        assert byscope.loc["q", "passed"] == 1


class TestProfileCli:
    def test_schema_profile_single_table(self, ray_session, tmp_path,
                                         capsys):
        t = pa.table({"k": pa.array([1, 2, None], pa.int64()),
                      "v": ["a", None, None]})
        inp = tmp_path / "t.parquet"
        pq.write_table(t, str(inp))
        sout = tmp_path / "schema.parquet"
        rc = main(["profile", "--input", str(inp),
                   "--schema-out", str(sout),
                   "--null-patterns", "k,v"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["result"] == "success"
        assert out["tables"] == 1 and out["columns"] == 2
        assert out["total_rows"] == 3
        pats = {(p["k_null"], p["v_null"]): p["n"]
                for p in out["null_patterns"]}
        assert pats == {(False, False): 1, (False, True): 1,
                        (True, True): 1}
        import pandas as pd

        sch = pd.read_parquet(str(sout))
        assert sch["data_type"].tolist() == ["BIGINT", "VARCHAR"]

    def test_schema_profile_multi_table_catalog(self, ray_session,
                                                tmp_path, capsys):
        a = tmp_path / "a.parquet"
        b = tmp_path / "b.parquet"
        pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), str(a))
        pq.write_table(pa.table({"y": ["z"], "w": [1.0]}), str(b))
        rc = main(["profile", "--input", f"a={a},b={b}"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0
        assert out["tables"] == 2 and out["columns"] == 3
        assert out["total_rows"] == 2

    def test_null_patterns_rejects_multi_table(self, ray_session,
                                               tmp_path, capsys):
        a = tmp_path / "a.parquet"
        pq.write_table(pa.table({"x": [1]}), str(a))
        rc = main(["profile", "--input", f"a={a},b={a}",
                   "--null-patterns", "x"])
        assert rc == 2
        assert "single-table" in capsys.readouterr().err

    def test_formats_flag(self, ray_session, tmp_path, capsys):
        t = pa.table({"s": ["42", "x y", "2024-01-01", None]})
        inp = tmp_path / "t.parquet"
        pq.write_table(t, str(inp))
        rc = main(["profile", "--input", str(inp), "--formats", "s"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0
        fmts = {f["format"]: f["n"] for f in out["formats"]}
        assert fmts == {"int": 1, "words": 1, "date": 1}

    def test_sketch_manifest_and_drift(self, ray_session, tmp_path,
                                       capsys):
        import numpy as np

        rng = np.random.default_rng(41)
        t0 = pa.table({"x": rng.normal(10, 1, 3000)})
        t1 = pa.table({"x": rng.normal(50, 1, 3000)})
        p0, p1 = tmp_path / "t0.parquet", tmp_path / "t1.parquet"
        pq.write_table(t0, str(p0)); pq.write_table(t1, str(p1))
        sk = str(tmp_path / "sk")
        rc = main(["profile", "--input", str(p0), "--sketch-out", sk])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["sketch_columns"] == ["x"]
        rc = main(["profile", "--input", str(p0),
                   "--drift-against", sk])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["result"] == "success"
        rc = main(["profile", "--input", str(p1),
                   "--drift-against", sk])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "drifted"

    def test_grouped_sketch_and_drift(self, ray_session, tmp_path,
                                      capsys):
        import numpy as np

        rng = np.random.default_rng(59)
        def tbl(shift_b=0.0):
            return pa.table({
                "g": ["a"] * 2000 + ["b"] * 2000,
                "x": np.r_[rng.normal(5, 1, 2000),
                           rng.normal(20 + shift_b, 1, 2000)]})
        p0, p1 = tmp_path / "t0.parquet", tmp_path / "t1.parquet"
        pq.write_table(tbl(), str(p0))
        pq.write_table(tbl(shift_b=30.0), str(p1))
        sk = str(tmp_path / "sk")
        rc = main(["profile", "--input", str(p0), "--sketch-out", sk,
                   "--group-col", "g", "--columns", "x"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["sketch_groups"] == 2
        rc = main(["profile", "--input", str(p1),
                   "--drift-against", sk])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "drifted"
        drifted = {d["grp"] for d in out["drift"]
                   if d["result"] == "failed"}
        assert drifted == {"b"}

    def test_outliers_flag(self, ray_session, tmp_path, capsys):
        import numpy as np

        t = pa.table({"g": ["a"] * 11,
                      "v": pa.array(list(range(10)) + [1000],
                                    pa.int64())})
        inp = tmp_path / "t.parquet"
        pq.write_table(t, str(inp))
        rc = main(["profile", "--input", str(inp),
                   "--outliers", "g:v"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0
        assert out["outliers"][0]["n_out"] == 1
        assert out["outliers"][0]["n"] == 11
        # custom k widens the fences
        rc = main(["profile", "--input", str(inp),
                   "--outliers", "g:v:500"])
        out = json.loads(capsys.readouterr().out.strip())
        assert out["outliers"][0]["n_out"] == 0

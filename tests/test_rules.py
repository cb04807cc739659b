"""Declarative constraint-rule engine (pipelines/rules.py).

Unit semantics on adversarial in-memory tables (nulls everywhere,
duplicate keys, dangling FKs, null partition keys) plus a DuckDB
parity check where the SQL oracle is generated from the SAME Rule
objects that drive the Ray pass."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.pipelines import rules as R


def _adversarial_df() -> pd.DataFrame:
    return pd.DataFrame({
        "id": [1, 2, 2, 3, 4, 5, 6, 7],
        "grp": ["a", "a", None, "b", "b", "b", "a", "b"],
        "val": [10.0, None, 5.0, -1.0, 99.0, 100.0, 101.0, 50.0],
        "tag": ["x1", "x2", "zz", None, "x9", "yy", "x0", "x5"],
        "fk": [100, 100, None, 200, 999, 100, 200, 998],
    })


RULESET = [
    R.Rule("not_null", "grp"),
    R.Rule("range", "val", {"lo": 0.0, "hi": 100.0}),
    R.Rule("regex", "tag", {"pattern": "^x[0-9]$"}),
    R.Rule("in_set", "tag", {"values": ["x0", "x1", "x2", "x5", "x9"]}),
    R.Rule("unique", "id"),
]


def test_rule_ids_and_unknown_kind():
    assert RULESET[1].rule_id == "range(val)"
    assert R.Rule("unique", ("a", "b")).rule_id == "unique(a,b)"
    with pytest.raises(ValueError):
        R.Rule("nope", "x")


def test_row_local_masks_null_semantics():
    t = pa.table(_adversarial_df())
    # not_null flags exactly the null grp row
    m = RULESET[0].violation_mask(t.column("grp"))
    assert m.to_pylist() == [False, False, True, False, False, False,
                             False, False]
    # range: null val is NOT a range violation; -1 and 101 are
    m = RULESET[1].violation_mask(t.column("val"))
    assert m.to_pylist() == [False, False, False, True, False, False,
                             True, False]
    # regex: null tag skipped, zz/yy flagged
    m = RULESET[2].violation_mask(t.column("tag"))
    assert m.to_pylist() == [False, False, True, False, False, True,
                             False, False]


def test_evaluate_rules_table_level(ray_session):
    ds = rd.from_pandas(_adversarial_df())
    rep = R.evaluate_rules(ds, RULESET, partition_col=None)
    assert list(rep.columns) == R.REPORT_COLUMNS
    by_id = rep.set_index("rule_id")
    assert (rep["scope"] == "").all()
    assert (rep["n_rows"] == 8).all()
    assert by_id.loc["not_null(grp)", "n_violations"] == 1
    assert by_id.loc["range(val)", "n_violations"] == 2
    assert by_id.loc["regex(tag)", "n_violations"] == 2
    assert by_id.loc["in_set(tag)", "n_violations"] == 2  # zz, yy
    # id=2 twice -> 2 rows in violating groups
    assert by_id.loc["unique(id)", "n_violations"] == 2
    assert by_id.loc["unique(id)", "passed"] == 0
    assert (rep["passed"] == (rep["n_violations"] == 0)
            .astype(np.int64)).all()


def test_evaluate_rules_partitioned_and_null_scope(ray_session):
    ds = rd.from_pandas(_adversarial_df())
    rep = R.evaluate_rules(ds, RULESET, partition_col="grp")
    # 3 scopes (a, b, <null>) x 4 row-local + 1 table-level unique
    assert len(rep) == 13
    assert set(rep["scope"]) == {"a", "b", R.NULL_SCOPE, ""}
    null_rows = rep[rep["scope"] == R.NULL_SCOPE].set_index("rule_id")
    assert null_rows.loc["not_null(grp)", "n_violations"] == 1
    b = rep[rep["scope"] == "b"].set_index("rule_id")
    assert b.loc["range(val)", "n_violations"] == 1  # -1.0
    assert b.loc["range(val)", "n_rows"] == 4
    # cross-row rule stays table-level even when partitioned
    uniq = rep[rep["rule_id"] == "unique(id)"]
    assert list(uniq["scope"]) == [""] and int(uniq["n_rows"].iloc[0]) == 8


def test_foreign_key_rule(ray_session):
    ds = rd.from_pandas(_adversarial_df())
    parent = rd.from_pandas(pd.DataFrame({"pid": [100, 200]}))
    rep = R.evaluate_rules(
        ds, [R.Rule("foreign_key", "fk",
                    {"parent": parent, "parent_key": "pid"})])
    assert int(rep["n_violations"].iloc[0]) == 2  # 999, 998; null skipped
    assert int(rep["passed"].iloc[0]) == 0


def test_violation_rows_stream_and_reject_cross_row(ray_session):
    ds = rd.from_pandas(_adversarial_df())
    out = R.rule_violation_rows(ds, RULESET[1], ["id", "val"]).to_pandas()
    assert sorted(out["id"]) == [3, 6]
    # aggregate rules have no row evidence — the verdict IS the evidence
    with pytest.raises(ValueError):
        R.rule_violation_rows(ds, R.Rule("row_count", None, {"lo": 1}),
                              ["id"])


def test_violation_rows_cross_row_evidence(ray_session):
    """Every cross-row kind routes to its natural evidence stream —
    the CLI's --violations-out covers the full rule taxonomy."""
    ds = rd.from_pandas(_adversarial_df())
    # unique -> duplicated keys with multiplicity
    dup = R.rule_violation_rows(ds, RULESET[4], ["id"]).to_pandas()
    assert dup["id"].tolist() == [2] and int(dup["n"].iloc[0]) == 2
    # foreign_key -> dangling child key values
    parent = rd.from_pandas(pd.DataFrame({"pid": [100, 200]}))
    fk = R.rule_violation_rows(
        ds, R.Rule("foreign_key", "fk",
                   {"parent": parent, "parent_key": "pid"}),
        ["fk"]).to_pandas()
    assert sorted(fk["fk"]) == [998, 999]
    # functional_dependency -> violating determinant groups
    df = pd.DataFrame({"det": ["a", "a", "b", "b", None],
                       "dep": [1, 2, 3, 3, 9]})
    fd = R.rule_violation_rows(
        rd.from_pandas(df),
        R.Rule("functional_dependency", "det", {"determines": "dep"}),
        ["det"]).to_pandas()
    assert fd["det"].tolist() == ["a"] and int(fd["n_dep"].iloc[0]) == 2
    # monotonic -> per-key regression evidence
    mdf = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                        "t": [1, 2, 3, 1, 2],
                        "v": [5, 3, 9, 1, 2]})
    mono = R.rule_violation_rows(
        rd.from_pandas(mdf),
        R.Rule("monotonic", "v", {"key": "k", "order_by": ["t"]}),
        ["k"]).to_pandas()
    assert mono["k"].tolist() == ["a"]
    assert int(mono["n_events"].iloc[0]) == 3
    assert int(mono["n_regressions"].iloc[0]) == 1


def test_sql_oracle_parity_from_same_rules(ray_session):
    """The generated SQL, run over the identical rows, must reproduce
    the Ray report bit-for-bit — including the FK rule via
    fk_tables."""
    df = _adversarial_df()
    parent = pd.DataFrame({"pid": [100, 200]})
    con = duckdb.connect()
    con.register("t", df)
    con.register("par", parent)
    fk = R.Rule("foreign_key", "fk", {"parent": rd.from_pandas(parent),
                                      "parent_key": "pid"})
    ruleset = RULESET + [fk]
    for part in (None, "grp"):
        rep = R.evaluate_rules(rd.from_pandas(df), ruleset,
                               partition_col=part)
        sql = R.rules_report_sql("t", ruleset, partition_col=part,
                                 fk_tables={"foreign_key(fk)":
                                            ("par", "pid")})
        oracle = con.execute(sql).df().astype(
            {c: np.int64 for c in ("n_rows", "n_violations", "passed")})
        oracle = oracle.sort_values(["scope", "rule_id"]).reset_index(
            drop=True)
        pd.testing.assert_frame_equal(rep, oracle)


def test_empty_input(ray_session):
    empty = rd.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "grp": pa.array([], pa.large_string()),
        "val": pa.array([], pa.float64()),
        "tag": pa.array([], pa.large_string())}))
    rep = R.evaluate_rules(empty, RULESET, partition_col="grp")
    # no partitions seen -> no row-local rows; unique still reports
    uniq = rep[rep["rule_id"] == "unique(id)"]
    assert len(uniq) == 1
    assert int(uniq["n_rows"].iloc[0]) == 0
    assert int(uniq["passed"].iloc[0]) == 1


def test_rules_documents_scaled_matches_single_copy(ray_session, sf_dir):
    import ray.data as rd

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars", "source"])
    one = R.evaluate_rules(ds, q._bench_doc_rules(),
                           partition_col="lang")
    three = q.rules_documents_scaled(sf_dir, repeat=3)
    assert list(three["rule_id"]) == list(one["rule_id"])
    assert (three["n_rows"].to_numpy()
            == 3 * one["n_rows"].to_numpy()).all()
    assert (three["n_violations"].to_numpy()
            == 3 * one["n_violations"].to_numpy()).all()
    assert (three["passed"].to_numpy() == one["passed"].to_numpy()).all()


def test_rules_documents_scaled_heavy_mix(ray_session, sf_dir):
    """The compute-bound scaling mix (4 full-text RE2 rules, round-4
    verdict #6): same engine path, verdicts match a direct single-copy
    evaluation, and every rule is a content regex over text."""
    import ray.data as rd

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    heavy = q._bench_doc_rules_heavy()
    assert len(heavy) == 4
    assert all(r.kind == "regex" and r.column == "text" for r in heavy)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars", "source"])
    one = R.evaluate_rules(ds, heavy, partition_col="lang")
    two = q.rules_documents_scaled(sf_dir, repeat=2, mix="heavy")
    assert list(two["rule_id"]) == list(one["rule_id"])
    assert (two["n_rows"].to_numpy()
            == 2 * one["n_rows"].to_numpy()).all()
    assert (two["n_violations"].to_numpy()
            == 2 * one["n_violations"].to_numpy()).all()


def test_vacuous_rule_params_rejected():
    with pytest.raises(ValueError):
        R.Rule("range", "x")  # no bounds
    with pytest.raises(ValueError):
        R.Rule("in_set", "x", {"values": []})
    with pytest.raises(ValueError):
        R.Rule("regex", "x", {"pattern": ""})
    # one-sided ranges stay legal
    assert R.Rule("range", "x", {"lo": 0}).violation_sql()
    assert R.Rule("range", "x", {"hi": 5}).violation_sql()


class TestStratifiedSample:
    def test_nested_strata_and_rates(self, ray_session):
        from opengauss_tools_datachecker_performance_ray.stages import (
            sampling)

        t = pa.table({
            "k": pa.array(list(range(2000)), pa.int64()),
            "g": (["a"] * 1000) + (["b"] * 600) + ([None] * 400),
        })
        lo = sampling.stratified_sample(
            rd.from_arrow(t), "k", "g", {"a": 0.1, "b": 1.0}, 0.0) \
            .to_pandas()
        hi = sampling.stratified_sample(
            rd.from_arrow(t), "k", "g", {"a": 0.5, "b": 1.0}, 0.2) \
            .to_pandas()
        # rate 1.0 keeps every b; rate 0.0 keeps no default(null) row
        assert (lo["g"] == "b").sum() == 600
        assert lo["g"].isna().sum() == 0
        assert hi["g"].isna().sum() > 0
        # nested: every row kept at the lower rates survives the higher
        assert set(lo["k"]) <= set(hi["k"])
        # per-group keep fraction lands near the declared rate
        a_frac = (lo["g"] == "a").sum() / 1000
        assert 0.05 < a_frac < 0.15

    def test_matches_stable_sample_when_uniform(self, ray_session):
        from opengauss_tools_datachecker_performance_ray.stages import (
            sampling)

        t = pa.table({"k": pa.array(list(range(500)), pa.int64()),
                      "g": ["x", "y"] * 250})
        uni = sampling.stratified_sample(
            rd.from_arrow(t), "k", "g", {}, 0.3).to_pandas()
        ref = sampling.stable_sample(
            rd.from_arrow(t), "k", 0.3).to_pandas()
        assert sorted(uni["k"]) == sorted(ref["k"])


def test_length_decile_profile_properties(ray_session, sf_dir):
    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    out = q.length_decile_profile_documents(sf_dir)
    # bins span 0..9, counts sum to the corpus size
    assert out["bin"].between(0, 9).all()
    assert int(out["n"].sum()) == 500
    # decile binning: each global bin holds ~10% of docs
    per_bin = out.groupby("bin")["n"].sum()
    assert (per_bin >= 20).all() and (per_bin <= 80).all()


def test_duplicate_rule_ids_suffixed(ray_session):
    two = [R.Rule("regex", "tag", {"pattern": "^x"}),
           R.Rule("regex", "tag", {"pattern": "[0-9]$"})]
    assert R.rule_ids(two) == ["regex(tag)", "regex(tag)#2"]
    ds = rd.from_pandas(_adversarial_df())
    rep = R.evaluate_rules(ds, two)
    assert sorted(rep["rule_id"]) == ["regex(tag)", "regex(tag)#2"]
    # SQL generated over the same list carries the same suffixes
    import duckdb as dk

    con = dk.connect()
    con.register("t", _adversarial_df())
    oracle = con.execute(R.rules_report_sql("t", two)).df()
    assert sorted(oracle["rule_id"]) == ["regex(tag)", "regex(tag)#2"]


def test_stratified_sample_type_mismatch_raises(ray_session):
    from opengauss_tools_datachecker_performance_ray.stages import sampling

    t = pa.table({"k": pa.array([1, 2], pa.int64()),
                  "year": pa.array([2020, 2021], pa.int32())})
    with pytest.raises(ValueError, match="can never select a row"):
        sampling.stratified_sample(rd.from_arrow(t), "k", "year",
                                   {"2020": 0.5})
    # the reverse direction: integer keys on a string column must raise
    # too (was a silent default_rate no-op before the guard generalized)
    ts = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "lang": pa.array(["en", "fr"])})
    with pytest.raises(ValueError, match="can never select a row"):
        sampling.stratified_sample(rd.from_arrow(ts), "k", "lang",
                                   {2020: 0.5})
    # bool keys on an int column are a mismatch (bool is not "int" here)
    with pytest.raises(ValueError, match="can never select a row"):
        sampling.stratified_sample(rd.from_arrow(t), "k", "year",
                                   {True: 0.5})
    # properly-typed keys work
    out = sampling.stratified_sample(rd.from_arrow(t), "k", "year",
                                     {2020: 1.0}, 0.0).to_pandas()
    assert out["year"].tolist() == [2020]


def test_stratified_sql_escaping_and_empty():
    from opengauss_tools_datachecker_performance_ray.stages.sampling import (
        sample_threshold, stratified_threshold_case_sql)

    sql = stratified_threshold_case_sql("src", {"o'reilly": 0.5}, 0.1)
    assert "'o''reilly'" in sql
    assert stratified_threshold_case_sql("src", {}, 0.25) == \
        str(sample_threshold(0.25))


def test_length_decile_null_semantics(ray_session, tmp_path):
    """Null n_chars excluded, null lang -> '<null>' scope, both in
    exact agreement with the SQL oracle."""
    import duckdb as dk
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    d = tmp_path / "dec"
    d.mkdir()
    t = pa.table({
        "doc_id": pa.array(range(1, 41), pa.int64()),
        "lang": pa.array((["en"] * 20) + ([None] * 10) + (["fr"] * 10)),
        "n_chars": pa.array(list(range(100, 130)) + [None] * 10,
                            pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    mine = q.length_decile_profile_documents(str(d))
    assert int(mine["n"].sum()) == 30   # nulls excluded
    assert "<null>" in set(mine["lang"])
    con = dk.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracle = con.execute(q.LENGTH_DECILE_PROFILE_DOCUMENTS_SQL).df() \
        .astype({"bin": np.int64, "n": np.int64})
    pd.testing.assert_frame_equal(
        mine.reset_index(drop=True), oracle.reset_index(drop=True))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_cell = st.one_of(st.none(), st.integers(-50, 50))
_tag = st.one_of(st.none(), st.sampled_from(["aa", "ab", "b1", "zz'q"]))


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_cell, min_size=1, max_size=40),
       tags=st.data(),
       lo=st.integers(-40, 0), hi=st.integers(1, 40),
       grp_null=st.booleans())
def test_rule_engine_fuzz_parity(ray_session_holder, vals, tags, lo,
                                 hi, grp_null):
    """Random tables (nulls everywhere, quote-bearing strings) through
    a fixed adversarial rule set must agree with the generated SQL
    bit-for-bit, partitioned and unpartitioned."""
    n = len(vals)
    tag_list = tags.draw(st.lists(_tag, min_size=n, max_size=n))
    grp = ["g1" if i % 3 else ("g2" if not grp_null else None)
           for i in range(n)]
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "grp": grp,
        "val": pd.array(vals, dtype="Int64"),
        "tag": tag_list,
    })
    ruleset = [
        R.Rule("not_null", "val"),
        R.Rule("range", "val", {"lo": lo, "hi": hi}),
        R.Rule("in_set", "tag", {"values": ["aa", "zz'q"]}),
        R.Rule("regex", "tag", {"pattern": "^a"}),
        R.Rule("regex", "tag", {"pattern": "[0-9]$"}),  # dup-id case
        R.Rule("unique", "tag"),
    ]
    con = duckdb.connect()
    con.register("t", df)
    for part in (None, "grp"):
        rep = R.evaluate_rules(rd.from_pandas(df), ruleset,
                               partition_col=part)
        oracle = con.execute(
            R.rules_report_sql("t", ruleset, partition_col=part)).df() \
            .astype({c: np.int64
                     for c in ("n_rows", "n_violations", "passed")}) \
            .sort_values(["scope", "rule_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(rep, oracle)


def test_rules_on_north_pages_shape(ray_session, tmp_path):
    """The rule engine over the north-rule input table shape
    (url:string, warc_ts:timestamp, html:binary, text:string,
    lang:string — BASELINE.json input_hint): url regex + html/text
    nullability + lang domain + url uniqueness, per-lang verdicts.
    The sink side of the pages fixture carries injected duplicate
    urls, which the unique rule must surface."""
    import ray.data as rd

    from opengauss_tools_datachecker_performance_ray.sources import (
        fixtures)

    d = str(tmp_path / "pages")
    fixtures.generate(d, fixtures.PagesSpec(
        n_rows=2000, n_files=4, html_mean=4.0, html_max=4096))
    snk = rd.read_parquet(f"{d}/pages_sink")
    rules = [
        R.Rule("regex", "url", {"pattern": "^https?://"}),
        R.Rule("not_null", "html"),
        R.Rule("not_null", "text"),
        R.Rule("in_set", "lang",
               {"values": ["en", "de", "fr", "es", "zh"]}),
        R.Rule("unique", "url"),
    ]
    rep = R.evaluate_rules(snk, rules, partition_col="lang")
    # per-lang scopes for the row-local rules + one table-level row
    assert set(rep.loc[rep["rule_id"] == "unique(url)", "scope"]) == {""}
    uniq = rep[rep["rule_id"] == "unique(url)"].iloc[0]
    assert uniq["n_violations"] >= 2  # k_dup=10 injected url dups
    assert uniq["passed"] == 0
    urls_ok = rep[rep["rule_id"] == "regex(url)"]
    assert (urls_ok["passed"] == 1).all()
    assert int(rep[rep["rule_id"] == "not_null(html)"]["n_rows"].sum()) \
        == snk.count()


def test_validate_pair_with_rules(ray_session, tmp_path):
    """Constraint rules ride the flagship validation run: an
    identical pair that would compare clean still FAILS when a
    declared rule is violated, and the summary carries the rule
    tallies."""
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
        ValidationConfig, validate_table_pair)

    t = pa.table({
        "url": [f"https://ex.com/{i}" for i in range(20)],
        "text": ["ok"] * 19 + [None],
        "lang": ["en"] * 20,
    })
    src, snk = tmp_path / "s", tmp_path / "k"
    src.mkdir(); snk.mkdir()
    pq.write_table(t, str(src / "p.parquet"))
    pq.write_table(t, str(snk / "p.parquet"))

    bad = [R.Rule("not_null", "text")]
    res = validate_table_pair(
        str(src), str(snk),
        ValidationConfig(key_columns=("url",), check_drift=False,
                         rules=bad, rules_partition_col="lang"))
    assert res.summary["result"] == "failed"
    assert res.summary["ruleViolations"] == 1
    assert res.summary["rulesFailed"] == 1
    assert res.compare.ok  # the pair itself compares clean

    ok_rules = [R.Rule("regex", "url", {"pattern": "^https://"})]
    res2 = validate_table_pair(
        str(src), str(snk),
        ValidationConfig(key_columns=("url",), check_drift=False,
                         rules=ok_rules))
    assert res2.summary["result"] == "success"
    assert res2.summary["rulesFailed"] == 0


def test_freshness_null_ts_and_cutoff(ray_session, tmp_path):
    import duckdb as dk
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    d = tmp_path / "fresh"
    d.mkdir()
    t = pa.table({
        "event_type": ["a", "a", "a", "b"],
        "ts": pa.array([pd.Timestamp("2024-01-10"),
                        pd.Timestamp("2024-01-25"), None,
                        pd.Timestamp("2023-12-31")],
                       pa.timestamp("us")),
    })
    pq.write_table(t, str(d / "events.parquet"))
    mine = q.freshness_events(str(d))
    a = mine[mine["event_type"] == "a"].iloc[0]
    assert a["n_rows"] == 3 and a["n_null_ts"] == 1 and a["n_stale"] == 1
    b = mine[mine["event_type"] == "b"].iloc[0]
    assert b["n_stale"] == 1
    con = dk.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    oracle = con.execute(q.FRESHNESS_EVENTS_SQL).df()
    for c in ("n_rows", "n_null_ts", "n_stale"):
        oracle[c] = oracle[c].astype(np.int64)
    pd.testing.assert_frame_equal(mine.reset_index(drop=True),
                                  oracle.reset_index(drop=True))


class TestCompareColsRule:
    def test_mask_and_sql_parity(self, ray_session):
        df = pd.DataFrame({
            "n": pd.array([2, 5, None, 3], dtype="Int64"),
            "s": ["ab", "abc", "x", None],
            "g": ["a", "a", "b", "b"],
        })
        rule = R.Rule("compare_cols", "n",
                      {"right": "s", "op": "==", "right_fn": "length"})
        assert rule.rule_id == "compare(n==length(s))"
        rep = R.evaluate_rules(rd.from_pandas(df), [rule],
                               partition_col="g")
        by = rep.set_index("scope")
        # row1: 5 != len('abc')=3 -> violation; null sides skipped
        assert int(by.loc["a", "n_violations"]) == 1
        assert int(by.loc["b", "n_violations"]) == 0
        con = duckdb.connect()
        con.register("t", df)
        oracle = con.execute(
            R.rules_report_sql("t", [rule], partition_col="g")).df() \
            .astype({c: np.int64
                     for c in ("n_rows", "n_violations", "passed")}) \
            .sort_values(["scope", "rule_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(rep, oracle)

    def test_lower_fn_and_ops(self, ray_session):
        df = pd.DataFrame({"a": ["AB", "cd", "Ef"],
                           "b": ["ab", "cd", "zz"]})
        rule = R.Rule("compare_cols", "a",
                      {"right": "b", "op": "==", "left_fn": "lower"})
        rows = R.rule_violation_rows(
            rd.from_pandas(df), rule, ["a", "b"]).to_pandas()
        assert rows["a"].tolist() == ["Ef"]
        # ordering ops on strings: don't hand-count collation — assert
        # exact agreement with the oracle instead
        lt = R.Rule("compare_cols", "a", {"right": "b", "op": "<="})
        rep = R.evaluate_rules(rd.from_pandas(df), [lt])
        con = duckdb.connect()
        con.register("t", df)
        oracle = con.execute(R.rules_report_sql("t", [lt])).df()
        assert int(rep["n_violations"].iloc[0]) == \
            int(oracle["n_violations"].iloc[0])

    def test_bad_params_rejected(self):
        with pytest.raises(ValueError):
            R.Rule("compare_cols", "a", {})
        with pytest.raises(ValueError):
            R.Rule("compare_cols", "a", {"right": "b", "op": "~"})
        with pytest.raises(ValueError):
            R.Rule("compare_cols", "a", {"right": "b",
                                         "left_fn": "upper"})


def test_freshness_null_event_type_group(ray_session, tmp_path):
    """NULL event_type forms its own group on both engines (review
    finding: pandas dropna default silently dropped those rows)."""
    import duckdb as dk
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    d = tmp_path / "fnull"
    d.mkdir()
    t = pa.table({
        "event_type": ["a", None, None],
        "ts": pa.array([pd.Timestamp("2024-01-25")] * 3,
                       pa.timestamp("us")),
    })
    pq.write_table(t, str(d / "events.parquet"))
    mine = q.freshness_events(str(d))
    assert int(mine["n_rows"].sum()) == 3
    assert mine["event_type"].isna().sum() == 1
    con = dk.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    oracle = con.execute(q.FRESHNESS_EVENTS_SQL).df()
    assert len(oracle) == len(mine) == 2


def test_completeness_disjoint_classes(ray_session, tmp_path):
    """null / empty / whitespace-only are disjoint on both engines."""
    import duckdb as dk
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q)

    d = tmp_path / "comp"
    d.mkdir()
    t = pa.table({
        "text": ["real", None, "", "  \t", "\n\r", " x "],
        "lang": ["en"] * 6,
        "source": ["s"] * 6,
    })
    pq.write_table(t, str(d / "documents.parquet"))
    mine = q.completeness_documents(str(d))
    row = mine[mine["col"] == "text"].iloc[0]
    assert (row["n_null"], row["n_empty"], row["n_ws_only"]) == (1, 1, 2)
    con = dk.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracle = con.execute(q.COMPLETENESS_DOCUMENTS_SQL).df().astype(
        {k: np.int64 for k in ("n_rows", "n_null", "n_empty",
                               "n_ws_only")})
    pd.testing.assert_frame_equal(mine, oracle.reset_index(drop=True))


# ---------------------------------------------------------------------------
# aggregate-class rules (round 5)
# ---------------------------------------------------------------------------


def test_aggregate_rule_construction():
    with pytest.raises(ValueError, match="lo and/or hi"):
        R.Rule("mean", "x")
    with pytest.raises(ValueError, match="column=None"):
        R.Rule("row_count", "x", {"lo": 1})
    with pytest.raises(ValueError, match="one column"):
        R.Rule("mean", ("a", "b"), {"lo": 1})
    assert R.Rule("row_count", None, {"lo": 1}).rule_id == "row_count()"
    assert R.Rule("mean", "x", {"lo": 1}).rule_id == "mean(x)"
    assert R.Rule("row_count", None, {"lo": 1}).input_columns == set()


def test_aggregate_rules_semantics(ray_session):
    """Verdicts per scope; empty aggregates (all-null scope) pass
    vacuously; row_count rides n_rows; one fused scan serves row-local
    and aggregate rules together."""
    df = pd.DataFrame({
        "g": ["a", "a", "b", "b", "b", None],
        "x": pd.array([1, None, 3, 4, 100, 7], dtype="Int64"),
        "y": [1.5, 2.5, None, None, None, 3.0],
    })
    rules = [
        R.Rule("row_count", None, {"lo": 2}),
        R.Rule("null_rate", "x", {"hi": 0.3}),
        R.Rule("mean", "x", {"lo": 0, "hi": 10}),
        R.Rule("sum", "x", {"hi": 50}),
        R.Rule("min", "y", {"lo": 2.0}),
        R.Rule("max", "x", {"hi": 99}),
        R.Rule("not_null", "x"),
    ]
    rep = R.evaluate_rules(rd.from_pandas(df), rules, partition_col="g")
    assert len(rep) == 3 * 7
    k = rep.set_index(["scope", "rule_id"])["passed"]
    assert k[("a", "row_count()")] == 1 and k[(R.NULL_SCOPE,
                                               "row_count()")] == 0
    assert k[("a", "null_rate(x)")] == 0  # 1/2 > 0.3
    assert k[("b", "mean(x)")] == 0       # 107/3 > 10
    assert k[("b", "sum(x)")] == 0        # 107 > 50
    assert k[("b", "min(y)")] == 1        # all-null scope: vacuous pass
    assert k[("a", "min(y)")] == 0        # 1.5 < 2.0
    assert k[("b", "max(x)")] == 0        # 100 > 99
    # SQL generated from the SAME rules agrees bit-for-bit
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.execute(
        R.rules_report_sql("t", rules, partition_col="g")).df().astype(
        {c: np.int64 for c in ("n_rows", "n_violations", "passed")}) \
        .sort_values(["scope", "rule_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(rep, oracle)


def test_aggregate_rules_empty_and_spec(ray_session):
    empty = rd.from_arrow(pa.table({
        "g": pa.array([], pa.large_string()),
        "x": pa.array([], pa.int64())}))
    rep = R.evaluate_rules(
        empty, [R.Rule("mean", "x", {"lo": 0})], partition_col="g")
    assert len(rep) == 0  # no scopes seen, like row-local rules
    # spec round-trip (the CLI contract) covers the aggregate kinds
    rules = R.rules_from_spec([
        {"kind": "row_count", "lo": 5},
        {"kind": "null_rate", "column": "x", "hi": 0.5},
        {"kind": "mean", "column": "x", "lo": 1, "hi": 2},
    ])
    assert [r.rule_id for r in rules] == \
        ["row_count()", "null_rate(x)", "mean(x)"]
    assert R.columns_needed(rules, "g") == ["g", "x"]


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_cell, min_size=1, max_size=40),
       lo=st.integers(-40, 0), hi=st.integers(1, 40),
       rate=st.floats(0.0, 1.0, allow_nan=False),
       grp_null=st.booleans())
def test_aggregate_rules_fuzz_parity(ray_session_holder, vals, lo, hi,
                                     rate, grp_null):
    """Random integer tables (nulls everywhere, whole-scope-null
    cases) through every aggregate kind must agree with the generated
    GROUP BY oracle bit-for-bit — integer sums fold exactly on both
    sides, and null_rate/mean reduce to one double division over the
    same operands."""
    n = len(vals)
    grp = ["g1" if i % 3 else ("g2" if not grp_null else None)
           for i in range(n)]
    df = pd.DataFrame({
        "grp": grp,
        "val": pd.array(vals, dtype="Int64"),
    })
    ruleset = [
        R.Rule("row_count", None, {"lo": 3}),
        R.Rule("null_rate", "val", {"hi": rate}),
        R.Rule("mean", "val", {"lo": lo, "hi": hi}),
        R.Rule("sum", "val", {"lo": lo * 4}),
        R.Rule("min", "val", {"lo": lo}),
        R.Rule("max", "val", {"hi": hi}),
        R.Rule("not_null", "val"),  # fused row-local alongside
    ]
    con = duckdb.connect()
    con.register("t", df)
    for part in (None, "grp"):
        rep = R.evaluate_rules(rd.from_pandas(df), ruleset,
                               partition_col=part)
        oracle = con.execute(
            R.rules_report_sql("t", ruleset, partition_col=part)).df() \
            .astype({c: np.int64
                     for c in ("n_rows", "n_violations", "passed")}) \
            .sort_values(["scope", "rule_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(rep, oracle)


def test_rules_from_spec_missing_column_raises():
    # a typo'd CLI spec must fail at parse time, not mid-pipeline
    with pytest.raises(ValueError, match="'column' is required"):
        R.rules_from_spec([{"kind": "not_null"}])
    with pytest.raises(ValueError, match="'column' is required"):
        R.rules_from_spec([{"kind": "mean", "lo": 1}])
    # row_count legitimately has no column
    assert R.rules_from_spec([{"kind": "row_count", "lo": 1}])[0] \
        .rule_id == "row_count()"


def test_aggregate_sum_exact_with_all_null_block(ray_session):
    """An all-null (scope, block) partial must not poison the int64
    sum fold through float64/NaN: totals beyond 2^53 stay exact."""
    big = (1 << 53) + 1  # not representable in float64
    t1 = pa.table({"g": ["a", "b"],
                   "x": pa.array([big, None], pa.int64())})
    t2 = pa.table({"g": ["a", "b"],
                   "x": pa.array([2, 5], pa.int64())})
    ds = rd.from_arrow([t1, t2])  # two blocks; scope b all-null in t1
    rules = [R.Rule("sum", "x", {"hi": big + 2}),
             R.Rule("mean", "x", {"lo": 0})]
    rep = R.evaluate_rules(ds, rules, partition_col="g")
    k = rep.set_index(["scope", "rule_id"])["passed"]
    # float64 fold would see big+2 == big+1 ties; exact fold passes
    assert k[("a", "sum(x)")] == 1  # big + 2 <= hi exactly
    assert k[("b", "sum(x)")] == 1  # 5 <= hi
    # per-block partials keep the sum column int64 (no NaN widening)
    part = R.row_local_partials(t1, [], "g", aggs=rules)
    assert part.column("a0_sum").type == pa.int64()
    assert part.column("a0_sum").null_count == 0


def test_stratified_sample_numpy_scalar_keys(ray_session):
    """Keys taken from pc.unique()/df.unique() arrive as numpy
    scalars; they hash equal to Python ints and must pass the guard."""
    from opengauss_tools_datachecker_performance_ray.stages import sampling

    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "year": pa.array([2020, 2021, 2020], pa.int32())})
    out = sampling.stratified_sample(
        rd.from_arrow(t), "k", "year",
        {np.int64(2020): 1.0}, 0.0).to_pandas()
    assert sorted(out["year"].tolist()) == [2020, 2020]
    ts = pa.table({"k": pa.array([1, 2], pa.int64()),
                   "lang": pa.array(["en", "fr"])})
    out = sampling.stratified_sample(
        rd.from_arrow(ts), "k", "lang",
        {np.str_("en"): 1.0}, 0.0).to_pandas()
    assert out["lang"].tolist() == ["en"]
    # numpy bool on an int column is still a mismatch
    with pytest.raises(ValueError, match="can never select a row"):
        sampling.stratified_sample(rd.from_arrow(t), "k", "year",
                                   {np.bool_(True): 0.5})


def test_stddev_and_distinct_count_semantics(ray_session):
    """stddev: identical double expression both sides, vacuous on
    all-null scopes; distinct_count: exact per-scope cardinality, 0
    (not vacuous) on all-null scopes, nulls skipped."""
    df = pd.DataFrame({
        "g": ["a", "a", "b", "b", "b", None, "a", "c"],
        "x": pd.array([1, None, 3, 4, 100, 7, 9, None], dtype="Int64"),
        "s": ["u", "v", "u", None, "w", "w", "u", None],
    })
    rules = [
        R.Rule("stddev", "x", {"hi": 40.0}),
        R.Rule("distinct_count", "s", {"lo": 2}),
        R.Rule("mean", "x", {"lo": 0}),      # fused alongside
        R.Rule("not_null", "s"),             # row-local alongside
    ]
    con = duckdb.connect()
    con.register("t", df)
    for part in (None, "g"):
        rep = R.evaluate_rules(rd.from_pandas(df), rules,
                               partition_col=part)
        ora = con.execute(
            R.rules_report_sql("t", rules, partition_col=part)).df() \
            .astype({c: np.int64
                     for c in ("n_rows", "n_violations", "passed")}) \
            .sort_values(["scope", "rule_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(rep, ora)
    k = R.evaluate_rules(rd.from_pandas(df), rules, partition_col="g") \
        .set_index(["scope", "rule_id"])["passed"]
    assert k[("b", "stddev(x)")] == 0    # sd(3,4,100) ~ 45.6 > 40
    assert k[("c", "stddev(x)")] == 1    # all-null: vacuous pass
    assert k[("c", "distinct_count(s)")] == 0  # 0 distinct < lo=2
    assert k[("a", "distinct_count(s)")] == 1  # {u, v}


def test_scoped_distinct_counts_primitive(ray_session):
    from opengauss_tools_datachecker_performance_ray.pipelines import (
        checks,
    )

    t1 = pa.table({"g": ["a", "a", "b", None],
                   "s": ["x", "x", "y", "z"],
                   "k": pa.array([1, 2, 2, None], pa.int64())})
    t2 = pa.table({"g": ["a", "b", "b", None],
                   "s": ["x", "y", None, "z"],
                   "k": pa.array([1, 7, 7, 9], pa.int64())})
    ds = rd.from_arrow([t1, t2])
    # several columns in ONE pass
    got = checks.scoped_distinct_counts(ds, ["s", "k"], "g",
                                        num_buckets=4)
    assert got["s"] == {"a": 1, "b": 1, "<null>": 1}
    assert got["k"] == {"a": 2, "b": 2, "<null>": 1}
    # single-column str shorthand; no partition -> table scope ''
    got = checks.scoped_distinct_counts(ds, "s", None, num_buckets=4)
    assert got == {"s": {"": 3}}
    # all-null value column (NULL-type block) contributes nothing
    tn = pa.table({"g": ["a"], "s": pa.array([None], pa.null())})
    got = checks.scoped_distinct_counts(rd.from_arrow([tn]), "s", "g")
    assert got == {"s": {}}


def test_stddev_fold_overflow_guard(ray_session):
    """Per-row squares that pass multiply_checked but whose SUM would
    wrap the int64 fold must raise loudly (DuckDB promotes to HUGEINT
    there — silence would be a verdict divergence)."""
    v = 3_000_000_000  # v*v ~ 9e18 < 2^63; two of them overflow
    df = pd.DataFrame({"g": ["a", "a"],
                       "x": pd.array([v, v], dtype="Int64")})
    with pytest.raises(ValueError, match="sum of squares exceeds"):
        R.evaluate_rules(rd.from_pandas(df),
                         [R.Rule("stddev", "x", {"hi": 1e12})],
                         partition_col="g")


def test_nan_aggregate_matches_duckdb_ordering(ray_session, tmp_path):
    """A NaN aggregate (float column with a genuine NaN VALUE, e.g.
    from parquet — NOT a pandas NaN, which registration maps to NULL)
    violates any hi bound and never a lo bound, matching DuckDB's
    NaN-greatest ordering; the fold must propagate the NaN, not skip
    it like pandas' named 'sum'."""
    import pyarrow.parquet as pq

    t = pa.table({"g": ["a", "a"],
                  "x": pa.array([1.0, float("nan")], pa.float64())})
    p = str(tmp_path / "nan.parquet")
    pq.write_table(t, p)
    rules = [R.Rule("sum", "x", {"hi": 100.0}),
             R.Rule("mean", "x", {"lo": 0.0})]
    rep = R.evaluate_rules(rd.read_parquet(p), rules,
                           partition_col="g")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    ora = con.execute(
        R.rules_report_sql("t", rules, partition_col="g")).df() \
        .astype({c: np.int64
                 for c in ("n_rows", "n_violations", "passed")}) \
        .sort_values(["scope", "rule_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(rep, ora)
    k = rep.set_index("rule_id")["passed"]
    assert k["sum(x)"] == 0   # NaN > hi on both engines
    assert k["mean(x)"] == 1  # NaN < lo is false on both engines


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_cell, min_size=1, max_size=40),
       lo=st.integers(-40, 0), hi=st.integers(1, 40),
       grp_null=st.booleans())
def test_stddev_distinct_fuzz_parity(ray_session_holder, vals, lo, hi,
                                     grp_null):
    """Hypothesis: stddev + distinct_count verdicts match the
    generated GROUP BY oracle bit-for-bit over adversarial
    null/dup-heavy integer columns."""
    n = len(vals)
    grp = ["g1" if i % 3 else ("g2" if not grp_null else None)
           for i in range(n)]
    df = pd.DataFrame({"grp": grp, "val": pd.array(vals, dtype="Int64")})
    ruleset = [
        R.Rule("stddev", "val", {"lo": float(lo) / 7, "hi": float(hi)}),
        R.Rule("distinct_count", "val", {"lo": 1, "hi": hi}),
    ]
    con = duckdb.connect()
    con.register("t", df)
    for part in (None, "grp"):
        rep = R.evaluate_rules(rd.from_pandas(df), ruleset,
                               partition_col=part)
        oracle = con.execute(
            R.rules_report_sql("t", ruleset, partition_col=part)).df() \
            .astype({c: np.int64
                     for c in ("n_rows", "n_violations", "passed")}) \
            .sort_values(["scope", "rule_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(rep, oracle)


# exact-quantile rules (round 5, third wave)


def test_quantile_rule_construction():
    r = R.Rule("quantile", "x", {"q": 0.5, "lo": 1})
    assert r.rule_id == "quantile[0.5](x)"
    # two quantiles on one column keep distinct ids (no #2 suffix)
    ids = R.rule_ids([r, R.Rule("quantile", "x", {"q": 0.9, "hi": 5})])
    assert ids == ["quantile[0.5](x)", "quantile[0.9](x)"]
    for bad in ({"lo": 1},                 # q missing
                {"q": 0.0, "lo": 1},       # rank ceil(0*n) = 0 invalid
                {"q": 1.5, "lo": 1},       # q > 1
                {"q": 1, "lo": 1},         # int: str(q) isn't DECIMAL
                {"q": "0.5", "lo": 1}):    # str
        with pytest.raises(ValueError):
            R.Rule("quantile", "x", bad)
    with pytest.raises(ValueError):        # bounds-less
        R.Rule("quantile", "x", {"q": 0.5})


def test_quantile_rule_semantics(ray_session):
    """quantile_disc semantics (rank = ceil(q*n) over the DECIMAL q),
    vacuous on all-null scopes, fused beside row-local/foldable rules,
    and exact parity including a string column (finite_only=False)."""
    df = pd.DataFrame({
        "g": ["a", "a", "a", "a", "b", "b", None, "c"],
        "x": pd.array([1, 2, 3, 10, 5, None, 7, None], dtype="Int64"),
        "s": ["u", "v", "u", "w", "u", None, "w", None],
    })
    rules = [
        R.Rule("quantile", "x", {"q": 0.5, "lo": 2, "hi": 4}),
        R.Rule("quantile", "x", {"q": 1.0, "hi": 9}),
        R.Rule("quantile", "s", {"q": 0.5, "lo": "u", "hi": "u",
                                 "finite_only": False}),
        R.Rule("row_count", None, {"lo": 2}),  # fused partials
        R.Rule("not_null", "s"),               # row-local alongside
    ]
    con = duckdb.connect()
    con.register("t", df)
    for part in (None, "g"):
        rep = R.evaluate_rules(rd.from_pandas(df), rules,
                               partition_col=part)
        ora = con.execute(
            R.rules_report_sql("t", rules, partition_col=part)).df() \
            .astype({c: np.int64
                     for c in ("n_rows", "n_violations", "passed")}) \
            .sort_values(["scope", "rule_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(rep, ora)
    k = R.evaluate_rules(rd.from_pandas(df), rules, partition_col="g") \
        .set_index(["scope", "rule_id"])["passed"]
    # scope a: x = 1,2,3,10 -> p50 = rank ceil(0.5*4)=2 -> 2 in [2,4]
    assert k[("a", "quantile[0.5](x)")] == 1
    # scope a: max = 10 > 9
    assert k[("a", "quantile[1.0](x)")] == 0
    # scope c: all-null x -> vacuous pass on both quantile rules
    assert k[("c", "quantile[0.5](x)")] == 1
    assert k[("c", "quantile[1.0](x)")] == 1
    # scope b: s = {u} -> p50 = 'u' within ['u','u']
    assert k[("b", "quantile[0.5](s)")] == 1


def test_quantile_nonfinite_excluded(ray_session, tmp_path):
    """Non-finite floats are dropped on BOTH engines (engine: is_finite
    filter in the exact-quantile pass; oracle: the isfinite CASE
    guard), so a NaN/inf never becomes the quantile element."""
    import pyarrow.parquet as pq

    t = pa.table({"g": ["a", "a", "a", "a"],
                  "x": pa.array([1.0, float("nan"), float("inf"), 2.0],
                                pa.float64())})
    p = str(tmp_path / "q.parquet")
    pq.write_table(t, p)
    rules = [R.Rule("quantile", "x", {"q": 1.0, "hi": 5.0})]
    rep = R.evaluate_rules(rd.read_parquet(p), rules, partition_col="g")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    ora = con.execute(
        R.rules_report_sql("t", rules, partition_col="g")).df() \
        .astype({c: np.int64
                 for c in ("n_rows", "n_violations", "passed")}) \
        .sort_values(["scope", "rule_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(rep, ora)
    assert rep["passed"].tolist() == [1]  # max over finite {1.0, 2.0}


def test_quantile_fetch_budget_raises(ray_session, monkeypatch):
    """A capped exact-quantile fetch (None value for a PRESENT scope)
    must raise, not silently pass vacuously — a false PASS verdict is
    worse than an error."""
    from opengauss_tools_datachecker_performance_ray.pipelines import (
        checks,
    )

    def fake(ds, group_col, value_col, qs, max_fetches=64):
        return pd.DataFrame({group_col: ["a", "b"], "q": [0.5, 0.5],
                             "value": [1, None]})

    monkeypatch.setattr(checks, "exact_quantiles_by_group", fake)
    df = pd.DataFrame({"g": ["a", "b"], "x": [1, 2]})
    with pytest.raises(ValueError, match="fetch budget"):
        R.evaluate_rules(rd.from_pandas(df),
                         [R.Rule("quantile", "x", {"q": 0.5, "lo": 0})],
                         partition_col="g")


def test_quantile_spec_roundtrip():
    rules = R.rules_from_spec([
        {"kind": "quantile", "column": "x", "q": 0.9, "hi": 10},
        {"kind": "quantile", "column": "s", "q": 0.5, "lo": "a",
         "finite_only": False},
    ])
    assert rules[0].params == {"q": 0.9, "lo": None, "hi": 10,
                               "finite_only": True}
    assert rules[1].params["finite_only"] is False
    assert R.columns_needed(rules, "g") == ["g", "s", "x"]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_cell, min_size=1, max_size=40),
       q=st.sampled_from([0.07, 0.25, 0.5, 0.75, 0.9, 1.0]),
       lo=st.integers(-40, 0), hi=st.integers(1, 40),
       grp_null=st.booleans())
def test_quantile_rule_fuzz_parity(ray_session_holder, vals, q, lo, hi,
                                   grp_null):
    """Hypothesis: exact-quantile verdicts match the quantile_disc
    oracle bit-for-bit over adversarial null/dup-heavy integer
    columns, at every sampled rank including the FP-hostile q=0.07
    (where fl(q)*n rounds above the integer rank)."""
    n = len(vals)
    grp = ["g1" if i % 3 else ("g2" if not grp_null else None)
           for i in range(n)]
    df = pd.DataFrame({"grp": grp, "val": pd.array(vals, dtype="Int64")})
    ruleset = [R.Rule("quantile", "val", {"q": q, "lo": lo, "hi": hi})]
    con = duckdb.connect()
    con.register("t", df)
    for part in (None, "grp"):
        rep = R.evaluate_rules(rd.from_pandas(df), ruleset,
                               partition_col=part)
        oracle = con.execute(
            R.rules_report_sql("t", ruleset, partition_col=part)).df() \
            .astype({c: np.int64
                     for c in ("n_rows", "n_violations", "passed")}) \
            .sort_values(["scope", "rule_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(rep, oracle)


# ---------------------------------------------------------------------------
# functional_dependency rule kind (round-5 fourth wave)
# ---------------------------------------------------------------------------


def test_fd_rule_construction():
    with pytest.raises(ValueError):
        R.Rule("functional_dependency", "a", {})  # no determines
    with pytest.raises(ValueError):
        R.Rule("functional_dependency", "a", {"determines": "a"})
    with pytest.raises(ValueError):
        R.Rule("functional_dependency", ("a", "b"), {"determines": "b"})
    r = R.Rule("functional_dependency", ("a", "b"), {"determines": "c"})
    assert r.rule_id == "fd(a,b->c)"
    assert r.input_columns == {"a", "b", "c"}
    specd = R.rules_from_spec(
        [{"kind": "functional_dependency", "column": ["a", "b"],
          "determines": "c"}])
    assert specd[0].column == ("a", "b")
    assert specd[0].params["determines"] == "c"


def test_fd_rule_semantics(ray_session):
    """Known violations: a=1 -> {x, y} violates; a=2 -> {x} holds;
    null determinant rows and null dependents are skipped (a=3 maps
    only to nulls -> no checkable pair -> holds vacuously)."""
    df = pd.DataFrame({
        "a": pd.array([1, 1, 1, 2, 2, None, 3], dtype="Int64"),
        "b": ["x", "y", "x", "x", "x", "y", None],
    })
    rule = R.Rule("functional_dependency", "a", {"determines": "b"})
    rep = R.evaluate_rules(rd.from_pandas(df), [rule])
    assert rep.loc[0, "n_violations"] == 1
    assert rep.loc[0, "passed"] == 0
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.execute(R.rules_report_sql("t", [rule])).df() \
        .astype({c: np.int64
                 for c in ("n_rows", "n_violations", "passed")}) \
        .sort_values(["scope", "rule_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(rep, oracle)


def test_fd_composite_determinant(ray_session):
    """Composite determinant: (a, g) -> b. Pairs (1, 'p') -> {x, y}
    violate; the lone-null-part rows drop out."""
    df = pd.DataFrame({
        "a": pd.array([1, 1, 1, 2, None], dtype="Int64"),
        "g": ["p", "p", "q", "p", "p"],
        "b": ["x", "y", "x", "x", "x"],
    })
    rule = R.Rule("functional_dependency", ("a", "g"),
                  {"determines": "b"})
    rep = R.evaluate_rules(rd.from_pandas(df), [rule])
    assert rep.loc[0, "n_violations"] == 1
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.execute(R.rules_report_sql("t", [rule])).df() \
        .astype({c: np.int64
                 for c in ("n_rows", "n_violations", "passed")}) \
        .sort_values(["scope", "rule_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(rep, oracle)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_cell, min_size=1, max_size=40),
       deps=st.data(), grp_null=st.booleans())
def test_fd_rule_fuzz_parity(ray_session_holder, vals, deps, grp_null):
    """Hypothesis: FD verdicts match the GROUP BY/HAVING oracle over
    adversarial null/dup-heavy tables, single and composite
    determinants, fused alongside a row-local rule."""
    n = len(vals)
    dep_list = deps.draw(st.lists(_tag, min_size=n, max_size=n))
    grp = ["g1" if i % 3 else ("g2" if not grp_null else None)
           for i in range(n)]
    df = pd.DataFrame({
        "grp": grp,
        "val": pd.array(vals, dtype="Int64"),
        "tag": dep_list,
    })
    ruleset = [
        R.Rule("functional_dependency", "val", {"determines": "tag"}),
        R.Rule("functional_dependency", ("grp", "val"),
               {"determines": "tag"}),
        R.Rule("not_null", "tag"),
    ]
    con = duckdb.connect()
    con.register("t", df)
    # partitioned: the FD is evaluated WITHIN each scope, one verdict
    # row per scope (null scopes included); unpartitioned: one
    # table-level row — both against the generated oracle
    for part in (None, "grp"):
        rep = R.evaluate_rules(rd.from_pandas(df), ruleset,
                               partition_col=part)
        oracle = con.execute(
            R.rules_report_sql("t", ruleset, partition_col=part)).df() \
            .astype({c: np.int64
                     for c in ("n_rows", "n_violations", "passed")}) \
            .sort_values(["scope", "rule_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(rep, oracle)


def test_fd_evidence_rows(ray_session):
    """evidence_rows=True returns one (det..., n_dep) row per
    violating group, matching the verdict count; determinant values
    come back as canonical strings."""
    from opengauss_tools_datachecker_performance_ray.pipelines import checks

    df = pd.DataFrame({
        "a": pd.array([1, 1, 1, 2, 2, 3], dtype="Int64"),
        "b": ["x", "y", "z", "x", "x", None],
    })
    ds = rd.from_pandas(df)
    ev = checks.fd_violating_groups(ds, "a", "b", evidence_rows=True) \
        .to_pandas().sort_values("a").reset_index(drop=True)
    assert ev.to_dict("records") == [{"a": "1", "n_dep": 3}]
    assert checks.fd_violating_groups(ds, "a", "b") == len(ev)


def test_monotonic_rule_kind(ray_session):
    """monotonic(value per key): known regressions; null key/order/
    value rows excluded; ties resolved by the declared tiebreaker;
    parity with the generated window-SQL oracle."""
    df = pd.DataFrame({
        "k": pd.array([1, 1, 1, 2, 2, None, 1], dtype="Int64"),
        "o": pd.array([1, 2, 3, 1, 2, 1, None], dtype="Int64"),
        "tb": pd.array([1, 2, 3, 4, 5, 6, 7], dtype="Int64"),
        "v": [5.0, 3.0, 7.0, 1.0, 2.0, 9.0, 0.0],
    })
    rule = R.Rule("monotonic", "v", {"key": "k",
                                     "order_by": ["o", "tb"]})
    rep = R.evaluate_rules(rd.from_pandas(df), [rule])
    assert rep.loc[0, "n_violations"] == 1  # k=1: 5,3,7 -> one dip
    con = duckdb.connect()
    con.register("t", df)
    oracle = con.execute(R.rules_report_sql("t", [rule])).df() \
        .astype({c: np.int64
                 for c in ("n_rows", "n_violations", "passed")}) \
        .sort_values(["scope", "rule_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(rep, oracle)


def test_monotonic_rule_construction_and_spec():
    with pytest.raises(ValueError):
        R.Rule("monotonic", "v", {"key": "k"})  # no order_by
    with pytest.raises(ValueError):
        R.Rule("monotonic", "v", {"order_by": ["o"]})  # no key
    r = R.rules_from_spec([{"kind": "monotonic", "column": "v",
                            "key": "k", "order_by": ["o", "tb"]}])[0]
    assert r.rule_id == "monotonic(v per k)"
    assert r.input_columns == {"v", "k", "o", "tb"}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_cell, min_size=1, max_size=40),
       keys=st.data())
def test_monotonic_rule_fuzz_parity(ray_session_holder, vals, keys):
    """Hypothesis: monotonic verdicts match the window oracle over
    adversarial null/dup-heavy integer tables (unique tiebreaker
    keeps the order total on both engines)."""
    n = len(vals)
    key_list = keys.draw(st.lists(
        st.one_of(st.none(), st.integers(0, 3)),
        min_size=n, max_size=n))
    ord_list = keys.draw(st.lists(
        st.one_of(st.none(), st.integers(0, 5)),
        min_size=n, max_size=n))
    df = pd.DataFrame({
        "k": pd.array(key_list, dtype="Int64"),
        "o": pd.array(ord_list, dtype="Int64"),
        "tb": np.arange(n, dtype=np.int64),
        "v": pd.array(vals, dtype="Int64"),
    })
    ruleset = [R.Rule("monotonic", "v",
                      {"key": "k", "order_by": ["o", "tb"]})]
    con = duckdb.connect()
    con.register("t", df)
    rep = R.evaluate_rules(rd.from_pandas(df), ruleset)
    oracle = con.execute(R.rules_report_sql("t", ruleset)).df() \
        .astype({c: np.int64
                 for c in ("n_rows", "n_violations", "passed")}) \
        .sort_values(["scope", "rule_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(rep, oracle)


def test_scoped_fd_evidence_matches_scoped_report(ray_session):
    """Review finding: a partition-scoped FD report judges (scope,
    det) groups — the exported evidence must be scoped the same way.
    A det whose dep differs only ACROSS scopes passes every per-scope
    verdict and must produce NO scoped evidence rows (while the
    unscoped evidence would list it)."""
    df = pd.DataFrame({
        "scope_c": ["A", "A", "B", "B"],
        "det": ["d1", "d1", "d1", "d1"],
        "dep": [1, 1, 2, 2],   # constant within each scope
    })
    ds = rd.from_pandas(df)
    rule = R.Rule("functional_dependency", "det",
                  {"determines": "dep"})
    unscoped = R.rule_violation_rows(ds, rule, ["det"]).to_pandas()
    assert len(unscoped) == 1  # cross-scope view: d1 -> {1, 2}
    scoped = R.rule_violation_rows(
        ds, rule, ["det"], partition_col="scope_c").to_pandas()
    assert len(scoped) == 0    # matches the per-scope verdicts
    # and the scoped report itself agrees: all scopes pass
    rep = R.evaluate_rules(ds, [rule], partition_col="scope_c")
    assert (rep["passed"] == 1).all()

"""Bloom semi-join pruning (functions/bloom.py): no false negatives,
identical bitmaps across build routes, and bit-identical referential
results with parent-side pruning engaged."""

import numpy as np
import pandas as pd
import pytest

from opengauss_tools_datachecker_performance_ray.functions import bloom as bloomf
from opengauss_tools_datachecker_performance_ray.pipelines import checks


class TestBloomFilter:
    def test_no_false_negatives_and_bounded_fpp(self):
        members = [f"https://ex{i}.com/p{i}" for i in range(20_000)]
        others = [f"https://nope{i}.org/q{i}" for i in range(20_000)]
        m, k = bloomf.bloom_params(len(members), bits_per_key=12)
        f = bloomf.BloomFilter.from_values(np.array(members, dtype=object), m, k)
        assert f.contains(np.array(members, dtype=object)).all()
        fpp = f.contains(np.array(others, dtype=object)).mean()
        assert fpp < 0.02  # sized for ~0.3% at 12 bits/key

    def test_int_keys_hash_like_strings(self):
        import pyarrow as pa
        vals = pa.array(np.arange(1000, dtype=np.int64))
        m, k = bloomf.bloom_params(1000)
        f = bloomf.BloomFilter.from_values(vals, m, k)
        assert f.contains(vals).all()

    def test_shard_build_matches_driver_build(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"k": [f"key-{i}" for i in range(5000)]})
        ds = rd.from_pandas(df).repartition(8)
        a = bloomf.build_bloom(ds, "k", 5000, shard_build=False)
        # tiny shards force many shard groups through the groupby route
        b = bloomf.build_bloom(ds, "k", 5000, shard_build=True,
                               shard_bytes=256)
        assert a.m == b.m and a.k == b.k
        assert np.array_equal(a.bits, b.bits)

    def test_nulls_ignored_in_build(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"k": ["a", None, "b", None]})
        f = bloomf.build_bloom(rd.from_pandas(df), "k", 4)
        assert f.contains(np.array(["a", "b"], dtype=object)).all()


class TestReferentialBloomPrune:
    def _mk(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        parent = pd.DataFrame(
            {"pk": [f"https://site{i}.com/" for i in range(40_000)]})
        # children reference a small slice of the parent space + some
        # dangling keys that exist nowhere
        refs = rng.choice(parent["pk"].to_numpy()[:2000], size=8000)
        dangling = np.array([f"https://gone{i}.net/" for i in range(37)])
        child = pd.DataFrame(
            {"fk": np.concatenate([refs, dangling])})
        return (rd.from_pandas(child).repartition(4),
                rd.from_pandas(parent).repartition(8),
                sorted(dangling.tolist()))

    def test_bloom_prune_bit_identical(self, ray_session):
        child, parent, dangling = self._mk(ray_session)
        plain = checks.referential_violations_partitioned(
            child, "fk", parent, "pk", num_buckets=16, bloom_prune=False)
        pruned = checks.referential_violations_partitioned(
            child, "fk", parent, "pk", num_buckets=16, bloom_prune=True)
        a = sorted(plain.to_pandas()["fk"])
        b = sorted(pruned.to_pandas()["fk"])
        assert a == b
        assert sorted(set(b)) == dangling

    def test_auto_route_engages_on_big_parent(self, ray_session,
                                              monkeypatch):
        child, parent, dangling = self._mk(ray_session)
        called = {}
        real = bloomf.build_bloom

        def spy(*a, **kw):
            called["yes"] = True
            return real(*a, **kw)

        monkeypatch.setattr(
            "opengauss_tools_datachecker_performance_ray.functions.bloom.build_bloom",
            spy)
        out = checks.referential_violations_partitioned(
            child, "fk", parent, "pk", num_buckets=16)
        assert sorted(set(out.to_pandas()["fk"])) == dangling
        assert called.get("yes")  # parent is ~5x child -> auto-engaged

    def test_prune_actually_drops_unreferenced_parents(self, ray_session):
        child, parent, _ = self._mk(ray_session)
        bf = bloomf.build_bloom(child.select_columns(["fk"]), "fk",
                                child.count())
        import pyarrow as pa
        pks = parent.to_pandas()["pk"].to_numpy(dtype=object)
        kept = bf.contains(pks).sum()
        # 2000 referenced + fpp of the other 38k; far below the 40k total
        assert kept < 4000


class TestKsExact:
    """checks.ks_exact_counts — exact distributed two-sample KS."""

    @staticmethod
    def _np_ks_num(a: np.ndarray, b: np.ndarray) -> int:
        """Reference: integer KS numerator over distinct values."""
        vals = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(np.sort(a), vals, side="right")
        cb = np.searchsorted(np.sort(b), vals, side="right")
        return int(np.abs(ca.astype(object) * len(b)
                          - cb.astype(object) * len(a)).max())

    def test_matches_numpy_reference(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        rng = np.random.default_rng(3)
        a = rng.normal(0, 1, 4000)
        b = rng.normal(0.3, 1.2, 3000)
        df = pd.DataFrame({
            "value": np.concatenate([a, b]),
            "a": np.concatenate([np.ones(len(a), np.int64),
                                 np.zeros(len(b), np.int64)]),
        }).sample(frac=1.0, random_state=0)  # interleave groups
        ds = rd.from_pandas(df).repartition(16)  # stress block boundaries
        res = checks.ks_exact_counts(ds, "value", "a")
        assert res["n_a"] == len(a) and res["n_b"] == len(b)
        assert res["ks_num"] == self._np_ks_num(a, b)

    def test_ties_and_duplicates(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        # heavy ties: ECDF must only be evaluated at whole-value steps
        rng = np.random.default_rng(5)
        a = rng.integers(0, 8, 2000).astype(float)
        b = rng.integers(2, 10, 1500).astype(float)
        df = pd.DataFrame({
            "value": np.concatenate([a, b]),
            "a": np.concatenate([np.ones(len(a), np.int64),
                                 np.zeros(len(b), np.int64)]),
        }).sample(frac=1.0, random_state=1)
        ds = rd.from_pandas(df).repartition(8)
        res = checks.ks_exact_counts(ds, "value", "a")
        assert res["ks_num"] == self._np_ks_num(a, b)

    def test_empty_group_returns_zero(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        df = pd.DataFrame({"value": [1.0, 2.0],
                           "a": np.array([1, 1], np.int64)})
        res = checks.ks_exact_counts(rd.from_pandas(df), "value", "a")
        assert res == {"ks_num": 0, "n_a": 2, "n_b": 0}

    def test_nulls_and_nonfinite_dropped(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        df = pd.DataFrame({
            "value": [1.0, np.nan, np.inf, 2.0, None, 3.0],
            "a": np.array([1, 1, 0, 0, 0, 1], np.int64),
        })
        res = checks.ks_exact_counts(rd.from_pandas(df), "value", "a")
        assert res["n_a"] == 2 and res["n_b"] == 1
        assert res["ks_num"] == self._np_ks_num(
            np.array([1.0, 3.0]), np.array([2.0]))


class TestExactQuantiles:
    """checks.exact_quantiles — quantile_disc semantics, distributed."""

    def test_matches_duckdb_on_random_floats(self, ray_session):
        import duckdb
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        rng = np.random.default_rng(9)
        vals = np.round(rng.lognormal(3, 1, 5000), 2)
        vals[::97] = np.nan  # must be excluded
        df = pd.DataFrame({"v": vals})
        ds = rd.from_pandas(df).repartition(12)
        qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.999, 1.0]
        got = checks.exact_quantiles(ds, "v", qs)
        con = duckdb.connect()
        con.register("t", df.dropna())
        for q in qs:
            exp = con.execute(
                f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            assert got[q] == exp, q

    def test_int_column_and_duplicates(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        df = pd.DataFrame({"v": np.repeat(
            np.arange(10, dtype=np.int64), 100)})
        ds = rd.from_pandas(df).repartition(7)
        got = checks.exact_quantiles(ds, "v", [0.05, 0.5, 0.95])
        assert got == {0.05: 0, 0.5: 4, 0.95: 9}

    def test_empty_returns_none(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        df = pd.DataFrame({"v": pd.Series([], dtype=np.float64)})
        got = checks.exact_quantiles(rd.from_pandas(df), "v", [0.5])
        assert got == {0.5: None}


class TestTopTerms:
    def test_bucket_topk_is_exact_vs_pandas(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        rng = np.random.default_rng(2)
        words = np.array(["t%02d" % i for i in range(40)])
        langs = np.array(["en", "fr", "de"])
        rows = [(langs[rng.integers(3)],
                 " ".join(rng.choice(words, size=rng.integers(1, 30),
                                     p=None)))
                for _ in range(300)]
        df = pd.DataFrame(rows, columns=["lang", "text"])
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       str(tmp_path / "documents.parquet"))
        got = q.top_terms_by_lang(str(tmp_path))
        # pandas reference
        toks = df.assign(token=df["text"].str.split(" ")) \
            .explode("token")[["lang", "token"]]
        cnt = toks.groupby(["lang", "token"]).size().reset_index(name="n")
        ref = cnt.sort_values(["lang", "n", "token"],
                              ascending=[True, False, True]) \
            .groupby("lang").head(5).reset_index(drop=True)
        assert list(got["lang"]) == list(ref["lang"])
        assert list(got["token"]) == list(ref["token"])
        assert list(got["n"]) == list(ref["n"])


class TestReviewRegressions:
    """Pins for the round-3 continuation review findings."""

    def test_quantile_rank_is_exact_not_fp_ceil(self, ray_session):
        import duckdb
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        # fl(0.07)*100 = 7.000000000000001 -> FP ceil would pick rank 8
        df = pd.DataFrame({"v": np.arange(1, 101, dtype=np.float64)})
        ds = rd.from_pandas(df).repartition(4)
        got = checks.exact_quantiles(ds, "v", [0.07, 0.14, 0.28])
        con = duckdb.connect()
        con.register("t", df)
        for q in (0.07, 0.14, 0.28):
            exp = con.execute(
                f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            assert got[q] == exp, q

    def test_ks_all_null_or_empty_returns_zero(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        df = pd.DataFrame({"value": [np.nan, np.nan],
                           "a": np.array([1, 0], np.int64)})
        assert checks.ks_exact_counts(rd.from_pandas(df), "value", "a") \
            == {"ks_num": 0, "n_a": 0, "n_b": 0}
        empty = pd.DataFrame({"value": pd.Series([], dtype=np.float64),
                              "a": pd.Series([], dtype=np.int64)})
        assert checks.ks_exact_counts(rd.from_pandas(empty), "value", "a") \
            == {"ks_num": 0, "n_a": 0, "n_b": 0}

    @pytest.mark.parametrize("losers_max", [2_000_000, 0])
    def test_line_dedup_string_ids_both_routes(self, ray_session,
                                               losers_max):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import dedup

        df = pd.DataFrame({
            "url": ["https://a/", "https://b/", "https://c/"],
            "text": ["x\ny", "y\nz", "x\ny"],
        })
        out = dedup.line_dedup(rd.from_pandas(df), "url", "text",
                               broadcast_losers_max=losers_max) \
            .to_pandas()
        got = dict(zip(out["url"], out["text"]))
        assert got == {"https://a/": "x\ny", "https://b/": "z"}


class TestJsonExtract:
    """functions.jsonfn.extract_int — strict JSON-integer semantics."""

    PAYLOADS = [
        '{"k": 69}', '{"k": -3, "x": 1}', '{"x": 1}', None, 'not json',
        '{"k": "9"}', '{"k": 9.5}', '{"k": true}', '{"a": {"k": 5}}',
        '{"s": "\\"k\\": 7"}', '{ "k" : 12 }',
        '{"k": 9007199254740993}',   # > 2^53: float staging would corrupt
        '{"k": 99999999999999999999999}',  # > int64 -> null by contract
        '{"kk": 4, "k": 8}', '{"k": [1,2]}', '[1, 2]', '{"k": null}',
        '{"k": 007}', '{"k": 1e3}', '{"k": 1, bad}', '{"k":1,"k":2}',
        '{"k": -0}', '{"K": 3}',
        # duplicate key with a NON-integer last value: the fast-path
        # greedy regex would backtrack to the earlier integer; these
        # must route to the json.loads slow path (advice r3)
        '{"k":1,"k":"x"}', '{"k":"x","k":3}', '{"k":5,"k":null}',
        '{"k":2,"k":9.5}', '{"k":null,"k":7}',
    ]

    def test_matches_json_loads_reference(self):
        import json

        import pyarrow as pa

        from opengauss_tools_datachecker_performance_ray.functions import jsonfn

        got = jsonfn.extract_int(
            pa.array(self.PAYLOADS, pa.string()), "k").to_pylist()
        for p, m in zip(self.PAYLOADS, got):
            try:
                v = json.loads(p) if p is not None else None
                ref = v.get("k") if isinstance(v, dict) else None
                if isinstance(ref, bool) or not isinstance(ref, int) \
                        or not -(2**63) <= (ref or 0) <= 2**63 - 1:
                    ref = None
            except (ValueError, TypeError):
                ref = None
            assert m == ref, p

    def test_documented_duckdb_divergences(self):
        """Pin exactly which payloads diverge from the SQL
        json_extract_string + TRY_CAST route (module docstring)."""
        import duckdb

        import pyarrow as pa

        from opengauss_tools_datachecker_performance_ray.functions import jsonfn

        mine = jsonfn.extract_int(
            pa.array(self.PAYLOADS, pa.string()), "k").to_pylist()
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"p": self.PAYLOADS}))
        orc = [r[0] for r in con.execute(
            "SELECT CASE WHEN p IS NOT NULL AND json_valid(p) THEN "
            "TRY_CAST(json_extract_string(p, '$.k') AS BIGINT) END "
            "FROM t").fetchall()]
        diverged = {p for p, m, o in zip(self.PAYLOADS, mine, orc)
                    if m != o}
        assert diverged == {
            '{"k": "9"}',      # SQL coerces quoted numbers
            '{"k": 9.5}',      # SQL TRY_CAST rounds floats
            '{"k": 1e3}',      # SQL casts scientific notation
            # duplicate keys: json.loads last-wins (our contract),
            # DuckDB json_extract first-wins — every dup-key payload
            # whose two values disagree under the two policies diverges
            '{"k":1,"k":2}',
            '{"k":1,"k":"x"}', '{"k":"x","k":3}', '{"k":5,"k":null}',
            '{"k":2,"k":9.5}', '{"k":null,"k":7}',
        }

    def test_fast_path_vectorized_on_flat_column(self):
        import pyarrow as pa

        from opengauss_tools_datachecker_performance_ray.functions import jsonfn

        vals = [f'{{"k": {i}}}' for i in range(5000)]
        got = jsonfn.extract_int(pa.array(vals, pa.string()), "k")
        assert got.to_pylist() == list(range(5000))


class TestDomainSkew:
    def test_extract_domain_vectorized(self):
        import pyarrow as pa

        from opengauss_tools_datachecker_performance_ray.functions import textfn

        urls = pa.array([
            "https://Sub.Example.com:8443/path?q=1",
            "http://user:pw@host.net/x", "ftp://files.org",
            "not a url", None, "https://a.b/", "https://a.b/other",
        ])
        got = textfn.extract_domain(urls).to_pylist()
        assert got == ["sub.example.com", "host.net", "files.org",
                       None, None, "a.b", "a.b"]

    def test_detect_hot_domains_on_pages(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import skew

        hot = "https://hot.example.com/p%d"
        cold = "https://cold%d.net/x"
        urls = [hot % i for i in range(900)] \
            + [cold % i for i in range(100)]
        ds = rd.from_pandas(pd.DataFrame({"url": urls})).repartition(4)
        out = skew.detect_hot_domains(ds, "url", threshold_frac=0.05)
        assert list(out["key"]) == ["hot.example.com"]
        assert int(out["n"].iloc[0]) == 900


class TestStableSampling:
    def test_split_is_complementary_and_stable(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import sampling

        keys = pd.DataFrame({"k": np.arange(20_000, dtype=np.int64)})
        ds = rd.from_pandas(keys).repartition(8)
        train, hold = sampling.split_train_holdout(ds, "k", 0.2)
        t = set(train.to_pandas()["k"])
        h = set(hold.to_pandas()["k"])
        assert t | h == set(keys["k"]) and not (t & h)
        assert 0.17 < len(h) / len(keys) < 0.23
        # stability: a different partitioning yields the same holdout
        h2 = set(sampling.split_train_holdout(
            rd.from_pandas(keys).repartition(3), "k", 0.2)[1]
            .to_pandas()["k"])
        assert h2 == h

    def test_sample_matches_sql_kernel(self, ray_session):
        import duckdb
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import sampling

        keys = pd.DataFrame(
            {"k": np.random.default_rng(4).integers(0, 2**62, 5000)})
        got = sorted(sampling.stable_sample(
            rd.from_pandas(keys), "k", 0.3).to_pandas()["k"])
        con = duckdb.connect()
        con.register("t", keys)
        thr = sampling.sample_threshold(0.3)
        exp = sorted(r[0] for r in con.execute(
            f"SELECT k FROM t WHERE ((CAST(k AS UBIGINT) % 4294967296)"
            f" * 2654435761) % 4294967296 < {thr}").fetchall())
        assert got == exp


class TestRepetitionFeatures:
    def test_counts_real_repetition(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        w10 = " ".join(["tok%d" % i for i in range(10)])
        other = " ".join(["alt%d" % i for i in range(10)])
        texts = [
            " ".join([w10, w10, other]),   # 3 windows, 1 dup
            " ".join([w10] * 5),           # 5 windows, 4 dups
            other,                          # 1 window, 0 dups
            "",                             # excluded
        ]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts)}), str(tmp_path / "documents.parquet"))
        got = q.repetition_features_documents(str(tmp_path))
        assert list(got["n_dup_lines"]) == [1, 4, 0]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/documents.parquet')")
        orc = con.execute(q.REPETITION_FEATURES_DOCUMENTS_SQL).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.equals(orc[got.columns])


class TestDriftExactRecheck:
    def _ds(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(12)
        n = 3000
        frames = []
        for g in ["a", "b", "c", "d"]:
            shift = 3.0 if g == "d" else 0.0  # d genuinely drifted
            frames.append(pd.DataFrame({
                "grp_col": g,
                "x": rng.normal(shift, 1.0, n),
            }))
        return rd.from_pandas(pd.concat(frames, ignore_index=True)) \
            .repartition(6)

    def test_confirms_real_drift_and_clears_false_flags(self, ray_session):
        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        ds = self._ds(ray_session)
        rep = checks.drift_by_group(ds, "grp_col", ["x"])
        failed = set(rep.loc[rep["result"] == "failed", "grp"])
        assert failed == {"d"}
        # inject a sketch false-positive on a clean group
        rep.loc[(rep["grp"] == "a"), "result"] = "failed"
        out = checks.drift_exact_recheck(ds, "grp_col", rep)
        assert set(out.loc[out["result"] == "failed", "grp"]) == {"d"}
        d_row = out[(out["grp"] == "d")].iloc[0]
        assert d_row["ks_exact"] is not None and d_row["ks_exact"] > 0.5
        a_row = out[(out["grp"] == "a")].iloc[0]
        assert a_row["ks_exact"] is not None and a_row["ks_exact"] < 0.1

    def test_recheck_cap_keeps_sketch_verdicts(self, ray_session):
        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        ds = self._ds(ray_session)
        rep = checks.drift_by_group(ds, "grp_col", ["x"])
        rep["result"] = "failed"  # flag everything
        out = checks.drift_exact_recheck(ds, "grp_col", rep,
                                         max_rechecks=1)
        # exactly one row got the exact statistic; the rest kept their
        # (forced) sketch verdicts
        assert out["ks_exact"].notna().sum() == 1


class TestMetamorphic:
    """Metamorphic properties of the new exact kernels."""

    def test_line_dedup_idempotent(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        rng = np.random.default_rng(21)
        words = np.array(["w%d" % i for i in range(12)])
        texts = [" ".join(rng.choice(words, size=rng.integers(5, 60)))
                 for _ in range(40)]
        texts += texts[:15]
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts)}),
            str(tmp_path / "documents.parquet"))
        once = q.line_dedup_documents(str(tmp_path))
        # feed the dedup output back through (windows joined by \n are
        # re-split by the operator's delimiter-of-record: rebuild an
        # equivalent corpus where each line is already a window)
        d2 = tmp_path / "again"
        d2.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array(once["doc_id"].to_numpy()),
            "text": pa.array(once["text"].str.replace("\n", " "))}),
            str(d2 / "documents.parquet"))
        twice = q.line_dedup_documents(str(d2))
        # windows already globally unique -> second pass is identity
        assert list(twice["doc_id"]) == list(once["doc_id"])
        assert list(twice["text"]) == list(once["text"])

    def test_ks_symmetry(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        rng = np.random.default_rng(6)
        df = pd.DataFrame({
            "value": rng.normal(0, 1, 2000),
            "a": rng.integers(0, 2, 2000).astype(np.int64),
        })
        ds = rd.from_pandas(df).repartition(5)
        r1 = checks.ks_exact_counts(ds, "value", "a")
        df2 = df.assign(a=1 - df["a"])
        r2 = checks.ks_exact_counts(rd.from_pandas(df2).repartition(5),
                                    "value", "a")
        assert r1["ks_num"] == r2["ks_num"]
        assert (r1["n_a"], r1["n_b"]) == (r2["n_b"], r2["n_a"])

    def test_sample_rate_boundaries(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import sampling

        df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
        ds = rd.from_pandas(df)
        assert sampling.stable_sample(ds, "k", 1.0).count() == 1000
        assert sampling.stable_sample(ds, "k", 0.0).count() == 0


class TestJsonExtractFuzz:
    def test_regex_fast_path_equals_json_loads(self):
        """Property: on arbitrary generated flat JSON objects the
        vectorized fast path must agree with json.loads semantics."""
        import json

        import pyarrow as pa
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from opengauss_tools_datachecker_performance_ray.functions import jsonfn

        scalars = st.one_of(
            st.integers(min_value=-(2**70), max_value=2**70),
            st.floats(allow_nan=False, allow_infinity=False),
            st.text(max_size=12), st.booleans(), st.none())
        keys = st.text(
            alphabet=st.characters(blacklist_categories=("Cs",),
                                   blacklist_characters='"\\'),
            max_size=6)

        @settings(max_examples=150, deadline=None)
        @given(st.dictionaries(keys, scalars, max_size=5))
        def check(d):
            payload = json.dumps(d)
            got = jsonfn.extract_int(
                pa.array([payload], pa.string()), "k").to_pylist()[0]
            ref = d.get("k")
            if isinstance(ref, bool) or not isinstance(ref, int) \
                    or not -(2**63) <= ref <= 2**63 - 1:
                ref = None
            assert got == ref, payload

        check()


class TestReviewRegressions2:
    """Pins for the second review pass."""

    def test_drift_recheck_never_downgrades_psi_flags(self, ray_session):
        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        import ray.data as rd

        rng = np.random.default_rng(13)
        frames = []
        for g in ["a", "b", "c"]:
            frames.append(pd.DataFrame({"grp_col": g,
                                        "x": rng.normal(0, 1, 1500)}))
        ds = rd.from_pandas(pd.concat(frames, ignore_index=True))
        rep = checks.drift_by_group(ds, "grp_col", ["x"])
        # simulate a PSI-flagged categorical drift whose KS is clean
        rep.loc[rep["grp"] == "b", ["result", "psi_flag"]] = \
            ["failed", True]
        out = checks.drift_exact_recheck(ds, "grp_col", rep)
        b = out[out["grp"] == "b"].iloc[0]
        assert b["result"] == "failed"       # never downgraded
        assert b["ks_exact"] is None         # KS did not adjudicate it

    def test_hot_domains_ignore_unparseable_urls(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import skew

        urls = ["https://hot.net/x"] * 50 + ["not a url"] * 50
        out = skew.detect_hot_domains(
            rd.from_pandas(pd.DataFrame({"url": urls})), "url",
            threshold_frac=0.05)
        assert list(out["key"]) == ["hot.net"]
        assert float(out["frac"].iloc[0]) == 1.0  # of parseable rows

    def test_spread_sample_not_block_order_truncated(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import (
            similarity,
        )

        # 128 blocks, cluster id encoded in the vector; a block-order
        # limit would only ever see the first ~64 blocks
        rng = np.random.default_rng(3)
        mats = [np.full((20, 4), float(b), dtype=np.float32)
                + 0.01 * rng.standard_normal((20, 4)).astype(np.float32)
                for b in range(128)]
        df = pd.DataFrame({"emb": [r for m in mats for r in m]})
        ds = rd.from_pandas(df).repartition(128)
        sample = similarity._spread_sample(ds, "emb", 256, seed=1)
        blocks_seen = {int(round(v[0])) for v in sample}
        assert max(blocks_seen) > 100  # late blocks represented

    def test_jsonfn_escaped_key_exact(self):
        import pyarrow as pa

        from opengauss_tools_datachecker_performance_ray.functions import jsonfn

        got = jsonfn.extract_int(pa.array(
            ['{"\\u006b": 5}', '{"x": "a\\"b", "k": 7}'],
            pa.string()), "k").to_pylist()
        assert got == [5, 7]

    def test_curate_sample_requires_int_ids(self, ray_session, tmp_path,
                                            capsys):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from opengauss_tools_datachecker_performance_ray.__main__ import main

        pq.write_table(pa.table({
            "doc_id": pa.array(["u1", "u2"]),
            "text": pa.array(["a\nb", "c"])}),
            str(tmp_path / "d.parquet"))
        rc = main(["curate", "--input", str(tmp_path / "d.parquet"),
                   "--out", str(tmp_path / "out"), "--sample-rate", "0.5"])
        assert rc == 2


class TestGroupedQuantiles:
    def test_matches_duckdb_per_group(self, ray_session):
        import duckdb
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        rng = np.random.default_rng(8)
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c"], 6000),
            "v": np.round(rng.lognormal(2, 1, 6000), 3),
        })
        df.loc[::71, "v"] = np.nan
        ds = rd.from_pandas(df).repartition(10)
        long = checks.exact_quantiles_by_group(ds, "g", "v",
                                               [0.07, 0.5, 0.95])
        con = duckdb.connect()
        con.register("t", df.dropna())
        for q in (0.07, 0.5, 0.95):
            exp = dict(con.execute(
                f"SELECT g, quantile_disc(v, {q}) FROM t GROUP BY g")
                .fetchall())
            got = dict(long[long["q"] == q][["g", "value"]]
                       .itertuples(index=False))
            assert got == exp, q

    def test_fetch_cap_returns_none_beyond(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import checks

        df = pd.DataFrame({"g": list("abcd") * 50,
                           "v": np.arange(200, dtype=np.float64)})
        long = checks.exact_quantiles_by_group(
            rd.from_pandas(df), "g", "v", [0.5], max_fetches=2)
        assert long["value"].notna().sum() == 2
        assert long["value"].isna().sum() == 2

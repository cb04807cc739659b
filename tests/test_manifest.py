"""Portable digest manifests (`stages/manifest.py`): write → verify
round-trip, fault injection at partition/bucket granularity, version
guard, and the fingerprint / verify-manifest CLI."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from opengauss_tools_datachecker_performance_ray.__main__ import main
from opengauss_tools_datachecker_performance_ray.stages import (
    manifest as M,
)
from opengauss_tools_datachecker_performance_ray.stages.digest import (
    DigestConfig,
)


def _table(n=2000, bump=None, drop=None):
    k = np.arange(n, dtype=np.int64)
    v = (k * 31 % 997).astype(np.int64)
    if bump is not None:
        v = v.copy()
        v[bump] += 1
    df = pd.DataFrame({"k": k, "v": v})
    if drop is not None:
        df = df[df["k"] != drop]
    return df


CFG = DigestConfig(key_columns=("k",), num_partitions=8,
                   buckets_per_partition=16)


class TestManifest:
    def test_clean_roundtrip(self, ray_session, tmp_path):
        d = str(tmp_path / "man")
        meta = M.write_manifest(rd.from_pandas(_table()), CFG, d,
                                table="t")
        assert meta["n_rows"] == 2000
        res = M.verify_against_manifest(rd.from_pandas(_table()), d)
        assert res["result"] == "success"
        assert res["dirtyPartitions"] == 0 and len(res["verdicts"]) == 0
        assert res["manifestRows"] == res["liveRows"] == 2000

    def test_single_value_mutation_isolated(self, ray_session,
                                            tmp_path):
        d = str(tmp_path / "man")
        M.write_manifest(rd.from_pandas(_table()), CFG, d)
        res = M.verify_against_manifest(
            rd.from_pandas(_table(bump=1234)), d)
        assert res["result"] == "failed"
        # exactly one partition, >=1 bucket, row counts EQUAL
        assert res["dirtyPartitions"] == 1
        assert res["diffBuckets"] >= 1
        v = res["verdicts"]
        assert int(v["manifest_rows"].iloc[0]) == \
            int(v["live_rows"].iloc[0])

    def test_deleted_row_changes_counts(self, ray_session, tmp_path):
        d = str(tmp_path / "man")
        M.write_manifest(rd.from_pandas(_table()), CFG, d)
        res = M.verify_against_manifest(
            rd.from_pandas(_table(drop=77)), d)
        assert res["result"] == "failed"
        assert res["liveRows"] == 1999
        v = res["verdicts"]
        assert (v["manifest_rows"] - v["live_rows"]).sum() == 1

    def test_version_guard(self, ray_session, tmp_path):
        d = str(tmp_path / "man")
        M.write_manifest(rd.from_pandas(_table()), CFG, d)
        p = tmp_path / "man" / "manifest.json"
        meta = json.loads(p.read_text())
        meta["version"] = 99
        p.write_text(json.dumps(meta))
        with pytest.raises(ValueError):
            M.read_manifest(d)

    def test_config_roundtrips_through_json(self, ray_session,
                                            tmp_path):
        d = str(tmp_path / "man")
        cfg = DigestConfig(key_columns=("k",), compare_columns=("v",),
                           num_partitions=4, buckets_per_partition=8)
        M.write_manifest(rd.from_pandas(_table()), cfg, d)
        _, back, _ = M.read_manifest(d)
        assert back == cfg


class TestManifestCli:
    def test_fingerprint_then_verify(self, ray_session, tmp_path,
                                     capsys):
        inp = tmp_path / "t.parquet"
        pq.write_table(pa.table(_table()), str(inp))
        man = str(tmp_path / "man")
        rc = main(["fingerprint", "--input", str(inp), "--keys", "k",
                   "--out", man])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["n_rows"] == 2000
        rc = main(["verify-manifest", "--input", str(inp),
                   "--manifest", man])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["result"] == "success"
        # a mutated copy fails with exit 1 + verdict parquet
        mut = tmp_path / "mut.parquet"
        pq.write_table(pa.table(_table(bump=5)), str(mut))
        vout = str(tmp_path / "verdicts.parquet")
        rc = main(["verify-manifest", "--input", str(mut),
                   "--manifest", man, "--verdicts-out", vout])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["result"] == "failed"
        v = pd.read_parquet(vout)
        assert len(v) >= 1 and "n_diff_buckets" in v.columns


class TestDistributedManifest:
    def test_distributed_write_equals_driver_write(self, ray_session,
                                                   tmp_path):
        """The 10^12 route (sharded signatures, driver never holds
        blobs) verifies identically to the single-file route."""
        d1, d2 = str(tmp_path / "drv"), str(tmp_path / "dist")
        M.write_manifest(rd.from_pandas(_table()), CFG, d1)
        meta = M.write_manifest(rd.from_pandas(_table()), CFG, d2,
                                distributed=True)
        assert meta["n_rows"] == 2000
        import os

        assert os.path.isdir(os.path.join(d2, "signatures"))
        for man in (d1, d2):
            res = M.verify_against_manifest(
                rd.from_pandas(_table(bump=1234)), man)
            assert res["result"] == "failed"
            assert res["dirtyPartitions"] == 1
            assert res["diffBuckets"] >= 1
        clean = M.verify_against_manifest(rd.from_pandas(_table()), d2)
        assert clean["result"] == "success"

    def test_scalar_first_fetch_matches_full_read(self, ray_session,
                                                  tmp_path):
        """The two-phase verify (scalars, then blobs for dirty parts
        only) reports the same dirty buckets as a full-frame compare."""
        d = str(tmp_path / "man")
        M.write_manifest(rd.from_pandas(_table()), CFG, d)
        live_df = _table(bump=7)
        res = M.verify_against_manifest(rd.from_pandas(live_df), d)
        # full-frame reference
        from opengauss_tools_datachecker_performance_ray.stages import (
            compare as cmp,
        )
        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            digest_dataset,
        )
        sigs, cfg, _ = M.read_manifest(d)
        live = cmp.partition_signatures(
            digest_dataset(rd.from_pandas(live_df), cfg), cfg)
        ref = cmp.compare_signatures(sigs, live, cfg)
        ref_dirty = {dd.part: list(dd.diff_buckets) for dd in ref
                     if len(dd.diff_buckets)}
        got = {int(r["part"]): int(r["n_diff_buckets"])
               for _, r in res["verdicts"].iterrows()}
        assert got == {p: len(b) for p, b in ref_dirty.items()}


class TestSchemaManifests:
    def _schema(self, tmp_path, name, mutate=False):
        d = tmp_path / name
        d.mkdir(exist_ok=True)
        pq.write_table(pa.table(_table(bump=3 if mutate else None)),
                       str(d / "alpha.parquet"))
        sub = d / "beta"
        sub.mkdir(exist_ok=True)
        pq.write_table(pa.table({"id": np.arange(50, dtype=np.int64),
                                 "s": [f"v{i}" for i in range(50)]}),
                       str(sub / "p.parquet"))
        return str(d)

    def test_fingerprint_and_verify_schema(self, ray_session, tmp_path,
                                           capsys):
        src = self._schema(tmp_path, "src")
        man = str(tmp_path / "man")
        rc = main(["fingerprint", "--input", src, "--schema",
                   "--keys", "alpha=k,beta=id", "--out", man])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0
        assert out["fingerprinted"] == ["alpha", "beta"]
        # clean verify of the same directory
        rc = main(["verify-manifest", "--input", src, "--schema",
                   "--manifest", man])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["failedCount"] == 0
        # mutated alpha fails; beta stays clean
        mut = self._schema(tmp_path, "mut", mutate=True)
        rc = main(["verify-manifest", "--input", mut, "--schema",
                   "--manifest", man])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["failedCount"] == 1
        assert out["tables"]["alpha"]["result"] == "failed"
        assert out["tables"]["beta"]["result"] == "success"

    def test_bad_default_key_recorded_not_crashed(self, ray_session,
                                                  tmp_path, capsys):
        """A '*' default key missing on one table records a failure
        for THAT table; the others still fingerprint."""
        src = self._schema(tmp_path, "src3")
        man = str(tmp_path / "man3")
        rc = main(["fingerprint", "--input", src, "--schema",
                   "--keys", "*=k", "--out", man])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1  # beta has no 'k' column
        assert out["fingerprinted"] == ["alpha"]
        assert "beta" in out["failed"]

    def test_missing_table_is_failed_verdict(self, ray_session,
                                             tmp_path, capsys):
        src = self._schema(tmp_path, "src2")
        man = str(tmp_path / "man2")
        rc = main(["fingerprint", "--input", src, "--schema",
                   "--keys", "alpha=k,beta=id", "--out", man])
        capsys.readouterr()
        assert rc == 0
        import shutil

        live = tmp_path / "live2"
        shutil.copytree(src, str(live))
        shutil.rmtree(str(live / "beta"))
        rc = main(["verify-manifest", "--input", str(live), "--schema",
                   "--manifest", man])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1
        assert out["tables"]["beta"]["error"] == "missing on live side"
        assert out["tables"]["alpha"]["result"] == "success"


class TestDiffManifests:
    def test_identical_and_differing(self, ray_session, tmp_path,
                                     capsys):
        a, b, c = (str(tmp_path / x) for x in ("a", "b", "c"))
        M.write_manifest(rd.from_pandas(_table()), CFG, a)
        M.write_manifest(rd.from_pandas(_table()), CFG, b)
        M.write_manifest(rd.from_pandas(_table(bump=9)), CFG, c)
        same = M.diff_manifests(a, b)
        assert same["result"] == "success"
        assert same["dirtyPartitions"] == 0
        diff = M.diff_manifests(a, c)
        assert diff["result"] == "failed"
        assert diff["dirtyPartitions"] == 1
        # CLI exit codes
        rc = main(["diff-manifests", "--a", a, "--b", b])
        capsys.readouterr()
        assert rc == 0
        rc = main(["diff-manifests", "--a", a, "--b", c])
        capsys.readouterr()
        assert rc == 1

    def test_config_drift_raises(self, ray_session, tmp_path):
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        M.write_manifest(rd.from_pandas(_table()), CFG, a)
        other = DigestConfig(key_columns=("k",), num_partitions=4,
                             buckets_per_partition=16)
        M.write_manifest(rd.from_pandas(_table()), other, b)
        with pytest.raises(ValueError):
            M.diff_manifests(a, b)


class TestUpdateManifest:
    def test_incremental_equals_refingerprint(self, ray_session,
                                              tmp_path):
        """manifest(T0) + changes == fingerprint(T1) BYTE-FOR-BYTE:
        same leaves, same roots, same row totals — the XOR
        signature's self-inverse property end-to-end."""
        t0 = _table()
        # T1: delete k=10, update k=20 (v+1), insert k=9999
        t1 = t0[t0["k"] != 10].copy()
        t1.loc[t1["k"] == 20, "v"] += 1
        t1 = pd.concat([t1, pd.DataFrame({"k": [9999], "v": [42]})],
                       ignore_index=True)
        d0, d1, dref = (str(tmp_path / x) for x in
                        ("base", "updated", "ref"))
        M.write_manifest(rd.from_pandas(t0), CFG, d0, table="t")
        removed = pa.table(t0[(t0["k"] == 10) | (t0["k"] == 20)])
        added = pa.table(pd.concat([
            t1[t1["k"] == 20], t1[t1["k"] == 9999]],
            ignore_index=True))
        meta = M.update_manifest(d0, removed=removed, added=added,
                                 out_dir=d1)
        assert meta["n_rows"] == 2000  # -1 +1
        M.write_manifest(rd.from_pandas(t1), CFG, dref, table="t")
        a, _, _ = M.read_manifest(d1)
        b, _, _ = M.read_manifest(dref)
        a = a.sort_values("part").reset_index(drop=True)
        b = b.sort_values("part").reset_index(drop=True)
        assert (a["root"].to_numpy() == b["root"].to_numpy()).all()
        assert (a["croot"].to_numpy() == b["croot"].to_numpy()).all()
        assert list(a["leaves"]) == list(b["leaves"])
        assert list(a["counts"]) == list(b["counts"])
        # and the updated manifest verifies T1 clean, T0 dirty
        assert M.verify_against_manifest(
            rd.from_pandas(t1), d1)["result"] == "success"
        assert M.verify_against_manifest(
            rd.from_pandas(t0), d1)["result"] == "failed"

    def test_phantom_remove_raises(self, ray_session, tmp_path):
        """Removing an image that was never fingerprinted drives its
        bucket count negative when the bucket is otherwise empty —
        here the manifest is built from an EMPTY table so every
        bucket is. (With occupied buckets the divergence surfaces at
        the next verify instead — counts can't prove it locally.)"""
        d = str(tmp_path / "man")
        M.write_manifest(rd.from_pandas(_table(n=0)), CFG, d)
        phantom = pa.table({"k": np.array([123456789], np.int64),
                            "v": np.array([1], np.int64)})
        with pytest.raises(ValueError) as e:
            M.update_manifest(d, removed=phantom,
                              out_dir=str(tmp_path / "x"))
        assert "diverged" in str(e.value)

    def test_in_place_update(self, ray_session, tmp_path):
        d = str(tmp_path / "man")
        t0 = _table()
        M.write_manifest(rd.from_pandas(t0), CFG, d)
        added = pa.table({"k": np.array([5000], np.int64),
                          "v": np.array([7], np.int64)})
        meta = M.update_manifest(d, added=added)
        assert meta["n_rows"] == 2001
        t1 = pd.concat([t0, pd.DataFrame({"k": [5000], "v": [7]})],
                       ignore_index=True)
        assert M.verify_against_manifest(
            rd.from_pandas(t1), d)["result"] == "success"


class TestUpdateFromChanges:
    def test_debezium_stream_to_current_fingerprint(self, ray_session,
                                                    tmp_path):
        """Full chain: Debezium JSON events (with before images) ->
        parser -> update_from_changes -> manifest byte-equal to a
        re-fingerprint of the final state."""
        from opengauss_tools_datachecker_performance_ray.sources import (
            debezium,
        )

        t0 = _table(n=300)
        d0, d1, dref = (str(tmp_path / x) for x in
                        ("base", "upd", "ref"))
        M.write_manifest(rd.from_pandas(t0), CFG, d0, table="t")
        src = {"table": "t", "ts_ms": 1}
        ev = []
        # insert k=9000, delete k=5, update k=6 (v 186 -> 187)
        ev.append(json.dumps({"payload": {
            "before": None, "after": {"k": "9000", "v": "42"},
            "source": src, "op": "c", "ts_ms": 2}}))
        v5 = int(t0.loc[t0["k"] == 5, "v"].iloc[0])
        ev.append(json.dumps({"payload": {
            "before": {"k": "5", "v": str(v5)}, "after": None,
            "source": src, "op": "d", "ts_ms": 3}}))
        v6 = int(t0.loc[t0["k"] == 6, "v"].iloc[0])
        ev.append(json.dumps({"payload": {
            "before": {"k": "6", "v": str(v6)},
            "after": {"k": "6", "v": str(v6 + 1)},
            "source": src, "op": "u", "ts_ms": 4}}))
        parse = debezium.make_event_parser(
            key_columns={"t": ["k"]}, value_columns=["k", "v"],
            before_columns=["k", "v"])
        parsed = parse(pa.table({"text": pa.array(ev,
                                                  pa.large_string())}))
        schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        meta = M.update_from_changes(d0, parsed, schema, out_dir=d1)
        assert meta["n_rows"] == 300  # +1 -1
        t1 = t0[t0["k"] != 5].copy()
        t1.loc[t1["k"] == 6, "v"] = v6 + 1
        t1 = pd.concat([t1, pd.DataFrame({"k": [9000], "v": [42]})],
                       ignore_index=True)
        M.write_manifest(rd.from_pandas(t1), CFG, dref, table="t")
        a, _, _ = M.read_manifest(d1)
        b, _, _ = M.read_manifest(dref)
        a = a.sort_values("part").reset_index(drop=True)
        b = b.sort_values("part").reset_index(drop=True)
        assert (a["root"].to_numpy() == b["root"].to_numpy()).all()
        assert list(a["leaves"]) == list(b["leaves"])
        assert list(a["counts"]) == list(b["counts"])

    def test_update_without_before_image_raises(self, ray_session,
                                                tmp_path):
        from opengauss_tools_datachecker_performance_ray.sources import (
            debezium,
        )

        d0 = str(tmp_path / "base")
        M.write_manifest(rd.from_pandas(_table(n=10)), CFG, d0,
                         table="t")
        ev = [json.dumps({"payload": {
            "before": None, "after": {"k": "1", "v": "99"},
            "source": {"table": "t"}, "op": "u", "ts_ms": 1}})]
        parse = debezium.make_event_parser(
            key_columns={"t": ["k"]}, value_columns=["k", "v"],
            before_columns=["k", "v"])
        parsed = parse(pa.table({"text": pa.array(ev,
                                                  pa.large_string())}))
        schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        with pytest.raises(ValueError) as e:
            M.update_from_changes(d0, parsed, schema,
                                  out_dir=str(tmp_path / "x"))
        assert "before image" in str(e.value)


class TestProfileManifest:
    def test_roundtrip_and_drift(self, ray_session, tmp_path):
        """Stored sketches of T0 drift-test live T1: same distribution
        -> clean; shifted numeric + swapped categories -> flagged."""
        rng = np.random.default_rng(31)
        t0 = pd.DataFrame({
            "x": rng.normal(100, 10, 4000),
            "cat": rng.choice(["a", "b", "c"], 4000,
                              p=[0.8, 0.15, 0.05]),
        })
        d = str(tmp_path / "prof")
        meta = M.write_profile_manifest(rd.from_pandas(t0), d,
                                        table="t")
        assert set(meta["columns"]) == {"x", "cat"}
        # human-readable summary carries the sketch fields
        row = {r["column"]: r for r in meta["rows"]}
        assert row["x"]["cnt"] == 4000 and row["x"]["p50"] is not None
        same = M.drift_vs_profile_manifest(
            rd.from_pandas(t0.sample(frac=1.0, random_state=7)), d)
        assert (same["result"] == "success").all()
        t1 = pd.DataFrame({
            "x": rng.normal(160, 10, 4000),  # big shift
            "cat": rng.choice(["a", "b", "c"], 4000,
                              p=[0.05, 0.15, 0.8]),
        })
        drifted = M.drift_vs_profile_manifest(rd.from_pandas(t1), d)
        r = drifted.set_index("column")["result"]
        assert r.loc["x"] == "failed" and r.loc["cat"] == "failed"

    def test_version_guard(self, ray_session, tmp_path):
        import pickle

        d = str(tmp_path / "prof")
        M.write_profile_manifest(
            rd.from_pandas(pd.DataFrame({"x": [1.0, 2.0]})), d)
        p = tmp_path / "prof" / "sketches.pkl"
        blob = pickle.loads(p.read_bytes())
        blob["version"] = 99
        p.write_bytes(pickle.dumps(blob))
        with pytest.raises(ValueError):
            M.read_profile_manifest(d)


class TestGroupedProfileManifest:
    def test_per_group_temporal_drift(self, ray_session, tmp_path):
        """Each live group drifts against ITS OWN stored profile:
        shifting one group flags only that group."""
        rng = np.random.default_rng(53)
        def corpus(shift_b=0.0):
            return pd.DataFrame({
                "g": ["a"] * 3000 + ["b"] * 3000,
                "x": np.r_[rng.normal(10, 1, 3000),
                           rng.normal(50 + shift_b, 1, 3000)],
            })
        d = str(tmp_path / "gm")
        meta = M.write_grouped_profile_manifest(
            rd.from_pandas(corpus()), "g", ["x"], d, table="t")
        assert meta["n_groups"] == 2
        clean = M.drift_vs_grouped_manifest(
            rd.from_pandas(corpus()), d)
        assert (clean["result"] == "success").all()
        rep = M.drift_vs_grouped_manifest(
            rd.from_pandas(corpus(shift_b=40.0)), d)
        r = rep.set_index("grp")["result"]
        assert r.loc["a"] == "success" and r.loc["b"] == "failed"

    def test_missing_group_verdict(self, ray_session, tmp_path):
        d = str(tmp_path / "gm")
        t0 = pd.DataFrame({"g": ["a", "a", "b", "b"],
                           "x": [1.0, 2.0, 3.0, 4.0]})
        M.write_grouped_profile_manifest(rd.from_pandas(t0), "g",
                                         ["x"], d)
        live = t0[t0["g"] == "a"]
        rep = M.drift_vs_grouped_manifest(rd.from_pandas(live), d)
        miss = rep[rep["missing_on"].notna()]
        assert len(miss) == 1
        assert miss["grp"].iloc[0] == "b"
        assert miss["missing_on"].iloc[0] == "live"

    def test_plain_manifest_rejected(self, ray_session, tmp_path):
        d = str(tmp_path / "plain")
        M.write_profile_manifest(
            rd.from_pandas(pd.DataFrame({"x": [1.0]})), d)
        with pytest.raises(ValueError):
            M.drift_vs_grouped_manifest(
                rd.from_pandas(pd.DataFrame({"g": ["a"],
                                             "x": [1.0]})), d)


class TestColumnManifest:
    def _t(self, mutate_v=None, mutate_w=None, drop=None):
        k = np.arange(1000, dtype=np.int64)
        v = (k * 7 % 101).astype(np.int64)
        w = np.array([f"s{i % 13}" for i in range(1000)], dtype=object)
        if mutate_v is not None:
            v = v.copy(); v[mutate_v] += 1
        if mutate_w is not None:
            w = w.copy(); w[mutate_w] = "CHANGED"
        df = pd.DataFrame({"k": k, "v": v, "w": w})
        if drop is not None:
            df = df[df["k"] != drop]
        return df

    def test_column_isolation(self, ray_session, tmp_path):
        """Mutating one column flags ONLY that column (plus nothing in
        __rows__: counts unchanged)."""
        d = str(tmp_path / "cm")
        cfg = DigestConfig(key_columns=("k",), num_partitions=4,
                           buckets_per_partition=8)
        M.write_column_manifest(rd.from_pandas(self._t()), cfg, d,
                                compare_cols=["v", "w"], table="t")
        res = M.verify_columns_against_manifest(
            rd.from_pandas(self._t(mutate_v=123)), d)
        assert res["result"] == "failed"
        assert res["dirtyColumns"] == ["v"]
        assert not res["rowSkew"]
        assert set(res["verdicts"]["column"]) == {"v"}
        res2 = M.verify_columns_against_manifest(
            rd.from_pandas(self._t(mutate_w=55)), d)
        assert res2["dirtyColumns"] == ["w"]

    def test_clean_and_row_skew(self, ray_session, tmp_path):
        d = str(tmp_path / "cm")
        cfg = DigestConfig(key_columns=("k",), num_partitions=4,
                           buckets_per_partition=8)
        M.write_column_manifest(rd.from_pandas(self._t()), cfg, d,
                                compare_cols=["v", "w"])
        clean = M.verify_columns_against_manifest(
            rd.from_pandas(self._t()), d)
        assert clean["result"] == "success"
        assert clean["dirtyColumns"] == [] and not clean["rowSkew"]
        # a deleted row flags every column's signature AND __rows__
        dropped = M.verify_columns_against_manifest(
            rd.from_pandas(self._t(drop=500)), d)
        assert dropped["result"] == "failed"
        assert dropped["rowSkew"]
        assert set(dropped["dirtyColumns"]) == {"v", "w"}

    def test_value_swap_within_bucket_detected(self, ray_session,
                                               tmp_path):
        """The keyed binding: swapping two rows' values would cancel
        an unkeyed per-column XOR; keyed it must flag the column."""
        d = str(tmp_path / "cm")
        cfg = DigestConfig(key_columns=("k",), num_partitions=1,
                           buckets_per_partition=1)  # force one bucket
        t0 = pd.DataFrame({"k": np.array([1, 2], np.int64),
                           "v": np.array([10, 20], np.int64)})
        M.write_column_manifest(rd.from_pandas(t0), cfg, d,
                                compare_cols=["v"])
        swapped = t0.assign(v=[20, 10])
        res = M.verify_columns_against_manifest(
            rd.from_pandas(swapped), d)
        assert res["dirtyColumns"] == ["v"]

    def test_cli_column_level(self, ray_session, tmp_path, capsys):
        inp = tmp_path / "t.parquet"
        pq.write_table(pa.table(self._t()), str(inp))
        man = str(tmp_path / "cman")
        rc = main(["fingerprint", "--input", str(inp), "--keys", "k",
                   "--out", man, "--column-level", "v,w"])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 0 and out["compare_cols"] == ["v", "w"]
        mut = tmp_path / "mut.parquet"
        pq.write_table(pa.table(self._t(mutate_v=9)), str(mut))
        rc = main(["verify-manifest", "--input", str(mut),
                   "--manifest", man])
        out = json.loads(capsys.readouterr().out.strip())
        assert rc == 1 and out["dirtyColumns"] == ["v"]

    def test_update_column_manifest_equals_refingerprint(
            self, ray_session, tmp_path):
        """Incremental column-manifest update == re-fingerprint,
        byte-for-byte per (column, part)."""
        cfg = DigestConfig(key_columns=("k",), num_partitions=4,
                           buckets_per_partition=8)
        t0 = self._t()
        d0, d1, dref = (str(tmp_path / x) for x in
                        ("base", "upd", "ref"))
        M.write_column_manifest(rd.from_pandas(t0), cfg, d0,
                                compare_cols=["v", "w"], table="t")
        # update k=123 (v+1), delete k=500, insert k=9000
        t1 = t0[t0["k"] != 500].copy()
        t1.loc[t1["k"] == 123, "v"] += 1
        t1 = pd.concat([t1, pd.DataFrame(
            {"k": [9000], "v": [1], "w": ["s0"]})],
            ignore_index=True)
        removed = pa.Table.from_pandas(
            t0[(t0["k"] == 123) | (t0["k"] == 500)],
            preserve_index=False)
        added = pa.Table.from_pandas(
            t1[(t1["k"] == 123) | (t1["k"] == 9000)],
            preserve_index=False)
        meta = M.update_column_manifest(d0, removed=removed,
                                        added=added, out_dir=d1)
        assert meta["n_rows"] == 1000
        M.write_column_manifest(rd.from_pandas(t1), cfg, dref,
                                compare_cols=["v", "w"], table="t")
        a = pq.read_table(d1 + "/column_signatures.parquet") \
            .to_pandas().sort_values(["column", "part"]) \
            .reset_index(drop=True)
        b = pq.read_table(dref + "/column_signatures.parquet") \
            .to_pandas().sort_values(["column", "part"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        res = M.verify_columns_against_manifest(
            rd.from_pandas(t1), d1)
        assert res["result"] == "success"

    def test_diff_column_manifests(self, ray_session, tmp_path):
        cfg = DigestConfig(key_columns=("k",), num_partitions=4,
                           buckets_per_partition=8)
        a, b, c = (str(tmp_path / x) for x in ("a", "b", "c"))
        M.write_column_manifest(rd.from_pandas(self._t()), cfg, a,
                                compare_cols=["v", "w"])
        M.write_column_manifest(rd.from_pandas(self._t()), cfg, b,
                                compare_cols=["v", "w"])
        M.write_column_manifest(
            rd.from_pandas(self._t(mutate_w=7)), cfg, c,
            compare_cols=["v", "w"])
        assert M.diff_column_manifests(a, b)["result"] == "success"
        d = M.diff_column_manifests(a, c)
        assert d["result"] == "failed" and d["dirtyColumns"] == ["w"]
        other = DigestConfig(key_columns=("k",), num_partitions=2,
                             buckets_per_partition=8)
        e = str(tmp_path / "e")
        M.write_column_manifest(rd.from_pandas(self._t()), other, e,
                                compare_cols=["v", "w"])
        with pytest.raises(ValueError):
            M.diff_column_manifests(a, e)

    def test_column_cdc_bridge(self, ray_session, tmp_path):
        """Debezium events -> column manifest update == re-fingerprint
        (per column, byte-for-byte)."""
        from opengauss_tools_datachecker_performance_ray.sources import (
            debezium,
        )

        cfg = DigestConfig(key_columns=("k",), num_partitions=4,
                           buckets_per_partition=8)
        t0 = self._t()
        d0, d1, dref = (str(tmp_path / x) for x in
                        ("base", "upd", "ref"))
        M.write_column_manifest(rd.from_pandas(t0), cfg, d0,
                                compare_cols=["v", "w"], table="t")
        v1 = int(t0.loc[t0["k"] == 1, "v"].iloc[0])
        w1 = t0.loc[t0["k"] == 1, "w"].iloc[0]
        ev = [json.dumps({"payload": {
            "before": {"k": "1", "v": str(v1), "w": w1},
            "after": {"k": "1", "v": str(v1 + 5), "w": w1},
            "source": {"table": "t"}, "op": "u", "ts_ms": 1}})]
        parse = debezium.make_event_parser(
            key_columns={"t": ["k"]}, value_columns=["k", "v", "w"],
            before_columns=["k", "v", "w"])
        parsed = parse(pa.table({"text": pa.array(ev,
                                                  pa.large_string())}))
        schema = pa.schema([("k", pa.int64()), ("v", pa.int64()),
                            ("w", pa.string())])
        M.update_column_manifest_from_changes(d0, parsed, schema,
                                              out_dir=d1)
        t1 = t0.copy()
        t1.loc[t1["k"] == 1, "v"] = v1 + 5
        M.write_column_manifest(rd.from_pandas(t1), cfg, dref,
                                compare_cols=["v", "w"], table="t")
        fa = pq.read_table(d1 + "/column_signatures.parquet") \
            .to_pandas().sort_values(["column", "part"]) \
            .reset_index(drop=True)
        fb = pq.read_table(dref + "/column_signatures.parquet") \
            .to_pandas().sort_values(["column", "part"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(fa, fb)


class TestReviewFindings:
    """Regression pins for the round-5 code-review findings."""

    def test_update_preserves_columns_guard(self, ray_session,
                                            tmp_path):
        """meta['columns'] must survive in-place updates — losing it
        disarms the projection/order guard on the NEXT update."""
        d = str(tmp_path / "man")
        M.write_manifest(rd.from_pandas(_table()), CFG, d)
        add1 = pa.table({"k": np.array([5000], np.int64),
                         "v": np.array([1], np.int64)})
        M.update_manifest(d, added=add1)
        _, _, meta = M.read_manifest(d)
        assert meta["columns"] == ["k", "v"]
        # second update with a pandas-index-polluted image: the guard
        # must still project (index column ignored, not hashed)
        df = pd.DataFrame({"k": [6000], "v": [2]}, index=[9])
        M.update_manifest(d, added=pa.Table.from_pandas(df))
        t1 = pd.concat([_table(),
                        pd.DataFrame({"k": [5000, 6000],
                                      "v": [1, 2]})],
                       ignore_index=True)
        assert M.verify_against_manifest(
            rd.from_pandas(t1), d)["result"] == "success"

    def test_delete_without_before_image_raises(self, ray_session,
                                                tmp_path):
        """'d' events are guarded too (not just 'u' — review
        finding)."""
        from opengauss_tools_datachecker_performance_ray.sources import (
            debezium,
        )

        d0 = str(tmp_path / "base")
        M.write_manifest(rd.from_pandas(_table(n=10)), CFG, d0)
        ev = [json.dumps({"payload": {
            "before": None, "after": None,
            "source": {"table": "t"}, "op": "d", "ts_ms": 1}})]
        parse = debezium.make_event_parser(
            key_columns={"t": ["k"]}, value_columns=["k", "v"],
            before_columns=["k", "v"])
        parsed = parse(pa.table({"text": pa.array(
            ev, pa.large_string())}))
        schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        with pytest.raises(Exception):
            # the tombstone has neither image: either the parser
            # drops it (data None) or the guard raises — silently
            # folding is the failure mode being pinned
            out = M.update_from_changes(d0, parsed, schema,
                                        out_dir=str(tmp_path / "x"))
            # if the parser dropped the un-parseable event, the
            # no-op result must equal the base manifest
            a, _, _ = M.read_manifest(str(tmp_path / "x"))
            b, _, _ = M.read_manifest(d0)
            assert list(a["root"]) == list(b["root"])
            raise RuntimeError("no-op fold (acceptable)")

    def test_null_column_in_present_before_image_ok(self, ray_session,
                                                    tmp_path):
        """A PRESENT before image with a genuinely-null column value
        must fold, not raise (has_before distinguishes the cases)."""
        from opengauss_tools_datachecker_performance_ray.sources import (
            debezium,
        )

        t0 = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                           "v": pd.array([None] + list(range(1, 10)),
                                         dtype="Int64")})
        d0, d1, dref = (str(tmp_path / x) for x in
                        ("base", "upd", "ref"))
        M.write_manifest(rd.from_pandas(t0), CFG, d0, table="t")
        ev = [json.dumps({"payload": {
            "before": {"k": "0", "v": None},
            "after": {"k": "0", "v": "42"},
            "source": {"table": "t"}, "op": "u", "ts_ms": 1}})]
        parse = debezium.make_event_parser(
            key_columns={"t": ["k"]}, value_columns=["k", "v"],
            before_columns=["k", "v"])
        parsed = parse(pa.table({"text": pa.array(
            ev, pa.large_string())}))
        schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        M.update_from_changes(d0, parsed, schema, out_dir=d1)
        t1 = t0.copy()
        t1.loc[t1["k"] == 0, "v"] = 42
        M.write_manifest(rd.from_pandas(t1), CFG, dref)
        a, _, _ = M.read_manifest(d1)
        b, _, _ = M.read_manifest(dref)
        assert list(a["root"]) == list(b["root"])

    def test_column_compare_no_float_coercion(self, ray_session):
        """One-sided rows must not degrade root equality to float64
        53-bit precision (false-clean hazard — review finding)."""
        B = 4
        base = np.uint64(2**63 + 5)
        near = np.uint64(2**63 + 6)  # same float64, different uint64
        assert float(base) == float(near)
        man = pd.DataFrame({
            "column": ["v", "v"], "part": [0, 1],
            "root": np.array([base, 7], np.uint64),
            "croot": np.array([1, 1], np.uint64),
            "leaves": [np.full(B, 1, np.uint64).tobytes()] * 2,
            "counts": [np.full(B, 1, np.int64).tobytes()] * 2,
        })
        live = pd.DataFrame({
            "column": ["v"], "part": [0],
            "root": np.array([near], np.uint64),
            "croot": np.array([1], np.uint64),
            "leaves": [np.full(B, 2, np.uint64).tobytes()],
            "counts": [np.full(B, 1, np.int64).tobytes()],
        })
        res = M._column_compare(man, live, B, "t")
        # part 0 differs (roots differ at full precision) AND part 1
        # is one-sided — both must be flagged
        assert res["result"] == "failed"
        parts = set(res["verdicts"]["part"])
        assert parts == {0, 1}

    def test_distributed_live_verify_route(self, ray_session,
                                           tmp_path):
        """Review finding: the live side must also have a scalar-only
        distributed route — verdicts identical to the driver route,
        clean and dirty."""
        d = str(tmp_path / "man")
        M.write_manifest(rd.from_pandas(_table()), CFG, d)
        for live_df in (_table(), _table(bump=1234)):
            a = M.verify_against_manifest(rd.from_pandas(live_df), d,
                                          distributed=False)
            b = M.verify_against_manifest(rd.from_pandas(live_df), d,
                                          distributed=True)
            assert a["result"] == b["result"]
            assert a["dirtyPartitions"] == b["dirtyPartitions"]
            assert a["diffBuckets"] == b["diffBuckets"]
            assert a["liveRows"] == b["liveRows"]
            pd.testing.assert_frame_equal(a["verdicts"],
                                          b["verdicts"])

    def test_refingerprint_replaces_stale_stores(self, ray_session,
                                                 tmp_path):
        """Review finding: re-fingerprinting the same dir must
        REPLACE the prior store in either layout (stale single file
        shadowed new shards; Ray write_parquet appends)."""
        import os

        d = str(tmp_path / "man")
        M.write_manifest(rd.from_pandas(_table()), CFG, d)
        # switch layouts: distributed re-fingerprint of a CHANGED table
        M.write_manifest(rd.from_pandas(_table(bump=3)), CFG, d,
                         distributed=True)
        assert not os.path.exists(os.path.join(d,
                                               "signatures.parquet"))
        res = M.verify_against_manifest(
            rd.from_pandas(_table(bump=3)), d)
        assert res["result"] == "success"  # NEW fingerprint governs
        # distributed -> distributed again must not append-duplicate
        M.write_manifest(rd.from_pandas(_table()), CFG, d,
                         distributed=True)
        sigs, _, meta = M.read_manifest(d)
        assert meta["n_rows"] == 2000
        assert sigs["part"].is_unique
        # and distributed -> driver layout clears the shard dir
        M.write_manifest(rd.from_pandas(_table()), CFG, d)
        assert not os.path.isdir(os.path.join(d, "signatures"))

    def test_multi_table_stream_filtered(self, ray_session, tmp_path):
        """Review finding: events for OTHER tables in the stream must
        not fold into this manifest."""
        from opengauss_tools_datachecker_performance_ray.sources import (
            debezium,
        )

        d0, d1 = str(tmp_path / "base"), str(tmp_path / "upd")
        M.write_manifest(rd.from_pandas(_table(n=10)), CFG, d0,
                         table="t")
        ev = [json.dumps({"payload": {
            "before": None, "after": {"k": "999", "v": "1"},
            "source": {"table": "OTHER"}, "op": "c", "ts_ms": 1}})]
        parse = debezium.make_event_parser(
            key_columns={"t": ["k"], "OTHER": ["k"]},
            value_columns=["k", "v"], before_columns=["k", "v"])
        parsed = parse(pa.table({"text": pa.array(
            ev, pa.large_string())}))
        schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        meta = M.update_from_changes(d0, parsed, schema, out_dir=d1)
        assert meta["n_rows"] == 10  # stranger's insert NOT folded
        assert M.verify_against_manifest(
            rd.from_pandas(_table(n=10)), d1)["result"] == "success"

    def test_insert_only_window_without_before_columns(
            self, ray_session, tmp_path):
        """Review finding: a pure-insert window parsed WITHOUT
        before_columns must fold (no b_ columns needed)."""
        from opengauss_tools_datachecker_performance_ray.sources import (
            debezium,
        )

        d0, d1 = str(tmp_path / "base"), str(tmp_path / "upd")
        M.write_manifest(rd.from_pandas(_table(n=10)), CFG, d0,
                         table="t")
        ev = [json.dumps({"payload": {
            "before": None, "after": {"k": "5000", "v": "7"},
            "source": {"table": "t"}, "op": "c", "ts_ms": 1}})]
        parse = debezium.make_event_parser(
            key_columns={"t": ["k"]}, value_columns=["k", "v"])
        parsed = parse(pa.table({"text": pa.array(
            ev, pa.large_string())}))
        schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
        meta = M.update_from_changes(d0, parsed, schema, out_dir=d1)
        assert meta["n_rows"] == 11

    def test_compare_columns_subset_images_ok(self, ray_session,
                                              tmp_path):
        """Review finding: with compare_columns set, CDC images need
        only keys + compare columns — extra fingerprint-time columns
        (never hashed) must not be demanded."""
        cfg = DigestConfig(key_columns=("k",), compare_columns=("v",),
                           num_partitions=4, buckets_per_partition=8)
        t0 = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                           "v": np.arange(20, dtype=np.int64),
                           "extra": ["x"] * 20})
        d0, d1 = str(tmp_path / "base"), str(tmp_path / "upd")
        M.write_manifest(rd.from_pandas(t0), cfg, d0, table="t")
        added = pa.table({"k": np.array([99], np.int64),
                          "v": np.array([1], np.int64)})  # no 'extra'
        meta = M.update_manifest(d0, added=added, out_dir=d1)
        assert meta["n_rows"] == 21
        t1 = pd.concat([t0, pd.DataFrame({"k": [99], "v": [1],
                                          "extra": ["y"]})],
                       ignore_index=True)
        assert M.verify_against_manifest(
            rd.from_pandas(t1), d1)["result"] == "success"

    def test_schema_dir_dotted_names_and_collisions(self, tmp_path):
        """Review finding: dotted DIRECTORY names are table names;
        file/dir collisions raise instead of silently shadowing."""
        d = tmp_path / "s"
        (d / "db.orders").mkdir(parents=True)
        (d / "db.users").mkdir()
        out = M._tables_in(str(d))
        assert set(out) == {"db.orders", "db.users"}
        pq.write_table(pa.table({"a": [1]}), str(d / "t.parquet"))
        (d / "t").mkdir()
        with pytest.raises(ValueError):
            M._tables_in(str(d))

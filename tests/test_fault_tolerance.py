"""Fault-injection: the engine's pipelines must survive worker loss.

At 256-node / 100 TB scale, worker crashes are routine; Ray retries
tasks whose worker died (system failure) by default, and application
exceptions when ``retry_exceptions`` is set. These tests kill a real
worker process mid-``map_batches`` (once, via an on-disk marker) and
assert the pipeline still returns the exact expected result.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestWorkerCrashRetry:
    def test_worker_death_retries_to_exact_result(self, ray_session,
                                                  tmp_path):
        """os._exit in a map task kills the worker process — a true
        crash, not a Python exception. Ray must reschedule the task and
        the digest-style sum must come out exact (no lost or doubled
        batch)."""
        import ray.data as rd

        marker = str(tmp_path / "crashed_once")

        def fn(batch: pa.Table) -> pa.Table:
            # exactly one task dies, exactly once across retries
            if not os.path.exists(marker) and batch.column(
                    "id")[0].as_py() == 0:
                with open(marker, "w") as f:
                    f.write("x")
                os._exit(1)
            return pa.table({
                "s": pa.array([pa.compute.sum(batch.column("id")).as_py()])
            })

        ds = rd.range(1000, override_num_blocks=8) \
            .map_batches(fn, batch_format="pyarrow", batch_size=None)
        total = sum(r["s"] for r in ds.take_all())
        assert total == 1000 * 999 // 2
        assert os.path.exists(marker)  # the crash really happened

    def test_app_exception_retries_with_retry_exceptions(self, ray_session,
                                                         tmp_path):
        """Transient application errors (e.g. storage hiccups) recover
        via retry_exceptions without poisoning the result."""
        import ray.data as rd

        marker = str(tmp_path / "raised_once")

        def flaky(batch: pd.DataFrame) -> pd.DataFrame:
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("x")
                raise IOError("transient storage failure (injected)")
            return pd.DataFrame({"n": [len(batch)]})

        ds = rd.range(400, override_num_blocks=4).map_batches(
            flaky, batch_format="pandas", batch_size=None,
            retry_exceptions=[IOError])
        assert sum(r["n"] for r in ds.take_all()) == 400
        assert os.path.exists(marker)

    def test_validation_pipeline_survives_worker_loss(self, ray_session,
                                                      tmp_path):
        """End-to-end: the flagship compare still produces a clean
        verdict when a worker dies during the digest pass. The kill is
        injected through the canonicalizer's own extension point-free
        path by wrapping the dataset read."""
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import (
            compare as cmp,
        )
        from opengauss_tools_datachecker_performance_ray.stages.digest import (
            DigestConfig,
        )

        df = pd.DataFrame({
            "k": np.arange(2000, dtype=np.int64),
            "v": np.arange(2000, dtype=np.int64) * 3,
        })
        marker = str(tmp_path / "killed_once")

        def maybe_die(batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("x")
                os._exit(1)
            return batch

        src = rd.from_pandas(df).repartition(4) \
            .map_batches(maybe_die, batch_format="pyarrow",
                         batch_size=None)
        snk = rd.from_pandas(df).repartition(4)
        cfg = DigestConfig.for_rows(("k",), len(df),
                                    partition_capacity=500)
        res = cmp.compare_tables(src, snk, cfg, table="faulty")
        assert res.summary["result"] == "success"
        assert len(res.violations) == 0
        assert os.path.exists(marker)


class TestNewOperatorCrashRecovery:
    def test_line_dedup_survives_worker_death(self, ray_session, tmp_path):
        """The dedup explode stage loses a worker once; retries must
        reproduce the exact rebuilt corpus (the tagged materialization
        and the loser groupby are deterministic, so a replayed task
        yields identical candidates/losers)."""
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.stages import dedup

        marker = str(tmp_path / "ld_crash")
        df = pd.DataFrame({
            "doc_id": np.arange(200, dtype=np.int64),
            "text": [f"shared line\nunique {i}" for i in range(200)],
        })

        def maybe_crash(batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker) \
                    and batch.column("doc_id")[0].as_py() == 0:
                with open(marker, "w") as f:
                    f.write("x")
                os._exit(1)
            return batch

        ds = rd.from_pandas(df).repartition(4) \
            .map_batches(maybe_crash, batch_format="pyarrow",
                         batch_size=None)
        out = dedup.line_dedup(ds, "doc_id", "text").to_pandas()
        assert os.path.exists(marker)
        got = dict(zip(out["doc_id"], out["text"]))
        assert got[0] == "shared line\nunique 0"
        assert all(got[i] == f"unique {i}" for i in range(1, 200))

    def test_bloom_build_survives_worker_death(self, ray_session,
                                               tmp_path):
        """A crash during the bloom position pass must not drop keys:
        a dropped block would create false negatives (missed parents)
        and wrong violations."""
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.functions import (
            bloom as bloomf,
        )

        marker = str(tmp_path / "bloom_crash")
        df = pd.DataFrame({"k": [f"key-{i}" for i in range(5000)]})

        def maybe_crash(batch: pa.Table) -> pa.Table:
            if not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("x")
                os._exit(1)
            return batch

        ds = rd.from_pandas(df).repartition(4) \
            .map_batches(maybe_crash, batch_format="pyarrow",
                         batch_size=None)
        f = bloomf.build_bloom(ds, "k", 5000)
        assert os.path.exists(marker)
        assert f.contains(np.array(df["k"], dtype=object)).all()


class TestDriverMemoryEnvelope:
    """Round-3 verdict #7: at beyond-driver-bound partition counts the
    distributed signature route must keep driver memory O(roots), not
    O(dense blobs). Runs a 16384-partition x 8192-bucket compare (dense
    leaves+counts would be ~4 GB if a regression ever collected them on
    the driver) in a FRESH subprocess and bounds its peak RSS."""

    SCRIPT = r"""
import json, resource, sys
import numpy as np, pandas as pd
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from opengauss_tools_datachecker_performance_ray.stages import compare as cmp
from opengauss_tools_datachecker_performance_ray.stages.digest import (
    DigestConfig,
)

n = 120_000
keys = np.arange(n, dtype=np.int64)
src = pd.DataFrame({"k": keys, "v": keys * 7})
snk = src.copy()
snk.loc[snk.index[1234], "v"] += 1  # one dirty partition to fetch
cfg = DigestConfig(key_columns=("k",), num_partitions=16384,
                   buckets_per_partition=8192)
res = cmp.compare_tables(rd.from_pandas(src).repartition(8),
                         rd.from_pandas(snk).repartition(8),
                         cfg, table="env")
rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(json.dumps({
    "rss_mb": rss_mb,
    "partitions": len(res.partitions),
    "updateTotal": res.summary["updateTotal"],
    "result": res.summary["result"],
}))
ray.shutdown()
"""

    def test_distributed_route_driver_rss_bounded(self):
        import json
        import subprocess
        import sys

        p = subprocess.run([sys.executable, "-c", self.SCRIPT],
                           capture_output=True, text=True, timeout=540)
        assert p.returncode == 0, p.stderr[-2000:]
        out = json.loads(p.stdout.strip().splitlines()[-1])
        assert out["updateTotal"] == 1
        assert out["result"] == "failed"
        assert out["partitions"] == 16384
        # blobs-if-collected ~ 16384 * 8192 * 16B = 2.1 GB per side;
        # the driver (ray + pandas + pyarrow baseline is ~400-700 MB)
        # must stay well under that counterfactual
        assert out["rss_mb"] < 1300, out["rss_mb"]

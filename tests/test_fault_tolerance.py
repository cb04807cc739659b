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

"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": seconds, "unit": "sec",
"queries": {name: sec}, "sf": ..., "num_cpus": N, "rows_per_sec": ...}.

``--scaling`` runs the headline pipeline in two fresh subprocesses at
RAY_GRAFT_CPUS=8 and 32 on the same input and reports both throughputs
plus scaling efficiency — the sandbox evidence protocol for the
BASELINE.json two-cluster-size criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from opengauss_tools_datachecker_performance_ray.pipelines import queries as q

    # warm the OS page cache so we measure compute+shuffle, not cold disk
    for t in ("orders", "lineitem", "documents", "events"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            with open(p, "rb") as f:
                while f.read(1 << 24):
                    pass

    def consume(res):
        if hasattr(res, "to_pandas") and hasattr(res, "count"):  # Dataset
            return res.count()
        return len(res)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    benches = {
        # headline: the flagship Merkle compare over the largest table
        "compare_orders_pair": q.compare_orders_pair,
        "uniqueness_lineitem": q.uniqueness_lineitem,
        "referential_events_smallparent": q.referential_events_smallparent,
        "stats_by_lang": q.stats_by_lang,
        "dedup_exact_documents": q.dedup_exact_documents,
        "token_stats_documents": q.token_stats_documents,
    }
    for name, fn in benches.items():
        t0 = time.time()
        res = fn(SF_DIR)
        rows[name] = consume(res)
        timings[name] = round(time.time() - t0, 3)

    # headline throughput: compared rows/sec for the flagship
    import pyarrow.parquet as pq

    n_orders = pq.ParquetFile(f"{SF_DIR}/orders.parquet").metadata.num_rows
    headline = timings["compare_orders_pair"]
    out = {
        "metric": "flagship_compare_sec",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows_per_sec": round(2 * n_orders / headline, 1),  # both sides digested
        "total_sec": round(sum(timings.values()), 3),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR)
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True, check=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(p.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    t_lo, t_hi = r_lo["total_sec"], r_hi["total_sec"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"total_sec_{lo}cpu": t_lo,
        f"total_sec_{hi}cpu": t_hi,
        f"queries_{lo}cpu": r_lo["queries"],
        f"queries_{hi}cpu": r_hi["queries"],
        "sf": SF_DIR,
        "note": (f"same job, fresh ray.init at num_cpus={lo} vs {hi}; "
                 f"efficiency=(T_lo/T_hi)/(hi/lo), 1.0 = linear"),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

"""4-vs-16 cpu scaling of the fused constraint-eval pass (the north
metric's "validated docs/sec" leg added in round 4).

Runs ``queries.rules_documents_scaled`` — N remapped copies of the
documents table through the single fused row-local rule scan
(null/domain/range/regex masks, per-lang integer partials) — in fresh
processes at 4 and 16 cpus on the same input, repeating each leg and
taking per-leg minima exactly like ``bench.run_scaling`` screens VM
wobble. Host-calibration probes bracket every trial so a reader can
see how contended the window was.

Usage: python tools/rules_scaling.py [--repeat 1024] [--trials 3]
Prints one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from opengauss_tools_datachecker_performance_ray.pipelines import queries as q
# untimed warmup run spins up workers and imports
q.rules_documents_scaled({sf!r}, repeat=32, mix={mix!r})
t0 = time.time()
q.rules_documents_scaled({sf!r}, repeat={repeat}, mix={mix!r})
print(json.dumps({{"sec": round(time.time() - t0, 3)}}))
ray.shutdown()
"""


def one(ncpu: int, repeat: int, mix: str) -> float:
    p = subprocess.run(
        [sys.executable, "-c",
         _CHILD.format(repo=REPO, ncpu=ncpu, sf=SF_DIR, repeat=repeat,
                       mix=mix)],
        capture_output=True, text=True, cwd=REPO, check=True)
    return json.loads(p.stdout.strip().splitlines()[-1])["sec"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=1024)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--mix", choices=("standard", "heavy"),
                    default="standard",
                    help="heavy = +4 full-text RE2 rules (compute-bound "
                         "point of the scaling curve)")
    args = ap.parse_args()

    cals = [bench.calibrate()]
    t4, t16 = [], []
    for _ in range(args.trials):
        t4.append(one(4, args.repeat, args.mix))
        t16.append(one(16, args.repeat, args.mix))
        cals.append(bench.calibrate())
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(
        f"{SF_DIR}/documents.parquet").metadata.num_rows * args.repeat
    b4, b16 = min(t4), min(t16)
    out = {
        "metric": "rule_eval_scaling_efficiency",
        "value": round((b4 / b16) / 4, 3),
        "unit": "ratio",
        "sec_4cpu": b4, "sec_16cpu": b16,
        "docs_per_sec_4cpu": round(n_docs / b4, 1),
        "docs_per_sec_16cpu": round(n_docs / b16, 1),
        "trials_4cpu": t4, "trials_16cpu": t16,
        "repeat": args.repeat, "sf": SF_DIR, "mix": args.mix,
        "host_calibration_sec": cals,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

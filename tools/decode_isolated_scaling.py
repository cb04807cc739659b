"""Decode-isolated 4-vs-16 scaling of the compare leg (round-3 #8).

The flagship compare's 4->16 cpu scaling efficiency sits at ~0.65 on
this box while a Ray-free multiprocessing control of the same digest
kernel tops out at 0.78 (memory-bandwidth ceiling, tools/mp_control.py).
This experiment attributes the gap: it pre-materializes the scaled
orders pair's DIGEST rows to parquet once, then — in fresh processes at
4 and 16 cpus — times ONLY the remaining compare leg (digest-parquet
read -> sparse signature partials -> driver XOR fold -> Merkle compare
-> classify of the one dirty bucket). The raw parquet decode and the
bandwidth-bound canonicalize+hash kernel are amortized out; if this
leg's efficiency reaches the ~0.78 mp-control ceiling, the flagship's
shortfall is the single-box memory-bandwidth physics of the digest
kernel, not a Ray or engine artifact.

Usage: python tools/decode_isolated_scaling.py [--repeat 64] [--trials 2]
Prints one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_digests(repeat: int, out_dir: str) -> None:
    """Write both sides' digest rows to parquet once (not timed)."""
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q,
    )
    from opengauss_tools_datachecker_performance_ray.stages import (
        digest as dg,
    )

    side = q._scaled_orders_side_builder(SF_DIR, repeat)
    n = q._num_rows(SF_DIR, "orders") * repeat
    cfg = dg.DigestConfig.for_rows(("o_orderkey",), n,
                                   partition_capacity=50_000,
                                   bucket_capacity=1024)

    from opengauss_tools_datachecker_performance_ray.functions import (
        canonical, hashing,
    )
    import numpy as np
    import pyarrow as pa

    def mutate_bucket0(batch: pa.Table) -> pa.Table:
        keys = canonical.key_column(batch, ["o_orderkey"])
        kh = hashing.hash64(keys)
        part, bucket = hashing.assign_buckets(kh, cfg.num_partitions,
                                              cfg.buckets_per_partition)
        hit = (bucket == 0) & (part == 0)
        price = batch.column("o_totalprice").to_numpy().copy()
        price[hit] += 1.0
        return batch.set_column(
            batch.schema.get_field_index("o_totalprice"),
            "o_totalprice", pa.array(price, pa.float64()))

    dg.digest_dataset(side(), cfg).write_parquet(f"{out_dir}/src")
    dg.digest_dataset(side(mutate_bucket0), cfg) \
        .write_parquet(f"{out_dir}/snk")
    with open(f"{out_dir}/cfg.json", "w") as f:
        json.dump({"num_partitions": cfg.num_partitions,
                   "buckets_per_partition": cfg.buckets_per_partition,
                   "rows": n}, f)
    ray.shutdown()


LEG_SCRIPT = r"""
import json, sys, time
import ray
ncpu, digest_dir = int(sys.argv[1]), sys.argv[2]
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")
import ray.data as rd
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from opengauss_tools_datachecker_performance_ray.stages import compare as cmp
from opengauss_tools_datachecker_performance_ray.stages.digest import (
    DigestConfig,
)
meta = json.load(open(f"{digest_dir}/cfg.json"))
cfg = DigestConfig(key_columns=("o_orderkey",),
                   num_partitions=meta["num_partitions"],
                   buckets_per_partition=meta["buckets_per_partition"])

def leg():
    src = rd.read_parquet(f"{digest_dir}/src")
    snk = rd.read_parquet(f"{digest_dir}/snk")
    B = cfg.buckets_per_partition
    ptab_s = cmp._collect_arrow(src.map_batches(
        cmp.make_signature_partials_fn(cfg), batch_format="pyarrow"))
    ptab_k = cmp._collect_arrow(snk.map_batches(
        cmp.make_signature_partials_fn(cfg), batch_format="pyarrow"))
    src_sigs = cmp._merge_signature_partials(ptab_s, B)
    snk_sigs = cmp._merge_signature_partials(ptab_k, B)
    diffs = cmp.compare_signatures(src_sigs, snk_sigs, cfg)
    est = cmp.estimate_diff_rows(src_sigs, snk_sigs, diffs, B)
    vio = cmp.classify_differences(
        rd.read_parquet(f"{digest_dir}/src"),
        rd.read_parquet(f"{digest_dir}/snk"), diffs, cfg, est_rows=est)
    v = cmp.to_violation_frame(vio)
    return len(v)

leg()  # warm run: worker spin-up + page cache, untimed
t0 = time.time()
nv = leg()
dt = time.time() - t0
print(json.dumps({"ncpu": ncpu, "sec": round(dt, 3), "violations": nv}))
ray.shutdown()
"""


def run_leg(ncpu: int, digest_dir: str) -> dict:
    p = subprocess.run([sys.executable, "-c", LEG_SCRIPT, str(ncpu),
                        digest_dir], capture_output=True, text=True,
                       cwd=REPO, check=True)
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=64)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--dir", default="/tmp/graft_digest_parquet")
    args = ap.parse_args()

    import bench

    if not os.path.exists(f"{args.dir}/cfg.json"):
        build_digests(args.repeat, args.dir)
    cal0 = bench.calibrate()
    legs = {4: [], 16: []}
    for _ in range(args.trials):
        for ncpu in (4, 16):
            legs[ncpu].append(run_leg(ncpu, args.dir))
    cal1 = bench.calibrate()
    t4 = min(r["sec"] for r in legs[4])
    t16 = min(r["sec"] for r in legs[16])
    print(json.dumps({
        "metric": "compare_leg_decode_isolated_scaling",
        "value": round((t4 / t16) / 4.0, 3),
        "unit": "ratio",
        "sec_4cpu": t4, "sec_16cpu": t16,
        "violations": legs[16][-1]["violations"],
        "repeat": args.repeat, "sf": SF_DIR,
        "host_calibration_sec": [cal0, cal1],
        "note": ("signature+merkle+classify from pre-materialized digest "
                 "parquet (raw decode + hash kernel amortized out); min "
                 f"of {args.trials} trials per level, warm-run discarded"),
    }))


if __name__ == "__main__":
    main()

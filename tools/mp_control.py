"""Ray-free scaling control for the digest kernel (BASELINE.md).

Runs the EXACT per-task work of the compare pipeline's digest scan
(parquet decode + key canonicalize/hash + row digest) in a plain
multiprocessing pool at two process counts. If this scales and the
Ray pipeline doesn't, the gap is scheduling/contention under Ray on
one box — not the engine's kernel. Usage:

    python tools/mp_control.py 4 256
    python tools/mp_control.py 16 256
"""

import multiprocessing as mp
import os
import sys
import time

import pyarrow.parquet as pq

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def work(i):
    from opengauss_tools_datachecker_performance_ray.functions import (
        canonical, hashing,
    )
    from opengauss_tools_datachecker_performance_ray.functions.runtime import (
        pin_worker_threads,
    )

    pin_worker_threads()
    t = pq.read_table(f"{SF_DIR}/orders.parquet", use_threads=False,
                      read_dictionary=["o_orderstatus", "o_orderpriority"])
    keys = canonical.key_column(t, ["o_orderkey"])
    hashing.hash64(keys)
    hashing.row_hash(t)
    return t.num_rows


if __name__ == "__main__":
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tasks = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    with mp.Pool(nproc) as p:
        p.map(work, range(nproc))  # warm: page cache + imports
        t0 = time.time()
        rows = sum(p.map(work, range(tasks)))
        dt = time.time() - t0
    print(f"{nproc} procs: {rows / dt / 1e6:.2f}M rows/s "
          f"({dt:.2f}s, {tasks} tasks)")

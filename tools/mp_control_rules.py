"""Ray-free scaling control for the rule-eval kernels (BASELINE.md).

Runs the EXACT per-task work of ``rules_documents_scaled`` — parquet
decode + the fused row-local rule masks + per-lang partials — in a
plain multiprocessing pool at two process counts, for either rule mix
(``standard`` = the bandwidth-bound bench six, ``heavy`` = the 4
compute-bound full-text RE2 rules). If the control and the Ray
pipeline plateau together, the ceiling is single-box physics (memory
bandwidth for the standard mix), not the engine. Usage:

    python tools/mp_control_rules.py 4 256 heavy
    python tools/mp_control_rules.py 16 256 heavy
"""

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
MIX = "standard"


def work(copies):
    import pyarrow.parquet as pq

    from opengauss_tools_datachecker_performance_ray.functions.runtime import (
        pin_worker_threads,
    )
    from opengauss_tools_datachecker_performance_ray.pipelines import (
        queries as q,
        rules as rulesmod,
    )

    pin_worker_threads()
    rules = (q._bench_doc_rules_heavy() if MIX == "heavy"
             else q._bench_doc_rules())
    t = pq.read_table(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "lang", "n_chars", "source"],
        use_threads=False)
    for _ in range(copies):
        rulesmod.row_local_partials(t, rules, "lang")
    return t.num_rows * copies


def _init(mix):
    global MIX
    MIX = mix
    if REPO not in sys.path:  # spawn-start safety
        sys.path.insert(0, REPO)


if __name__ == "__main__":
    nproc = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    mix = sys.argv[3] if len(sys.argv) > 3 else "standard"
    copies_per_task = 8
    tasks = max(1, total // copies_per_task)
    with mp.Pool(nproc, initializer=_init, initargs=(mix,)) as p:
        p.map(work, [1] * nproc)  # warm: page cache + imports
        t0 = time.time()
        rows = sum(p.map(work, [copies_per_task] * tasks))
        dt = time.time() - t0
    print(f"{nproc} procs ({mix}): {rows / dt / 1e6:.2f}M docs/s "
          f"({dt:.2f}s, {tasks} tasks x {copies_per_task} copies)")

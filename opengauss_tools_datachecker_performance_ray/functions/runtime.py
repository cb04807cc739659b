"""Worker-side runtime knobs.

pyarrow keeps a GLOBAL thread pool sized to the machine's logical CPUs
— independent of Ray's ``num_cpus`` accounting. A Ray worker running an
Arrow kernel (cast, take, parquet read) therefore fans out to 32
threads even when Ray scheduled it as a 1-CPU task; with 16 concurrent
workers that is 512 runnable threads and throughput *drops* as workers
are added. Every hot map function calls :func:`pin_worker_threads`
first (idempotent, nanoseconds after the first call) so each task uses
exactly the CPU it was scheduled for.
"""

from __future__ import annotations

_pinned = False


def pin_worker_threads(n: int = 1) -> None:
    global _pinned
    if _pinned:
        return
    import pyarrow as pa

    pa.set_cpu_count(n)
    pa.set_io_thread_count(max(2, n))
    try:
        import numexpr

        numexpr.set_num_threads(n)
    except ImportError:
        pass
    _pinned = True

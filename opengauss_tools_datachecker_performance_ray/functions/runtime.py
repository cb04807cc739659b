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
_patched_http_check = False


def patch_ray_thread_import_race() -> None:
    """Guard Ray's lazy fsspec-HTTP check against a thread-import race.

    ``ray.data.datasource.path_util._is_http_filesystem`` imports
    ``fsspec.implementations.http`` per call and catches only
    ``ModuleNotFoundError`` (aiohttp absent here). When several driver
    threads resolve paths concurrently (inter-table parallelism), the
    failed import can surface as a bare ``ImportError`` ("cannot import
    name HTTPFileSystem") from a partially-registered module, which Ray
    does not catch. Wrap it to treat any ImportError as "not HTTP".
    Idempotent; no-op if Ray's internals move.
    """
    global _patched_http_check
    if _patched_http_check:
        return
    try:
        from ray.data.datasource import path_util as _pu

        orig = _pu._is_http_filesystem

        def _safe(fs):
            try:
                return orig(fs)
            except ImportError:
                return False

        _pu._is_http_filesystem = _safe
    except Exception:
        pass
    _patched_http_check = True


def run_concurrently(*thunks):
    """Run driver-side thunks in parallel threads and return their
    results in order. Concurrent Ray Data executions from one driver
    share the streaming executor's resource scheduler — the pattern
    that replaced union-based side pairing (measured in
    stages/compare.py). Applies the fsspec import-race guard first."""
    from concurrent.futures import ThreadPoolExecutor

    patch_ray_thread_import_race()
    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return [f.result() for f in futures]


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

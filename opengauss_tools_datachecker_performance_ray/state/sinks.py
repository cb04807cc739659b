"""Resumable partitioned Parquet sink.

Output layout per the build brief ("Resumable output"): one directory
per partition key value, each written atomically (tmp dir + rename)
with a ``_SUCCESS`` marker; a re-run skips partitions whose marker
exists. Never one giant file; never a half-written partition visible.
"""

from __future__ import annotations

import os
import shutil


def partition_done(out_dir: str, value) -> bool:
    return os.path.exists(os.path.join(out_dir, f"part={value}", "_SUCCESS"))


def pending_partitions(out_dir: str, values: list) -> list:
    return [v for v in values if not partition_done(out_dir, v)]


def write_partitioned(ds, out_dir: str, partition_col: str,
                      values: list | None = None) -> dict:
    """Write ``ds`` as one parquet directory per ``partition_col``
    value, skipping already-receipted partitions.

    ``values``: the full partition-value list (computed from metadata
    or config; pass it so resume can enumerate without scanning). When
    None it is discovered with ``ds.unique`` (one extra pass).
    Returns {written: [...], skipped: [...]}.
    """
    if values is None:
        values = sorted(ds.unique(partition_col))
    todo = pending_partitions(out_dir, values)
    skipped = [v for v in values if v not in todo]
    os.makedirs(out_dir, exist_ok=True)
    for v in todo:
        final = os.path.join(out_dir, f"part={v}")
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        sub = ds.filter(expr=f"{partition_col} == {v!r}")
        sub.write_parquet(tmp)
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("")
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
    return {"written": todo, "skipped": skipped}


def read_partitioned(out_dir: str):
    """Read back every completed partition as one Dataset."""
    import glob

    import ray.data as rd

    parts = sorted(glob.glob(os.path.join(out_dir, "part=*")))
    done = [p for p in parts if os.path.exists(os.path.join(p, "_SUCCESS"))]
    files = []
    for p in done:
        files.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
    return rd.read_parquet(files)

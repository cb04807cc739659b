"""Portable digest manifests — fingerprint a table ONCE, verify any
later copy against the manifest, no second live side needed.

The reference always compares two LIVE databases
(`check/slice/SliceCheckWorker.java` holds both sides' buckets in
memory); a manifest decouples the sides in time: write the
per-partition Merkle signatures of today's table to parquet (a few
hundred bytes per partition — ~100 MB for a 10^6-partition, 10^12-row
table), and any future run verifies a copy/migration/restore against
that file alone. Verification semantics are EXACTLY the live
compare's scalar pass (`compare.compare_signatures`: rows + root +
count-root per partition, dense leaves fetched only for dirty
partitions), so a manifest verdict equals the live pair verdict at
partition/bucket granularity — row-level classification needs the
other side's rows by definition and is out of scope here
(`pipelines/incremental.py` re-extracts for that).

Format: `signatures.parquet` (part, rows, root, croot, leaves,
counts — roots as the uint64 bit pattern stored in int64) plus
`manifest.json` (the DigestConfig alignment invariant + table name +
row total). The JSON carries everything needed to re-digest the live
side identically — key columns, partition/bucket geometry; a verify
with a drifted config fails loudly instead of comparing garbage.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .digest import DigestConfig, digest_dataset
from . import compare as cmp

MANIFEST_VERSION = 1


def write_manifest(ds, cfg: DigestConfig, out_dir: str,
                   table: str = "table",
                   batch_size: int | None = None) -> dict:
    """Digest ``ds`` with ``cfg`` (ONE fused streaming scan — the
    flagship signature path) and persist the per-partition signature
    frame + config under ``out_dir``. Returns the summary dict."""
    sigs = cmp.partition_signatures(
        digest_dataset(ds, cfg, batch_size), cfg)
    os.makedirs(out_dir, exist_ok=True)
    n_rows = int(sigs["rows"].sum()) if len(sigs) else 0
    t = pa.table({
        "part": pa.array(sigs["part"].to_numpy(np.int64)),
        "rows": pa.array(sigs["rows"].to_numpy(np.int64)),
        "root": pa.array(sigs["root"].to_numpy(np.uint64)
                         .view(np.int64)),
        "croot": pa.array(sigs["croot"].to_numpy(np.uint64)
                          .view(np.int64)),
        "leaves": pa.array(list(sigs["leaves"]), pa.binary()),
        "counts": pa.array(list(sigs["counts"]), pa.binary()),
    })
    tmp = os.path.join(out_dir, "signatures.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(out_dir, "signatures.parquet"))
    meta = {
        "version": MANIFEST_VERSION,
        "table": table,
        "n_rows": n_rows,
        "key_columns": list(cfg.key_columns),
        "compare_columns": (list(cfg.compare_columns)
                            if cfg.compare_columns else None),
        "num_partitions": cfg.num_partitions,
        "buckets_per_partition": cfg.buckets_per_partition,
    }
    mtmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(meta, f)
    os.replace(mtmp, os.path.join(out_dir, "manifest.json"))
    return meta


def read_manifest(out_dir: str) -> tuple[pd.DataFrame, DigestConfig,
                                         dict]:
    """Load (signature frame, DigestConfig, meta) from a manifest
    directory; raises on version drift."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        meta = json.load(f)
    if meta.get("version") != MANIFEST_VERSION:
        raise ValueError(f"manifest version {meta.get('version')} != "
                         f"{MANIFEST_VERSION}")
    t = pq.read_table(os.path.join(out_dir, "signatures.parquet"))
    sigs = pd.DataFrame({
        "part": t.column("part").to_numpy(),
        "rows": t.column("rows").to_numpy(),
        "root": t.column("root").to_numpy().view(np.uint64),
        "croot": t.column("croot").to_numpy().view(np.uint64),
        "leaves": t.column("leaves").to_pylist(),
        "counts": t.column("counts").to_pylist(),
    })
    cfg = DigestConfig(
        key_columns=tuple(meta["key_columns"]),
        compare_columns=(tuple(meta["compare_columns"])
                         if meta["compare_columns"] else None),
        num_partitions=meta["num_partitions"],
        buckets_per_partition=meta["buckets_per_partition"])
    return sigs, cfg, meta


def verify_against_manifest(ds, manifest_dir: str,
                            batch_size: int | None = None) -> dict:
    """Digest the LIVE dataset with the manifest's own config and run
    the scalar Merkle compare against the stored signatures. Returns
    ``{"result", "table", "partitions", "dirtyPartitions",
    "diffBuckets", "manifestRows", "liveRows", "verdicts"}`` where
    ``verdicts`` is one row per DIRTY partition (part, manifest_rows,
    live_rows, n_diff_buckets) — clean runs carry an empty frame."""
    man_sigs, cfg, meta = read_manifest(manifest_dir)
    live = cmp.partition_signatures(
        digest_dataset(ds, cfg, batch_size), cfg)
    diffs = cmp.compare_signatures(man_sigs, live, cfg)
    dirty = [d for d in diffs if len(d.diff_buckets)
             or d.src_rows != d.snk_rows]
    verdicts = pd.DataFrame(
        [{"part": d.part, "manifest_rows": d.src_rows,
          "live_rows": d.snk_rows,
          "n_diff_buckets": int(len(d.diff_buckets))}
         for d in dirty],
        columns=["part", "manifest_rows", "live_rows",
                 "n_diff_buckets"]).astype(
        {"part": np.int64, "manifest_rows": np.int64,
         "live_rows": np.int64, "n_diff_buckets": np.int64})
    live_rows = int(live["rows"].sum()) if len(live) else 0
    return {
        "result": "success" if not dirty else "failed",
        "table": meta["table"],
        "partitions": cfg.num_partitions,
        "dirtyPartitions": len(dirty),
        "diffBuckets": int(sum(len(d.diff_buckets) for d in dirty)),
        "manifestRows": meta["n_rows"],
        "liveRows": live_rows,
        "verdicts": verdicts,
    }

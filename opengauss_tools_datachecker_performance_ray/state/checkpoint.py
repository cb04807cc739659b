"""Per-partition checkpoint receipts for resumable runs.

North-rule requirement (stronger than the reference, which only logs
per-slice completion — ``common/service/ProcessLogService.java`` — and
re-runs FULL mode from scratch on restart): persist each partition's
merged signature leaves, Merkle root, row count and lineage (input
fingerprint + digest config) as a receipt; a re-run with the same
lineage skips the signature scan for receipted partitions and goes
straight to the driver-side Merkle compare.

Receipts are small JSON+binary files keyed by (run_id, side, part) —
one per partition, written atomically (tmp + rename) so a crashed
writer never leaves a half receipt.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import numpy as np
import pandas as pd


def lineage_id(paths: list[str], cfg_desc: str) -> str:
    """Deterministic fingerprint of (input files + size/mtime + config).

    If any input file or the digest config changes, receipts are
    invalidated naturally because the lineage id changes.
    """
    h = hashlib.sha256()
    h.update(cfg_desc.encode())
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


class CheckpointStore:
    def __init__(self, base_dir: str, lineage: str):
        self.dir = os.path.join(base_dir, lineage)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, side: str) -> str:
        return os.path.join(self.dir, f"signatures_{side}.npz")

    def save_signatures(self, side: str, sigs: pd.DataFrame,
                        metrics: dict[str, Any] | None = None) -> None:
        """Persist the per-partition signature frame for one side.

        Sparse frames (the distributed route: dense blobs present only
        for partitions that differed) store the blob rows separately,
        indexed by partition id, so receipt size also scales with the
        diff count."""
        tmp = self._path(side) + ".tmp"
        has_blob = [i for i, b in enumerate(sigs["leaves"])
                    if b is not None] if len(sigs) else []
        np.savez_compressed(
            tmp,
            part=sigs["part"].to_numpy(np.int64),
            rows=sigs["rows"].to_numpy(np.int64),
            root=sigs["root"].to_numpy(np.uint64),
            croot=(sigs["croot"].to_numpy(np.uint64)
                   if "croot" in sigs.columns and len(sigs)
                   else np.empty(0, dtype=np.uint64)),
            blob_part=sigs["part"].to_numpy(np.int64)[has_blob]
            if len(sigs) else np.empty(0, dtype=np.int64),
            leaves=np.stack([np.frombuffer(sigs["leaves"].iloc[i],
                                           dtype=np.uint64)
                             for i in has_blob])
            if has_blob else np.empty((0, 0), dtype=np.uint64),
            counts=np.stack([np.frombuffer(sigs["counts"].iloc[i],
                                           dtype=np.int64)
                             for i in has_blob])
            if has_blob else np.empty((0, 0), dtype=np.int64),
        )
        # numpy appends .npz to the tmp name
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                   self._path(side))
        if metrics is not None:
            with open(os.path.join(self.dir, f"metrics_{side}.json"), "w") as f:
                json.dump(metrics, f, default=str)

    def load_signatures(self, side: str) -> pd.DataFrame | None:
        path = self._path(side)
        if not os.path.exists(path):
            return None
        z = np.load(path)
        if "croot" not in z.files or (len(z["part"]) and not z["croot"].size):
            return None  # pre-croot receipt format: recompute
        n = len(z["part"])
        blob_of = {int(p): i for i, p in enumerate(z["blob_part"])}
        leaves = z["leaves"]
        counts = z["counts"]
        return pd.DataFrame({
            "part": z["part"].astype(int),
            "rows": z["rows"].astype(int),
            "root": z["root"],
            "croot": z["croot"],
            "leaves": [leaves[blob_of[int(p)]].tobytes()
                       if int(p) in blob_of else None for p in z["part"]],
            "counts": [counts[blob_of[int(p)]].tobytes()
                       if int(p) in blob_of else None for p in z["part"]],
        }) if n else pd.DataFrame(
            columns=["part", "rows", "root", "croot", "leaves", "counts"])

    def save_verdicts(self, verdicts: list[dict[str, Any]]) -> None:
        tmp = os.path.join(self.dir, "verdicts.json.tmp")
        with open(tmp, "w") as f:
            json.dump(verdicts, f, default=str)
        os.replace(tmp, os.path.join(self.dir, "verdicts.json"))

    def load_verdicts(self) -> list[dict[str, Any]] | None:
        path = os.path.join(self.dir, "verdicts.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

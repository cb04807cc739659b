"""Column-profile stage: per-column stats sketches over a Dataset.

North-rule extension (the reference has no column statistics —
SURVEY.md §2.5): per batch, compute a mergeable partial profile per
column — exact count / null count / min / max / numeric sum+sumsq,
HLL distinct sketch, t-digest quantile sketch (numeric), capped
categorical counter (strings) — then merge the partials on the driver
(one partial per batch; merge cost is independent of row count).

No shuffle at all: the only data movement is one small pickled partial
per batch. Exact-SQL-matchable aggregates (count/nulls/min/max/sum)
come out exact; distinct and quantiles are sketch-approximate with
documented error (HLL p=14 ~0.8%, t-digest delta=200).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing
from ..functions.sketches import HLL, TDigest, TopCounter


@dataclass
class ColumnProfile:
    """Mergeable per-column partial profile."""

    name: str
    dtype: str
    count: int = 0
    nulls: int = 0
    vmin: Any = None
    vmax: Any = None
    total: float = 0.0
    total_sq: float = 0.0
    hll: HLL = field(default_factory=lambda: HLL(p=14))
    tdigest: TDigest | None = None
    topk: TopCounter | None = None

    def merge(self, other: "ColumnProfile") -> "ColumnProfile":
        out = ColumnProfile(self.name, self.dtype)
        out.count = self.count + other.count
        out.nulls = self.nulls + other.nulls
        out.vmin = _nmin(self.vmin, other.vmin)
        out.vmax = _nmax(self.vmax, other.vmax)
        out.total = self.total + other.total
        out.total_sq = self.total_sq + other.total_sq
        out.hll = self.hll.merge(other.hll)
        if self.tdigest is not None and other.tdigest is not None:
            out.tdigest = self.tdigest.merge(other.tdigest)
        else:
            out.tdigest = self.tdigest or other.tdigest
        if self.topk is not None and other.topk is not None:
            out.topk = self.topk.merge(other.topk)
        else:
            out.topk = self.topk or other.topk
        return out

    @staticmethod
    def merge_many(profiles: "list[ColumnProfile]") -> "ColumnProfile":
        """Bulk fold: one t-digest compression and one register
        reduction over ALL inputs — the 10^4-group global-baseline fold
        in ``drift_by_group`` pays O(total state) once instead of one
        pairwise merge (each with its own compression) per group."""
        first = profiles[0]
        out = ColumnProfile(first.name, first.dtype)
        out.count = sum(p.count for p in profiles)
        out.nulls = sum(p.nulls for p in profiles)
        for p in profiles:
            out.vmin = _nmin(out.vmin, p.vmin)
            out.vmax = _nmax(out.vmax, p.vmax)
        out.total = sum(p.total for p in profiles)
        out.total_sq = sum(p.total_sq for p in profiles)
        out.hll = HLL(first.hll.p, np.maximum.reduce(
            [p.hll.registers for p in profiles]))
        out.tdigest = TDigest.merge_many(
            [p.tdigest for p in profiles])
        topks = [p.topk for p in profiles if p.topk is not None]
        for t in topks:
            out.topk = t if out.topk is None else out.topk.merge(t)
        return out

    def to_row(self) -> dict[str, Any]:
        nn = self.count - self.nulls
        return {
            "column": self.name,
            "dtype": self.dtype,
            "cnt": self.count,
            "nulls": self.nulls,
            "null_rate": self.nulls / self.count if self.count else 0.0,
            "vmin": self.vmin,
            "vmax": self.vmax,
            "mean": self.total / nn if nn else None,
            "distinct_approx": round(self.hll.estimate()),
            "p50": self.tdigest.quantile(0.5) if self.tdigest else None,
            "p95": self.tdigest.quantile(0.95) if self.tdigest else None,
            "p99": self.tdigest.quantile(0.99) if self.tdigest else None,
        }


def _nmin(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return min(a, b)


def _nmax(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return max(a, b)


def profile_batch(batch: pa.Table, columns: list[str] | None = None,
                  topk_cap: int = 1000) -> dict[str, ColumnProfile]:
    cols = columns or batch.column_names
    out: dict[str, ColumnProfile] = {}
    for name in cols:
        arr = batch.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        t = arr.type
        p = ColumnProfile(name, str(t))
        p.count = len(arr)
        p.nulls = arr.null_count
        valid = arr.drop_null()
        if len(valid) == 0:
            out[name] = p
            continue
        is_num = (pa.types.is_integer(t) or pa.types.is_floating(t)
                  or pa.types.is_decimal(t))
        is_ts = pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t)
        is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
        if is_num or is_ts or is_str:
            mm = pc.min_max(valid)
            p.vmin, p.vmax = mm["min"].as_py(), mm["max"].as_py()
        if is_num:
            v = valid.cast(pa.float64()).to_numpy()
            p.total = float(v.sum())
            p.total_sq = float((v * v).sum())
            p.tdigest = TDigest()
            p.tdigest.add(v)
            p.hll.add_hashes(hashing.hash64(valid.cast(pa.string())))
        elif is_str:
            p.hll.add_hashes(hashing.hash64(valid))
            vc = valid.value_counts()
            if len(vc) <= topk_cap * 4:
                p.topk = TopCounter(cap=topk_cap)
                p.topk.add(vc.field("values").to_numpy(zero_copy_only=False),
                           vc.field("counts").to_numpy())
        elif is_ts:
            iv = valid.cast(pa.int64()) if not pa.types.is_date32(t) \
                else valid.cast(pa.int32()).cast(pa.int64())
            p.hll.add_hashes(hashing.hash64(iv.cast(pa.string())))
            p.tdigest = TDigest()
            p.tdigest.add(iv.to_numpy().astype(np.float64))
        out[name] = p
    return out


def make_profile_partials_fn(columns: list[str] | None = None):
    """map_batches fn: batch -> one row holding the pickled partials."""

    def partials(batch: pa.Table) -> pa.Table:
        profs = profile_batch(batch, columns)
        return pa.table({"partial": pa.array([pickle.dumps(profs)],
                                             type=pa.large_binary())})

    return partials


def merge_partials(rows: list[bytes]) -> dict[str, ColumnProfile]:
    merged: dict[str, ColumnProfile] = {}
    for blob in rows:
        profs: dict[str, ColumnProfile] = pickle.loads(blob)
        for name, p in profs.items():
            merged[name] = merged[name].merge(p) if name in merged else p
    return merged


class SketchMerger:
    """Actor-pool sketch-merge stage (the north-star's 'sketch-merge
    stages run on actor pools'): each actor folds many pickled partial
    profiles into one per batch — a tree-reduce level that bounds what
    reaches the driver to ~one partial per merge batch instead of one
    per input batch. State (nothing heavy here, but the pattern is the
    point) initializes once per actor."""

    def __init__(self):
        self._merged = 0  # per-actor fold counter (observability)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("partial").to_pylist()
        merged = merge_partials(blobs)
        self._merged += len(blobs)
        return pa.table({"partial": pa.array([pickle.dumps(merged)],
                                             type=pa.large_binary())})


def profile_dataset(ds, columns: list[str] | None = None,
                    batch_size: int | None = 65536,
                    merge_concurrency: int | None = None
                    ) -> dict[str, ColumnProfile]:
    """Dataset -> merged per-column profiles (driver-side dict).

    One partial per batch streams back; merging is O(batches), not
    O(rows) — this is the sketch-merge tree of SURVEY.md §2.5 A-ext.
    For very large inputs pass ``merge_concurrency`` to insert an
    actor-pool tree-merge level (``SketchMerger``) so the driver folds
    ~one partial per 64 input batches instead of one per batch.
    """
    partials = ds.map_batches(make_profile_partials_fn(columns),
                              batch_format="pyarrow", batch_size=batch_size)
    if merge_concurrency:
        partials = partials.map_batches(
            SketchMerger, batch_format="pyarrow", batch_size=64,
            concurrency=merge_concurrency, num_cpus=1)
    blobs = [r["partial"] for r in partials.take_all()]
    return merge_partials(blobs)


def profile_frame(profiles: dict[str, ColumnProfile]) -> pd.DataFrame:
    return pd.DataFrame([p.to_row() for p in profiles.values()])

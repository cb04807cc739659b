"""Merkle-pruned table-pair compare over digest Datasets.

Ray-Data-native re-expression of the reference's check path
(``check/slice/SliceCheckWorker.java:115-307``): per-partition hash
buckets carry an order-independent XOR signature
(``check/modules/bucket/Bucket.java:84-87``); a Merkle tree per
partition prunes equal subtrees so only differing buckets pay the
row-level full-outer-join compare; surviving differences are
classified exactly as the reference does — ``insert`` = key only in
source, ``delete`` = key only in sink, ``update`` = same key,
different value hash (``SliceCheckWorker.java:263-289``).

Dataflow (all sizes are digest rows, a few dozen bytes each — the wide
input rows never shuffle):

  digests(src), digests(snk)            [materialized once, reused twice]
    -> map_batches: sparse per-batch (part, bucket, xor, cnt) partials
    -> groupby(part): dense leaf arrays + Merkle root per partition
    -> driver: root compare, descend only into differing partitions
    -> filter digests to differing (part, bucket) pairs  [tiny subset]
    -> groupby(part): pandas full outer join on key -> violations

At 10^12 rows the partial-signature shuffle is the only all-to-all
exchange and it moves ~2% of the input bytes; the clean-partition case
costs one scan + one small shuffle and no join at all.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing, merkle
from .digest import DigestConfig, digest_dataset

# Display caps, mirroring CheckResultConstants.MAX_DISPLAY_SIZE = 100
# (check/modules/check/CheckResultConstants.java:34).
MAX_DISPLAY_KEYS = 100

# Canonical signature-frame schema. ``croot`` is the Merkle root over
# the per-bucket COUNT blob — a partition is provably clean iff
# (rows, root, croot) all match, so the distributed route can decide
# clean/dirty from these three scalars alone and fetch the dense
# ``leaves``/``counts`` blobs ONLY for dirty partitions (sparse
# frames: clean rows carry None blobs).
SIG_COLUMNS = ["part", "rows", "root", "croot", "leaves", "counts"]

_EMPTY_I64 = np.empty(0, dtype=np.int64)

# root/croot of an all-empty partition, per bucket count (tiny cache).
_EMPTY_ROOTS: dict[int, int] = {}


def _empty_root(B: int) -> int:
    r = _EMPTY_ROOTS.get(B)
    if r is None:
        r = merkle.merkle_root(np.zeros(B, dtype=np.uint64))
        _EMPTY_ROOTS[B] = r
    return r


def empty_sig_frame() -> pd.DataFrame:
    return pd.DataFrame(columns=SIG_COLUMNS)


# --------------------------------------------------------------------------
# Stage 1: per-batch sparse signature partials (inside map_batches)
# --------------------------------------------------------------------------

def _xor_count_by_gid(gid: np.ndarray, vhash: np.ndarray,
                      cnt: np.ndarray | None = None
                      ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Group (gid -> XOR(vhash), sum(cnt)); cnt=None means count rows.

    polars' hash groupby with the native ``bitwise_xor`` aggregation is
    ~3x the numpy sort+reduceat path on bench-shaped batches (600k rows
    into ~50k buckets: 16 ms vs 53 ms single-threaded) and allocates no
    row-length temporaries — this function sits inside the fused digest
    scan, the flagship's hot loop. numpy fallback keeps polars optional.
    """
    try:
        import polars as pl
    except ImportError:  # pragma: no cover - polars is baked in
        order = np.argsort(gid, kind="stable")
        sg = gid[order]
        starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
        usig = np.bitwise_xor.reduceat(vhash[order], starts)
        if cnt is None:
            ucnt = np.diff(np.r_[starts, len(sg)]).astype(np.int64)
        else:
            ucnt = np.add.reduceat(cnt[order], starts)
        return sg[starts], usig, ucnt
    cols = {"gid": gid, "vhash": vhash}
    aggs = [pl.col("vhash").bitwise_xor().alias("sig")]
    if cnt is None:
        aggs.append(pl.len().cast(pl.Int64).alias("cnt"))
    else:
        cols["cnt"] = cnt
        aggs.append(pl.col("cnt").sum().alias("cnt"))
    g = pl.DataFrame(cols).group_by("gid").agg(*aggs)
    return (g["gid"].to_numpy(), g["sig"].to_numpy().astype(np.uint64),
            g["cnt"].to_numpy().astype(np.int64))


def make_signature_partials_fn(cfg: DigestConfig):
    """digest batch -> sparse (part, bucket, sig, cnt) partial rows.

    Combines rows that share a bucket within the batch (XOR is
    associative+commutative — the combiner that makes the signature
    groupby a partial aggregation instead of a row shuffle).
    """
    B = cfg.buckets_per_partition

    def partials(batch: pa.Table) -> pa.Table:
        part = batch.column("part").to_numpy()
        bucket = batch.column("bucket").to_numpy()
        vhash = batch.column("vhash").to_numpy().astype(np.uint64, copy=False)
        gid = part.astype(np.int64) * B + bucket
        uniq, sig, cnt = _xor_count_by_gid(gid, vhash)
        return pa.table({
            "part": pa.array((uniq // B).astype(np.int32)),
            "bucket": pa.array((uniq % B).astype(np.int32)),
            "sig": pa.array(sig, type=pa.uint64()),
            "cnt": pa.array(cnt, type=pa.int64()),
        })

    return partials


def _reduce_partition(cfg_b: int):
    """groupby(part).map_groups reducer: partials -> one row per partition
    with the dense leaf signature blob, row count and Merkle root."""

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        gid = g["bucket"].to_numpy()
        sig = np.zeros(cfg_b, dtype=np.uint64)
        np.bitwise_xor.at(sig, gid, g["sig"].to_numpy().astype(np.uint64))
        cnt = np.zeros(cfg_b, dtype=np.int64)
        np.add.at(cnt, gid, g["cnt"].to_numpy())
        return pd.DataFrame({
            "part": [part],
            "rows": [int(cnt.sum())],
            "root": [np.uint64(merkle.merkle_root(sig))],
            "croot": [np.uint64(merkle.merkle_root(cnt.view(np.uint64)))],
            "leaves": [sig.tobytes()],
            "counts": [cnt.astype(np.int64).tobytes()],
        })

    return reduce


def _reduce_partition_by_side(cfg_b: int):
    """Side-tagged variant of ``_reduce_partition`` for the combined
    (source+sink) digest layout: group key is (part, is_src), output
    keeps ``is_src`` so the caller can split the frames."""
    base = _reduce_partition(cfg_b)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = base(g)
        out["is_src"] = bool(g["is_src"].iloc[0])
        return out

    return reduce


def make_partial_combiner_fn(cfg: DigestConfig):
    """Combine sparse partial rows (part,bucket,sig,cnt) -> fewer rows.

    Idempotent: same schema in/out; XOR-merges duplicates of the same
    global bucket. Applied with a large ``batch_size`` it acts as one
    level of a tree reduce — each pass caps output at the number of
    distinct buckets per batch, so the volume reaching the driver is
    bounded by ~(distinct buckets × final block count), not row count.

    CAUTION: only attach this as a combine level AFTER a repartition or
    shuffle boundary. Chained directly onto the digest map with a large
    ``batch_size``, Ray COALESCES upstream blocks to fill the batch and
    the whole fused chain collapses to one task (measured: 64 blocks ->
    1 task). The default pipelines instead combine per block (inside
    ``make_signature_partials_fn``) and XOR-merge on the driver; use
    this function only in ``partition_signatures_distributed``-style
    layouts where a groupby separates it from the scan.
    """
    B = cfg.buckets_per_partition

    def combine(batch: pa.Table) -> pa.Table:
        part = batch.column("part").to_numpy()
        bucket = batch.column("bucket").to_numpy()
        sig = batch.column("sig").to_numpy().astype(np.uint64, copy=False)
        cnt = batch.column("cnt").to_numpy().astype(np.int64, copy=False)
        gid = part.astype(np.int64) * B + bucket
        uniq, osig, ocnt = _xor_count_by_gid(gid, sig, cnt)
        return pa.table({
            "part": pa.array((uniq // B).astype(np.int32)),
            "bucket": pa.array((uniq % B).astype(np.int32)),
            "sig": pa.array(osig, type=pa.uint64()),
            "cnt": pa.array(ocnt, type=pa.int64()),
        })

    return combine


COMBINE_BATCH = 4_000_000  # partial rows per combiner batch (~112 MB)


def partition_signatures(digests, cfg: DigestConfig) -> pd.DataFrame:
    """Digest Dataset -> driver-side frame (part, rows, root, leaves).

    Sparse per-block partials (already XOR-combined within the block)
    -> driver XOR merge. Result is num_partitions rows ×
    (8 × buckets_per_partition) bytes of leaves. Partial volume
    reaching the driver is ~min(rows, blocks × touched buckets); for
    partition counts beyond driver memory (10^12-row tables) use
    ``partition_signatures_distributed``.

    NOTE: deliberately one operator, one batch per block — a separate
    combine operator with a large batch_size would make Ray coalesce
    blocks to fill the batch and collapse the fused chain into a
    single task (observed: 64 blocks -> 1 task).
    """
    partials = digests.map_batches(make_signature_partials_fn(cfg),
                                   batch_format="pyarrow")
    return _merge_signature_partials(
        _collect_arrow(partials), cfg.buckets_per_partition)


def _collect_arrow(ds) -> pa.Table | None:
    """Collect a small Dataset of partial rows as ONE Arrow table —
    zero-copy from the object store; ``to_pandas()`` here cost ~0.5 s
    per flagship side in block-wise pandas conversion alone. Returns
    None for a dataset with no blocks at all (callers treat it as
    empty)."""
    import ray

    tables = ray.get(ds.to_arrow_refs())
    nonempty = [t for t in tables if t.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="none")
    return tables[0] if tables else None


def partition_signatures_distributed(digests, cfg: DigestConfig):
    """Fully distributed signature reduce for very large partition
    counts: groupby(part) shuffles the (already combined) partials and
    emits one row per partition with its leaves blob + Merkle root.
    Returns a Dataset — collect only (part, root, rows) columns to the
    driver; fetch leaves just for differing partitions."""
    partials = digests.map_batches(make_signature_partials_fn(cfg),
                                   batch_format="pyarrow")
    return partials.groupby("part").map_groups(
        _reduce_partition(cfg.buckets_per_partition), batch_format="pandas")


def _dirty_parts(roots_src: pd.DataFrame,
                 roots_snk: pd.DataFrame) -> np.ndarray:
    """Partition ids whose (rows, root, croot) scalars differ between
    sides — including partitions present on only one side (present
    means rows > 0, so one-sided is always dirty). These are the ONLY
    partitions whose dense blobs the driver ever needs."""

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        # nullable UInt64 so the outer merge never coerces 64-bit roots
        # to float64 (same guard as _classify_frame's vhash columns)
        return pd.DataFrame({
            "part": df["part"].to_numpy(np.int64) if len(df) else
            np.empty(0, np.int64),
            "rows": pd.array(df["rows"].to_numpy(np.int64) if len(df)
                             else [], dtype="Int64"),
            "root": pd.array(df["root"].to_numpy(np.uint64) if len(df)
                             else [], dtype="UInt64"),
            "croot": pd.array(df["croot"].to_numpy(np.uint64) if len(df)
                              else [], dtype="UInt64"),
        })

    m = norm(roots_src).merge(norm(roots_snk), on="part", how="outer",
                              suffixes=("_s", "_k"))
    same = ((m["rows_s"] == m["rows_k"])
            & (m["root_s"] == m["root_k"])
            & (m["croot_s"] == m["croot_k"]))
    dirty = m.loc[~same.fillna(False).to_numpy(dtype=bool), "part"]
    return np.sort(dirty.to_numpy(np.int64))


def _fetch_blobs(reduced, dirty: np.ndarray,
                 extra_cols: tuple[str, ...] = ()) -> pd.DataFrame:
    """Second (tiny, filtered) pass over a materialized reduced-
    signature Dataset: fetch leaves/counts blobs ONLY for the given
    dirty partitions."""
    cols = ["part", *extra_cols, "leaves", "counts"]
    if not len(dirty):
        return pd.DataFrame(columns=cols)
    d = np.sort(np.asarray(dirty, dtype=np.int64))

    def filt(batch: pa.Table) -> pa.Table:
        part = batch.column("part").to_numpy()
        pos = np.minimum(np.searchsorted(d, part), len(d) - 1)
        return batch.select(cols).filter(pa.array(d[pos] == part))

    return reduced.map_batches(filt, batch_format="pyarrow").to_pandas()


def _sparse_sig_frame(roots: pd.DataFrame,
                      blobs: pd.DataFrame) -> pd.DataFrame:
    """Assemble a sparse signature frame: every partition's scalars,
    blobs only where fetched (None elsewhere)."""
    out = roots[["part", "rows", "root", "croot"]].copy()
    if len(blobs):
        bl = blobs.set_index("part")
        lv = out["part"].map(bl["leaves"])
        ct = out["part"].map(bl["counts"])
        out["leaves"] = lv.where(lv.notna(), None)
        out["counts"] = ct.where(ct.notna(), None)
    else:
        out["leaves"] = None
        out["counts"] = None
    return out.sort_values("part").reset_index(drop=True)


def collect_sparse_signature_pair(red_src, red_snk
                                  ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Driver collection for the distributed signature route.

    Only the (part, rows, root, croot) scalar columns come back for
    every partition (~40 B each); the dense leaves/counts blobs
    (8-16 KB each) are fetched in a second filtered pass SOLELY for
    partitions whose scalars differ. Driver-resident signature bytes
    therefore scale with the number of DIFFERING partitions, not the
    partition count — the driver prunes the same way the Merkle
    comparator does (``check/slice/SliceCheckWorker.java:243-261``).
    Both inputs must be materialized Datasets of ``_reduce_partition``
    rows.
    """
    from ..functions.runtime import run_concurrently

    roots_cols = ["part", "rows", "root", "croot"]
    roots_s, roots_k = run_concurrently(
        lambda: red_src.select_columns(roots_cols).to_pandas(),
        lambda: red_snk.select_columns(roots_cols).to_pandas())
    dirty = _dirty_parts(roots_s, roots_k)
    blobs_s, blobs_k = run_concurrently(
        lambda: _fetch_blobs(red_src, dirty),
        lambda: _fetch_blobs(red_snk, dirty))
    return (_sparse_sig_frame(roots_s, blobs_s),
            _sparse_sig_frame(roots_k, blobs_k))


def _merge_signature_partials(pdf, B: int) -> pd.DataFrame:
    """Driver-side XOR merge of sparse partials (pandas frame or Arrow
    table) into one dense signature row per partition.

    Fully vectorized: one hash groupby over the partial rows
    (``_xor_count_by_gid``), ONE dense 2-D scatter for all partitions'
    leaf/count blobs, and ``merkle_root_many`` for every root in one
    pass — the previous per-partition Python loop with per-row pandas
    extraction was a serial ~2 s/side floor on the flagship bench (the
    scan itself takes that long on 16 cores)."""
    if pdf is None:
        return empty_sig_frame()
    if isinstance(pdf, pa.Table):
        if not pdf.num_rows:
            return empty_sig_frame()
        part = pdf.column("part").to_numpy().astype(np.int64, copy=False)
        bucket = pdf.column("bucket").to_numpy()
        sig = pdf.column("sig").to_numpy().astype(np.uint64, copy=False)
        cnt = pdf.column("cnt").to_numpy().astype(np.int64, copy=False)
    else:
        if not len(pdf):
            return empty_sig_frame()
        part = pdf["part"].to_numpy(np.int64)
        bucket = pdf["bucket"].to_numpy(np.int64)
        sig = pdf["sig"].to_numpy().astype(np.uint64)
        cnt = pdf["cnt"].to_numpy(np.int64)
    gid = part * B + bucket
    ugid, usig, ucnt = _xor_count_by_gid(gid, sig, cnt)
    uparts = ugid // B
    ubuckets = (ugid % B).astype(np.int64)
    parts_u, pidx = np.unique(uparts, return_inverse=True)
    dense_sig = np.zeros((len(parts_u), B), dtype=np.uint64)
    dense_sig[pidx, ubuckets] = usig
    dense_cnt = np.zeros((len(parts_u), B), dtype=np.int64)
    dense_cnt[pidx, ubuckets] = ucnt
    return pd.DataFrame({
        "part": parts_u.astype(np.int64),
        "rows": dense_cnt.sum(axis=1),
        "root": merkle.merkle_root_many(dense_sig),
        "croot": merkle.merkle_root_many(dense_cnt.view(np.uint64)),
        "leaves": [r.tobytes() for r in dense_sig],
        "counts": [r.tobytes() for r in dense_cnt],
    })


def make_signature_partials_by_side_fn(cfg: DigestConfig):
    """Signature partials for a side-tagged digest batch: the batch is
    split by its ``side`` column and each half combined separately;
    output rows carry ``is_src``."""
    partials = make_signature_partials_fn(cfg)

    def fn(batch: pa.Table) -> pa.Table:
        side = batch.column("side")
        outs = []
        for flag in (True, False):
            sub = batch.filter(pc.equal(side, flag)) if batch.num_rows else batch
            if sub.num_rows:
                p = partials(sub)
                outs.append(p.append_column(
                    "is_src", pa.array(np.full(p.num_rows, flag))))
        if not outs:
            return pa.table({"part": pa.array([], pa.int32()),
                             "bucket": pa.array([], pa.int32()),
                             "sig": pa.array([], pa.uint64()),
                             "cnt": pa.array([], pa.int64()),
                             "is_src": pa.array([], pa.bool_())})
        return pa.concat_tables(outs)

    return fn


# Below this many fetched digest rows the diff join runs on the driver
# (one pandas merge, no shuffle). Known EXACTLY beforehand from the
# per-bucket counts in the signature receipts.
DRIVER_CLASSIFY_MAX_ROWS = 2_000_000


def estimate_diff_rows(src_sigs: pd.DataFrame, snk_sigs: pd.DataFrame,
                       diffs: list["PartitionDiff"], B: int) -> int | None:
    """Exact number of digest rows in differing buckets (both sides),
    from the dense per-bucket count blobs — no data pass needed."""
    total = 0
    for sigs in (src_sigs, snk_sigs):
        if "counts" not in getattr(sigs, "columns", []):
            return None  # counts unavailable -> caller uses safe path
        by = {int(r.part): r for r in sigs.itertuples()}
        for d in diffs:
            if not len(d.diff_buckets):
                continue
            r = by.get(d.part)
            if r is None:
                continue
            counts = np.frombuffer(r.counts, dtype=np.int64)
            total += int(counts[d.diff_buckets].sum())
    return total


def classify_differences_combined(both, diffs: list["PartitionDiff"],
                                  cfg: DigestConfig,
                                  est_rows: int | None = None):
    """Classify from a single side-tagged digest Dataset (the
    materialized-union path): filter to differing buckets, then either
    one driver-side vectorized merge (small diffs — the common case,
    zero shuffle) or a partition groupby (large diffs). Returns None
    when everything pruned."""
    B = cfg.buckets_per_partition
    gids = _diff_gid_array(diffs, B)
    if not len(gids):
        return None

    def filt(batch: pa.Table) -> pa.Table:
        part = batch.column("part").to_numpy()
        bucket = batch.column("bucket").to_numpy()
        gid = part.astype(np.int64) * B + bucket
        pos = np.minimum(np.searchsorted(gids, gid), len(gids) - 1)
        mask = gids[pos] == gid
        return batch.filter(pa.array(mask))

    filtered = both.map_batches(filt, batch_format="pyarrow")

    if est_rows is not None and est_rows <= DRIVER_CLASSIFY_MAX_ROWS:
        g = filtered.to_pandas()
        if not len(g):
            return None
        out = _classify_frame(g)
        return out if len(out) else EMPTY_VIOLATIONS.copy()

    def classify_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = _classify_group(g)
        return out if len(out) else EMPTY_VIOLATIONS.copy()

    return filtered.groupby("part").map_groups(classify_partition,
                                               batch_format="pandas")


def make_digest_partials_fn(cfg: DigestConfig, side_flag: bool):
    """Composed batch fn: raw typed batch -> combined signature partial
    rows tagged with the side. One operator per side — composition in
    our code instead of relying on Ray operator fusion (predictable
    task granularity: one task per input block)."""
    from .digest import make_digest_fn

    digest = make_digest_fn(cfg)
    partials = make_signature_partials_fn(cfg)

    def fn(batch: pa.Table) -> pa.Table:
        out = partials(digest(batch))
        return out.append_column(
            "is_src", pa.array(np.full(out.num_rows, side_flag)))

    return fn


# Above this partition count the signature reduce runs as a
# DISTRIBUTED groupby instead of a driver merge: per-block sparse
# partials stop compressing once the global bucket space exceeds the
# block row count, so their total volume approaches the digest row
# count (~28 B/row) and a driver-side pandas sort becomes the sink
# (measured: 153M rows/side -> ~2.8 GB of partials and 19 s of driver
# sort; the groupby ships the same bytes through the distributed
# shuffle and returns one ~1 KB row per partition).
DRIVER_SIGNATURE_MAX_PARTITIONS = 1024


def partition_signatures_pair(src, snk, cfg: DigestConfig,
                              batch_size: int | None = None,
                              mode: str = "auto"
                              ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Signatures for BOTH sides, streamed concurrently.

    read -> (digest+partials composed) is one map operator per side;
    the two sides run as two CONCURRENT driver-thread executions
    sharing the streaming executor's resource scheduler (measured: a
    single ``union`` execution serializes poorly under backpressure at
    low core counts — 7.1s vs 2.3s at 4 cpus on the bench pair).

    ``mode``: "driver" collects the sparse partial rows for a driver
    XOR merge (no shuffle at all — right for small/medium partition
    counts), "distributed" reduces via groupby(part) and collects only
    the per-partition (rows, root, croot) scalars, fetching dense
    leaves/counts blobs solely for differing partitions (sparse
    frames — see ``collect_sparse_signature_pair``), "auto" picks by
    ``DRIVER_SIGNATURE_MAX_PARTITIONS``.
    """
    from ..functions.runtime import run_concurrently

    B = cfg.buckets_per_partition
    distributed = (mode == "distributed"
                   or (mode == "auto"
                       and cfg.num_partitions > DRIVER_SIGNATURE_MAX_PARTITIONS))

    def side_partials(ds, side_flag: bool):
        return ds.map_batches(make_digest_partials_fn(cfg, side_flag),
                              batch_format="pyarrow",
                              batch_size=batch_size,
                              zero_copy_batch=True)

    if distributed:
        def side_reduced(ds, side_flag: bool):
            return side_partials(ds, side_flag).groupby("part").map_groups(
                _reduce_partition(B), batch_format="pandas").materialize()

        red_src, red_snk = run_concurrently(
            lambda: side_reduced(src, True),
            lambda: side_reduced(snk, False))
        return collect_sparse_signature_pair(red_src, red_snk)

    # merge INSIDE each thread: the two serial driver merges (~0.2 s
    # each at bench scale) overlap each other and the slower side's
    # collect tail instead of queueing after both collects finish
    return run_concurrently(
        lambda: _merge_signature_partials(
            _collect_arrow(side_partials(src, True)), B),
        lambda: _merge_signature_partials(
            _collect_arrow(side_partials(snk, False)), B))


# --------------------------------------------------------------------------
# Stage 2: driver-side Merkle compare -> differing (part, bucket) pairs
# --------------------------------------------------------------------------

@dataclass
class PartitionDiff:
    part: int
    src_rows: int
    snk_rows: int
    diff_buckets: np.ndarray  # empty => clean partition (pruned)
    src_root: int = 0
    snk_root: int = 0
    # buckets whose per-side ROW COUNTS differ: identical multisets
    # always have equal bucket counts, so a non-empty value proves the
    # partition dirty even when the key-level classify finds nothing
    # (cross-key compensating duplicates: src=[a,a,b] vs snk=[a,b,b])
    count_diff_buckets: np.ndarray = field(
        default_factory=lambda: np.empty(0, dtype=np.int64))


def _sig_scalar_arrays(sigs: pd.DataFrame, n: int, B: int):
    """Align a (possibly sparse) signature frame to dense per-partition
    scalar arrays + a blob lookup. Legacy frames without ``croot``
    derive it from the counts blobs when present."""
    rows = np.zeros(n, dtype=np.int64)
    er = np.uint64(_empty_root(B))
    root = np.full(n, er, dtype=np.uint64)
    croot = np.full(n, er, dtype=np.uint64)
    blob: dict[int, tuple] = {}
    if len(sigs):
        parts = sigs["part"].to_numpy(np.int64)
        rows[parts] = sigs["rows"].to_numpy(np.int64)
        root[parts] = sigs["root"].to_numpy(np.uint64)
        counts = (list(sigs["counts"]) if "counts" in sigs.columns
                  else [None] * len(sigs))
        if "croot" in sigs.columns:
            croot[parts] = sigs["croot"].to_numpy(np.uint64)
        else:
            croot[parts] = [
                np.uint64(merkle.merkle_root(
                    np.frombuffer(c, dtype=np.int64).view(np.uint64)))
                if c is not None else er for c in counts]
        for p, lv, ct in zip(parts, sigs["leaves"], counts):
            blob[int(p)] = (lv, ct)
    return rows, root, croot, blob


def compare_signatures(src_sigs: pd.DataFrame, snk_sigs: pd.DataFrame,
                       cfg: DigestConfig) -> list[PartitionDiff]:
    """Per-partition Merkle compare; descends only into differing roots.

    A partition is provably clean iff its (rows, root, croot) scalars
    match — the compare is one vectorized pass over those arrays, and
    the dense leaves/counts blobs are touched ONLY for dirty partitions
    (which is why sparse frames from the distributed route, where clean
    rows carry None blobs, compare without ever fetching them).

    A partition present on only one side compares against an empty
    leaf array (bucket alignment, ``SliceCheckWorker.java:410-452``).

    A bucket differs when EITHER its XOR signature OR its row count
    differs: duplicate-key multiplicities whose vhashes XOR-cancel
    (1 vs 3 copies, 2 vs 0) leave the signature unchanged but never
    the count — ``croot`` (the Merkle root over the count blob)
    carries that blind-spot detection into the scalar compare
    (advisor finding, round 1).
    """
    B = cfg.buckets_per_partition
    n = cfg.num_partitions
    s_rows, s_root, s_croot, s_blob = _sig_scalar_arrays(src_sigs, n, B)
    k_rows, k_root, k_croot, k_blob = _sig_scalar_arrays(snk_sigs, n, B)
    dirty = ((s_root != k_root) | (s_croot != k_croot)
             | (s_rows != k_rows))
    zeros_u = np.zeros(B, dtype=np.uint64)
    zeros_i = np.zeros(B, dtype=np.int64)
    out: list[PartitionDiff] = []
    for p in range(n):
        if not dirty[p]:
            out.append(PartitionDiff(
                part=p, src_rows=int(s_rows[p]), snk_rows=int(k_rows[p]),
                diff_buckets=_EMPTY_I64,
                src_root=int(s_root[p]), snk_root=int(k_root[p])))
            continue
        s_lv, s_ct = s_blob.get(p, (None, None))
        k_lv, k_ct = k_blob.get(p, (None, None))
        s_leaves = (np.frombuffer(s_lv, dtype=np.uint64)
                    if s_lv is not None else zeros_u)
        k_leaves = (np.frombuffer(k_lv, dtype=np.uint64)
                    if k_lv is not None else zeros_u)
        db = merkle.diff_buckets(s_leaves, k_leaves)
        s_cnt = (np.frombuffer(s_ct, dtype=np.int64)
                 if s_ct is not None else zeros_i)
        k_cnt = (np.frombuffer(k_ct, dtype=np.int64)
                 if k_ct is not None else zeros_i)
        cnt_diff = np.nonzero(s_cnt != k_cnt)[0]
        if len(cnt_diff):
            db = np.union1d(db, cnt_diff).astype(np.int64)
        out.append(PartitionDiff(
            part=p,
            src_rows=int(s_rows[p]), snk_rows=int(k_rows[p]),
            diff_buckets=db,
            src_root=int(s_root[p]), snk_root=int(k_root[p]),
            count_diff_buckets=cnt_diff.astype(np.int64),
        ))
    return out


# --------------------------------------------------------------------------
# Stage 3: row-level diff classification for differing buckets only
# --------------------------------------------------------------------------

def _diff_gid_array(diffs: list[PartitionDiff], B: int) -> np.ndarray:
    gids = [d.part * B + d.diff_buckets for d in diffs if len(d.diff_buckets)]
    if not gids:
        return np.empty(0, dtype=np.int64)
    return np.sort(np.concatenate(gids)).astype(np.int64)


def make_raw_bucket_prefilter_fn(diff_gids: np.ndarray, cfg: DigestConfig):
    """Raw-row prefilter for the classify re-scan: compute ONLY the key
    hash (the exact canonical + hash64 + assign_buckets math the digest
    uses — part/bucket are pure functions of the key hash, so the
    selection is bit-identical to filtering after the digest) and keep
    rows landing in differing buckets. The full 6-column row digest then
    runs on survivors only — ~1/(parts*B) of the input when diffs are
    localized — cutting the re-scan to key-hash cost (measured 0.126 ->
    0.038 s per 600k-row task on the flagship shape)."""
    from ..functions import canonical

    B = cfg.buckets_per_partition
    gids = np.sort(np.asarray(diff_gids, dtype=np.int64))

    def fn(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        if not gids.size:
            return batch.slice(0, 0)
        keys = canonical.key_column(batch, list(cfg.key_columns))
        kh = hashing.hash64(keys)
        part, bucket = hashing.assign_buckets(
            kh, cfg.num_partitions, B)
        gid = part.astype(np.int64) * B + bucket
        pos = np.minimum(np.searchsorted(gids, gid), len(gids) - 1)
        return batch.filter(pa.array(gids[pos] == gid))

    return fn


def make_bucket_filter_fn(diff_gids: np.ndarray, B: int, side: str):
    """Filter a digest batch to differing buckets and tag its side.

    ``diff_gids`` is a small sorted array captured in the task closure
    (broadcast once per task by Ray, not per batch).
    """

    def filt(batch: pa.Table) -> pa.Table:
        part = batch.column("part").to_numpy()
        bucket = batch.column("bucket").to_numpy()
        gid = part.astype(np.int64) * B + bucket
        if len(diff_gids):
            pos = np.minimum(np.searchsorted(diff_gids, gid), len(diff_gids) - 1)
            mask = diff_gids[pos] == gid
        else:
            mask = np.zeros(len(gid), dtype=bool)
        sub = batch.filter(pa.array(mask))
        return sub.append_column(
            "side", pa.array(np.full(sub.num_rows, side == "source"), type=pa.bool_()))

    return filt


def _classify_frame(g: pd.DataFrame) -> pd.DataFrame:
    """Full outer join on key over differing-bucket digest rows
    -> insert/update/delete rows (Maps.difference semantics,
    ``SliceCheckWorker.java:263-289``). ONE vectorized merge over the
    whole frame — a key lives in exactly one (part, bucket) (both are
    hash(key) subdivisions), so partition boundaries don't change the
    result and per-partition looping is pure overhead (measured 2.5s
    of driver time at 193 partitions x 300k rows); part/bucket ride
    along for reporting. Duplicate keys within a side are
    deterministically collapsed to the first by (key, vhash) order,
    mirroring the reference's map-overwrite behavior; uniqueness
    violations are reported by the separate uniqueness check."""
    src = g[g["side"]]; snk = g[~g["side"]]
    src = src.sort_values(["key", "vhash"]).drop_duplicates("key", keep="first")
    snk = snk.sort_values(["key", "vhash"]).drop_duplicates("key", keep="first")
    # nullable UInt64 so the outer merge never coerces the 64-bit value
    # hashes to float64 (which would silently collide hashes > 2^53)
    sv = src[["key", "part", "bucket"]].assign(
        vhash_s=src["vhash"].astype("UInt64").values)
    kv = snk[["key", "part", "bucket"]].assign(
        vhash_k=snk["vhash"].astype("UInt64").values)
    j = sv.merge(kv, on="key", how="outer", suffixes=("", "_k"))
    only_src = j["vhash_k"].isna().to_numpy()
    only_snk = j["vhash_s"].isna().to_numpy()
    kind = np.where(only_src, "insert", np.where(only_snk, "delete", "update"))
    differs = (j["vhash_s"] != j["vhash_k"]).fillna(True).to_numpy()
    keep = only_src | only_snk | differs
    part = np.where(j["part"].notna(), j["part"], j["part_k"]).astype(np.int64)
    bucket = np.where(j["bucket"].notna(), j["bucket"],
                      j["bucket_k"]).astype(np.int64)
    out = pd.DataFrame({"key": j["key"].to_numpy()[keep], "kind": kind[keep]})
    out["part"] = part[keep].astype(np.int32)
    out["bucket"] = bucket[keep].astype(np.int32)
    return out.reset_index(drop=True)


# Per-partition alias used by the groupby path (same math — see
# _classify_frame's invariant note).
_classify_group = _classify_frame


def classify_differences(src_digests, snk_digests,
                         diffs: list[PartitionDiff], cfg: DigestConfig,
                         est_rows: int | None = None):
    """Violations Dataset (key, kind, part, bucket) for differing buckets.

    Returns None when every partition pruned clean (no join executed —
    the reference's equal-root short-circuit at scale).

    With ``est_rows`` (the EXACT count of digest rows in differing
    buckets, from the signature count blobs) at or below
    ``DRIVER_CLASSIFY_MAX_ROWS``, the filtered digests stream straight
    to the driver for one vectorized merge — measured 6s faster at 16
    cpus than the partition groupby on this box: a many-block ->
    many-group all-to-all over a few hundred-k tiny rows is pure
    shuffle overhead and ANTI-scales with workers. The groupby path
    remains for genuinely large diffs.
    """
    B = cfg.buckets_per_partition
    gids = _diff_gid_array(diffs, B)
    if not len(gids):
        return None
    src_f = src_digests.map_batches(make_bucket_filter_fn(gids, B, "source"),
                                    batch_format="pyarrow")
    snk_f = snk_digests.map_batches(make_bucket_filter_fn(gids, B, "sink"),
                                    batch_format="pyarrow")

    if est_rows is not None and est_rows <= DRIVER_CLASSIFY_MAX_ROWS:
        # two concurrent executions (see partition_signatures_pair for
        # why not union) -> one driver-side vectorized merge
        from ..functions.runtime import run_concurrently

        g = pd.concat(run_concurrently(src_f.to_pandas, snk_f.to_pandas),
                      ignore_index=True)
        if not len(g):
            return None
        out = _classify_frame(g)
        return out if len(out) else EMPTY_VIOLATIONS.copy()

    def classify_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = _classify_group(g)
        return out if len(out) else EMPTY_VIOLATIONS.copy()

    return src_f.union(snk_f).groupby("part").map_groups(
        classify_partition, batch_format="pandas")


# --------------------------------------------------------------------------
# Orchestration + verdicts
# --------------------------------------------------------------------------

@dataclass
class CompareResult:
    """Run-level result, CheckDiffResult / CheckSummary shaped
    (``check/modules/check/CheckDiffResult.java:55-174``)."""

    table: str
    partitions: list[dict[str, Any]]
    violations: pd.DataFrame           # key, kind, part, bucket
    summary: dict[str, Any] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return self.summary.get("result") == "success"


def build_verdicts(table: str, diffs: list[PartitionDiff],
                   violations: pd.DataFrame) -> CompareResult:
    parts = []
    by_part = {int(p): g for p, g in violations.groupby("part")} if len(violations) else {}
    count_mismatch_parts = 0
    for d in diffs:
        v = by_part.get(d.part)
        ins = int((v["kind"] == "insert").sum()) if v is not None else 0
        upd = int((v["kind"] == "update").sum()) if v is not None else 0
        dele = int((v["kind"] == "delete").sum()) if v is not None else 0
        # A partition can have zero key-level violations yet differing
        # row counts (duplicate-key multiplicity skew — the classify
        # join collapses duplicates per key). Identical multisets have
        # equal counts in EVERY bucket, so a count-differing bucket
        # with no key-level violations proves the partition dirty even
        # when partition totals coincide (cross-key compensating
        # duplicates, src=[a,a,b] vs snk=[a,b,b] — round-2 review
        # finding). Insert/delete violations legitimately change
        # bucket counts, so count skew only fails a partition the
        # classify could not explain.
        # ... and a bucket whose SIGNATURE differs without any
        # explaining violation is equally damning: identical multisets
        # always produce identical signatures, so an unexplained
        # mismatch means within-bucket multiplicity skew the key-level
        # join cannot see (e.g. both keys share the bucket and the
        # counts coincide too).
        violated = ins + upd + dele > 0
        blind_count_mismatch = (not violated) and (
            d.src_rows != d.snk_rows
            or len(d.count_diff_buckets) > 0
            or len(d.diff_buckets) > 0)
        ok = not violated and not blind_count_mismatch
        rec = {
            "table": table, "part": d.part,
            "rowCount": max(d.src_rows, d.snk_rows),
            "srcRoot": d.src_root, "snkRoot": d.snk_root,
            "insertTotal": ins, "updateTotal": upd, "deleteTotal": dele,
            "result": "success" if ok else "failed",
        }
        if blind_count_mismatch:
            count_mismatch_parts += 1
            if d.src_rows != d.snk_rows:
                rec["message"] = (f"row count mismatch: src={d.src_rows} "
                                  f"snk={d.snk_rows}")
            elif len(d.count_diff_buckets):
                rec["message"] = (f"bucket row-count mismatch in "
                                  f"{len(d.count_diff_buckets)} bucket(s) "
                                  f"(duplicate multiplicity skew)")
            else:
                rec["message"] = (f"unexplained signature mismatch in "
                                  f"{len(d.diff_buckets)} bucket(s) "
                                  f"(duplicate multiplicity skew)")
        if v is not None and not ok:
            for kind, label in (("insert", "keyInsert"), ("update", "keyUpdate"),
                                ("delete", "keyDelete")):
                keys = sorted(v.loc[v["kind"] == kind, "key"].tolist())
                rec[label] = keys[:MAX_DISPLAY_KEYS]
                if len(keys) > MAX_DISPLAY_KEYS:
                    rec["message"] = "diff too large, keys truncated"
        parts.append(rec)
    ins = sum(p["insertTotal"] for p in parts)
    upd = sum(p["updateTotal"] for p in parts)
    dele = sum(p["deleteTotal"] for p in parts)
    summary = {
        "table": table,
        "partitionCount": len(parts),
        "rowCount": sum(p["rowCount"] for p in parts),
        "insertTotal": ins, "updateTotal": upd, "deleteTotal": dele,
        "totalRepair": ins + upd + dele,
        "countMismatchPartitions": count_mismatch_parts,
        "result": ("success"
                   if ins + upd + dele == 0 and count_mismatch_parts == 0
                   else "failed"),
    }
    return CompareResult(table=table, partitions=parts,
                         violations=violations, summary=summary)


EMPTY_VIOLATIONS = pd.DataFrame({
    "key": pd.Series(dtype=object), "kind": pd.Series(dtype=object),
    "part": pd.Series(dtype=np.int32), "bucket": pd.Series(dtype=np.int32)})


# "auto" digest-materialization budget: the digest rows of BOTH sides
# must fit this many bytes (object-store-backed, spills to disk) for
# the classify phase to work from retained digests instead of a second
# raw input scan. Default 8 GiB — generous on this 37 GiB-plasma box,
# while a 10^12-row table (~100 TB raw, ~100 TB x 0.1% keys... ~tens of
# TB of digests) correctly routes to the streaming re-scan path.
DIGEST_MATERIALIZE_BUDGET_BYTES = int(os.environ.get(
    "GRAFT_DIGEST_MATERIALIZE_BUDGET", str(8 * 2**30)))
# key (large_string, web keys are urls) + khash/vhash/part/bucket + arrow
# offsets/validity — deliberately conservative per digest row
DIGEST_ROW_BYTES_ESTIMATE = 96


def compare_tables(src, snk, cfg: DigestConfig, table: str = "table",
                   batch_size: int | None = None,
                   materialize_digests: bool | str = False,
                   approx_rows: int | None = None) -> CompareResult:
    """Full table-pair compare: two Datasets in, verdicts + violations out.

    Default is fully streaming: ONE fused scan computes both sides'
    partition signatures (read -> digest -> partial XOR, no
    materialization, no shuffle); only when the Merkle compare finds
    differing buckets does a second scan re-digest and classify those
    buckets (violations are the rare case, so the clean path costs a
    single pass — the reference's equal-root short-circuit, at scale).

    ``materialize_digests=True`` keeps both digest Datasets pinned in
    the object store instead (a few percent of input bytes, spills to
    disk) — worth it when the caller reuses them (e.g. the validation
    runner's uniqueness check) AND when diffs are plentiful: the
    classify phase then filters the RETAINED digest rows instead of
    paying a second full raw scan (round-3 verdict #6 — on the 10%-dirty
    A/B bench the classify re-read disappears; verdicts byte-identical
    by test).

    ``materialize_digests="auto"`` picks per table size: materialized
    while both sides' estimated digest footprint (``approx_rows`` —
    pass the parquet footer count — × ~96 B × 2) fits
    ``DIGEST_MATERIALIZE_BUDGET_BYTES``; streaming beyond (or when no
    row hint is given). At 10^12 rows the digests themselves are tens
    of TB, so the bounded-memory streaming re-scan with the key-hash
    prefilter is the only sane route; at bench/operational scale the
    materialized route is strictly faster once any bucket is dirty.

    ``batch_size=None`` (one batch per block) is deliberate: a numeric
    batch_size on the digest map PREVENTS fusion with the upstream
    read/transform, so every raw block round-trips the object store
    (measured 6s extra on the 9.6M-row bench at 16 cpus). Block byte
    size — bounded by the read's target block size — is the memory
    guard, not map batch_size.
    """
    if materialize_digests == "auto":
        materialize_digests = (
            approx_rows is not None
            and 2 * approx_rows * DIGEST_ROW_BYTES_ESTIMATE
            <= DIGEST_MATERIALIZE_BUDGET_BYTES)
    if materialize_digests:
        # ONE tagged union materialization (both sides digest
        # concurrently in a single execution), then one signature pass
        # and — only if needed — one filtered classify pass over it.
        def tag(flag: bool):
            def fn(t: pa.Table) -> pa.Table:
                return t.append_column(
                    "side", pa.array(np.full(t.num_rows, flag)))
            return fn

        both = digest_dataset(src, cfg, batch_size) \
            .map_batches(tag(True), batch_format="pyarrow") \
            .union(digest_dataset(snk, cfg, batch_size)
                   .map_batches(tag(False), batch_format="pyarrow")) \
            .materialize()
        partials = both.map_batches(
            make_signature_partials_by_side_fn(cfg), batch_format="pyarrow")
        ptab = _collect_arrow(partials)
        B = cfg.buckets_per_partition
        if ptab is not None and ptab.num_rows:
            mask = ptab.column("is_src")
            src_sigs = _merge_signature_partials(ptab.filter(mask), B)
            snk_sigs = _merge_signature_partials(
                ptab.filter(pc.invert(mask)), B)
        else:
            src_sigs = snk_sigs = empty_sig_frame()
        diffs = compare_signatures(src_sigs, snk_sigs, cfg)
        est = estimate_diff_rows(src_sigs, snk_sigs, diffs, B)
        vio_ds = classify_differences_combined(both, diffs, cfg,
                                               est_rows=est)
    else:
        src_sigs, snk_sigs = partition_signatures_pair(src, snk, cfg, None)
        diffs = compare_signatures(src_sigs, snk_sigs, cfg)
        if any(len(d.diff_buckets) for d in diffs):
            est = estimate_diff_rows(src_sigs, snk_sigs, diffs,
                                     cfg.buckets_per_partition)
            # prune the re-scan at the RAW rows: key-hash-only filter
            # before the full digest (survivors are ~the diff buckets'
            # rows, so the second pass costs key-hash, not row-digest)
            pre = make_raw_bucket_prefilter_fn(
                _diff_gid_array(diffs, cfg.buckets_per_partition), cfg)
            vio_ds = classify_differences(
                digest_dataset(src.map_batches(pre, batch_format="pyarrow"),
                               cfg, batch_size),
                digest_dataset(snk.map_batches(pre, batch_format="pyarrow"),
                               cfg, batch_size),
                diffs, cfg, est_rows=est)
        else:
            vio_ds = None
    violations = to_violation_frame(vio_ds)
    return build_verdicts(table, diffs, violations)


def to_violation_frame(vio) -> pd.DataFrame:
    """Normalize a classify result (Dataset | DataFrame | None — the
    driver-merge path returns pandas directly, no Ray round-trip)."""
    if vio is None:
        return EMPTY_VIOLATIONS.copy()
    if isinstance(vio, pd.DataFrame):
        return vio if len(vio) else EMPTY_VIOLATIONS.copy()
    out = vio.to_pandas()
    return out if len(out) else EMPTY_VIOLATIONS.copy()

"""Row-digest stage: typed Arrow batch -> (key, khash, vhash, part, bucket).

The Ray-Data-native equivalent of the reference's extract path
(``extract/slice/common/SliceResultSetSender.java:159-166`` +
``extract/task/ResultSetHashHandler.java:47-54``): each input row is
canonicalized column-by-column, digested to a 64-bit value hash, and
its primary key spliced + hashed to a key hash, which also determines
the (partition, bucket) it will be compared in. Runs as a stateless
vectorized ``map_batches`` transform over zero-copy Arrow batches; the
digest output rows are a few dozen bytes regardless of how wide the
input rows are — this is the only data that ever moves in a shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..functions import canonical, hashing

DIGEST_SCHEMA = pa.schema([
    ("key", pa.large_string()),
    ("khash", pa.uint64()),
    ("vhash", pa.uint64()),
    ("part", pa.int32()),
    ("bucket", pa.int32()),
])


@dataclass(frozen=True)
class DigestConfig:
    """Shared digest/partitioning parameters for one table pair.

    Both sides of a pair MUST use the same instance — identical hash
    function + (num_partitions, buckets_per_partition) is the alignment
    invariant that replaces the reference's checkpoint swap
    (``check/service/CheckPointSwapRegister.java:290-341``).
    """

    key_columns: tuple[str, ...]
    compare_columns: tuple[str, ...] | None = None  # None = all columns
    num_partitions: int = 64
    buckets_per_partition: int = 1024
    extra_passthrough: tuple[str, ...] = field(default=())

    @staticmethod
    def for_rows(key_columns: tuple[str, ...], approx_rows: int,
                 compare_columns: tuple[str, ...] | None = None,
                 partition_capacity: int = 1_000_000,
                 bucket_capacity: int = 256) -> "DigestConfig":
        """Auto-size partitions/buckets from an approximate row count.

        Partition ~= the reference's slice (default 10^5..10^6 rows,
        ``maximum-table-slice-size``); bucket count per partition is a
        power of two capped at 2^15 (BuilderBucketHandler.java:37-41).

        Per-partition rows auto-scale: ``partition_capacity`` is the
        CEILING (10^12 rows => 10^6 partitions of ~1M rows), but small
        tables still get join/verdict parallelism — at least ~64
        partitions once the table exceeds ~1.6M rows, floor 25k rows
        per partition below that.
        """
        per_part = min(partition_capacity, max(25_000, approx_rows // 64))
        parts = max(1, min(1_048_576, approx_rows // per_part + 1))
        per_part = max(1, approx_rows // parts)
        b = hashing.bucket_count_for(per_part, bucket_capacity)
        return DigestConfig(key_columns=tuple(key_columns),
                            compare_columns=compare_columns,
                            num_partitions=parts, buckets_per_partition=b)


def make_digest_fn(cfg: DigestConfig):
    """Build the vectorized map_batches function for one side."""

    def digest(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        keys = canonical.key_column(batch, list(cfg.key_columns))
        khash = hashing.hash64(keys)
        cols = (list(cfg.compare_columns) if cfg.compare_columns is not None
                else batch.column_names)
        # per-column hash + ordered mix: numeric/temporal columns hash
        # their raw 8-byte values (no string cast, no concat buffer) —
        # 3-5x the throughput of the canonical-concat path with
        # strictly stronger equality semantics (functions/hashing.py
        # row_hash docstring)
        vhash = hashing.row_hash(batch, cols)
        # drop zero key-hash guard rows? (reference drops kHash==0,
        # ExtractTaskRunnable.java:484-490) — SipHash never yields 0 for
        # realistic inputs; keep every row for strict correctness.
        part, bucket = hashing.assign_buckets(
            khash, cfg.num_partitions, cfg.buckets_per_partition)
        out = {
            "key": keys.cast(pa.large_string()) if keys.type != pa.large_string() else keys,
            "khash": pa.array(khash, type=pa.uint64()),
            "vhash": pa.array(vhash, type=pa.uint64()),
            "part": pa.array(part, type=pa.int32()),
            "bucket": pa.array(bucket.astype(np.int32), type=pa.int32()),
        }
        for c in cfg.extra_passthrough:
            out[c] = batch.column(c)
        return pa.table(out)

    return digest


def digest_dataset(ds, cfg: DigestConfig, batch_size: int | None = None):
    """Attach the digest stage to a Dataset (lazy).

    Default ``batch_size=None`` = one batch per block: a larger
    batch_size makes Ray COALESCE blocks to fill batches, which merges
    tasks and destroys read parallelism on small-block inputs.
    """
    return ds.map_batches(make_digest_fn(cfg), batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)

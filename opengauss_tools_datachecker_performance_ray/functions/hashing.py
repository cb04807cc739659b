"""64-bit row digests and hash-bucket math.

The reference hashes the canonical row concat with xxHash3 (seed
199972221018, ``common/util/LongHashFunctionWrapper.java:31-36``) to
get ``vHash``/``kHash`` and assigns buckets with
``abs(kHash) & (bucketCount - 1)``
(``check/modules/bucket/BuilderBucketHandler.java:87-131``). xxhash is
not available in this environment, so we use pandas' vectorized
SipHash-1-3 (``pd.util.hash_array``) with a fixed key derived from the
same seed — a stable, C-speed, 64-bit keyed hash with equivalent
collision behavior. Same semantics, different (documented) hash family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# 16-byte SipHash key derived from the reference's xxhash seed
# 199972221018L (kept recognizable for parity auditing; value itself
# only needs to be fixed and shared by every stage of a run).
HASH_KEY = b"199972221018@@@@"  # 16 bytes exactly
assert len(HASH_KEY) == 16

# Bump when row-digest semantics change — folded into checkpoint
# lineage so receipts from an older hash never mix with fresh ones.
DIGEST_VERSION = "hv3-null-sentinel"


def hash64(values: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hash of a string/binary column -> uint64 ndarray."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=HASH_KEY.decode("latin1"),
                              categorize=False)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) —
    a high-quality 64-bit mix at numpy register speed."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_NULL_SENTINEL = np.uint64(0x9AE16A3B2F90404F)


def column_hash(arr) -> np.ndarray:
    """Per-column 64-bit hash with a zero-allocation fast path.

    Numeric / temporal / boolean columns hash their RAW fixed-width
    values through splitmix64 (the 8-byte pattern is already an
    injective canonical form — no string cast, no buffer concat);
    string / binary / other columns go through the canonical-bytes +
    SipHash path. Nulls hash to a fixed sentinel (null == null,
    matching the canonical "" semantics).
    """
    import pyarrow as pa

    from . import canonical

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    fast = None
    if pa.types.is_boolean(t):
        fast = arr.cast(pa.int8()).cast(pa.int64())
    elif pa.types.is_integer(t):
        # uint64 must NOT cast to int64: values >= 2^63 raise
        # ArrowInvalid. Its raw buffer is already the 8-byte pattern we
        # hash, so use it as-is (same bits => same hash as an equal
        # int64 value, preserving cross-width equality below 2^63).
        if pa.types.is_uint64(t):
            fast = arr
        else:
            fast = arr.cast(pa.int64()) if t.bit_width <= 64 else None
    elif pa.types.is_floating(t):
        fast = arr.cast(pa.float64()) if not pa.types.is_float16(t) else None
    elif pa.types.is_timestamp(t) or pa.types.is_time64(t) or \
            pa.types.is_date64(t):
        fast = arr.cast(pa.int64())
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        fast = arr.cast(pa.int32()).cast(pa.int64())
    if fast is not None:
        nulls = fast.null_count > 0
        if nulls:
            mask = fast.is_null().to_numpy(zero_copy_only=False)
            fast = fast.fill_null(0)
        v = fast.to_numpy(zero_copy_only=True)
        h = _splitmix64(v.view(np.uint64) if v.dtype != np.uint64 else v)
        if nulls:
            h = h.copy()
            h[mask] = _NULL_SENTINEL
        return h
    h = hash64(canonical.canonicalize_column(arr))
    # uniform null semantics across ALL types: null hashes to the
    # sentinel, so null != "" for strings too (stricter than the
    # reference's null->"" concat collision, HashHandler.java:56-59;
    # found by the hypothesis injectivity property)
    if arr.null_count:
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        h = h.copy()
        h[mask] = _NULL_SENTINEL
    return h


def row_hash(table, columns: list[str] | None = None) -> np.ndarray:
    """Order-dependent combined row hash over ``columns``.

    Equality semantics are per-column exact-value (STRICTER than the
    reference's string-concat — no cross-column boundary or null/""
    collisions for typed columns); two rows hash equal iff every
    column's value is identical. The mix (rotate-xor-multiply of
    column hashes) is order-dependent so column order matters, like
    the reference's ordered concat (HashHandler.java:37-61).
    """
    cols = columns if columns is not None else table.column_names
    h: np.ndarray | None = None
    for c in cols:
        hc = column_hash(table.column(c))
        if h is None:
            h = hc.copy()
        else:
            h = (np.left_shift(h, np.uint64(13))
                 | np.right_shift(h, np.uint64(51)))
            h = (h ^ hc) * np.uint64(0x9E3779B97F4A7C15)
    if h is None:
        return np.empty(0, dtype=np.uint64)
    return h


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (>=1)."""
    return 1 << max(0, int(n - 1).bit_length())


# Merkle height <= 15 ==> <= 2^15 buckets per partition
# (check/modules/bucket/BuilderBucketHandler.java:37-41).
MAX_BUCKETS_PER_PARTITION = 1 << 15


def bucket_count_for(rows: int, bucket_capacity: int = 64) -> int:
    """Bucket count: next power of two of rows/capacity, capped at 2^15.

    Mirrors ``BuilderBucketHandler.calacBucketCount`` (next-pow2 of
    rows / bucket expect capacity, capped by the Merkle height limit).
    """
    n = next_pow2(max(1, rows // max(1, bucket_capacity)))
    return min(n, MAX_BUCKETS_PER_PARTITION)


def assign_buckets(khash: np.ndarray, num_partitions: int,
                   buckets_per_partition: int) -> tuple[np.ndarray, np.ndarray]:
    """(partition_id, bucket_no within partition) from the key hash.

    Hash partitioning replaces the reference's checkpoint-swap range
    boundaries (``check/service/CheckPointSwapRegister.java:290-341``):
    because BOTH tables of a pair use the same hash function and the
    same (num_partitions, buckets_per_partition), co-partitioning is
    automatic — the alignment invariant holds by construction.

    partition = high bits, bucket = low bits of ``khash`` so that the
    global bucket id is ``partition * B + bucket``.
    """
    assert buckets_per_partition & (buckets_per_partition - 1) == 0
    assert buckets_per_partition <= MAX_BUCKETS_PER_PARTITION
    kh = khash.astype(np.uint64, copy=False)
    bucket = (kh & np.uint64(buckets_per_partition - 1)).astype(np.int32)
    # partition from the NEXT bits up, modulo num_partitions (any
    # num_partitions allowed, not just powers of two)
    part = ((kh >> np.uint64(15)) % np.uint64(num_partitions)).astype(np.int32)
    return part, bucket


def xor_reduce(vhash: np.ndarray) -> np.uint64:
    """Order-independent bucket signature: XOR of row vhashes.

    Mirrors ``Bucket.java:84-87`` (signature ^= vHash on insert). XOR
    is associative + commutative, so partial-per-batch XOR followed by
    a final XOR merge is exact — this is what makes the signature
    aggregation a cheap pre-aggregated groupby instead of a row shuffle.
    """
    return np.bitwise_xor.reduce(vhash.astype(np.uint64, copy=False)) \
        if len(vhash) else np.uint64(0)


def xor_by_bucket(bucket: np.ndarray, vhash: np.ndarray,
                  num_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-bucket (xor signature, row count) for one batch, vectorized.

    Returns dense arrays of length ``num_buckets`` (sig uint64, count
    int64). Used as the per-batch partial aggregate.
    """
    sig = np.zeros(num_buckets, dtype=np.uint64)
    np.bitwise_xor.at(sig, bucket, vhash.astype(np.uint64, copy=False))
    cnt = np.bincount(bucket, minlength=num_buckets).astype(np.int64)
    return sig, cnt

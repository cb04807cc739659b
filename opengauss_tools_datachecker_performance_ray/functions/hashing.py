"""64-bit row digests and hash-bucket math.

The reference hashes the canonical row concat with xxHash3 (seed
199972221018, ``common/util/LongHashFunctionWrapper.java:31-36``) to
get ``vHash``/``kHash`` and assigns buckets with
``abs(kHash) & (bucketCount - 1)``
(``check/modules/bucket/BuilderBucketHandler.java:87-131``). String /
binary columns hash with polars' vectorized xxHash over the raw Arrow
buffers (same hash family as the reference, zero Python-object
round-trip — ~14x the throughput of the round-1 SipHash path, which
remains as the fallback when polars is absent). The hash value itself
only needs to be fixed and shared by every stage of one run — the
polars version is pinned in this environment and ``DIGEST_VERSION``
guards checkpoint receipts across any change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import os as _os

# polars sizes its GLOBAL thread pool to the machine's logical CPUs at
# import (independent of Ray's num_cpus accounting, same failure mode
# as pyarrow's pool — see functions/runtime.py): 16 concurrent 1-CPU
# tasks each fanning to 32 threads oversubscribes the box and poisons
# scaling. One thread fully saturates the hash kernel (memory-bound;
# measured identical throughput), so pin before the first import.
_os.environ.setdefault("POLARS_MAX_THREADS", "1")
try:
    import polars as _pl
except ImportError:  # pragma: no cover - polars is baked into this env
    _pl = None

# 16-byte SipHash key derived from the reference's xxhash seed
# 199972221018L (kept recognizable for parity auditing) — used by the
# no-polars fallback; the polars path seeds xxHash with the same value.
HASH_KEY = b"199972221018@@@@"  # 16 bytes exactly
assert len(HASH_KEY) == 16
HASH_SEED = 199972221018  # LongHashFunctionWrapper.java:31-36

# Bump when row-digest semantics change — folded into checkpoint
# lineage so receipts from an older hash never mix with fresh ones.
DIGEST_VERSION = "hv5-xxhash-nested" if _pl is not None \
    else "hv3-null-sentinel"


def hash64(values: pa.Array | pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hash of a string/binary column -> uint64 ndarray.

    Arrow string/binary input hashes straight off the Arrow buffers via
    polars (no object materialization); numpy object arrays (shingles,
    n-grams) route through a polars Series for the same digest family.
    Chunk layout does not affect values (verified by test).
    """
    if _pl is not None:
        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            s = _pl.from_arrow(values)
        else:
            arr = np.asarray(values, dtype=object)
            s = _pl.Series(arr)
        return s.hash(seed=HASH_SEED).to_numpy()
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, hash_key=HASH_KEY.decode("latin1"),
                              categorize=False)


_SM_ADD = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)
_U30, _U27, _U31 = np.uint64(30), np.uint64(27), np.uint64(31)


def _splitmix64(x: np.ndarray, out: np.ndarray | None = None,
                tmp: np.ndarray | None = None) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) —
    a high-quality 64-bit mix at numpy register speed.

    With ``out``/``tmp`` scratch buffers the whole mix runs IN PLACE:
    zero allocations and ~3x less memory traffic than the naive
    temporary-per-op form — this kernel is memory-bandwidth-bound at
    scale (round-1 scaling verdict), so bytes moved is what matters.
    """
    xs = x if x.dtype == np.uint64 else x.view(np.uint64)
    if out is None:
        out = np.empty_like(xs)
    if out is not xs:
        np.copyto(out, xs)
    if tmp is None:
        tmp = np.empty_like(out)
    out += _SM_ADD
    np.right_shift(out, _U30, out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    out *= _SM_M1
    np.right_shift(out, _U27, out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    out *= _SM_M2
    np.right_shift(out, _U31, out=tmp)
    np.bitwise_xor(out, tmp, out=out)
    return out


_NULL_SENTINEL = np.uint64(0x9AE16A3B2F90404F)


def column_hash(arr, out: np.ndarray | None = None,
                tmp: np.ndarray | None = None) -> np.ndarray:
    """Per-column 64-bit hash with a zero-allocation fast path.

    Numeric / temporal / boolean columns hash their RAW fixed-width
    values through splitmix64 (the 8-byte pattern is already an
    injective canonical form — no string cast, no buffer concat);
    string / binary / other columns go through the canonical-bytes +
    xxHash path. Nulls hash to a fixed sentinel (null == null,
    matching the canonical "" semantics). ``out``/``tmp`` are optional
    uint64 scratch buffers (batch length) that let the fast path run
    with zero allocations; the result may or may not alias ``out``.
    """
    import pyarrow as pa

    from . import canonical

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_dictionary(t):
        # hash the (tiny) dictionary once, then GATHER by index — the
        # encoded column's strings never materialize, so a
        # low-cardinality column costs ~8 bytes/row of traffic instead
        # of its decoded bytes. Values match the decoded-column hash
        # exactly (same per-value digests).
        if len(arr.dictionary) == 0:  # all-null dictionary column
            return np.full(len(arr), _NULL_SENTINEL, dtype=np.uint64)
        hv = column_hash(arr.dictionary)
        idx = arr.indices.fill_null(0).to_numpy(zero_copy_only=False)
        h = hv[idx.astype(np.int64, copy=False)]
        if arr.null_count:
            mask = arr.is_null().to_numpy(zero_copy_only=False)
            h[mask] = _NULL_SENTINEL  # h is fresh from the gather
        return h
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
        h = _splitmix64(v, out=out, tmp=tmp)
        if nulls:
            h[mask] = _NULL_SENTINEL  # h is owned scratch — in place
        return h
    if _pl is not None and (pa.types.is_list(t) or pa.types.is_large_list(t)
                            or pa.types.is_fixed_size_list(t)
                            or pa.types.is_struct(t)):
        # nested columns (embeddings list<float>, struct metadata):
        # polars hashes the nested buffers directly — ~100x the
        # canonical str()-per-row fallback; identical-value lists hash
        # equal, nulls get the uniform sentinel
        try:
            h = _pl.from_arrow(arr).hash(seed=HASH_SEED).to_numpy()
            if arr.null_count:
                mask = arr.is_null().to_numpy(zero_copy_only=False)
                h = h.copy()
                h[mask] = _NULL_SENTINEL
            return h
        except Exception:  # exotic nesting: fall through to canonical
            pass
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


_ROT_L, _ROT_R = np.uint64(13), np.uint64(51)
_MIX_MUL = np.uint64(0x9E3779B97F4A7C15)


def row_hash(table, columns: list[str] | None = None) -> np.ndarray:
    """Order-dependent combined row hash over ``columns``.

    Equality semantics are per-column exact-value (STRICTER than the
    reference's string-concat — no cross-column boundary or null/""
    collisions for typed columns); two rows hash equal iff every
    column's value is identical. The mix (rotate-xor-multiply of
    column hashes) is order-dependent so column order matters, like
    the reference's ordered concat (HashHandler.java:37-61).

    The whole combine runs in place over three preallocated buffers
    (accumulator + two scratch): zero temporaries per column, so the
    kernel's memory traffic is one read of each column's raw values
    plus the accumulator round-trips — the bandwidth floor for this
    digest (round-1 scaling item).
    """
    cols = columns if columns is not None else table.column_names
    n = table.num_rows
    if not cols or n == 0:
        return np.empty(0, dtype=np.uint64)
    h: np.ndarray | None = None
    hc_buf = np.empty(n, dtype=np.uint64)
    t = np.empty(n, dtype=np.uint64)
    for c in cols:
        if h is None:
            h = column_hash(table.column(c), out=None, tmp=t)
            if not (isinstance(h, np.ndarray) and h.flags.writeable):
                h = np.array(h, dtype=np.uint64)
            continue
        hc = column_hash(table.column(c), out=hc_buf, tmp=t)
        # h = ((h << 13) | (h >> 51)) ^ hc) * GOLDEN, all in place
        np.left_shift(h, _ROT_L, out=t)
        np.right_shift(h, _ROT_R, out=h)
        np.bitwise_or(t, h, out=h)
        np.bitwise_xor(h, hc, out=h)
        np.multiply(h, _MIX_MUL, out=h)
    return h


def keyed_column_hash(khash: np.ndarray, col) -> np.ndarray:
    """One column's value hash BOUND to its row key — the per-column
    sibling of ``row_hash``'s combine step (rotate-xor-multiply of
    the key hash with the column hash). Binding matters: an unkeyed
    per-column XOR signature would let two rows SWAP values inside a
    bucket and cancel; keyed, any (key, value) change moves the
    signature. Used by the column-level manifest
    (``stages.manifest.write_column_manifest``)."""
    t = np.empty(len(khash), dtype=np.uint64)
    h = khash.astype(np.uint64, copy=True)
    hc = column_hash(col, tmp=t)
    np.left_shift(h, _ROT_L, out=t)
    np.right_shift(h, _ROT_R, out=h)
    np.bitwise_or(t, h, out=h)
    np.bitwise_xor(h, np.asarray(hc, dtype=np.uint64), out=h)
    np.multiply(h, _MIX_MUL, out=h)
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

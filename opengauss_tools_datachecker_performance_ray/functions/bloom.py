"""Distributed bloom filter over a key column — semi-join pruning.

The reference ships every row hash through Kafka and joins at the
comparator (`check/slice/SliceCheckWorker.java:263-289`); it has no
membership pre-filter because both endpoints stream everything anyway.
At 100 TB a referential check between a huge parent table (urls) and a
child table shuffles BOTH full key sets. A bloom filter built over the
CHILD keys and broadcast to the parent scan drops every parent key no
child references BEFORE the shuffle — exactly (bloom false positives
keep a few extra parents, which is harmless; there are no false
negatives, so no referenced parent is ever dropped and the anti-join
result is bit-identical). This is the classic bloom semi-join: parent
shuffle volume falls from |parent| to |referenced keys| + fpp·|parent|.

Sizing: m = bits_per_key · n rounded up to a byte, k = ln2 ·
bits_per_key hash probes via double hashing (Kirsch-Mitzenmacher:
pos_i = h1 + i·h2 mod m — two 64-bit hashes give k independent-enough
probes). At the default 12 bits/key the false-positive rate is ~0.3%;
the bitmap for 10^9 child keys is 1.5 GB — a single plasma object
every parent task reads zero-copy (uint8 numpy DOES zero-copy from the
object store, unlike the object-dtype key arrays the broadcast
anti-join ships).

Build routes (the scaled auto-route pattern used across the repo):

- driver fold (default at small n): each block emits its keys' bit
  POSITIONS (deduped uint64s); the driver streams them via
  ``iter_batches`` and sets bits. Driver ingress ≈ 8·k bytes/key.
- shard-partitioned (``shard_build=True`` or auto above
  ``DRIVER_BLOOM_MAX_ROWS``): positions are tagged with
  ``shard = pos // shard_bits`` and grouped; each shard group packs
  its OWN slice of the bitmap and ships only the packed bytes, so the
  driver receives exactly m/8 bytes total no matter how many rows or
  blocks contributed. The position shuffle is fixed-width uint64 rows
  — the cheapest shuffle shape there is.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from . import hashing

# above this many build-side rows the per-position driver fold
# (≈ 8·k bytes/key of driver ingress) routes to the shard build
DRIVER_BLOOM_MAX_ROWS = 4_000_000


def bloom_params(n: int, bits_per_key: int = 12) -> tuple[int, int]:
    """(m_bits, k) — m rounded up to a whole byte, k = ln2·bits/key."""
    m = max(64, int(n) * int(bits_per_key))
    m = (m + 7) // 8 * 8
    k = max(1, round(math.log(2) * bits_per_key))
    return m, k


def _probe_hashes(values) -> tuple[np.ndarray, np.ndarray]:
    """(h1, h2) double-hash pair per key; h2 forced odd so the probe
    stride never degenerates."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array) and not pa.types.is_large_string(
            values.type):
        values = values.cast(pa.string()).cast(pa.large_string())
    h1 = np.ascontiguousarray(hashing.hash64(values), dtype=np.uint64)
    h2 = hashing._splitmix64(h1.copy())
    h2 |= np.uint64(1)
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
    """All k probe positions for every key, flat uint64 array."""
    mm = np.uint64(m)
    out = np.empty(k * len(h1), dtype=np.uint64)
    acc = h1.copy()
    for i in range(k):
        np.mod(acc, mm, out=out[i * len(h1):(i + 1) * len(h1)])
        acc += h2
    return out


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    byte = (pos >> np.uint64(3)).astype(np.int64)
    mask = np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
    np.bitwise_or.at(bits, byte, mask)


@dataclass
class BloomFilter:
    """Immutable bitmap + params; test with :meth:`contains`."""

    m: int
    k: int
    bits: np.ndarray  # uint8, length m/8

    def contains(self, values) -> np.ndarray:
        """Vectorized membership test -> bool ndarray (no false
        negatives; false positives at the sized fpp)."""
        h1, h2 = _probe_hashes(values)
        if not len(h1):
            return np.zeros(0, dtype=bool)
        mm = np.uint64(self.m)
        ok = np.ones(len(h1), dtype=bool)
        acc = h1.copy()
        pos = np.empty_like(acc)
        for _ in range(self.k):
            np.mod(acc, mm, out=pos)
            byte = (pos >> np.uint64(3)).astype(np.int64)
            bit = (pos & np.uint64(7)).astype(np.uint8)
            ok &= (self.bits[byte] >> bit) & np.uint8(1) != 0
            acc += h2
        return ok

    @classmethod
    def from_values(cls, values, m: int, k: int) -> "BloomFilter":
        bits = np.zeros(m // 8, dtype=np.uint8)
        h1, h2 = _probe_hashes(values)
        if len(h1):
            _set_bits(bits, _positions(h1, h2, m, k))
        return cls(m, k, bits)


def build_bloom(ds, col: str, n_estimate: int,
                bits_per_key: int = 12,
                shard_build: bool | None = None,
                shard_bytes: int = 1 << 20) -> BloomFilter:
    """Build a :class:`BloomFilter` over ``ds[col]`` (nulls ignored).

    ``shard_build=None`` auto-routes on ``n_estimate`` (module
    docstring). Both routes produce the IDENTICAL bitmap (tested):
    bit-setting is commutative, so build order never matters.
    """
    m, k = bloom_params(n_estimate, bits_per_key)
    if shard_build is None:
        shard_build = n_estimate > DRIVER_BLOOM_MAX_ROWS

    shard_bits = shard_bytes * 8
    with_shard = bool(shard_build)  # driver fold never reads shards

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        vals = vals.drop_null()
        h1, h2 = _probe_hashes(vals)
        pos = np.unique(_positions(h1, h2, m, k)) if len(h1) \
            else np.array([], dtype=np.uint64)
        cols = {"pos": pa.array(pos)}
        if with_shard:
            cols["shard"] = pa.array(
                (pos // np.uint64(shard_bits)).astype(np.int32))
        return pa.table(cols)

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow")

    bits = np.zeros(m // 8, dtype=np.uint8)
    if not shard_build:
        for b in partials.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20):
            pos = b.column("pos").to_numpy(zero_copy_only=False)
            _set_bits(bits, np.asarray(pos, dtype=np.uint64))
        return BloomFilter(m, k, bits)

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        base = np.uint64(shard * shard_bits)
        width = min(shard_bytes, m // 8 - shard * shard_bytes)
        local = np.zeros(width, dtype=np.uint8)
        pos = g["pos"].to_numpy(dtype=np.uint64) - base
        _set_bits(local, pos)
        return pd.DataFrame({"shard": [shard],
                             "packed": [local.tobytes()]})

    packed = partials.groupby("shard").map_groups(
        pack_shard, batch_format="pandas")
    for b in packed.iter_batches(batch_format="pandas", batch_size=64):
        for shard, blob in zip(b["shard"], b["packed"]):
            off = int(shard) * shard_bytes
            arr = np.frombuffer(bytes(blob), dtype=np.uint8)
            bits[off:off + len(arr)] = arr
    # shards with no positions never appear in the groupby: their
    # bitmap slices simply stay zero
    return BloomFilter(m, k, bits)

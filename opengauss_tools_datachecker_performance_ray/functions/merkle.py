"""Merkle tree over per-partition bucket signatures.

Mirrors ``check/modules/merkle/MerkleTree.java:39-212``: leaves are the
hash buckets' XOR signatures in bucket-number order; internal node
signatures are Adler-32 over the concatenated child signatures; height
is bounded (<= 15, i.e. <= 2^15 leaves —
``check/modules/bucket/BuilderBucketHandler.java:37-41``).

The tree's only job is pruning: equal node signatures ==> the whole
subtree's buckets are equal and are skipped; compare descends only into
differing subtrees and yields the differing leaf bucket numbers
(``check/slice/SliceCheckWorker.java:243-307``). Missing buckets are
padded with empty signatures, the outer bucket alignment of
``SliceCheckWorker.java:410-452``.
"""

from __future__ import annotations

import zlib

import numpy as np

_EMPTY_LEAF = np.uint64(0)  # empty bucket: XOR identity, count 0


def build_levels(leaf_sigs: np.ndarray) -> list[np.ndarray]:
    """Bottom-up levels; ``levels[0]`` = leaves (uint64), top = root.

    Leaf array length must be a power of two (pad with empty buckets).
    Internal signatures are ``adler32(left_bytes || right_bytes)``
    stored as uint64 (value fits in 32 bits).
    """
    n = len(leaf_sigs)
    assert n and (n & (n - 1)) == 0, "leaf count must be a power of two"
    levels = [leaf_sigs.astype(np.uint64, copy=False)]
    cur = levels[0]
    while len(cur) > 1:
        # vectorize the byte packing; adler32 itself is per-node but the
        # node count halves every level (<= 2^15 leaves ==> cheap)
        raw = cur.astype(">u8").tobytes()
        nxt = np.fromiter(
            (zlib.adler32(raw[i * 16:(i + 1) * 16]) for i in range(len(cur) // 2)),
            dtype=np.uint64, count=len(cur) // 2,
        )
        levels.append(nxt)
        cur = nxt
    return levels


def merkle_root(leaf_sigs: np.ndarray) -> int:
    return int(build_levels(leaf_sigs)[-1][0])


def diff_buckets(src_leaves: np.ndarray, snk_leaves: np.ndarray) -> np.ndarray:
    """Bucket numbers whose subtrees differ, via recursive signature prune.

    Equivalent result to comparing leaves directly (and we exploit that
    with a vectorized leaf compare), but we verify internal-node
    signatures first so that the common all-clean case is O(1): equal
    roots ==> no descent at all — the reference's
    ``SliceCheckWorker.compareMerkleTree`` short-circuit.
    """
    assert len(src_leaves) == len(snk_leaves)
    src_levels = build_levels(src_leaves)
    snk_levels = build_levels(snk_leaves)
    if int(src_levels[-1][0]) == int(snk_levels[-1][0]):
        return np.empty(0, dtype=np.int64)
    return np.nonzero(src_leaves != snk_leaves)[0].astype(np.int64)


def pad_leaves(bucket_no: np.ndarray, sigs: np.ndarray,
               num_buckets: int) -> np.ndarray:
    """Dense power-of-two leaf array from sparse (bucket_no, sig) pairs."""
    leaves = np.full(num_buckets, _EMPTY_LEAF, dtype=np.uint64)
    if len(bucket_no):
        leaves[bucket_no] = sigs.astype(np.uint64, copy=False)
    return leaves


# weights for the vectorized 16-byte adler32: byte i (0-indexed)
# contributes (16 - i) copies of itself to s2
_ADLER_W16 = np.arange(16, 0, -1, dtype=np.uint32)


def _adler_pair_level(nodes: np.ndarray) -> np.ndarray:
    """One Merkle level for MANY trees at once: ``(P, 2k) -> (P, k)``.

    Each internal signature is ``zlib.adler32`` over the 16 big-endian
    bytes of the two child values — exactly ``build_levels``' per-node
    computation, but closed-form: a 16-byte message can never reach the
    adler modulus (s1 <= 1 + 16*255 = 4081 < 65521 and
    s2 <= 16 + 136*255 = 34696 < 65521), so adler32 collapses to two
    weighted byte sums and the whole level is one vectorized pass.
    """
    P, n = nodes.shape
    b = np.ascontiguousarray(nodes.astype(">u8")).view(np.uint8) \
        .reshape(P, n // 2, 16).astype(np.uint32)
    s1 = 1 + b.sum(axis=2, dtype=np.uint32)
    s2 = 16 + (b * _ADLER_W16).sum(axis=2, dtype=np.uint32)
    return (s2.astype(np.uint64) << np.uint64(16)) | s1.astype(np.uint64)


def merkle_root_many(leaves_2d: np.ndarray) -> np.ndarray:
    """Roots of ``P`` Merkle trees in one shot: ``(P, B) -> (P,)``.

    Bit-identical to ``merkle_root`` per row (tested), but vectorized
    across partitions — the driver-side signature merge computes two
    roots per partition and the per-row zlib loop was its floor.
    """
    arr = np.asarray(leaves_2d, dtype=np.uint64)
    assert arr.ndim == 2 and arr.shape[1] > 0
    B = arr.shape[1]
    assert (B & (B - 1)) == 0, "leaf count must be a power of two"
    while arr.shape[1] > 1:
        arr = _adler_pair_level(arr)
    return arr[:, 0]

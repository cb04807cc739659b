"""Sequence packing — distributed prefix-sum assignment of documents
to fixed-token training chunks.

LLM training consumes fixed-length sequences (e.g. 2048 tokens); the
standard preprocessing step concatenates the tokenized corpus in a
deterministic document order and slices it into chunks, so every
document needs its global token offset — a prefix sum over ~1e10 rows
that no single node can hold. The classic two-pass scan:

1. one streaming pass folds per-RANGE-BUCKET token sums (bucket =
   ``id // bucket_width``, a partial aggregate inside ``map_batches``
   followed by one tiny groupby);
2. the driver prefix-sums the bucket totals (one int64 per bucket —
   ``bucket_width`` sizes this: 4096 keeps 1e10 docs at ~2.4M buckets
   / ~40 MB) and broadcasts (bucket -> start offset) via one
   ``ray.put``;
3. a second pass co-locates each bucket (groupby), sorts by id inside
   the bucket, and emits exact per-document offsets and chunk spans.

Both passes ship 24-byte (id, bucket, n_tokens) rows — text never
moves. The result is a pure function of (id order, weights, chunk
size): stable across runs, partitionings and cluster sizes, and
integer-exact in SQL (``SUM(w) OVER (ORDER BY id ROWS BETWEEN
UNBOUNDED PRECEDING AND 1 PRECEDING)``), so oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_chunks(weights, id_col: str, weight_col: str, chunk_size: int,
                *, bucket_width: int = 4096,
                carry_cols: list[str] | None = None):
    """Assign each row of ``weights`` (a Dataset with integer ``id_col``
    >= 0 and non-negative int ``weight_col``) its place in the packed
    stream: ``(id_col, weight_col, offset, chunk_first, chunk_last)``
    where ``offset`` is the global sum of weights over all smaller ids
    and the chunk span covers the row's tokens (zero-weight rows pin to
    the boundary chunk ``offset // chunk_size``). ``id_col`` must be
    unique; document order is ascending id. ``carry_cols`` ride along
    unchanged (metadata a downstream rollup groups by)."""
    import ray
    from ray.data.aggregate import Sum

    carry = list(carry_cols or [])

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False)
        out = pd.DataFrame({
            id_col: ids.astype(np.int64),
            "bucket": (ids // bucket_width).astype(np.int64),
            "w": w.astype(np.int64)})
        for c in carry:
            out[c] = batch.column(c).to_pandas().to_numpy()
        return out

    rows = weights.map_batches(bucketize,
                               batch_format="pyarrow").materialize()

    # pass 1: bucket totals -> driver prefix scan (one int per bucket)
    totals = rows.groupby("bucket").aggregate(
        Sum("w", alias_name="tw")).to_pandas()
    totals = totals.sort_values("bucket")
    buckets = totals["bucket"].to_numpy(dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(
        totals["tw"].to_numpy(dtype=np.int64))[:-1]])
    offsets_ref = ray.put((buckets, starts))

    # pass 2: exact offsets inside each co-located bucket
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        bkts, offs = ray.get(offsets_ref)
        g = g.sort_values(id_col, kind="stable")
        w = g["w"].to_numpy(dtype=np.int64)
        base = offs[np.searchsorted(bkts, int(g["bucket"].iloc[0]))]
        off = base + np.concatenate([[0], np.cumsum(w)[:-1]])
        first = off // chunk_size
        last = np.where(w > 0, (off + w - 1) // chunk_size, first)
        out = pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            weight_col: w,
            "offset": off.astype(np.int64),
            "chunk_first": first.astype(np.int64),
            "chunk_last": last.astype(np.int64)})
        for c in carry:
            out[c] = g[c].to_numpy()
        return out

    return rows.groupby("bucket").map_groups(assign, batch_format="pandas")

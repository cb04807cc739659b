"""Custom join operators Ray Data lacks natively.

Per the build brief's custom-operator rule: expressed as a composition
of ``map_batches`` + one bucketed ``groupby().map_groups`` where the
semantics allow, with the partitioning assumption documented.

As-of join: for each left row, attach the right row with the greatest
``right_ts <= left_ts`` within the same key (event -> latest prior
order, trade -> prevailing quote). Partitioning assumption: all rows
of one key co-locate, guaranteed by tagging BOTH sides with
``bucket = hash64(key) % B`` (the same co-partitioning invariant the
compare engine uses — ``functions/hashing.py assign_buckets``); the
in-group kernel is one vectorized ``pandas.merge_asof`` over the
bucket's keys. Only the named columns ever move: the shuffle volume is
(key, ts, carried columns), never whole rows. Both sides emit ONE
shared schema (the absent side's carried columns ride as typed nulls)
so the union and every group block stay dtype-stable.

Tie semantics: among right rows sharing the greatest qualifying
``right_ts``, the MATCHED TIMESTAMP is deterministic; which peer row's
carried values surface follows pandas' last-in-sort-order rule — carry
value columns only when (key, ts) is unique on the right, or
pre-aggregate to make it so (same caveat SQL ASOF JOIN has).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64


def _arrow_schema(ds) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def _key_bucket(k, num_buckets: int) -> tuple[pa.Array, pa.Array]:
    """Canonical (key array, int32 bucket = hash64(key) % B) pair —
    the co-partitioning tag every join side applies."""
    if isinstance(k, pa.ChunkedArray):
        k = k.combine_chunks()
    ks = k if pa.types.is_large_string(k.type) else \
        k.cast(pa.string()).cast(pa.large_string())
    kh = hash64(ks)
    return k, pa.array((kh % np.uint64(num_buckets)).astype(np.int32))


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              left_cols: list[str], right_cols: list[str],
              num_buckets: int = 64, direction: str = "backward"):
    """Dataset as-of join, inner semantics (left rows with no
    qualifying right row are dropped).

    Returns a Dataset with ``left_cols`` + ``key`` + ``left_ts`` +
    matched ``{right_ts}_matched`` + ``right_cols`` (right columns
    suffixed ``_r`` on name collision with a left column).
    """
    lsch, rsch = _arrow_schema(left), _arrow_schema(right)
    ltypes = {c: lsch.field(c).type for c in left_cols}
    rtypes = {c: rsch.field(c).type for c in right_cols}
    ts_type = lsch.field(left_ts).type

    def tag(is_left: bool, ts_col: str):
        def fn(batch: pa.Table) -> pa.Table:
            from ..functions.runtime import pin_worker_threads

            pin_worker_threads()
            n = batch.num_rows
            k, bucket = _key_bucket(batch.column(key), num_buckets)
            out = {key: k,
                   "__bucket": bucket,
                   "__is_left": pa.array(np.full(n, is_left)),
                   "__ts": batch.column(ts_col).cast(ts_type)}
            for c in left_cols:
                out[f"__l_{c}"] = (batch.column(c) if is_left
                                   else pa.nulls(n, type=ltypes[c]))
            for c in right_cols:
                out[f"__r_{c}"] = (pa.nulls(n, type=rtypes[c]) if is_left
                                   else batch.column(c))
            return pa.table(out)

        return fn

    lt = left.map_batches(tag(True, left_ts), batch_format="pyarrow")
    rt = right.map_batches(tag(False, right_ts), batch_format="pyarrow")

    lcols = [f"__l_{c}" for c in left_cols]
    rcols = [f"__r_{c}" for c in right_cols]
    taken = set(left_cols) | {key, left_ts, f"{right_ts}_matched"}
    rnames = {c: (c[4:] if c[4:] not in taken else c[4:] + "_r")
              for c in rcols}
    # authoritative output dtypes from the INPUT Arrow schemas — the
    # bucket block's pandas dtypes are unreliable (the opposite side's
    # typed-null rows upcast int columns to float for the whole block)
    lpd = {f"__l_{c}": t.to_pandas_dtype() for c, t in ltypes.items()}
    rpd = {f"__r_{c}": t.to_pandas_dtype() for c, t in rtypes.items()}
    key_pd = lsch.field(key).type.to_pandas_dtype()
    ts_pd = ts_type.to_pandas_dtype()

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["__is_left"]]
        ri = g[~g["__is_left"]]
        lf = li[[key, "__ts"] + lcols].sort_values("__ts", kind="stable")
        rf = ri[[key, "__ts"] + rcols].sort_values("__ts", kind="stable") \
            .rename(columns={"__ts": "__rts"})
        if len(lf) and len(rf):
            j = pd.merge_asof(lf, rf, left_on="__ts", right_on="__rts",
                              by=key, direction=direction)
            j = j[j["__rts"].notna()]  # inner semantics
        else:
            j = lf.head(0).assign(__rts=pd.Series(dtype="datetime64[us]"))
            for c in rcols:
                j[c] = pd.Series(dtype=rpd[c])
        out = pd.DataFrame(index=j.index)
        for c in lcols:
            # merge_asof's outer step upcasts ints via transient NaNs;
            # the inner filter removed them — restore the input dtype
            out[c[4:]] = j[c].astype(lpd[c], copy=False)
        out[key] = j[key].astype(key_pd, copy=False)
        out[left_ts] = j["__ts"].astype(ts_pd, copy=False)
        out[f"{right_ts}_matched"] = j["__rts"].astype(ts_pd, copy=False)
        for c in rcols:
            out[rnames[c]] = j[c].astype(rpd[c], copy=False)
        return out.reset_index(drop=True)

    return lt.union(rt).groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas")


def range_join(left, right, key: str, left_val: str,
               right_lo: str, right_hi: str,
               left_cols: list[str], right_cols: list[str],
               band_width: int = 64, num_buckets: int = 64):
    """Inequality (range) join: left rows pair with right rows of the
    same ``key`` whose ``[right_lo, right_hi]`` interval contains
    ``left_val`` (inclusive). Ray Data has no native inequality join;
    this is the standard BANDING composition: every right interval
    explodes into the value bands it spans (``band = value //
    band_width``), left rows carry their single band, and one bucketed
    groupby on (hash(key) % B, band) resolves candidates with an
    in-group equi-merge + vectorized range filter. A (left, right)
    pair co-occurs in EXACTLY one band (the left row's), so no
    dedup pass is needed.

    Partitioning assumption: candidate pairs per (key, band) stay
    bounded — size ``band_width`` to the interval scale (bands much
    wider than typical intervals degrade toward a per-key cross
    join; much narrower explode the right side's row count).
    """

    rsch = _arrow_schema(right)
    lsch = _arrow_schema(left)
    rtypes = {c: rsch.field(c).type for c in right_cols}
    ltypes = {c: lsch.field(c).type for c in left_cols}

    def tag_left(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        n = batch.num_rows
        k, bucket = _key_bucket(batch.column(key), num_buckets)
        v = batch.column(left_val).to_numpy(zero_copy_only=False)
        out = {key: k,
               "__lo": batch.column(left_val),  # point "interval"
               "__hi": batch.column(left_val),
               "__band": pa.array((v // band_width).astype(np.int64)),
               "__bucket": bucket,
               "__is_left": pa.array(np.ones(n, dtype=bool))}
        for c in left_cols:
            out[f"__l_{c}"] = batch.column(c)
        for c in right_cols:
            out[f"__r_{c}"] = pa.nulls(n, type=rtypes[c])
        return pa.table(out)

    def tag_right(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        k = batch.column(key)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        lo = batch.column(right_lo).to_numpy(zero_copy_only=False)
        hi = batch.column(right_hi).to_numpy(zero_copy_only=False)
        lo_b = (lo // band_width).astype(np.int64)
        hi_b = (hi // band_width).astype(np.int64)
        reps = np.maximum(hi_b - lo_b + 1, 0).astype(np.int64)
        total = int(reps.sum()) if len(reps) else 0
        if total == 0:
            idx = np.empty(0, dtype=np.int64)
            bands = np.empty(0, dtype=np.int64)
        else:
            idx = np.repeat(np.arange(len(k)), reps)
            # band sequence per exploded row, fully vectorized
            starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
            offs = np.arange(total) - np.repeat(starts, reps)
            bands = lo_b[idx] + offs
        kk, bucket = _key_bucket(k.take(pa.array(idx)), num_buckets)
        out = {key: kk,
               "__lo": batch.column(right_lo).take(pa.array(idx)),
               "__hi": batch.column(right_hi).take(pa.array(idx)),
               "__band": pa.array(bands),
               "__bucket": bucket,
               "__is_left": pa.array(np.zeros(len(idx), dtype=bool))}
        for c in left_cols:
            out[f"__l_{c}"] = pa.nulls(len(idx), type=ltypes[c])
        for c in right_cols:
            out[f"__r_{c}"] = batch.column(c).take(pa.array(idx))
        return pa.table(out)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    lcols = [f"__l_{c}" for c in left_cols]
    rcols = [f"__r_{c}" for c in right_cols]
    taken = set(left_cols) | {key, left_val}
    rnames = {c: (c[4:] if c[4:] not in taken else c[4:] + "_r")
              for c in rcols}
    lpd = {f"__l_{c}": t.to_pandas_dtype() for c, t in ltypes.items()}
    rpd = {f"__r_{c}": t.to_pandas_dtype() for c, t in rtypes.items()}
    key_pd = lsch.field(key).type.to_pandas_dtype()
    val_pd = lsch.field(left_val).type.to_pandas_dtype()

    def join_band(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["__is_left"]]
        ri = g[~g["__is_left"]]
        out = pd.DataFrame()
        if len(li) and len(ri):
            j = li[[key, "__lo"] + lcols].rename(
                columns={"__lo": "__v"}).merge(
                ri[[key, "__lo", "__hi"] + rcols], on=key)
            j = j[(j["__v"] >= j["__lo"]) & (j["__v"] <= j["__hi"])]
        else:
            j = pd.DataFrame(columns=[key, "__v", "__lo", "__hi"]
                             + lcols + rcols)
        for c in lcols:
            out[c[4:]] = j[c].astype(lpd[c], copy=False) if len(j) \
                else pd.Series(dtype=lpd[c])
        out[key] = j[key].astype(key_pd, copy=False) if len(j) \
            else pd.Series(dtype=key_pd)
        out[left_val] = j["__v"].astype(val_pd, copy=False) if len(j) \
            else pd.Series(dtype=val_pd)
        for c in rcols:
            out[rnames[c]] = j[c].astype(rpd[c], copy=False) if len(j) \
                else pd.Series(dtype=rpd[c])
        return out.reset_index(drop=True)

    return lt.union(rt).groupby(["__bucket", "__band"]).map_groups(
        join_band, batch_format="pandas")

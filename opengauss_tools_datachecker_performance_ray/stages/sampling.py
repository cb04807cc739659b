"""Deterministic key-based sampling / dataset splits.

Training pipelines need STABLE splits: the same record must land in
the same split on every run, on any cluster size, under any
partitioning — so sampling must be a pure function of the key, never
of position or RNG state (``ds.random_sample`` gives neither
stability nor complementarity). The kernel is the Knuth multiplicative
hash in 32-bit space::

    u = ((key mod 2^32) * 2654435761) mod 2^32     # exact integers
    keep  <=>  u < floor(rate * 2^32)

which is integer-exact on both the numpy side and in ANSI SQL
(``((CAST(k AS UBIGINT) % 4294967296) * 2654435761) % 4294967296``) —
so sampled pipelines stay oracle-checkable. Keys must be non-negative
integers (urls etc. should pass a 64-bit key hash first; mixing
engines then requires the same hash, so integer surrogate keys are
the portable form).

Every stage is a stateless ``map_batches`` filter — no shuffle, no
driver state, trivially resumable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(4294967296)


def _keep_mask(keys: np.ndarray, threshold: int) -> np.ndarray:
    return knuth_u32(keys) < np.uint64(threshold)


def sample_threshold(rate: float) -> int:
    """floor(rate * 2^32) — the integer the SQL oracle must use too."""
    return int(rate * 4294967296)


def stable_sample(ds, key_col: str, rate: float):
    """Keep ~``rate`` of rows, deterministically by key."""
    thr = sample_threshold(rate)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_keep_mask(keys, thr)))

    return ds.map_batches(keep, batch_format="pyarrow")


def knuth_u32(keys: np.ndarray) -> np.ndarray:
    """The raw 32-bit Knuth hash value (the order key ``cap_per_group``
    ranks by; integer-exact in SQL, see module doc)."""
    return ((keys.astype(np.uint64) % _M32) * _KNUTH) % _M32


def cap_per_group(ds, group_col: str, key_col: str, k: int):
    """Keep at most ``k`` rows per group, chosen deterministically by
    the Knuth hash of ``key_col`` (ties broken by the key itself) — the
    per-domain/source cap every web-corpus curation recipe applies so
    one hot domain cannot dominate the training mix (axis: Common-
    Crawl-style per-domain limits). Which rows survive is a pure
    function of (key, k), never of partitioning — so the cap is
    SQL-reproducible: ``QUALIFY row_number() OVER (PARTITION BY grp
    ORDER BY knuth(key), key) <= k``.

    Scale shape: top-k is a semilattice under the (hash, key) order,
    so a per-batch partial head(k) runs before the one
    groupby(group) shuffle — at most ``k`` rows per (batch, group)
    move, text and all. The final per-group candidate set is bounded
    by k x (batches containing the group); for corpora where that
    product is large, insert a ``repartition`` + second partial pass
    between (the partial is idempotent).
    """
    import pandas as pd
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow/numpy-native grouped head(k): the full-input scan never
        # converts to pandas. One lexsort by (group, u, key), then a
        # vectorized within-group rank; ≤k surviving rows per
        # (batch, group), original row order preserved by take().
        n = batch.num_rows
        if n <= k:
            return batch
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        u = knuth_u32(keys)
        grp = batch.column(group_col)
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        # per-chunk dictionaries would not be comparable; a combined
        # array gets ONE dictionary. Null group stays its own group
        # (index -1 can never collide with a real dictionary index).
        if not pa.types.is_dictionary(grp.type):
            grp = pc.dictionary_encode(grp)
        gidx = grp.indices.fill_null(-1).to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, u, gidx))
        g = gidx[order]
        pos = np.arange(n)
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = g[1:] != g[:-1]
        rank = pos - np.maximum.accumulate(np.where(boundary, pos, 0))
        sel = order[rank < k]
        sel.sort()
        return batch.take(pa.array(sel))

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        u = knuth_u32(g[key_col].to_numpy())
        return g.assign(_u=u.astype(np.int64)) \
            .sort_values(["_u", key_col], kind="stable") \
            .head(k).drop(columns=["_u"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(final, batch_format="pandas")


def split_train_holdout(ds, key_col: str, holdout_frac: float):
    """(train, holdout) — complementary by construction: every key
    falls in exactly one side, stable across runs and partitionings."""
    thr = sample_threshold(holdout_frac)

    def side(is_holdout: bool):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            m = _keep_mask(keys, thr)
            return batch.filter(pa.array(m if is_holdout else ~m))
        return fn

    return (ds.map_batches(side(False), batch_format="pyarrow"),
            ds.map_batches(side(True), batch_format="pyarrow"))


def stratified_sample(ds, key_col: str, group_col: str,
                      rates: dict, default_rate: float = 1.0):
    """Per-group sampling rates over one stream — the data-MIXING
    primitive (upsample rare languages / downsample hot sources to a
    target distribution, the Common-Crawl -> training-mix step every
    LLM corpus recipe applies). ``rates`` maps group value -> keep
    rate; unlisted (and null) groups use ``default_rate``.

    Same Knuth-hash kernel as ``stable_sample``, so strata are NESTED:
    raising a group's rate only ADDS rows, never reshuffles the ones
    already kept — reproducible curriculum growth. Stateless
    map_batches filter; no shuffle at any corpus size; integer-exact
    in SQL (one CASE over the same thresholds)."""
    thr_map = {g: sample_threshold(r) for g, r in rates.items()}
    dthr = sample_threshold(default_rate)
    gtype = dict(zip(ds.schema().names, ds.schema().types)) \
        .get(group_col)
    if thr_map and isinstance(gtype, pa.DataType):
        # a silent type mismatch would apply default_rate to every
        # row — the declared per-group rates become a no-op; check
        # every key against the column's type family, both directions
        if pa.types.is_dictionary(gtype):
            gtype = gtype.value_type
        if pa.types.is_string(gtype) or pa.types.is_large_string(gtype):
            ok = (str, np.str_)
        elif pa.types.is_integer(gtype) or pa.types.is_floating(gtype):
            # 2 == 2.0 maps fine either way; numpy scalars hash equal
            # to their Python counterparts, so keys from pc.unique()
            # / df[col].unique() are valid
            ok = (int, float, np.integer, np.floating)
        elif pa.types.is_boolean(gtype):
            ok = (bool, np.bool_)
        else:
            ok = (object,)
        boolish = ok == (bool, np.bool_)
        bad = [g for g in thr_map
               if g is None
               or isinstance(g, (bool, np.bool_)) != boolish
               or not isinstance(g, ok)]
        if bad:
            raise ValueError(
                f"rates keys {bad!r} do not match {group_col!r} type "
                f"{gtype} — a mismatched key can never select a row; "
                f"pass keys of the column's type")

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        u = knuth_u32(keys)
        grp = batch.column(group_col).to_pandas()
        # float64 holds every threshold (< 2^32) exactly
        thr = grp.map(thr_map).fillna(float(dthr)) \
            .to_numpy(dtype=np.float64).astype(np.uint64)
        return batch.filter(pa.array(u < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_threshold_case_sql(group_col: str, rates: dict,
                                  default_rate: float) -> str:
    """The SQL threshold expression built from the SAME rates dict
    the Ray filter uses (single source of truth for the oracle).
    Values are escaped via the rule engine's literal quoting; an
    empty rates dict degenerates to the plain default threshold
    (matching the Ray filter's all-default behavior)."""
    from ..pipelines.rules import _sql_lit

    if not rates:
        return str(sample_threshold(default_rate))
    whens = " ".join(
        f"WHEN {group_col} = {_sql_lit(g)} THEN {sample_threshold(r)}"
        for g, r in rates.items())
    return f"CASE {whens} ELSE {sample_threshold(default_rate)} END"

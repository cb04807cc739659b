"""Constraint checks: uniqueness, referential integrity, distribution
drift (KS / PSI).

North-rule extensions (SURVEY.md §2.4/§2.5/§2.7 "north-star extension"
rows — the reference assumes PK-unique input and has no FK or drift
checks). All are expressed shuffle-consciously:

- uniqueness: per-batch partial (key -> count) pre-aggregation inside
  ``map_batches``, then a groupby over the partials — the shuffle moves
  one row per *distinct key per block*, not per row; violations are
  groups with total count > 1.
- referential: broadcast semi-join when the parent key set is small
  (``ray.put`` once, ``np.isin`` per batch); hash-partitioned anti-join
  via the shared bucket scheme when both sides are large.
- drift: no extra pass at all — KS statistic from two t-digest CDFs,
  PSI from two categorical TopCounters, both computed from profile
  sketches that are already merged per side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.sketches import TDigest, TopCounter

# ---------------------------------------------------------------------------
# Uniqueness
# ---------------------------------------------------------------------------


DRIVER_UNIQUENESS_MAX_ROWS = 2_000_000


def uniqueness_violations(ds, key_columns: list[str],
                          batch_size: int | None = None,
                          num_buckets: int = 64,
                          approx_rows: int | None = None):
    """Dataset of (key..., n) rows for keys appearing more than once.

    Two-phase: vectorized per-batch value_counts partials (the combiner
    — SURVEY.md §4 'pre-aggregate inside map_batches'), each partial
    row tagged with ``ubucket = hash(keys) % num_buckets``; then ONE
    bucketed groupby whose groups reduce with a vectorized pandas
    groupby-sum. The shuffle moves one row per distinct key per block
    and has ``num_buckets``-way parallelism instead of a per-key sort.

    With an ``approx_rows`` hint at or below
    ``DRIVER_UNIQUENESS_MAX_ROWS``, the partials stream straight to
    the driver and merge in one pandas groupby — no shuffle at all
    (the signature-aggregation pattern applied to counting).
    """
    from ..functions import hashing

    cols = list(key_columns)

    def partial_counts(batch: pa.Table) -> pa.Table:
        sub = batch.select(cols)
        # SQL UNIQUE-constraint semantics: null key parts never
        # violate (previously happened accidentally in the pandas
        # reduce's dropna; made explicit here so every route agrees)
        m = pc.is_valid(sub.column(cols[0]))
        for c in cols[1:]:
            m = pc.and_(m, pc.is_valid(sub.column(c)))
        sub = sub.filter(m)
        gb = sub.group_by(cols).aggregate([([], "count_all")])
        gb = gb.rename_columns(cols + ["n_part"])
        key0 = gb.column(cols[0])
        if not (pa.types.is_large_string(key0.type)):
            key0 = key0.cast(pa.string()).cast(pa.large_string())
        kh = hashing.hash64(key0)
        for c in cols[1:]:
            extra = gb.column(c)
            if not pa.types.is_large_string(extra.type):
                extra = extra.cast(pa.string()).cast(pa.large_string())
            kh = kh ^ hashing.hash64(extra)
        return gb.append_column(
            "ubucket", pa.array((kh % np.uint64(num_buckets)).astype(np.int32)))

    partials = ds.map_batches(partial_counts, batch_format="pyarrow",
                              batch_size=batch_size)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(cols, sort=False)["n_part"].sum().reset_index(name="n")
        return tot[tot["n"] > 1]

    if approx_rows is not None and approx_rows <= DRIVER_UNIQUENESS_MAX_ROWS:
        import ray.data as rd

        g = partials.to_pandas()
        out = reduce(g) if len(g) else pd.DataFrame(
            columns=cols + ["n"])
        return rd.from_pandas(out[cols + ["n"]] if len(out) else out)

    return partials.groupby("ubucket").map_groups(
        reduce, batch_format="pandas").select_columns(cols + ["n"])


def fd_violating_groups(ds, determinant, dependent: str,
                        num_buckets: int = 64,
                        batch_size: int | None = None,
                        evidence_rows: bool = False,
                        scope_col: str | None = None,
                        null_scope: str = "<null>"):
    """EXACT count of determinant groups violating the functional
    dependency ``determinant -> dependent`` (the FD constraint every
    profiling engine ships; the reference assumes its PK -> row FD by
    construction — `extract/util/HashHandler.java:37-97` keys every
    row digest by the PK — this is that assumption made checkable for
    arbitrary column pairs).

    A group violates when its (all-non-null) determinant value maps
    to MORE than one distinct non-null dependent value — SQL
    ``GROUP BY det HAVING count(DISTINCT dep) > 1`` with an explicit
    ``det IS NOT NULL`` filter (both engines state the null handling,
    so parity is by construction; dep nulls are skipped like SQL
    COUNT DISTINCT).

    Shuffle shape: each block dedupes its (det..., dep) pairs in one
    Arrow group_by (the combiner) and tags them with
    ``hash(det) % num_buckets``, so ONE bucketed groupby co-locates
    each determinant's pairs; the in-bucket reduce counts distinct
    deps per det vectorized and emits ONE integer row per bucket —
    the driver folds ``num_buckets`` tiny rows. The shuffle moves one
    row per distinct pair per block, bounded by pair cardinality,
    never row count. Skew note: a determinant with a huge distinct-
    dependent cardinality concentrates in one bucket (same envelope
    as ``uniqueness_violations``); values compare via their canonical
    Arrow string cast (distinct-preserving for integer/string/bool
    columns — for float dependents prefer range/stddev rules, the
    ``scoped_distinct_counts`` caveat).

    Returns the violating-group count (int); with
    ``evidence_rows=True`` returns instead a Dataset of one
    (det..., n_dep) row per violating determinant group — the
    violation evidence, SQL ``GROUP BY det HAVING
    count(DISTINCT dep) > 1`` verbatim.

    With ``scope_col`` the dependency is evaluated WITHIN each scope
    (determinant groups are (scope, det) — the per-partition verdict
    shape of the north rule): the scalar form returns
    ``{scope: n_violating_groups}`` (scopes with zero violations
    absent), the evidence form adds a ``scope`` column. Scope nulls
    map to ``null_scope`` and are kept (a partition key of NULL is a
    partition, matching the rule report's convention); determinant /
    dependent null handling is unchanged."""
    from ..functions import hashing

    det = [determinant] if isinstance(determinant, str) \
        else list(determinant)
    pair_cols = det + [dependent]
    if scope_col and "scope" in pair_cols:
        raise ValueError("scoped FD reserves the column name 'scope'")
    grp_cols = (["scope"] if scope_col else []) + det
    all_cols = grp_cols + [dependent]

    def _canon(col: pa.ChunkedArray) -> pa.ChunkedArray:
        if pa.types.is_large_string(col.type):
            return col
        return col.cast(pa.string()).cast(pa.large_string())

    def partial_pairs(batch: pa.Table) -> pa.Table:
        sel = list(pair_cols)
        if scope_col and scope_col not in sel:
            sel.append(scope_col)  # scope may also be a det column
        sub = batch.select(sel)
        m = pc.is_valid(sub.column(pair_cols[0]))
        for c in pair_cols[1:]:
            m = pc.and_(m, pc.is_valid(sub.column(c)))
        sub = sub.filter(m)
        if any(pa.types.is_null(sub.column(c).type) for c in pair_cols):
            sub = sub.slice(0, 0)  # all-null column: no checkable pair
        cols = {}
        if scope_col:
            cols["scope"] = pc.fill_null(
                _canon(sub.column(scope_col)), null_scope)
        cols.update({c: _canon(sub.column(c)) for c in pair_cols})
        sub = pa.table(cols)
        gb = sub.group_by(all_cols).aggregate([])  # block pair dedup
        kh = hashing.hash64(gb.column(grp_cols[0]))
        for c in grp_cols[1:]:
            kh = kh ^ hashing.hash64(gb.column(c))
        return gb.append_column(
            "fbucket",
            pa.array((kh % np.uint64(num_buckets)).astype(np.int32)))

    partials = ds.map_batches(partial_pairs, batch_format="pyarrow",
                              batch_size=batch_size)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.drop_duplicates(all_cols)  # global pair dedup
        nun = (pairs.groupby(grp_cols, sort=False)[dependent]
               .nunique().reset_index(name="n_dep"))
        bad = nun[nun["n_dep"] > 1]
        if not scope_col:
            return pd.DataFrame({"n_viol": [np.int64(len(bad))]})
        per = bad.groupby("scope", sort=False).size() \
            .reset_index(name="n_viol")
        per["n_viol"] = per["n_viol"].astype(np.int64)
        # typed string column: a SIZE-0 object column trips Ray's
        # block-size estimator (np.vectorize over empty) into log spam
        per["scope"] = per["scope"].astype("string")
        return per

    def evidence(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.drop_duplicates(all_cols)
        nun = (pairs.groupby(grp_cols, sort=False)[dependent]
               .nunique().reset_index(name="n_dep"))
        nun = nun[nun["n_dep"] > 1]
        nun["n_dep"] = nun["n_dep"].astype(np.int64)
        return nun

    grouped = partials.groupby("fbucket")
    if evidence_rows:
        # one row per VIOLATING determinant group with its distinct-
        # dependent cardinality — the engine's ``Difference`` analog
        # for FD verdicts (which groups break the dependency, not
        # just how many); determinant values come back as their
        # canonical string cast
        return grouped.map_groups(evidence, batch_format="pandas") \
            .select_columns(grp_cols + ["n_dep"])
    out = grouped.map_groups(reduce, batch_format="pandas").to_pandas()
    if scope_col:
        if not len(out):
            return {}
        return {s: int(v) for s, v in
                out.groupby("scope")["n_viol"].sum().items()}
    return int(out["n_viol"].sum()) if len(out) else 0


def monotonic_regressions(ds, value_col: str, key_cols: list[str],
                          order_cols: list[str],
                          batch_size: int | None = None,
                          evidence_rows: bool = False):
    """EXACT count of rows whose ``value_col`` regresses below the
    running maximum of any earlier row within its key, under the
    ``order_cols`` order — the "monotonic counter" constraint
    (cumulative metrics, version columns, log offsets must not
    decrease; the commit-order assumption the reference's incremental
    path makes of its Kafka offsets, made checkable per key).

    ``order_cols`` must be a deterministic total order WITHIN each
    key (include a unique tiebreaker column last) — with ties left
    ambiguous, both engines would be free to count different
    regressions. Rows with a null key part, null order part, or a
    null/non-finite value are excluded on BOTH engines (stated; the
    SQL oracle's isfinite binds harmlessly on integer columns).

    Partitioning: one key per group (hash-partitioned — the
    sessionization envelope applies to pathological keys); the
    in-group kernel is pure numpy (lexsort + running max + one
    comparison).

    Returns the total regression count (int); with
    ``evidence_rows=True`` returns instead a Dataset of one
    (key..., n_events, n_regressions) row per key with at least one
    regression — the violation evidence."""
    need = sorted(set([value_col]) | set(key_cols) | set(order_cols))

    def drop_bad(batch: pa.Table) -> pa.Table:
        sub = batch.select(need)
        m = pc.is_valid(sub.column(need[0]))
        for c in need[1:]:
            m = pc.and_(m, pc.is_valid(sub.column(c)))
        v = sub.column(value_col)
        if pa.types.is_floating(v.type):
            m = pc.and_(m, pc.fill_null(pc.is_finite(v), False))
        return sub.filter(m)

    def _n_reg(g: pd.DataFrame) -> int:
        keys = tuple(g[c].to_numpy() for c in reversed(order_cols))
        order = np.lexsort(keys)
        v = g[value_col].to_numpy()[order]
        return int(np.count_nonzero(
            v[1:] < np.maximum.accumulate(v)[:-1]))

    def count_reg(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_reg": [np.int64(_n_reg(g))]})

    def evidence(g: pd.DataFrame) -> pd.DataFrame:
        n = _n_reg(g)
        if n == 0:
            cols = {c: pd.Series([], dtype=g[c].dtype)
                    for c in key_cols}
            cols["n_events"] = pd.Series([], dtype=np.int64)
            cols["n_regressions"] = pd.Series([], dtype=np.int64)
            return pd.DataFrame(cols)
        cols = {c: [g[c].iloc[0]] for c in key_cols}
        cols["n_events"] = [np.int64(len(g))]
        cols["n_regressions"] = [np.int64(n)]
        return pd.DataFrame(cols)

    grouped = ds.map_batches(drop_bad, batch_format="pyarrow",
                             batch_size=batch_size) \
        .groupby(key_cols if len(key_cols) > 1 else key_cols[0])
    if evidence_rows:
        return grouped.map_groups(evidence, batch_format="pandas")
    out = grouped.map_groups(count_reg,
                             batch_format="pandas").to_pandas()
    return int(out["n_reg"].sum()) if len(out) else 0


def null_pattern_profile(ds, columns: list[str],
                         batch_size: int | None = None):
    """Missingness co-occurrence profile: one row per distinct
    NULL-PATTERN over ``columns`` (which columns are null together)
    with its exact row count — the diagnostic that separates "5%
    nulls in lang and 5% in source" from "the same 5% of rows lost
    both" (a feed fault, not independent noise). SQL
    ``SELECT c1 IS NULL, c2 IS NULL, ..., count(*) GROUP BY ALL``.

    Shuffle shape: per-block Arrow group_by over the is-null flags is
    the combiner (<= 2^k partial rows per block, k = len(columns)),
    each tagged with an int bitmask; ONE Ray groupby over <= 2^k
    bitmask groups sums the partials — shuffle volume is one tiny row
    per (block, pattern), never row count, and the group fan-in is
    bounded by 2^k regardless of data size. Raises above 16 columns
    (2^16 patterns still reduce fine, but a wider bitmask is a
    different design — profile column subsets instead)."""
    cols = list(columns)
    if len(cols) > 16:
        raise ValueError("null_pattern_profile caps at 16 columns — "
                         "profile subsets instead")
    flag_cols = [f"{c}_null" for c in cols]

    def partial(batch: pa.Table) -> pa.Table:
        flags = [pc.is_null(batch.column(c)) for c in cols]
        sub = pa.table(dict(zip(flag_cols, flags)))
        gb = sub.group_by(flag_cols).aggregate([([], "count_all")])
        gb = gb.rename_columns(flag_cols + ["n_part"])
        mask = np.zeros(len(gb), dtype=np.int64)
        for i, fc in enumerate(flag_cols):
            mask |= gb.column(fc).to_numpy(
                zero_copy_only=False).astype(np.int64) << i
        return gb.append_column("pattern", pa.array(mask))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.iloc[:1][flag_cols].copy()
        out["n"] = np.int64(g["n_part"].sum())
        return out

    return partials.groupby("pattern").map_groups(
        reduce, batch_format="pandas").select_columns(flag_cols + ["n"])


def exact_distinct_counts(ds, cols: list[str], num_buckets: int = 64,
                          batch_size: int | None = None) -> dict[str, int]:
    """EXACT count-distinct for SEVERAL columns in ONE pass: per batch,
    each column's block-distinct values are tagged with the column name
    and a hash bucket; one groupby over (col, bucket) counts uniques;
    the driver sums ``num_buckets`` tiny rows per column. Reads the
    table once instead of once per column (review finding, round 4)."""
    from ..functions import hashing

    def part(batch: pa.Table) -> pa.Table:
        outs = []
        for col in cols:
            u = batch.column(col)
            if isinstance(u, pa.ChunkedArray):
                u = u.combine_chunks()
            u = pc.unique(u.drop_null())
            s = u if pa.types.is_large_string(u.type) else \
                u.cast(pa.string()).cast(pa.large_string())
            kh = hashing.hash64(s)
            outs.append(pa.table({
                "col": pa.array([col] * len(s), pa.large_string()),
                "v": s,
                "bucket": pa.array(
                    (kh % np.uint64(num_buckets)).astype(np.int32)),
            }))
        return pa.concat_tables(outs) if outs else pa.table(
            {"col": pa.array([], pa.large_string()),
             "v": pa.array([], pa.large_string()),
             "bucket": pa.array([], pa.int32())})

    partials = ds.map_batches(part, batch_format="pyarrow",
                              batch_size=batch_size)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"col": [g["col"].iloc[0]],
                             "n": [int(g["v"].nunique())]})

    out = partials.groupby(["col", "bucket"]).map_groups(
        reduce, batch_format="pandas").to_pandas()
    counts = {c: 0 for c in cols}
    if len(out):
        for c, n in out.groupby("col")["n"].sum().items():
            counts[str(c)] = int(n)
    return counts


def exact_distinct_count(ds, col: str, num_buckets: int = 64,
                         batch_size: int | None = None) -> int:
    """EXACT count-distinct, distributed: per-batch ``pc.unique``
    partials tagged with ``bucket = hash(v) % B`` shuffle one row per
    distinct value per block; each bucket group counts its uniques and
    only ``B`` small count rows reach the driver. The scale-safe exact
    sibling of the HLL estimate (use the HLL when +-1% is acceptable —
    this one's shuffle is proportional to the distinct count)."""
    from ..functions import hashing

    def part(batch: pa.Table) -> pa.Table:
        u = batch.column(col)
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        u = pc.unique(u.drop_null())
        s = u if pa.types.is_large_string(u.type) else \
            u.cast(pa.string()).cast(pa.large_string())
        kh = hashing.hash64(s)
        return pa.table({
            "v": s,
            "bucket": pa.array((kh % np.uint64(num_buckets)).astype(np.int32)),
        })

    partials = ds.map_batches(part, batch_format="pyarrow",
                              batch_size=batch_size)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g["v"].nunique())]})

    out = partials.groupby("bucket").map_groups(
        reduce, batch_format="pandas").to_pandas()
    return int(out["n"].sum()) if len(out) else 0


def scoped_distinct_counts(ds, columns: list[str] | str,
                           partition_col: str | None,
                           num_buckets: int = 64,
                           batch_size: int | None = None,
                           null_scope: str = "<null>",
                           ) -> dict[str, dict[str, int]]:
    """EXACT per-scope count-distinct for SEVERAL columns in ONE pass
    (SQL ``count(DISTINCT col) ... GROUP BY scope`` per column) — the
    scoped sibling of ``exact_distinct_counts``.

    Two-phase: each block dedupes its (column, scope, value) triples
    in one Arrow group_by per column (the combiner) and tags each
    triple ``bucket = (hash(col) ^ hash(scope) ^ hash(value)) % B``;
    ONE bucketed groupby dedupes triples globally (a triple lands in
    exactly one bucket) and counts per (column, scope) inside its
    bucket; the driver folds the B x columns x scopes tiny count rows
    additively. However many columns you check, the input is scanned
    once (the per-column-scan smell ``exact_distinct_counts`` fixed in
    round 4, kept fixed here); the shuffle moves one row per distinct
    triple per block — bounded by cardinality, never row count — and
    a hot scope's values spread across ALL buckets, so skew cannot
    concentrate on one task. Pass a projected ``ds`` (only the checked
    columns + partition col) so unchecked wide columns never decode.

    Null values are skipped (SQL COUNT DISTINCT semantics); null
    scopes map to ``null_scope``. Values compare via their canonical
    Arrow string cast (distinct-preserving for integer/string/bool
    columns; for float columns prefer range/stddev rules — ``-0.0``
    vs ``0.0`` casts to two strings where SQL DISTINCT sees one).
    Returns ``{column: {scope: n_distinct}}``; scopes whose values
    are all null are absent (their count is 0)."""
    from ..functions import hashing

    cols = [columns] if isinstance(columns, str) else list(columns)

    def _empty() -> pa.Table:
        return pa.table({"col": pa.array([], pa.large_string()),
                         "scope": pa.array([], pa.large_string()),
                         "v": pa.array([], pa.large_string()),
                         "bucket": pa.array([], pa.int32())})

    def part(batch: pa.Table) -> pa.Table:
        if partition_col is not None:
            scope = pc.fill_null(
                batch.column(partition_col).cast(pa.large_string()),
                null_scope)
        else:
            scope = pa.array([""] * len(batch), pa.large_string())
        outs = []
        for colname in cols:
            col = batch.column(colname)
            if pa.types.is_null(col.type):
                continue  # all-null block: nothing distinct
            vs = col if pa.types.is_large_string(col.type) else \
                col.cast(pa.string()).cast(pa.large_string())
            t = pa.table({"scope": scope, "v": vs}) \
                .filter(pc.is_valid(vs))
            if not len(t):
                continue
            t = t.group_by(["scope", "v"]).aggregate([])  # block dedup
            tag = pa.array([colname] * len(t), pa.large_string())
            kh = hashing.hash64(tag) ^ \
                hashing.hash64(t.column("scope")) ^ \
                hashing.hash64(t.column("v"))
            outs.append(pa.table({
                "col": tag, "scope": t.column("scope"),
                "v": t.column("v"),
                "bucket": pa.array(
                    (kh % np.uint64(num_buckets)).astype(np.int32))}))
        return pa.concat_tables(outs) if outs else _empty()

    partials = ds.map_batches(part, batch_format="pyarrow",
                              batch_size=batch_size)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["col", "scope", "v"])
        return (u.groupby(["col", "scope"], sort=False).size()
                 .reset_index(name="n"))

    out = partials.groupby("bucket").map_groups(
        reduce, batch_format="pandas").to_pandas()
    res: dict[str, dict[str, int]] = {c: {} for c in cols}
    if len(out):
        for (c, s), n in out.groupby(["col", "scope"])["n"].sum().items():
            res[str(c)][str(s)] = int(n)
    return res


# ---------------------------------------------------------------------------
# Referential integrity
# ---------------------------------------------------------------------------


def _estimate_key_bytes(parent, parent_key: str, n_parent: int) -> int:
    """EXACT driver/object-store footprint of the broadcast parent key
    array. Fixed-width types cost 8 bytes/row; variable-width keys are
    measured with one distributed per-block length pass (tiny partials
    back to the driver — never a head sample, whose position-correlated
    widths would defeat the budget; review finding) plus the ~56-byte
    per-element overhead an object-dtype numpy array of Python strings
    carries (the broadcast form — it does NOT zero-copy from plasma,
    every task ray.get materializes it). The pass streams the same
    column the broadcast itself would read, so it at most doubles the
    decision's I/O and stays distributed."""
    try:
        sch = parent.schema()
        t = dict(zip(sch.names, sch.types))[parent_key]
    except Exception:
        t = None
    if t is not None and isinstance(t, pa.DataType):
        try:
            if pa.types.is_integer(t) or pa.types.is_floating(t) \
                    or pa.types.is_temporal(t) or pa.types.is_boolean(t):
                return 8 * n_parent
        except Exception:
            pass

    def part(batch: pa.Table) -> pa.Table:
        col = batch.column(parent_key)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.drop_null()
        if not (pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type) or pa.types.is_binary(col.type)
                or pa.types.is_large_binary(col.type)):
            col = col.cast(pa.large_string())
        nbytes = pc.sum(pc.binary_length(col)).as_py() or 0
        return pa.table({"n": pa.array([len(col)], pa.int64()),
                         "b": pa.array([int(nbytes)], pa.int64())})

    stats = parent.select_columns([parent_key]) \
        .map_batches(part, batch_format="pyarrow").to_pandas()
    n = int(stats["n"].sum())
    if not n:
        return 8 * n_parent
    return int(stats["b"].sum()) + 56 * n


def referential_violations(child, child_key: str, parent, parent_key: str,
                           broadcast_threshold: int = 50_000_000,
                           broadcast_bytes_budget: int = 256 * 2**20,
                           batch_size: int | None = 65536):
    """Child rows whose FK value has no matching parent key (dangling
    references), as a Dataset of (child_key_value,) rows.

    Nulls are not violations (SQL FK semantics). Parent key set is
    collected + broadcast via ``ray.put`` when small (one object-store
    copy shared by every task — never re-shipped per batch); the
    hash-partitioned path for giant parents lives in
    ``referential_violations_partitioned``. The broadcast decision is
    BYTE-aware, not just row-aware (round-2 verdict #3): 50M wide
    string keys are gigabytes as an object-dtype array, so a sampled
    per-key byte estimate must also fit ``broadcast_bytes_budget``.
    """
    import ray

    n_parent = parent.count()
    if n_parent <= broadcast_threshold and _estimate_key_bytes(
            parent, parent_key, n_parent) <= broadcast_bytes_budget:
        keys = parent.select_columns([parent_key]).unique(parent_key)
        # a null parent key matches nothing (SQL semantics, same as the
        # child side) — and None poisons the object-dtype sort below
        keys = [k for k in keys if k is not None]
        key_arr = np.sort(np.asarray(keys))  # natural dtype (int64 / <U / object)
        ref = ray.put(key_arr)

        def anti(batch: pa.Table) -> pa.Table:
            parents = ray.get(ref)
            vals = batch.column(child_key)
            # nulls are not FK violations — drop before the membership test
            sub = batch.select([child_key]).filter(pc.is_valid(vals))
            v = sub.column(child_key).to_numpy(zero_copy_only=False)
            if len(parents) and len(v):
                pos = np.minimum(np.searchsorted(parents, v),
                                 len(parents) - 1)
                hit = parents[pos] == v
            else:
                hit = np.zeros(len(v), dtype=bool)
            return sub.filter(pa.array(~hit))

        return child.map_batches(anti, batch_format="pyarrow",
                                 batch_size=batch_size)
    return referential_violations_partitioned(child, child_key,
                                              parent, parent_key)


def referential_violations_partitioned(child, child_key: str,
                                       parent, parent_key: str,
                                       num_buckets: int = 256,
                                       bloom_prune: bool | None = None,
                                       bloom_bits_per_key: int = 12,
                                       n_child: int | None = None,
                                       n_parent: int | None = None):
    """Hash-partitioned anti-join for a parent too large to broadcast.

    Both sides get ``bucket = hash(key) % B`` (same hash both sides —
    the co-partitioning invariant), union with a side tag, and each
    bucket group resolves dangling children with a pandas isin.

    ``bloom_prune`` is the bloom semi-join scale path
    (``functions/bloom.py``): a bloom filter built over the CHILD keys
    is broadcast once (``ray.put``; uint8 numpy — zero-copy from
    plasma) and parent batches drop every key no child references
    BEFORE the shuffle. Bloom filters have no false negatives, so no
    referenced parent is ever dropped and the violation set is
    bit-identical (tested); false positives merely let ~0.3% of
    unreferenced parents ride the shuffle. Parent shuffle volume falls
    from |parent| to |referenced keys| + fpp·|parent| — the win when a
    10^12-row url table is checked against a much smaller (or highly
    repetitive) child reference set. ``None`` auto-engages it when the
    parent outnumbers the child ≥4x (both counts are parquet-footer
    cheap; the build costs one extra child-key scan, amortized by the
    parent rows it keeps out of the shuffle).
    """
    import ray

    from ..functions import bloom as bloomf
    from ..functions import hashing

    if bloom_prune is None or bloom_prune:
        # .count() is parquet-footer cheap on direct reads but EXECUTES
        # a derived (map_batches'd) pipeline — callers with derived
        # inputs should pass n_child/n_parent estimates instead
        if n_child is None:
            n_child = child.count()
        if bloom_prune is None and n_parent is None:
            n_parent = parent.count()
        if bloom_prune is None:
            bloom_prune = n_parent >= 4 * max(1, n_child)
    if bloom_prune:
        # the bloom build and the anti-join both consume the child's
        # key column — materialize it ONCE (object store, spillable)
        # unless the child is huge, where two streaming passes beat
        # pinning the keys
        child_keys = child.select_columns([child_key])
        if n_child <= 200_000_000:
            child_keys = child_keys.materialize()
        child = child_keys
        bf = bloomf.build_bloom(child_keys, child_key, n_child,
                                bits_per_key=bloom_bits_per_key)
        bits_ref = ray.put(bf.bits)
        m, k = bf.m, bf.k

        def prune(batch: pa.Table) -> pa.Table:
            vals = batch.column(parent_key)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            sub = batch.select([parent_key]).filter(pc.is_valid(vals))
            f = bloomf.BloomFilter(m, k, ray.get(bits_ref))
            hit = f.contains(sub.column(parent_key))
            return sub.filter(pa.array(hit))

        parent = parent.map_batches(prune, batch_format="pyarrow")

    def keyed(side: str, col: str):
        def fn(batch: pa.Table) -> pa.Table:
            vals = batch.column(col)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            vals = vals.drop_null()
            if not pa.types.is_large_string(vals.type):
                vals = vals.cast(pa.string()).cast(pa.large_string())
            kh = hashing.hash64(vals)
            return pa.table({
                "k": vals,
                "bucket": pa.array((kh % np.uint64(num_buckets)).astype(np.int32)),
                "is_child": pa.array(np.full(len(vals), side == "child")),
            })
        return fn

    c = child.map_batches(keyed("child", child_key), batch_format="pyarrow")
    p = parent.map_batches(keyed("parent", parent_key), batch_format="pyarrow")

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        parents = set(g.loc[~g["is_child"], "k"])
        ch = g.loc[g["is_child"], "k"]
        bad = ch[~ch.isin(parents)]
        return pd.DataFrame({child_key: bad.to_numpy()})

    return c.union(p).groupby("bucket").map_groups(resolve,
                                                   batch_format="pandas")


# ---------------------------------------------------------------------------
# Distribution drift: KS from t-digests, PSI from categorical counters
# ---------------------------------------------------------------------------


def ks_statistic(a: TDigest, b: TDigest, n_points: int = 256) -> float:
    """Approximate two-sample KS statistic from two t-digest CDFs."""
    lo = min(a.vmin, b.vmin)
    hi = max(a.vmax, b.vmax)
    if not np.isfinite(lo) or not np.isfinite(hi) or lo == hi:
        return 0.0
    xs = np.linspace(lo, hi, n_points)
    return float(np.abs(a.cdf(xs) - b.cdf(xs)).max())


def psi(expected: TopCounter | dict, actual: TopCounter | dict) -> float:
    """Population Stability Index over categorical distributions.

    PSI = sum_i (p_i - q_i) * ln(p_i / q_i); industry rule of thumb:
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 drifted.

    Zero counts are add-half (Laplace) smoothed to 0.5/n — a fixed
    tiny epsilon would explode the log ratio whenever a rare category
    happens to draw zero in a small sample (a 4%-probability category
    absent from a 100-row group would contribute ~0.4 PSI of pure
    noise).
    """
    e = expected.counts if isinstance(expected, TopCounter) else dict(expected)
    a = actual.counts if isinstance(actual, TopCounter) else dict(actual)
    cats = set(e) | set(a)
    te = sum(e.values()) or 1
    ta = sum(a.values()) or 1
    val = 0.0
    for c in cats:
        p = max(e.get(c, 0), 0.5) / te
        q = max(a.get(c, 0), 0.5) / ta
        val += (p - q) * np.log(p / q)
    return float(val)


# Above this many (batch, group) partial blobs the driver fold becomes
# the bottleneck — auto-route to the distributed per-group fold (the
# scaled_bits / DRIVER_SIGNATURE_MAX_PARTITIONS pattern, verdict #4).
DRIVER_DRIFT_MAX_PARTIALS = 65_536


def grouped_profiles(ds, group_col: str, value_cols: list[str],
                     batch_size: int | None = 65536,
                     merge_distributed: bool | None = None,
                     driver_max_partials: int | None = None
                     ) -> dict[str, dict]:
    """Merged per-GROUP column profiles: {group: {col: ColumnProfile}}
    — the per-partition sketch state of the north rule, reusable by
    both the live drift report (``drift_by_group``) and the grouped
    sketch manifest (``stages.manifest``).

    One profile partial per (batch, group) streams back (no row
    shuffle). ``merge_distributed=True`` is the many-groups scale
    path: a bucketed groupby folds each group's partials in a worker,
    so the driver receives ONE merged blob per group instead of one
    per (batch, group) — at 10^6 partitions x 10^4 blocks the
    driver-side fold would otherwise bottleneck. The default ``None``
    AUTO-routes past ``DRIVER_DRIFT_MAX_PARTIALS`` partials (round-2
    verdict #4). Exact fields (count/null/min/max/categorical counts)
    merge identically on both routes; t-digest centroid compression
    is merge-order-sensitive, so quantile-derived stats agree to
    sketch tolerance only (verified by test). The driver fold streams
    via ``iter_batches`` with incremental per-group merging — no
    ``take_all`` of every blob at once.

    Returns ``(merged, route)`` with route in {"driver",
    "distributed"} — the route actually taken (the auto decision
    happens here, so callers can report it)."""
    import pickle

    import pyarrow as pa  # noqa: F811  (local for worker serialization)

    from ..stages.profile import merge_partials, profile_batch

    def partials(batch: pa.Table) -> pa.Table:
        # partition the batch by group value via dictionary-encode +
        # stable argsort + run slicing: O(n log n) per batch however
        # many groups it contains (the per-group filter loop this
        # replaces was O(groups x rows) — quadratic at 10^4+ groups
        # per batch, the round-4 verdict #7 stress shape)
        import pyarrow.compute as pc  # noqa: F811
        groups: list[str] = []
        blobs: list[bytes] = []
        gvals = batch.column(group_col)
        if isinstance(gvals, pa.ChunkedArray):
            gvals = gvals.combine_chunks()
        if len(gvals):
            enc = pc.dictionary_encode(gvals)
            # null group keeps the historical convention: the partial
            # row exists (group "None") but profiles an EMPTY slice,
            # exactly like the filter-based path whose null == null
            # comparison dropped every row
            codes = enc.indices.fill_null(-1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            order = np.argsort(codes, kind="stable")
            sc = codes[order]
            bounds = np.flatnonzero(np.diff(sc)) + 1
            starts = np.concatenate([[0], bounds])
            ends = np.concatenate([bounds, [len(sc)]])
            tbl = batch.take(pa.array(order, pa.int64()))
            dictionary = enc.dictionary
            for s, e in zip(starts, ends):
                code = int(sc[s])
                if code < 0:
                    groups.append(str(None))
                    sub = tbl.slice(int(s), 0)
                else:
                    groups.append(str(dictionary[code].as_py()))
                    sub = tbl.slice(int(s), int(e - s))
                blobs.append(pickle.dumps(profile_batch(sub, value_cols)))
        return pa.table({"group": pa.array(groups, type=pa.large_string()),
                         "partial": pa.array(blobs, type=pa.large_binary())})

    max_partials = (DRIVER_DRIFT_MAX_PARTIALS if driver_max_partials is None
                    else driver_max_partials)
    partial_ds = ds.map_batches(partials, batch_format="pyarrow",
                                batch_size=batch_size)
    if merge_distributed is None:
        # only the auto-route needs the partial count (and hence the
        # materialize); explicit callers stream straight through
        partial_ds = partial_ds.materialize()
        merge_distributed = partial_ds.count() > max_partials
    if merge_distributed:
        # bucketed fold: shuffling by group and calling map_groups once
        # PER GROUP pays Ray's per-group dispatch 10^4-10^6 times; hash
        # groups into a fixed bucket count instead, co-locate buckets,
        # and fold every group inside a bucket in one plain dict loop
        # (the referential-check bucketed-machinery pattern)
        import zlib as _zlib

        n_buckets = 256

        def add_bucket(t: pa.Table) -> pa.Table:
            bk = [_zlib.crc32(s.encode()) % n_buckets
                  for s in t.column("group").to_pylist()]
            return t.append_column("bucket", pa.array(bk, pa.int32()))

        def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
            out_g: list[str] = []
            out_b: list[bytes] = []
            for grp, sub in g.groupby("group", sort=False):
                merged_prof = merge_partials(
                    [bytes(b) for b in sub["partial"]])
                out_g.append(str(grp))
                out_b.append(pickle.dumps(merged_prof))
            return pd.DataFrame({"group": out_g, "partial": out_b})

        partial_ds = partial_ds \
            .map_batches(add_bucket, batch_format="pyarrow") \
            .groupby("bucket").map_groups(fold_bucket,
                                          batch_format="pandas")
    # streamed driver fold: one batch of blobs in flight, merged
    # incrementally per group (blob count here is either <= the auto
    # bound or one per group after the distributed fold)
    merged: dict[str, dict] = {}
    for b in partial_ds.iter_batches(batch_format="pandas",
                                     batch_size=4096):
        for g, blob in zip(b["group"], b["partial"]):
            profs = pickle.loads(bytes(blob))
            cur = merged.setdefault(str(g), {})
            for name, p in profs.items():
                cur[name] = cur[name].merge(p) if name in cur else p
    return merged, ("distributed" if merge_distributed else "driver")


def drift_by_group(ds, group_col: str, value_cols: list[str],
                   ks_threshold: float = 0.1, psi_threshold: float = 0.25,
                   batch_size: int | None = 65536,
                   merge_distributed: bool | None = None,
                   driver_max_partials: int | None = None) -> pd.DataFrame:
    """Per-partition drift: each group's distribution vs the global one.

    North-rule "KS/PSI distribution-drift tests per partition": the
    per-group sketch state comes from :func:`grouped_profiles` (see
    its docstring for the partial/fold routes and auto-routing);
    each group's t-digest / categorical counter is then tested
    against the all-groups merge. Returns one row per (group, column)
    with ks / psi / result.
    """
    merged, merge_route = grouped_profiles(
        ds, group_col, value_cols, batch_size=batch_size,
        merge_distributed=merge_distributed,
        driver_max_partials=driver_max_partials)
    # global baseline: ONE bulk fold per column over every group's
    # profile (single t-digest compression / register reduction) —
    # pairwise merging here cost one compression per group, the
    # driver-side bottleneck at 10^4+ groups
    from ..stages.profile import ColumnProfile

    by_col: dict[str, list] = {}
    for profs in merged.values():
        for name, p in profs.items():
            by_col.setdefault(name, []).append(p)
    global_prof = {name: ColumnProfile.merge_many(ps)
                   for name, ps in by_col.items()} or None
    out_rows: list[dict] = []
    for g in sorted(merged):
        for row in _drift_rows(merged[g], global_prof or {},
                               ks_threshold, psi_threshold):
            out_rows.append({"grp": g, **row})
    if not out_rows:
        return pd.DataFrame(columns=["grp", "column", "ks", "psi", "result"])
    rep = pd.DataFrame(out_rows)
    # Robust flagging: the global baseline itself contains any drifted
    # group, so every clean group shows a nonzero KS/PSI against it.
    # The median group is the clean baseline — a group drifts when its
    # statistic EXCEEDS the per-column median by more than the threshold.
    for stat in ("ks", "psi"):
        vals = pd.to_numeric(rep[stat], errors="coerce")
        med = vals.groupby(rep["column"]).transform("median")
        rep[f"{stat}_excess"] = vals - med
    # sample-size-aware noise floors: small groups carry statistical
    # noise even with identical underlying distributions — PSI bias is
    # ~ (k-1)*(1/n + 1/n_ref); the two-sample KS 95% band is
    # ~ 1.36*sqrt(1/n + 1/n_ref). Flag only excess beyond
    # threshold + noise floor.
    n = pd.to_numeric(rep["n"], errors="coerce").fillna(1).clip(lower=1)
    n_ref = pd.to_numeric(rep["n_ref"], errors="coerce").fillna(1).clip(lower=1)
    k = pd.to_numeric(rep["n_cats"], errors="coerce").fillna(0)
    psi_noise = (k - 1).clip(lower=0) * (1.0 / n + 1.0 / n_ref)
    ks_noise = 1.36 * np.sqrt(1.0 / n + 1.0 / n_ref)
    ks_bad = pd.to_numeric(rep["ks_excess"], errors="coerce") \
        .fillna(0.0) > (ks_threshold + ks_noise)
    psi_bad = pd.to_numeric(rep["psi_excess"], errors="coerce") \
        .fillna(0.0) > (psi_threshold + psi_noise)
    # which statistic flagged — drift_exact_recheck may only downgrade
    # a verdict whose ONLY flag was the (sketch-approximate) KS
    rep["ks_flag"] = ks_bad
    rep["psi_flag"] = psi_bad
    rep["result"] = np.where(ks_bad | psi_bad, "failed", "success")
    # carry the effective adjudication bar + route taken so a two-phase
    # re-check (drift_exact_recheck) adjudicates at the SAME threshold
    # this report was produced with, and tests can assert the route
    # without monkeypatching (DataFrame.attrs survives .copy())
    rep.attrs["ks_threshold"] = float(ks_threshold)
    rep.attrs["psi_threshold"] = float(psi_threshold)
    rep.attrs["merge_route"] = merge_route
    return rep


def drift_report(src_profiles: dict, snk_profiles: dict,
                 ks_threshold: float = 0.1,
                 psi_threshold: float = 0.25,
                 max_categorical_ratio: float = 0.2) -> pd.DataFrame:
    """Per-column drift verdicts from two merged profile dicts
    (``stages.profile.profile_dataset`` output for each side).

    PSI only applies to genuinely categorical columns: a column whose
    approx-distinct exceeds ``max_categorical_ratio`` of its non-null
    count (e.g. free text, urls) is skipped — PSI over near-unique
    values is pure noise.
    """
    return pd.DataFrame(_drift_rows(src_profiles, snk_profiles,
                                    ks_threshold, psi_threshold,
                                    max_categorical_ratio))


def _drift_rows(src_profiles: dict, snk_profiles: dict,
                ks_threshold: float = 0.1,
                psi_threshold: float = 0.25,
                max_categorical_ratio: float = 0.2) -> list[dict]:
    """``drift_report``'s row builder as plain dicts — the many-groups
    caller (``drift_by_group``) collects every group's rows into ONE
    DataFrame instead of concatenating 10^4+ tiny frames (the frame-
    per-group constructor was the driver-side bottleneck at 16k
    groups, round-4 verdict #7)."""
    rows = []
    for name, sp in src_profiles.items():
        kp = snk_profiles.get(name)
        if kp is None:
            continue
        ks = (ks_statistic(sp.tdigest, kp.tdigest)
              if sp.tdigest is not None and kp.tdigest is not None else None)
        nn = max(1, sp.count - sp.nulls)
        nn_ref = max(1, kp.count - kp.nulls)
        # evaluate the (HLL-estimate) categorical gate only when PSI
        # could apply at all — numeric columns carry no counter, and
        # the estimate costs ~0.2 ms x groups on the driver otherwise
        categorical = (sp.topk is not None and kp.topk is not None
                       and sp.hll.estimate() <= max_categorical_ratio * nn)
        p = psi(sp.topk, kp.topk) if categorical else None
        n_cats = (len(set(sp.topk.counts) | set(kp.topk.counts))
                  if sp.topk is not None and kp.topk is not None else 0)
        drifted = ((ks is not None and ks > ks_threshold)
                   or (p is not None and p > psi_threshold))
        rows.append({"column": name, "ks": ks, "psi": p,
                     "n": nn, "n_ref": nn_ref, "n_cats": n_cats,
                     "result": "failed" if drifted else "success"})
    return rows


def ks_exact_counts(ds, value_col: str, flag_col: str) -> dict:
    """EXACT two-sample Kolmogorov-Smirnov statistic, distributed —
    the precise sibling of the t-digest ``ks_statistic`` (which is
    sketch-tolerance approximate). Returns integers so the result is
    hash-exact: ``ks_num = max_v |cumA(v)·NB - cumB(v)·NA|`` over
    distinct values v, with ``KS = ks_num / (NA·NB)``.

    ``ds`` carries ``value_col`` (numeric; nulls and non-finite
    dropped) and ``flag_col`` (1 = sample A, 0 = sample B).

    Plan — no full-data sort, no driver row loop:
    1. per-batch partial: groupby(value) -> (value, na, nb) counts
       (the combiner; shuffle volume = distinct values per block);
    2. one distributed groupby+sort over DISTINCT values only;
    3. per sorted block, the ECDF-difference extreme candidates:
       argmax/argmin of the INTEGER ``ca_i·NB - cb_i·NA`` (exact — a
       constant offset shift never changes an integer argmax), plus
       block totals;
    4. a driver fold over one tiny summary row per block applies
       running offsets and takes the global max.

    Integer bound: |D| ≤ NA·NB, exact in int64 while both sides stay
    under ~3·10^9 samples; the driver fold itself is arbitrary-
    precision Python int.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ok = pc.and_(pc.is_valid(v), pc.is_finite(v))
        sub = batch.select([value_col, flag_col]).filter(ok)
        a = sub.column(flag_col).cast(pa.int64())
        t = pa.table({value_col: sub.column(value_col),
                      "na_p": a,
                      "nb_p": pc.subtract(pa.scalar(1, pa.int64()), a)})
        gb = t.group_by(value_col).aggregate([("na_p", "sum"),
                                              ("nb_p", "sum")])
        return pa.table({value_col: gb.column(value_col),
                         "na_p": gb.column("na_p_sum"),
                         "nb_p": gb.column("nb_p_sum")})

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    tot = partials.sum(["na_p", "nb_p"])
    # Dataset.sum returns None values when no rows survive the filter
    n_a = int((tot or {}).get("sum(na_p)") or 0)
    n_b = int((tot or {}).get("sum(nb_p)") or 0)
    if n_a == 0 or n_b == 0:
        return {"ks_num": 0, "n_a": n_a, "n_b": n_b}

    per_value = partials.groupby(value_col).aggregate(
        Sum("na_p", alias_name="na"), Sum("nb_p", alias_name="nb")) \
        .sort(value_col)

    def block_summary(batch: pa.Table) -> pa.Table:
        na = batch.column("na").to_numpy()
        nb = batch.column("nb").to_numpy()
        ca = np.cumsum(na)
        cb = np.cumsum(nb)
        d = ca * np.int64(n_b) - cb * np.int64(n_a)
        i_hi = int(np.argmax(d))
        i_lo = int(np.argmin(d))
        return pa.table({
            "vmin": batch.column(value_col).slice(0, 1),
            "tot_a": pa.array([int(ca[-1])], pa.int64()),
            "tot_b": pa.array([int(cb[-1])], pa.int64()),
            "ca_hi": pa.array([int(ca[i_hi])], pa.int64()),
            "cb_hi": pa.array([int(cb[i_hi])], pa.int64()),
            "ca_lo": pa.array([int(ca[i_lo])], pa.int64()),
            "cb_lo": pa.array([int(cb[i_lo])], pa.int64()),
        })

    summaries = per_value.map_batches(
        block_summary, batch_format="pyarrow").to_pandas()
    summaries = summaries.sort_values("vmin")
    off_a = off_b = 0
    best = 0
    for s in summaries.itertuples():
        for ca, cb in ((s.ca_hi, s.cb_hi), (s.ca_lo, s.cb_lo)):
            d = (off_a + int(ca)) * n_b - (off_b + int(cb)) * n_a
            best = max(best, abs(d))
        off_a += int(s.tot_a)
        off_b += int(s.tot_b)
    return {"ks_num": int(best), "n_a": n_a, "n_b": n_b}


def ks_exact_by_group(ds, group_col: str, value_col: str,
                      max_broadcast_values: int = 50_000_000
                      ) -> pd.DataFrame:
    """EXACT two-sample KS of EVERY group vs the rest, in ONE
    distributed pass — the grouped sibling of ``ks_exact_counts`` (the
    per-partition drift leg of the north rule, made exact without G
    scans). Returns one row per group: (group, ks_num, n_a, n_b) with
    ``KS = ks_num / (n_a·n_b)``.

    Plan — shuffle volume is distinct (group, value) pairs, never rows:
    1. per-batch partial: groupby(group, value) -> counts (the combiner);
    2. one distributed groupby over the distinct (group, value) pairs;
    3. the per-VALUE total axis (distinct values x 16 B: value + count)
       is folded once and broadcast via ``ray.put``;
    4. a groupby(group).map_groups computes each group's ECDF extreme
       candidates against the broadcast axis. Between two of a group's
       values the integer difference ca·NB − cb·NA only decreases (only
       the rest side accumulates), so per group it is extremal either
       AT one of its own values or just BEFORE one — both evaluated
       vectorized from the broadcast cumulative totals; 0 (the ±inf
       boundary) is always a candidate.

    The driver holds the value axis once (capped at
    ``max_broadcast_values`` distinct values — beyond it this raises
    rather than silently truncating; fall back to per-group
    ``ks_exact_counts`` scans there) and one result row per group.
    Same int64 envelope as ``ks_exact_counts``: exact while both sides
    stay under ~3·10^9 samples.
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ok = pc.and_(pc.is_valid(v), pc.is_valid(batch.column(group_col)))
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.is_finite(v))
        sub = batch.select([group_col, value_col]).filter(ok)
        gb = sub.group_by([group_col, value_col]) \
            .aggregate([([], "count_all")])
        return pa.table({group_col: gb.column(group_col),
                         value_col: gb.column(value_col),
                         "c_p": gb.column("count_all")})

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, value_col]) \
        .aggregate(Sum("c_p", alias_name="c")).materialize()

    # per-value total axis: fold the (group, value) rows once more —
    # one row per distinct value — then sort on the driver (16 B each)
    totals = partials.groupby(value_col) \
        .aggregate(Sum("c", alias_name="tv")).to_pandas()
    if not len(totals):
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "ks_num": pd.Series(dtype=np.int64),
                             "n_a": pd.Series(dtype=np.int64),
                             "n_b": pd.Series(dtype=np.int64)})
    if len(totals) > max_broadcast_values:
        raise ValueError(
            f"ks_exact_by_group: {len(totals)} distinct values exceed "
            f"the {max_broadcast_values} broadcast cap — run per-group "
            f"ks_exact_counts scans instead")
    totals = totals.sort_values(value_col)
    vals = totals[value_col].to_numpy()
    tv = totals["tv"].to_numpy(np.int64)
    ct = np.cumsum(tv)
    n_total = int(ct[-1])
    axis_ref = ray.put((vals, ct, tv))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        vals_b, ct_b, tv_b = ray.get(axis_ref)
        g = g.sort_values(value_col)
        c = g["c"].to_numpy(np.int64)
        ca = np.cumsum(c)
        n_a = int(ca[-1])
        n_b = n_total - n_a
        idx = np.searchsorted(vals_b, g[value_col].to_numpy())
        ct_i = ct_b[idx]
        cb_at = ct_i - ca
        d_at = ca * np.int64(n_b) - cb_at * np.int64(n_a)
        ca_prev = ca - c
        cb_before = (ct_i - tv_b[idx]) - ca_prev
        d_before = ca_prev * np.int64(n_b) - cb_before * np.int64(n_a)
        best = max(int(np.abs(d_at).max()), int(np.abs(d_before).max()), 0)
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "ks_num": np.array([best], np.int64),
                             "n_a": np.array([n_a], np.int64),
                             "n_b": np.array([n_b], np.int64)})

    out = partials.groupby(group_col).map_groups(
        per_group, batch_format="pandas").to_pandas()
    return out.sort_values(group_col).reset_index(drop=True)


def w1_exact_by_group(ds, group_col: str, value_col: str,
                      max_broadcast_values: int = 50_000_000
                      ) -> pd.DataFrame:
    """EXACT Wasserstein-1 (earth-mover) distance of EVERY group's
    distribution vs the rest, in ONE distributed pass — the
    area-between-ECDFs sibling of ``ks_exact_by_group`` (KS sees only
    the worst POINT of drift; W1 integrates ALL of it, so a shift
    spread across the range scores what KS under-reports). Returns one
    row per group: (group, w1_num, n_a, n_b) with
    ``W1 = w1_num / (n_a·n_b)`` in value units.

    Integer value columns ONLY (gaps between distinct values stay
    integer, so the sum is exact and oracle-reproducible; for floats
    use KS or quantile bands). Same plan as the KS kernel: per-batch
    (group, value) count partials (combiner), one distributed groupby
    over distinct pairs, the per-value total axis folded once and
    broadcast via ``ray.put``, then a groupby(group) evaluates

        w1_num = Σ_i |ca_i·n_b − cb_i·n_a| · (v_{i+1} − v_i)

    over the full broadcast axis vectorized (unlike KS, every axis
    segment contributes — O(V) numpy per group, zero extra shuffle).
    Exactness envelope (checked, raises loudly): the worst summand
    bound (n²/4)·range must stay inside int64."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if not pa.types.is_integer(v.type):
            raise ValueError("w1_exact_by_group needs an integer value "
                             "column (exact gaps); use ks_exact_by_group "
                             "for floats")
        ok = pc.and_(pc.is_valid(v), pc.is_valid(batch.column(group_col)))
        sub = batch.select([group_col, value_col]).filter(ok)
        gb = sub.group_by([group_col, value_col]) \
            .aggregate([([], "count_all")])
        return pa.table({group_col: gb.column(group_col),
                         value_col: gb.column(value_col),
                         "c_p": gb.column("count_all")})

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, value_col]) \
        .aggregate(Sum("c_p", alias_name="c")).materialize()

    totals = partials.groupby(value_col) \
        .aggregate(Sum("c", alias_name="tv")).to_pandas()
    if not len(totals):
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "w1_num": pd.Series(dtype=np.int64),
                             "n_a": pd.Series(dtype=np.int64),
                             "n_b": pd.Series(dtype=np.int64)})
    if len(totals) > max_broadcast_values:
        raise ValueError(
            f"w1_exact_by_group: {len(totals)} distinct values exceed "
            f"the {max_broadcast_values} broadcast cap")
    totals = totals.sort_values(value_col)
    vals = totals[value_col].to_numpy(np.int64)
    tv = totals["tv"].to_numpy(np.int64)
    ct = np.cumsum(tv)
    n_total = int(ct[-1])
    value_range = int(vals[-1]) - int(vals[0])
    if (n_total * n_total // 4) * max(value_range, 1) >= 2 ** 62:
        raise ValueError(
            "w1_exact_by_group: (n²/4)·range exceeds the int64 "
            "exactness envelope — rescale the value column or sample")
    axis_ref = ray.put((vals, ct, tv))

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        vals_b, ct_b, tv_b = ray.get(axis_ref)
        g = g.sort_values(value_col)
        c = g["c"].to_numpy(np.int64)
        n_a = int(c.sum())
        n_b = n_total - n_a
        ca_full = np.zeros(len(vals_b), np.int64)
        idx = np.searchsorted(vals_b, g[value_col].to_numpy(np.int64))
        ca_full[idx] = c
        ca_full = np.cumsum(ca_full)
        cb_full = ct_b - ca_full
        diff = np.abs(ca_full[:-1] * np.int64(n_b)
                      - cb_full[:-1] * np.int64(n_a))
        gaps = np.diff(vals_b)
        w1 = int((diff * gaps).sum()) if len(vals_b) > 1 else 0
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "w1_num": np.array([w1], np.int64),
                             "n_a": np.array([n_a], np.int64),
                             "n_b": np.array([n_b], np.int64)})

    out = partials.groupby(group_col).map_groups(
        per_group, batch_format="pandas").to_pandas()
    return out.sort_values(group_col).reset_index(drop=True)


def exact_quantiles(ds, value_col: str, qs: list[float]) -> dict:
    """EXACT discrete quantiles (DuckDB ``quantile_disc`` semantics:
    the element at 1-indexed rank ``ceil(q·n)``), distributed — the
    precise sibling of the t-digest estimate. Same shuffle discipline
    as ``ks_exact_counts``: per-batch distinct-value count partials,
    one groupby+sort over DISTINCT values, one summary row per block
    to the driver, then the target value is fetched with a range
    filter over ONLY the block containing the rank — the driver never
    sees the value distribution, just ≤ len(qs) tiny block reads.

    Nulls and non-finite values are excluded (floats); returns
    {q: value}. Empty input returns {q: None}.
    """
    from fractions import Fraction

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ok = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.is_finite(v))
        sub = batch.select([value_col]).filter(ok)
        gb = sub.group_by([value_col]).aggregate([([], "count_all")])
        return pa.table({value_col: gb.column(value_col),
                         "cnt": gb.column("count_all")})

    per_value = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(value_col).aggregate(Sum("cnt", alias_name="n")) \
        .sort(value_col).materialize()

    def summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vmin": batch.column(value_col),
                             "vmax": batch.column(value_col),
                             "tot": pa.array([], pa.int64())})
        tot = pc.sum(batch.column("n")).as_py() or 0
        return pa.table({
            "vmin": batch.column(value_col).slice(0, 1),
            "vmax": batch.column(value_col).slice(batch.num_rows - 1, 1),
            "tot": pa.array([int(tot)], pa.int64()),
        })

    summaries = per_value.map_batches(
        summary, batch_format="pyarrow").to_pandas()
    if not len(summaries):
        return {q: None for q in qs}
    summaries = summaries.sort_values("vmin").reset_index(drop=True)
    n = int(summaries["tot"].sum())
    if n == 0:
        return {q: None for q in qs}

    # rank -> owning block, dedup blocks so each is fetched once
    cum = summaries["tot"].cumsum()
    want: dict[int, list[tuple[float, int]]] = {}
    for q in qs:
        # rank must be the EXACT ceil(q*n): binary-FP math.ceil(q*n)
        # overshoots whenever fl(q)*n rounds just above an integer
        # (q=0.07, n=100 -> 7.000000000000001 -> rank 8, wrong).
        # DuckDB parses the quantile literal as DECIMAL, so the
        # decimal value of q (its repr string) is the semantic one.
        fq = Fraction(str(q))
        r = min(n, max(1, -((-fq.numerator * n) // fq.denominator)))
        blk = int(np.searchsorted(cum.to_numpy(), r))
        want.setdefault(blk, []).append((q, r))
    out: dict = {}
    for blk, targets in want.items():
        # .item() -> plain Python scalars: numpy 2.x reprs as
        # "np.float64(3.5)", which the expression parser cannot read
        # (string columns arrive as plain str — no .item there)
        lo = summaries["vmin"].iloc[blk]
        hi = summaries["vmax"].iloc[blk]
        lo = lo.item() if hasattr(lo, "item") else lo
        hi = hi.item() if hasattr(hi, "item") else hi
        rows = per_value.filter(
            expr=f"{value_col} >= {lo!r} and {value_col} <= {hi!r}") \
            .to_pandas().sort_values(value_col)
        base = int(cum.iloc[blk - 1]) if blk else 0
        local_cum = rows["n"].cumsum().to_numpy()
        vals = rows[value_col].to_numpy()
        for q, r in targets:
            v = vals[int(np.searchsorted(local_cum, r - base))]
            out[q] = v.item() if hasattr(v, "item") else v
    return out


DRIFT_EXACT_RECHECK_MAX = 8


def drift_exact_recheck(ds, group_col: str, report: pd.DataFrame,
                        max_rechecks: int = DRIFT_EXACT_RECHECK_MAX,
                        ks_threshold: float | None = None) -> pd.DataFrame:
    """Two-phase drift (the reference's secondary-check philosophy,
    ``check/modules/check/IncrementCheckThread.java:147-207``, applied
    to drift verdicts): the sketch-based ``drift_by_group`` flags
    cheaply from t-digest CDFs, whose compression can both inflate and
    understate KS near the threshold — each FAILED numeric (group,
    column) pair is re-tested here with the EXACT distributed KS
    (``ks_exact_counts``: flagged group vs rest) and the verdict is
    downgraded to success when the exact statistic clears the
    threshold. One extra scan per flagged pair, capped at
    ``max_rechecks`` (beyond the cap rows keep the sketch verdict and
    the cap is logged — no-silent-caps rule).

    The comparison is flagged group vs the REFERENCE group — the group
    whose sketch KS sits at the per-column median (the same clean-
    baseline concept the sketch report's excess logic uses): comparing
    vs "all the rest" would let one genuinely drifted group
    contaminate every other group's re-check.

    Adds columns ``ks_exact`` (float or None) and updates ``result``.

    ``ks_threshold=None`` (the default) reads the bar the sketch report
    was adjudicated with (``report.attrs['ks_threshold']``, stamped by
    ``drift_by_group``) so a caller who ran the sketch phase at a custom
    threshold is re-checked at the same bar without passing it twice;
    an explicit value overrides, and 0.1 is the last-resort fallback
    for reports produced elsewhere.
    """
    import logging

    if ks_threshold is None:
        ks_threshold = float(report.attrs.get("ks_threshold", 0.1))
    out = report.copy()
    out["ks_exact"] = None
    # a row is eligible only when KS was its SOLE flag: an exact KS
    # that clears says nothing about a PSI-detected categorical shift
    # (a +/- alternating category drift has PSI > threshold with
    # KS ~ 0 — downgrading it on KS would mask real drift)
    if "psi_flag" in out.columns:
        ks_only = ~out["psi_flag"].fillna(False)
    else:  # reports without flag columns: conservative — a row with
        # any PSI value could have been PSI-flagged
        ks_only = out["psi"].isna()
    failed = out.index[(out["result"] == "failed")
                       & out["ks"].notna() & ks_only].tolist()
    if len(failed) > max_rechecks:
        logging.getLogger(__name__).warning(
            "drift_exact_recheck: %d flagged pairs exceed cap %d — "
            "re-checking the first %d, rest keep sketch verdicts",
            len(failed), max_rechecks, max_rechecks)
        failed = failed[:max_rechecks]
    for idx in failed:
        grp = str(out.at[idx, "grp"])
        col = out.at[idx, "column"]
        # reference = the OTHER group with sketch KS nearest the
        # column median (deterministic grp tie-break)
        peers = out[(out["column"] == col) & (out["grp"].astype(str) != grp)
                    & out["ks"].notna()]
        if not len(peers):
            continue
        med = peers["ks"].median()
        ref = str(peers.assign(d=(peers["ks"] - med).abs())
                  .sort_values(["d", "grp"]).iloc[0]["grp"])

        def flag(batch: pa.Table, _g=grp, _r=ref, _c=col) -> pa.Table:
            gv = pc.cast(batch.column(group_col), pa.large_string())
            is_g = pc.equal(gv, pa.scalar(_g, pa.large_string()))
            is_r = pc.equal(gv, pa.scalar(_r, pa.large_string()))
            sub = batch.filter(pc.or_(is_g, is_r))
            gv2 = pc.cast(sub.column(group_col), pa.large_string())
            a = pc.cast(pc.equal(gv2, pa.scalar(_g, pa.large_string())),
                        pa.int64())
            return pa.table({"value": sub.column(_c), "a": a})

        res = ks_exact_counts(
            ds.map_batches(flag, batch_format="pyarrow"), "value", "a")
        if res["n_a"] and res["n_b"]:
            ks = res["ks_num"] / (res["n_a"] * res["n_b"])
            out.at[idx, "ks_exact"] = ks
            if ks <= ks_threshold:
                out.at[idx, "result"] = "success"
    return out


def exact_quantiles_by_group(ds, group_col: str, value_col: str,
                             qs: list[float],
                             max_fetches: int = 64) -> pd.DataFrame:
    """Per-group EXACT discrete quantiles (quantile_disc semantics) —
    the grouped sibling of :func:`exact_quantiles`, for the bounded
    group counts of a partition/source/type column: per-batch
    (group, value) count partials, ONE groupby+sort over distinct
    (group, value) pairs, one summary row per (block, group) to the
    driver, then a range-filtered fetch of only the block holding
    each (group, rank). Fetches are capped at ``max_fetches`` (beyond
    that, quantiles for the overflow groups come back None and the
    cap is logged — at high group counts use the t-digest sketch
    instead).

    Returns rows (group, q, value); nulls/non-finite dropped.
    """
    import logging
    from fractions import Fraction

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ok = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.is_finite(v))
        ok = pc.and_(ok, pc.is_valid(batch.column(group_col)))
        sub = batch.select([group_col, value_col]).filter(ok)
        gb = sub.group_by([group_col, value_col]).aggregate(
            [([], "count_all")])
        return pa.table({group_col: gb.column(group_col),
                         value_col: gb.column(value_col),
                         "cnt": gb.column("count_all")})

    per_value = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, value_col]) \
        .aggregate(Sum("cnt", alias_name="n")) \
        .sort([group_col, value_col]).materialize()

    def summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({group_col: batch.column(group_col),
                             "vmin": batch.column(value_col),
                             "vmax": batch.column(value_col),
                             "tot": pa.array([], pa.int64())})
        df = pd.DataFrame({
            group_col: batch.column(group_col).to_pandas(),
            value_col: batch.column(value_col).to_pandas(),
            "n": batch.column("n").to_numpy(),
        })
        g = df.groupby(group_col, sort=False).agg(
            vmin=(value_col, "first"), vmax=(value_col, "last"),
            tot=("n", "sum")).reset_index()
        return pa.table({group_col: pa.array(g[group_col]),
                         "vmin": pa.array(g["vmin"]),
                         "vmax": pa.array(g["vmax"]),
                         "tot": pa.array(g["tot"].to_numpy(np.int64))})

    summaries = per_value.map_batches(
        summary, batch_format="pyarrow").to_pandas()
    rows: list[dict] = []
    if not len(summaries):
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "q": pd.Series(dtype=np.float64),
                             "value": pd.Series(dtype=object)})
    fetches = 0
    for grp, s in summaries.groupby(group_col, sort=True):
        s = s.sort_values("vmin").reset_index(drop=True)
        n = int(s["tot"].sum())
        cum = s["tot"].cumsum()
        want: dict[int, list[tuple[float, int]]] = {}
        for q in qs:
            fq = Fraction(str(q))
            r = min(n, max(1, -((-fq.numerator * n) // fq.denominator)))
            blk = int(np.searchsorted(cum.to_numpy(), r))
            want.setdefault(blk, []).append((q, r))
        got: dict[float, object] = {}
        for blk, targets in want.items():
            if fetches >= max_fetches:
                logging.getLogger(__name__).warning(
                    "exact_quantiles_by_group: fetch cap %d reached — "
                    "remaining groups return None", max_fetches)
                break
            fetches += 1
            lo = s["vmin"].iloc[blk]
            hi = s["vmax"].iloc[blk]
            lo = lo.item() if hasattr(lo, "item") else lo
            hi = hi.item() if hasattr(hi, "item") else hi
            # numpy>=2 scalars repr as np.int64(5) — unparseable by the
            # Ray expression grammar; normalize like lo/hi above
            gkey = grp.item() if hasattr(grp, "item") else grp
            sub = per_value.filter(
                expr=f"{group_col} == {gkey!r} and "
                     f"{value_col} >= {lo!r} and {value_col} <= {hi!r}") \
                .to_pandas().sort_values(value_col)
            base = int(cum.iloc[blk - 1]) if blk else 0
            local_cum = sub["n"].cumsum().to_numpy()
            vals = sub[value_col].to_numpy()
            for q, r in targets:
                v = vals[int(np.searchsorted(local_cum, r - base))]
                got[q] = v.item() if hasattr(v, "item") else v
        for q in qs:
            rows.append({group_col: grp, "q": q, "value": got.get(q)})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Embedding-column integrity (north-star extension: the multimodal
# analog of the reference's per-column structure check —
# `check/modules/check/TableCheckService` style verdicts applied to a
# list<float> column that no SQL-typed reference column covers)
# ---------------------------------------------------------------------------


def iqr_outlier_counts(ds, group_col: str, value_col: str,
                       k: float = 1.5,
                       max_fetches: int = 64) -> pd.DataFrame:
    """Per-group Tukey-fence outlier audit: EXACT q1/q3 (discrete
    quantiles — elements of the column, via
    :func:`exact_quantiles_by_group`), fences ``lo = q1 − k·(q3−q1)``
    / ``hi = q3 + k·(q3−q1)``, and the exact count of finite non-null
    values outside them — the classic per-partition "does this feed
    suddenly carry garbage magnitudes" screen. Returns one row per
    group: (group, q1, q3, n_out, n).

    Parity is by construction: the quantiles are exact ELEMENTS, the
    fence arithmetic is the identical float64 expression on both
    engines (k·IQR in the same operation order), and the comparisons
    are strict on the same values — so even double-typed columns
    value-match the ``quantile_disc`` SQL oracle bit-for-bit.

    Shuffle shape: pass 1 is the grouped-quantile kernel (distinct
    (group, value) pairs, bounded fetch); pass 2 re-scans with the
    per-group fences BROADCAST via ``ray.put`` (one object-store copy,
    never re-shipped per batch) and pre-reduces (group, n_out, n)
    inside each batch, so the second shuffle is one tiny row per
    (block, group). Groups with quantiles past the fetch cap are
    dropped (the kernel logs the cap)."""
    import ray
    from ray.data.aggregate import Sum

    qdf = exact_quantiles_by_group(ds, group_col, value_col,
                                   [0.25, 0.75], max_fetches)
    piv = qdf.pivot(index=group_col, columns="q",
                    values="value").dropna()
    if not len(piv):
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "q1": pd.Series(dtype=float),
                             "q3": pd.Series(dtype=float),
                             "n_out": pd.Series(dtype=np.int64),
                             "n": pd.Series(dtype=np.int64)})
    q1 = piv[0.25].to_numpy()
    q3 = piv[0.75].to_numpy()
    iqr = q3 - q1
    bounds = {g: (q1[i] - k * iqr[i], q3[i] + k * iqr[i])
              for i, g in enumerate(piv.index)}
    bounds_ref = ray.put(bounds)

    def partial(batch: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        v = batch.column(value_col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        ok = pc.is_valid(v)
        if pa.types.is_floating(v.type):
            ok = pc.and_(ok, pc.is_finite(v))
        ok = pc.and_(ok, pc.is_valid(batch.column(group_col)))
        sub = batch.select([group_col, value_col]).filter(ok)
        gvals = sub.column(group_col).to_pandas()
        lo = gvals.map({g: lh[0] for g, lh in b.items()}).to_numpy(float)
        hi = gvals.map({g: lh[1] for g, lh in b.items()}).to_numpy(float)
        vv = sub.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(float)
        keep = ~np.isnan(lo)  # groups past the fetch cap are dropped
        out_flag = ((vv < lo) | (vv > hi)) & keep
        t = pa.table({group_col: sub.column(group_col),
                      "o": pa.array(out_flag),
                      "k": pa.array(keep)})
        gb = t.group_by([group_col]).aggregate([("o", "sum"),
                                                ("k", "sum")])
        return pa.table({group_col: gb.column(group_col),
                         "n_out_p": gb.column("o_sum").cast(pa.int64()),
                         "n_p": gb.column("k_sum").cast(pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col) \
        .aggregate(Sum("n_out_p", alias_name="n_out"),
                   Sum("n_p", alias_name="n")).to_pandas()
    out = piv.reset_index().rename(columns={0.25: "q1", 0.75: "q3"})
    out = out.merge(agg, on=group_col, how="inner")
    out = out[out["n"] > 0]
    out["n_out"] = out["n_out"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out[[group_col, "q1", "q3", "n_out", "n"]] \
        .sort_values(group_col).reset_index(drop=True)


# Ordered first-match format classes — ONE registry drives both the
# Arrow kernel and the generated SQL CASE chain, so parity is by
# construction. Patterns are ^$-anchored RE2 in the shared
# python-re/Arrow-re2/DuckDB-re2 subset; search + anchors ==
# fullmatch on all three engines.
FORMAT_CLASSES: list[tuple[str, str]] = [
    ("empty", r"^$"),
    ("int", r"^[+-]?[0-9]+$"),
    # int wins first, so the integer-mantissa branch here only
    # catches exponent forms like 1e9
    ("float",
     r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"),
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("uuid", r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
             r"[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"),
    ("json_object", r"^\{[\s\S]*\}$"),
    ("token", r"^[A-Za-z0-9#_\-\.]+$"),
    ("words", r"^[A-Za-z0-9#_\-\.]+( [A-Za-z0-9#_\-\.]+)+$"),
]


def format_case_sql(value_expr: str) -> str:
    """The SQL spelling of the SAME ordered first-match classifier
    (CASE evaluates in order, exactly like the kernel's unassigned
    mask)."""
    whens = "\n".join(
        f"  WHEN regexp_matches({value_expr}, '{pat}') THEN '{name}'"
        for name, pat in FORMAT_CLASSES)
    return f"CASE\n{whens}\n  ELSE 'other' END"


def format_profile(ds, columns: list[str],
                   batch_size: int | None = None) -> pd.DataFrame:
    """Format-inference profile of string columns: classify every
    non-null value into the FIRST matching :data:`FORMAT_CLASSES`
    pattern (``other`` as the residual) and count per (column,
    format) — the schema-inference validator (a column that is 99%
    ``int``-shaped strings and 1% ``other`` is a typing bug surfaced;
    the reference trusts JDBC types, a lakehouse can't). Returns
    (col, format, n) rows; nulls are excluded (nullability is
    ``not_null``'s job, stated on both engines).

    Shuffle shape: per-block, each class mask is ONE vectorized RE2
    pass over the still-unassigned values; the block emits at most
    |columns|·|classes| partial count rows, folded by one tiny
    groupby. Text never shuffles."""
    cols = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        out_col, out_fmt, out_n = [], [], []
        for c in cols:
            v = batch.column(c)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            v = v.filter(pc.is_valid(v))
            if len(v) == 0:
                continue
            unassigned = np.ones(len(v), dtype=bool)
            for name, pat in FORMAT_CLASSES:
                m = pc.match_substring_regex(v, pat).to_numpy(
                    zero_copy_only=False)
                hit = m & unassigned
                n = int(hit.sum())
                if n:
                    out_col.append(c)
                    out_fmt.append(name)
                    out_n.append(n)
                unassigned &= ~m
            rest = int(unassigned.sum())
            if rest:
                out_col.append(c)
                out_fmt.append("other")
                out_n.append(rest)
        return pa.table({"col": pa.array(out_col, pa.string()),
                         "format": pa.array(out_fmt, pa.string()),
                         "n_p": pa.array(np.asarray(out_n, np.int64))})

    from ray.data.aggregate import Sum

    out = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=batch_size) \
        .groupby(["col", "format"]) \
        .aggregate(Sum("n_p", alias_name="n")).to_pandas()
    if not len(out):
        return pd.DataFrame({"col": pd.Series(dtype=object),
                             "format": pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64)})
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["col", "format"]).reset_index(drop=True)


def fanout_histogram(ds, key_col: str, num_buckets: int = 64,
                     batch_size: int | None = None) -> pd.DataFrame:
    """Relationship-cardinality profile: the exact histogram of
    per-key child counts — one (fanout, n_keys) row per distinct
    fanout value (how many orders have 1 lineitem, 2, 3, ... — the
    data-modeling check that catches a fan-out explosion or a
    silently-dropped child feed; keys with ZERO children don't appear,
    pair with ``referential_violations`` for those). SQL
    ``SELECT n, count(*) FROM (SELECT k, count(*) AS n .. GROUP BY k)
    GROUP BY n``.

    Shuffle shape: the uniqueness-kernel plan — per-block (key, count)
    partials (combiner) tagged ``hash(key) % num_buckets``, ONE
    bucketed groupby co-locates each key's partials, the in-bucket
    reduce folds key totals AND collapses them to its own fanout
    value_counts, so each bucket emits at most |distinct fanouts|
    tiny integer rows; a final pandas fold on the driver sums the
    per-bucket histograms. Null keys are excluded (SQL GROUP BY would
    make NULL a group; a null FK is a nullability fact, not a fanout —
    stated on both engines via ``WHERE k IS NOT NULL``)."""
    from ..functions import hashing

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col)
        sub = batch.select([key_col]).filter(pc.is_valid(k))
        gb = sub.group_by([key_col]).aggregate([([], "count_all")])
        gb = gb.rename_columns([key_col, "n_part"])
        kv = gb.column(key_col)
        if not pa.types.is_large_string(kv.type):
            kv = kv.cast(pa.string()).cast(pa.large_string())
        kh = hashing.hash64(kv)
        return gb.append_column(
            "ubucket",
            pa.array((kh % np.uint64(num_buckets)).astype(np.int32)))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(key_col, sort=False)["n_part"].sum()
        hist = tot.value_counts()
        return pd.DataFrame({"fanout": hist.index.to_numpy(np.int64),
                             "n_keys": hist.to_numpy(np.int64)})

    out = partials.groupby("ubucket").map_groups(
        reduce, batch_format="pandas").to_pandas()
    if not len(out):
        return pd.DataFrame({"fanout": pd.Series(dtype=np.int64),
                             "n_keys": pd.Series(dtype=np.int64)})
    final = out.groupby("fanout", sort=True)["n_keys"].sum() \
        .reset_index()
    final["fanout"] = final["fanout"].astype(np.int64)
    final["n_keys"] = final["n_keys"].astype(np.int64)
    return final.reset_index(drop=True)


def grouped_correlation(ds, group_col: str, x_col: str, y_col: str,
                        batch_size: int | None = None) -> pd.DataFrame:
    """Per-group Pearson correlation of two INTEGER columns from
    EXACT integer moment partials — the derived-column sanity check
    (a price column that stops tracking quantity, an n_chars that
    stops tracking text length, shows up as an r collapse per
    partition). Returns one row per group:
    (group, n, r) with r = (n·Sxy − Sx·Sy) /
    (sqrt(n·Sxx − Sx²) · sqrt(n·Syy − Sy²)); r is None for degenerate
    groups (zero variance or n < 2).

    Exactness / parity: per-block Arrow group_by folds the six
    moments (n, Sx, Sy, Sxx, Syy, Sxy) in int64 — guarded by a
    per-block bound check that RAISES before any silent wrap — and
    the driver folds block partials in unbounded Python ints, so the
    global moments are exact at any scale. The final r is the
    identical float64 expression on both engines (Python int→float
    and DuckDB HUGEINT→DOUBLE both round-to-nearest; sqrt is
    correctly rounded IEEE), so doubles match bit-for-bit.

    Shuffle shape: NONE — one moment row per (block, group) streams
    to the driver (the reconcile/signature aggregation pattern);
    float columns raise (floor them to integers upstream, both
    engines, like the gate query does)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col)
        y = batch.column(y_col)
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        if isinstance(y, pa.ChunkedArray):
            y = y.combine_chunks()
        if not (pa.types.is_integer(x.type) and pa.types.is_integer(y.type)):
            raise ValueError("grouped_correlation needs integer columns "
                             "(exact moments); floor floats upstream on "
                             "both engines")
        ok = pc.and_(pc.and_(pc.is_valid(x), pc.is_valid(y)),
                     pc.is_valid(batch.column(group_col)))
        sub = batch.select([group_col, x_col, y_col]).filter(ok)
        if sub.num_rows:
            xv = sub.column(x_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            yv = sub.column(y_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            mx = max(int(np.abs(xv).max()), int(np.abs(yv).max()), 1)
            if len(xv) * mx * mx >= 2 ** 62:
                raise ValueError(
                    "grouped_correlation: a block's moment sum could "
                    "exceed int64 — rescale the columns or shrink "
                    "batch_size")
            t = pa.table({group_col: sub.column(group_col),
                          "x": pa.array(xv), "y": pa.array(yv),
                          "xx": pa.array(xv * xv),
                          "yy": pa.array(yv * yv),
                          "xy": pa.array(xv * yv)})
        else:
            t = pa.table({group_col: sub.column(group_col),
                          "x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "xx": pa.array([], pa.int64()),
                          "yy": pa.array([], pa.int64()),
                          "xy": pa.array([], pa.int64())})
        gb = t.group_by([group_col]).aggregate(
            [([], "count_all"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return gb.rename_columns([group_col, "n_p", "sx", "sy",
                                  "sxx", "syy", "sxy"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    if not len(parts):
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64),
                             "r": pd.Series(dtype=float)})
    rows = []
    for g, grp in parts.groupby(group_col, sort=True, dropna=False):
        n = int(grp["n_p"].sum())
        sx = sum(int(v) for v in grp["sx"])
        sy = sum(int(v) for v in grp["sy"])
        sxx = sum(int(v) for v in grp["sxx"])
        syy = sum(int(v) for v in grp["syy"])
        sxy = sum(int(v) for v in grp["sxy"])
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if n < 2 or vx <= 0 or vy <= 0:
            r = None
        else:
            import math

            r = float(n * sxy - sx * sy) / (
                math.sqrt(float(vx)) * math.sqrt(float(vy)))
        rows.append({group_col: g, "n": np.int64(n), "r": r})
    return pd.DataFrame(rows).sort_values(group_col) \
        .reset_index(drop=True)


def embedding_integrity_counts(ds, vec_col: str, expected_dim: int,
                               id_col: str | None = None,
                               label_col: str | None = None,
                               label_lo=None, label_hi=None,
                               batch_size: int | None = None) -> pd.DataFrame:
    """One-row integrity report over an embedding table: null vectors,
    dimension mismatches, non-finite elements, all-zero vectors,
    out-of-domain labels, duplicate ids — the constraint set a vector
    index ingest must hold.

    Scale path: one streaming pass; each block emits ONE row of seven
    integer partial counts (the flattened float values are scanned
    vectorized and never leave the task). The optional duplicate-id
    leg reuses the bucketed ``uniqueness_violations`` machinery.

    Element semantics shared with the SQL oracle: "non-finite" is
    ``NOT isfinite(x)`` (NaN or ±inf) and "zero vector" is a non-empty
    vector with no element ``x != 0.0`` — NaN compares unequal to 0 on
    both engines, so a NaN-bearing vector counts non-finite but never
    zero-norm. NULL *elements* inside a list are skipped by both
    predicates (DuckDB's ``list_filter`` drops NULL lambda results),
    so an all-NULL non-empty vector counts zero-norm and nothing
    else."""
    cols = [vec_col] + ([label_col] if label_col else [])
    scan = ds.select_columns(cols)

    def partial(batch: pa.Table) -> pa.Table:
        la = batch.column(vec_col).combine_chunks()
        n = len(la)
        valid = pc.is_valid(la)
        n_null = n - pc.sum(pc.cast(valid, pa.int64())).as_py() if n else 0
        lens = pc.list_value_length(la)  # null where la is null
        mism = pc.sum(pc.cast(pc.and_(valid, pc.not_equal(
            lens, expected_dim)), pa.int64())).as_py() or 0
        flat = pc.list_flatten(la)
        # NULL elements -> NaN in the numpy view; elem_valid excludes
        # them from both predicates (matching list_filter's NULL drop)
        vals = flat.to_numpy(zero_copy_only=False).astype(np.float64)
        elem_valid = ~pc.is_null(flat).to_numpy(zero_copy_only=False)
        lens_np = np.asarray(pc.fill_null(lens, 0), dtype=np.int64)
        rowidx = np.repeat(np.arange(n, dtype=np.int64), lens_np)
        nonfinite_rows = np.unique(
            rowidx[elem_valid & ~np.isfinite(vals)])
        nonzero_rows = np.unique(rowidx[elem_valid & (vals != 0.0)])
        n_len_pos = int(np.count_nonzero(lens_np > 0))
        n_zero_norm = n_len_pos - len(nonzero_rows)
        n_label_oob = 0
        if label_col is not None:
            lab = batch.column(label_col)
            bad = pa.array(np.zeros(len(lab), dtype=bool))
            if label_lo is not None:
                bad = pc.or_(bad, pc.less(lab, label_lo))
            if label_hi is not None:
                bad = pc.or_(bad, pc.greater(lab, label_hi))
            n_label_oob = pc.sum(pc.cast(pc.and_(
                pc.is_valid(lab), pc.fill_null(bad, False)),
                pa.int64())).as_py() or 0
        return pa.table({
            "n_rows": pa.array([n], pa.int64()),
            "n_null_vec": pa.array([int(n_null)], pa.int64()),
            "n_dim_mismatch": pa.array([int(mism)], pa.int64()),
            "n_nonfinite": pa.array([len(nonfinite_rows)], pa.int64()),
            "n_zero_norm": pa.array([int(n_zero_norm)], pa.int64()),
            "n_label_oob": pa.array([int(n_label_oob)], pa.int64()),
        })

    parts = scan.map_batches(partial, batch_format="pyarrow",
                             batch_size=batch_size).to_pandas()
    out = (parts.sum().to_frame().T if len(parts) else pd.DataFrame(
        [[0] * 6], columns=["n_rows", "n_null_vec", "n_dim_mismatch",
                            "n_nonfinite", "n_zero_norm", "n_label_oob"]))
    if id_col is not None:
        vdf = uniqueness_violations(ds, [id_col]).to_pandas()
        out["n_dup_ids"] = int(vdf["n"].sum()) if len(vdf) else 0
    bad_cols = [c for c in out.columns if c not in ("n_rows",)]
    out["passed"] = int(sum(int(out[c].iloc[0]) for c in bad_cols) == 0)
    return out.astype(np.int64).reset_index(drop=True)


def sequence_gap_audit(ds, col: str,
                       batch_size: int | None = None) -> dict:
    """Sequence-completeness audit of an integer ID column: for a
    key space expected to be DENSE (auto-increment PKs, shard-ordinal
    doc ids), ``n_missing = (max - min + 1) - n_distinct`` counts the
    holes exactly — a dropped feed batch shows up here before any
    row-level check can (the reference's row-count precondition,
    generalized to position-aware completeness). Returns
    ``{vmin, vmax, n, n_distinct, n_missing, n_duplicate}`` (all
    exact ints; ``n_duplicate = n - n_distinct``); nulls excluded.

    Shuffle shape: min/max/count fold per block (tiny scalar rows to
    the driver); n_distinct rides the exact bucketed distinct kernel
    (one row per distinct value per block). Empty/all-null input
    returns zeros."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if not pa.types.is_integer(v.type):
            raise ValueError("sequence_gap_audit needs an integer "
                             "id column")
        v = v.filter(pc.is_valid(v))
        if len(v) == 0:
            return pa.table({"vmin": pa.array([], pa.int64()),
                             "vmax": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        arr = v.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"vmin": pa.array([int(arr.min())], pa.int64()),
                         "vmax": pa.array([int(arr.max())], pa.int64()),
                         "n": pa.array([len(arr)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=batch_size).to_pandas()
    if not len(parts):
        return {"vmin": None, "vmax": None, "n": 0, "n_distinct": 0,
                "n_missing": 0, "n_duplicate": 0}
    vmin = int(parts["vmin"].min())
    vmax = int(parts["vmax"].max())
    n = int(parts["n"].sum())
    nd = exact_distinct_count(ds, col, batch_size=batch_size)
    return {"vmin": vmin, "vmax": vmax, "n": n, "n_distinct": nd,
            "n_missing": (vmax - vmin + 1) - nd,
            "n_duplicate": n - nd}

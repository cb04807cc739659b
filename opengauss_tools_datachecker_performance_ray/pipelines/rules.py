"""Declarative constraint-rule engine: the generalized form of the
reference's per-table validation verdicts.

The reference hard-codes its constraint surface (row equality via
digests, PK uniqueness by assumption, per-slice pass/fail in
``CheckDiffResult`` — `check/modules/check/CheckDiffResult.java:55-174`,
rollups in `SliceCheckResultManager.java:101-232`). The north rule asks
for the general engine: a *declarative* set of schema/constraint rules
evaluated over a table with per-partition pass/fail verdicts, violation
counts and violation rows. This module provides that engine,
Ray-Data-first:

- **Row-local rules** (``not_null``, ``in_set``, ``range``, ``regex``)
  compile into ONE fused ``map_batches`` pass: every rule's violation
  mask is computed vectorized (pyarrow.compute) on the same batch, and
  each block emits one tiny partial row per partition value — wide
  integer counts, never the data itself. However many rules you add,
  the input is scanned exactly once.
- **Aggregate-class rules** (``row_count``, ``null_rate``, ``mean``,
  ``sum``, ``min``, ``max``, ``stddev`` with inclusive ``[lo, hi]``
  bounds; ``distinct_count`` adds one bucketed distinct-pair shuffle
  per rule) ride the SAME fused pass: each adds tiny typed partial
  columns (null count, exact sum+count+sumsq, min, max) to the
  per-block grouped fold,
  and the per-scope verdict is recomputed on the driver exactly as
  the generated GROUP BY oracle computes it — the reference's
  table-level precondition checks
  (`check/service/CheckTableStructureService.java:65-80`) generalized
  to declarative per-partition aggregate constraints.
- **Cross-row rules** (``unique``, ``foreign_key``) delegate to the
  bucketed machinery in ``pipelines/checks.py`` (partial-count
  pre-aggregation, byte-aware broadcast anti-join) and land in the
  report as table-level rows (scope ``''``): a duplicate group may
  span partitions, so attributing its rows to one partition would be
  arbitrary — documented, and mirrored exactly by the SQL oracle.
- **Violation rows** for any row-local rule come from
  ``rule_violation_rows`` — the same mask, applied as a streaming
  filter, selecting only the requested evidence columns.

Scale notes: the partial-count shuffle is O(blocks × partitions × 1)
tiny integer rows; partition cardinality up to ~1e5 merges fine on the
driver (same envelope as ``drift_by_group``). Regex semantics are RE2
*search* on both sides (Arrow ``match_substring_regex`` / DuckDB
``regexp_matches``), so sharing the pattern literal gives parity by
construction. Null handling follows SQL: only ``not_null`` counts
nulls; ``in_set``/``range``/``regex`` skip null values (a null lang is
a nullability violation, not a domain violation).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

NULL_SCOPE = "<null>"  # partition-key nulls; '' is the table-level scope

_ROW_LOCAL = ("not_null", "in_set", "range", "regex", "compare_cols")
# functional_dependency: column = determinant (str or tuple), params
# {"determines": dep_col}; violation count = number of determinant
# groups mapping to >1 distinct non-null dependent value (SQL GROUP BY
# det HAVING count(DISTINCT dep) > 1 with det IS NOT NULL stated on
# both engines) — one bucketed distinct-pair shuffle per rule via
# checks.fd_violating_groups
# monotonic: column = the value that must not regress, params
# {"key": str | list, "order_by": [cols...]} — violation count =
# rows below the running max of any earlier row within their key
# under the order (checks.monotonic_regressions; order_by must be a
# total order within each key — include a unique tiebreaker last)
_CROSS_ROW = ("unique", "foreign_key", "functional_dependency",
              "monotonic")
# aggregate-class rules: per-scope constraints over the SAME one-pass
# partials the row-local rules ride (the reference's table-level
# precondition checks generalized — row counts / structure gates in
# `check/service/CheckTableStructureService.java:65-80`). The verdict
# is per scope: the aggregate either satisfies the inclusive [lo, hi]
# bounds (passed=1, n_violations=0) or not (passed=0, n_violations=1).
# An empty aggregate (zero non-null values for mean/min/max/sum/
# stddev) passes vacuously, mirroring how domain rules skip nulls;
# distinct_count of an all-null scope is 0 (SQL COUNT DISTINCT), so
# its bounds still apply.
# - ``stddev`` is the population standard deviation computed by the
#   explicit formula sqrt(max((sumsq - sum*sum/n)/n, 0)) over
#   exactly-folded integer partials — the SQL oracle spells out the
#   identical double expression (not DuckDB's stddev_pop), so
#   integer-column rules are bit-parity. Per-row squares fold in
#   int64 with checked multiply (|v| beyond ~3.0e9 raises on BOTH
#   engines); a float64 shadow sum guards the FOLD — a sum of
#   squares past 2^62 raises on the driver instead of silently
#   wrapping where DuckDB promotes to HUGEINT.
# - ``distinct_count`` is exact, via one extra bucketed
#   distinct-pair shuffle per rule (checks.scoped_distinct_counts);
#   it cannot ride the one-pass partials because distinctness does
#   not fold by summation.
# - ``quantile`` is the exact per-scope discrete quantile (DuckDB
#   ``quantile_disc`` semantics: the element at 1-indexed rank
#   ceil(q*n) under the DECIMAL value of q). Like distinct_count it
#   cannot fold by summation, so all quantile rules over one column
#   share ONE extra distributed pass (checks.exact_quantiles_by_group:
#   distinct (scope, value) count partials, one grouped sort, one
#   range-filtered block fetch per (scope, rank) — the driver never
#   sees the distribution). Because the quantile is an ELEMENT of the
#   column, not an arithmetic combination, the verdict is exactly
#   cross-engine even for float columns — no summation-order caveat.
_AGGREGATE = ("row_count", "null_rate", "mean", "sum", "min", "max",
              "stddev", "distinct_count", "quantile")

# cross-field transform registry: every entry must behave identically
# in Arrow compute and DuckDB SQL (that's why it's a closed registry,
# not arbitrary expressions)
_COL_FNS = {
    None: (lambda a: a, lambda c: c),
    "length": (lambda a: pc.utf8_length(a), lambda c: f"length({c})"),
    "lower": (lambda a: pc.utf8_lower(a), lambda c: f"lower({c})"),
}
_OPS = {
    "==": (pc.equal, "="), "!=": (pc.not_equal, "<>"),
    "<": (pc.less, "<"), "<=": (pc.less_equal, "<="),
    ">": (pc.greater, ">"), ">=": (pc.greater_equal, ">="),
}


@dataclass(frozen=True)
class Rule:
    """One declarative constraint. ``column`` is the checked column
    (for ``unique``: tuple of key columns; for ``foreign_key``: the
    child FK column). ``params``:

    - ``in_set``: ``{"values": [...]}``  (violation: non-null value
      outside the set)
    - ``range``: ``{"lo": x | None, "hi": y | None}`` (inclusive
      bounds; violation: non-null value outside)
    - ``regex``: ``{"pattern": str}`` (RE2 search; violation:
      non-null value with no match)
    - ``foreign_key``: ``{"parent": Dataset, "parent_key": str}``
    - aggregate kinds (``row_count`` / ``null_rate`` / ``mean`` /
      ``sum`` / ``min`` / ``max`` / ``stddev`` /
      ``distinct_count`` / ``quantile``): ``{"lo": x | None,
      "hi": y | None}`` inclusive bounds on the per-scope aggregate
      value; ``row_count`` takes ``column=None``; ``quantile`` adds
      ``{"q": float in (0, 1]}`` (exact discrete quantile,
      ``quantile_disc`` semantics — parity-exact for ANY orderable
      column type since the result is an element, with non-finite
      floats excluded on both engines; set ``finite_only=False``
      only for string columns, where the SQL isfinite guard cannot
      bind and is unnecessary). Exact cross-engine parity
      holds for integer columns (sums and sums-of-squares fold
      exactly on both sides; ``stddev`` evaluates the identical
      double expression) and for min/max/row_count/null_rate/
      distinct_count on integer/string/bool types; a float-column
      ``mean``/``sum``/``stddev`` is summation-order-dependent and
      may differ from SQL in the last ULP at a bounds boundary, and
      float ``distinct_count`` differs on ``-0.0`` (see
      ``checks.scoped_distinct_counts``).
    """

    kind: str
    column: str | tuple | None
    params: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.kind not in _ROW_LOCAL + _CROSS_ROW + _AGGREGATE:
            raise ValueError(f"unknown rule kind {self.kind!r}")
        if self.kind in _AGGREGATE:
            if self.params.get("lo") is None \
                    and self.params.get("hi") is None:
                raise ValueError(f"{self.kind} rule needs lo and/or hi")
            if self.kind == "row_count":
                if self.column is not None:
                    raise ValueError("row_count takes column=None")
            elif not isinstance(self.column, str):
                raise ValueError(f"{self.kind} needs one column name")
            if self.kind == "quantile":
                q = self.params.get("q")
                if not isinstance(q, float) or not 0.0 < q <= 1.0:
                    # rank = ceil(q*n) needs 0 < q <= 1; a float (not
                    # int/str) keeps str(q) a decimal literal that
                    # DuckDB parses to the same DECIMAL the engine's
                    # Fraction(str(q)) rank uses
                    raise ValueError(
                        "quantile rule needs a float q in (0, 1]")
            return
        # reject silently-vacuous rules at construction (a bounds-less
        # range passes everything on the Ray side and generates
        # unparseable SQL)
        if self.kind == "range" and self.params.get("lo") is None \
                and self.params.get("hi") is None:
            raise ValueError("range rule needs lo and/or hi")
        if self.kind == "in_set" and not self.params.get("values"):
            raise ValueError("in_set rule needs a non-empty values list")
        if self.kind == "regex" and not self.params.get("pattern"):
            raise ValueError("regex rule needs a pattern")
        if self.kind == "functional_dependency":
            dep = self.params.get("determines")
            if not isinstance(dep, str) or not dep:
                raise ValueError(
                    "functional_dependency needs params['determines'] "
                    "(the dependent column name)")
            det = (self.column,) if isinstance(self.column, str) \
                else tuple(self.column or ())
            if not det:
                raise ValueError("functional_dependency needs a "
                                 "determinant column (or tuple)")
            if dep in det:
                raise ValueError("functional_dependency: the dependent "
                                 "column cannot be part of the "
                                 "determinant (trivially holds)")
        if self.kind == "monotonic":
            if not isinstance(self.column, str) or not self.column:
                raise ValueError("monotonic needs one value column")
            key = self.params.get("key")
            if not key or not (isinstance(key, str)
                               or isinstance(key, (list, tuple))):
                raise ValueError("monotonic needs params['key']")
            ob = self.params.get("order_by")
            if not isinstance(ob, (list, tuple)) or not ob:
                raise ValueError(
                    "monotonic needs params['order_by'] (a list; "
                    "include a unique tiebreaker column last)")
        if self.kind == "compare_cols":
            if not self.params.get("right"):
                raise ValueError("compare_cols needs a right column")
            if self.params.get("op", "==") not in _OPS:
                raise ValueError(f"unknown op {self.params.get('op')!r}")
            for side in ("left_fn", "right_fn"):
                if self.params.get(side) not in _COL_FNS:
                    raise ValueError(
                        f"{side} must be one of {sorted(k for k in _COL_FNS if k)}"
                        f" or None")

    @property
    def rule_id(self) -> str:
        if self.kind == "compare_cols":
            op = self.params.get("op", "==")
            lf, rf = self.params.get("left_fn"), self.params.get("right_fn")
            lhs = f"{lf}({self.column})" if lf else self.column
            r = self.params["right"]
            rhs = f"{rf}({r})" if rf else r
            return f"compare({lhs}{op}{rhs})"
        col = (",".join(self.column) if isinstance(self.column, tuple)
               else (self.column or ""))
        if self.kind == "functional_dependency":
            return f"fd({col}->{self.params['determines']})"
        if self.kind == "monotonic":
            key = self.params["key"]
            k = ",".join(key) if isinstance(key, (list, tuple)) else key
            return f"monotonic({col} per {k})"
        if self.kind == "quantile":
            # the q is part of the identity: p50 and p90 rules on one
            # column must not collide into a #2 suffix
            return f"quantile[{self.params['q']}]({col})"
        return f"{self.kind}({col})"

    @property
    def input_columns(self) -> set:
        """Every column this rule reads (projection pruning)."""
        if self.column is None:
            return set()
        cols = set(self.column) if isinstance(self.column, tuple) \
            else {self.column}
        if self.kind == "compare_cols":
            cols.add(self.params["right"])
        if self.kind == "functional_dependency":
            cols.add(self.params["determines"])
        if self.kind == "monotonic":
            key = self.params["key"]
            cols |= set([key] if isinstance(key, str) else key)
            cols |= set(self.params["order_by"])
        return cols

    def violation_mask_batch(self, batch: pa.Table) -> pa.Array:
        """Row-local violation mask computed over the whole batch —
        the general entry point (cross-field rules need two columns)."""
        if self.kind == "compare_cols":
            left = batch.column(self.column)
            right = batch.column(self.params["right"])
            valid = pc.and_(pc.is_valid(left), pc.is_valid(right))
            if pa.types.is_null(left.type) or \
                    pa.types.is_null(right.type):
                return pa.array(np.zeros(len(batch), dtype=bool))
            lf = _COL_FNS[self.params.get("left_fn")][0]
            rf = _COL_FNS[self.params.get("right_fn")][0]
            op = _OPS[self.params.get("op", "==")][0]
            holds = pc.fill_null(op(lf(left), rf(right)), True)
            return pc.and_(valid, pc.invert(holds))
        return self.violation_mask(batch.column(self.column))

    # ---- Ray-side violation mask (row-local kinds only) ----

    def violation_mask(self, col: pa.ChunkedArray | pa.Array) -> pa.Array:
        valid = pc.is_valid(col)
        if self.kind == "not_null":
            return pc.invert(valid)
        if pa.types.is_null(col.type):
            # an all-null block arrives as the NULL type (no value
            # kernel exists); domain rules skip nulls, so nothing
            # violates (found by the hypothesis fuzz)
            return pa.array(np.zeros(len(col), dtype=bool))
        if self.kind == "in_set":
            hit = pc.is_in(col, value_set=pa.array(
                self.params["values"], type=col.type))
            return pc.and_(valid, pc.invert(hit))
        if self.kind == "range":
            lo, hi = self.params.get("lo"), self.params.get("hi")
            out = pa.array(np.zeros(len(col), dtype=bool))
            if lo is not None:
                out = pc.or_(out, pc.less(col, lo))
            if hi is not None:
                out = pc.or_(out, pc.greater(col, hi))
            return pc.and_(valid, pc.fill_null(out, False))
        if self.kind == "regex":
            hit = pc.match_substring_regex(col, self.params["pattern"])
            return pc.and_(valid, pc.invert(pc.fill_null(hit, False)))
        raise ValueError(f"{self.kind} has no row-local mask")

    # ---- SQL predicate with identical semantics (for the oracle) ----

    def violation_sql(self) -> str:
        c = self.column
        if self.kind == "not_null":
            return f"{c} IS NULL"
        if self.kind == "in_set":
            vals = ", ".join(_sql_lit(v) for v in self.params["values"])
            return f"({c} IS NOT NULL AND {c} NOT IN ({vals}))"
        if self.kind == "range":
            lo, hi = self.params.get("lo"), self.params.get("hi")
            parts = []
            if lo is not None:
                parts.append(f"{c} < {_sql_lit(lo)}")
            if hi is not None:
                parts.append(f"{c} > {_sql_lit(hi)}")
            return f"({c} IS NOT NULL AND ({' OR '.join(parts)}))"
        if self.kind == "regex":
            pat = self.params["pattern"].replace("'", "''")
            return (f"({c} IS NOT NULL AND NOT "
                    f"regexp_matches({c}, '{pat}'))")
        if self.kind == "compare_cols":
            r = self.params["right"]
            lhs = _COL_FNS[self.params.get("left_fn")][1](c)
            rhs = _COL_FNS[self.params.get("right_fn")][1](r)
            sql_op = _OPS[self.params.get("op", "==")][1]
            return (f"({c} IS NOT NULL AND {r} IS NOT NULL AND NOT "
                    f"({lhs} {sql_op} {rhs}))")
        raise ValueError(f"{self.kind} has no row-local SQL predicate")


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # repr round-trips the double exactly, but a bare decimal
        # literal parses as DECIMAL in DuckDB, whose DECIMAL->DOUBLE
        # conversion is NOT correctly rounded (0.9999999999999999
        # becomes 1.0). An exponent suffix forces a true DOUBLE parse
        # (strtod, correctly rounded) so < / > comparisons stay
        # bit-equal with the engine.
        r = repr(v)
        return r if ("e" in r or "inf" in r or "nan" in r) else r + "e0"
    return str(v)


REPORT_COLUMNS = ["scope", "rule_id", "n_rows", "n_violations", "passed"]


def rule_ids(rules: list[Rule]) -> list[str]:
    """Report ids for a rule list — the base ``kind(column)`` id, with
    a positional ``#2``/``#3``... suffix whenever two rules share one
    (e.g. two regex rules on the same column). Every generation site
    (evaluate, SQL oracle, CLI violation dirs) derives ids through
    this helper over the SAME list, so the suffixes always agree."""
    seen: dict[str, int] = {}
    out = []
    for r in rules:
        base = r.rule_id
        seen[base] = seen.get(base, 0) + 1
        out.append(base if seen[base] == 1 else f"{base}#{seen[base]}")
    return out


def agg_partial_plan(aggs: list[Rule]) -> list[tuple[str, str]]:
    """The extra partial columns an aggregate rule list needs, as
    ``(column_name, merge_fn)`` pairs where merge_fn is the driver-side
    fold (``sum`` / ``min`` / ``max``). Shared by the block partials,
    the driver merge and the empty-schema fallback so the three always
    agree column-for-column."""
    plan: list[tuple[str, str]] = []
    for j, r in enumerate(aggs):
        if r.kind in ("row_count", "distinct_count", "quantile"):
            continue  # n_rows carries row_count; the other two have
            # their own non-foldable passes
        if r.kind == "null_rate":
            plan.append((f"a{j}_nul", "sum"))
        elif r.kind in ("mean", "sum"):
            plan.append((f"a{j}_sum", "sum"))
            plan.append((f"a{j}_cnt", "sum"))
        elif r.kind == "stddev":
            # same order row_local_partials emits (column-for-column
            # contract with the empty-schema fallback)
            plan.append((f"a{j}_sum", "sum"))
            plan.append((f"a{j}_cnt", "sum"))
            plan.append((f"a{j}_sq", "sum"))
            plan.append((f"a{j}_sqf", "sum"))
        elif r.kind == "min":
            plan.append((f"a{j}_min", "min"))
        else:  # max
            plan.append((f"a{j}_max", "max"))
    return plan


def row_local_partials(batch: pa.Table, local: list[Rule],
                       partition_col: str | None,
                       aggs: list[Rule] | None = None) -> pa.Table:
    """One block's contribution to the verdict report: every row-local
    rule's violation mask computed vectorized on the same batch, summed
    per partition value — wide integer partial rows (scope, n_rows,
    v0..vN), never the data itself. Aggregate rules ride the SAME
    grouped fold: each adds its partial columns (null count, sum+count,
    min, max) so however many rules of either class you declare, the
    input is scanned exactly once."""
    aggs = aggs or []
    vcols = [f"v{i}" for i in range(len(local))]
    cols = {}
    if partition_col is not None:
        scope = batch.column(partition_col).cast(pa.large_string())
        cols["scope"] = pc.fill_null(scope, NULL_SCOPE)
    else:
        cols["scope"] = pa.array([""] * len(batch),
                                 type=pa.large_string())
    cols["n_rows"] = pa.array(np.ones(len(batch), dtype=np.int64))
    for name, rule in zip(vcols, local):
        mask = rule.violation_mask_batch(batch)
        cols[name] = pc.cast(mask, pa.int64())
    spec = [("n_rows", "sum")] + [(v, "sum") for v in vcols]
    out_names = ["scope", "n_rows"] + list(vcols)
    for j, r in enumerate(aggs):
        if r.kind in ("row_count", "distinct_count", "quantile"):
            continue
        col = batch.column(r.column)
        if pa.types.is_null(col.type):
            # an all-null column arrives as the NULL type: no value
            # kernels exist, so emit typed empties (cnt 0 / null
            # extremes) — the aggregate then passes vacuously
            col = pa.nulls(len(batch), pa.float64())
        if r.kind == "null_rate":
            cols[f"a{j}_nul"] = pc.cast(pc.is_null(col), pa.int64())
            spec.append((f"a{j}_nul", "sum"))
            out_names.append(f"a{j}_nul")
        elif r.kind in ("mean", "sum", "stddev"):
            cols[f"a{j}_sum"] = col  # Arrow hash_sum skips nulls
            cols[f"a{j}_cnt"] = pc.cast(pc.is_valid(col), pa.int64())
            spec += [(f"a{j}_sum", "sum"), (f"a{j}_cnt", "sum")]
            out_names += [f"a{j}_sum", f"a{j}_cnt"]
            if r.kind == "stddev":
                # checked multiply: an int64 PER-ROW overflow raises
                # here exactly where DuckDB's BIGINT c*c errors. The
                # FOLD can still wrap silently (Arrow hash_sum is
                # modular where DuckDB promotes to HUGEINT), so a
                # float64 shadow of the same squares rides along —
                # immune to wrapping, accurate to 1 ulp — and the
                # driver raises when it shows the true sum of squares
                # near 2^63 (aggregate_report_rows)
                sq = pc.multiply_checked(col, col)
                cols[f"a{j}_sq"] = sq
                # unsafe cast: the shadow needs magnitude, not the
                # 2^53-exact range a safe int->float cast enforces
                cols[f"a{j}_sqf"] = pc.cast(sq, pa.float64(),
                                            safe=False)
                spec += [(f"a{j}_sq", "sum"), (f"a{j}_sqf", "sum")]
                out_names += [f"a{j}_sq", f"a{j}_sqf"]
        else:  # min / max
            name = f"a{j}_{r.kind}"
            cols[name] = col
            spec.append((name, r.kind))
            out_names.append(name)
    t = pa.table(cols)
    g = t.group_by(["scope"]).aggregate(spec)
    # aggregate() appends the agg fn to each output name; restore ours
    g = g.rename_columns(out_names)
    # an all-null (scope, block) group makes hash_sum emit a NULL
    # partial; to_pandas would widen that int64 column to float64 via
    # NaN and break the documented integer-exact fold past 2^53. The
    # paired cnt partial is 0 for that group, so a typed zero is the
    # exact contribution.
    for j, r in enumerate(aggs):
        if r.kind not in ("mean", "sum", "stddev"):
            continue
        for name in (f"a{j}_sum", f"a{j}_sq", f"a{j}_sqf"):
            if name not in g.column_names:
                continue
            idx = g.column_names.index(name)
            c = g.column(idx)
            if c.null_count:
                g = g.set_column(
                    idx, name, pc.fill_null(c, pa.scalar(0, c.type)))
    return g


def merge_partials(part: pd.DataFrame, n_local: int,
                   aggs: list[Rule] | None = None) -> pd.DataFrame:
    """Driver-side fold of the per-block partial rows. Count-like
    columns sum; min/max partials fold with min/max (pandas skips the
    NaN an all-null block emitted)."""
    plan = agg_partial_plan(aggs or [])
    if part.empty:  # empty Dataset loses its schema on to_pandas
        part = pd.DataFrame(columns=["scope", "n_rows"]
                            + [f"v{i}" for i in range(n_local)]
                            + [c for c, _ in plan])

    def _sum_keep_nan(s: pd.Series):
        # pandas' named "sum" skips NaN; after the block-side typed
        # zero fill the only NaN left in a float sum partial is a
        # GENUINE data NaN, which must propagate (DuckDB's sum does)
        return s.sum(skipna=False) if s.dtype.kind == "f" else s.sum()

    fold = {c: _sum_keep_nan for c in part.columns if c != "scope"}
    fold.update({c: (f if f != "sum" else _sum_keep_nan)
                 for c, f in plan})
    return (part.groupby("scope", sort=True).agg(fold)
                .reset_index())


def aggregate_report_rows(merged: pd.DataFrame, aggs: list[Rule],
                          ids: list[str],
                          distinct_vals: dict[int, dict] | None = None,
                          quantile_vals: dict[int, dict] | None = None,
                          ) -> list[dict]:
    """Per-(scope, aggregate-rule) verdict rows from the merged
    partials. The aggregate value is recomputed exactly as the SQL
    oracle does (the identical float expression over exactly-folded
    integer partials), so integer-column rules are bit-parity with
    DuckDB. ``distinct_vals`` maps an aggs index to that
    distinct_count rule's {scope: n_distinct} (from
    ``checks.scoped_distinct_counts``); absent scopes count 0, like
    SQL COUNT DISTINCT over an all-null scope. ``quantile_vals`` maps
    an aggs index to that quantile rule's {scope: element}; an absent
    scope (all values null/non-finite there) passes vacuously, like
    SQL ``quantile_disc`` returning NULL."""
    distinct_vals = distinct_vals or {}
    quantile_vals = quantile_vals or {}
    rows = []
    for _, row in merged.iterrows():
        n = int(row["n_rows"])
        for j, (rule, rid) in enumerate(zip(aggs, ids)):
            lo = rule.params.get("lo")
            hi = rule.params.get("hi")
            if rule.kind == "row_count":
                val = n
            elif rule.kind == "distinct_count":
                val = int(distinct_vals.get(j, {}).get(row["scope"], 0))
            elif rule.kind == "quantile":
                val = quantile_vals.get(j, {}).get(row["scope"])
            elif rule.kind == "null_rate":
                val = float(np.float64(int(row[f"a{j}_nul"]))
                            / np.float64(n))
            elif rule.kind == "stddev":
                cnt = int(row[f"a{j}_cnt"])
                if cnt == 0:
                    val = None  # vacuous: no non-null values in scope
                else:
                    if abs(float(row[f"a{j}_sqf"])) > float(2 ** 62):
                        # the int64 sum-of-squares fold would have
                        # wrapped (DuckDB promotes to HUGEINT) — the
                        # float shadow sees the true magnitude; fail
                        # loudly instead of silently diverging
                        raise ValueError(
                            f"stddev({rule.column}): sum of squares "
                            f"exceeds the int64 fold range in scope "
                            f"{row['scope']!r}; rescale the column")
                    # the oracle's expression verbatim:
                    # sqrt(greatest((sumsq - sum*sum/n)/n, 0))
                    q = np.float64(row[f"a{j}_sq"])
                    s = np.float64(row[f"a{j}_sum"])
                    m = np.float64(cnt)
                    val = float(np.sqrt(np.maximum(
                        (q - s * s / m) / m, np.float64(0.0))))
            elif rule.kind in ("mean", "sum"):
                cnt = int(row[f"a{j}_cnt"])
                s = row[f"a{j}_sum"]
                if cnt == 0:
                    val = None  # vacuous: no non-null values in scope
                elif rule.kind == "sum":
                    val = s.item() if hasattr(s, "item") else s
                else:
                    val = float(np.float64(s) / np.float64(cnt))
            else:  # min / max
                v = row[f"a{j}_{rule.kind}"]
                val = None if v is None or (isinstance(v, float)
                                            and np.isnan(v)) else \
                    (v.item() if hasattr(v, "item") else v)
            if isinstance(val, float) and np.isnan(val):
                # DuckDB orders NaN greater than every value (its
                # float totally-ordered comparison), so a NaN
                # aggregate violates any hi bound and never a lo
                # bound; Python's 'NaN > hi' is False, which would
                # silently pass where the oracle fails
                viol = hi is not None
            else:
                viol = val is not None and (
                    (lo is not None and val < lo)
                    or (hi is not None and val > hi))
            rows.append({"scope": row["scope"], "rule_id": rid,
                         "n_rows": n, "n_violations": int(viol),
                         "passed": int(not viol)})
    return rows


def partials_to_report(merged: pd.DataFrame, local: list[Rule],
                       ids: list[str] | None = None) -> list[dict]:
    """Melt the merged wide partials into per-(scope, rule) verdict
    rows. ``ids`` overrides the display ids (pass the slice of
    ``rule_ids`` over the full rule list so suffixes line up)."""
    ids = ids if ids is not None else rule_ids(local)
    rows = []
    for _, row in merged.iterrows():
        for i, rid in enumerate(ids):
            nv = int(row[f"v{i}"])
            rows.append({"scope": row["scope"], "rule_id": rid,
                         "n_rows": int(row["n_rows"]),
                         "n_violations": nv, "passed": int(nv == 0)})
    return rows


def evaluate_rules(ds, rules: list[Rule],
                   partition_col: str | None = None,
                   batch_size: int | None = None) -> pd.DataFrame:
    """Evaluate a declarative rule set over one table.

    Returns the verdict report: one row per (scope, rule) with columns
    ``scope`` (partition value as string; ``''`` for table-level =
    cross-row rules or ``partition_col=None``), ``rule_id``,
    ``n_rows`` (rows checked in that scope), ``n_violations`` and
    ``passed`` (int 0/1) — the generalized ``CheckDiffResult``.

    One streaming input pass covers every row-local AND aggregate
    rule (their partials share the per-block grouped fold); each
    ``unique`` / ``foreign_key`` rule adds its own bucketed/broadcast
    pass via ``checks``.
    """
    from . import checks

    ids_all = rule_ids(rules)
    local = [r for r in rules if r.kind in _ROW_LOCAL]
    local_ids = [i for r, i in zip(rules, ids_all)
                 if r.kind in _ROW_LOCAL]
    aggr = [r for r in rules if r.kind in _AGGREGATE]
    aggr_ids = [i for r, i in zip(rules, ids_all)
                if r.kind in _AGGREGATE]
    cross = [(r, i) for r, i in zip(rules, ids_all)
             if r.kind in _CROSS_ROW]
    out_rows: list[dict] = []
    total_rows = None

    if local or aggr:
        def partials(batch: pa.Table) -> pa.Table:
            return row_local_partials(batch, local, partition_col,
                                      aggs=aggr)

        part = ds.map_batches(partials, batch_format="pyarrow",
                              batch_size=batch_size).to_pandas()
        merged = merge_partials(part, len(local), aggs=aggr)
        total_rows = int(merged["n_rows"].sum())
        # all distinct_count rules share ONE extra bucketed
        # distinct-triple shuffle (distinctness does not fold by sum),
        # over a projection of just the checked + partition columns
        dcols = sorted({r.column for r in aggr
                        if r.kind == "distinct_count"})
        distinct_vals = {}
        if dcols:
            proj = sorted(set(dcols)
                          | ({partition_col} if partition_col else set()))
            per_col = checks.scoped_distinct_counts(
                ds.select_columns(proj), dcols, partition_col,
                batch_size=batch_size, null_scope=NULL_SCOPE)
            distinct_vals = {j: per_col[r.column]
                             for j, r in enumerate(aggr)
                             if r.kind == "distinct_count"}
        # quantile rules: one exact distributed pass per checked
        # column, all that column's q's fetched together (quantiles
        # don't fold by summation — same reasoning as distinct_count)
        quantile_vals: dict[int, dict] = {}
        qcols = sorted({r.column for r in aggr if r.kind == "quantile"})
        for col in qcols:
            qs = sorted({r.params["q"] for r in aggr
                         if r.kind == "quantile" and r.column == col})
            if partition_col is None:
                got = checks.exact_quantiles(
                    ds.select_columns([col]), col, qs)
                per_scope = {q: ({} if v is None else {"": v})
                             for q, v in got.items()}
            else:
                proj = sorted({col, partition_col})

                def add_scope(batch: pa.Table,
                              _p=partition_col) -> pa.Table:
                    s = pc.fill_null(
                        batch.column(_p).cast(pa.large_string()),
                        NULL_SCOPE)
                    return batch.append_column("__scope__", s)

                qdf = checks.exact_quantiles_by_group(
                    ds.select_columns(proj).map_batches(
                        add_scope, batch_format="pyarrow",
                        batch_size=batch_size),
                    "__scope__", col, qs, max_fetches=4096)
                present = qdf[qdf["value"].notna()]
                if len(present) != len(qdf):
                    # a scope present in qdf has >=1 non-null value, so
                    # every rank resolves — a None there means the
                    # fetch budget truncated it; a silent vacuous PASS
                    # would be a false verdict
                    raise ValueError(
                        f"quantile({col}): scope count exceeds the "
                        f"exact-quantile fetch budget; reduce the "
                        f"partition cardinality or use the t-digest "
                        f"drift profile instead")
                per_scope = {
                    q: dict(zip(sub["__scope__"], sub["value"]))
                    for q, sub in present.groupby("q", sort=False)}
            for j, r in enumerate(aggr):
                if r.kind == "quantile" and r.column == col:
                    quantile_vals[j] = per_scope.get(r.params["q"], {})
        out_rows.extend(partials_to_report(merged, local, local_ids))
        out_rows.extend(aggregate_report_rows(
            merged, aggr, aggr_ids, distinct_vals=distinct_vals,
            quantile_vals=quantile_vals))

    if cross:
        # scoped FD rows need per-scope row counts: reuse the merged
        # partials when a fused scan already ran, else run the
        # minimal partials pass (scope + n_rows only)
        scope_counts: dict | None = None
        if partition_col is not None and any(
                r.kind == "functional_dependency" for r, _ in cross):
            if local or aggr:
                scope_counts = {s: int(n) for s, n in
                                zip(merged["scope"], merged["n_rows"])}
            else:
                def count_partials(batch: pa.Table) -> pa.Table:
                    return row_local_partials(batch, [], partition_col)

                cp = ds.map_batches(count_partials,
                                    batch_format="pyarrow",
                                    batch_size=batch_size).to_pandas()
                cm = merge_partials(cp, 0)
                scope_counts = {s: int(n) for s, n in
                                zip(cm["scope"], cm["n_rows"])}
                total_rows = sum(scope_counts.values())
        if total_rows is None:
            total_rows = ds.count()
        for rule, rid in cross:
            if rule.kind == "unique":
                key_cols = (list(rule.column)
                            if isinstance(rule.column, tuple)
                            else [rule.column])
                viol = checks.uniqueness_violations(ds, key_cols)
                vdf = viol.to_pandas()  # one row per duplicated key
                nv = int(vdf["n"].sum()) if len(vdf) else 0
            elif rule.kind == "functional_dependency":
                if partition_col is not None:
                    # per-partition verdict: the dependency is
                    # evaluated WITHIN each scope ((scope, det)
                    # groups), one pass/fail row per scope — unlike
                    # unique/foreign_key, whose violating sets span
                    # partitions by nature
                    fdmap = checks.fd_violating_groups(
                        ds, rule.column, rule.params["determines"],
                        batch_size=batch_size,
                        scope_col=partition_col,
                        null_scope=NULL_SCOPE)
                    for scope, n in (scope_counts or {}).items():
                        snv = int(fdmap.get(scope, 0))
                        out_rows.append(
                            {"scope": scope, "rule_id": rid,
                             "n_rows": n, "n_violations": snv,
                             "passed": int(snv == 0)})
                    continue
                nv = checks.fd_violating_groups(
                    ds, rule.column, rule.params["determines"],
                    batch_size=batch_size)
            elif rule.kind == "monotonic":
                key = rule.params["key"]
                nv = checks.monotonic_regressions(
                    ds, rule.column,
                    [key] if isinstance(key, str) else list(key),
                    list(rule.params["order_by"]),
                    batch_size=batch_size)
            else:  # foreign_key
                nv = checks.referential_violations(
                    ds, rule.column, rule.params["parent"],
                    rule.params["parent_key"]).count()
            out_rows.append({"scope": "", "rule_id": rid,
                             "n_rows": total_rows, "n_violations": nv,
                             "passed": int(nv == 0)})

    df = pd.DataFrame(out_rows, columns=REPORT_COLUMNS)
    df = df.astype({"n_rows": np.int64, "n_violations": np.int64,
                    "passed": np.int64})
    return (df.sort_values(["scope", "rule_id"])
              .reset_index(drop=True))


def rule_violation_rows(ds, rule: Rule, columns: list[str],
                        batch_size: int | None = None,
                        partition_col: str | None = None):
    """Streaming Dataset of the evidence for one rule's violations —
    the engine's ``Difference`` analog
    (`common/entry/check/Difference.java:28-41`).

    Row-local rules return the violating rows projected to
    ``columns``. Cross-row rules return their kind's natural
    evidence (``columns`` is ignored — each already carries its own
    schema): ``unique`` -> (key..., n) duplicated keys;
    ``functional_dependency`` -> (det..., n_dep) violating groups;
    ``monotonic`` -> (key..., n_events, n_regressions) regressing
    keys; ``foreign_key`` -> dangling child key values. Aggregate
    rules have no row evidence (the verdict IS the evidence) and
    raise. ``partition_col`` must match the report's: a
    partition-scoped FD judges (scope, det) groups, so its evidence
    must be scoped too — an unscoped export could list groups the
    scoped report passed (review finding)."""
    from . import checks

    if rule.kind in _CROSS_ROW:
        if rule.kind == "unique":
            key_cols = (list(rule.column)
                        if isinstance(rule.column, tuple)
                        else [rule.column])
            return checks.uniqueness_violations(
                ds, key_cols, batch_size=batch_size)
        if rule.kind == "functional_dependency":
            return checks.fd_violating_groups(
                ds, rule.column, rule.params["determines"],
                batch_size=batch_size, evidence_rows=True,
                scope_col=partition_col)
        if rule.kind == "monotonic":
            key = rule.params["key"]
            return checks.monotonic_regressions(
                ds, rule.column,
                [key] if isinstance(key, str) else list(key),
                list(rule.params["order_by"]),
                batch_size=batch_size, evidence_rows=True)
        return checks.referential_violations(
            ds, rule.column, rule.params["parent"],
            rule.params["parent_key"])
    if rule.kind not in _ROW_LOCAL:
        raise ValueError("aggregate rules have no violation rows — "
                         "the per-scope verdict is the evidence")
    need = sorted(set(columns) | rule.input_columns)

    def f(batch: pa.Table) -> pa.Table:
        mask = rule.violation_mask_batch(batch)
        return batch.select(need).filter(mask).select(columns)

    return ds.select_columns(need).map_batches(
        f, batch_format="pyarrow", batch_size=batch_size)


# ---------------------------------------------------------------------------
# SQL oracle builder (mirrors evaluate_rules row for row)
# ---------------------------------------------------------------------------


def rules_report_sql(table: str, rules: list[Rule],
                     partition_col: str | None = None,
                     fk_tables: dict[str, tuple[str, str]] | None = None,
                     ) -> str:
    """DuckDB SQL producing exactly ``evaluate_rules``'s report.

    ``fk_tables`` maps a foreign_key rule_id to (parent_table,
    parent_key) — the SQL can't read the Dataset held in the rule's
    params, so the caller names the parent relation."""
    scope_expr = (f"coalesce(CAST({partition_col} AS VARCHAR), "
                  f"'{NULL_SCOPE}')" if partition_col else "''")
    selects = []
    for r, rid in zip(rules, rule_ids(rules)):
        if r.kind in _ROW_LOCAL:
            selects.append(f"""
SELECT {scope_expr} AS scope, '{rid}' AS rule_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {r.violation_sql()} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations,
       CAST(CASE WHEN sum(CASE WHEN {r.violation_sql()} THEN 1 ELSE 0
            END) = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
FROM {table} GROUP BY 1""")
        elif r.kind in _AGGREGATE:
            c = r.column
            if r.kind == "row_count":
                agg = "count(*)"
            elif r.kind == "null_rate":
                # exactly the engine's fold: one double division over
                # exactly-summed integer partials
                agg = (f"(CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 "
                       f"END) AS DOUBLE) / count(*))")
            elif r.kind == "mean":
                agg = (f"(CASE WHEN count({c}) = 0 THEN NULL ELSE "
                       f"CAST(sum({c}) AS DOUBLE) / count({c}) END)")
            elif r.kind == "stddev":
                # the engine's expression verbatim (NOT stddev_pop,
                # whose streaming update order differs in floats):
                # population sd over exactly-folded integer partials
                agg = (f"(CASE WHEN count({c}) = 0 THEN NULL ELSE "
                       f"sqrt(greatest((CAST(sum({c} * {c}) AS DOUBLE)"
                       f" - CAST(sum({c}) AS DOUBLE) * CAST(sum({c}) "
                       f"AS DOUBLE) / CAST(count({c}) AS DOUBLE)) / "
                       f"CAST(count({c}) AS DOUBLE), 0e0)) END)")
            elif r.kind == "distinct_count":
                agg = f"count(DISTINCT {c})"
            elif r.kind == "quantile":
                # str(q) is a DECIMAL literal — DuckDB's quantile rank
                # uses the decimal value of q, exactly the engine's
                # Fraction(str(q)) rank (checks.exact_quantiles). The
                # engine drops non-finite floats, so the oracle guards
                # with isfinite (binds on numeric/temporal; for string
                # columns pass finite_only=False to skip the guard,
                # which strings don't need).
                expr = (f"CASE WHEN isfinite({c}) THEN {c} END"
                        if r.params.get("finite_only", True) else c)
                agg = f"quantile_disc({expr}, {r.params['q']})"
            else:  # sum / min / max — NULL when the scope is all-null
                agg = f"{r.kind}({c})"
            lo, hi = r.params.get("lo"), r.params.get("hi")
            parts = []
            if lo is not None:
                parts.append(f"{agg} < {_sql_lit(lo)}")
            if hi is not None:
                parts.append(f"{agg} > {_sql_lit(hi)}")
            # NULL aggregate (empty scope) passes vacuously, like the
            # engine; OR over NULL comparisons stays NULL -> ELSE 0
            viol = (f"CASE WHEN {' OR '.join(parts)} THEN 1 ELSE 0 END")
            selects.append(f"""
SELECT {scope_expr} AS scope, '{rid}' AS rule_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST({viol} AS BIGINT) AS n_violations,
       CAST(1 - ({viol}) AS BIGINT) AS passed
FROM {table} GROUP BY 1""")
        elif r.kind == "unique":
            cols = (list(r.column) if isinstance(r.column, tuple)
                    else [r.column])
            key_cols = ", ".join(cols)
            # SQL UNIQUE-constraint semantics: rows with a null key
            # part never violate (mirrors the engine's bucketed
            # uniqueness fold, which drops null-keyed groups)
            notnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
            dup = (f"(SELECT count(*) FROM (SELECT count(*) OVER "
                   f"(PARTITION BY {key_cols}) AS c FROM {table} "
                   f"WHERE {notnull}) WHERE c > 1)")
            selects.append(f"""
SELECT '' AS scope, '{rid}' AS rule_id,
       CAST((SELECT count(*) FROM {table}) AS BIGINT) AS n_rows,
       CAST({dup} AS BIGINT) AS n_violations,
       CAST(CASE WHEN {dup} = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS passed""")
        elif r.kind == "functional_dependency":
            det = (list(r.column) if isinstance(r.column, tuple)
                   else [r.column])
            dep = r.params["determines"]
            notnull = " AND ".join(f"{c} IS NOT NULL" for c in det)
            # dep nulls are skipped by count(DISTINCT) itself; the
            # determinant null filter is stated (the engine drops
            # null-det rows — a NULL never determines anything)
            if partition_col is not None:
                # per-partition FD: (scope, det) groups; every scope
                # gets a verdict row (LEFT JOIN, zero-coalesced)
                selects.append(f"""
SELECT s.scope, '{rid}' AS rule_id,
       CAST(s.n_rows AS BIGINT) AS n_rows,
       CAST(coalesce(v.nv, 0) AS BIGINT) AS n_violations,
       CAST(CASE WHEN coalesce(v.nv, 0) = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS passed
FROM (SELECT {scope_expr} AS scope, count(*) AS n_rows
      FROM {table} GROUP BY 1) s
LEFT JOIN (
    SELECT scope, count(*) AS nv FROM (
        SELECT {scope_expr} AS scope, {', '.join(det)}
        FROM {table} WHERE {notnull}
        GROUP BY 1, {', '.join(det)}
        HAVING count(DISTINCT {dep}) > 1)
    GROUP BY scope) v USING (scope)""")
                continue
            fdv = (f"(SELECT count(*) FROM (SELECT 1 FROM {table} "
                   f"WHERE {notnull} GROUP BY {', '.join(det)} "
                   f"HAVING count(DISTINCT {dep}) > 1))")
            selects.append(f"""
SELECT '' AS scope, '{rid}' AS rule_id,
       CAST((SELECT count(*) FROM {table}) AS BIGINT) AS n_rows,
       CAST({fdv} AS BIGINT) AS n_violations,
       CAST(CASE WHEN {fdv} = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS passed""")
        elif r.kind == "monotonic":
            key = r.params["key"]
            kcols = [key] if isinstance(key, str) else list(key)
            ob = list(r.params["order_by"])
            c = r.column
            filt = " AND ".join(
                [f"{x} IS NOT NULL" for x in
                 sorted(set(kcols) | set(ob) | {c})]
                + [f"isfinite({c})"])
            mono = (f"(SELECT count(*) FROM (SELECT {c} AS v, "
                    f"max({c}) OVER (PARTITION BY {', '.join(kcols)} "
                    f"ORDER BY {', '.join(ob)} ROWS BETWEEN UNBOUNDED "
                    f"PRECEDING AND 1 PRECEDING) AS pm FROM {table} "
                    f"WHERE {filt}) WHERE v < pm)")
            selects.append(f"""
SELECT '' AS scope, '{rid}' AS rule_id,
       CAST((SELECT count(*) FROM {table}) AS BIGINT) AS n_rows,
       CAST({mono} AS BIGINT) AS n_violations,
       CAST(CASE WHEN {mono} = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS passed""")
        else:  # foreign_key
            ptab, pkey = (fk_tables or {})[rid]
            dangling = (f"(SELECT count(*) FROM {table} ch WHERE "
                        f"ch.{r.column} IS NOT NULL AND NOT EXISTS "
                        f"(SELECT 1 FROM {ptab} p WHERE p.{pkey} = "
                        f"ch.{r.column}))")
            selects.append(f"""
SELECT '' AS scope, '{rid}' AS rule_id,
       CAST((SELECT count(*) FROM {table}) AS BIGINT) AS n_rows,
       CAST({dangling} AS BIGINT) AS n_violations,
       CAST(CASE WHEN {dangling} = 0 THEN 1 ELSE 0 END AS BIGINT)
           AS passed""")
    union = "\nUNION ALL\n".join(selects)
    return f"SELECT * FROM (\n{union}\n) ORDER BY scope, rule_id"


def rules_from_spec(spec: list[dict], read_parquet=None) -> list[Rule]:
    """Build a rule set from a JSON-friendly spec (the CLI contract).

    Each entry: ``{"kind": ..., "column": ...}`` plus the kind's
    params (``values`` / ``lo`` / ``hi`` / ``pattern``); ``unique``
    accepts a list column for composite keys; ``foreign_key`` takes
    ``parent`` as a parquet path/dir loaded via ``read_parquet``
    (pruned to the parent key column) and ``parent_key``."""
    out = []
    for e in spec:
        kind = e["kind"]
        col = e.get("column")  # row_count legitimately has none
        if col is None and kind != "row_count":
            # fail the typo'd spec at parse time, not with an opaque
            # pyarrow error deep inside a Ray task
            raise ValueError(
                f"rule spec entry {e!r}: 'column' is required for "
                f"kind {kind!r}")
        if kind in ("unique", "functional_dependency") \
                and isinstance(col, list):
            col = tuple(col)
        if kind == "in_set":
            params = {"values": e["values"]}
        elif kind == "quantile":
            params = {"q": e["q"], "lo": e.get("lo"),
                      "hi": e.get("hi"),
                      "finite_only": e.get("finite_only", True)}
        elif kind == "range" or kind in _AGGREGATE:
            params = {"lo": e.get("lo"), "hi": e.get("hi")}
        elif kind == "regex":
            params = {"pattern": e["pattern"]}
        elif kind == "functional_dependency":
            params = {"determines": e["determines"]}
        elif kind == "monotonic":
            params = {"key": e["key"], "order_by": e["order_by"]}
        elif kind == "compare_cols":
            params = {"right": e["right"], "op": e.get("op", "=="),
                      "left_fn": e.get("left_fn"),
                      "right_fn": e.get("right_fn")}
        elif kind == "foreign_key":
            if read_parquet is None:
                raise ValueError("foreign_key spec needs a reader")
            params = {"parent": read_parquet(e["parent"],
                                             columns=[e["parent_key"]]),
                      "parent_key": e["parent_key"]}
        else:
            params = {}
        out.append(Rule(kind, col, params))
    return out


def columns_needed(rules: list[Rule],
                   partition_col: str | None) -> list[str]:
    """The projection a rule set actually reads — pass to
    ``read_parquet(columns=...)`` so unchecked (wide) columns never
    leave storage."""
    need = set() if partition_col is None else {partition_col}
    for r in rules:
        need |= r.input_columns
    return sorted(need)

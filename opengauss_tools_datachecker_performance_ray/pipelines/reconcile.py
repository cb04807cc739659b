"""Aggregate reconciliation — the "quick verify" mode.

The reference datachecker's full mode extracts and hash-compares every
row; its operational complement (and the first thing a DBA runs) is an
aggregate reconciliation: per-column count / null-count / sum / min /
max computed on BOTH sides and diffed. It costs one streaming scan per
side, moves one partial row per block (never data), and localises a
mismatch to a column before the expensive digest compare runs — at
10^12 rows this is the triage step that decides whether the full
Merkle compare is needed at all. (Reference analog: the row-count +
structure preconditions in
``check/service/CheckTableStructureService.java`` and the
``TableMetadataHash`` quick path, generalised to per-column content
aggregates.)

Exactness contract (what makes this oracle-checkable):

- counts / null-counts: exact integers.
- sums: INTEGER columns only. Per-batch sums are Arrow ``pc.sum``
  (int64); the driver folds Python ints, so the fold is
  arbitrary-precision — the documented assumption is only that each
  single block's sum fits int64 (true for any realistic block: 10^7
  rows x 10^11 magnitude). Float sums are deliberately NOT
  reconciled: IEEE addition is non-associative, so a distributed sum
  cannot promise bit-equality with any serial oracle — and the digest
  compare already covers float equality row-by-row.
- min / max: exact for every type (no arithmetic) — integers and
  floats via ``pc.min_max``, timestamps reported as epoch
  microseconds, strings in Arrow's codepoint order (= UTF-8 byte
  order = DuckDB's default binary collation).

Scale shape: one ``map_batches`` partial per side emitting ONE row per
block; the driver folds the partials (O(blocks) tiny rows, no
shuffle). Output is a long verdict table — one row per (column,
metric) with both sides' values and an ``is_match`` flag — the same
per-check verdict shape the rest of the engine emits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

def _side_partials(ds) -> list[dict]:
    """One streaming pass: a single partial row per block.

    Column names/types come from each BATCH's own schema (not
    ``ds.schema()``, which on a derived dataset would trigger an extra
    partial execution just to infer metadata)."""
    def partial(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {"n_rows": [batch.num_rows]}
        for name, typ in zip(batch.schema.names, batch.schema.types):
            col = batch.column(name)
            out[f"{name}__nulls"] = [col.null_count]
            if pa.types.is_null(typ):
                continue  # all-null column: nulls row is the whole story
            if pa.types.is_dictionary(typ):
                # no min_max/sum kernels on dictionary arrays; decode
                # to the value space (per-batch cost, exact result)
                typ = typ.value_type
                col = col.cast(typ)
            mm = pc.min_max(col)
            mn, mx = mm["min"], mm["max"]
            if pa.types.is_integer(typ):
                s = pc.sum(col)
                out[f"{name}__sum"] = [s.as_py()]
                out[f"{name}__min"] = [mn.as_py()]
                out[f"{name}__max"] = [mx.as_py()]
            elif pa.types.is_floating(typ):
                out[f"{name}__min"] = [mn.as_py()]
                out[f"{name}__max"] = [mx.as_py()]
            elif pa.types.is_timestamp(typ):
                # epoch microseconds: integer-exact and SQL-expressible
                # (DuckDB epoch_us)
                out[f"{name}__min"] = [
                    None if not mn.is_valid else mn.cast(
                        pa.timestamp("us")).value]
                out[f"{name}__max"] = [
                    None if not mx.is_valid else mx.cast(
                        pa.timestamp("us")).value]
            elif (pa.types.is_string(typ) or pa.types.is_large_string(typ)):
                out[f"{name}__min"] = [mn.as_py()]
                out[f"{name}__max"] = [mx.as_py()]
            # other types (binary, nested): count/nulls only — their
            # content equality belongs to the digest compare
        return pa.table(out)

    return ds.map_batches(partial, batch_format="pyarrow").take_all()


def _fold(partials: list[dict]) -> dict:
    """Arbitrary-precision driver fold of the per-block partials.

    A key that appears with only None partials (all-null column) folds
    to None — rendered ``<null>``, matching SQL's NULL aggregate over
    an all-null column — which is distinct from a column absent on one
    side (``<absent>``)."""
    acc: dict = {}
    for row in partials:
        for k, v in row.items():
            if k == "n_rows" or k.endswith("__nulls"):
                acc[k] = acc.get(k, 0) + int(v)
            elif k not in acc:
                acc[k] = v
            elif v is not None:
                if acc[k] is None:
                    acc[k] = v
                elif k.endswith("__sum"):
                    acc[k] = acc[k] + int(v)
                elif k.endswith("__min"):
                    acc[k] = min(acc[k], v)
                else:
                    acc[k] = max(acc[k], v)
    return acc


def _render(v) -> str:
    """Exact text form: str(int) == SQL CAST AS VARCHAR; repr(float)
    is the shortest round-trip, which DuckDB's float-to-VARCHAR also
    emits (verified incl. exponent forms), so float min/max are
    oracle-checkable as text too."""
    if v is None:
        return "<null>"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return str(v)


def reconcile_aggregates(src, snk) -> pd.DataFrame:
    """Per-column aggregate reconciliation between two Datasets.

    Returns the long verdict table (col, metric, src_val, snk_val,
    is_match), sorted by (col, metric). Metrics per Arrow type:

    ========== ==========================================
    any        ``nulls``
    integer    ``sum`` ``min`` ``max``
    float      ``min`` ``max`` (no sum — see module doc)
    timestamp  ``min`` ``max`` (epoch microseconds)
    string     ``min`` ``max`` (binary-collation order)
    ========== ==========================================

    plus one table-level ``('_table', 'n_rows')`` row. Columns present
    on only one side reconcile as ``<absent>`` (a hard mismatch) —
    the schema-drift signal a quick check must surface.
    """
    a = _fold(_side_partials(src))
    b = _fold(_side_partials(snk))
    keys = sorted(set(a) | set(b))
    rows = []

    def emit(col: str, metric: str, k: str):
        va = _render(a[k]) if k in a else "<absent>"
        vb = _render(b[k]) if k in b else "<absent>"
        rows.append((col, metric, va, vb, va == vb))

    emit("_table", "n_rows", "n_rows")
    for k in keys:
        if k == "n_rows":
            continue
        col, metric = k.rsplit("__", 1)
        emit(col, metric, k)
    df = pd.DataFrame(rows, columns=["col", "metric", "src_val",
                                     "snk_val", "is_match"])
    return df.sort_values(["col", "metric"]).reset_index(drop=True)


def daily_volume_profile(ds, ts_col: str) -> pd.DataFrame:
    """Row-volume-by-day anomaly profile (completeness/timeliness
    check): per-day row counts with an integer-exact anomaly flag —
    a day is anomalous when its count is under half or over double
    the all-days mean. The flag is evaluated in pure integer
    arithmetic (``2*n*d < t`` / ``n*d > 2*t`` with t=total rows,
    d=day count), so it is bit-reproducible in SQL — no float mean,
    no variance estimator whose summation order could differ.

    Scale shape: per-batch value_counts partial (one row per distinct
    day per block — days are ~10^3-10^4 even at 10^12 rows), one tiny
    groupby shuffle over the partials, flags computed on the collected
    per-day table. Detects the feed-gap / double-load days a volume
    monitor exists for.
    """
    def partial(batch: pa.Table) -> pa.Table:
        days = pc.strftime(batch.column(ts_col), format="%Y-%m-%d")
        vc = pc.value_counts(days)
        return pa.table({
            "day": vc.field("values"),
            "n": vc.field("counts"),
        })

    per_day = (ds.map_batches(partial, batch_format="pyarrow")
                 .groupby("day").sum("n").to_pandas())
    per_day = per_day.rename(columns={"sum(n)": "n_rows"})
    t = int(per_day["n_rows"].sum())
    d = len(per_day)
    n = per_day["n_rows"].astype("int64")
    per_day["anomaly"] = ((2 * n * d < t) | (n * d > 2 * t))
    return (per_day.sort_values("day").reset_index(drop=True)
            [["day", "n_rows", "anomaly"]])


def reconcile_aggregates_by_group(src, snk, group_col: str,
                                  column: str) -> pd.DataFrame:
    """Per-group aggregate reconciliation — the quick-verify mode at
    partition granularity (the north rule's per-partition verdict
    applied to the triage step): per group, row count / null count /
    sum / min / max of one INTEGER column, both sides, diffed. A
    mismatch localizes damage to a (partition, metric) pair before any
    digest compare runs.

    Scale shape: per-batch ``pyarrow`` group_by partials (one row per
    distinct group per block), then ONE Ray groupby over the partials
    — at 10^12 rows x 10^4 partitions the shuffle moves partial rows
    only. Values travel as exact integers end-to-end (``take_all`` on
    the tiny per-group table, never a pandas float coercion), so the
    text rendering matches SQL. Groups keep SQL semantics: a NULL
    group key reconciles as ``'<null>'`` (house convention); a group
    present on only one side reports ``'<absent>'`` on the other.

    Float columns are rejected loudly for sums (same rationale as
    :func:`reconcile_aggregates` — IEEE addition is non-associative).
    """
    def side(ds) -> dict:
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.column(group_col)
            if pa.types.is_dictionary(g.type):
                g = g.cast(g.type.value_type)
            g = pc.fill_null(pc.cast(g, pa.string()), "<null>")
            c = batch.column(column)
            if pa.types.is_dictionary(c.type):
                c = c.cast(c.type.value_type)
            if not pa.types.is_integer(c.type):
                raise TypeError(
                    f"reconcile_aggregates_by_group needs an integer "
                    f"column, got {column!r}: {c.type} (float sums "
                    f"are not distributable exactly)")
            t = pa.table({"g": g, "c": c})
            r = t.group_by("g").aggregate(
                [("c", "sum"), ("c", "min"), ("c", "max"),
                 ("c", "count"), ([], "count_all")])
            return pa.table({
                "g": r.column("g"),
                "n": r.column("count_all"),
                "nulls": pc.subtract(r.column("count_all"),
                                     r.column("c_count")),
                "sum": r.column("c_sum"),
                "min": r.column("c_min"),
                "max": r.column("c_max"),
            })

        from ray.data.aggregate import Max, Min, Sum

        rows = (ds.map_batches(partial, batch_format="pyarrow")
                  .groupby("g")
                  .aggregate(Sum("n"), Sum("nulls"), Sum("sum"),
                             Min("min"), Max("max"))
                  .take_all())  # one row per group — tiny by contract
        return {r["g"]: r for r in rows}

    a, b = side(src), side(snk)
    metrics = [("n_rows", "sum(n)"), ("nulls", "sum(nulls)"),
               ("sum", "sum(sum)"), ("min", "min(min)"),
               ("max", "max(max)")]
    out = []
    for g in sorted(set(a) | set(b)):
        for mname, mcol in metrics:
            va = _render(a[g].get(mcol)) if g in a else "<absent>"
            vb = _render(b[g].get(mcol)) if g in b else "<absent>"
            out.append((g, mname, va, vb, va == vb))
    return pd.DataFrame(out, columns=["grp", "metric", "src_val",
                                      "snk_val", "is_match"])

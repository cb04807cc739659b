"""Run reports: summary / success / failed / progress JSON logs and
repair statements.

Mirrors the reference's report writer shapes
(``check/modules/report/SliceCheckResultManager.java:76-232`` writes
``summary.log`` / ``success.log`` / ``failed.log`` / ``progress.log``
as appended pretty-JSON records; repair SQL emission at ``:370-456``
via the ``extract/dml/*DmlBuilder`` family, behind the
``create-repair-sql`` flag).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import pandas as pd


class ReportWriter:
    """Appends record-shaped JSON lines under ``out_dir``."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        self.t0 = time.time()
        self._rows = 0

    def _append(self, fname: str, record: dict[str, Any]) -> None:
        with open(os.path.join(self.out_dir, fname), "a") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def table_result(self, summary: dict[str, Any]) -> None:
        target = "success.log" if summary.get("result") == "success" else "failed.log"
        self._append(target, summary)

    def structure_failed(self, verdict: dict[str, Any]) -> None:
        self._append("failed.log", verdict)

    def progress(self, rows_done: int, tables_done: int, total_tables: int) -> None:
        """Progress record with avgSpeed rows/s
        (``SliceProgressService.java:84-124``)."""
        self._rows += rows_done
        elapsed = max(time.time() - self.t0, 1e-9)
        self._append("progress.log", {
            "tableCount": total_tables, "completeCount": tables_done,
            "rowCount": self._rows,
            "avgSpeed": round(self._rows / elapsed, 1),
            "cost": round(elapsed, 3),
        })

    def slice_progress(self, table: str, rows_seen: int,
                       slices_done: int) -> None:
        """Intra-table progress, appended as each digest slice's
        signature partial lands (the reference updates progress.log per
        completed slice, ``SliceProgressService.java:84-124`` — without
        this a multi-hour table shows nothing until the end)."""
        elapsed = max(time.time() - self.t0, 1e-9)
        self._append("progress.log", {
            "table": table, "sliceCount": slices_done,
            "rowCount": int(rows_seen),
            "avgSpeed": round(rows_seen / elapsed, 1),
            "cost": round(elapsed, 3),
        })

    def csv_failed_details(self, table: str,
                           located: pd.DataFrame) -> None:
        """CSV-mode per-violation detail records: one JSON object per
        shard file with any violations, carrying the (key, idx) row
        locators per diff kind — the reference's ``failed_detail.log``
        (``CheckCsvFailed``/``CsvFileFailed`` shapes,
        ``common/entry/report/CheckCsvFailed.java:34-66``, written by
        ``check/modules/report/SliceCheckResultManager.java:187-206``
        with a trailing comma per record, reproduced for parity).
        ``located`` columns: key, fileName, idx, kind."""
        if not len(located):
            return
        path = os.path.join(self.out_dir, "failed_detail.log")
        with open(path, "a") as f:
            for fname, g in located.groupby("fileName", sort=True):
                diffs = {k: [] for k in ("keyInsert", "keyUpdate",
                                         "keyDelete")}
                for r in g.sort_values(["idx", "key"]).itertuples():
                    bucket = {"insert": "keyInsert", "update": "keyUpdate",
                              "delete": "keyDelete"}.get(str(r.kind))
                    if bucket is not None:
                        diffs[bucket].append({"key": str(r.key),
                                              "idx": int(r.idx)})
                size = sum(len(v) for v in diffs.values())
                if not size:
                    continue
                rec = {"table": table,
                       "fileFailed": {"fileName": str(fname), "size": size,
                                      **diffs}}
                f.write(json.dumps(rec, default=str) + ",\n")

    def summary(self, results: list[dict[str, Any]]) -> dict[str, Any]:
        ok = [r for r in results if r.get("result") == "success"]
        rec = {
            "mode": "FULL",
            "tableCount": len(results),
            "successCount": len(ok),
            "failedCount": len(results) - len(ok),
            "rowCount": int(sum(r.get("rowCount", 0) for r in results)),
            "cost": round(time.time() - self.t0, 3),
        }
        self._append("summary.log", rec)
        return rec


def render_repair_sql(table: str, key_column: str,
                      violations: pd.DataFrame,
                      sink_rows: pd.DataFrame | None = None) -> list[str]:
    """Repair statements from classified violations.

    insert -> INSERT (row exists only at source, must be added to sink),
    update -> REPLACE, delete -> DELETE — the reference's mapping in
    ``SliceCheckResultManager.java:370-456`` + ``extract/dml/*``.
    Without the source rows at hand we emit keyed statements; callers
    with a row lookup can join ``sink_rows`` for full VALUES clauses.
    """
    out = []
    for r in violations.itertuples():
        key = str(r.key).replace("'", "''")
        if r.kind == "insert":
            out.append(f"-- INSERT INTO {table} ... WHERE {key_column} = '{key}';")
        elif r.kind == "update":
            out.append(f"-- REPLACE INTO {table} ... WHERE {key_column} = '{key}';")
        elif r.kind == "delete":
            out.append(f"DELETE FROM {table} WHERE {key_column} = '{key}';")
    return out


def _sql_literal(v) -> str:
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, bytes):
        return "X'" + v.hex().upper() + "'"
    return "'" + str(v).replace("'", "''") + "'"


# Composite-PK splice (Constants.PRIMARY_DELIMITER "_#_").
_KEY_SEP = "_#_"


def _key_of_row(row, key_columns: list[str]) -> str:
    return _KEY_SEP.join(str(row[c]) for c in key_columns)


def _key_condition(key: str, key_columns: list[str]) -> str:
    """``pk = v`` / ``pk1 = v1 and pk2 = v2`` from a spliced key value
    (UpdateDmlBuilder.buildConditionCompositePrimary semantics — every
    PK column joins with AND; values always quoted, which every SQL
    engine accepts for digit keys too)."""
    parts = key.split(_KEY_SEP)
    if len(parts) != len(key_columns):  # un-spliceable: treat as one
        parts = [key]
    return " and ".join(f"{c} = {_sql_literal(v)}"
                        for c, v in zip(key_columns, parts))


def render_update_sql(table: str, key_columns: list[str], row,
                      columns: list[str]) -> str:
    """Column-wise UPDATE for one violated key (UpdateDmlBuilder
    analog: ``update #table set #columns where #condition;``,
    ``extract/dml/DmlBuilder.java:229`` /
    ``UpdateDmlBuilder.java:99-121``) — non-key columns in the SET
    list, every PK column in the AND condition."""
    sets = ", ".join(f"{c} = {_sql_literal(row[c])}"
                     for c in columns if c not in key_columns)
    cond = " and ".join(f"{c} = {_sql_literal(row[c])}"
                        for c in key_columns)
    return f"UPDATE {table} SET {sets} WHERE {cond};"


def render_batch_delete_sql(table: str, key_columns: list[str],
                            keys: list[str],
                            batch_size: int = 1000) -> list[str]:
    """Batched DELETE (BatchDeleteDmlBuilder analog:
    ``delete from #table where pk in ( ... );``,
    ``extract/dml/BatchDeleteDmlBuilder.java:80-86``). Single-column
    PKs batch ``batch_size`` keys per IN list; composite PKs fall back
    to per-key AND-condition deletes (the reference routes composites
    through the condition builder the same way)."""
    keys = sorted(map(str, keys))
    if len(key_columns) == 1:
        out = []
        for i in range(0, len(keys), batch_size):
            chunk = ", ".join(_sql_literal(k)
                              for k in keys[i:i + batch_size])
            out.append(f"DELETE FROM {table} WHERE {key_columns[0]} "
                       f"IN ({chunk});")
        return out
    return [f"DELETE FROM {table} WHERE {_key_condition(k, key_columns)};"
            for k in keys]


def render_repair_sql_with_rows(table: str, key_column,
                                violations: pd.DataFrame,
                                source_rows: pd.DataFrame,
                                update_style: str = "replace",
                                batch_delete: bool = False) -> list[str]:
    """Full-row repair statements (DML builder analog,
    ``extract/dml/{Insert,Replace,Update,BatchDelete}DmlBuilder.java``):
    the source rows for violated keys are re-fetched (J5 secondary
    lookup, ``DataExtractServiceImpl.java:608-621``) and rendered as
    INSERT (missing at sink) VALUES lists; update-kind renders REPLACE
    VALUES (``update_style='replace'``) or column-wise UPDATE ... SET
    (``update_style='update'``); delete-kind renders per-key DELETE or
    batched ``DELETE ... WHERE pk IN (...)`` (``batch_delete=True``).
    ``key_column`` is one column name or a list (composite PKs splice
    with ``_#_`` in the violation keys)."""
    key_columns = ([key_column] if isinstance(key_column, str)
                   else list(key_column))
    rows_by_key = {_key_of_row(r, key_columns): r
                   for _, r in source_rows.iterrows()}
    cols = list(source_rows.columns)
    collist = ", ".join(cols)
    out = []
    delete_keys = []
    for r in violations.sort_values("key").itertuples():
        key = str(r.key)
        if r.kind == "delete":
            if batch_delete:
                delete_keys.append(key)
            else:
                out.append(f"DELETE FROM {table} WHERE "
                           f"{_key_condition(key, key_columns)};")
            continue
        row = rows_by_key.get(key)
        if row is None:
            out.append(f"-- missing source row for key {key}")
            continue
        if r.kind == "update" and update_style == "update":
            out.append(render_update_sql(table, key_columns, row, cols))
            continue
        values = ", ".join(_sql_literal(row[c]) for c in cols)
        verb = "INSERT INTO" if r.kind == "insert" else "REPLACE INTO"
        out.append(f"{verb} {table} ({collist}) VALUES ({values});")
    if delete_keys:
        out.extend(render_batch_delete_sql(table, key_columns, delete_keys))
    return out


def write_repair_file(out_dir: str, table: str, statements: list[str]) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"repair_{table}.sql")
    with open(path, "w") as f:
        f.write("\n".join(statements) + ("\n" if statements else ""))
    return path

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


def render_repair_sql_with_rows(table: str, key_column: str,
                                violations: pd.DataFrame,
                                source_rows: pd.DataFrame) -> list[str]:
    """Full-row repair statements (DML builder analog,
    ``extract/dml/{Insert,Replace,Delete}DmlBuilder.java``): the
    source rows for violated keys are re-fetched (J5 secondary lookup,
    ``DataExtractServiceImpl.java:608-621``) and rendered as
    INSERT (missing at sink) / REPLACE (value mismatch) VALUES lists;
    delete-kind violations render DELETE by key."""
    rows_by_key = {str(r[key_column]): r
                   for _, r in source_rows.iterrows()}
    cols = list(source_rows.columns)
    collist = ", ".join(cols)
    out = []
    for r in violations.sort_values("key").itertuples():
        key = str(r.key)
        if r.kind == "delete":
            out.append(f"DELETE FROM {table} WHERE {key_column} = "
                       f"{_sql_literal(key)};")
            continue
        row = rows_by_key.get(key)
        if row is None:
            out.append(f"-- missing source row for key {key}")
            continue
        values = ", ".join(_sql_literal(row[c]) for c in cols)
        verb = "INSERT INTO" if r.kind == "insert" else "REPLACE INTO"
        out.append(f"{verb} {table} ({collist}) VALUES ({values});")
    return out


def write_repair_file(out_dir: str, table: str, statements: list[str]) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"repair_{table}.sql")
    with open(path, "w") as f:
        f.write("\n".join(statements) + ("\n" if statements else ""))
    return path

"""Debezium CDC change-event ingestion (incremental mode front-end).

Re-expresses the reference's Debezium consumer path
(``extract/debezium/DebeziumStringHandler.java:51-64``,
``DebeziumAvroHandler.java``, ``DebeziumDataLogs.java:84-106``,
``DataConsolidationServiceImpl.java:118-160``) as a Ray Data batch
transform: a Dataset of raw change-event JSON lines (any transport —
files, Kafka dump, queue drain) parses into per-event
``(table, key, op, offset, ts_ms)`` rows, which consolidate into
``SourceDataLog``-shaped per-table changed-key batches that feed
``pipelines.incremental.ChangeLogWindow`` / ``incremental_check``.

Parsing matches the reference's field semantics:

- the record value is used ``after if after is not None else before``
  (StringHandler: a delete carries only ``before``);
- a plain-JSON envelope may nest under ``payload`` (schema+payload
  format) — both shapes accepted;
- Avro-JSON union wrappers (``{"string": v}``, ``{"long": v}``, and
  the named-record ``{"db.table.Value": {...}}``) are unwrapped the
  way the Avro handler's generic-record traversal does;
- composite PK values splice with ``_#_``
  (``ExtConstants.PRIMARY_DELIMITER``), skipping absent columns like
  ``DebeziumDataLogs.addDebeziumDataKey``;
- per-table ``beginOffset`` is the MINIMUM event offset seen
  (``DebeziumDataLogs.java:96-101``);
- MySQL DATE columns arrive as compressed epoch-day integers and are
  decompressed to ``yyyy-MM-dd``
  (``DataConsolidationServiceImpl.mysqlDateConvert/decompressLocalDate``).

JSON parsing is per-record by necessity (arbitrary nested envelopes);
the per-batch loop only touches the CDC stream — never table data —
and CDC volume is bounded by the increment window, not table size.
"""

from __future__ import annotations

import datetime
import json
from typing import Any

import pandas as pd
import pyarrow as pa

# Composite-PK splice (common/constant/Constants.java:29).
PRIMARY_DELIMITER = "_#_"

_AVRO_UNION_KEYS = frozenset(
    {"string", "int", "long", "float", "double", "boolean", "bytes"})


def _unwrap_record(v: Any) -> tuple[Any, bool]:
    """Unwrap the Avro named-record envelope form
    ``{"db.table.Value": {...}}`` (single dotted key, dict value) and
    report whether it was present — the presence of this form is the
    per-event Avro-JSON sniff. A plain-JSON row whose single column is
    literally named ``a.b`` has a scalar value, not a dict, so it is
    NOT unwrapped (advisor finding, round 2: the old any-dotted-key
    rule mangled such rows and dropped one-column tables whose column
    was named after an Avro primitive)."""
    if isinstance(v, dict) and len(v) == 1:
        k = next(iter(v))
        if "." in k and isinstance(v[k], dict):
            return v[k], True
    return v, False


def _unwrap_union(v: Any) -> Any:
    """Unwrap Avro-JSON union wrappers (``{"string": x}``,
    ``{"long": x}``, confluent named defaults). Applied ONLY when the
    event is known to be Avro-JSON — opt-in via ``parse_event(avro=)``
    or sniffed from the named-record envelope."""
    while isinstance(v, dict) and len(v) == 1:
        k = next(iter(v))
        if k in _AVRO_UNION_KEYS or "." in k:
            v = v[k]
        else:
            break
    return v


def decompress_local_date(compress_date: int) -> str:
    """Epoch-day int -> 'yyyy-MM-dd' (mysql DATE transport form,
    ``DataConsolidationServiceImpl.decompressLocalDate``)."""
    return (datetime.date(1970, 1, 1)
            + datetime.timedelta(days=int(compress_date))).isoformat()


def parse_event(line: str, avro: bool | None = None) -> dict | None:
    """One raw change-event JSON -> {table, op, ts_ms, data} or None
    for tombstones / unparseable records (logged upstream).

    ``avro`` selects the Avro-JSON union-unwrapping dialect
    (``DebeziumAvroHandler`` vs ``DebeziumStringHandler``): ``None``
    sniffs per event from the named-record ``{"db.table.Value": {...}}``
    envelope, ``True``/``False`` pin it for transports whose dialect is
    known. Plain-JSON events never have field values union-unwrapped,
    so a column named ``string``/``long``/``a.b`` survives intact."""
    try:
        rec = json.loads(line)
    except (json.JSONDecodeError, TypeError):
        return None
    if not isinstance(rec, dict):
        return None
    payload = rec.get("payload", rec)  # schema+payload envelope or flat
    if not isinstance(payload, dict):
        return None
    before, b_avro = _unwrap_record(payload.get("before"))
    after, a_avro = _unwrap_record(payload.get("after"))
    is_avro = avro if avro is not None else (a_avro or b_avro)
    data = after if after is not None else before
    if not isinstance(data, dict):
        return None
    source = payload.get("source")
    if is_avro:
        source = _unwrap_union(source)
    table = None
    if isinstance(source, dict):
        table = source.get("table")
        if is_avro:
            table = _unwrap_union(table)
    op = payload.get("op")
    ts = _unwrap_union(payload.get("ts_ms")) if is_avro \
        else payload.get("ts_ms")
    if is_avro:
        data = {k: _unwrap_union(v) for k, v in data.items()}
    try:
        ts = int(ts) if ts is not None else None
    except (TypeError, ValueError):  # non-integer transport timestamp
        ts = None
    if is_avro and isinstance(before, dict):
        before = {k: _unwrap_union(v) for k, v in before.items()}
    return {"table": str(table) if table is not None else "",
            "op": str(op) if op is not None else "",
            "ts_ms": ts,
            "data": data,
            "before": before if isinstance(before, dict) else None}


def make_event_parser(key_columns: dict[str, list[str]],
                      date_columns: dict[str, list[str]] | None = None,
                      line_col: str = "text",
                      offset_col: str | None = None,
                      avro: bool | None = None,
                      value_columns: list[str] | None = None,
                      before_columns: list[str] | None = None):
    """map_batches fn: raw-JSON-line batch -> (table, key, op, offset,
    ts_ms) rows. ``key_columns`` maps table -> PK column list (the
    catalog's primaryMetas analog); events for unknown tables pass
    through with table kept and an empty key so the caller can route
    them to a table-miss verdict instead of silently dropping. Pass
    ``offset_col`` when the transport carries real offsets; the
    fallback numbers events batch-locally, which is globally monotone
    ONLY for single-block inputs (``read_change_log`` reads that way).

    ``value_columns`` additionally carries those payload fields
    through as stringified ``v_<name>`` columns (CDC transport form —
    the same ``str()`` rendering the key splice uses; absent fields
    and delete tombstones surface as null). This is what a downstream
    materializer (``pipelines.incremental.compact_changes``) consumes.

    ``before_columns`` carries the BEFORE image's fields as
    ``b_<name>`` columns the same way (null when the transport omits
    the before image — Debezium sends it for updates only with
    REPLICA IDENTITY FULL). The manifest updater
    (``stages.manifest.update_from_changes``) needs both images.
    """
    date_cols = {t: set(c) for t, c in (date_columns or {}).items()}
    vcols = list(value_columns or [])
    bcols = list(before_columns or [])

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch.column(line_col).to_pylist()
        offsets = (batch.column(offset_col).to_pylist()
                   if offset_col and offset_col in batch.column_names
                   else range(len(lines)))
        out = {"table": [], "key": [], "op": [], "offset": [], "ts_ms": []}
        vals_out: dict[str, list] = {c: [] for c in vcols}
        before_out: dict[str, list] = {c: [] for c in bcols}
        before_present: list[bool] = []
        for off, line in zip(offsets, lines):
            ev = parse_event(line, avro=avro)
            if ev is None:
                continue
            table = ev["table"]
            data = ev["data"]
            for c in date_cols.get(table, ()):  # mysqlDateConvert
                if data.get(c) is not None:
                    data[c] = decompress_local_date(int(data[c]))
            pks = key_columns.get(table, [])
            vals = [str(data[c]) for c in pks if c in data]
            out["table"].append(table)
            out["key"].append(PRIMARY_DELIMITER.join(vals))
            out["op"].append(ev["op"])
            out["offset"].append(int(off) if off is not None else -1)
            out["ts_ms"].append(ev["ts_ms"])
            for c in vcols:
                v = data.get(c)
                vals_out[c].append(None if v is None else str(v))
            bimg = ev.get("before")
            if bcols:
                before_present.append(bimg is not None)
            for c in bcols:
                v = None if bimg is None else bimg.get(c)
                before_out[c].append(None if v is None else str(v))
        cols = {
            "table": pa.array(out["table"], pa.large_string()),
            "key": pa.array(out["key"], pa.large_string()),
            "op": pa.array(out["op"], pa.large_string()),
            "offset": pa.array(out["offset"], pa.int64()),
            "ts_ms": pa.array(out["ts_ms"], pa.int64()),
        }
        for c in vcols:
            cols[f"v_{c}"] = pa.array(vals_out[c], pa.large_string())
        for c in bcols:
            cols[f"b_{c}"] = pa.array(before_out[c], pa.large_string())
        if bcols:
            # whether the transport carried a before image AT ALL —
            # a null b_<col> alone can't distinguish "column is NULL"
            # from "image missing" (the manifest updater's guard
            # needs the difference; review finding)
            cols["has_before"] = pa.array(before_present, pa.bool_())
        return pa.table(cols)

    return parse


def parse_change_events(ds, key_columns: dict[str, list[str]],
                        date_columns: dict[str, list[str]] | None = None,
                        line_col: str = "text",
                        offset_col: str | None = None,
                        avro: bool | None = None,
                        value_columns: list[str] | None = None):
    """Dataset of raw JSON lines -> Dataset of parsed change-key rows."""
    return ds.map_batches(
        make_event_parser(key_columns, date_columns, line_col, offset_col,
                          avro, value_columns),
        batch_format="pyarrow")


def source_data_logs(parsed: pd.DataFrame,
                     key_columns: dict[str, list[str]]) -> list[dict]:
    """Consolidate parsed events into SourceDataLog-shaped dicts
    (``common/entry/extract/SourceDataLog.java``): one per table with
    the DISTINCT spliced key values and the minimum begin offset."""
    logs = []
    for table, g in parsed.groupby("table", sort=True):
        keys = sorted(set(g["key"].astype(str)) - {""})
        logs.append({
            "tableName": str(table),
            "compositePrimarys": list(key_columns.get(str(table), [])),
            "compositePrimaryValues": keys,
            "beginOffset": int(g["offset"].min()) if len(g) else -1,
        })
    return logs


def read_change_log(path: str):
    """Read a change-log dump (one JSON event per line) as a Dataset —
    the file-transport stand-in for the reference's Kafka topic.

    Read as ONE block so the parser's batch-local fallback offsets are
    globally monotone (stream replay order and per-table beginOffset
    depend on it; with multiple blocks each would restart at 0). A CDC
    window dump is bounded by the increment window, so a single block
    is fine; transports that carry REAL offsets (Kafka) should instead
    put them in a column and pass ``offset_col`` to the parser."""
    import ray.data as rd

    return rd.read_text(path, override_num_blocks=1)


class ChangeLogTailer:
    """Live-stream transport stand-in: tails a DIRECTORY of change-log
    files (one JSON event per line, append-only — new files and
    appended lines both count) the way the reference's DebeziumWorker
    continuously polls its Kafka topic
    (``extract/debezium/DebeziumWorker.java:37-76``).

    Each ``poll()`` returns the newly arrived events parsed into
    changed-key rows with REAL globally-monotone offsets (a running
    counter in arrival order, fed through the parser's ``offset_col``
    path — never the batch-local fallback). Per-file byte positions
    track consumption; a partial trailing line (a writer caught
    mid-append) stays unconsumed until its newline arrives. Files are
    visited in sorted-name order, matching log-rotation conventions.
    """

    def __init__(self, dir_path: str, key_columns: dict[str, list[str]],
                 date_columns: dict[str, list[str]] | None = None,
                 pattern: str = "*", avro: bool | None = None):
        import glob as _glob

        self._glob = _glob
        self.dir_path = dir_path
        self.pattern = pattern
        self._positions: dict[str, int] = {}
        self._next_offset = 0
        self._parse = make_event_parser(key_columns, date_columns,
                                        offset_col="offset", avro=avro)

    @property
    def next_offset(self) -> int:
        """The offset the next arriving event will receive (resume
        bookmark, ``SourceDataLog.beginOffset`` analog)."""
        return self._next_offset

    def poll(self) -> pd.DataFrame:
        """Parse and return events appended since the last poll
        (possibly empty), columns (table, key, op, offset, ts_ms)."""
        import os as _os

        lines: list[str] = []
        offsets: list[int] = []
        paths = sorted(self._glob.glob(
            _os.path.join(self.dir_path, self.pattern)))
        for p in paths:
            if not _os.path.isfile(p):
                continue
            pos = self._positions.get(p, 0)
            try:
                size = _os.path.getsize(p)
            except OSError:
                continue
            if size <= pos:
                continue
            with open(p, "rb") as f:
                f.seek(pos)
                chunk = f.read()
            last_nl = chunk.rfind(b"\n")
            if last_nl < 0:
                continue  # no complete line yet
            self._positions[p] = pos + last_nl + 1
            for raw in chunk[:last_nl].split(b"\n"):
                s = raw.decode("utf-8", errors="replace").strip()
                if not s:
                    continue
                lines.append(s)
                offsets.append(self._next_offset)
                self._next_offset += 1
        if not lines:
            return pd.DataFrame(columns=["table", "key", "op", "offset",
                                         "ts_ms"])
        tbl = self._parse(pa.table({
            "text": pa.array(lines, pa.large_string()),
            "offset": pa.array(offsets, pa.int64())}))
        return tbl.to_pandas()

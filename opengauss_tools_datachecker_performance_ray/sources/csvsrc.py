"""CSV source mode (the reference's CSV verification, SURVEY.md §3.2).

The reference scans a directory of pre-sharded CSV files plus
schema-tables / schema-columns metadata files
(``extract/data/csv/CsvListener.java``, ``CsvSliceProcessor.java``)
and renames each shard after processing as a completion marker
(``SliceCheckResultManager.java:197-206``). Here: shards are the files
of a directory, read with ``ray.data.read_csv``; completion markers
are sidecar ``_DONE.<shard>`` files (never rename the input — inputs
stay immutable, reruns skip receipted shards).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.csv as pacsv


def csv_table_paths(dir_path: str) -> list[str]:
    return sorted(p for p in glob.glob(os.path.join(dir_path, "*.csv"))
                  if not os.path.basename(p).startswith("_"))


def load_csv_meta(dir_path: str) -> dict:
    """Optional schema sidecar (CsvTableMeta analog): a
    ``schema.json`` mapping column name -> arrow type string."""
    path = os.path.join(dir_path, "schema.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _arrow_schema(meta: dict) -> pa.Schema | None:
    if not meta:
        return None
    return pa.schema([(name, pa.type_for_alias(t))
                      for name, t in meta.items()])


def read_csv_table(dir_path: str, columns: list[str] | None = None):
    """Ray Dataset over a CSV shard directory, with optional typed
    schema from the sidecar."""
    import ray.data as rd

    meta = load_csv_meta(dir_path)
    schema = _arrow_schema(meta)
    kwargs = {}
    if schema is not None:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema})
    ds = rd.read_csv(csv_table_paths(dir_path), **kwargs)
    if columns:
        ds = ds.select_columns(columns)
    return ds


def pending_shards(dir_path: str) -> list[str]:
    """Shards without a completion marker (resume semantics)."""
    out = []
    for p in csv_table_paths(dir_path):
        marker = os.path.join(os.path.dirname(p),
                              f"_DONE.{os.path.basename(p)}")
        if not os.path.exists(marker):
            out.append(p)
    return out


def mark_shard_done(shard_path: str) -> str:
    marker = os.path.join(os.path.dirname(shard_path),
                          f"_DONE.{os.path.basename(shard_path)}")
    with open(marker, "w") as f:
        f.write("")
    return marker

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


def locate_keys_in_shards(dir_path: str, key_columns: list[str],
                          keys: list[str]):
    """Locate spliced PK values in a CSV shard directory: one
    ``(key, fileName, idx)`` row per occurrence, where ``idx`` is the
    1-based data-row number inside the shard — the row locator the
    reference carries through its CSV slice processor
    (``extract/slice/process/CsvSliceProcessor.java:96-101`` rowCount)
    and surfaces in ``failed_detail.log``
    (``check/modules/report/SliceCheckResultManager.java:187-206``).

    Runs as a Ray map over the shard list (one task per shard batch),
    scanning ONLY when a check failed and only for the capped
    violation key set — cost is one extra pass over the shards that
    actually need hand repair."""
    import pandas as pd
    import ray.data as rd

    paths = csv_table_paths(dir_path)
    cols = ["key", "fileName", "idx"]
    if not paths or not keys:
        return pd.DataFrame(columns=cols)
    meta = load_csv_meta(dir_path)
    schema = _arrow_schema(meta)
    convert = (pacsv.ConvertOptions(
        column_types={f.name: f.type for f in schema})
        if schema is not None else None)
    want = pa.array(sorted(set(map(str, keys))), pa.large_string())

    def scan(batch) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from ..functions.canonical import key_column

        out_k: list = []
        out_f: list = []
        out_i: list = []
        for p in batch["path"]:
            p = str(p)
            tbl = pacsv.read_csv(p, convert_options=convert) if convert \
                else pacsv.read_csv(p)
            k = key_column(tbl, list(key_columns))
            if isinstance(k, pa.ChunkedArray):
                k = k.combine_chunks()
            hit = pc.is_in(k, value_set=want)
            idxs = np.flatnonzero(hit.to_numpy(zero_copy_only=False))
            if len(idxs):
                out_k.extend(k.take(pa.array(idxs)).to_pylist())
                # keep the parent dir in the locator: in pair mode both
                # sides ship identically-named shards (src/shard0.csv
                # vs snk/shard0.csv) and the repair user needs to know
                # WHICH file the row index points into
                fname = os.path.join(
                    os.path.basename(os.path.dirname(p)),
                    os.path.basename(p))
                out_f.extend([fname] * len(idxs))
                out_i.extend((idxs + 1).tolist())  # 1-based rowCount
        return pa.table({"key": pa.array(out_k, pa.large_string()),
                         "fileName": pa.array(out_f, pa.large_string()),
                         "idx": pa.array(out_i, pa.int64())})

    located = rd.from_items([{"path": p} for p in paths]) \
        .map_batches(scan, batch_format="pandas").to_pandas()
    return located if len(located) else pd.DataFrame(columns=cols)


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

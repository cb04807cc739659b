"""Portable digest manifests — fingerprint a table ONCE, verify any
later copy against the manifest, no second live side needed.

The reference always compares two LIVE databases
(`check/slice/SliceCheckWorker.java` holds both sides' buckets in
memory); a manifest decouples the sides in time: write the
per-partition Merkle signatures of today's table to parquet (a few
hundred bytes per partition — ~100 MB for a 10^6-partition, 10^12-row
table), and any future run verifies a copy/migration/restore against
that file alone. Verification semantics are EXACTLY the live
compare's scalar pass (`compare.compare_signatures`: rows + root +
count-root per partition, dense leaves fetched only for dirty
partitions), so a manifest verdict equals the live pair verdict at
partition/bucket granularity — row-level classification needs the
other side's rows by definition and is out of scope here
(`pipelines/incremental.py` re-extracts for that).

Format: `signatures.parquet` (part, rows, root, croot, leaves,
counts — roots as the uint64 bit pattern stored in int64) plus
`manifest.json` (the DigestConfig alignment invariant + table name +
row total). The JSON carries everything needed to re-digest the live
side identically — key columns, partition/bucket geometry; a verify
with a drifted config fails loudly instead of comparing garbage.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .digest import DigestConfig, digest_dataset, make_digest_fn
from . import compare as cmp

MANIFEST_VERSION = 1


def _sig_frame_to_arrow(sigs: pd.DataFrame) -> pa.Table:
    return pa.table({
        "part": pa.array(sigs["part"].to_numpy(np.int64)),
        "rows": pa.array(sigs["rows"].to_numpy(np.int64)),
        "root": pa.array(sigs["root"].to_numpy(np.uint64)
                         .view(np.int64)),
        "croot": pa.array(sigs["croot"].to_numpy(np.uint64)
                          .view(np.int64)),
        "leaves": pa.array(list(sigs["leaves"]), pa.binary()),
        "counts": pa.array(list(sigs["counts"]), pa.binary()),
    })


def _write_meta(out_dir: str, cfg: DigestConfig, table: str,
                n_rows: int, columns: list[str] | None = None) -> dict:
    meta = {
        "version": MANIFEST_VERSION,
        "table": table,
        "n_rows": n_rows,
        "columns": columns,
        "key_columns": list(cfg.key_columns),
        "compare_columns": (list(cfg.compare_columns)
                            if cfg.compare_columns else None),
        "num_partitions": cfg.num_partitions,
        "buckets_per_partition": cfg.buckets_per_partition,
    }
    mtmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(meta, f)
    os.replace(mtmp, os.path.join(out_dir, "manifest.json"))
    return meta


def write_manifest(ds, cfg: DigestConfig, out_dir: str,
                   table: str = "table",
                   batch_size: int | None = None,
                   distributed: bool = False) -> dict:
    """Digest ``ds`` with ``cfg`` (ONE fused streaming scan — the
    flagship signature path) and persist the per-partition signature
    frame + config under ``out_dir``. Returns the summary dict.

    ``distributed=True`` is the 10^12-row route: the signature reduce
    runs as a Ray ``groupby(part)`` (one row per partition with its
    dense blobs) and streams straight to SHARDED parquet under
    ``out_dir/signatures/`` — the driver never holds a leaf blob
    (at 10^6 partitions x 32k buckets the blobs are ~256 GB; the
    driver route would materialize them all). ``n_rows`` is then
    folded from a pruned re-read of the written rows column."""
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    # a re-fingerprint must REPLACE any prior store: the single-file
    # layout shadows the shard dir in _sig_path, and Ray's
    # write_parquet APPENDS into an existing shard dir — either stale
    # remnant silently corrupts later verifies (review finding)
    stale_file = os.path.join(out_dir, "signatures.parquet")
    stale_dir = os.path.join(out_dir, "signatures")
    if distributed:
        import ray.data as rd

        if os.path.exists(stale_file):
            os.remove(stale_file)
        if os.path.isdir(stale_dir):
            shutil.rmtree(stale_dir)
        sig_ds = cmp.partition_signatures_distributed(
            digest_dataset(ds, cfg, batch_size), cfg)
        sig_dir = stale_dir
        os.makedirs(sig_dir, exist_ok=True)
        sig_ds.map_batches(
            lambda g: _sig_frame_to_arrow(g),
            batch_format="pandas").write_parquet(sig_dir)
        n_rows = int(rd.read_parquet(sig_dir, columns=["rows"])
                     .sum("rows") or 0)
        return _write_meta(out_dir, cfg, table, n_rows,
                           columns=list(ds.schema().names))
    if os.path.isdir(stale_dir):
        shutil.rmtree(stale_dir)
    sigs = cmp.partition_signatures(
        digest_dataset(ds, cfg, batch_size), cfg)
    n_rows = int(sigs["rows"].sum()) if len(sigs) else 0
    t = _sig_frame_to_arrow(sigs)
    tmp = os.path.join(out_dir, "signatures.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(out_dir, "signatures.parquet"))
    return _write_meta(out_dir, cfg, table, n_rows,
                       columns=list(ds.schema().names))


def _sig_path(out_dir: str) -> str:
    """Single-file (driver route) or sharded-directory (distributed
    route) signature store — both read through pyarrow transparently."""
    f = os.path.join(out_dir, "signatures.parquet")
    return f if os.path.exists(f) else os.path.join(out_dir,
                                                    "signatures")


def _frame_from_table(t: pa.Table) -> pd.DataFrame:
    return pd.DataFrame({
        "part": t.column("part").to_numpy(),
        "rows": t.column("rows").to_numpy(),
        "root": t.column("root").to_numpy().view(np.uint64),
        "croot": t.column("croot").to_numpy().view(np.uint64),
        "leaves": (t.column("leaves").to_pylist()
                   if "leaves" in t.column_names else None),
        "counts": (t.column("counts").to_pylist()
                   if "counts" in t.column_names else None),
    })


def read_manifest(out_dir: str, scalars_only: bool = False
                  ) -> tuple[pd.DataFrame, DigestConfig, dict]:
    """Load (signature frame, DigestConfig, meta) from a manifest
    directory; raises on version drift. ``scalars_only=True`` skips
    the leaf/count blobs (24 B per partition instead of the full
    bucket arrays — the verify path's first pass; blobs come back as
    None columns)."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        meta = json.load(f)
    if meta.get("version") != MANIFEST_VERSION:
        raise ValueError(f"manifest version {meta.get('version')} != "
                         f"{MANIFEST_VERSION}")
    cols = (["part", "rows", "root", "croot"] if scalars_only
            else None)
    t = pq.read_table(_sig_path(out_dir), columns=cols)
    sigs = _frame_from_table(t)
    if scalars_only:
        sigs["leaves"] = None
        sigs["counts"] = None
    cfg = DigestConfig(
        key_columns=tuple(meta["key_columns"]),
        compare_columns=(tuple(meta["compare_columns"])
                         if meta["compare_columns"] else None),
        num_partitions=meta["num_partitions"],
        buckets_per_partition=meta["buckets_per_partition"])
    return sigs, cfg, meta


def _scalar_dirty_parts(sigs_a: pd.DataFrame, sigs_b: pd.DataFrame,
                       cfg: DigestConfig) -> list[int]:
    """Partitions whose (rows, root, croot) scalars differ — the
    correct dirty test for scalars-only frames: PartitionDiff's
    diff_buckets is empty when BOTH sides carry None blobs
    (zeros-vs-zeros), so scalar dirtiness must be read off the
    scalar arrays themselves."""
    n, B = cfg.num_partitions, cfg.buckets_per_partition
    a_rows, a_root, a_croot, _ = cmp._sig_scalar_arrays(sigs_a, n, B)
    b_rows, b_root, b_croot, _ = cmp._sig_scalar_arrays(sigs_b, n, B)
    dirty = ((a_root != b_root) | (a_croot != b_croot)
             | (a_rows != b_rows))
    return [int(p) for p in np.nonzero(dirty)[0]]


def verify_against_manifest(ds, manifest_dir: str,
                            batch_size: int | None = None,
                            distributed: bool | None = None) -> dict:
    """Digest the LIVE dataset with the manifest's own config and run
    the scalar Merkle compare against the stored signatures. Returns
    ``{"result", "table", "partitions", "dirtyPartitions",
    "diffBuckets", "manifestRows", "liveRows", "verdicts"}`` where
    ``verdicts`` is one row per DIRTY partition (part, manifest_rows,
    live_rows, n_diff_buckets) — clean runs carry an empty frame.

    ``distributed`` routes the LIVE side: the driver route
    materializes every live partition's dense blobs (fine to ~10^3
    partitions); the distributed route (auto-engaged past
    ``compare.DRIVER_SIGNATURE_MAX_PARTITIONS``, the live compare's
    own crossing) reduces per partition in workers and collects only
    (part, rows, root, croot) scalars, fetching live blobs solely for
    scalar-dirty partitions — so a clean verify at 10^6 partitions
    holds ~24 B/partition on the driver for BOTH sides (review
    finding: the driver route here defeated the distributed write
    route's whole point)."""
    # two-phase read: scalar columns first (24 B/partition), then the
    # dense leaf blobs ONLY for partitions the scalar pass marked
    # dirty — at 10^6 partitions the clean-path verify never lifts a
    # blob off storage (mirrors compare's sparse distributed route)
    man_sigs, cfg, meta = read_manifest(manifest_dir,
                                        scalars_only=True)
    if distributed is None:
        distributed = (cfg.num_partitions
                       > cmp.DRIVER_SIGNATURE_MAX_PARTITIONS)
    red = None
    if distributed:
        red = cmp.partition_signatures_distributed(
            digest_dataset(ds, cfg, batch_size), cfg).materialize()
        live_roots = red.select_columns(
            ["part", "rows", "root", "croot"]).to_pandas()
        live = cmp._sparse_sig_frame(
            live_roots, pd.DataFrame(columns=["part", "leaves",
                                              "counts"]))
    else:
        live = cmp.partition_signatures(
            digest_dataset(ds, cfg, batch_size), cfg)
    pre = cmp.compare_signatures(man_sigs, live, cfg)
    dirty_parts = _scalar_dirty_parts(man_sigs, live, cfg)
    if dirty_parts and red is not None:
        # fetch the LIVE blobs for dirty partitions only
        blobs = cmp._fetch_blobs(red, np.asarray(dirty_parts,
                                                 np.int64))
        live = cmp._sparse_sig_frame(live_roots, blobs)
    if dirty_parts:
        blobs = _frame_from_table(pq.read_table(
            _sig_path(manifest_dir),
            filters=[("part", "in", dirty_parts)]))
        # graft the dirty partitions' blobs into the full scalar
        # frame — clean partitions keep None blobs (never compared)
        by_part = blobs.set_index("part")
        idx = man_sigs.index[man_sigs["part"].isin(by_part.index)]
        man_sigs = man_sigs.copy()
        for i in idx:
            p = man_sigs.at[i, "part"]
            man_sigs.at[i, "leaves"] = by_part.at[p, "leaves"]
            man_sigs.at[i, "counts"] = by_part.at[p, "counts"]
        diffs = cmp.compare_signatures(man_sigs, live, cfg)
    else:
        # nothing grafted — the second compare would recompute `pre`
        # with identical inputs (review finding: doubled the clean
        # path's driver compare at 10^6 partitions)
        diffs = pre
    dirty = [d for d in diffs if len(d.diff_buckets)
             or d.src_rows != d.snk_rows]
    verdicts = pd.DataFrame(
        [{"part": d.part, "manifest_rows": d.src_rows,
          "live_rows": d.snk_rows,
          "n_diff_buckets": int(len(d.diff_buckets))}
         for d in dirty],
        columns=["part", "manifest_rows", "live_rows",
                 "n_diff_buckets"]).astype(
        {"part": np.int64, "manifest_rows": np.int64,
         "live_rows": np.int64, "n_diff_buckets": np.int64})
    live_rows = int(live["rows"].sum()) if len(live) else 0
    return {
        "result": "success" if not dirty else "failed",
        "table": meta["table"],
        "partitions": cfg.num_partitions,
        "dirtyPartitions": len(dirty),
        "diffBuckets": int(sum(len(d.diff_buckets) for d in dirty)),
        "manifestRows": meta["n_rows"],
        "liveRows": live_rows,
        "verdicts": verdicts,
    }


def _tables_in(d: str) -> dict[str, str]:
    import glob

    out = {}
    for p in sorted(glob.glob(os.path.join(d, "*"))):
        base = os.path.basename(p.rstrip("/"))
        if p.endswith(".parquet"):
            name = os.path.splitext(base)[0]
        elif os.path.isdir(p):
            # a dotted DIRECTORY name ("db.orders") is a table name,
            # not an extension — splitext would collide tables
            # (review finding)
            name = base
        else:
            continue
        if name in out:
            raise ValueError(f"schema dir: colliding table name "
                             f"{name!r} ({out[name]} vs {p})")
        out[name] = p
    return out


def write_schema_manifests(src_dir: str,
                           key_columns: dict[str, tuple[str, ...]],
                           out_dir: str) -> dict:
    """Fingerprint EVERY table of a schema directory (the nightly
    lakehouse snapshot): one manifest subdirectory per table, keys
    resolved like ``validate_schema`` does ('*' = default for
    unlisted tables). Tables with no key mapping are skipped and
    listed in the summary — a skipped fingerprint is a loud gap, not
    a silent pass."""
    from ..sources.parquet import load_table_meta, read_table

    tables = _tables_in(src_dir)
    done, skipped, failed = [], [], {}
    for name, path in sorted(tables.items()):
        keys = key_columns.get(name, key_columns.get("*"))
        if not keys:
            skipped.append(name)
            continue
        meta = load_table_meta(path, name=name)
        missing = [k for k in keys if k not in meta.schema.names]
        if missing:
            # a '*' default that doesn't exist on this table is a
            # recorded failure, not a crashed batch
            failed[name] = f"key column(s) {missing} not in schema"
            continue
        cfg = DigestConfig.for_rows(tuple(keys), meta.num_rows)
        write_manifest(read_table(path), cfg,
                       os.path.join(out_dir, name), table=name)
        done.append(name)
    return {"result": "success" if done and not failed else "failed",
            "fingerprinted": done, "skipped": skipped,
            "failed": failed}


def verify_schema_manifests(live_dir: str, manifest_dir: str) -> dict:
    """Verify every table of ``live_dir`` against the per-table
    manifests under ``manifest_dir``. A manifest with no live table
    (or vice versa) is a failed verdict (the table-miss semantics of
    ``validate_schema``); returns per-table summaries + rollup."""
    from ..sources.parquet import read_table

    live = _tables_in(live_dir)
    mans = {name: os.path.join(manifest_dir, name)
            for name in sorted(os.listdir(manifest_dir))
            if os.path.isfile(os.path.join(manifest_dir, name,
                                           "manifest.json"))}
    names = sorted(set(live) | set(mans))
    tables, failed = {}, 0
    for name in names:
        if name not in mans or name not in live:
            side = "manifest" if name not in mans else "live"
            tables[name] = {"result": "failed",
                            "error": f"missing on {side} side"}
            failed += 1
            continue
        res = verify_against_manifest(read_table(live[name]),
                                      mans[name])
        res.pop("verdicts")
        tables[name] = res
        if res["result"] != "success":
            failed += 1
    return {"result": "success" if failed == 0 else "failed",
            "tableCount": len(names), "failedCount": failed,
            "tables": tables}


def diff_manifests(dir_a: str, dir_b: str) -> dict:
    """Diff two manifests of the same table WITHOUT touching any
    data — "what changed between last night's snapshot and
    tonight's" answered from two ~100 MB signature files. Configs
    must match (the alignment invariant — differing geometry raises);
    output matches ``verify_against_manifest``'s shape with sides
    named a/b."""
    # scalars-first two-phase on BOTH sides: a clean nightly diff
    # touches ~24 B/partition instead of every leaf blob (review
    # finding; same shape as verify_against_manifest)
    sigs_a, cfg_a, meta_a = read_manifest(dir_a, scalars_only=True)
    sigs_b, cfg_b, meta_b = read_manifest(dir_b, scalars_only=True)
    if cfg_a != cfg_b:
        raise ValueError("manifest configs differ — re-fingerprint "
                         f"one side ({cfg_a} vs {cfg_b})")
    dirty_parts = _scalar_dirty_parts(sigs_a, sigs_b, cfg_a)
    pre = None
    if dirty_parts:
        for sigs, d in ((sigs_a, dir_a), (sigs_b, dir_b)):
            blobs = _frame_from_table(pq.read_table(
                _sig_path(d), filters=[("part", "in", dirty_parts)]))
            by_part = blobs.set_index("part")
            for i in sigs.index[sigs["part"].isin(by_part.index)]:
                p = sigs.at[i, "part"]
                sigs.at[i, "leaves"] = by_part.at[p, "leaves"]
                sigs.at[i, "counts"] = by_part.at[p, "counts"]
        diffs = cmp.compare_signatures(sigs_a, sigs_b, cfg_a)
    else:  # no scalar-dirty partition: clean by construction
        diffs = cmp.compare_signatures(sigs_a, sigs_b, cfg_a)
    dirty = [d for d in diffs if len(d.diff_buckets)
             or d.src_rows != d.snk_rows]
    verdicts = pd.DataFrame(
        [{"part": d.part, "a_rows": d.src_rows, "b_rows": d.snk_rows,
          "n_diff_buckets": int(len(d.diff_buckets))} for d in dirty],
        columns=["part", "a_rows", "b_rows", "n_diff_buckets"]).astype(
        {"part": np.int64, "a_rows": np.int64, "b_rows": np.int64,
         "n_diff_buckets": np.int64})
    return {
        "result": "success" if not dirty else "failed",
        "table": meta_a["table"],
        "partitions": cfg_a.num_partitions,
        "dirtyPartitions": len(dirty),
        "diffBuckets": int(sum(len(d.diff_buckets) for d in dirty)),
        "aRows": meta_a["n_rows"], "bRows": meta_b["n_rows"],
        "verdicts": verdicts,
    }


def update_manifest(manifest_dir: str,
                    removed: pa.Table | None = None,
                    added: pa.Table | None = None,
                    out_dir: str | None = None) -> dict:
    """Apply a change window to a manifest WITHOUT rescanning the
    table — the XOR bucket signature is its own inverse, so removing
    a row image is the same fold as adding one. ``removed`` carries
    the full row images leaving the table (deletes + pre-update
    images), ``added`` the images entering it (inserts + post-update
    images); both must have the fingerprinted schema. Nightly
    fingerprint + the day's CDC stream = an always-current manifest
    with ZERO table reads (the reference's incremental mode re-checks
    keys against a live pair — this keeps the temporal manifest
    current instead).

    Writes to ``out_dir`` (default: in place) and returns the new
    meta. Equality with a from-scratch re-fingerprint of the changed
    table is exact — same leaves, same roots (pinned by test). A
    bucket count driven negative (a remove whose image was never
    fingerprinted) raises loudly — the stream and manifest diverged.

    Driver-side by design: a change window is bounded (the CDC
    window's ``count_period``); digesting it is one vectorized pass.
    """
    from ..functions import merkle

    sigs, cfg, meta = read_manifest(manifest_dir)
    out_dir = out_dir or manifest_dir
    B = cfg.buckets_per_partition
    # dense working state keyed by partition id
    leaves = {int(p): np.frombuffer(lv, dtype=np.uint64).copy()
              if lv is not None else np.zeros(B, np.uint64)
              for p, lv in zip(sigs["part"], sigs["leaves"])}
    counts = {int(p): np.frombuffer(ct, dtype=np.int64).copy()
              if ct is not None else np.zeros(B, np.int64)
              for p, ct in zip(sigs["part"], sigs["counts"])}
    digest = make_digest_fn(cfg)
    # with compare_columns set the digest reads only keys + compare
    # columns (by NAME), so images need just those; the order-
    # sensitive full-schema projection applies only to the
    # compare-all default (review finding)
    if cfg.compare_columns is not None:
        fp_cols = (list(cfg.key_columns)
                   + [c for c in cfg.compare_columns
                      if c not in cfg.key_columns])
    else:
        fp_cols = meta.get("columns")

    def fold(tbl: pa.Table, delta: int) -> None:
        if tbl is None or tbl.num_rows == 0:
            return
        if fp_cols is not None:
            # project to the FINGERPRINTED column list in its original
            # order — the row hash is order-sensitive, and pandas round
            # trips love to smuggle in __index_level_0__ columns
            missing = [c for c in fp_cols if c not in tbl.column_names]
            if missing:
                raise ValueError(
                    f"update_manifest: change images lack "
                    f"fingerprinted column(s) {missing}")
            tbl = tbl.select(fp_cols)
        d = digest(tbl)
        part = d.column("part").to_numpy()
        bucket = d.column("bucket").to_numpy()
        vhash = d.column("vhash").to_numpy()
        for p in np.unique(part):
            m = part == p
            p = int(p)
            if p not in leaves:
                leaves[p] = np.zeros(B, np.uint64)
                counts[p] = np.zeros(B, np.int64)
            np.bitwise_xor.at(leaves[p], bucket[m], vhash[m])
            np.add.at(counts[p], bucket[m], np.int64(delta))

    fold(removed, -1)
    fold(added, +1)
    parts = sorted(leaves)
    neg = [p for p in parts if (counts[p] < 0).any()]
    if neg:
        raise ValueError(
            f"update_manifest: bucket count went negative in "
            f"partition(s) {neg[:5]} — a removed image was never "
            f"fingerprinted; the change stream and manifest diverged")
    new_sigs = pd.DataFrame({
        "part": np.array(parts, np.int64),
        "rows": np.array([int(counts[p].sum()) for p in parts],
                         np.int64),
        "root": np.array([merkle.merkle_root(leaves[p])
                          for p in parts], np.uint64),
        "croot": np.array([merkle.merkle_root(
            counts[p].view(np.uint64)) for p in parts], np.uint64),
        "leaves": [leaves[p].tobytes() for p in parts],
        "counts": [counts[p].tobytes() for p in parts],
    })
    os.makedirs(out_dir, exist_ok=True)
    t = _sig_frame_to_arrow(new_sigs)
    tmp = os.path.join(out_dir, "signatures.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(out_dir, "signatures.parquet"))
    # an in-place update of a sharded (distributed) manifest collapses
    # it to the single-file layout; remove the stale shard dir
    shard_dir = os.path.join(out_dir, "signatures")
    if os.path.isdir(shard_dir):
        import shutil

        shutil.rmtree(shard_dir)
    n_rows = int(new_sigs["rows"].sum())
    # preserve the recorded fingerprint column list — dropping it
    # would disarm fold()'s projection/order guard on the NEXT update
    # (review finding)
    return _write_meta(out_dir, cfg, meta["table"], n_rows,
                       columns=meta.get("columns"))


def update_from_changes(manifest_dir: str, parsed,
                        schema: pa.Schema,
                        out_dir: str | None = None) -> dict:
    """Apply a PARSED change stream (``sources.debezium
    make_event_parser(value_columns=cols, before_columns=cols)``
    output — one row per event with ``v_<col>`` after-image and
    ``b_<col>`` before-image transport strings) straight to a
    manifest. Builds the removed/added image tables by casting the
    transport strings back through ``schema`` (exact for
    int/float/bool/string columns — the ``cdc_state_verify`` cast),
    then folds them with :func:`update_manifest` — the full chain
    "Debezium log in, current fingerprint out", zero table reads.

    Event semantics: ``c`` adds the after image; ``d`` removes the
    before image; ``u`` removes before AND adds after — an update OR
    delete whose transport carried no before image at all raises
    (enable full row images / REPLICA IDENTITY FULL; folding an
    unknown before would corrupt the XOR state silently). A null
    b_<col> VALUE inside a present image is trusted as a genuine
    NULL — the transport cannot distinguish a null column from a
    key-only partial image, so full row images are a hard
    requirement. XOR folding commutes, so a whole window applies in
    one pass regardless of event order, provided each event's images
    are truthful."""
    with open(os.path.join(manifest_dir, "manifest.json")) as f:
        table = json.load(f).get("table")
    removed, added = _images_from_changes(parsed, schema, table=table)
    if removed is None:  # empty window: no-op
        return update_manifest(manifest_dir, out_dir=out_dir)
    return update_manifest(manifest_dir, removed=removed, added=added,
                           out_dir=out_dir)


def _images_from_changes(parsed, schema: pa.Schema,
                         table: str | None = None
                         ) -> tuple[pa.Table | None, pa.Table | None]:
    """Shared CDC-bridge core: parsed events (v_/b_ transport
    strings + has_before) -> (removed, added) typed image tables, or
    (None, None) for an empty window. Guards BOTH update and delete
    events on the parser's ``has_before`` flag (a null b_<col> alone
    cannot distinguish a null column value from a missing image —
    review finding). With ``table``, events for OTHER tables are
    dropped first — a multi-table Debezium topic must not fold a
    stranger's events into this manifest (review finding). A window
    with no update/delete events needs no ``b_`` columns at all
    (insert-only streams parse without ``before_columns``)."""
    import pyarrow.compute as pc

    t = (cmp._collect_arrow(parsed)
         if hasattr(parsed, "to_arrow_refs") else parsed)
    if t is not None and table is not None \
            and "table" in t.column_names:
        t = t.filter(pc.equal(t.column("table"), table))
    if t is None or t.num_rows == 0:
        return None, None
    cols = [f.name for f in schema]

    def img(prefix: str, mask: np.ndarray) -> pa.Table:
        arrs = []
        for f in schema:
            col = t.column(f"{prefix}{f.name}")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            arrs.append(pc.cast(col.filter(pa.array(mask)), f.type))
        return pa.table(dict(zip(cols, arrs)))

    op = t.column("op").to_numpy(zero_copy_only=False).astype(str)
    is_c, is_u, is_d = op == "c", op == "u", op == "d"
    needs_before = is_u | is_d
    if needs_before.any():
        if "has_before" not in t.column_names:
            raise ValueError(
                "change stream lacks the has_before flag — parse with "
                "make_event_parser(before_columns=...)")
        hb = t.column("has_before")
        if isinstance(hb, pa.ChunkedArray):
            hb = hb.combine_chunks()
        hb = hb.to_numpy(zero_copy_only=False).astype(bool)
        if (~hb & needs_before).any():
            raise ValueError(
                "update/delete event(s) without a before image — "
                "enable full row images (REPLICA IDENTITY FULL) or "
                "re-fingerprint")
    if needs_before.any():
        removed = pa.concat_tables([img("b_", is_u), img("b_", is_d)])
    else:
        # insert-only window: no b_ columns exist (and none are
        # needed) — an empty typed table keeps the fold a no-op
        removed = pa.table({c: pa.array([], f.type)
                            for c, f in zip(cols, schema)})
    added = pa.concat_tables([img("v_", is_c), img("v_", is_u)])
    return removed, added


def write_profile_manifest(ds, out_dir: str,
                           columns: list[str] | None = None,
                           table: str = "table",
                           merge_concurrency: int | None = None
                           ) -> dict:
    """Persist the table's merged per-column SKETCH profiles
    (count/nulls/min/max, HLL registers, t-digest centroids, top-k
    counters) — the STATISTICAL manifest completing the north rule's
    "checkpoints merged sketches ... per partition": later runs
    drift-test live data against this snapshot with the original
    data gone ("is today's corpus statistically like last month's").

    Format: ``profile.json`` (human-readable summary rows + meta) +
    ``sketches.pkl`` (the pickled ColumnProfile dict — engine-internal
    format, mergeable and version-guarded; the JSON rows are the
    portable part). Sketch sizes are fixed (HLL 2^14 registers,
    t-digest ~200 centroids), so the manifest is ~100 KB per column
    regardless of table size."""
    import pickle

    from .profile import profile_dataset

    profs = profile_dataset(ds, columns,
                            merge_concurrency=merge_concurrency)
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "sketches.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump({"version": MANIFEST_VERSION, "profiles": profs},
                    f)
    os.replace(tmp, os.path.join(out_dir, "sketches.pkl"))
    meta = {
        "version": MANIFEST_VERSION,
        "table": table,
        "columns": sorted(profs),
        "rows": [p.to_row() for p in profs.values()],
    }
    mtmp = os.path.join(out_dir, "profile.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(meta, f, default=str)
    os.replace(mtmp, os.path.join(out_dir, "profile.json"))
    return meta


def read_profile_manifest(out_dir: str) -> tuple[dict, dict]:
    """(profiles dict, meta) from a profile manifest; version-guarded."""
    import pickle

    with open(os.path.join(out_dir, "sketches.pkl"), "rb") as f:
        blob = pickle.load(f)
    if blob.get("version") != MANIFEST_VERSION:
        raise ValueError(f"profile manifest version "
                         f"{blob.get('version')} != {MANIFEST_VERSION}")
    with open(os.path.join(out_dir, "profile.json")) as f:
        meta = json.load(f)
    return blob["profiles"], meta


def drift_vs_profile_manifest(ds, manifest_dir: str,
                              ks_threshold: float = 0.1,
                              psi_threshold: float = 0.25,
                              merge_concurrency: int | None = None
                              ) -> pd.DataFrame:
    """Per-column drift verdicts of LIVE data against a stored
    profile manifest — the temporal sibling of the validation run's
    source-vs-sink drift phase, with the reference side reduced to
    ~100 KB of sketches per column. Profiles the live side over the
    manifest's own column list (pruned read is the caller's job) and
    reuses ``checks.drift_report`` verbatim, so threshold semantics
    match the live pair's."""
    from ..pipelines.checks import drift_report
    from .profile import profile_dataset

    stored, meta = read_profile_manifest(manifest_dir)
    live = profile_dataset(ds, meta["columns"],
                           merge_concurrency=merge_concurrency)
    return drift_report(stored, live, ks_threshold=ks_threshold,
                        psi_threshold=psi_threshold)


def write_grouped_profile_manifest(ds, group_col: str,
                                   value_cols: list[str],
                                   out_dir: str, table: str = "table",
                                   merge_distributed: bool | None
                                   = None) -> dict:
    """Persist PER-GROUP sketch profiles — the north rule's
    "checkpoints merged sketches ... per partition" literally: one
    {column: ColumnProfile} per partition/group value, via the same
    auto-routed partial fold the live drift report uses
    (``checks.grouped_profiles``). A later run drift-tests each live
    group against ITS OWN stored profile (per-partition temporal
    drift), not just the whole table."""
    import pickle

    from ..pipelines.checks import grouped_profiles

    profs, _route = grouped_profiles(
        ds, group_col, value_cols,
        merge_distributed=merge_distributed)
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "sketches.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump({"version": MANIFEST_VERSION, "grouped": True,
                     "group_col": group_col,
                     "value_cols": list(value_cols),
                     "profiles": profs}, f)
    os.replace(tmp, os.path.join(out_dir, "sketches.pkl"))
    meta = {
        "version": MANIFEST_VERSION,
        "table": table,
        "group_col": group_col,
        "value_cols": list(value_cols),
        "n_groups": len(profs),
        # human rows stay bounded: per-group detail lives in the pkl
        "total_rows": int(sum(
            next(iter(p.values())).count for p in profs.values()
            if p)),
    }
    mtmp = os.path.join(out_dir, "profile.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(meta, f, default=str)
    os.replace(mtmp, os.path.join(out_dir, "profile.json"))
    return meta


def read_grouped_profile_manifest(out_dir: str) -> dict:
    """The grouped sketch blob {version, group_col, value_cols,
    profiles}; version- and layout-guarded (the read counterpart of
    ``write_grouped_profile_manifest`` — review finding)."""
    import pickle

    with open(os.path.join(out_dir, "sketches.pkl"), "rb") as f:
        blob = pickle.load(f)
    if blob.get("version") != MANIFEST_VERSION or \
            not blob.get("grouped"):
        raise ValueError("not a grouped profile manifest (or version "
                         "drift)")
    return blob


def drift_vs_grouped_manifest(ds, manifest_dir: str,
                              ks_threshold: float = 0.1,
                              psi_threshold: float = 0.25,
                              merge_distributed: bool | None = None
                              ) -> pd.DataFrame:
    """Per-(group, column) drift verdicts of live data against a
    grouped sketch manifest: each live group vs ITS stored profile
    (same-key temporal comparison — no cross-group baseline, so no
    median-excess correction is needed; thresholds apply directly as
    in the pairwise ``drift_report``). Groups present on only one
    side get a ``missing_on`` verdict row instead of a silent skip."""
    from ..pipelines.checks import _drift_rows, grouped_profiles

    blob = read_grouped_profile_manifest(manifest_dir)
    stored = blob["profiles"]
    live, _route = grouped_profiles(
        ds, blob["group_col"], blob["value_cols"],
        merge_distributed=merge_distributed)
    rows: list[dict] = []
    for g in sorted(set(stored) | set(live)):
        if g not in stored or g not in live:
            rows.append({"grp": g, "column": None, "ks": None,
                         "psi": None,
                         "result": "failed",
                         "missing_on": ("manifest" if g not in stored
                                        else "live")})
            continue
        for row in _drift_rows(stored[g], live[g],
                               ks_threshold, psi_threshold):
            rows.append({"grp": g, **row, "missing_on": None})
    if not rows:
        return pd.DataFrame(columns=["grp", "column", "ks", "psi",
                                     "result", "missing_on"])
    return pd.DataFrame(rows)


def _column_partials_fn(cfg: DigestConfig, compare_cols: list[str]):
    """Per-batch column-signature partials: the batch's key hash /
    partition / bucket are computed ONCE, then each compare column
    folds its keyed value hash per (gid, column) — one fused scan,
    C x the normal signature partial volume (documented cost of
    column-granular diagnosis)."""
    from ..functions import canonical, hashing

    B = cfg.buckets_per_partition

    def partials(batch: pa.Table) -> pa.Table:
        keys = canonical.key_column(batch, list(cfg.key_columns))
        khash = hashing.hash64(keys)
        part, bucket = hashing.assign_buckets(
            khash, cfg.num_partitions, B)
        gid = part.astype(np.int64) * B + bucket.astype(np.int64)
        out_col, out_gid, out_sig, out_cnt = [], [], [], []
        # row counts once (column-independent)
        ug, us, uc = cmp._xor_count_by_gid(
            gid, np.zeros(len(gid), np.uint64))
        out_col.append(np.full(len(ug), "__rows__", dtype=object))
        out_gid.append(ug)
        out_sig.append(us)
        out_cnt.append(uc)
        for c in compare_cols:
            vh = hashing.keyed_column_hash(khash, batch.column(c))
            ug, us, uc = cmp._xor_count_by_gid(gid, vh)
            out_col.append(np.full(len(ug), c, dtype=object))
            out_gid.append(ug)
            out_sig.append(us)
            out_cnt.append(uc)
        return pa.table({
            "column": pa.array(np.concatenate(out_col), pa.string()),
            "gid": pa.array(np.concatenate(out_gid)),
            "sig": pa.array(np.concatenate(out_sig), pa.uint64()),
            "cnt": pa.array(np.concatenate(out_cnt), pa.int64()),
        })

    return partials


def _fold_column_partials(t: pa.Table, cfg: DigestConfig,
                          compare_cols: list[str]) -> pd.DataFrame:
    """Driver fold: per (column, part) dense leaf blobs + roots; the
    "__rows__" rows carry bucket counts (croot analog)."""
    from ..functions import merkle

    B = cfg.buckets_per_partition
    df = pd.DataFrame({
        "column": t.column("column").to_pylist(),
        "gid": t.column("gid").to_numpy(),
        "sig": t.column("sig").to_numpy(),
        "cnt": t.column("cnt").to_numpy(),
    }) if t is not None else pd.DataFrame(
        columns=["column", "gid", "sig", "cnt"])
    rows = []
    for (colname, part), g in df.assign(part=lambda d: d["gid"] // B) \
            .groupby(["column", "part"], sort=True):
        lv = np.zeros(B, np.uint64)
        ct = np.zeros(B, np.int64)
        b = (g["gid"] % B).to_numpy().astype(np.int64)
        np.bitwise_xor.at(lv, b, g["sig"].to_numpy().astype(np.uint64))
        np.add.at(ct, b, g["cnt"].to_numpy().astype(np.int64))
        rows.append({"column": colname, "part": int(part),
                     "rows": int(ct.sum()),
                     "root": np.uint64(merkle.merkle_root(lv)),
                     "croot": np.uint64(
                         merkle.merkle_root(ct.view(np.uint64))),
                     "leaves": lv.tobytes(),
                     "counts": ct.tobytes()})
    return pd.DataFrame(rows, columns=["column", "part", "rows",
                                       "root", "croot", "leaves",
                                       "counts"])


def _write_column_signatures(sigs: pd.DataFrame,
                             out_dir: str) -> None:
    """Atomic writer for the column-signature parquet (shared by the
    fingerprint and incremental-update paths; roots stored as int64
    bit patterns)."""
    t = pa.table({
        "column": pa.array(list(sigs["column"]), pa.string()),
        "part": pa.array(sigs["part"].to_numpy(np.int64)),
        "rows": pa.array(sigs["rows"].to_numpy(np.int64)),
        "root": pa.array(sigs["root"].to_numpy(np.uint64)
                         .view(np.int64)),
        "croot": pa.array(sigs["croot"].to_numpy(np.uint64)
                          .view(np.int64)),
        "leaves": pa.array(list(sigs["leaves"]), pa.binary()),
        "counts": pa.array(list(sigs["counts"]), pa.binary()),
    })
    tmp = os.path.join(out_dir, "column_signatures.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(out_dir,
                                 "column_signatures.parquet"))


def write_column_manifest(ds, cfg: DigestConfig, out_dir: str,
                          compare_cols: list[str],
                          table: str = "table",
                          batch_size: int | None = None) -> dict:
    """Column-GRANULAR fingerprint: one signature set per compare
    column (value hashes BOUND to row keys via
    ``hashing.keyed_column_hash``), so a later verify reports WHICH
    COLUMN changed in which partition — "price drifted in 3
    partitions, text untouched" — where the row-level manifest only
    says "partition dirty". Cost: C x the signature partial volume of
    the row manifest (one fused scan either way); key columns are
    implicitly covered by every signature (the binding)."""
    parts_ds = ds.map_batches(
        _column_partials_fn(cfg, compare_cols),
        batch_format="pyarrow", batch_size=batch_size)
    sigs = _fold_column_partials(cmp._collect_arrow(parts_ds), cfg,
                                 compare_cols)
    os.makedirs(out_dir, exist_ok=True)
    _write_column_signatures(sigs, out_dir)
    rows_rows = sigs[sigs["column"] == "__rows__"]
    meta = {
        "version": MANIFEST_VERSION,
        "table": table,
        "n_rows": int(rows_rows["rows"].sum()) if len(rows_rows)
        else 0,
        "compare_cols": list(compare_cols),
        "key_columns": list(cfg.key_columns),
        "num_partitions": cfg.num_partitions,
        "buckets_per_partition": cfg.buckets_per_partition,
    }
    mtmp = os.path.join(out_dir, "column_manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(meta, f)
    os.replace(mtmp, os.path.join(out_dir, "column_manifest.json"))
    return meta


def _load_column_frame(d: str) -> tuple[pd.DataFrame, dict]:
    """(signature frame, meta) of a column manifest; version-guarded."""
    with open(os.path.join(d, "column_manifest.json")) as f:
        meta = json.load(f)
    if meta.get("version") != MANIFEST_VERSION:
        raise ValueError("column manifest version drift")
    t = pq.read_table(os.path.join(d, "column_signatures.parquet"))
    frame = pd.DataFrame({
        "column": t.column("column").to_pylist(),
        "part": t.column("part").to_numpy(),
        "root": t.column("root").to_numpy().view(np.uint64),
        "croot": t.column("croot").to_numpy().view(np.uint64),
        "leaves": t.column("leaves").to_pylist(),
        "counts": t.column("counts").to_pylist(),
    })
    return frame, meta


def _column_compare(man: pd.DataFrame, live: pd.DataFrame, B: int,
                    table: str) -> dict:
    """Shared (partition, column) compare of two column-signature
    frames -> the verify/diff result dict. The ``__rows__``
    pseudo-column's leaves are all-zero by construction (vhash=0), so
    its only signal is the count root — the scalar skip requires BOTH
    roots equal."""
    from ..functions import merkle

    # nullable UInt64 BEFORE the outer merge: a plain merge coerces
    # uint64 roots to float64 when any row is one-sided, degrading the
    # equality to 53 bits — a false-clean hazard (review finding; the
    # same guard compare._dirty_parts uses)
    man = man.astype({"root": "UInt64", "croot": "UInt64"})
    live = live.astype({"root": "UInt64", "croot": "UInt64"})
    j = man.merge(live, on=["column", "part"], how="outer",
                  suffixes=("_m", "_l"))
    # vectorized clean skip: descend (python-level blob work) only
    # into rows whose scalars differ (review finding: iterrows over
    # every (part, column) pair was O(P*C) on the clean path)
    same = ((j["root_m"] == j["root_l"]).fillna(False)
            & (j["croot_m"] == j["croot_l"]).fillna(False))
    rows = []
    for _, r in j[~same].iterrows():
        lv_m = (np.frombuffer(r["leaves_m"], np.uint64)
                if isinstance(r["leaves_m"], bytes)
                else np.zeros(B, np.uint64))
        lv_l = (np.frombuffer(r["leaves_l"], np.uint64)
                if isinstance(r["leaves_l"], bytes)
                else np.zeros(B, np.uint64))
        db = merkle.diff_buckets(lv_m, lv_l)
        ct_m = (np.frombuffer(r["counts_m"], np.int64)
                if isinstance(r["counts_m"], bytes)
                else np.zeros(B, np.int64))
        ct_l = (np.frombuffer(r["counts_l"], np.int64)
                if isinstance(r["counts_l"], bytes)
                else np.zeros(B, np.int64))
        db = np.union1d(db, np.nonzero(ct_m != ct_l)[0])
        if len(db):
            rows.append({"part": int(r["part"]),
                         "column": r["column"],
                         "n_diff_buckets": int(len(db))})
    verdicts = pd.DataFrame(rows, columns=["part", "column",
                                           "n_diff_buckets"])
    if len(verdicts):
        verdicts = verdicts.sort_values(
            ["part", "column"]).reset_index(drop=True)
    dirty_cols = sorted(set(verdicts["column"]) - {"__rows__"}) \
        if len(verdicts) else []
    return {"result": "success" if not len(verdicts) else "failed",
            "table": table,
            "dirtyColumns": dirty_cols,
            "rowSkew": bool(len(verdicts) and
                            (verdicts["column"] == "__rows__").any()),
            "verdicts": verdicts}


def verify_columns_against_manifest(ds, manifest_dir: str,
                                    batch_size: int | None = None
                                    ) -> dict:
    """Column-granular verify: which (partition, column) pairs differ
    from the stored column manifest. Returns ``{"result", "table",
    "dirtyColumns": sorted list, "verdicts": DataFrame(part, column,
    n_diff_buckets)}`` — the ``__rows__`` pseudo-column carries pure
    row-count/multiplicity skew (insert/delete), letting a reader
    separate "values changed in column X" from "rows appeared/
    vanished"."""
    man, meta = _load_column_frame(manifest_dir)
    cfg = DigestConfig(
        key_columns=tuple(meta["key_columns"]),
        num_partitions=meta["num_partitions"],
        buckets_per_partition=meta["buckets_per_partition"])
    live_parts = ds.map_batches(
        _column_partials_fn(cfg, meta["compare_cols"]),
        batch_format="pyarrow", batch_size=batch_size)
    live = _fold_column_partials(cmp._collect_arrow(live_parts), cfg,
                                 meta["compare_cols"])
    return _column_compare(man, live, cfg.buckets_per_partition,
                           meta["table"])


def update_column_manifest(manifest_dir: str,
                           removed: pa.Table | None = None,
                           added: pa.Table | None = None,
                           out_dir: str | None = None) -> dict:
    """Apply a change window to a COLUMN manifest — the per-column
    XOR signatures are self-inverse exactly like the row manifest's
    (:func:`update_manifest`), so a CDC window keeps the
    column-granular fingerprint current with zero table reads.
    Images must carry the key columns and every compare column;
    byte-equality with a re-fingerprint is pinned by test."""
    from ..functions import merkle

    frame, meta = _load_column_frame(manifest_dir)
    cfg = DigestConfig(
        key_columns=tuple(meta["key_columns"]),
        num_partitions=meta["num_partitions"],
        buckets_per_partition=meta["buckets_per_partition"])
    compare_cols = meta["compare_cols"]
    out_dir = out_dir or manifest_dir
    B = cfg.buckets_per_partition
    leaves: dict[tuple, np.ndarray] = {}
    counts: dict[tuple, np.ndarray] = {}
    for colname, part, lv, ct in zip(frame["column"], frame["part"],
                                     frame["leaves"], frame["counts"]):
        k = (colname, int(part))
        leaves[k] = np.frombuffer(lv, np.uint64).copy()
        counts[k] = np.frombuffer(ct, np.int64).copy()
    partial_fn = _column_partials_fn(cfg, compare_cols)

    def fold(tbl: pa.Table | None, delta: int) -> None:
        if tbl is None or tbl.num_rows == 0:
            return
        need = list(cfg.key_columns) + compare_cols
        missing = [c for c in need if c not in tbl.column_names]
        if missing:
            raise ValueError(f"update_column_manifest: images lack "
                             f"column(s) {missing}")
        p = partial_fn(tbl.select(
            [c for c in tbl.column_names if c in need]))
        col = p.column("column").to_pylist()
        gid = p.column("gid").to_numpy()
        sig = p.column("sig").to_numpy()
        cnt = p.column("cnt").to_numpy()
        for c, g, s_, n_ in zip(col, gid, sig, cnt):
            k = (c, int(g // B))
            if k not in leaves:
                leaves[k] = np.zeros(B, np.uint64)
                counts[k] = np.zeros(B, np.int64)
            b = int(g % B)
            leaves[k][b] ^= np.uint64(s_)
            counts[k][b] += delta * int(n_)

    fold(removed, -1)
    fold(added, +1)
    neg = [k for k, c in counts.items() if (c < 0).any()]
    if neg:
        raise ValueError(
            f"update_column_manifest: bucket count negative for "
            f"{neg[:3]} — the change stream and manifest diverged")
    ks = sorted(leaves)
    sigs = pd.DataFrame({
        "column": [k[0] for k in ks],
        "part": np.array([k[1] for k in ks], np.int64),
        "rows": np.array([int(counts[k].sum()) for k in ks],
                         np.int64),
        "root": np.array([merkle.merkle_root(leaves[k])
                          for k in ks], np.uint64),
        "croot": np.array([merkle.merkle_root(
            counts[k].view(np.uint64)) for k in ks], np.uint64),
        "leaves": [leaves[k].tobytes() for k in ks],
        "counts": [counts[k].tobytes() for k in ks],
    })
    os.makedirs(out_dir, exist_ok=True)
    _write_column_signatures(sigs, out_dir)
    rows_tot = int(sigs.loc[sigs["column"] == "__rows__",
                            "rows"].sum())
    meta = dict(meta, n_rows=rows_tot)
    mtmp = os.path.join(out_dir, "column_manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(meta, f)
    os.replace(mtmp, os.path.join(out_dir, "column_manifest.json"))
    return meta


def diff_column_manifests(dir_a: str, dir_b: str) -> dict:
    """Diff two COLUMN manifests of the same table with zero data
    read: which (partition, column) pairs changed between snapshots.
    Same output shape as :func:`verify_columns_against_manifest`
    (a = the "manifest" side, b = the "live" side); config drift
    raises."""
    man_a, meta_a = _load_column_frame(dir_a)
    man_b, meta_b = _load_column_frame(dir_b)
    keys = ("key_columns", "num_partitions", "buckets_per_partition",
            "compare_cols")
    if any(meta_a[k] != meta_b[k] for k in keys):
        raise ValueError("column manifest configs differ — "
                         "re-fingerprint one side")
    return _column_compare(man_a, man_b,
                           meta_a["buckets_per_partition"],
                           meta_a["table"])


def update_column_manifest_from_changes(manifest_dir: str, parsed,
                                        schema: pa.Schema,
                                        out_dir: str | None = None
                                        ) -> dict:
    """The CDC bridge for COLUMN manifests — the shared
    :func:`_images_from_changes` core (same guards as
    :func:`update_from_changes`), folding via
    :func:`update_column_manifest`."""
    with open(os.path.join(manifest_dir,
                           "column_manifest.json")) as f:
        table = json.load(f).get("table")
    removed, added = _images_from_changes(parsed, schema, table=table)
    if removed is None:
        return update_column_manifest(manifest_dir, out_dir=out_dir)
    return update_column_manifest(manifest_dir, removed=removed,
                                  added=added, out_dir=out_dir)

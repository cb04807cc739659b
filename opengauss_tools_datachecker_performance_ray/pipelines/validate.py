"""Full validation lifecycle: the flagship pipeline.

Ray-Data-native collapse of the reference's FULL verification
choreography (SURVEY.md §3.1): metadata + structure check
(``CheckTableStructureService``), shared hash partitioning instead of
the Kafka checkpoint swap, digest extraction, Merkle-pruned compare,
uniqueness + referential + drift checks, verdict/report emission
(``SliceCheckResultManager`` shapes) and per-partition checkpoint
receipts for resume.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any

import pandas as pd

from ..sources import parquet as pqsrc
from ..stages import compare as cmp
from ..stages import profile as prof
from ..stages.digest import DigestConfig, digest_dataset
from ..state.checkpoint import CheckpointStore, lineage_id
from ..state.report import ReportWriter
from . import checks


@dataclass
class RuleConfig:
    """Table / column / row rules (reference M3/M4/M5:
    ``TableRuleAdapterService`` black/white regex lists,
    ``ColumnRuleAdapterService`` include/exclude columns with PK always
    kept, ``RowRuleAdapterService`` per-table ordered offset+count)."""

    table_white: list[str] | None = None
    table_black: list[str] | None = None
    column_include: dict[str, list[str]] | None = None  # table -> cols
    column_exclude: dict[str, list[str]] | None = None
    row_rules: dict[str, tuple[int, int]] | None = None  # table -> (off, cnt)


def apply_column_rule(columns: list[str], table: str,
                      rules: RuleConfig | None,
                      key_columns: tuple[str, ...]) -> list[str]:
    if rules is None:
        return columns
    cols = list(columns)
    inc = (rules.column_include or {}).get(table)
    exc = (rules.column_exclude or {}).get(table)
    if inc:
        cols = [c for c in cols if c in inc]
    if exc:
        cols = [c for c in cols if c not in exc]
    for k in key_columns:  # PK always kept (CheckColumnRule semantics)
        if k not in cols:
            cols.insert(0, k)
    return cols


def apply_row_rule(ds, key_column: str, offset: int, count: int):
    """``ORDER BY pk LIMIT offset, count`` semantics at scale
    (``adapter/service/rule/CheckRowRule.java``, application.yml rows
    rule): a keys-only DISTRIBUTED sort finds the two boundary keys at
    ranks ``offset`` and ``offset+count-1`` via ``split_at_indices``
    (only those single-row splits are ever collected — the driver never
    sees the key column), then a vectorized range filter selects the
    window. Full rows never sort, shuffle, or materialize; the keys-only
    sort moves ~8-byte digests and spills via the object store."""
    if count <= 0:  # LIMIT off,0 — empty window, no sort needed
        return ds.limit(0)
    keys_sorted = (ds.select_columns([key_column])
                   .sort(key_column).materialize())
    head = keys_sorted.split_at_indices([offset, offset + 1])[1].take_all()
    if not head:
        return ds.limit(0)  # offset beyond the table -> empty window
    lo = head[0][key_column]
    tail = keys_sorted.split_at_indices(
        [offset + count - 1, offset + count])[1].take_all()
    # table shorter than offset+count => window runs to the last key
    hi = tail[0][key_column] if tail else None
    if hi is None:
        hi = keys_sorted.split_at_indices(
            [keys_sorted.count() - 1])[1].take_all()[0][key_column]

    def rng(batch):
        col = batch.column(key_column)
        import pyarrow as pa_
        import pyarrow.compute as pcx
        mask = pcx.and_(pcx.greater_equal(col, pa_.scalar(lo)),
                        pcx.less_equal(col, pa_.scalar(hi)))
        return batch.filter(mask)

    return ds.map_batches(rng, batch_format="pyarrow")


@dataclass
class ValidationConfig:
    key_columns: tuple[str, ...] = ("url",)
    compare_columns: tuple[str, ...] | None = None
    partition_capacity: int = 1_000_000
    bucket_capacity: int = 256
    # None = one batch per block (fusion-preserving; a numeric value
    # here unfuses the digest map from the read and round-trips raw
    # blocks through the object store). Wide html rows are bounded by
    # the READ's target block size, not map batch_size.
    batch_size: int | None = None
    check_uniqueness: bool = True
    check_drift: bool = True
    drift_columns: tuple[str, ...] | None = None
    report_dir: str | None = None
    checkpoint_dir: str | None = None
    emit_repair: bool = False
    # UpdateDmlBuilder-style column-wise UPDATE ("update") vs REPLACE
    # VALUES ("replace"); batched DELETE ... WHERE pk IN (...) lists
    repair_update_style: str = "replace"
    repair_batch_delete: bool = False
    # declarative constraint rules (pipelines/rules.Rule list) run
    # against the SOURCE side's raw rows as a third overlapped phase;
    # any failing rule fails the run like a compare diff would
    rules: list | None = None
    rules_partition_col: str | None = None
    # sampled pre-check: < 1.0 runs the digest compare + uniqueness
    # over a deterministic Knuth-hash key sample of BOTH sides (same
    # kernel as stages/sampling — which rows are checked is a pure
    # function of the key, so a sampled diff is a real diff). Drift
    # and rules still see the full population: their sketches cost one
    # cheap pass and sampling them would only add estimator noise.
    # Requires a single integer key column (non-negative).
    sample_rate: float = 1.0
    # aggregate quick-verify (pipelines/reconcile.py) as a fourth
    # overlapped phase: per-column count/nulls/sum/min/max both sides
    # diffed into a long verdict table; any mismatch fails the run.
    # Under sample_rate < 1.0 it reconciles the same sample the
    # compare sees, so the phases agree on the population.
    quick_reconcile: bool = False


@dataclass
class ValidationResult:
    table: str
    structure: dict[str, Any]
    compare: cmp.CompareResult | None = None
    uniqueness: pd.DataFrame | None = None
    drift: pd.DataFrame | None = None
    rules: pd.DataFrame | None = None
    reconcile: pd.DataFrame | None = None
    summary: dict[str, Any] = field(default_factory=dict)


def validate_table_pair(src_path: str, snk_path: str,
                        cfg: ValidationConfig | None = None,
                        table: str | None = None,
                        columns: list[str] | None = None) -> ValidationResult:
    """Validate one table pair end-to-end from parquet paths.

    ``columns`` prunes the read (e.g. digest url+text only, skipping
    html blobs) — pass every compared column plus the keys.
    """
    cfg = cfg or ValidationConfig()
    t0 = time.time()
    src_meta = pqsrc.load_table_meta(src_path, table)
    snk_meta = pqsrc.load_table_meta(snk_path, table)
    table = table or src_meta.name
    result = ValidationResult(table=table,
                              structure=pqsrc.structure_check(src_meta, snk_meta))
    writer = ReportWriter(cfg.report_dir) if cfg.report_dir else None

    # structure mismatch fails fast, no data compare
    # (CheckTableStructureService.java:87-157)
    if result.structure["structureResult"] != "success":
        result.summary = {"table": table, "result": "failed",
                          "message": "table structure mismatch",
                          **result.structure}
        if writer:
            writer.structure_failed(result.summary)
        return result

    # key columns must exist (a typo'd --keys otherwise surfaces as a
    # raw worker traceback from deep inside the digest stage)
    src_cols = {f.name for f in src_meta.schema}
    missing = [k for k in cfg.key_columns if k not in src_cols]
    if missing:
        result.summary = {
            "table": table, "result": "failed",
            "message": f"key column(s) {missing} not in table "
                       f"(columns: {sorted(src_cols)})"}
        if writer:
            writer.structure_failed(result.summary)
        return result

    approx = max(src_meta.num_rows, snk_meta.num_rows)
    if cfg.sample_rate < 1.0:
        import pyarrow as pa

        kcol = cfg.key_columns[0]
        ktype = next(f.type for f in src_meta.schema if f.name == kcol)
        if len(cfg.key_columns) != 1 or not pa.types.is_integer(ktype):
            result.summary = {
                "table": table, "result": "failed",
                "message": "sample_rate requires a single integer key "
                           f"column, got {cfg.key_columns} "
                           f"({ktype})"}
            if writer:
                writer.structure_failed(result.summary)
            return result
        approx = max(1, int(approx * cfg.sample_rate))
    dcfg = DigestConfig.for_rows(cfg.key_columns, approx,
                                 compare_columns=cfg.compare_columns,
                                 partition_capacity=cfg.partition_capacity,
                                 bucket_capacity=cfg.bucket_capacity)

    read_cols = columns
    src = pqsrc.read_table(src_path, columns=read_cols)
    snk = pqsrc.read_table(snk_path, columns=read_cols)
    if cfg.sample_rate < 1.0:
        from ..stages import sampling

        src = sampling.stable_sample(src, cfg.key_columns[0],
                                     cfg.sample_rate)
        snk = sampling.stable_sample(snk, cfg.key_columns[0],
                                     cfg.sample_rate)

    # checkpointed signature computation (resume path)
    store = None
    if cfg.checkpoint_dir:
        from ..functions.hashing import DIGEST_VERSION

        lin_desc = f"{dcfg}|{read_cols}|{DIGEST_VERSION}"
        if cfg.sample_rate < 1.0:  # sampled runs get their own lineage
            lin_desc += f"|sr={cfg.sample_rate}"
        lin = lineage_id(src_meta.paths + snk_meta.paths, lin_desc)
        store = CheckpointStore(cfg.checkpoint_dir, lin)

    # Tagged digest materialization, reused by the signature pass, the
    # diff classify, and the uniqueness check. The two sides
    # materialize as two CONCURRENT driver-thread executions and union
    # afterwards (a union of materialized datasets is metadata-only;
    # materializing THROUGH a union serializes under backpressure at
    # low core counts — see stages/compare.partition_signatures_pair).
    import numpy as np
    import pyarrow as pa

    from ..functions.runtime import run_concurrently

    def tag(flag: bool):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, flag)))
        return fn

    def side_digests(ds, flag: bool):
        return digest_dataset(ds, dcfg, cfg.batch_size) \
            .map_batches(tag(flag), batch_format="pyarrow").materialize()

    _src_d, _snk_d = run_concurrently(lambda: side_digests(src, True),
                                      lambda: side_digests(snk, False))
    both_d = _src_d.union(_snk_d)

    # The uniqueness groupby and the drift profile are independent of
    # the signature/classify chain (they consume the materialized
    # digests / the raw files directly), so they run in background
    # driver threads OVERLAPPED with it — concurrent Ray Data
    # executions share the streaming executor's resource scheduler
    # (same pattern as the side-digest pair above). At bench scale the
    # serialized layout paid each phase's fixed execution cost end to
    # end; overlapping hides the shorter phases entirely.
    from concurrent.futures import ThreadPoolExecutor

    def _uniqueness_phase() -> pd.DataFrame:
        # one bucketed groupby over BOTH sides (side is part of the
        # grouping key), reusing the materialized digests
        dup = checks.uniqueness_violations(
            both_d.select_columns(["key", "side"]), ["key", "side"],
            approx_rows=src_meta.num_rows + snk_meta.num_rows)
        df = dup.to_pandas()
        if "side" in df.columns and len(df):
            df["side"] = np.where(df["side"], "source", "sink")
        else:
            df = pd.DataFrame(columns=["key", "side", "n"])
        return df[["key", "side", "n"]] if len(df) else df

    def _drift_phase() -> pd.DataFrame:
        cols = (list(cfg.drift_columns) if cfg.drift_columns
                else [f.name for f in src_meta.schema
                      if f.name not in cfg.key_columns
                      # binary payloads have no profilable distribution
                      # — skip so drift never lifts html blobs off disk
                      and not (pa.types.is_binary(f.type)
                               or pa.types.is_large_binary(f.type)
                               or pa.types.is_fixed_size_binary(f.type))])
        sp = prof.profile_dataset(
            pqsrc.read_table(src_path, columns=cols), cols)
        kp = prof.profile_dataset(
            pqsrc.read_table(snk_path, columns=cols), cols)
        return checks.drift_report(sp, kp)

    def _rules_phase() -> pd.DataFrame:
        # constraint verdicts over the source side's raw rows — reads
        # only the columns the rule set touches, overlapped with the
        # signature chain like the other phases
        from . import rules as rulesmod

        need = rulesmod.columns_needed(cfg.rules,
                                       cfg.rules_partition_col)
        return rulesmod.evaluate_rules(
            pqsrc.read_table(src_path, columns=need), cfg.rules,
            partition_col=cfg.rules_partition_col)

    def _reconcile_phase() -> pd.DataFrame:
        # aggregate quick-verify over its own pruned reads (the digest
        # datasets carry hashes, not values); under sampling it sees
        # the same key sample as the compare
        from . import reconcile as reconcilemod

        a = pqsrc.read_table(src_path, columns=read_cols)
        b = pqsrc.read_table(snk_path, columns=read_cols)
        if cfg.sample_rate < 1.0:
            from ..stages import sampling

            a = sampling.stable_sample(a, cfg.key_columns[0],
                                       cfg.sample_rate)
            b = sampling.stable_sample(b, cfg.key_columns[0],
                                       cfg.sample_rate)
        return reconcilemod.reconcile_aggregates(a, b)

    bg = ThreadPoolExecutor(max_workers=4)
    uniq_fut = (bg.submit(_uniqueness_phase) if cfg.check_uniqueness
                else None)
    drift_fut = bg.submit(_drift_phase) if cfg.check_drift else None
    rules_fut = bg.submit(_rules_phase) if cfg.rules else None
    recon_fut = (bg.submit(_reconcile_phase) if cfg.quick_reconcile
                 else None)

    src_sigs = store.load_signatures("source") if store else None
    snk_sigs = store.load_signatures("sink") if store else None
    if src_sigs is None or snk_sigs is None:
        partials = both_d.map_batches(
            cmp.make_signature_partials_by_side_fn(dcfg),
            batch_format="pyarrow")
        B = dcfg.buckets_per_partition
        if dcfg.num_partitions > cmp.DRIVER_SIGNATURE_MAX_PARTITIONS:
            # large-partition route: groupby reduce in workers; the
            # driver collects only the (part, rows, root, croot)
            # scalars for every (partition, side) — the dense
            # leaves/counts blobs stay in the object store and are
            # fetched in a second filtered pass SOLELY for differing
            # partitions (driver memory scales with the diff count,
            # not the partition count). Progress streams per arriving
            # PARTITION scalar row instead of per digest slice.
            reduced = partials.groupby(["part", "is_src"]).map_groups(
                cmp._reduce_partition_by_side(B),
                batch_format="pandas").materialize()
            frames = []
            rows_seen = 0
            for bt in reduced.select_columns(
                    ["part", "is_src", "rows", "root", "croot"]) \
                    .iter_batches(batch_size=None, batch_format="pandas"):
                frames.append(bt)
                # progress counts ONE side (SliceProgressService
                # semantics — summing both sides doubled rowCount)
                rows_seen += int(bt.loc[bt["is_src"], "rows"].sum())
                if writer:
                    writer.slice_progress(table, rows_seen, len(frames))
            roots = (pd.concat(frames, ignore_index=True) if frames
                     else pd.DataFrame(columns=["part", "is_src", "rows",
                                                "root", "croot"]))
            roots_s = roots[roots["is_src"]].drop(columns="is_src")
            roots_k = roots[~roots["is_src"]].drop(columns="is_src")
            dirty = cmp._dirty_parts(roots_s, roots_k)
            blobs = cmp._fetch_blobs(reduced, dirty, extra_cols=("is_src",))
            src_sigs = cmp._sparse_sig_frame(
                roots_s, blobs[blobs["is_src"]] if len(blobs) else blobs)
            snk_sigs = cmp._sparse_sig_frame(
                roots_k, blobs[~blobs["is_src"]] if len(blobs) else blobs)
        else:
            # stream the partials back block-by-block so progress.log
            # grows DURING the table (per-slice cadence,
            # SliceProgressService) — same bytes as to_pandas, plus one
            # record per arriving slice
            import pyarrow.compute as pc_

            frames = []
            rows_seen = 0
            for bt in partials.iter_batches(batch_size=None,
                                            batch_format="pyarrow"):
                frames.append(bt)
                # count ONE side only (advisor round-2: summing both
                # sides' cnt doubled rowCount/avgSpeed vs the
                # reference's SliceProgressService semantics)
                src_part = bt.filter(bt.column("is_src"))
                rows_seen += int(pc_.sum(src_part.column("cnt")).as_py()
                                 or 0)
                if writer:
                    writer.slice_progress(table, rows_seen, len(frames))
            ptab = pa.concat_tables(frames) if frames else None
            if ptab is not None and ptab.num_rows:
                mask = ptab.column("is_src")
                src_sigs = cmp._merge_signature_partials(
                    ptab.filter(mask), B)
                snk_sigs = cmp._merge_signature_partials(
                    ptab.filter(pc_.invert(mask)), B)
            else:
                src_sigs = snk_sigs = cmp.empty_sig_frame()
        if store:
            store.save_signatures("source", src_sigs,
                                  {"rows": src_meta.num_rows,
                                   "paths": src_meta.paths})
            store.save_signatures("sink", snk_sigs,
                                  {"rows": snk_meta.num_rows,
                                   "paths": snk_meta.paths})

    diffs = cmp.compare_signatures(src_sigs, snk_sigs, dcfg)
    est = cmp.estimate_diff_rows(src_sigs, snk_sigs, diffs,
                                 dcfg.buckets_per_partition)
    vio_ds = cmp.classify_differences_combined(both_d, diffs, dcfg,
                                               est_rows=est)
    violations = cmp.to_violation_frame(vio_ds)
    result.compare = cmp.build_verdicts(table, diffs, violations)

    if uniq_fut is not None:
        result.uniqueness = uniq_fut.result()
    if drift_fut is not None:
        result.drift = drift_fut.result()
    if rules_fut is not None:
        result.rules = rules_fut.result()
    if recon_fut is not None:
        result.reconcile = recon_fut.result()
    bg.shutdown()

    n_unique_viol = int(len(result.uniqueness)) if result.uniqueness is not None else 0
    n_drift = (int((result.drift["result"] == "failed").sum())
               if result.drift is not None and len(result.drift) else 0)
    n_rule_viol = (int(result.rules["n_violations"].sum())
                   if result.rules is not None else 0)
    n_rules_failed = (int((result.rules["passed"] == 0).sum())
                      if result.rules is not None else 0)
    n_recon_bad = (int((~result.reconcile["is_match"]).sum())
                   if result.reconcile is not None else 0)
    ok = (result.compare.ok and n_unique_viol == 0 and n_drift == 0
          and n_rules_failed == 0 and n_recon_bad == 0)
    result.summary = {
        **result.compare.summary,
        "uniquenessViolations": n_unique_viol,
        "driftColumns": n_drift,
        "result": "success" if ok else "failed",
        "cost": round(time.time() - t0, 3),
    }
    if result.rules is not None:
        result.summary["ruleViolations"] = n_rule_viol
        result.summary["rulesFailed"] = n_rules_failed
    if cfg.sample_rate < 1.0:
        result.summary["sampleRate"] = cfg.sample_rate
    if result.reconcile is not None:
        result.summary["reconcileMismatched"] = n_recon_bad
    if store:
        store.save_verdicts(result.compare.partitions)
    if writer:
        writer.table_result(result.summary)
        writer.progress(result.summary.get("rowCount", 0), 1, 1)
        writer.summary([result.summary])
        if cfg.emit_repair and len(violations):
            # J5 secondary lookup: re-fetch the source rows for the
            # violated keys, then render full INSERT/REPLACE/DELETE
            from ..state.report import (
                render_repair_sql_with_rows, write_repair_file,
            )
            from .incremental import filter_by_keys

            keys = sorted(set(violations["key"].astype(str)))
            src_rows = filter_by_keys(
                pqsrc.read_table(src_path, columns=read_cols),
                list(cfg.key_columns), keys).to_pandas()
            stmts = render_repair_sql_with_rows(
                table, list(cfg.key_columns), violations, src_rows,
                update_style=cfg.repair_update_style,
                batch_delete=cfg.repair_batch_delete)
            write_repair_file(writer.out_dir, table, stmts)
    return result


def validate_csv_pair(src_dir: str, snk_dir: str,
                      cfg: ValidationConfig | None = None,
                      table: str | None = None,
                      mark_done: bool = True) -> ValidationResult:
    """CSV verification mode (reference §3.2: pre-sharded CSV exports,
    ``CsvListener``/``CsvSliceProcessor``): the same digest + Merkle
    compare over two CSV shard directories, with column-set structure
    check up front and completion markers written per source shard on
    success (sidecar ``_DONE.*`` files — inputs stay immutable,
    ``sources.csvsrc.pending_shards`` drives resume)."""
    from ..sources import csvsrc

    cfg = cfg or ValidationConfig()
    table = table or os.path.basename(src_dir.rstrip("/"))
    t0 = time.time()
    src = csvsrc.read_csv_table(src_dir)
    snk = csvsrc.read_csv_table(snk_dir)
    result = ValidationResult(table=table, structure={})

    src_cols = {f.name.lower() for f in src.schema().base_schema}
    snk_cols = {f.name.lower() for f in snk.schema().base_schema}
    result.structure = {
        "table": table,
        "structureResult": "success" if src_cols == snk_cols else "failed",
        "onlyInSource": sorted(src_cols - snk_cols),
        "onlyInSink": sorted(snk_cols - src_cols),
    }
    if result.structure["structureResult"] != "success":
        result.summary = {"table": table, "result": "failed",
                          "message": "csv structure mismatch",
                          **result.structure}
        return result

    approx = src.count()  # CSV has no footer counts — one cheap scan
    dcfg = DigestConfig.for_rows(cfg.key_columns, approx,
                                 compare_columns=cfg.compare_columns,
                                 partition_capacity=cfg.partition_capacity,
                                 bucket_capacity=cfg.bucket_capacity)
    # "auto": classify from retained digests while the footprint fits
    # the budget; streaming re-scan beyond (round-3 verdict #6)
    result.compare = cmp.compare_tables(src, snk, dcfg, table=table,
                                        batch_size=cfg.batch_size,
                                        materialize_digests="auto",
                                        approx_rows=approx)
    result.summary = {**result.compare.summary,
                      "cost": round(time.time() - t0, 3)}
    v = result.compare.violations
    if cfg.report_dir and len(v):
        # failed_detail.log: locate each violation key's shard file +
        # row index so a CSV-export user can repair by hand (reference
        # SliceCheckResultManager.java:187-206). insert/update rows
        # exist at SOURCE; delete rows only at SINK.
        from ..state.report import ReportWriter

        frames = []
        src_keys = v.loc[v["kind"].isin(["insert", "update"]), "key"]
        if len(src_keys):
            loc = csvsrc.locate_keys_in_shards(
                src_dir, list(cfg.key_columns), src_keys.astype(str).tolist())
            frames.append(loc.merge(
                v[["key", "kind"]].astype({"key": str}), on="key"))
        snk_keys = v.loc[v["kind"] == "delete", "key"]
        if len(snk_keys):
            loc = csvsrc.locate_keys_in_shards(
                snk_dir, list(cfg.key_columns), snk_keys.astype(str).tolist())
            frames.append(loc.merge(
                v[["key", "kind"]].astype({"key": str}), on="key"))
        located = (pd.concat(frames, ignore_index=True) if frames
                   else pd.DataFrame(columns=["key", "fileName", "idx",
                                              "kind"]))
        ReportWriter(cfg.report_dir).csv_failed_details(table, located)
    if mark_done and result.compare.ok:
        for shard in csvsrc.pending_shards(src_dir):
            csvsrc.mark_shard_done(shard)
    return result


def validate_schema(src_dir: str, snk_dir: str,
                    key_columns: dict[str, tuple[str, ...]],
                    cfg: ValidationConfig | None = None,
                    rules: RuleConfig | None = None,
                    max_tables_in_flight: int = 3) -> dict:
    """Validate every table pair of two schema directories.

    The full-run choreography of SURVEY.md §3.1 collapsed to a driver
    loop: table list = union of subdirectories/files on both sides
    (after table rules M3); a table missing on one side gets a
    "table miss" failed verdict without a data compare
    (``SliceCheckEventHandler.java:198-216``); per-table progress goes
    through the status register (ST5) and the report writer (W2).
    ``key_columns`` maps table name -> PK columns (the catalog's
    primaryMetas analog; Parquet has no PK metadata).

    ``max_tables_in_flight`` overlaps that many tables' pipelines via
    driver threads (Ray executions from one driver interleave in the
    shared streaming executor) — the reference's inter-table
    parallelism knob ``maximum-topic-size`` (recommended 3,
    ``config/application-source.yml``; SURVEY.md §4). Set 1 for
    strictly serial.
    """
    import glob
    import os

    from ..sources.parquet import apply_table_rules
    from ..state.registry import (
        CHECKED, SINK_EXTRACTED, SOURCE_EXTRACTED, TableStatusRegister,
    )

    cfg = cfg or ValidationConfig()

    def tables_in(d: str) -> dict[str, str]:
        out = {}
        for p in sorted(glob.glob(os.path.join(d, "*"))):
            name = os.path.splitext(os.path.basename(p.rstrip("/")))[0]
            if p.endswith(".parquet") or os.path.isdir(p):
                out[name] = p
        return out

    src_tables = tables_in(src_dir)
    snk_tables = tables_in(snk_dir)
    names = sorted(set(src_tables) | set(snk_tables))
    if rules is not None:
        names = apply_table_rules(names, rules.table_white, rules.table_black)

    register = TableStatusRegister(names)
    writer = ReportWriter(cfg.report_dir) if cfg.report_dir else None
    results: dict[str, ValidationResult] = {}
    summaries_by_name: dict[str, dict] = {}
    runnable: list[str] = []
    for name in names:
        if name not in src_tables or name not in snk_tables:
            missing_side = "source" if name not in src_tables else "sink"
            summary = {"table": name, "result": "failed",
                       "message": f"table miss: absent on {missing_side}"}
            summaries_by_name[name] = summary
            if writer:
                writer.structure_failed(summary)
            continue
        runnable.append(name)

    def run_one(name: str) -> ValidationResult:
        try:
            return _run_one_inner(name)
        except Exception as ex:  # noqa: BLE001
            # One table's unexpected failure (corrupt parquet, a worker
            # exception surfacing through the digest stage) must not
            # abort the schema run: record a per-table failed verdict
            # and continue, like the reference's per-table error
            # handling (CheckService records failed and moves on).
            res = ValidationResult(table=name, structure={})
            res.summary = {"table": name, "result": "failed",
                           "message": f"{type(ex).__name__}: {ex}"}
            return res

    def _run_one_inner(name: str) -> ValidationResult:
        keys = key_columns.get(name) or key_columns.get("*", ("id",))
        tcfg = ValidationConfig(**{**cfg.__dict__, "key_columns": tuple(keys)})
        meta_cols = None
        if rules is not None and (rules.column_include or rules.column_exclude):
            from ..sources.parquet import load_table_meta

            schema_cols = [f.name for f in
                           load_table_meta(src_tables[name]).schema]
            cols = apply_column_rule(schema_cols, name, rules, tuple(keys))
            if cols != schema_cols:
                meta_cols = cols
                tcfg.compare_columns = tuple(cols)
        return validate_table_pair(src_tables[name], snk_tables[name], tcfg,
                                   table=name, columns=meta_cols)

    from concurrent.futures import ThreadPoolExecutor

    from ..functions.runtime import patch_ray_thread_import_race

    patch_ray_thread_import_race()
    workers = max(1, min(max_tables_in_flight, len(runnable) or 1))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for name, res in zip(runnable, pool.map(run_one, runnable)):
            register.update(name, SOURCE_EXTRACTED | SINK_EXTRACTED | CHECKED)
            results[name] = res
            summaries_by_name[name] = res.summary
            if writer:
                writer.progress(res.summary.get("rowCount", 0),
                                register.complete_count(), len(names))
    summaries = [summaries_by_name[n] for n in names if n in summaries_by_name]
    run_summary = (writer.summary(summaries) if writer else {
        "tableCount": len(summaries),
        "successCount": sum(1 for s in summaries
                            if s.get("result") == "success"),
        "failedCount": sum(1 for s in summaries
                           if s.get("result") != "success"),
    })
    return {"tables": results, "summaries": summaries,
            "summary": run_summary, "register": register}

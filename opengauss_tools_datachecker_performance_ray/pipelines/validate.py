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
class ValidationConfig:
    key_columns: tuple[str, ...] = ("url",)
    compare_columns: tuple[str, ...] | None = None
    partition_capacity: int = 1_000_000
    bucket_capacity: int = 256
    batch_size: int | None = 8192       # bounded for wide html rows
    check_uniqueness: bool = True
    check_drift: bool = True
    drift_columns: tuple[str, ...] | None = None
    report_dir: str | None = None
    checkpoint_dir: str | None = None
    emit_repair: bool = False


@dataclass
class ValidationResult:
    table: str
    structure: dict[str, Any]
    compare: cmp.CompareResult | None = None
    uniqueness: pd.DataFrame | None = None
    drift: pd.DataFrame | None = None
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

    approx = max(src_meta.num_rows, snk_meta.num_rows)
    dcfg = DigestConfig.for_rows(cfg.key_columns, approx,
                                 compare_columns=cfg.compare_columns,
                                 partition_capacity=cfg.partition_capacity,
                                 bucket_capacity=cfg.bucket_capacity)

    read_cols = columns
    src = pqsrc.read_table(src_path, columns=read_cols)
    snk = pqsrc.read_table(snk_path, columns=read_cols)

    # checkpointed signature computation (resume path)
    store = None
    if cfg.checkpoint_dir:
        lin = lineage_id(src_meta.paths + snk_meta.paths,
                         f"{dcfg}|{read_cols}")
        store = CheckpointStore(cfg.checkpoint_dir, lin)

    src_d = digest_dataset(src, dcfg, cfg.batch_size).materialize()
    snk_d = digest_dataset(snk, dcfg, cfg.batch_size).materialize()

    src_sigs = store.load_signatures("source") if store else None
    snk_sigs = store.load_signatures("sink") if store else None
    if src_sigs is None:
        src_sigs = cmp.partition_signatures(src_d, dcfg)
        if store:
            store.save_signatures("source", src_sigs,
                                  {"rows": src_meta.num_rows,
                                   "paths": src_meta.paths})
    if snk_sigs is None:
        snk_sigs = cmp.partition_signatures(snk_d, dcfg)
        if store:
            store.save_signatures("sink", snk_sigs,
                                  {"rows": snk_meta.num_rows,
                                   "paths": snk_meta.paths})

    diffs = cmp.compare_signatures(src_sigs, snk_sigs, dcfg)
    vio_ds = cmp.classify_differences(src_d, snk_d, diffs, dcfg)
    violations = (vio_ds.to_pandas() if vio_ds is not None
                  else cmp.EMPTY_VIOLATIONS.copy())
    if len(violations) == 0:
        violations = cmp.EMPTY_VIOLATIONS.copy()
    result.compare = cmp.build_verdicts(table, diffs, violations)

    if cfg.check_uniqueness:
        # reuse the materialized digests: uniqueness on the spliced key
        dup = checks.uniqueness_violations(
            src_d.select_columns(["key"]), ["key"])
        result.uniqueness = dup.to_pandas()
        dup_snk = checks.uniqueness_violations(
            snk_d.select_columns(["key"]), ["key"])
        snk_dups = dup_snk.to_pandas()
        snk_dups["side"] = "sink"
        result.uniqueness["side"] = "source"
        result.uniqueness = pd.concat([result.uniqueness, snk_dups],
                                      ignore_index=True)

    if cfg.check_drift:
        cols = (list(cfg.drift_columns) if cfg.drift_columns
                else [f.name for f in src_meta.schema
                      if f.name not in cfg.key_columns])
        sp = prof.profile_dataset(
            pqsrc.read_table(src_path, columns=cols), cols)
        kp = prof.profile_dataset(
            pqsrc.read_table(snk_path, columns=cols), cols)
        result.drift = checks.drift_report(sp, kp)

    n_unique_viol = int(len(result.uniqueness)) if result.uniqueness is not None else 0
    n_drift = (int((result.drift["result"] == "failed").sum())
               if result.drift is not None and len(result.drift) else 0)
    ok = (result.compare.ok and n_unique_viol == 0 and n_drift == 0)
    result.summary = {
        **result.compare.summary,
        "uniquenessViolations": n_unique_viol,
        "driftColumns": n_drift,
        "result": "success" if ok else "failed",
        "cost": round(time.time() - t0, 3),
    }
    if store:
        store.save_verdicts(result.compare.partitions)
    if writer:
        writer.table_result(result.summary)
        writer.progress(result.summary.get("rowCount", 0), 1, 1)
        writer.summary([result.summary])
        if cfg.emit_repair and len(violations):
            from ..state.report import render_repair_sql, write_repair_file
            stmts = render_repair_sql(table, cfg.key_columns[0], violations)
            write_repair_file(writer.out_dir, table, stmts)
    return result

"""CLI entry point — the `ray job submit` target.

Replaces the reference's REST/Feign control surface
(``check/controller/*.java``, start/progress/clean endpoints) with a
single batch command:

    ray job submit -- python -m opengauss_tools_datachecker_performance_ray \
        validate --source s3://.../pages_source --sink s3://.../pages_sink \
        --keys url --report-dir /out/reports --checkpoint-dir /out/ckpt

    python -m opengauss_tools_datachecker_performance_ray schema \
        --source src_dir --sink snk_dir --keys pages=url,links=src_url

This module owns the Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _parse_keys(spec: str) -> dict[str, tuple[str, ...]]:
    """'pages=url,lineitem=l_orderkey+l_linenumber' -> dict."""
    out: dict[str, tuple[str, ...]] = {}
    for part in spec.split(","):
        if not part:
            continue
        if "=" in part:
            table, cols = part.split("=", 1)
            out[table] = tuple(cols.split("+"))
        else:
            out["*"] = tuple(part.split("+"))
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="opengauss_tools_datachecker_performance_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="validate one table pair")
    v.add_argument("--source", required=True)
    v.add_argument("--sink", required=True)
    v.add_argument("--keys", default="url",
                   help="key columns, '+'-joined for composite")
    v.add_argument("--table", default=None)
    v.add_argument("--report-dir", default=None)
    v.add_argument("--checkpoint-dir", default=None)
    v.add_argument("--no-uniqueness", action="store_true")
    v.add_argument("--no-drift", action="store_true")
    v.add_argument("--format", choices=("parquet", "csv"),
                   default="parquet",
                   help="csv = the reference's CSV verification mode "
                        "(sharded exports + completion markers)")
    v.add_argument("--emit-repair", action="store_true")
    v.add_argument("--repair-update-style", choices=("replace", "update"),
                   default="replace",
                   help="update-kind repair: REPLACE VALUES or "
                        "column-wise UPDATE ... SET")
    v.add_argument("--repair-batch-delete", action="store_true",
                   help="batch delete-kind repairs into "
                        "DELETE ... WHERE pk IN (...) lists")
    v.add_argument("--rules-spec", default=None,
                   help="JSON rule-spec file (same format as the "
                        "`rules` subcommand) evaluated against the "
                        "SOURCE side as part of the validation run")
    v.add_argument("--sample-rate", type=float, default=1.0,
                   help="< 1.0 = sampled pre-check: digest compare + "
                        "uniqueness over a deterministic Knuth-hash "
                        "key sample of both sides (single integer key "
                        "required); drift/rules still see full data")
    v.add_argument("--quick-reconcile", action="store_true",
                   help="also run the aggregate quick-verify "
                        "(per-column count/nulls/sum/min/max both "
                        "sides) as an overlapped phase; any mismatch "
                        "fails the run")
    v.add_argument("--num-cpus", type=int, default=None)

    rec = sub.add_parser(
        "reconcile",
        help="aggregate quick-verify of a table pair: per-column "
             "count/nulls/sum/min/max on both sides, diffed — one "
             "streaming scan per side, no shuffle")
    rec.add_argument("--source", required=True)
    rec.add_argument("--sink", required=True)
    rec.add_argument("--report-out", default=None,
                     help="write the (col, metric, src_val, snk_val, "
                          "is_match) verdict table as parquet here")
    rec.add_argument("--columns", default=None,
                     help="comma list of columns to reconcile "
                          "(prunes the reads; default: all columns)")
    rec.add_argument("--group-col", default=None,
                     help="per-group variant: reconcile per value of "
                          "this column (requires --column)")
    rec.add_argument("--column", default=None,
                     help="integer column whose per-group "
                          "sum/min/max/nulls are reconciled (with "
                          "--group-col)")
    rec.add_argument("--num-cpus", type=int, default=None)

    i = sub.add_parser(
        "increment",
        help="incremental CDC re-check from a Debezium change-log dump")
    i.add_argument("--source", required=True)
    i.add_argument("--sink", required=True)
    i.add_argument("--change-log", required=True,
                   help="file of Debezium JSON change events, one per "
                        "line — or, with --stream, a DIRECTORY to tail")
    i.add_argument("--stream", action="store_true",
                   help="tail --change-log as a live directory "
                        "(DebeziumWorker poll-loop analog): new files "
                        "and appended lines keep feeding windows until "
                        "--idle-polls empty polls")
    i.add_argument("--poll-interval", type=float, default=1.0,
                   help="seconds between stream polls")
    i.add_argument("--idle-polls", type=int, default=30,
                   help="stop streaming after this many consecutive "
                        "empty polls")
    i.add_argument("--table", required=True,
                   help="table name as it appears in the change events")
    i.add_argument("--keys", default="id",
                   help="key columns, '+'-joined for composite")
    i.add_argument("--count-period", type=int, default=1000,
                   help="flush window at this many changed keys")
    i.add_argument("--max-diff-count", type=int, default=5000)
    i.add_argument("--no-secondary", action="store_true",
                   help="skip the two-phase re-check")
    i.add_argument("--num-cpus", type=int, default=None)

    c = sub.add_parser(
        "curate",
        help="corpus curation: stable sample -> line-level exact dedup "
             "-> resumable lang-partitioned parquet")
    c.add_argument("--input", required=True,
                   help="parquet file or directory (doc_id, text, lang)")
    c.add_argument("--out", required=True, help="output directory")
    c.add_argument("--sample-rate", type=float, default=1.0,
                   help="stable key-hash sample rate (default keep all; "
                        "requires a non-negative INTEGER --id-col — use "
                        "an integer surrogate key for url-keyed tables)")
    c.add_argument("--tokens-per-line", type=int, default=None,
                   help="fixed token-window lines (default: split on \\n)")
    c.add_argument("--id-col", default="doc_id")
    c.add_argument("--text-col", default="text")
    c.add_argument("--gopher-filter", action="store_true",
                   help="apply the integer-exact Gopher quality rules "
                        "(word count, mean word length, distinct "
                        "fraction, stopword floor) before dedup")
    c.add_argument("--max-span-dup-ratio", type=float, default=None,
                   help="drop docs whose duplicated-5-gram fraction "
                        "strictly exceeds this (e.g. 0.25) before "
                        "line dedup")
    c.add_argument("--redact", default=None,
                   help="comma list of PII presets (email,ipv4,phone) "
                        "or 'all', applied to the text column after "
                        "dedup")
    c.add_argument("--mix", default=None,
                   help="stratified per-group keep rates applied "
                        "before dedup, e.g. 'en=0.05,zh=0.5' over "
                        "--mix-col (Knuth-stable, nested strata; "
                        "requires an integer --id-col)")
    c.add_argument("--mix-col", default="lang")
    c.add_argument("--mix-default", type=float, default=1.0,
                   help="keep rate for groups not listed in --mix")
    c.add_argument("--chunk-window", type=int, default=None,
                   help="emit sliding token windows of this size as "
                        "the final rows (long-context prep)")
    c.add_argument("--chunk-stride", type=int, default=None,
                   help="window advance (default: no overlap)")
    c.add_argument("--partition-col", default="lang")
    c.add_argument("--num-cpus", type=int, default=None)

    r = sub.add_parser(
        "rules",
        help="declarative constraint-rule validation of one table "
             "(not_null/in_set/range/regex/unique/foreign_key from a "
             "JSON spec; per-partition verdicts + violation rows)")
    r.add_argument("--input", required=True,
                   help="parquet file or directory")
    r.add_argument("--spec", required=True,
                   help='JSON file: {"partition_col": ..., "rules": '
                        '[{"kind": "range", "column": "x", "lo": 0}, '
                        "...]}")
    r.add_argument("--partition-col", default=None,
                   help="override the spec's partition_col")
    r.add_argument("--report-out", default=None,
                   help="write the verdict report as parquet here")
    r.add_argument("--violations-out", default=None,
                   help="write violation rows per failing row-local "
                        "rule under this directory")
    r.add_argument("--violation-columns", default=None,
                   help="comma list of evidence columns (default: the "
                        "rule's own column)")
    r.add_argument("--violations-cap", type=int, default=10000,
                   help="max violation rows written per rule")
    r.add_argument("--num-cpus", type=int, default=None)

    pr = sub.add_parser(
        "profile",
        help="metadata-only schema profile (footers: columns, "
             "DuckDB-vocabulary types, exact row counts — zero data "
             "read) with an optional null-pattern co-occurrence scan")
    pr.add_argument("--input", required=True,
                    help="parquet file/dir, or comma list of "
                         "name=path entries for a multi-table catalog")
    pr.add_argument("--schema-out", default=None,
                    help="write the per-column schema rows as parquet")
    pr.add_argument("--null-patterns", default=None,
                    help="comma list of columns: also run the "
                         "missingness co-occurrence scan (reads ONLY "
                         "those columns) and print its rows")
    pr.add_argument("--formats", default=None,
                    help="comma list of string columns: also run the "
                         "format-inference profile (first-match "
                         "format classes per column) and print its "
                         "rows")
    pr.add_argument("--sketch-out", default=None,
                    help="write a statistical (sketch) manifest of "
                         "the table: merged HLL/t-digest/top-k "
                         "profiles, ~100 KB per column at any scale")
    pr.add_argument("--drift-against", default=None,
                    help="drift-test the table against a stored "
                         "sketch manifest (exit 1 on drift)")
    pr.add_argument("--columns", default=None,
                    help="comma list restricting --sketch-out "
                         "profiling (default: all columns; REQUIRED "
                         "with --group-col)")
    pr.add_argument("--group-col", default=None,
                    help="with --sketch-out: write PER-GROUP sketch "
                         "profiles (per-partition temporal drift); "
                         "--drift-against auto-detects grouped "
                         "manifests")
    pr.add_argument("--outliers", default=None,
                    help="'group_col:value_col[:k]': per-group "
                         "Tukey-fence outlier audit (exact q1/q3, "
                         "fences q1-k*IQR / q3+k*IQR, default k=1.5)")
    pr.add_argument("--num-cpus", type=int, default=None)

    fp = sub.add_parser(
        "fingerprint",
        help="write a portable digest manifest of one table "
             "(per-partition Merkle signatures -> parquet; verify any "
             "later copy with verify-manifest, no live source needed)")
    fp.add_argument("--input", required=True,
                    help="parquet file or directory")
    fp.add_argument("--keys", required=True,
                    help="key column (col1+col2 composite); with "
                         "--schema: table=col[+col],... ('*' entry = "
                         "default for unlisted tables)")
    fp.add_argument("--out", required=True, help="manifest directory")
    fp.add_argument("--table", default=None)
    fp.add_argument("--schema", action="store_true",
                    help="treat --input as a schema DIRECTORY: one "
                         "manifest per contained table")
    fp.add_argument("--column-level", default=None,
                    help="comma list of compare columns: write a "
                         "COLUMN-granular manifest instead (verify "
                         "reports WHICH column changed per partition)")
    fp.add_argument("--num-cpus", type=int, default=None)

    vm = sub.add_parser(
        "verify-manifest",
        help="verify a table against a fingerprint manifest "
             "(exit 0 clean / 1 dirty)")
    vm.add_argument("--input", required=True)
    vm.add_argument("--manifest", required=True,
                    help="directory written by fingerprint")
    vm.add_argument("--verdicts-out", default=None,
                    help="write dirty-partition rows as parquet here")
    vm.add_argument("--schema", action="store_true",
                    help="verify every table of the --input schema "
                         "directory against the per-table manifests")
    vm.add_argument("--num-cpus", type=int, default=None)

    dm = sub.add_parser(
        "diff-manifests",
        help="diff two fingerprint manifests of the same table — no "
             "data read at all (exit 0 identical / 1 differing)")
    dm.add_argument("--a", required=True, help="first manifest dir")
    dm.add_argument("--b", required=True, help="second manifest dir")
    dm.add_argument("--verdicts-out", default=None)
    dm.add_argument("--num-cpus", type=int, default=None)

    s = sub.add_parser("schema", help="validate a schema of table pairs")
    s.add_argument("--source", required=True)
    s.add_argument("--sink", required=True)
    s.add_argument("--keys", required=True,
                   help="table=col[+col],table2=col (or 'col' for all)")
    s.add_argument("--report-dir", default=None)
    s.add_argument("--table-white", default=None, help="regex list, ','-joined")
    s.add_argument("--table-black", default=None)
    s.add_argument("--tables-in-flight", type=int, default=3,
                   help="tables validated concurrently "
                        "(maximum-topic-size analog)")
    s.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    import ray

    owns_session = False
    if not ray.is_initialized():  # under `ray job submit` it may be
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True,
                  "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
        owns_session = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        return _run(args)
    except (FileNotFoundError, OSError) as ex:
        print(json.dumps({"result": "error", "error": str(ex)}),
              file=sys.stderr)
        return 2
    finally:
        # only tear down a session this process created — an
        # already-initialised session (driver, pytest fixture) is the
        # caller's to manage
        if owns_session:
            ray.shutdown()


def _run(args) -> int:
    from .pipelines.validate import (
        RuleConfig, ValidationConfig, validate_schema, validate_table_pair,
    )

    if args.cmd == "validate":
        vrules = vrules_part = None
        if args.rules_spec:
            import ray.data as rd

            from .pipelines import rules as R

            if args.format == "csv":
                # the rules phase reads the source parquet; wiring it
                # through the CSV shard reader is future work — fail
                # loudly instead of silently skipping declared rules
                print(json.dumps({
                    "result": "error",
                    "error": "--rules-spec is not supported with "
                             "--format csv"}), file=sys.stderr)
                return 2
            try:
                with open(args.rules_spec) as f:
                    spec = json.load(f)
                vrules = R.rules_from_spec(spec["rules"],
                                           rd.read_parquet)
            except (KeyError, ValueError, TypeError, OSError) as ex:
                print(json.dumps({"result": "error",
                                  "error": f"bad rule spec: {ex!r}"}),
                      file=sys.stderr)
                return 2
            vrules_part = spec.get("partition_col")
        if args.sample_rate < 1.0 and args.format == "csv":
            # the CSV shard reader has no sampled path — fail loudly
            # instead of silently validating everything
            print(json.dumps({
                "result": "error",
                "error": "--sample-rate is not supported with "
                         "--format csv"}), file=sys.stderr)
            return 2
        if args.quick_reconcile and args.format == "csv":
            # validate_csv_pair has no reconcile phase — fail loudly
            # instead of silently skipping a declared check
            print(json.dumps({
                "result": "error",
                "error": "--quick-reconcile is not supported with "
                         "--format csv"}), file=sys.stderr)
            return 2
        if not 0.0 < args.sample_rate <= 1.0:
            print(json.dumps({
                "result": "error",
                "error": f"--sample-rate must be in (0, 1], got "
                         f"{args.sample_rate}"}), file=sys.stderr)
            return 2
        cfg = ValidationConfig(
            key_columns=tuple(args.keys.split("+")),
            check_uniqueness=not args.no_uniqueness,
            check_drift=not args.no_drift,
            report_dir=args.report_dir,
            checkpoint_dir=args.checkpoint_dir,
            emit_repair=args.emit_repair,
            repair_update_style=args.repair_update_style,
            repair_batch_delete=args.repair_batch_delete,
            rules=vrules, rules_partition_col=vrules_part,
            sample_rate=args.sample_rate,
            quick_reconcile=args.quick_reconcile)
        if args.format == "csv":
            from .pipelines.validate import validate_csv_pair

            res = validate_csv_pair(args.source, args.sink, cfg,
                                    table=args.table)
        else:
            res = validate_table_pair(args.source, args.sink, cfg,
                                      table=args.table)
        print(json.dumps(res.summary, default=str))
        return 0 if res.summary.get("result") == "success" else 1
    if args.cmd == "reconcile":
        import ray.data as rd

        from .pipelines.reconcile import (
            reconcile_aggregates, reconcile_aggregates_by_group,
        )

        if bool(args.group_col) != bool(args.column):
            print(json.dumps({
                "result": "error",
                "error": "--group-col and --column go together"}),
                file=sys.stderr)
            return 2
        cols = args.columns.split(",") if args.columns else None
        if args.group_col:
            # the per-group reads need exactly these two columns
            gcols = [args.group_col, args.column]
            df = reconcile_aggregates_by_group(
                rd.read_parquet(args.source, columns=gcols),
                rd.read_parquet(args.sink, columns=gcols),
                args.group_col, args.column)
            df = df.rename(columns={"grp": "col"})  # shared report shape
        else:
            df = reconcile_aggregates(
                rd.read_parquet(args.source, columns=cols),
                rd.read_parquet(args.sink, columns=cols))
        bad = df[~df["is_match"]]
        if args.report_out:
            import pyarrow as pa
            import pyarrow.parquet as pq

            pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                           args.report_out)
        print(json.dumps({
            "result": "success" if bad.empty else "failed",
            "metrics": int(len(df)),
            "mismatched": int(len(bad)),
            "mismatchedColumns": sorted(set(bad["col"]))}))
        return 0 if bad.empty else 1
    if args.cmd == "increment":
        import ray.data as rd

        from .pipelines.incremental import (
            IncrementConfig, incremental_from_change_log,
            incremental_stream,
        )

        icfg = IncrementConfig(count_period=args.count_period,
                               max_diff_count=args.max_diff_count,
                               secondary_recheck=not args.no_secondary)
        if args.stream:
            from .sources.debezium import ChangeLogTailer

            if not os.path.isdir(args.change_log):
                # a file (or typo) would glob to zero events and report
                # a vacuous success after idle polls (review finding)
                print(json.dumps({
                    "result": "failed",
                    "message": f"--stream requires --change-log to be a "
                               f"directory to tail, got "
                               f"{args.change_log!r}"}))
                return 2
            tailer = ChangeLogTailer(
                args.change_log,
                {args.table: list(args.keys.split("+"))})
            results = list(incremental_stream(
                lambda: rd.read_parquet(args.source),
                lambda: rd.read_parquet(args.sink),
                list(args.keys.split("+")), tailer, table=args.table,
                cfg=icfg, poll_interval_s=args.poll_interval,
                max_idle_polls=args.idle_polls))
        else:
            results = incremental_from_change_log(
                lambda: rd.read_parquet(args.source),
                lambda: rd.read_parquet(args.sink),
                list(args.keys.split("+")), args.change_log,
                table=args.table, cfg=icfg)
        ok = all(r.result == "success" for r in results)
        print(json.dumps({
            "result": "success" if ok else "failed",
            "windows": len(results),
            "checkedKeys": sum(r.checked_keys for r in results),
            "diffKeys": sorted({k for r in results
                                for k in r.violations["key"].astype(str)}),
        }, default=str))
        return 0 if ok else 1
    if args.cmd == "curate":
        import ray.data as rd

        from .stages.dedup import line_dedup
        from .stages.sampling import stable_sample
        from .state.sinks import write_partitioned

        import pyarrow as pa

        ds = rd.read_parquet(args.input)
        if args.sample_rate < 1.0 or args.mix:
            which = "--sample-rate" if args.sample_rate < 1.0 else "--mix"
            sch = ds.schema()
            id_type = dict(zip(sch.names, sch.types)).get(args.id_col)
            if not (isinstance(id_type, pa.DataType)
                    and pa.types.is_integer(id_type)):
                print(json.dumps({
                    "result": "error",
                    "error": f"{which} requires an integer "
                             f"--id-col; {args.id_col!r} is "
                             f"{id_type} — add an integer surrogate "
                             f"key first"}), file=sys.stderr)
                return 2
        if args.sample_rate < 1.0:
            ds = stable_sample(ds, args.id_col, args.sample_rate)
        if args.mix:
            from .stages.sampling import stratified_sample

            try:
                rates = {g: float(r) for g, r in
                         (part.split("=", 1)
                          for part in args.mix.split(",") if part)}
            except ValueError:
                print(json.dumps({
                    "result": "error",
                    "error": f"bad --mix {args.mix!r}; expected "
                             f"'group=rate,group=rate'"}),
                    file=sys.stderr)
                return 2
            sch = ds.schema()
            mix_type = dict(zip(sch.names, sch.types)).get(args.mix_col)
            if isinstance(mix_type, pa.DataType) \
                    and pa.types.is_integer(mix_type):
                try:
                    rates = {int(g): r for g, r in rates.items()}
                except ValueError:
                    print(json.dumps({
                        "result": "error",
                        "error": f"--mix-col {args.mix_col!r} is "
                                 f"{mix_type}; --mix groups must be "
                                 f"integers"}), file=sys.stderr)
                    return 2
            ds = stratified_sample(ds, args.id_col, args.mix_col,
                                   rates, args.mix_default)
        if args.gopher_filter:
            from .pipelines.queries import _gopher_keep_batch

            ds = ds.map_batches(
                lambda b, _c=args.text_col: _gopher_keep_batch(b, _c),
                batch_format="pyarrow")
        if args.max_span_dup_ratio is not None:
            from .stages.dedup import span_contamination_filter

            ds = span_contamination_filter(
                ds, args.id_col, args.text_col,
                max_dup_ratio=args.max_span_dup_ratio)
        carry = [args.partition_col] \
            if args.partition_col in ds.schema().names else []
        rebuilt = line_dedup(ds, args.id_col, args.text_col,
                             tokens_per_line=args.tokens_per_line,
                             carry_cols=carry or None)
        if args.redact:
            from .functions import textfn

            names = list(textfn.PII_PATTERNS) if args.redact == "all" \
                else args.redact.split(",")
            try:
                pats = [textfn.PII_PATTERNS[n] for n in names]
            except KeyError as exc:
                print(json.dumps({
                    "result": "error",
                    "error": f"unknown --redact preset {exc.args[0]!r}; "
                             f"known: {sorted(textfn.PII_PATTERNS)}"}),
                    file=sys.stderr)
                return 2

            def apply_redact(batch: pa.Table) -> pa.Table:
                t = batch.column(args.text_col).to_pandas()
                rt = textfn.redact(t, pats)
                idx = batch.schema.get_field_index(args.text_col)
                return batch.set_column(
                    idx, args.text_col,
                    pa.array(rt.to_numpy(dtype=object),
                             type=batch.column(args.text_col).type))

            rebuilt = rebuilt.map_batches(apply_redact,
                                          batch_format="pyarrow")
        if args.chunk_window is not None or args.chunk_stride is not None:
            from .stages.chunking import window_chunks

            w, st = args.chunk_window, args.chunk_stride
            if w is None or w <= 0 or (st is not None
                                       and not 0 < st <= w):
                print(json.dumps({
                    "result": "error",
                    "error": f"--chunk-window must be positive and "
                             f"--chunk-stride in [1, window]; got "
                             f"window={w} stride={st}"}),
                    file=sys.stderr)
                return 2
            rebuilt = window_chunks(rebuilt, args.id_col,
                                    args.text_col, w, st,
                                    carry_cols=carry or None)
        if carry:
            res = write_partitioned(rebuilt.materialize(), args.out,
                                    args.partition_col)
        else:
            os.makedirs(args.out, exist_ok=True)
            rebuilt.write_parquet(args.out)
            res = {"written": ["*"], "skipped": []}
        print(json.dumps({"result": "success", **res}, default=str))
        return 0
    if args.cmd == "fingerprint":
        from .sources.parquet import load_table_meta, read_table
        from .stages import manifest as M
        from .stages.digest import DigestConfig

        if args.schema:
            res = M.write_schema_manifests(
                args.input, _parse_keys(args.keys), args.out)
            print(json.dumps(res))
            return 0 if res["result"] == "success" else 1
        meta = load_table_meta(args.input)
        keys = tuple(args.keys.split("+"))
        cfg = DigestConfig.for_rows(keys, meta.num_rows)
        if args.column_level:
            out = M.write_column_manifest(
                read_table(args.input), cfg, args.out,
                compare_cols=args.column_level.split(","),
                table=args.table or meta.name)
        else:
            out = M.write_manifest(
                read_table(args.input), cfg, args.out,
                table=args.table or meta.name)
        print(json.dumps({"result": "success", **out}))
        return 0
    if args.cmd == "verify-manifest":
        from .sources.parquet import read_table
        from .stages import manifest as M

        if args.schema:
            res = M.verify_schema_manifests(args.input, args.manifest)
            print(json.dumps(res))
            return 0 if res["result"] == "success" else 1
        if os.path.exists(os.path.join(args.manifest,
                                       "column_manifest.json")):
            res = M.verify_columns_against_manifest(
                read_table(args.input), args.manifest)
        else:
            res = M.verify_against_manifest(read_table(args.input),
                                            args.manifest)
        verdicts = res.pop("verdicts")
        if args.verdicts_out:
            os.makedirs(os.path.dirname(args.verdicts_out) or ".",
                        exist_ok=True)
            verdicts.to_parquet(args.verdicts_out, index=False)
        print(json.dumps(res))
        return 0 if res["result"] == "success" else 1
    if args.cmd == "diff-manifests":
        from .stages import manifest as M

        res = M.diff_manifests(args.a, args.b)
        verdicts = res.pop("verdicts")
        if args.verdicts_out:
            os.makedirs(os.path.dirname(args.verdicts_out) or ".",
                        exist_ok=True)
            verdicts.to_parquet(args.verdicts_out, index=False)
        print(json.dumps(res))
        return 0 if res["result"] == "success" else 1
    if args.cmd == "profile":
        from .sources.parquet import schema_profile

        if "=" in args.input:
            tables = dict(part.split("=", 1)
                          for part in args.input.split(",") if part)
        else:
            base = os.path.basename(args.input.rstrip("/"))
            tables = {os.path.splitext(base)[0]: args.input}
        prof = schema_profile(tables)
        if args.schema_out:
            os.makedirs(os.path.dirname(args.schema_out) or ".",
                        exist_ok=True)
            prof.to_parquet(args.schema_out, index=False)
        summary = {
            "result": "success",
            "tables": len(tables),
            "columns": len(prof),
            "total_rows": int(prof.groupby("table_name")["n_rows"]
                              .first().sum()),
        }
        if args.sketch_out or args.drift_against:
            import ray.data as rd

            from .stages import manifest as M

            if len(tables) != 1:
                print(json.dumps({"result": "error",
                                  "error": "--sketch-out/--drift-"
                                           "against need a single-"
                                           "table --input"}),
                      file=sys.stderr)
                return 2
            (path,) = tables.values()
            (name,) = tables.keys()
            if args.sketch_out:
                cols = (args.columns.split(",") if args.columns
                        else None)
                if args.group_col:
                    if not cols:
                        print(json.dumps(
                            {"result": "error",
                             "error": "--group-col needs --columns"}),
                            file=sys.stderr)
                        return 2
                    pm = M.write_grouped_profile_manifest(
                        rd.read_parquet(path,
                                        columns=[args.group_col]
                                        + cols),
                        args.group_col, cols, args.sketch_out,
                        table=name)
                    summary["sketch_groups"] = pm["n_groups"]
                else:
                    pm = M.write_profile_manifest(
                        rd.read_parquet(path, columns=cols),
                        args.sketch_out, columns=cols, table=name)
                    summary["sketch_columns"] = pm["columns"]
            if args.drift_against:
                # the tiny JSON carries the layout flag — unpickling
                # the sketch blob here would deserialize it twice
                # (review finding)
                with open(os.path.join(args.drift_against,
                                       "profile.json")) as f:
                    grouped = "group_col" in json.load(f)
                if grouped:
                    rep = M.drift_vs_grouped_manifest(
                        rd.read_parquet(path), args.drift_against)
                else:
                    rep = M.drift_vs_profile_manifest(
                        rd.read_parquet(path), args.drift_against)
                # NaN (stat not applicable to the column class) is
                # not valid strict JSON — surface as null
                summary["drift"] = json.loads(
                    rep.to_json(orient="records"))
                if (rep["result"] == "failed").any():
                    summary["result"] = "drifted"
                    print(json.dumps(summary, default=str))
                    return 1
        if args.outliers:
            import ray.data as rd

            from .pipelines.checks import iqr_outlier_counts

            if len(tables) != 1:
                print(json.dumps({"result": "error",
                                  "error": "--outliers needs a "
                                           "single-table --input"}),
                      file=sys.stderr)
                return 2
            parts = args.outliers.split(":")
            if len(parts) not in (2, 3):
                print(json.dumps({"result": "error",
                                  "error": "--outliers wants "
                                           "group_col:value_col[:k]"}),
                      file=sys.stderr)
                return 2
            gcol, vcol = parts[0], parts[1]
            k = float(parts[2]) if len(parts) == 3 else 1.5
            (path,) = tables.values()
            out = iqr_outlier_counts(
                rd.read_parquet(path, columns=[gcol, vcol]),
                gcol, vcol, k=k)
            summary["outliers"] = json.loads(
                out.to_json(orient="records"))
        if args.null_patterns or args.formats:
            import ray.data as rd

            from .pipelines.checks import (
                format_profile,
                null_pattern_profile,
            )

            if len(tables) != 1:
                print(json.dumps({"result": "error",
                                  "error": "--null-patterns/--formats "
                                           "need a single-table "
                                           "--input"}),
                      file=sys.stderr)
                return 2
            (path,) = tables.values()
            if args.null_patterns:
                cols = args.null_patterns.split(",")
                pats = null_pattern_profile(
                    rd.read_parquet(path, columns=cols),
                    cols).to_pandas()
                summary["null_patterns"] = pats.to_dict("records")
            if args.formats:
                cols = args.formats.split(",")
                fmts = format_profile(
                    rd.read_parquet(path, columns=cols), cols)
                summary["formats"] = fmts.to_dict("records")
        print(json.dumps(summary, default=str))
        return 0
    if args.cmd == "rules":
        import re

        import ray.data as rd

        from .pipelines import rules as R

        try:
            with open(args.spec) as f:
                spec = json.load(f)
            ruleset = R.rules_from_spec(spec["rules"], rd.read_parquet)
        except (KeyError, ValueError, TypeError, OSError) as ex:
            print(json.dumps({"result": "error",
                              "error": f"bad rule spec: {ex!r}"}),
                  file=sys.stderr)
            return 2
        part_col = args.partition_col or spec.get("partition_col")
        ev_cols = (args.violation_columns.split(",")
                   if args.violation_columns else None)
        # the read projection must also carry the evidence columns the
        # violation pass will select later
        cols = sorted(set(R.columns_needed(ruleset, part_col))
                      | set(ev_cols or []))
        ds = rd.read_parquet(args.input, columns=cols)
        rep = R.evaluate_rules(ds, ruleset, partition_col=part_col)
        if args.report_out:
            os.makedirs(os.path.dirname(args.report_out) or ".",
                        exist_ok=True)
            rep.to_parquet(args.report_out, index=False)
        failing = sorted(set(rep.loc[rep["passed"] == 0, "rule_id"]))
        if args.violations_out:
            for rule, rid in zip(ruleset, R.rule_ids(ruleset)):
                # shared source of truth so new rule kinds keep
                # exporting evidence: row-local kinds stream the
                # violating rows; cross-row kinds stream their
                # natural evidence (dup keys / FD groups / regressing
                # keys / dangling FKs). Aggregate kinds have no row
                # evidence — the per-scope verdict in the report IS
                # the evidence — so they are skipped here.
                if rule.kind in R._AGGREGATE or rid not in failing:
                    continue
                want = ev_cols or [rule.column]
                out_dir = os.path.join(
                    args.violations_out,
                    re.sub(r"[^A-Za-z0-9_.,-]", "_", rid))
                os.makedirs(out_dir, exist_ok=True)
                R.rule_violation_rows(ds, rule, want,
                                      partition_col=part_col) \
                    .limit(args.violations_cap).write_parquet(out_dir)
        ok = bool((rep["passed"] == 1).all())
        print(json.dumps({
            "result": "success" if ok else "failed",
            "rules": len(ruleset),
            "verdicts": len(rep),
            "failed_rules": failing,
            "total_violations": int(rep["n_violations"].sum()),
        }))
        return 0 if ok else 1
    keys = _parse_keys(args.keys)
    rules = None
    if args.table_white or args.table_black:
        rules = RuleConfig(
            table_white=args.table_white.split(",") if args.table_white
            else None,
            table_black=args.table_black.split(",") if args.table_black
            else None)
    out = validate_schema(
        args.source, args.sink,
        key_columns=keys,  # "*" entry = default for unlisted tables
        cfg=ValidationConfig(report_dir=args.report_dir),
        rules=rules,
        max_tables_in_flight=args.tables_in_flight)
    print(json.dumps(out["summary"], default=str))
    return 0 if out["summary"].get("failedCount", 1) == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

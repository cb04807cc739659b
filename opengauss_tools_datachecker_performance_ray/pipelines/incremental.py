"""Incremental (changed-key) verification mode.

Re-expresses the reference's CDC path (SURVEY.md §2.9 / §3.3,
``extract/debezium/IncrementDataAnalysisService.java:102-170`` +
``check/modules/check/IncrementCheckThread.java:140-220``) without the
Kafka/Debezium transport: the caller supplies batches of changed keys
(a ``SourceDataLog`` analog — any upstream CDC feed can produce them);
the engine

1. windows them by the reference's hybrid count/time rule
   (flush at >= ``count_period`` keys OR >= ``time_period`` seconds),
2. re-extracts ONLY those keys from both tables (broadcast semi-join —
   ``ray.put`` the key set once, filter inside ``map_batches``),
3. runs the same digest + classify compare on the filtered pair, and
4. optionally re-checks surviving diffs a second time (two-phase
   re-validation that absorbs in-flight replication lag).

Diff batches larger than ``max_diff_count`` abort with a failed
verdict (increment-max-diff-count guard,
``config/application.yml:24``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages import compare as cmp
from ..stages.digest import DigestConfig, digest_dataset


@dataclass
class IncrementConfig:
    count_period: int = 1000       # debezium-num-period analog
    time_period_s: float = 60.0    # debezium-time-period analog (minutes->s)
    max_diff_count: int = 5000     # increment-max-diff-count analog
    secondary_recheck: bool = True


class ChangeLogWindow:
    """Hybrid count/time tumbling window over changed-key events."""

    def __init__(self, cfg: IncrementConfig | None = None,
                 clock: Callable[[], float] = time.time):
        self.cfg = cfg or IncrementConfig()
        self._clock = clock
        self._keys: list[str] = []
        self._opened = clock()

    def offer(self, keys: list[str]) -> list[str] | None:
        """Add keys; returns the flushed batch when a flush triggers."""
        self._keys.extend(map(str, keys))
        if (len(self._keys) >= self.cfg.count_period
                or (self._keys
                    and self._clock() - self._opened >= self.cfg.time_period_s)):
            return self.flush()
        return None

    def flush(self) -> list[str]:
        out, self._keys = self._keys, []
        self._opened = self._clock()
        return sorted(set(out))


def filter_by_keys(ds, key_columns: list[str], keys: list[str],
                   batch_size: int | None = None):
    """Broadcast semi-join: keep rows whose spliced key is in ``keys``
    (the ``SELECT ... WHERE pk IN (...)`` re-extract, J5/I2)."""
    import ray

    from ..functions import canonical

    key_arr = np.sort(np.asarray([str(k) for k in keys], dtype=object))
    ref = ray.put(key_arr)

    def filt(batch: pa.Table) -> pa.Table:
        from ..functions.runtime import pin_worker_threads

        pin_worker_threads()
        wanted = ray.get(ref)
        rowkeys = canonical.key_column(batch, key_columns) \
            .to_numpy(zero_copy_only=False)
        if len(wanted):
            pos = np.minimum(np.searchsorted(wanted, rowkeys),
                             len(wanted) - 1)
            mask = wanted[pos] == rowkeys
        else:
            mask = np.zeros(len(rowkeys), dtype=bool)
        return batch.filter(pa.array(mask))

    return ds.map_batches(filt, batch_format="pyarrow", batch_size=batch_size)


def incremental_from_change_log(src_factory: Callable[[], Any],
                                snk_factory: Callable[[], Any],
                                key_columns: list[str],
                                change_log_path: str,
                                table: str,
                                cfg: "IncrementConfig | None" = None,
                                dcfg: DigestConfig | None = None,
                                date_columns: dict | None = None
                                ) -> list["IncrementResult"]:
    """CDC mode end-to-end: a Debezium change-log dump (one JSON event
    per line — the file-transport stand-in for the Kafka topic) parses
    into per-table changed keys, windows by the hybrid count/time rule,
    and each flushed batch runs the two-phase re-check. The full S5 ->
    I1 -> I2 -> I3 chain (``DebeziumWorker`` -> ``DebeziumDataLogs`` ->
    ``IncrementCheckThread`` choreography) as one call."""
    from ..sources import debezium

    cfg = cfg or IncrementConfig()
    parsed = debezium.parse_change_events(
        debezium.read_change_log(change_log_path),
        key_columns={table: list(key_columns)},
        date_columns=date_columns).to_pandas()
    parsed = parsed[parsed["table"] == table].sort_values("offset")
    results: list[IncrementResult] = []
    win = ChangeLogWindow(cfg)
    # events stream through the window in offset order (the consumer
    # poll loop of DebeziumWorker); each count/time flush triggers one
    # two-phase re-check round
    for key in parsed["key"].astype(str):
        if not key:
            continue
        flushed = win.offer([key])
        if flushed:
            results.append(incremental_check(
                src_factory, snk_factory, list(key_columns), flushed,
                table=table, cfg=cfg, dcfg=dcfg))
    tail = win.flush()
    if tail:
        results.append(incremental_check(
            src_factory, snk_factory, list(key_columns), tail,
            table=table, cfg=cfg, dcfg=dcfg))
    return results


@dataclass
class IncrementResult:
    table: str
    checked_keys: int
    violations: pd.DataFrame
    result: str
    message: str = ""
    phases: list[dict[str, Any]] = field(default_factory=list)


def incremental_check(src_factory: Callable[[], Any],
                      snk_factory: Callable[[], Any],
                      key_columns: list[str], changed_keys: list[str],
                      table: str = "table",
                      cfg: IncrementConfig | None = None,
                      dcfg: DigestConfig | None = None) -> IncrementResult:
    """One incremental verification round over a flushed key batch.

    ``src_factory``/``snk_factory`` return fresh Datasets (factories so
    the secondary re-check re-reads instead of reusing stale blocks —
    the re-fetch semantics of IncrementCheckThread's two-phase check).
    """
    cfg = cfg or IncrementConfig()
    keys = sorted(set(map(str, changed_keys)))
    if len(keys) > cfg.max_diff_count:
        return IncrementResult(
            table=table, checked_keys=len(keys),
            violations=cmp.EMPTY_VIOLATIONS.copy(), result="failed",
            message=f"changed-key batch {len(keys)} exceeds "
                    f"max_diff_count {cfg.max_diff_count}")
    dcfg = dcfg or DigestConfig(key_columns=tuple(key_columns),
                                num_partitions=4, buckets_per_partition=64)

    def one_pass(key_subset: list[str]) -> cmp.CompareResult:
        src = filter_by_keys(src_factory(), key_columns, key_subset)
        snk = filter_by_keys(snk_factory(), key_columns, key_subset)
        return cmp.compare_tables(src, snk, dcfg, table=table)

    phases = []
    res = one_pass(keys)
    vio = res.violations
    phases.append({"phase": "primary", "checked": len(keys),
                   "diffs": int(len(vio))})
    # a pure multiplicity mismatch (duplicate copies of a changed key)
    # yields zero key-level violations but a failed compare summary —
    # it must survive into the increment verdict too
    if cfg.secondary_recheck and (len(vio) or not res.ok):
        # second fetch+compare of surviving diffs only (I3); when the
        # failure is count-only, re-check the full key batch
        recheck = sorted(set(vio["key"].astype(str))) if len(vio) else keys
        res = one_pass(recheck)
        vio = res.violations
        phases.append({"phase": "secondary", "checked": len(recheck),
                       "diffs": int(len(vio))})
    ok = len(vio) == 0 and res.ok
    msg = ("" if ok else
           res.summary.get("message", "")
           or (f"{res.summary.get('countMismatchPartitions', 0)} "
               f"partition(s) row count mismatch"
               if res.summary.get("countMismatchPartitions") else ""))
    return IncrementResult(table=table, checked_keys=len(keys),
                           violations=vio.reset_index(drop=True),
                           result="success" if ok else "failed",
                           message=msg, phases=phases)


def incremental_stream(src_factory: Callable[[], Any],
                       snk_factory: Callable[[], Any],
                       key_columns: list[str],
                       tailer,
                       table: str,
                       cfg: "IncrementConfig | None" = None,
                       dcfg: DigestConfig | None = None,
                       poll_interval_s: float = 0.2,
                       max_idle_polls: int | None = None,
                       stop: Callable[[], bool] | None = None):
    """Continuous incremental verification: the live-stream front-end
    the reference runs as its Debezium worker + periodic analysis timer
    (``extract/debezium/DebeziumWorker.java:37-76`` poll loop feeding
    ``IncrementDataAnalysisService.java:102-170``'s count/time
    triggers). A GENERATOR: yields one ``IncrementResult`` per window
    flush, so the caller consumes verdicts as the stream progresses.

    ``tailer`` is any object with ``poll() -> DataFrame`` of parsed
    change rows (``sources.debezium.ChangeLogTailer`` tails a change-log
    directory with real offsets; a Kafka consumer adapter would look
    identical). Events stream through ``ChangeLogWindow`` in offset
    order; each count/time flush triggers one two-phase
    ``incremental_check`` — INCLUDING the time trigger while the
    stream is idle (the reference's analysis timer fires regardless of
    new events). Termination: ``stop()`` truthy, or ``max_idle_polls``
    consecutive polls with NO raw events at all (a live feed of other
    tables keeps the stream alive; None = poll forever); the final
    partial window flushes on termination."""
    import time as _time

    cfg = cfg or IncrementConfig()
    win = ChangeLogWindow(cfg)
    idle = 0
    while True:
        if stop is not None and stop():
            break
        raw = tailer.poll()
        events = raw[(raw["table"] == table) & (raw["key"] != "")] \
            if len(raw) else raw
        if not len(events):
            # time-based flush must fire while idle too: the window
            # only evaluates its clock inside offer() (review finding)
            flushed = win.offer([])
            if flushed:
                yield incremental_check(
                    src_factory, snk_factory, list(key_columns), flushed,
                    table=table, cfg=cfg, dcfg=dcfg)
            # idle = no RAW events; other tables' traffic keeps the
            # transport demonstrably live (review finding)
            idle = idle + 1 if not len(raw) else 0
            if max_idle_polls is not None and idle >= max_idle_polls:
                break
            _time.sleep(poll_interval_s)
            continue
        idle = 0
        for key in events.sort_values("offset")["key"].astype(str):
            flushed = win.offer([key])
            if flushed:
                yield incremental_check(
                    src_factory, snk_factory, list(key_columns), flushed,
                    table=table, cfg=cfg, dcfg=dcfg)
    tail = win.flush()
    if tail:
        yield incremental_check(
            src_factory, snk_factory, list(key_columns), tail,
            table=table, cfg=cfg, dcfg=dcfg)


def compact_changes(parsed, value_columns: list[str] | None = None,
                    num_buckets: int = 256):
    """Log-compaction materializer over a parsed CDC stream: the final
    table STATE implied by the change log — keep the latest event per
    (table, key), then drop delete tombstones. The reference stops at
    consolidating changed KEYS for re-extraction
    (``DataConsolidationServiceImpl.java:118-160`` dedupes to the
    latest changed-key set, ``DebeziumDataLogs.java:84-106``); this
    generalizes that keep-latest rule to the carried values (Kafka
    log-compaction semantics — public), which is what a sink-less
    verification run compares against the source directly.

    Input is ``parse_change_events(..., value_columns=...)`` output;
    offsets must order events per key (real transport offsets — Kafka
    partition offsets are unique; ``ts_ms`` breaks residual ties).

    Scale shape: keep-latest is associative, so a within-block
    pre-reduce first collapses each block to ONE row per (table, key)
    — a hot key's burst never leaves its block — then a bucketed fold
    (``hash(table, key) % num_buckets``, the drift-path shape: group
    count is fixed at ``num_buckets`` regardless of key cardinality,
    so no per-key ``map_groups`` dispatch) picks the global latest.
    Only (key, op, offset, stringified values) rows shuffle — the raw
    JSON stream never moves past the parser.
    """
    from ..functions.hashing import hash64

    vcols = [f"v_{c}" for c in (value_columns or [])]
    keep = ["table", "key", "op", "offset", "ts_ms"] + vcols

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["table", "key", "offset", "ts_ms"],
                            kind="stable")
        return df.drop_duplicates(["table", "key"], keep="last")

    def partial(b: pa.Table) -> pd.DataFrame:
        df = latest(b.select(keep).to_pandas())
        tk = (df["table"].astype(str) + "\x1f" + df["key"].astype(str))
        h = hash64(pa.array(tk, pa.large_string()))
        df = df.assign(bucket=(h % np.uint64(num_buckets)).astype(np.int32))
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = latest(g)
        out = out[out["op"] != "d"]
        return out.drop(columns=["bucket"])

    return parsed.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(fold, batch_format="pandas")

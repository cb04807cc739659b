"""Debezium CDC ingestion tests: plain + avro-union event shapes,
delete-uses-before semantics, composite keys, date decompression,
SourceDataLog consolidation, window integration — plus a parity check
against the reference repo's own fixture records when present."""

import json
import os

import pandas as pd
import pytest

from opengauss_tools_datachecker_performance_ray.pipelines.incremental import (
    ChangeLogWindow, IncrementConfig,
)
from opengauss_tools_datachecker_performance_ray.sources import debezium

REF_STRING_FIXTURE = ("/root/reference/datachecker-extract/src/test/"
                      "resources/data/debezium_data/one_table_record.json")
REF_AVRO_FIXTURE = ("/root/reference/datachecker-extract/src/test/"
                    "resources/data/debezium_avro/one_record.json")


def _plain(table, op, after=None, before=None, envelope=True):
    payload = {"before": before, "after": after,
               "source": {"table": table, "ts_ms": 1000},
               "op": op, "ts_ms": 2000}
    return json.dumps({"schema": {}, "payload": payload} if envelope
                      else payload)


class TestParseEvent:
    def test_insert_uses_after(self):
        ev = debezium.parse_event(_plain("t", "c", after={"id": "7"}))
        assert ev["table"] == "t" and ev["op"] == "c"
        assert ev["data"] == {"id": "7"}

    def test_delete_uses_before(self):
        ev = debezium.parse_event(
            _plain("t", "d", after=None, before={"id": "9"}))
        assert ev["data"] == {"id": "9"}

    def test_flat_payload_no_envelope(self):
        ev = debezium.parse_event(
            _plain("t", "u", after={"id": "1"}, envelope=False))
        assert ev["data"] == {"id": "1"}

    def test_avro_union_wrappers_unwrapped(self):
        line = json.dumps({
            "before": None,
            "after": {"db.schema.tbl.Value": {"id": 5, "k": {"long": 10}}},
            "source": {"table": {"string": "tbl"}, "ts_ms": 1},
            "op": "c", "ts_ms": {"long": 99}})
        ev = debezium.parse_event(line)
        assert ev["table"] == "tbl"
        assert ev["data"] == {"id": 5, "k": 10}
        assert ev["ts_ms"] == 99

    def test_plain_json_primitive_named_column_survives(self):
        """Advisor (round 2): a one-column table whose column is named
        'string' / 'long' must NOT be treated as an Avro union wrapper
        — the event used to be silently dropped."""
        ev = debezium.parse_event(_plain("t", "c", after={"string": "7"}))
        assert ev is not None
        assert ev["data"] == {"string": "7"}
        ev = debezium.parse_event(_plain("t", "c", after={"long": 5}))
        assert ev["data"] == {"long": 5}

    def test_plain_json_dotted_column_not_mangled(self):
        """A column literally named 'a.b' keeps its value in plain
        JSON; only the Avro named-record (dict-valued) form unwraps."""
        ev = debezium.parse_event(_plain("t", "u", after={"a.b": "v1"}))
        assert ev["data"] == {"a.b": "v1"}

    def test_avro_flag_pins_dialect(self):
        # field values union-wrapped but NO named-record envelope: the
        # sniff sees plain JSON, so only an explicit avro=True unwraps
        line = json.dumps({"before": None,
                           "after": {"id": 5, "k": {"long": 10}},
                           "source": {"table": {"string": "t"}},
                           "op": "c", "ts_ms": {"long": 99}})
        ev = debezium.parse_event(line, avro=True)
        assert ev["data"] == {"id": 5, "k": 10}
        assert ev["table"] == "t" and ev["ts_ms"] == 99
        # default (sniff) keeps the literal dict values — plain JSON
        ev = debezium.parse_event(line)
        assert ev["data"] == {"id": 5, "k": {"long": 10}}

    def test_garbage_returns_none(self):
        assert debezium.parse_event("not json") is None
        assert debezium.parse_event('"just a string"') is None

    def test_date_decompression(self):
        assert debezium.decompress_local_date(0) == "1970-01-01"
        assert debezium.decompress_local_date(19358) == "2023-01-01"


class TestReferenceFixtureParity:
    @pytest.mark.skipif(not os.path.exists(REF_STRING_FIXTURE),
                        reason="reference fixture absent")
    def test_reference_string_record(self):
        with open(REF_STRING_FIXTURE) as f:
            line = f.read().strip()
        ev = debezium.parse_event(line)
        assert ev is not None
        # the record targets the w4 test table with PK id
        assert "id" in ev["data"]
        assert ev["op"] in {"c", "u", "d", "r"}

    @pytest.mark.skipif(not os.path.exists(REF_AVRO_FIXTURE),
                        reason="reference fixture absent")
    def test_reference_avro_record(self):
        with open(REF_AVRO_FIXTURE) as f:
            line = f.read().strip()
        ev = debezium.parse_event(line)
        assert ev is not None
        assert ev["table"] == "sbtest8"
        assert ev["data"]["id"] == 100340
        assert ev["op"] == "c"


class TestParseDataset:
    def test_parse_and_consolidate(self, ray_session):
        import ray.data as rd

        lines = [
            _plain("orders", "c", after={"ok": "5", "line": "1"}),
            _plain("orders", "u", after={"ok": "5", "line": "2"}),
            _plain("orders", "d", before={"ok": "6", "line": "1"}),
            _plain("pages", "u", after={"url": "http://a"}),
            "corrupt {{{",
        ]
        ds = rd.from_items([{"text": t} for t in lines])
        parsed = debezium.parse_change_events(
            ds, key_columns={"orders": ["ok", "line"], "pages": ["url"]}
        ).to_pandas()
        assert len(parsed) == 4  # corrupt line dropped
        okeys = set(parsed.loc[parsed["table"] == "orders", "key"])
        assert okeys == {"5_#_1", "5_#_2", "6_#_1"}  # _#_ splice
        logs = debezium.source_data_logs(
            parsed, {"orders": ["ok", "line"], "pages": ["url"]})
        by = {r["tableName"]: r for r in logs}
        assert by["orders"]["compositePrimarys"] == ["ok", "line"]
        assert by["orders"]["compositePrimaryValues"] == \
            ["5_#_1", "5_#_2", "6_#_1"]
        assert by["pages"]["compositePrimaryValues"] == ["http://a"]
        assert by["orders"]["beginOffset"] >= 0

    def test_date_column_convert(self, ray_session):
        import ray.data as rd

        line = _plain("t", "u", after={"id": "1", "d": 19358})
        parsed = debezium.parse_change_events(
            rd.from_items([{"text": line}]),
            key_columns={"t": ["id", "d"]},
            date_columns={"t": ["d"]}).to_pandas()
        assert parsed["key"].iloc[0] == "1_#_2023-01-01"

    def test_feeds_change_window(self, ray_session):
        import ray.data as rd

        lines = [_plain("t", "u", after={"id": str(i)}) for i in range(7)]
        parsed = debezium.parse_change_events(
            rd.from_items([{"text": t} for t in lines]),
            key_columns={"t": ["id"]}).to_pandas()
        win = ChangeLogWindow(IncrementConfig(count_period=5))
        flushed = win.offer(list(parsed["key"]))
        assert flushed == sorted(map(str, range(7)))


class TestCdcEndToEnd:
    def test_change_log_file_to_recheck(self, ray_session, tmp_path):
        """Full S5 -> I1 -> I2 -> I3 chain: a change-log dump whose
        events reference keys that genuinely differ between two tables
        must surface exactly those keys as violations."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines.incremental import (
            IncrementConfig, incremental_from_change_log,
        )

        n = 200
        src_t = pa.table({"id": [str(i) for i in range(n)],
                          "v": [f"v{i}" for i in range(n)]})
        vals = [f"v{i}" if i % 50 else f"CHANGED{i}" for i in range(n)]
        snk_t = pa.table({"id": [str(i) for i in range(n)], "v": vals})
        pq.write_table(src_t, str(tmp_path / "src.parquet"))
        pq.write_table(snk_t, str(tmp_path / "snk.parquet"))
        # CDC feed: an update event for every 10th key (includes the
        # genuinely-changed multiples of 50 and many clean keys)
        lines = [_plain("t", "u", after={"id": str(i), "v": "x"})
                 for i in range(0, n, 10)]
        log = tmp_path / "changes.jsonl"
        log.write_text("\n".join(lines) + "\n")

        def src_f():
            return rd.read_parquet(str(tmp_path / "src.parquet"))

        def snk_f():
            return rd.read_parquet(str(tmp_path / "snk.parquet"))

        res = incremental_from_change_log(
            src_f, snk_f, ["id"], str(log), table="t",
            cfg=IncrementConfig(count_period=8, secondary_recheck=True))
        assert len(res) >= 2  # windowed into multiple flushes
        bad = sorted({k for r in res
                      for k in r.violations["key"].astype(str)})
        assert bad == sorted(str(i) for i in range(0, n, 50))
        assert all(r.result == "failed" for r in res
                   if len(r.violations))


class TestCdcQuery:
    def test_cdc_debezium_orders_matches_predicate(self, ray_session):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries,
        )

        out = queries.cdc_debezium_orders("/root/testdata/sf0.001")
        got = set(out["key"])
        orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                                 columns=["o_orderkey"])
        want = {str(int(k)) for k in orders["o_orderkey"]
                if int(k) % 97 == 0}
        assert got == want
        assert (out["op"] == "u").all()


class TestCdcStreaming:
    def test_tailer_tracks_appends_and_offsets(self, tmp_path):
        """New files AND appended lines both surface, with globally
        monotone offsets; a partial trailing line waits for its
        newline."""
        d = tmp_path / "stream"
        d.mkdir()
        tail = debezium.ChangeLogTailer(str(d), {"t": ["id"]})
        assert len(tail.poll()) == 0
        (d / "log_000.jsonl").write_text(
            _plain("t", "u", after={"id": "1"}) + "\n"
            + _plain("t", "u", after={"id": "2"}) + "\n")
        ev1 = tail.poll()
        assert list(ev1["key"]) == ["1", "2"]
        assert list(ev1["offset"]) == [0, 1]
        # append to the SAME file + a partial line (no newline yet)
        with open(d / "log_000.jsonl", "a") as f:
            f.write(_plain("t", "u", after={"id": "3"}) + "\n")
            f.write('{"partial":')
        ev2 = tail.poll()
        assert list(ev2["key"]) == ["3"]
        assert list(ev2["offset"]) == [2]
        # complete the partial line and add a NEW file
        with open(d / "log_000.jsonl", "a") as f:
            f.write(' 1}\n')  # completes to garbage -> parsed away
        (d / "log_001.jsonl").write_text(
            _plain("t", "d", before={"id": "4"}) + "\n")
        ev3 = tail.poll()
        assert list(ev3["key"]) == ["4"]
        # offset 3 went to the completed garbage line (consumed),
        # offset 4 to the new event — monotone, never reused
        assert list(ev3["offset"]) == [4]
        assert tail.next_offset == 5
        assert len(tail.poll()) == 0  # fully drained

    def test_stream_flushes_and_rechecks_in_order(self, ray_session,
                                                  tmp_path):
        """Round-2 verdict #7: events appended across multiple files
        drive window flushes + two-phase re-checks IN ORDER through
        the live tail loop."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines.incremental import (
            IncrementConfig, incremental_stream,
        )

        n = 100
        src_t = pa.table({"id": [str(i) for i in range(n)],
                          "v": [f"v{i}" for i in range(n)]})
        vals = [f"v{i}" if i % 20 else f"CHANGED{i}" for i in range(n)]
        snk_t = pa.table({"id": [str(i) for i in range(n)], "v": vals})
        pq.write_table(src_t, str(tmp_path / "src.parquet"))
        pq.write_table(snk_t, str(tmp_path / "snk.parquet"))
        d = tmp_path / "stream"
        d.mkdir()
        tail = debezium.ChangeLogTailer(str(d), {"t": ["id"]})
        gen = incremental_stream(
            lambda: rd.read_parquet(str(tmp_path / "src.parquet")),
            lambda: rd.read_parquet(str(tmp_path / "snk.parquet")),
            ["id"], tail, table="t",
            cfg=IncrementConfig(count_period=5, secondary_recheck=True),
            poll_interval_s=0.01, max_idle_polls=3)
        # file 1: keys 0..6 -> one flush of 5 (keys 0..4, incl. bad 0)
        (d / "a.jsonl").write_text("".join(
            _plain("t", "u", after={"id": str(i)}) + "\n" for i in range(7)))
        r1 = next(gen)
        assert r1.checked_keys == 5
        assert [p["phase"] for p in r1.phases] == ["primary", "secondary"]
        assert list(r1.violations["key"]) == ["0"]
        # file 2 appended AFTER the first flush: keys 7..14 -> flushes
        # of (5,6,7,8,9) then (10..14); key 20-multiples differ
        (d / "b.jsonl").write_text("".join(
            _plain("t", "u", after={"id": str(i)}) + "\n"
            for i in range(7, 15)))
        r2 = next(gen)
        assert sorted(r2.violations["key"]) == []  # 5..9 all clean
        assert r2.result == "success"
        r3 = next(gen)
        assert r3.checked_keys == 5  # 10..14
        # idle polls exhaust; no partial tail remains (15 = 3 flushes)
        assert list(gen) == []

    def test_stream_time_flush_fires_while_idle(self, ray_session,
                                                tmp_path):
        """Review finding: keys below count_period must still flush on
        the TIME trigger while the stream is idle."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines.incremental import (
            IncrementConfig, incremental_stream,
        )

        t = pa.table({"id": ["1", "2"], "v": ["a", "b"]})
        pq.write_table(t, str(tmp_path / "t.parquet"))
        d = tmp_path / "s"
        d.mkdir()
        (d / "a.jsonl").write_text(
            _plain("t", "u", after={"id": "1"}) + "\n")
        tail = debezium.ChangeLogTailer(str(d), {"t": ["id"]})
        gen = incremental_stream(
            lambda: rd.read_parquet(str(tmp_path / "t.parquet")),
            lambda: rd.read_parquet(str(tmp_path / "t.parquet")),
            ["id"], tail, table="t",
            cfg=IncrementConfig(count_period=1000, time_period_s=0.05),
            poll_interval_s=0.03, max_idle_polls=50)
        # count_period never reached; the flush must come from the
        # time trigger during IDLE polls, well before 50 idle polls
        r = next(gen)
        assert r.checked_keys == 1 and r.result == "success"

    def test_stream_other_table_traffic_keeps_alive(self, ray_session,
                                                    tmp_path):
        """Review finding: polls carrying only OTHER tables' events are
        not 'empty' — the stream must stay alive and catch a late
        event for the target table."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines.incremental import (
            IncrementConfig, incremental_stream,
        )

        t = pa.table({"id": ["1"], "v": ["a"]})
        pq.write_table(t, str(tmp_path / "t.parquet"))
        d = tmp_path / "s"
        d.mkdir()
        # 6 polls' worth of other-table chatter with max_idle_polls=3:
        # old semantics would terminate before the 't' event lands
        import threading
        import time as _time

        def writer():
            for i in range(6):
                with open(d / "a.jsonl", "a") as f:
                    f.write(_plain("other", "u", after={"id": str(i)})
                            + "\n")
                _time.sleep(0.05)
            with open(d / "a.jsonl", "a") as f:
                f.write(_plain("t", "u", after={"id": "1"}) + "\n")

        th = threading.Thread(target=writer)
        th.start()
        tail = debezium.ChangeLogTailer(
            str(d), {"t": ["id"], "other": ["id"]})
        gen = incremental_stream(
            lambda: rd.read_parquet(str(tmp_path / "t.parquet")),
            lambda: rd.read_parquet(str(tmp_path / "t.parquet")),
            ["id"], tail, table="t",
            cfg=IncrementConfig(count_period=1),
            poll_interval_s=0.04, max_idle_polls=3)
        results = list(gen)
        th.join()
        assert sum(r.checked_keys for r in results) == 1


class TestCompaction:
    """compact_changes: log-compaction materializer (keep-latest per
    key by offset, delete tombstones erase) + parser value carriage."""

    def _stream(self):
        # key 1: insert -> update (survives with updated value)
        # key 2: insert -> delete (erased)
        # key 3: insert only (survives)
        # key 4: insert -> update -> delete -> re-insert (survives,
        #        re-inserted value wins by offset)
        evs = [
            (0, _plain("t", "c", after={"id": "1", "v": "10"})),
            (1, _plain("t", "c", after={"id": "2", "v": "20"})),
            (2, _plain("t", "c", after={"id": "3", "v": "30"})),
            (3, _plain("t", "u", after={"id": "1", "v": "11"})),
            (4, _plain("t", "d", before={"id": "2", "v": "20"})),
            (5, _plain("t", "c", after={"id": "4", "v": "40"})),
            (6, _plain("t", "u", after={"id": "4", "v": "41"})),
            (7, _plain("t", "d", before={"id": "4", "v": "41"})),
            (8, _plain("t", "c", after={"id": "4", "v": "42"})),
        ]
        return evs

    def test_parser_carries_values(self, ray_session):
        import ray.data as rd

        evs = self._stream()
        ds = rd.from_items([{"text": line, "off": off}
                            for off, line in evs])
        parsed = debezium.parse_change_events(
            ds, key_columns={"t": ["id"]}, offset_col="off",
            value_columns=["v", "missing"]).to_pandas()
        assert list(parsed.columns) == [
            "table", "key", "op", "offset", "ts_ms", "v_v", "v_missing"]
        byoff = parsed.set_index("offset")
        assert byoff.loc[3, "v_v"] == "11"
        # delete carries the before image's value
        assert byoff.loc[4, "v_v"] == "20"
        # absent payload field -> null, not a crash
        assert parsed["v_missing"].isna().all()

    def test_keep_latest_and_tombstones(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import (
            incremental,
        )

        evs = self._stream()
        # shuffle delivery order AND split across blocks: compaction
        # must depend only on offsets, not arrival order / blocking
        items = [{"text": line, "off": off} for off, line in evs]
        items = [items[i] for i in (5, 0, 7, 2, 8, 1, 4, 6, 3)]
        ds = rd.from_items(items).repartition(3)
        parsed = debezium.parse_change_events(
            ds, key_columns={"t": ["id"]}, offset_col="off",
            value_columns=["v"])
        state = incremental.compact_changes(parsed, value_columns=["v"]) \
            .to_pandas().sort_values("key").reset_index(drop=True)
        assert list(state["key"]) == ["1", "3", "4"]
        assert list(state["v_v"]) == ["11", "30", "42"]
        assert list(state["op"]) == ["u", "c", "c"]

    def test_multi_table_streams_stay_separate(self, ray_session):
        import ray.data as rd

        from opengauss_tools_datachecker_performance_ray.pipelines import (
            incremental,
        )

        evs = [
            (0, _plain("a", "c", after={"id": "1", "v": "1"})),
            (1, _plain("b", "c", after={"id": "1", "v": "2"})),
            (2, _plain("a", "d", before={"id": "1", "v": "1"})),
        ]
        ds = rd.from_items([{"text": line, "off": off}
                            for off, line in evs])
        parsed = debezium.parse_change_events(
            ds, key_columns={"a": ["id"], "b": ["id"]}, offset_col="off",
            value_columns=["v"])
        state = incremental.compact_changes(parsed, value_columns=["v"]) \
            .to_pandas()
        # table a's key 1 deleted; table b's SAME key value survives
        assert list(state["table"]) == ["b"]
        assert list(state["v_v"]) == ["2"]

    def test_gate_query_matches_predicate(self, ray_session):
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        out = q.cdc_compaction_orders("/root/testdata/sf0.001")
        import pyarrow.parquet as pq

        orders = pq.read_table(
            "/root/testdata/sf0.001/orders.parquet",
            columns=["o_orderkey", "o_custkey"]).to_pandas()
        keep = orders[orders["o_orderkey"] % 5 != 0].copy()
        keep["key"] = keep["o_orderkey"].astype(str)
        keep["o_custkey"] = keep["o_custkey"] + \
            (keep["o_orderkey"] % 3 == 0) * 1000000
        exp = keep[["key", "o_custkey"]].sort_values("key") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp)

    def test_state_verify_classifies_transport_faults(self, ray_session):
        """Sinkless CDC verification: lost updates surface as 'update'
        diffs, spurious deletes as 'insert' diffs, everything else
        Merkle-prunes clean."""
        from opengauss_tools_datachecker_performance_ray.pipelines import (
            queries as q,
        )

        out = q.cdc_state_verify_orders("/root/testdata/sf0.001")
        import pyarrow.parquet as pq

        keys = pq.read_table(
            "/root/testdata/sf0.001/orders.parquet",
            columns=["o_orderkey"]).column("o_orderkey").to_pylist()
        exp = sorted(
            (str(k), "insert" if k % 13 == 0 else "update")
            for k in keys if k % 11 == 0 or k % 13 == 0)
        assert [tuple(r) for r in out.to_numpy()] == exp

"""Session-long contention miner for the official round-5 numbers.

The round-3 process fix (probe-gate the bench on ``bench.calibrate()``)
assumed quiet windows exist. On this host they currently don't: 4+ h of
30 s probes never saw two consecutive t16 <= 0.45 (floor 0.18-0.25,
readings 0.5-4.9, bursty at ~30 s cadence). An all-or-nothing gate
therefore never fires, and any single run is guaranteed to catch bursts.

This miner takes the statistically honest alternative: loop the full
bench, the 4/16-cpu scaling legs, and the decode-isolated compare-leg
experiment continuously for hours, and compose PER-QUERY MINIMA across
attempts. Each query runs only a few seconds, so across dozens of
attempts each one eventually lands in a between-burst gap; the minimum
converges on the uncontended value from below-contended samples the way
``min`` in bench.run_scaling already screens +-30% VM wobble. Every
attempt's calibration probes are kept in the output so a reader can see
exactly how contended the mining window was.

Outputs (rewritten after every phase, safe to read any time):
  /tmp/BENCH_min_r5.json     composite per-query minima + best attempt
  /tmp/SCALING_min_r5.json   efficiency from per-leg headline minima
  /tmp/decode_min_r5.json    decode-isolated ratio from per-leg minima
  /tmp/BENCH_quiet_r5.json   verbatim attempt, only if one is probe-quiet

Usage: python tools/min_miner.py [--deadline-min 300]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
QUIET_T16 = 0.33
DIGEST_DIR = "/tmp/graft_digest_r5"


def run_once(ncpu: int, headlines_only: bool) -> dict:
    env = dict(os.environ, GRAFT_SF_DIR=SF_DIR, RAY_GRAFT_CPUS=str(ncpu))
    if headlines_only:
        env["GRAFT_BENCH_HEADLINES_ONLY"] = "1"
    try:
        p = subprocess.run([sys.executable, "bench.py", "--once"], env=env,
                           capture_output=True, text=True, cwd=REPO,
                           timeout=2400)
    except subprocess.TimeoutExpired as e:
        # a raylet-socket hang ate a 95-minute mining window once; a
        # stuck attempt is worth less than the next attempt
        raise RuntimeError(
            f"bench.py --once at {ncpu} cpus hung past 2400s; "
            f"stderr tail:\n{(e.stderr or '')[-1500:]}") from None
    if p.returncode != 0:
        # surface the subprocess stderr — a bare CalledProcessError
        # hides WHY the attempt died (learned the hard way)
        raise RuntimeError(
            f"bench.py --once at {ncpu} cpus exited {p.returncode}; "
            f"stderr tail:\n{p.stderr[-1500:]}")
    return json.loads(p.stdout.strip().splitlines()[-1])


class MinState:
    """Accumulates per-query minima + attempt calibrations for one
    bench configuration."""

    def __init__(self) -> None:
        self.q_min: dict[str, float] = {}
        self.rerun_min: dict[str, float] = {}
        self.attempts: list[dict] = []
        self.best_attempt: dict | None = None

    def add(self, out: dict) -> None:
        for k, v in out.get("queries", {}).items():
            self.q_min[k] = min(self.q_min.get(k, float("inf")), v)
        for k, v in out.get("queries_rerun", {}).items():
            self.rerun_min[k] = min(self.rerun_min.get(k, float("inf")), v)
        self.attempts.append({
            "total_sec": out.get("total_sec"),
            "host_calibration_sec": out.get("host_calibration_sec"),
            "ts": time.strftime("%H:%M:%S"),
        })
        if (self.best_attempt is None
                or out["total_sec"] < self.best_attempt["total_sec"]):
            self.best_attempt = out

    def headline(self, name: str) -> float:
        """min of first-run and warm-session rerun, like bench.run_scaling."""
        return min(self.q_min.get(name, float("inf")),
                   self.rerun_min.get(name, float("inf")))


def write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _seed(path: str) -> dict | None:
    """Resume support: re-seed state from a previous miner run's output
    so a tmux/server restart doesn't discard hours of accumulated minima."""
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline-min", type=int, default=300)
    ap.add_argument("--skip-decode", action="store_true")
    args = ap.parse_args()
    deadline = time.time() + args.deadline_min * 60

    full = MinState()
    legs = {4: MinState(), 16: MinState()}
    decode_min = {4: float("inf"), 16: float("inf")}
    decode_cals: list[list[dict]] = []
    quiet_found = False

    prev = _seed("/tmp/BENCH_min_r5.json")
    if prev:
        full.q_min = dict(prev.get("queries_raw")
                          or prev.get("queries", {}))
        full.rerun_min = dict(prev.get("queries_rerun_raw")
                              or prev.get("queries_rerun_min", {}))
        full.attempts = list(prev.get("attempts", []))
        full.best_attempt = prev.get("best_single_attempt")
        quiet_found = bool(prev.get("quiet_attempt_found", False))
        print(f"seeded full-suite minima from {len(full.attempts)} prior "
              "attempts", flush=True)
    prev = _seed("/tmp/SCALING_min_r5.json")
    if prev:
        for ncpu, key in ((4, "attempts_4cpu"), (16, "attempts_16cpu")):
            legs[ncpu].attempts = list(prev.get(key, []))
            saved = prev.get("per_leg_query_min", {}).get(str(ncpu), {})
            legs[ncpu].q_min = dict(saved.get("queries", {}))
            legs[ncpu].rerun_min = dict(saved.get("queries_rerun", {}))
        heads0 = ("compare_orders_pair_scaled", "text_analysis_scaled")
        eff = prev.get("per_query_efficiency", {})
        if (not legs[16].q_min and set(eff) == set(heads0)
                and prev.get("headline_sec_4cpu")
                and prev.get("headline_sec_16cpu")):
            # Older file without per_leg_query_min: the per-leg headline
            # minima are exactly recoverable from the two totals and the
            # two per-query efficiencies (t4_q = 4*eff_q*t16_q).
            a, b = heads0
            t4, t16 = prev["headline_sec_4cpu"], prev["headline_sec_16cpu"]
            denom = 4.0 * (eff[a] - eff[b])
            if abs(denom) > 1e-9:
                t16_a = (t4 - 4.0 * eff[b] * t16) / denom
                if 0.0 < t16_a < t16:
                    legs[16].q_min = {a: t16_a, b: t16 - t16_a}
                    legs[4].q_min = {a: 4.0 * eff[a] * t16_a,
                                     b: 4.0 * eff[b] * (t16 - t16_a)}
        print("seeded scaling legs from "
              f"{len(legs[4].attempts)}/{len(legs[16].attempts)} prior "
              "attempts", flush=True)
    decode_trials = 0
    prev = _seed("/tmp/decode_min_r5.json")
    if prev:
        if prev.get("sec_4cpu") is not None:
            decode_min[4] = prev["sec_4cpu"]
        if prev.get("sec_16cpu") is not None:
            decode_min[16] = prev["sec_16cpu"]
        decode_cals = [c for c in prev.get("host_calibration_sec", [])]
        decode_trials = int(prev.get("trials",
                                     len(decode_cals)))
        print(f"seeded decode minima {decode_min} "
              f"({decode_trials} prior trials)", flush=True)
    heads = ("compare_orders_pair_scaled", "text_analysis_scaled")

    if not args.skip_decode and not os.path.exists(f"{DIGEST_DIR}/cfg.json"):
        from tools import decode_isolated_scaling as dis

        dis.build_digests(64, DIGEST_DIR)

    cycle = 0
    while time.time() < deadline:
        cycle += 1
        # --- phase A: full suite at 32 cpus ---------------------------
        try:
            out = run_once(32, headlines_only=False)
            full.add(out)
            cals = out.get("host_calibration_sec", [])
            if cals and all(c["t16"] <= QUIET_T16 for c in cals) \
                    and not quiet_found:
                quiet_found = True
                write_json("/tmp/BENCH_quiet_r5.json", out)
            n_orders_rep = out["rows_per_sec"] * out["value"]
            flag = full.headline("compare_orders_pair_scaled")
            write_json("/tmp/BENCH_min_r5.json", {
                "metric": "flagship_compare_sec_min_of_attempts",
                "value": round(flag, 3), "unit": "sec",
                "queries": {k: round(v, 3) for k, v in full.q_min.items()},
                "queries_rerun_min": {k: round(v, 3)
                                      for k, v in full.rerun_min.items()},
                # unrounded copies: restart seeding must not drift the
                # composite minima low by re-ingesting rounded values
                "queries_raw": full.q_min,
                "queries_rerun_raw": full.rerun_min,
                "total_sec_min_composite": round(
                    sum(full.q_min.values()), 3),
                "rows_per_sec_best": round(n_orders_rep / flag, 1),
                "validated_docs_per_sec_best": round(
                    2 * 100000 / full.q_min.get("validate_pages",
                                                float("inf")), 1),
                "sf": SF_DIR, "num_cpus": 32,
                "attempts": full.attempts,
                "quiet_attempt_found": quiet_found,
                "best_single_attempt": full.best_attempt,
                "note": ("per-query minimum across repeated full-suite "
                         "attempts on a bursty co-tenant-contended host; "
                         "each attempt's own calibration probes listed "
                         "under attempts[]"),
            })
        except Exception:
            print("phase A failed:\n" + traceback.format_exc()[-800:],
                  flush=True)
        if time.time() >= deadline:
            break
        # --- phase B: scaling legs (headlines only, 4 then 16) --------
        try:
            for ncpu in (4, 16):
                legs[ncpu].add(run_once(ncpu, headlines_only=True))
            t_lo = sum(legs[4].headline(h) for h in heads)
            t_hi = sum(legs[16].headline(h) for h in heads)
            if t_hi > 0 and t_lo < float("inf"):
                per_q = {h: round((legs[4].headline(h)
                                   / legs[16].headline(h)) / 4.0, 3)
                         for h in heads}
                write_json("/tmp/SCALING_min_r5.json", {
                    "metric": "scaling_efficiency",
                    "value": round((t_lo / t_hi) / 4.0, 3),
                    "unit": "ratio",
                    "headline_sec_4cpu": round(t_lo, 3),
                    "headline_sec_16cpu": round(t_hi, 3),
                    "per_query_efficiency": per_q,
                    "per_leg_query_min": {
                        str(n): {"queries": legs[n].q_min,
                                 "queries_rerun": legs[n].rerun_min}
                        for n in (4, 16)},
                    "attempts_4cpu": legs[4].attempts,
                    "attempts_16cpu": legs[16].attempts,
                    "sf": SF_DIR,
                    "note": ("efficiency=(T4/T16)/4 over the two scaled "
                             "headline pipelines, per-leg minima across "
                             "repeated fresh-process runs (same min "
                             "treatment both levels); 16 physical cores"),
                })
        except Exception:
            print("phase B failed:\n" + traceback.format_exc()[-800:],
                  flush=True)
        if time.time() >= deadline or args.skip_decode:
            continue
        # --- phase C: decode-isolated compare leg ---------------------
        try:
            from tools import decode_isolated_scaling as dis

            cal0 = bench.calibrate()
            for ncpu in (4, 16):
                r = dis.run_leg(ncpu, DIGEST_DIR)
                decode_min[ncpu] = min(decode_min[ncpu], r["sec"])
            decode_cals.append([cal0, bench.calibrate()])
            decode_trials += 1
            write_json("/tmp/decode_min_r5.json", {
                "metric": "compare_leg_decode_isolated_scaling",
                "value": round((decode_min[4] / decode_min[16]) / 4.0, 3),
                "unit": "ratio",
                "sec_4cpu": decode_min[4], "sec_16cpu": decode_min[16],
                "repeat": 64, "sf": SF_DIR,
                "trials": decode_trials,
                "host_calibration_sec": decode_cals[-3:],
                "note": ("signature+merkle+classify from pre-materialized "
                         "digest parquet; per-leg minimum across repeated "
                         "interleaved 4/16 trials on a contended host"),
            })
        except Exception:
            print("phase C failed:\n" + traceback.format_exc()[-800:],
                  flush=True)
        print(f"cycle {cycle} done at {time.strftime('%H:%M:%S')}",
              flush=True)
    print("miner done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

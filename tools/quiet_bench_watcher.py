"""Long-running quiet-window watcher for the official bench record.

Polls the host-calibration probe (bench.calibrate) until two
consecutive t16 readings sit at the uncontended floor, then runs the
FULL bench suite (sf0.1, 32 cpus) via ``python bench.py --once`` in a
fresh process and writes the result to --out. If the run's own post-
probe shows contention crept back in, keeps watching. Designed to run
under tmux for hours; exits after the first accepted quiet run or at
--deadline-min.

Usage: python tools/quiet_bench_watcher.py --out /tmp/BENCH_quiet_r4.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--threshold", type=float, default=0.33)
    ap.add_argument("--poll-sec", type=int, default=30)
    ap.add_argument("--deadline-min", type=int, default=300)
    ap.add_argument("--log", default=None)
    args = ap.parse_args()
    log_path = args.log or (args.out + ".log")
    deadline = time.time() + args.deadline_min * 60

    def log(msg: str) -> None:
        line = f"{time.strftime('%H:%M:%S')} {msg}"
        print(line, flush=True)
        with open(log_path, "a") as f:
            f.write(line + "\n")

    streak = 0
    while time.time() < deadline:
        c = bench.calibrate()
        streak = streak + 1 if c["t16"] <= args.threshold else 0
        log(f"probe t1={c['t1']} t16={c['t16']} streak={streak}")
        if streak < 2:
            time.sleep(args.poll_sec)
            continue
        log("quiet window: launching full bench (sf0.1, 32 cpus)")
        env = dict(os.environ, GRAFT_SF_DIR="/root/testdata/sf0.1",
                   RAY_GRAFT_CPUS="32")
        p = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))), "bench.py"),
             "--once"],
            env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if p.returncode != 0:
            log(f"bench failed rc={p.returncode}: {p.stderr[-500:]}")
            streak = 0
            continue
        out = json.loads(p.stdout.strip().splitlines()[-1])
        cals = out.get("host_calibration_sec", [])
        # bool(cals): an unprobed run must never be accepted as quiet
        quiet = bool(cals) and all(x["t16"] <= args.threshold
                                   for x in cals)
        log(f"bench done total={out.get('total_sec')} probes={cals} "
            f"quiet={quiet}")
        if quiet:
            out["quiet_gated"] = {"quiet": True,
                                  "t16_threshold": args.threshold,
                                  "via": "tools/quiet_bench_watcher.py"}
            with open(args.out, "w") as f:
                json.dump(out, f)
            log(f"ACCEPTED -> {args.out}")
            return 0
        streak = 0
    log("deadline reached without an accepted quiet run")
    return 1


if __name__ == "__main__":
    sys.exit(main())

"""Quiet-window hunter for the N-vs-4N scaling pair.

The sandbox box is shared: the pure-CPU burn-loop ceiling (the box's own
N→4N scaling limit for embarrassingly-parallel memory-bound work) swings
0.02–0.97 across a day, and a raw crawl-scaling number taken in a bad
window is meaningless.  This tool loops: probe the ceiling first, and
only when the window is quiet (ceiling ≥ --gate) pay for a full scaling
trial (`bench.py --scaling` with one trial).  Every probe and trial is
appended to a JSONL log so the whole hunt is auditable — including the
windows we rejected.

    python tools/scaling_hunt.py --n 4 --gate 0.7 --pairs 2 \
        --deadline-min 120 --log /tmp/scaling_hunt.jsonl

Stops after --pairs accepted trials or --deadline-min minutes.  The best
accepted trial (raw efficiency, its same-window ceiling, and the
ceiling-normalized value) is printed last as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser(description="hunt quiet windows for scaling pairs")
    ap.add_argument("--n", type=int, default=int(os.environ.get("GRAFT_SCALING_N", "4")))
    ap.add_argument("--gate", type=float, default=0.7, help="min burn ceiling to run a pair")
    ap.add_argument("--pairs", type=int, default=2, help="accepted trials before stopping")
    ap.add_argument("--deadline-min", type=float, default=90.0)
    ap.add_argument("--sleep-sec", type=float, default=60.0, help="wait between rejected probes")
    ap.add_argument("--log", default="/tmp/scaling_hunt.jsonl")
    args = ap.parse_args()

    import bench  # repo-root bench.py: measure_ceiling + --scaling protocol

    deadline = time.time() + args.deadline_min * 60
    accepted: list[dict] = []

    def emit(rec: dict) -> None:
        rec["ts"] = round(time.time(), 1)
        with open(args.log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    while time.time() < deadline and len(accepted) < args.pairs:
        ceil = bench.measure_ceiling(args.n)
        if ceil["eff"] < args.gate:
            emit({"kind": "probe_rejected", "ceiling": ceil, "gate": args.gate})
            time.sleep(args.sleep_sec)
            continue
        emit({"kind": "probe_accepted", "ceiling": ceil})
        env = dict(
            os.environ,
            GRAFT_SCALING_N=str(args.n),
            GRAFT_SCALING_RUNS="1",
        )
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            emit({"kind": "trial_failed", "rc": proc.returncode, "tail": proc.stdout[-500:]})
            continue
        trial = json.loads(lines[-1])
        trial["kind"] = "trial"
        emit(trial)
        accepted.append(trial)

    if accepted:
        best = max(accepted, key=lambda t: t["value"])
        best = dict(best, kind="best")
        emit(best)
    else:
        emit({"kind": "no_quiet_window", "gate": args.gate})


if __name__ == "__main__":
    main()

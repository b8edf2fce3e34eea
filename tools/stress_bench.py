#!/usr/bin/env python3
"""Contention stress test for graft.Bench: run the full bench while N
synthetic CPU burners (default 3, matching the load the r9/r11 driver
runs reported) keep the box busy, then compare every per-query time
against BASELINE_BENCH.json and report entries over a ratio threshold
(default 2x — the driver's regression flag).

Usage: python3 tools/stress_bench.py [--burners 3] [--sf /root/testdata/sf0.1]
                                     [--threshold 2.0] [--baseline BASELINE_BENCH.json]

Exit code 0 = no entry over threshold; 1 = at least one over.
The burners are plain busy loops pinned at nice 0 (same priority as
the bench) so they genuinely contend for cores, exactly like another
tenant's workload on the driver box.
"""
import argparse, json, os, signal, subprocess, sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--burners", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--threshold", type=float, default=2.0)
    ap.add_argument("--baseline", default="BASELINE_BENCH.json")
    args = ap.parse_args()

    with open(args.baseline) as f:
        base = json.load(f)["queries"]

    burners = [
        subprocess.Popen([sys.executable, "-c",
                          "while True:\n x = sum(i*i for i in range(10000))"])
        for _ in range(args.burners)
    ]
    print(f"[stress] {args.burners} burners up (pids "
          f"{[b.pid for b in burners]}); load will settle ~{args.burners}")
    try:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf)
        rc = subprocess.call(
            ["sbt", "-batch", "runMain graft.Bench"], env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        if rc != 0:
            print(f"[stress] bench exited rc={rc}", file=sys.stderr)
            return 2
    finally:
        for b in burners:
            b.send_signal(signal.SIGKILL)
    with open("target/bench.json") as f:
        run = json.load(f)
    over = []
    for name, sec in sorted(run["queries"].items()):
        b = base.get(name)
        if b is None or b <= 0 or sec < 0:
            continue
        # sub-second entries are noise-dominated under load; the
        # driver's flag only matters where real work inflates
        ratio = sec / b
        flag = " <-- OVER" if ratio > args.threshold and sec >= 0.5 else ""
        if flag:
            over.append((name, sec, b, ratio))
        print(f"[stress] {name:32s} {sec:7.2f}s  base {b:7.2f}s  {ratio:5.2f}x{flag}")
    print(f"[stress] total {run['value']:.1f}s, failed {run['failed']}, "
          f"load l0={run.get('l0')} l1={run.get('l1')}")
    if over:
        print(f"[stress] {len(over)} entries over {args.threshold}x under load:")
        for name, sec, b, r in over:
            print(f"[stress]   {name}: {sec:.2f}s vs {b:.2f}s = {r:.2f}x")
        return 1
    print(f"[stress] PASS: no entry over {args.threshold}x baseline under "
          f"load {args.burners}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

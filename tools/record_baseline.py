#!/usr/bin/env python3
"""Record the per-query contract envelope BASELINE_BENCH.json: run
graft.Bench N times (idle box expected) and take the ELEMENTWISE MIN
across runs — the least-contended observation per query, the same
logic Bench's min-of-repeats applies within a run, applied across
runs.

Usage: python3 tools/record_baseline.py [--runs 3] [--sf /root/testdata/sf0.1]
                                        [--out BASELINE_BENCH.json]
                                        [--repeats 4]

Refuses to record if any run reports failures, or if any run STARTED
on a contended box (l0 > 2 — the pre-run load; the post-run l1
reflects the bench's own 32-way work and only warns), so a bad
envelope can't silently become the contract. Override the contention
refusal with --force when the load is known-benign.
"""
import argparse, json, os, subprocess, sys


def one_run(sf, repeats):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf,
               SPARK_GRAFT_BENCH_REPEATS=str(repeats))
    rc = subprocess.call(["sbt", "-batch", "runMain graft.Bench"], env=env,
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    if rc != 0:
        sys.exit(f"[baseline] bench exited rc={rc}")
    with open("target/bench.json") as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="BASELINE_BENCH.json")
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--force", action="store_true",
                    help="record even if a run started under load")
    args = ap.parse_args()

    envelope = {}
    meta = []
    for i in range(args.runs):
        # WAIT for the box to be idle before starting, rather than
        # refusing after a wasted run: the previous run's own 32-thread
        # tail keeps the 1-min load average elevated for MINUTES after
        # the JVM exits (a fixed 75 s settle repeatedly failed to
        # outlast it — two refused recordings in round 16), and the
        # refusal below exists for FOREIGN tenants, not the recorder's
        # own footprint. Bounded: give up after ~12 min so a genuinely
        # busy box still surfaces as the post-run refusal.
        import time
        threshold0 = max(2.0, (os.cpu_count() or 8) / 8.0)
        waited = 0
        while waited < 720:
            with open("/proc/loadavg") as f:
                load1 = float(f.read().split()[0])
            if load1 < threshold0 * 0.75:
                break
            print(f"[baseline] run {i}: waiting for idle (load {load1:.1f})")
            time.sleep(30)
            waited += 30
        d = one_run(args.sf, args.repeats)
        if d["failed"]:
            sys.exit(f"[baseline] run {i}: {d['failed']} queries failed — not recording")
        l0, l1 = float(d.get("l0", 0)), float(d.get("l1", 0))
        # same box-scaled meaning as Bench.contentionThreshold: one busy
        # core on a 32-thread host is not contention
        threshold = max(2.0, (os.cpu_count() or 8) / 8.0)
        if l0 > threshold and not args.force:
            sys.exit(f"[baseline] run {i} STARTED under load l0={l0} (> {threshold}) — "
                     "refusing to record a contended envelope (rerun idle, or pass --force)")
        if l1 > 2.0 + args.repeats:  # the bench itself raises load
            print(f"[baseline] WARNING run {i}: post-run load l1={l1} — "
                  "another workload may have joined mid-run")
        meta.append({"total": d["value"], "l0": l0, "l1": l1})
        for k, v in d["queries"].items():
            envelope[k] = min(envelope.get(k, v), v)
        print(f"[baseline] run {i}: total {d['value']:.1f}s (l0={l0}, l1={l1})")

    # Per-query NOISE FLOOR (documented in the file as "floor"): the
    # elementwise min across idle runs systematically catches a tiny
    # entry's FASTEST scheduling outcome — export_manifest's idle min
    # is ~0.17 s while its typical driver-load value is 0.35-0.45 s, so
    # a 2x band check on the raw min adjudicates scheduler jitter, not
    # plan shape (the round-14 band-graze). Flooring envelope entries
    # at 0.25 s makes the band mean "regressed past twice the noise
    # floor" for sub-quarter-second entries while changing nothing for
    # every entry whose cost is actually measurable at this granularity
    # — a real regression (0.2 s -> >0.5 s) still trips the band.
    FLOOR = 0.25
    # "value" is the RAW (unfloored) envelope total — the honest
    # wall-clock estimate a reader compares driver totals against —
    # while "queries" entries are floored for the 2x band checks only.
    # The two therefore intentionally disagree: recomputing a total
    # from "queries" yields value_floored, carried alongside so no
    # consumer has to re-derive (and so the disagreement is explicit).
    out = {
        "metric": "total",
        "value": round(sum(envelope.values()), 1),
        "value_floored": round(sum(max(v, FLOOR) for v in envelope.values()), 1),
        "unit": "sec",
        "queries": {k: round(max(v, FLOOR), 4) for k, v in sorted(envelope.items())},
        "sf": os.path.basename(args.sf),
        "envelope_of_runs": args.runs,
        "repeats_per_run": args.repeats,
        "floor": FLOOR,
        "runs": meta,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[baseline] wrote {args.out}: {len(envelope)} queries, "
          f"envelope total {out['value']}s")


if __name__ == "__main__":
    main()

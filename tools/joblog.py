#!/usr/bin/env python3
"""Parse a Spark event log into a per-query job breakdown.

Usage: python3 tools/joblog.py <eventlog-file> [query-name ...]

Groups jobs by spark.job.description (set per registry entry by
Bench.timeOnce), prints per-query total job time, job count, and the
top callsites; with query names given, prints every job for those
queries in submission order (callsite, duration, gap since previous
job end — the gap is driver-side planning/codegen/catalog time).
"""
import json, sys, collections

def main(path, wanted):
    jobs = {}  # id -> dict
    order = []
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            props = e.get("Properties") or {}
            desc = props.get("spark.job.description") or "<none>"
            site = ""
            stages = e.get("Stage Infos") or []
            if stages:
                # the last stage's callsite names the action
                site = stages[-1].get("Details", "").split("\n")[0]
                name = stages[-1].get("Stage Name", "")
            else:
                name = ""
            jobs[jid] = {"desc": desc, "t0": e["Submission Time"],
                         "site": name, "nstages": len(stages)}
            order.append(jid)
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = e["Completion Time"]
    agg = collections.defaultdict(lambda: [0.0, 0, collections.Counter()])
    prev_end = None
    gaps = collections.defaultdict(float)
    for jid in order:
        j = jobs[jid]
        if "t1" not in j:
            continue
        dur = (j["t1"] - j["t0"]) / 1000.0
        a = agg[j["desc"]]
        a[0] += dur
        a[1] += 1
        a[2][j["site"]] += dur
        if prev_end is not None:
            gaps[j["desc"]] += max(0.0, (j["t0"] - prev_end) / 1000.0)
        prev_end = j["t1"]
    if wanted:
        for jid in order:
            j = jobs[jid]
            if j["desc"] not in wanted or "t1" not in j:
                continue
            dur = (j["t1"] - j["t0"]) / 1000.0
            print(f'{j["desc"]:20s} {dur:7.3f}s  stages={j["nstages"]}  {j["site"][:90]}')
    else:
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        print(f'{"query":22s} {"jobs_s":>8s} {"gap_s":>7s} {"njobs":>5s}  top callsites')
        for desc, (tot, n, sites) in rows[:45]:
            top = ", ".join(f"{s.split(' at ')[-1] if ' at ' in s else s}:{v:.2f}"
                            for s, v in sites.most_common(3))
            print(f"{desc:22s} {tot:8.2f} {gaps[desc]:7.2f} {n:5d}  {top[:110]}")

if __name__ == "__main__":
    main(sys.argv[1], set(sys.argv[2:]))

#!/usr/bin/env python3
"""Rank bench keys by optimization signal from a full-suite event log:
per key — wall span, sum of job time, driver gap (span - job-covered
wall), and the largest low-parallelism (<= 4 tasks) stage >= 0.3 s.

Usage: joblog_rank.py /tmp/sparklogs/<ts> [top_n]
"""
import json, sys, os, glob, subprocess

def main():
    d = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    dirs = sorted(glob.glob(os.path.join(d, "eventlog_v2_*")), key=os.path.getmtime)
    paths = sorted(glob.glob(os.path.join(dirs[-1], "events_*")),
                   key=lambda p: int(os.path.basename(p).split("_")[1]))
    jobs = []   # (key, start, end, [stage ids])
    stages = {}
    for p in paths:
        if p.endswith(".zstd"):
            raw = subprocess.run(["zstd", "-dc", p], capture_output=True).stdout
            lines = raw.decode("utf-8", "replace").splitlines()
        else:
            lines = open(p).read().splitlines()
        pend = {}
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                props = ev.get("Properties") or {}
                pend[ev["Job ID"]] = [props.get("spark.job.description") or "",
                                      ev["Submission Time"],
                                      [s["Stage ID"] for s in ev.get("Stage Infos", [])]]
            elif e == "SparkListenerJobEnd":
                j = pend.pop(ev["Job ID"], None)
                if j:
                    jobs.append((j[0], j[1], ev["Completion Time"], j[2]))
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub and comp:
                    stages[si["Stage ID"]] = (si.get("Number of Tasks", 0),
                                              (comp - sub) / 1e3)
    # sequential attribution: keys run one at a time in Bench, so any
    # job whose description is NOT a bench key (streaming-engine jobs
    # relabel themselves) belongs to the most recent bench key seen
    jobs.sort(key=lambda j: j[1])
    # authoritative key set from the bench output map
    known = set()
    try:
        known = set(json.load(open("/root/repo/target/bench.json"))["queries"])
    except Exception:
        pass
    cur = ""
    attributed = []
    for key, s, e, sids in jobs:
        if key in known:
            cur = key
        attributed.append((cur, s, e, sids))
    jobs = attributed
    bykey = {}
    for key, s, e, sids in jobs:
        if not key:
            continue
        r = bykey.setdefault(key, {"s": s, "e": e, "job": 0.0,
                                   "iv": [], "lp": 0.0})
        r["s"] = min(r["s"], s); r["e"] = max(r["e"], e)
        r["job"] += (e - s) / 1e3
        r["iv"].append((s, e))
        for sid in sids:
            if sid in stages:
                nt, dur = stages[sid]
                if nt <= 4 and dur >= 0.3:
                    r["lp"] = max(r["lp"], dur)
    out = []
    for k, r in bykey.items():
        span = (r["e"] - r["s"]) / 1e3
        # union of job intervals -> covered wall; gap = span - covered
        iv = sorted(r["iv"])
        cov = 0; ce = None; cs = None
        for s, e in iv:
            if ce is None or s > ce:
                if ce is not None:
                    cov += ce - cs
                cs, ce = s, e
            else:
                ce = max(ce, e)
        if ce is not None:
            cov += ce - cs
        gap = span - cov / 1e3
        out.append((span, gap, r["job"], r["lp"], len(r["iv"]), k))
    out.sort(reverse=True)
    print(f"{'span':>7} {'gap':>6} {'sumjob':>7} {'1task':>6} {'njob':>5}  key")
    for span, gap, job, lp, nj, k in out[:top_n]:
        print(f"{span:>7.2f} {gap:>6.2f} {job:>7.2f} {lp:>6.2f} {nj:>5}  {k}")

if __name__ == "__main__":
    main()

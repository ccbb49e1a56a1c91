#!/usr/bin/env python3
"""Summarize Spark event logs: per-job wall time + gaps between jobs.

Usage: joblog_summary.py /tmp/sparklogs/<ts> [min_sec]
"""
import json, sys, os, glob

def main():
    d = sys.argv[1]
    min_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    files = [p for p in glob.glob(os.path.join(d, "*")) if os.path.isfile(p)]
    files += glob.glob(os.path.join(d, "eventlog_v2_*", "events_*"))
    if not files:
        print("no event logs in", d); return
    # rolling logs split into events_1..events_N of one app: read all,
    # in index order
    dirs = {os.path.dirname(p) for p in files if "eventlog_v2_" in p}
    if dirs:
        dd = max(dirs, key=os.path.getmtime)
        paths = sorted(glob.glob(os.path.join(dd, "events_*")),
                       key=lambda p: int(os.path.basename(p).split("_")[1]))
    else:
        paths = [max(files, key=os.path.getmtime)]
    path = paths[-1]
    jobs = {}
    stages = {}
    app_start = app_end = None
    lines = []
    for p in paths:
        if p.endswith(".zstd"):
            import subprocess
            raw = subprocess.run(["zstd", "-dc", p], capture_output=True).stdout
            lines += raw.decode("utf-8", "replace").splitlines()
        else:
            lines += open(p).read().splitlines()
    if True:
        for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description")
                        or props.get("callSite.short", ""),
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "dur": (comp - sub) / 1e3 if sub and comp else None,
                    "tasks": si.get("Number of Tasks"),
                }
    order = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    prev_end = app_start
    total_gap = 0.0
    print(f"{'job':>4} {'dur_s':>7} {'gap_s':>7}  description / top stage")
    for jid, j in order:
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1e3
        gap = (j["start"] - prev_end) / 1e3 if prev_end else 0.0
        total_gap += max(gap, 0.0)
        prev_end = max(prev_end or 0, j["end"])
        if dur < min_sec and gap < min_sec:
            continue
        top = ""
        js = [stages[s] for s in j["stages"] if s in stages and stages[s]["dur"]]
        if js:
            t = max(js, key=lambda s: s["dur"])
            top = f"[{t['tasks']}t {t['dur']:.2f}s] {t['name'][:80]}"
        print(f"{jid:>4} {dur:>7.2f} {gap:>7.2f}  {j['desc'] or ''} {top}")
    # per-description rollup (Bench sets description = key name)
    bykey = {}
    for j in jobs.values():
        if "end" not in j or not j["desc"]:
            continue
        k = j["desc"]
        r = bykey.setdefault(k, {"n": 0, "dur": 0.0, "s": j["start"], "e": j["end"]})
        r["n"] += 1
        r["dur"] += (j["end"] - j["start"]) / 1e3
        r["s"] = min(r["s"], j["start"]); r["e"] = max(r["e"], j["end"])
    if bykey:
        print("\nper-key: n_jobs sum_job_s span_s")
        for k, r in sorted(bykey.items(), key=lambda kv: -(kv[1]['e']-kv[1]['s'])):
            print(f"  {k:<40} {r['n']:>3} {r['dur']:>8.2f} {(r['e']-r['s'])/1e3:>8.2f}")
    if app_start and app_end:
        tj = sum((j['end'] - j['start']) / 1e3 for j in jobs.values() if 'end' in j)
        print(f"app total {(app_end-app_start)/1e3:.2f}s  sum(job) {tj:.2f}s  "
              f"sum(gaps>=0) {total_gap:.2f}s  n_jobs {len(jobs)}")
    print("log:", path)

if __name__ == "__main__":
    main()

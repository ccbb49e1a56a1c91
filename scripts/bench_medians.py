#!/usr/bin/env python3
"""Per-key median-of-N over bench.json runs + comparison vs a standing
medians file. Usage:
  scripts/bench_medians.py <runDir> [standingMedians.json]
Reads runDir/run*.json (graft.Bench output), writes runDir/medians.json,
prints totals, the slowest medians, and any key whose median exceeds
1.3x its standing median (the BASELINE.md adjudication protocol)."""
import sys, json, glob, statistics

run_dir = sys.argv[1]
standing_path = sys.argv[2] if len(sys.argv) > 2 else None

runs = []
for f in sorted(glob.glob(f"{run_dir}/run*.json")):
    d = json.load(open(f))
    runs.append(d["queries"])
    print(f"{f}: total {d['value']}s over {len(d['queries'])} keys")

keys = sorted(set().union(*[set(r) for r in runs]))
med = {k: round(statistics.median([r[k] for r in runs if k in r]), 3)
       for k in keys}
json.dump(med, open(f"{run_dir}/medians.json", "w"), indent=1, sort_keys=True)
print(f"median-of-{len(runs)} sum: {round(sum(med.values()), 1)}s over "
      f"{len(med)} keys = {round(sum(med.values())/len(med), 3)} s/query")
print("slowest medians:")
for k in sorted(med, key=med.get, reverse=True)[:12]:
    print(f"  {k}: {med[k]}")

if standing_path:
    standing = json.load(open(standing_path))
    flagged = [(k, med[k], standing[k]) for k in med
               if k in standing and standing[k] >= 0.2
               and med[k] > 1.3 * standing[k]]
    print(f"\nkeys over 1.3x standing median ({standing_path}):"
          if flagged else f"\nno key exceeds 1.3x its standing median ({standing_path})")
    for k, m, s in sorted(flagged, key=lambda t: -t[1] / t[2]):
        print(f"  {k}: {m} vs standing {s} ({round(m/s, 2)}x)")
    new = [k for k in med if k not in standing]
    if new:
        print("new keys (no standing):", ", ".join(f"{k}={med[k]}" for k in sorted(new)))

#!/usr/bin/env python3
"""Merge the sharded + patch ScaleSweep records into BENCH_sf1_full.json.

Precedence: later files override earlier ones per query (the patch runs
re-measure queries whose first measurement hit a derived-data pathology
or predate a fix). Queries whose ratio exceeds the gate are itemized
with their output-row growth where the record shows the result itself
grows super-linearly (constant-duplication-density synthetic corpora
make near-dup pair lists quadratic — more WORK, not a worse plan).
"""
import json
import sys

out = sys.argv[1] if len(sys.argv) > 1 else "BENCH_sf1_full.json"
inputs = sys.argv[2:] or [
    "/tmp/sweep_shard_0.json", "/tmp/sweep_shard_1.json",
    "/tmp/sweep_shard_2.json", "/tmp/sweep_shard_3.json",
    "/tmp/sweep_patch.json", "/tmp/sweep_patch2.json",
]

queries, failed, sources = {}, set(), []
for path in inputs:
    try:
        r = json.load(open(path))
    except FileNotFoundError:
        continue
    sources.append(path)
    queries.update(r.get("queries", {}))
    failed.update(r.get("failed", []))
failed -= set(queries)

GATE = 12.0
over = {
    n: q for n, q in queries.items() if q["ratio"] > GATE
}
itemized = {}
for n, q in sorted(over.items()):
    rows01, rows1 = q.get("rows_sf01", -1), q.get("rows_sf1", -1)
    growth = (rows1 / rows01) if rows01 and rows01 > 0 and rows1 > 0 else None
    if growth and q["ratio"] <= growth * 1.5:
        verdict = "output-bound: result grew %.0fx, runtime %.1fx (sublinear per row)" % (
            growth, q["ratio"])
    else:
        verdict = "over gate; see BASELINE.md scale-cliff notes"
    itemized[n] = {"ratio": q["ratio"], "rows_sf01": rows01,
                   "rows_sf1": rows1, "verdict": verdict}

worst = max(queries.items(), key=lambda kv: kv[1]["ratio"]) if queries else None
rec = {
    "metric": "sf1_full",
    "n_queries": len(queries),
    "sf01_total": round(sum(q["sf01_sec"] for q in queries.values()), 3),
    "sf1_total": round(sum(q["sf1_sec"] for q in queries.values()), 3),
    "gate_max_ratio": GATE,
    "worst_ratio": worst[1]["ratio"] if worst else None,
    "worst_query": worst[0] if worst else None,
    "n_over_gate": len(over),
    "over_gate": itemized,
    "failed": sorted(failed),
    "sources": sources,
    "queries": dict(sorted(queries.items())),
}
json.dump(rec, open(out, "w"), indent=None, separators=(",", ":"))
open(out, "a").write("\n")
print("wrote", out, "n=", len(queries), "worst=", rec["worst_query"],
      rec["worst_ratio"], "over_gate=", list(itemized))

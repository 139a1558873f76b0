#!/usr/bin/env python3
"""Merge full bench records by per-query MIN — the min-of-reps
estimator extended across runs. Contention only ever ADDS time, so the
cross-run min is the same steady-state-plan-cost estimator the in-run
min-of-3 already is; use when a run was visibly degraded (load spike /
CPU steal mid-shard) rather than discarding it. Every input's condition
block is preserved in the output under `runs` so the record stays
self-documenting.

Usage: python3 tools/merge_bench_min.py <out.json> <run1.json> <run2.json> [...]
"""
import json
import sys

COND_KEYS = ("sf", "cpus", "host_cpus", "load_avg", "load_avg_end",
             "heap_max_mb", "gc_total_sec", "code_cache_peak_mb",
             "code_cache_max_mb", "n_queries", "value",
             "streaming_suspect", "shards")

def main(out, inputs):
    queries, runs = {}, []
    base = None
    for path in inputs:
        r = json.load(open(path))
        base = base or r
        runs.append({k: r[k] for k in COND_KEYS if k in r})
        for q, t in r.get("queries", {}).items():
            queries[q] = min(t, queries[q]) if q in queries else t
    rec = dict(base)
    rec["queries"] = dict(sorted(queries.items()))
    rec["value"] = sum(queries.values())
    rec["n_queries"] = len(queries)
    rec["merged_min_of_runs"] = runs
    json.dump(rec, open(out, "w"), indent=1)
    print(f"{out}: {len(queries)} queries, total {rec['value']:.1f}s "
          f"(min over {len(runs)} runs)")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])

#!/usr/bin/env python3
"""Scaling-curve bench: run the dedup / ANN / stats query families at
sf0.001 / sf0.01 / sf0.1 through graft.Bench (same warm-up + interleaved
median-of-reps methodology as the per-round bench), fit a log-log slope
per query, and emit SCALING.json.

Interpretation: slope ~= d log(t) / d log(sf) over the measured range.
Fixed per-query overhead (session jobs, planning, JIT) dominates at tiny
SFs, so healthy bucketed operators show slope << 1 here (cost is mostly
sf-independent overhead); a slope near or above 1 means data-sized work
already dominates at these SFs and the query's 100 TB story deserves a
second look. The per-SF times are in SCALING.json for inspection either
way.

Usage: python3 tools/scaling.py   (from the repo root; ~10 min)
"""
import json
import math
import os
import subprocess
import sys

SFS = ["0.001", "0.01", "0.1"]

FAMILIES = {
    "dedup": ["x1_dedup_exact", "x2_dedup_minhash", "x3_dedup_simhash",
              "x41_dedup_clusters", "x52_incremental_dedup",
              "x61_dedup_keep_best", "x86_substring_dedup",
              "x88_image_phash_neardup", "x89_strip_repeated",
              "x90_audio_fp_neardup", "x91_multimodal_dedup",
              "x92_semantic_dedup"],
    "ann":   ["x8_knn_brute", "x9_knn_lsh", "x14_knn_ivf",
              "x76_pq_quantize", "x78_knn_ivf_pq", "x87_filtered_ann"],
    "stats": ["x20_stats_summary", "x62_winsorize", "x70_histogram",
              "x79_robust_scale"],
}


def bench_at(sf, names):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}",
               SPARK_GRAFT_ONLY=",".join(names),
               SPARK_GRAFT_REPS="3")
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                   check=True, capture_output=True, text=True)
    with open("/tmp/graft/bench_last.json") as f:
        return json.load(f)["queries"]


def main():
    names = [q for qs in FAMILIES.values() for q in qs]
    times = {}
    for sf in SFS:
        print(f"[scaling] bench at sf{sf} ({len(names)} queries)...", flush=True)
        for q, t in bench_at(sf, names).items():
            times.setdefault(q, {})[sf] = t
    slopes = {}
    for q, ts in times.items():
        pts = [(math.log(float(sf)), math.log(t))
               for sf, t in ts.items() if t > 0]
        if len(pts) >= 2:
            n = len(pts)
            mx = sum(x for x, _ in pts) / n
            my = sum(y for _, y in pts) / n
            sxx = sum((x - mx) ** 2 for x, _ in pts)
            sxy = sum((x - mx) * (y - my) for x, y in pts)
            slopes[q] = round(sxy / sxx, 3) if sxx else None
        else:
            slopes[q] = None
    family_of = {q: f for f, qs in FAMILIES.items() for q in qs}
    out = {
        "sfs": SFS,
        "reps": 3,
        "times_sec": times,
        "loglog_slope": slopes,
        "families": family_of,
    }
    with open("SCALING.json", "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps({"superlinear": {q: s for q, s in slopes.items()
                                      if s is not None and s > 1.0},
                      "max_slope": max((s for s in slopes.values()
                                        if s is not None), default=None)},
                     indent=2))
    print("[scaling] wrote SCALING.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())

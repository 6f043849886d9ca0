"""Focused N-vs-4N scaling probe — the north-rule criterion datapoint
without the ~40-minute full bench.

Why it exists (BASELINE.md round-5): the host's aggregate random-access
quota currently saturates at ~6k docs/s, so any leg above ~8 cores
measures the quota, not the engine. At N=1 vs 4N=4 the HIGH leg
(~4.3k docs/s) still fits under the quota, making 1->4 the one N/4N
pair the degraded host can answer honestly — if the window is clean.
This probe alternates fresh-JVM build legs (1,4,1,4,...), records the
same cpu/steal/gather columns as bench.py, and writes one JSON. Run it
the moment a clean window appears; it needs ~6 minutes, not 40.

Usage:  python tools/scale_probe.py [low] [reps]   (default 1, 2)
Env:    PEARS_BENCH_DOCS (default 99000 — the bench corpus)
Output: /tmp/scale_probe_<low>v<high>.json  (+ one line on stdout)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def main() -> None:
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    high = 4 * low
    n_docs = int(os.environ.get("PEARS_BENCH_DOCS", "99000"))
    cpath = bench.corpus_path(n_docs)

    pre_ceiling = bench.hardware_ceiling(low, high)
    pre_lat = bench.memlat(8)
    lo_runs, hi_runs, gathers = [], [], []
    for r in range(reps):
        # alternate legs so a mid-probe burst poisons both levels
        # equally instead of biasing one
        gathers.append(bench.memlat(8)["at8_inflation"])
        lo_runs.append(bench.timed_build(low, cpath, f"sp_lo{low}_{r}"))
        gathers.append(bench.memlat(8)["at8_inflation"])
        hi_runs.append(bench.timed_build(high, cpath, f"sp_hi{high}_{r}"))
    post_ceiling = bench.hardware_ceiling(low, high)
    post_lat = bench.memlat(8)

    t_lo = min(t[0] for t in lo_runs)
    t_hi = min(t[0] for t in hi_runs)
    thr_lo, thr_hi = n_docs / t_lo, n_docs / t_hi
    raw = thr_hi / (thr_lo * (high / low))
    cpu_lo = min(t[2] for t in lo_runs)
    cpu_hi = min(t[2] for t in hi_runs)
    # identical work at both levels: cpu-sec inflation is per-core
    # clock/stall degradation with occupancy, not the algorithm
    worknorm = round(raw * (cpu_hi / max(cpu_lo, 1e-9)), 3)
    out = {
        "cores_low": low, "cores_high": high, "n_docs": n_docs,
        "leg_times_low": [round(t[0], 2) for t in lo_runs],
        "leg_times_high": [round(t[0], 2) for t in hi_runs],
        "leg_cpu_low": [round(t[2], 1) for t in lo_runs],
        "leg_cpu_high": [round(t[2], 1) for t in hi_runs],
        "leg_steal_low": [round(t[3], 1) for t in lo_runs],
        "leg_steal_high": [round(t[3], 1) for t in hi_runs],
        "leg_gather": [round(g, 2) for g in gathers],
        "throughput_low": round(thr_lo, 1),
        "throughput_high": round(thr_hi, 1),
        "efficiency": round(raw, 3),
        "efficiency_work_normalized": worknorm,
        "hardware_ceiling_pre": round(pre_ceiling, 3),
        "hardware_ceiling_post": round(post_ceiling, 3),
        "memlat_pre": pre_lat, "memlat_post": post_lat,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = f"/tmp/scale_probe_{low}v{high}.json"
    with open(path, "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

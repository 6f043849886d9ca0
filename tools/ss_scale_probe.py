"""spark-submit --py-files N-vs-4N scaling probe — the north-rule
surface verbatim.

The rule asks for the pipeline to run "via spark-submit --py-files on
a multi-executor cluster at two cluster sizes (N and 4N executors)
with throughput scaling efficiency >= 0.8 between them". This sandbox
has one VM, so the two cluster sizes are proxied by two local[N]
parallelism levels of the SAME production entrypoint
(`jobs/run_job.py build`), launched exactly as a cluster submit would
be: a fresh `spark-submit --master local[N] --py-files
pears_lite_spark.zip` per leg, run from OUTSIDE the repo so only the
zip provides the package.

Protocol (mirrors bench.py's scaling legs):
- legs alternate low/high/high/low ... so a drifting host window
  penalizes both levels symmetrically;
- per leg we record the job's own printed `seconds` (cmd_build's
  in-process timing — includes Python-worker spawn + codegen warm,
  the honest production cold-start number), wall around the submit,
  VM-wide cpu/steal deltas from /proc/stat, and a concurrent-gather
  inflation probe between legs;
- throughput per level is best-of-reps; efficiency raw
  = (thr_hi/thr_lo)/(cores_hi/cores_lo) and work-normalized
  = min(1, raw x cpu_hi/cpu_lo) as in bench.py.

Coordinates with tools/window_watch.sh through /tmp/pears_busy and
refuses to start while a bench is running. One JSON line on stdout,
also written to /tmp/ss_scale_r5.json.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402  (corpus_path, _proc_stat, memlat, ceiling)

ZIP = "/tmp/pears_lite_spark.zip"


def ensure_zip():
    subprocess.run([sys.executable, os.path.join(REPO, "tools/make_pyfiles.py")],
                   check=True, capture_output=True)


def submit_build(cores: int, cpath: str, tag: str) -> dict:
    out = f"/tmp/ss_idx_{tag}"
    subprocess.run(["rm", "-rf", out], check=False)
    cmd = ["spark-submit", "--master", f"local[{cores}]",
           "--conf", "spark.ui.enabled=false",
           "--driver-memory", "8g",
           "--py-files", ZIP,
           os.path.join(REPO, "jobs/run_job.py"),
           "build", "--input", cpath, "--output", out]
    busy0, steal0 = bench._proc_stat()
    t0 = time.time()
    proc = subprocess.run(cmd, cwd="/tmp", capture_output=True,
                          text=True, timeout=1800)
    wall = time.time() - t0
    busy1, steal1 = bench._proc_stat()
    job = None
    for line in proc.stdout.splitlines():
        if line.startswith("{") and '"job"' in line:
            job = json.loads(line)
    if job is None:
        raise RuntimeError(f"no job JSON from spark-submit local[{cores}]: "
                           f"{proc.stdout[-400:]} {proc.stderr[-1500:]}")
    return {"cores": cores, "seconds": job["seconds"],
            "n_docs": job["n_docs"],
            "docs_per_sec": job["docs_per_sec"],
            "submit_wall": round(wall, 2),
            "cpu_sec": round(busy1 - busy0, 1),
            "steal_sec": round(steal1 - steal0, 1)}


def main():
    low = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    high = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    if os.path.exists("/tmp/pears_busy") or subprocess.run(
            ["pgrep", "-f", "python bench.py"],
            capture_output=True).returncode == 0:
        print(json.dumps({"error": "bench running — refusing to collide"}))
        return 1
    open("/tmp/pears_busy", "w").close()
    try:
        ensure_zip()
        cpath = bench.corpus_path(int(os.environ.get("PEARS_SS_DOCS", 99000)))
        gate = {"ceiling": bench.hardware_ceiling(low, high),
                "gather": bench.memlat(high)[f"at{high}_inflation"]}
        legs, gathers = [], []
        order = ([low, high] if reps == 1
                 else [low, high, high, low] + [low, high] * (reps - 2))
        for i, cores in enumerate(order[:2 * reps]):
            legs.append(submit_build(cores, cpath, f"ss{cores}_{i}"))
            gathers.append(round(
                bench.memlat(high)[f"at{high}_inflation"], 2))
            print(f"leg {i}: local[{cores}] {legs[-1]['seconds']}s = "
                  f"{legs[-1]['docs_per_sec']} docs/s "
                  f"(cpu {legs[-1]['cpu_sec']}, steal {legs[-1]['steal_sec']}, "
                  f"gather-after {gathers[-1]})", file=sys.stderr)
        lo = min((l for l in legs if l["cores"] == low),
                 key=lambda l: l["seconds"])
        hi = min((l for l in legs if l["cores"] == high),
                 key=lambda l: l["seconds"])
        eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (high / low)
        result = {
            "surface": "spark-submit --py-files (production job, "
                       "cold start timed in)",
            "cores_low": low, "cores_high": high,
            "launch_gate": {k: round(v, 3) for k, v in gate.items()},
            "legs": legs, "gather_after_each_leg": gathers,
            "throughput_low": lo["docs_per_sec"],
            "throughput_high": hi["docs_per_sec"],
            "best_leg_low": lo, "best_leg_high": hi,
            "efficiency": round(eff, 3),
            "efficiency_work_normalized": round(
                min(1.0, eff * hi["cpu_sec"] / max(lo["cpu_sec"], 1e-9)), 3),
        }
        line = json.dumps(result)
        print(line)
        with open("/tmp/ss_scale_r5.json", "w") as fh:
            fh.write(line)
        return 0
    finally:
        os.unlink("/tmp/pears_busy")


if __name__ == "__main__":
    raise SystemExit(main())

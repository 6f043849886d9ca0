#!/bin/bash
# Ceiling-gated bench launcher (round-5 protocol, BASELINE.md).
#
# Polls the cheap hardware_ceiling(2, 8) probe (~40 s of kernel-shaped
# numpy in 2 then 8 concurrent processes) every ~2.5 min and launches
# ONE full bench.py run the moment the host's process-scaling ceiling
# reads >= 0.70 — the clean-window precondition VERDICT r04 asked the
# confirmation sample to carry. A busy-flag handshake (/tmp/pears_busy)
# blocks the launch while foreground work (pytest, contract checks)
# owns the CPUs, so no sample overlaps other load. One-shot by design:
# results get reviewed before the next sample is armed.
cd "$(dirname "$0")/.."
for i in $(seq 1 200); do
  if [ -e /tmp/pears_busy ]; then
    sleep 60; continue
  fi
  c=$(python -c "import sys; sys.path.insert(0,'.'); import bench; print(bench.hardware_ceiling(2,8))" 2>/dev/null)
  ts=$(date +%H:%M:%S)
  echo "$ts probe $i ceiling=$c" >> /tmp/window_watch.log
  ok=$(python -c "print(1 if float('$c' or 0) >= 0.70 else 0)")
  if [ "$ok" = "1" ] && [ ! -e /tmp/pears_busy ]; then
    echo "$ts CLEAN WINDOW - launching full bench" >> /tmp/window_watch.log
    n=$(ls /tmp/bench_r5_s*.out 2>/dev/null | wc -l); n=$((n+1))
    PEARS_BENCH_REPEATS=3 python bench.py > /tmp/bench_r5_s$n.out 2> /tmp/bench_r5_s$n.err
    echo "$(date +%H:%M:%S) bench sample $n done" >> /tmp/window_watch.log
    exit 0
  fi
  sleep 150
done

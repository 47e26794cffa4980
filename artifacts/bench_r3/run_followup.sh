#!/bin/bash
# Round-3 follow-up TPU experiments (run after run_battery.sh):
# fixed shi kernel + pallas timing, fused single-dispatch remeasure,
# fresh XPlane trace of the tracking step.
cd /root/repo
D=artifacts/bench_r3
step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T) ===" | tee -a "$D/battery.log"
  timeout "$tmo" "$@" >"$D/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc $(date +%T) ===" | tee -a "$D/battery.log"
}
step pallas_stencils2 2400 python profile_pallas_stencils.py
step bench_fused 1800 python bench.py --fused
step trace 1800 python profile_trace.py
echo "=== FOLLOWUP COMPLETE $(date +%T) ===" | tee -a "$D/battery.log"

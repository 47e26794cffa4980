#!/bin/bash
# Round-3 follow-up TPU experiments (after run_battery.sh + fixes):
# raw headline with FINE_R_WIN=11, fixed shi kernel + pallas timing,
# fused single-dispatch remeasure, fresh XPlane trace, hostile ATE on
# the regenerated .npy dataset, engine bench with spike attribution.
cd /root/repo
D=artifacts/bench_r3
step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T) ===" | tee -a "$D/battery.log"
  timeout "$tmo" "$@" >"$D/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc $(date +%T) ===" | tee -a "$D/battery.log"
}
step bench_raw2 1800 python bench.py
step pallas_stencils2 2400 python profile_pallas_stencils.py
step bench_fused 1800 python bench.py --fused
step trace 1800 python profile_trace.py
step ate_hostile2 4800 python examples/run_tum.py /tmp/tum_hostile \
  --native --tpu --map "$D/hostile_map.ppm"
step bench_engine2 4800 python bench_engine.py
echo "=== FOLLOWUP COMPLETE $(date +%T) ===" | tee -a "$D/battery.log"
step bench_large2 7200 python bench_large.py
echo "=== FOLLOWUP2 COMPLETE $(date +%T) ===" | tee -a "$D/battery.log"

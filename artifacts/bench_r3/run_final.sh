#!/bin/bash
cd /root/repo
D=artifacts/bench_r3
step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T) ===" | tee -a "$D/battery.log"
  timeout "$tmo" "$@" >"$D/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc $(date +%T) ===" | tee -a "$D/battery.log"
}
step pallas_final 1500 python profile_pallas_stencils.py
step bench_engine3 2400 python bench_engine.py
step bench_large3 2400 python bench_large.py
step bench_default 900 python bench.py
echo "=== FINAL COMPLETE $(date +%T) ===" | tee -a "$D/battery.log"

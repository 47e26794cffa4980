#!/bin/bash
# Round-3 TPU measurement battery. Sequential (host must stay idle
# during timed TPU loops — CLAUDE.md). Each step logs to its own file;
# a step failing/timing out does not stop the battery.
cd /root/repo
D=artifacts/bench_r3
mkdir -p "$D"
step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T) ===" | tee -a "$D/battery.log"
  timeout "$tmo" "$@" >"$D/$name.log" 2>&1
  rc=$?
  echo "=== $name done rc=$rc $(date +%T) ===" | tee -a "$D/battery.log"
}

# 0. hostile validation dataset (CPU prep, no TPU timing yet)
if [ ! -f /tmp/tum_hostile/rgb.txt ]; then
  step synthgen 1800 python examples/make_synth_tum.py /tmp/tum_hostile \
    --frames 240 --nonplanar --hostile --trajectory loop
fi

# 1. raw tracking loop (headline)
step bench_raw 1800 python bench.py
# 2. bf16 ZMSSD cross-term lever
step bench_bf16cross 1800 python bench.py --bf16-cross
# 3. Pallas banded stencils: parity + on-chip timing (enable-or-delete)
step pallas_stencils 2400 python profile_pallas_stencils.py
# 4. engine-level FPS with tiered BA (the round-2 placeholder)
step bench_engine 4800 python bench_engine.py
# 5. ATE on hostile imagery, product path on TPU
step ate_hostile 4800 python examples/run_tum.py /tmp/tum_hostile \
  --native --tpu --map "$D/hostile_map.ppm"
# 6. large-map scale: 64 KF / 8192 pts
step bench_large 7200 python bench_large.py
# 7. refresh mapping/BA latency rows
step bench_mapping 3600 python bench_mapping.py
step bench_ba 3600 python bench_ba.py
echo "=== BATTERY COMPLETE $(date +%T) ===" | tee -a "$D/battery.log"

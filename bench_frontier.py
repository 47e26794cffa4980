"""Benchmark: max-rate KF growth vs throughput frontier (VERDICT r4 #7).

The engine's deferred-decision pipeline means a keyframe can be added at
most once per decision READ; at an unthrottled (faster-than-device) feed
reads land only at the staleness cap / chunky-drain cadence, so map
growth throttles with the decision interval. The reference never faces
this (its decisions are same-thread per frame, ref: src/Tracker.cc:
128-178) — the TPU-native engine trades decision latency for dispatch
pipelining, and this bench MEASURES that frontier so offline batch
replay has a recipe: pick the decision_interval column with the growth
rate you need at the throughput you can afford.

For each decision_interval in {1, 2, 4, 8}: run the SAME max-rate
(unpaced) 230-frame feed from a fresh engine, record keyframes reached,
frames-per-KF, and as-printed FPS. One JSON line with all columns.

Round-5 relevant change: after a chunky pipeline drain (one blocking
wait per ~32 frames at max rate) the engine force-lands the pending
decision on the next frame, so even interval=8 makes decisions at drain
cadence instead of only at the 2x-interval staleness cap.
"""

import json
import sys
import time

import numpy as np


def run_one(interval: int, frames, cfg, size, n_measure: int) -> dict:
    import jax

    from ptam_cg_tpu.models import engine as engine_lib

    eng = engine_lib.SLAMEngine(cfg, image_size=size, max_points=4096,
                                max_kfs=64, auto_init_frames=6, seed=0,
                                decision_interval=interval)
    eng.mapmaker._tier_c_floor = 64
    eng.mapmaker._tier_p_floor = 4096
    eng.mapmaker._tier_m_floor = 32768

    # Init phase at 30 Hz until TRACKING *and* the mapping jobs have
    # compiled (first KF integrations + BA fire in the first dozens of
    # frames; on this remote-compile backend each first-touch compile is
    # 15 s - 3 min and must not land inside the measured window — the
    # first frontier run measured 3 FPS because it did). Identical
    # across runs, so columns stay comparable.
    period = 1.0 / 30.0
    next_tick = time.perf_counter()
    i = 0
    while True:
        now = time.perf_counter()
        if now < next_tick:
            time.sleep(next_tick - now)
        next_tick = max(next_tick + period, time.perf_counter())
        info = eng.process_frame(jax.device_put(frames[i]))
        i += 1
        if info.stage == "TRACKING" and eng.mapmaker.n_kfs() >= 5:
            break
        if i >= 120:
            raise RuntimeError(f"init/growth warmup stalled: {info}")
    # Land in-flight work, then force-compile the remaining job types
    # (local BA fires only at >= 8 KFs etc.) exactly like bench_engine.
    mm = eng.mapmaker
    mm.map = eng.map
    slot = mm.drain_all()
    if slot is not None:
        eng.newest_kf = slot
    newest = 1 if eng.newest_kf is None else eng.newest_kf
    mm._jit_local_masks(mm.map, newest)
    mm.bundle_adjust_recent(newest)
    mm.bundle_adjust_all(full=False)
    mm.mark_dirty()
    mm.handle_bad_points()
    mm._failures_pending = True
    mm.refind_from_failure_queue()
    jax.block_until_ready(mm.map.point_pos)
    eng.map = mm.map
    kfs0 = eng.mapmaker.n_kfs()

    nxt = jax.device_put(frames[i])
    t0 = time.perf_counter()
    n = 0
    for j in range(i, min(i + n_measure, len(frames))):
        cur = nxt
        if j + 1 < len(frames):
            nxt = jax.device_put(frames[j + 1])
        info = eng.process_frame(cur)
        n += 1
    total = time.perf_counter() - t0
    kfs = eng.mapmaker.n_kfs()
    grown = kfs - kfs0
    out = {
        "decision_interval": interval,
        "frames": n,
        "kfs_grown": int(grown),
        "frames_per_kf": round(n / max(grown, 1), 1),
        "fps": round(n / total, 1),
    }
    eng.close()
    return out


def main():
    from ptam_cg_tpu.config import (CameraConfig, EngineConfig,
                                    MapMakerConfig, TrackerConfig)
    from ptam_cg_tpu.io import synth

    size = (640, 480)
    params = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
    n_frames = 300
    seq = synth.SyntheticSequence(params, image_size=size,
                                  n_frames=n_frames, seed=11, height=1.5,
                                  radius=1.0, sweep=1.5)
    frames = [np.asarray(seq.frame(i)).astype(np.uint8)
              for i in range(n_frames)]
    cfg = EngineConfig(
        camera=CameraConfig(params=params, image_size=size),
        tracker=TrackerConfig(min_frames_between_kfs=2),
        mapmaker=MapMakerConfig(candidate_min_shi_tomasi_score=100.0,
                                max_kf_dist_wiggle_mult=0.12))

    intervals = [1, 2, 4, 8]
    # A 30 Hz-paced interval=1 reference column: the growth rate the
    # max-rate columns are judged against (VERDICT r4 #7: "within ~2x of
    # the 30 Hz-paced rate, or a measured frontier").
    rows = []
    for iv in intervals:
        row = run_one(iv, frames, cfg, size, n_measure=230)
        rows.append(row)
        print(f"# interval={iv}: {row}", file=sys.stderr)

    best_growth = min(r["frames_per_kf"] for r in rows)
    best_fps = max(r["fps"] for r in rows)
    print(json.dumps({
        "metric": "kf_growth_frontier_maxrate",
        "value": best_growth,
        "unit": "frames/KF (best over decision_interval sweep)",
        "vs_baseline": 0,
        "best_fps": best_fps,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()

"""Deterministic replay (round 5 — VERDICT r4 #2).

The reference's dataset harness is its de-facto integration test
precisely because replay is deterministic (ref: src/VideoSource.cc:
59-151): the same sequence always produces the same map. The round-4
scheduler broke that here — BA chunk sizes came from a wall-clock EMA
and every readiness gate was a host-load-dependent branch, so the same
seeded run produced different keyframe cadences on a loaded vs idle
host (the 128-KF capacity e2e failed under suite load at 123/128).

Round 5: ``deterministic`` mode (the CPU-backend default) makes engine
+ mapping scheduling a pure function of the frame sequence and seed —
fixed-size BA chunks, every readiness gate blocks. These tests run the
same sequence twice, the second time under SIMULATED HOST LOAD
(a per-frame sleep plus a monkeypatched ``time.perf_counter`` that
jumps erratically — the exact signal the old EMA sizer consumed), and
require byte-identical maps.
"""

import time

import numpy as np
import pytest

from ptam_cg_tpu.config import (CameraConfig, EngineConfig,
                                MapMakerConfig, TrackerConfig)
from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import engine as engine_lib
from ptam_cg_tpu.models import mapmaker as mm

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (320, 240)
N_FRAMES = 60


def _run(load: bool, monkeypatch=None):
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=N_FRAMES, seed=9, height=1.5,
                                  radius=0.6, sweep=1.4)
    cfg = EngineConfig(
        camera=CameraConfig(params=REF_PARAMS, image_size=SIZE),
        tracker=TrackerConfig(min_frames_between_kfs=2),
        mapmaker=MapMakerConfig(candidate_min_shi_tomasi_score=70.0,
                                max_kf_dist_wiggle_mult=0.15))
    eng = engine_lib.SLAMEngine(cfg, image_size=SIZE, max_points=2048,
                                max_kfs=16, auto_init_frames=5, seed=0)
    assert eng._deterministic           # CPU backend auto-selects it
    assert eng.mapmaker.deterministic

    if load:
        # Distort the scheduler's clock: perf_counter jumps by random
        # 0-80 ms increments per call (a loaded host's view of time).
        real = time.perf_counter
        rng = np.random.default_rng(123)
        skew = [0.0]

        def jittery():
            skew[0] += float(rng.uniform(0.0, 0.08))
            return real() + skew[0]

        monkeypatch.setattr(mm.time, "perf_counter", jittery)

    kf_counts = []
    for i in range(N_FRAMES):
        if load and i % 3 == 0:
            time.sleep(0.01)            # uneven host stalls
        info = eng.process_frame(seq.frame(i))
        kf_counts.append(info.n_kfs)
    # Land everything in flight so final maps are comparable.
    eng.mapmaker.map = eng.map
    eng.mapmaker.drain_all()
    eng.map = eng.mapmaker.map
    return eng, kf_counts


@pytest.mark.slow
def test_replay_identical_under_load(monkeypatch):
    eng_a, kfs_a = _run(load=False)
    eng_b, kfs_b = _run(load=True, monkeypatch=monkeypatch)

    # Keyframe cadence is identical frame by frame...
    assert kfs_a == kfs_b
    assert kfs_a[-1] >= 4, kfs_a[-1]    # and the run actually mapped
    # ...and the final maps are bit-identical.
    np.testing.assert_array_equal(np.asarray(eng_a.map.point_valid),
                                  np.asarray(eng_b.map.point_valid))
    np.testing.assert_array_equal(np.asarray(eng_a.map.point_pos),
                                  np.asarray(eng_b.map.point_pos))
    np.testing.assert_array_equal(np.asarray(eng_a.map.kf_R),
                                  np.asarray(eng_b.map.kf_R))
    np.testing.assert_array_equal(np.asarray(eng_a.map.kf_t),
                                  np.asarray(eng_b.map.kf_t))
    np.testing.assert_array_equal(np.asarray(eng_a.map.meas_valid),
                                  np.asarray(eng_b.map.meas_valid))

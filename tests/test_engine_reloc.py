"""Engine-level failure/recovery ladder: lost tracking -> relocalization
(ref behavior: src/Tracker.cc:129,168-207 + src/Relocaliser.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.config import CameraConfig, EngineConfig, MapMakerConfig
from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import engine as engine_lib

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (320, 240)


@pytest.mark.slow
def test_lost_then_relocalize():
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=16, seed=5, height=1.5,
                                  radius=0.35, sweep=1.3)
    cfg = EngineConfig(
        camera=CameraConfig(params=REF_PARAMS, image_size=SIZE),
        mapmaker=MapMakerConfig(candidate_min_shi_tomasi_score=70.0))
    eng = engine_lib.SLAMEngine(cfg, image_size=SIZE, max_points=1024,
                                max_kfs=8, auto_init_frames=6, seed=0)
    for i in range(12):
        info = eng.process_frame(seq.frame(i))
    assert info.stage == "TRACKING"
    assert info.quality == 2

    # Feed garbage frames: tracking must degrade (NB like the reference,
    # relocalization "near-always succeeds by design" —
    # src/Tracker.cc:190-195 — so lost_frames cycles through reloc
    # attempts rather than climbing monotonically).
    rng = np.random.default_rng(0)
    relocalized = False
    for _ in range(6):
        noise = rng.uniform(0, 255, (240, 320)).astype(np.float32)
        info = eng.process_frame(noise)
        relocalized = relocalized or info.relocalized
    assert info.quality != 2

    # Now show it real frames near keyframe territory. The lost counter
    # has to climb past max_lost_frames again before reloc re-fires
    # (it resets on every "successful" attempt), so allow a few frames.
    for i in (6, 7, 8, 6, 7, 8, 7, 7):
        info = eng.process_frame(seq.frame(i))
        relocalized = relocalized or info.relocalized
        if info.quality == 2:
            break
    assert relocalized
    assert info.quality == 2, info
    assert info.n_found > 50


@pytest.mark.slow
def test_poisoned_ba_ditches_map():
    """BA numerical failure -> MapMaker.reset_requested -> full engine
    reset on the next frame (ref: src/MapMaker.cc:887-892 "Ditching the
    map" + Bundle::Compute -1, src/Bundle.cc:149-150)."""
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=16, seed=5, height=1.5,
                                  radius=0.35, sweep=1.3)
    cfg = EngineConfig(
        camera=CameraConfig(params=REF_PARAMS, image_size=SIZE),
        mapmaker=MapMakerConfig(candidate_min_shi_tomasi_score=70.0))
    eng = engine_lib.SLAMEngine(cfg, image_size=SIZE, max_points=1024,
                                max_kfs=8, auto_init_frames=6, seed=0)
    for i in range(10):
        info = eng.process_frame(seq.frame(i))
    assert info.stage == "TRACKING"

    # Poison the measurement table ON DEVICE: absurd-but-finite pixel
    # positions drive the robust objective sum past float32 range, so
    # the next global BA's LM step sees a non-finite error and raises
    # LMState.failed — the genuine numeric blow-up chain, no flags set
    # by hand (VERDICT r2 #6). Tracking itself never reads map.meas_pos,
    # so the engine keeps running until BA trips.
    m = eng.map
    poisoned = m._replace(meas_pos=jnp.where(
        m.meas_valid[..., None], jnp.float32(3e19), m.meas_pos))
    eng.map = poisoned
    eng.mapmaker.map = poisoned
    # Make the priority loop re-run global BA on the poisoned map.
    eng.mapmaker.converged_recent = True
    eng.mapmaker.converged_full = False
    saw_reset = False
    for i in range(10, 16):
        info = eng.process_frame(seq.frame(i))
        if info.stage == "NOT_STARTED":
            saw_reset = True
            break
    # LM failed -> reset_requested -> engine ditched the map
    # (ref: src/Bundle.cc:149-150, src/MapMaker.cc:887-892).
    assert saw_reset, "poisoned BA never tripped the reset chain"
    assert info.n_points == 0 and info.n_kfs == 0
    assert not eng.mapmaker.reset_requested  # fresh MapMaker after reset

    # The engine must be able to re-initialize afterwards.
    reinit = False
    for i in list(range(16)) + list(range(16)):
        info = eng.process_frame(seq.frame(i))
        if info.stage == "TRACKING":
            reinit = True
            break
    assert reinit

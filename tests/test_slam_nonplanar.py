"""Non-planar scene + genuine-loss relocalization E2E (VERDICT r1 #5:
all round-1 E2E evidence was purely planar; these run the engine on
rendered imagery with raised blocks/occlusion and with a real camera
jump-away-and-back)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.config import CameraConfig, EngineConfig, MapMakerConfig
from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import engine as engine_lib
from ptam_cg_tpu.utils import evaluate
from ptam_cg_tpu.utils.se3 import SE3

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (320, 240)


def make_engine(seed=0, max_kfs=8):
    cfg = EngineConfig(
        camera=CameraConfig(params=REF_PARAMS, image_size=SIZE),
        mapmaker=MapMakerConfig(candidate_min_shi_tomasi_score=70.0))
    return engine_lib.SLAMEngine(cfg, image_size=SIZE, max_points=1024,
                                 max_kfs=max_kfs, auto_init_frames=6,
                                 seed=seed)


def test_render_scene_blocks_occlude():
    """The block renderer produces genuine occlusion: pixels where a
    block hides the plane differ from the planar render, and the
    occluded set shifts with viewpoint (parallax)."""
    boxes = synth.default_blocks(seed=2, n=4)
    seq_p = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                    n_frames=8, seed=5, radius=0.5,
                                    sweep=1.5)
    seq_b = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                    n_frames=8, seed=5, radius=0.5,
                                    sweep=1.5, boxes=boxes)
    d0 = np.abs(np.asarray(seq_b.frame(0)) - np.asarray(seq_p.frame(0)))
    d7 = np.abs(np.asarray(seq_b.frame(7)) - np.asarray(seq_p.frame(7)))
    m0, m7 = d0 > 5.0, d7 > 5.0
    assert m0.mean() > 0.01          # blocks cover some of the image
    assert m0.mean() < 0.8           # …but the plane still dominates
    # Parallax: the occlusion masks differ between viewpoints.
    assert (m0 ^ m7).mean() > 0.005


@pytest.mark.slow
def test_nonplanar_e2e_ate():
    """Full init→track→map on the raised-block scene (BASELINE config 4
    class): off-plane structure must not break the homography init, and
    ATE stays bounded."""
    boxes = synth.default_blocks(seed=2, n=4)
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=26, seed=5, height=1.5,
                                  radius=0.35, sweep=1.3, boxes=boxes)
    eng = make_engine()
    infos = []
    for i in range(26):
        infos.append(eng.process_frame(seq.frame(i)))
    tracking = [(i, inf) for i, inf in enumerate(infos)
                if inf.stage == "TRACKING"]
    assert len(tracking) > 12
    good = sum(1 for _, inf in tracking if inf.quality == 2)
    assert good / len(tracking) > 0.7, [inf.quality for _, inf in tracking]

    est, gt = [], []
    for i, inf in tracking:
        est.append(np.asarray(evaluate.camera_centers(
            SE3(inf.pose.R[None], inf.pose.t[None])))[0])
        c = seq.pose(i)
        gt.append(np.asarray(-jnp.asarray(c.R).T @ jnp.asarray(c.t)))
    ate = evaluate.ate_rmse(jnp.asarray(np.stack(est)),
                            jnp.asarray(np.stack(gt)))
    span = np.linalg.norm(np.stack(gt).max(0) - np.stack(gt).min(0))
    assert float(ate) < 0.08 * max(span, 0.1), (float(ate), span)


@pytest.mark.slow
def test_genuine_loss_relocalization():
    """Camera jumps far away (rendered frames of a DIFFERENT part of the
    world) -> tracking lost -> camera returns -> SBI relocalization
    recovers on imagery, not on hand-perturbed state
    (ref: src/Relocaliser.cc:12-38 + quality ladder
    src/Tracker.cc:1062-1107)."""
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=16, seed=5, height=1.5,
                                  radius=0.35, sweep=1.3)
    eng = make_engine()
    for i in range(12):
        info = eng.process_frame(seq.frame(i))
    assert info.stage == "TRACKING" and info.quality == 2

    # Jump: same scene, camera 3 world-units away — the tiled texture
    # there shares no local structure with the map.
    def far_frame(i, dx=3.0):
        p = seq.pose(i)
        t = p.t - p.R @ jnp.asarray([dx, 0.0, 0.0], jnp.float32)
        return seq._render(SE3(p.R, t))

    lost_seen = False
    for i in range(6):
        info = eng.process_frame(far_frame(6 + (i % 3)))
        lost_seen = lost_seen or info.quality != 2
    assert lost_seen

    # Return near keyframe territory: reloc must fire and recover.
    relocalized = False
    recovered = False
    for i in (8, 7, 8, 7, 8, 7, 8, 7):
        info = eng.process_frame(seq.frame(i))
        relocalized = relocalized or info.relocalized
        if info.quality == 2:
            recovered = True
            break
    assert relocalized
    assert recovered

"""Relocalizer tests (ref: src/Relocaliser.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import keyframe, map_state, relocalizer, tracker
from ptam_cg_tpu.utils import se3 as se3lib

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (320, 240)


@pytest.fixture(scope="module")
def setup():
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=12, seed=9, height=1.5,
                                  radius=0.4, sweep=1.5)
    m = map_state.empty_map(SIZE, max_points=64, max_kfs=4)
    ffs = []
    for i, fidx in enumerate([0, 5, 10]):
        ff = keyframe.build_frame(seq.frame(fidx),
                                  candidate_min_score=70.0)
        m = map_state.insert_keyframe(m, i, ff, seq.pose(fidx))
        ffs.append(ff)
    return seq, m, ffs


def test_reloc_picks_matching_keyframe(setup):
    seq, m, ffs = setup
    # A frame close to keyframe 1 (frame 5) should pick it.
    ff6 = keyframe.build_frame(seq.frame(6), candidate_min_score=70.0)
    res = relocalizer.attempt_recovery(
        m, ff6.sbi, jnp.asarray(REF_PARAMS, jnp.float32), (15, 20))
    assert bool(res.success)
    assert int(res.best_kf) == 1, int(res.best_kf)
    # Proposed pose close to the keyframe's (rotation-only correction).
    rel = se3lib.mul(res.pose, se3lib.inv(seq.pose(6)))
    ang = float(jnp.linalg.norm(se3lib.so3_log(rel.R)))
    assert ang < 0.15, ang


def test_reloc_exact_keyframe_scores_zero(setup):
    seq, m, ffs = setup
    res = relocalizer.attempt_recovery(
        m, ffs[0].sbi, jnp.asarray(REF_PARAMS, jnp.float32), (15, 20))
    assert bool(res.success)
    assert int(res.best_kf) == 0
    assert float(res.score) < 1.0


def test_reloc_ignores_invalid_keyframes(setup):
    seq, m, ffs = setup
    m2 = m._replace(kf_valid=m.kf_valid.at[1].set(False))
    ff6 = keyframe.build_frame(seq.frame(6), candidate_min_score=70.0)
    res = relocalizer.attempt_recovery(
        m2, ff6.sbi, jnp.asarray(REF_PARAMS, jnp.float32), (15, 20))
    assert int(res.best_kf) != 1


def test_local_point_mask(setup):
    seq, m, ffs = setup
    P = m.point_pos.shape[0]
    # Fabricate: points 0-9 measured by kf0, 10-19 by kf2.
    mv = np.zeros((4, P), bool)
    mv[0, :10] = True
    mv[2, 10:20] = True
    m2 = m._replace(meas_valid=jnp.asarray(mv),
                    point_valid=jnp.ones(P, bool))
    # Pose at kf0: nearest KFs include kf0 -> points 0..9 present.
    mask = tracker.local_point_mask(m2, seq.pose(0), n_nearest=1)
    got = np.asarray(mask)
    assert got[:10].all()
    assert not got[10:20].any() or got[10:20].all() is False

"""FrameFeatures / synthetic renderer tests (ref: src/KeyFrame.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import keyframe
from ptam_cg_tpu.ops import levels as levelops

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)


@pytest.fixture(scope="module")
def seq():
    return synth.SyntheticSequence(REF_PARAMS, image_size=(320, 240),
                                   n_frames=4, seed=0)


@pytest.fixture(scope="module")
def frame0(seq):
    return seq.frame(0)


def test_render_produces_texture(frame0):
    im = np.asarray(frame0)
    assert im.shape == (240, 320)
    assert im.std() > 10.0           # textured, not flat
    assert im.min() >= 0.0 and im.max() <= 255.0
    # Most pixels hit the plane.
    assert (im > 0).mean() > 0.9


def test_sequential_frames_differ_but_overlap(seq):
    a = np.asarray(seq.frame(0))
    b = np.asarray(seq.frame(3))
    assert not np.allclose(a, b)
    # Correlation should remain high for a slow trajectory.
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.3, corr


def test_build_frame_features(frame0):
    ff = keyframe.build_frame(frame0, candidate_min_score=100.0)
    assert ff.atlas.shape == (360, 320)
    counts = np.asarray(ff.corner_count)
    assert np.all(counts > 0), counts     # corners on every level
    assert np.asarray(ff.max_valid).sum() > 20
    assert np.asarray(ff.cand_valid).sum() > 5
    # SBI present.
    assert ff.sbi.template.shape == (15, 20)  # 240x320 -> level3 30x40 -> /2


def test_corner_mask_matches_levels(frame0):
    ff = keyframe.build_frame(frame0, candidate_min_score=100.0)
    # Level-0 corner mask region must match a direct detection.
    from ptam_cg_tpu.ops import fast as fastops
    m0 = levelops.unpack_level(ff.corner_mask.astype(jnp.float32), 0,
                               240, 320) > 0.5
    direct, _ = fastops.fast_score_map(frame0, 10.0)
    np.testing.assert_array_equal(np.asarray(m0), np.asarray(direct))


def test_max_corners_are_in_level_bounds(frame0):
    ff = keyframe.build_frame(frame0, candidate_min_score=100.0)
    sizes = [(240 >> l, 320 >> l) for l in range(4)]
    for lev in range(4):
        valid = np.asarray(ff.max_valid[lev])
        xy = np.asarray(ff.max_xy[lev])[valid]
        if len(xy) == 0:
            continue
        h, w = sizes[lev]
        assert xy[:, 0].min() >= 0 and xy[:, 0].max() < w
        assert xy[:, 1].min() >= 0 and xy[:, 1].max() < h


def test_build_frame_jits(frame0):
    fn = jax.jit(lambda im: keyframe.build_frame(im,
                                                 candidate_min_score=100.0))
    ff = fn(frame0)
    assert ff.atlas.shape == (360, 320)

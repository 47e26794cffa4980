"""Visualization tests: map viewer renders + AR compositor
(ref parity: src/MapViewer.cc, src/ARDriver.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.camera import atan
from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import map_state
from ptam_cg_tpu.utils import se3 as se3lib
from ptam_cg_tpu.viz import ar, mapviewer

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (320, 240)


def small_map():
    m = map_state.empty_map(SIZE, max_points=64, max_kfs=4)
    rng = np.random.default_rng(0)
    pts = rng.uniform([-0.5, -0.5, 0], [0.5, 0.5, 0.02],
                      (32, 3)).astype(np.float32)
    P = m.point_pos.shape[0]
    pos = np.zeros((P, 3), np.float32)
    pos[:32] = pts
    m = m._replace(
        point_pos=jnp.asarray(pos),
        point_valid=jnp.asarray(np.arange(P) < 32),
        point_src_level=jnp.asarray(
            rng.integers(0, 4, P).astype(np.int32)),
        kf_valid=m.kf_valid.at[0].set(True),
        kf_t=m.kf_t.at[0].set(jnp.array([0.0, 0.0, 1.5])))
    return m


def test_topdown_render(tmp_path):
    m = small_map()
    img = mapviewer.render_topdown(m, size=(400, 400))
    assert img.shape == (400, 400, 3)
    # Colored points drawn (not all background).
    assert (img != 25).any(axis=-1).sum() > 100
    mapviewer.save_ppm(str(tmp_path / "map.ppm"), img)
    raw = open(tmp_path / "map.ppm", "rb").read()
    assert raw.startswith(b"P6 400 400 255")


def test_overlay_tracked_points():
    m = small_map()
    cam = atan.make_camera(REF_PARAMS, SIZE)
    pose = se3lib.SE3(jnp.eye(3), jnp.array([0.0, 0.0, 1.5]))
    pix, levels, mask = mapviewer.project_points_into_frame(
        m, pose, cam, SIZE)
    assert mask.sum() > 10
    frame = np.full((240, 320), 100.0, np.float32)
    img = mapviewer.overlay_tracked_points(frame, pix, levels, mask)
    assert img.shape == (240, 320, 3)
    assert (img != 100).any()


def test_undistort_redistort_roundtrip():
    cam = atan.make_camera(REF_PARAMS, SIZE)
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=1, seed=0)
    frame = seq.frame(0)
    # 2x UFB intermediate like the reference's 1200x900 FBO for 640x480
    # (ref: src/ARDriver.cc:25-30).
    linear = ar.undistort_frame(frame, cam, (640, 480))
    back = ar.redistort_frame(linear, cam, SIZE)
    # Central region should round-trip closely.
    a = np.asarray(frame)[60:180, 80:240]
    b = np.asarray(back)[60:180, 80:240]
    err = np.abs(a - b).mean()
    assert err < 6.0, err


def test_ar_render_draws_cube():
    cam = atan.make_camera(REF_PARAMS, SIZE)
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=1, seed=0)
    frame = seq.frame(0)
    pose = seq.pose(0)
    verts, tris, shades = ar.make_cube(0.3)
    out = ar.render_ar_frame(frame, pose, cam, SIZE, verts, tris, shades,
                             ufb_size=(320, 240))
    assert out.shape == (240, 320)
    diff = np.abs(np.asarray(out) - np.asarray(frame))
    changed = (diff > 20).sum()
    assert 50 < changed < 240 * 320 * 0.5, changed

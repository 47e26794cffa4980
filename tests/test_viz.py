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


def test_eye_game_tracks_camera():
    """EyeGame parity (ref: src/EyeGame.cc:15-241): pupils re-orient
    toward the camera, so the geometry must change with camera center
    while the eyeball centers stay fixed."""
    import jax
    import numpy as np
    from ptam_cg_tpu.viz import ar as arlib

    c1 = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    c2 = jnp.asarray([0.5, 0.3, 1.0], jnp.float32)
    v1, t1, s1 = arlib.make_eye_game(c1)
    v2, t2, s2 = arlib.make_eye_game(c2)
    # Static topology stays numpy so callers can jit around it.
    assert isinstance(t1, np.ndarray)
    np.testing.assert_array_equal(t1, t2)
    v1, v2 = np.asarray(v1), np.asarray(v2)
    # 4 eyes x (6 sphere verts + 7 pupil verts); sphere verts identical,
    # pupil verts move with the camera.
    assert v1.shape == (4 * 13, 3)
    for e in range(4):
        o = e * 13
        np.testing.assert_allclose(v1[o:o + 6], v2[o:o + 6], atol=1e-6)
        assert np.abs(v1[o + 6:o + 13] - v2[o + 6:o + 13]).max() > 1e-3


def test_render_ar_frame_with_eye_game():
    """Full AR composite with the animated content stays jittable and
    draws both bright sclera and dark pupil pixels."""
    import jax
    import numpy as np
    from ptam_cg_tpu.camera import atan
    from ptam_cg_tpu.utils.se3 import SE3
    from ptam_cg_tpu.viz import ar as arlib

    size = (64, 48)
    cam = atan.make_camera((1.0803, 1.43987, 0.519983, 0.548655,
                            0.244943), size)

    def render(frame, R, t):
        verts, tris, shades = arlib.make_eye_game(-R.T @ t,
                                                  spacing=0.08,
                                                  radius=0.05)
        return arlib.render_ar_frame(frame, SE3(R, t), cam, size, verts,
                                     tris, shades, ufb_size=size)

    frame = jnp.full((48, 64), 100.0, jnp.float32)
    out = np.asarray(jax.jit(render)(
        frame, jnp.eye(3), jnp.asarray([0.0, 0.0, 0.6], jnp.float32)))
    assert out.shape == (48, 64)
    assert (out > 200).sum() > 50      # sclera
    assert (out < 50).sum() > 50       # pupils

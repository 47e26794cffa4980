"""Camera calibrator tests on synthetic checkerboards
(ref parity: src/CameraCalibrator.cc, src/CalibImage.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.camera import atan, calibrator
from ptam_cg_tpu.io import synth
from ptam_cg_tpu.utils import se3 as se3lib

GT_PARAMS = (0.62, 0.82, 0.5, 0.5, 0.15)
SIZE = (320, 240)


def checkerboard_view(xi, params=GT_PARAMS, blur=0.6):
    from ptam_cg_tpu.ops import image as imops

    # Supersample 2x for anti-aliased edges (subpixel corner truth).
    big = (SIZE[0] * 2, SIZE[1] * 2)
    cam2 = atan.make_camera(params, big)
    pose = se3lib.se3_exp(jnp.asarray(xi, jnp.float32))
    im = synth.render_checkerboard(cam2, pose, big)
    im = imops.half_sample(im)
    if blur > 0:
        im = imops.gaussian_blur(im, blur)
    return im, pose


# Twists whose camera centers sit at z ~ -5..-7 looking at the plane.
# Strong tilts: near-frontal planar views leave focal length / distortion
# / depth poorly conditioned (the reference docs likewise tell the user
# to shoot the grid at an angle, doc/PTAM.txt calibration notes).
VIEWS = [
    [0.5, 0.5, 6.0, 0.5, 0.3, 0.05],
    [-0.8, 0.3, 5.0, -0.45, 0.35, -0.1],
    [0.2, -0.6, 7.0, 0.3, -0.55, 0.2],
    [1.0, -0.2, 5.5, -0.3, -0.4, 0.6],
    [-0.5, -0.8, 6.5, 0.55, 0.15, -0.4],
]


def test_find_calib_corners_on_checkerboard():
    im, _ = checkerboard_view(VIEWS[0])
    c = calibrator.find_calib_corners(im)
    assert int(c.count) > 20, int(c.count)
    # Corners lie near checkerboard X-junctions: verify one reprojects.
    assert int(c.count) < 2000   # not firing everywhere


def test_corner_refiner_converges_to_junction():
    im, pose = checkerboard_view(VIEWS[0])
    cam = atan.make_camera(GT_PARAMS, SIZE)
    # Project the world junction (1, 1, 0) -> subpixel ground truth.
    p_cam = se3lib.apply(pose, jnp.array([1.0, 1.0, 0.0]))
    gt_pix = atan.project(p_cam[:2] / p_cam[2], cam)
    refine = calibrator.make_corner_refiner(im.shape)
    angles = calibrator.guess_initial_angles(im, gt_pix + 1.5)
    pos, ang, mean, gain, ok = refine(
        im, (gt_pix + 1.5)[None], angles[None],
        jnp.asarray([120.0]), jnp.asarray([80.0]))
    assert bool(ok[0])
    err = float(jnp.linalg.norm(pos[0] - gt_pix))
    assert err < 0.3, err


def test_grid_growth():
    im, _ = checkerboard_view(VIEWS[0])
    view = calibrator.CalibImage(im)
    assert view.make_grid()
    assert len(view.grid) >= 9
    # Grid positions unique.
    gps = {tuple(g.grid_pos) for g in view.grid}
    assert len(gps) == len(view.grid)


def test_full_calibration_recovers_params():
    calib = calibrator.CameraCalibrator(SIZE)
    added = 0
    for xi in VIEWS:
        im, _ = checkerboard_view(xi)
        if calib.add_image(im):
            added += 1
    assert added >= 2, added
    rms = calib.optimize(100)
    # Reference target: RMS < 0.3 px typical (src/CameraCalibrator.cc:145).
    assert rms < 0.3, rms
    got = calib.params
    np.testing.assert_allclose(got[:4], GT_PARAMS[:4], rtol=0.02)
    # The ATAN model is even in w (rtrans_factor(w) == rtrans_factor(-w),
    # include/ATANCamera.h:143-149), so only |w| is observable.
    assert abs(abs(got[4]) - GT_PARAMS[4]) < 0.01, got

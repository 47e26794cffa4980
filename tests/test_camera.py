"""ATAN camera tests (ref parity: src/ATANCamera.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.camera import atan

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)  # camera.cfg
SIZE = (640, 480)


@pytest.fixture(scope="module")
def cam():
    return atan.make_camera(REF_PARAMS, SIZE)


def ref_project(xy, params=REF_PARAMS, size=SIZE):
    """Independent numpy reimplementation of the reference math
    (src/ATANCamera.cc:109-121) for golden-value checks."""
    fx, fy = size[0] * params[0], size[1] * params[1]
    cx, cy = size[0] * params[2] - 0.5, size[1] * params[3] - 0.5
    w = params[4]
    two_tan = 2 * np.tan(w / 2)
    r = np.hypot(xy[0], xy[1])
    factor = 1.0 if r < 0.001 else np.arctan(r * two_tan) / (r * w)
    return np.array([cx + fx * factor * xy[0], cy + fy * factor * xy[1]])


@pytest.mark.parametrize("xy", [(0.0, 0.0), (0.3, -0.2), (-0.7, 0.5),
                                (1.0, 1.0), (0.0005, 0.0)])
def test_project_matches_reference_math(cam, xy):
    got = atan.project(jnp.array(xy), cam)
    np.testing.assert_allclose(got, ref_project(np.array(xy)),
                               rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("pix", [(320, 240), (10, 10), (630, 470), (0, 240)])
def test_unproject_project_roundtrip(cam, pix):
    xy = atan.unproject(jnp.array(pix, jnp.float32), cam)
    back = atan.project(xy, cam)
    np.testing.assert_allclose(back, np.array(pix, np.float32), atol=1e-2)


def test_center_projects_to_center(cam):
    pix = atan.project(jnp.zeros(2), cam)
    np.testing.assert_allclose(
        pix, [640 * 0.519983 - 0.5, 480 * 0.548655 - 0.5], atol=1e-3)


def test_project_derivs_match_autodiff(cam):
    import jax

    xy = jnp.array([0.25, -0.15])
    J = atan.project_derivs(xy, cam)
    J_ad = jax.jacfwd(lambda p: atan.project(p, cam))(xy)
    np.testing.assert_allclose(J, J_ad, rtol=1e-3, atol=1e-3)


def test_no_distortion_is_pinhole():
    cam0 = atan.make_camera((0.5, 0.75, 0.5, 0.5, 0.0), SIZE)
    xy = jnp.array([0.3, 0.2])
    got = atan.project(xy, cam0)
    expected = [640 * 0.5 - 0.5 + 640 * 0.5 * 0.3,
                480 * 0.5 - 0.5 + 480 * 0.75 * 0.2]
    np.testing.assert_allclose(got, expected, atol=1e-3)


def test_batched_project(cam):
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(100, 2)) * 0.3,
                      jnp.float32)
    batched = atan.project(pts, cam)
    for i in [0, 17, 99]:
        np.testing.assert_allclose(batched[i], atan.project(pts[i], cam),
                                   atol=1e-5)


def test_validity_bound(cam):
    assert bool(atan.project_valid(jnp.zeros(2), cam))
    assert not bool(atan.project_valid(jnp.array([100.0, 100.0]), cam))


def test_ufb_roundtrip(cam):
    xy = jnp.array([0.2, -0.3])
    np.testing.assert_allclose(atan.ufb_unproject(atan.ufb_project(xy, cam),
                                                  cam), xy, atol=1e-4)
    np.testing.assert_allclose(
        atan.ufb_linear_unproject(atan.ufb_linear_project(xy, cam), cam),
        xy, atol=1e-4)


def test_param_derivs_shape_and_fd(cam):
    xy = jnp.array([0.1, 0.2])
    J = atan.param_derivs(xy, cam)
    assert J.shape == (2, 5)
    # fx column: d(pix)/d(fx_norm) ~ size_x * dist_x for x row.
    eps = 1e-3
    p2 = list(REF_PARAMS)
    p2[0] += eps
    cam2 = atan.make_camera(tuple(p2), SIZE)
    fd = (atan.project(xy, cam2) - atan.project(xy, cam)) / eps
    np.testing.assert_allclose(J[:, 0], fd, rtol=1e-2, atol=1e-2)

"""Homography init tests on synthetic planar two-view geometry
(ref parity: src/HomographyInit.cc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.camera import atan
from ptam_cg_tpu.models import homography
from ptam_cg_tpu.utils import se3 as se3lib

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (640, 480)


def make_planar_matches(seed=0, n=150, cap=256, xi=None, outlier_frac=0.0,
                        noise=0.0):
    """Points on the plane z=3 (view-1 frame), viewed from identity and
    from a second pose; z=1-plane correspondences + pixel jacs."""
    rng = np.random.default_rng(seed)
    cam = atan.make_camera(REF_PARAMS, SIZE)
    if xi is None:
        xi = np.array([0.25, 0.05, 0.02, 0.01, -0.06, 0.015], np.float32)
    T21 = se3lib.se3_exp(jnp.asarray(xi))     # second from first

    pts1 = rng.uniform([-1.2, -1.0, 0], [1.2, 1.0, 0], (n, 3)) \
        .astype(np.float32)
    pts1[:, 2] = 3.0
    pts2 = np.asarray(se3lib.apply(T21, jnp.asarray(pts1)))
    v1 = pts1[:, :2] / pts1[:, 2:3]
    v2 = pts2[:, :2] / pts2[:, 2:3]
    v1 += rng.normal(0, noise, v1.shape)
    v2 += rng.normal(0, noise, v2.shape)

    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        v2[idx] += rng.uniform(0.05, 0.3, (n_out, 2)) \
            * rng.choice([-1, 1], (n_out, 2))

    jac = np.asarray(atan.project_derivs(jnp.asarray(v2), cam))
    first = np.zeros((cap, 2), np.float32)
    second = np.zeros((cap, 2), np.float32)
    pj = np.tile(np.eye(2, dtype=np.float32), (cap, 1, 1))
    valid = np.zeros(cap, bool)
    first[:n] = v1
    second[:n] = v2
    pj[:n] = jac
    valid[:n] = True
    return homography.Matches(
        first=jnp.asarray(first), second=jnp.asarray(second),
        pixel_jac=jnp.asarray(pj), valid=jnp.asarray(valid)), T21


def check_recovery(res, T21, atol_rot=5e-3, atol_dir=0.03):
    assert bool(res.success)
    R_err = np.asarray(res.se3_second_from_first.R) @ np.asarray(T21.R).T
    ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
    assert ang < atol_rot, ang
    t_est = np.asarray(res.se3_second_from_first.t)
    t_gt = np.asarray(T21.t)
    # Translation recovered up to scale: compare directions.
    cos = abs(t_est @ t_gt) / (np.linalg.norm(t_est)
                               * np.linalg.norm(t_gt) + 1e-12)
    assert cos > 1.0 - atol_dir, cos


def test_homography_clean_recovery():
    m, T21 = make_planar_matches(0)
    res = homography.compute(m, jax.random.PRNGKey(0))
    check_recovery(res, T21)
    assert int(res.n_inliers) > 140


def test_homography_with_outliers():
    m, T21 = make_planar_matches(1, outlier_frac=0.2)
    res = homography.compute(m, jax.random.PRNGKey(1))
    check_recovery(res, T21, atol_rot=1e-2)
    assert int(res.n_inliers) > 100


def test_homography_noisy():
    m, T21 = make_planar_matches(2, noise=5e-4)
    res = homography.compute(m, jax.random.PRNGKey(2))
    check_recovery(res, T21, atol_rot=2e-2, atol_dir=0.1)


def test_homography_transfer_accuracy():
    m, T21 = make_planar_matches(3)
    res = homography.compute(m, jax.random.PRNGKey(3))
    # H maps first -> second on the z=1 plane.
    up = jnp.concatenate([m.first, jnp.ones_like(m.first[:, :1])], axis=-1)
    proj = up @ res.H.T
    v2 = proj[:, :2] / proj[:, 2:3]
    err = np.asarray(jnp.linalg.norm(v2 - m.second, axis=-1))
    valid = np.asarray(m.valid)
    assert np.median(err[valid]) < 1e-4


def test_homography_jits():
    m, _ = make_planar_matches(4)
    fn = jax.jit(lambda mm, k: homography.compute(mm, k))
    res = fn(m, jax.random.PRNGKey(0))
    assert bool(res.success)


def test_homography_pure_rotation_flagged_or_handled():
    """Pure rotation (degenerate for translation direction) must not
    produce garbage rotation."""
    m, T21 = make_planar_matches(
        5, xi=np.array([0, 0, 0, 0.02, -0.03, 0.01], np.float32))
    res = homography.compute(m, jax.random.PRNGKey(5))
    if bool(res.success):
        R_err = (np.asarray(res.se3_second_from_first.R)
                 @ np.asarray(T21.R).T)
        ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
        assert ang < 0.05, ang

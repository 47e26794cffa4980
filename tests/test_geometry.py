"""Triangulation / ICP tests (ref parity: src/MapMaker.cc:171-258,
src/Tools.cc:307-431)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.utils import geometry, se3


def make_two_view(seed=0, n=32):
    rng = np.random.default_rng(seed)
    pts_b = rng.uniform([-1, -1, 2], [1, 1, 6], size=(n, 3)).astype(np.float32)
    xi = np.array([0.3, -0.1, 0.05, 0.02, -0.05, 0.03], np.float32)
    T_ab = se3.se3_exp(jnp.asarray(xi))  # A from B
    pts_a = np.asarray(se3.apply(T_ab, jnp.asarray(pts_b)))
    v2b = pts_b[:, :2] / pts_b[:, 2:3]
    v2a = pts_a[:, :2] / pts_a[:, 2:3]
    return T_ab, jnp.asarray(v2a), jnp.asarray(v2b), pts_b


def test_triangulate_recovers_points():
    T_ab, v2a, v2b, pts_b = make_two_view()
    got = np.asarray(geometry.triangulate(T_ab, v2a, v2b))
    np.testing.assert_allclose(got, pts_b, rtol=5e-3, atol=5e-3)


def test_triangulate_depths_positive():
    T_ab, v2a, v2b, _ = make_two_view(3)
    _, za, zb = geometry.triangulate_depths(T_ab, v2a, v2b)
    assert np.all(np.asarray(za) > 0)
    assert np.all(np.asarray(zb) > 0)


def test_triangulate_noisy_bounded_error():
    T_ab, v2a, v2b, pts_b = make_two_view(1)
    noise = 0.001
    rng = np.random.default_rng(9)
    v2a = v2a + rng.normal(scale=noise, size=v2a.shape).astype(np.float32)
    got = np.asarray(geometry.triangulate(T_ab, v2a, v2b))
    err = np.linalg.norm(got - pts_b, axis=-1)
    assert np.median(err) < 0.25


@pytest.mark.parametrize("seed", range(3))
def test_umeyama_icp_exact(seed):
    rng = np.random.default_rng(seed)
    src = rng.normal(size=(20, 3)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(
        rng.normal(size=6).astype(np.float32) * 0.5))
    dst = np.asarray(se3.apply(T, jnp.asarray(src)))
    est = geometry.umeyama_icp(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(est.R, T.R, atol=1e-4)
    np.testing.assert_allclose(est.t, T.t, atol=1e-4)


def test_umeyama_icp_mask_ignores_outliers():
    rng = np.random.default_rng(5)
    src = rng.normal(size=(20, 3)).astype(np.float32)
    T = se3.se3_exp(jnp.array([0.1, 0.2, -0.1, 0.05, 0.0, 0.1]))
    dst = np.array(se3.apply(T, jnp.asarray(src)))
    dst[15:] += 100.0  # corrupt
    mask = np.arange(20) < 15
    est = geometry.umeyama_icp(jnp.asarray(src), jnp.asarray(dst),
                               jnp.asarray(mask))
    np.testing.assert_allclose(est.R, T.R, atol=1e-4)


def test_sampson_error_zero_for_perfect_matches():
    T_ab, v2a, v2b, _ = make_two_view(2)
    E = se3.hat(T_ab.t) @ T_ab.R  # essential matrix for A-from-B
    errs = np.asarray(geometry.sampson_error(jnp.asarray(E), v2a, v2b))
    assert np.max(errs) < 1e-6


@pytest.mark.parametrize("seed", range(3))
def test_horn_icp_exact(seed):
    rng = np.random.default_rng(seed + 10)
    src = rng.normal(size=(20, 3)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(
        rng.normal(size=6).astype(np.float32) * 0.5))
    dst = np.asarray(se3.apply(T, jnp.asarray(src)))
    est = geometry.horn_icp(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(est.R, T.R, atol=1e-4)
    np.testing.assert_allclose(est.t, T.t, atol=1e-4)


def test_horn_icp_matches_umeyama_under_noise():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(50, 3)).astype(np.float32)
    T = se3.se3_exp(jnp.array([0.2, -0.1, 0.3, 0.1, -0.2, 0.05]))
    dst = np.array(se3.apply(T, jnp.asarray(src)))
    dst += rng.normal(size=dst.shape).astype(np.float32) * 0.01
    a = geometry.horn_icp(jnp.asarray(src), jnp.asarray(dst))
    b = geometry.umeyama_icp(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(a.R, b.R, atol=1e-3)
    np.testing.assert_allclose(a.t, b.t, atol=1e-3)


def test_triangulate_new_matches_dlt():
    """TriangulateNew (cross-matrix 6x4 DLT, ref: src/MapMaker.cc:216-258)
    agrees with the 4x4 DLT on clean two-view data."""
    rng = np.random.default_rng(3)
    pts_b = rng.uniform([-1, -1, 2.0], [1, 1, 5.0], (64, 3)).astype(
        np.float32)
    xi = jnp.asarray([0.2, -0.05, 0.01, 0.02, -0.03, 0.01], jnp.float32)
    T_ab = se3.se3_exp(xi)
    pts_a = np.asarray(se3.apply(T_ab, jnp.asarray(pts_b)))
    v2b = jnp.asarray(pts_b[:, :2] / pts_b[:, 2:3])
    v2a = jnp.asarray(pts_a[:, :2] / pts_a[:, 2:3])
    p_dlt = np.asarray(geometry.triangulate(T_ab, v2a, v2b))
    p_new = np.asarray(geometry.triangulate_new(T_ab, v2a, v2b))
    np.testing.assert_allclose(p_new, pts_b, atol=2e-2, rtol=1e-2)
    np.testing.assert_allclose(p_new, p_dlt, atol=2e-2, rtol=1e-2)

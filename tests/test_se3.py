"""Golden + property tests for SO3/SE3 (ref parity: TooN SE3/SO3 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptam_cg_tpu.utils import se3


def rng(seed=0):
    return np.random.default_rng(seed)


def test_so3_exp_identity():
    R = se3.so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_so3_exp_quarter_turn_z():
    R = se3.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(R, expected, atol=1e-6)


@pytest.mark.parametrize("seed", range(5))
def test_so3_exp_log_roundtrip(seed):
    w = rng(seed).normal(size=3).astype(np.float32)
    w = w / np.linalg.norm(w) * rng(seed + 100).uniform(0.01, 3.0)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=2e-4)


def test_so3_log_near_pi():
    axis = np.array([1.0, 2.0, -0.5])
    axis /= np.linalg.norm(axis)
    w = (axis * (np.pi - 1e-5)).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(R))
    # exp(w) == exp(-w) at pi; accept either sign.
    err = min(np.linalg.norm(w2 - w), np.linalg.norm(w2 + w))
    assert err < 1e-2


def test_so3_exp_small_angle_matches_taylor():
    w = jnp.array([1e-6, -2e-6, 3e-7])
    R = se3.so3_exp(w)
    np.testing.assert_allclose(R, np.eye(3) + np.asarray(se3.hat(w)), atol=1e-9)


@pytest.mark.parametrize("seed", range(5))
def test_se3_exp_log_roundtrip(seed):
    xi = rng(seed).normal(size=6).astype(np.float32) * 0.5
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=2e-4)


def test_se3_mul_inv():
    a = se3.se3_exp(jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.3]))
    b = se3.se3_exp(jnp.array([-0.3, 0.1, 0.0, 0.0, 0.4, 0.2]))
    ab = se3.mul(a, b)
    x = jnp.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(se3.apply(ab, x),
                               se3.apply(a, se3.apply(b, x)), atol=1e-5)
    ident = se3.mul(ab, se3.inv(ab))
    np.testing.assert_allclose(ident.R, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(ident.t, np.zeros(3), atol=1e-5)


def test_se3_exp_translation_only():
    T = se3.se3_exp(jnp.array([1.0, 2.0, 3.0, 0, 0, 0]))
    np.testing.assert_allclose(T.R, np.eye(3), atol=1e-7)
    np.testing.assert_allclose(T.t, [1, 2, 3], atol=1e-7)


def test_generator_field_matches_toon_semantics():
    """Generators: i<3 translate, i>=3 rotate about axis i-3 (TooN layout)."""
    p = jnp.array([1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(se3.generator_field(0, p), [1, 0, 0, 0])
    np.testing.assert_allclose(se3.generator_field(3, p), [0, -3, 2, 0])
    np.testing.assert_allclose(se3.generator_field(4, p), [3, 0, -1, 0])
    np.testing.assert_allclose(se3.generator_field(5, p), [-2, 1, 0, 0])


def test_motion_jacobian_matches_generators():
    p = jnp.array([1.0, 2.0, 3.0])
    J = se3.motion_jacobian(p)
    hom = jnp.concatenate([p, jnp.ones(1)])
    for i in range(6):
        np.testing.assert_allclose(J[i], se3.generator_field(i, hom)[:3],
                                   atol=1e-7)


def test_motion_jacobian_is_exp_derivative():
    """d/deps [exp(eps e_i) T p] at eps=0 equals the generator field."""
    T = se3.se3_exp(jnp.array([0.2, -0.1, 0.3, 0.1, -0.2, 0.15]))
    p = jnp.array([0.4, -0.7, 2.5])
    p_cam = se3.apply(T, p)
    J = se3.motion_jacobian(p_cam)
    eps = 1e-3
    for i in range(6):
        xi = np.zeros(6, np.float32)
        xi[i] = eps
        Tp = se3.mul(se3.se3_exp(jnp.asarray(xi)), T)
        Tm = se3.mul(se3.se3_exp(jnp.asarray(-xi)), T)
        fd = (se3.apply(Tp, p) - se3.apply(Tm, p)) / (2 * eps)
        np.testing.assert_allclose(fd, J[i], atol=1e-3)


@pytest.mark.parametrize("seed", range(3))
def test_quat_roundtrip(seed):
    w = rng(seed).normal(size=3).astype(np.float32)
    R = se3.so3_exp(jnp.asarray(w))
    q = se3.quat_from_rot(R)
    R2 = se3.rot_from_quat(q)
    np.testing.assert_allclose(R2, R, atol=1e-5)


def test_euler_roundtrip():
    rpy = jnp.array([0.3, -0.4, 1.2])
    R = se3.rot_from_euler(rpy)
    np.testing.assert_allclose(se3.euler_from_rot(R), rpy, atol=1e-5)


def test_batched_ops_vmap_consistency():
    xis = jnp.asarray(rng(7).normal(size=(8, 6)).astype(np.float32))
    Ts = se3.se3_exp(xis)
    assert Ts.R.shape == (8, 3, 3)
    single = se3.se3_exp(xis[3])
    np.testing.assert_allclose(Ts.R[3], single.R, atol=1e-6)
    logs = se3.se3_log(Ts)
    np.testing.assert_allclose(logs, xis, atol=3e-4)


def test_lh_from_rh_involutive_and_matches_conjugation():
    rng = np.random.default_rng(0)
    T = se3.se3_exp(jnp.asarray(rng.normal(size=6).astype(np.float32)))
    L = se3.lh_from_rh(T)
    F = np.diag([1.0, 1.0, -1.0]).astype(np.float32)
    np.testing.assert_allclose(np.asarray(L.R), F @ np.asarray(T.R) @ F,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(L.t), F @ np.asarray(T.t),
                               atol=1e-6)
    back = se3.lh_from_rh(L)
    np.testing.assert_allclose(np.asarray(back.R), np.asarray(T.R),
                               atol=1e-6)


def test_se3_log_small_angle_cancellation_zone():
    """Regression: for theta in the f32 cancellation zone (1e-4..4e-2
    rad), cos(theta) rounds to 1.0f so the closed-form B = (1-cos)/t^2
    hits 0 and coef = (1-A/(2B))/t^2 blew up to inf/NaN; even where B
    stayed nonzero, the coef cancellation cost ~5e-4 absolute error.
    This produced [nan, inf, nan] tracker velocities mid-sequence
    (round 2). exp(log(T)) must stay finite and tight over the zone."""
    rng = np.random.default_rng(11)
    for theta in np.geomspace(1e-6, 0.3, 60):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        u = rng.normal(size=3)
        xi = np.concatenate([u, axis * theta]).astype(np.float32)
        T = se3.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(se3.se3_log(T))
        assert np.all(np.isfinite(xi2)), (theta, xi2)
        T2 = se3.se3_exp(jnp.asarray(xi2))
        np.testing.assert_allclose(np.asarray(T2.R), np.asarray(T.R),
                                   atol=3e-5, err_msg=f"theta={theta}")
        np.testing.assert_allclose(np.asarray(T2.t), np.asarray(T.t),
                                   atol=3e-5, err_msg=f"theta={theta}")

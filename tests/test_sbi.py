"""SmallBlurryImage / ESM tests (ref: src/ImageProcess.cc:262-495)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptam_cg_tpu.ops import image as imops
from ptam_cg_tpu.ops import sbi as sbiops

REF_PARAMS = jnp.asarray((1.0803, 1.43987, 0.519983, 0.548655, 0.244943),
                         jnp.float32)


def smooth_image(seed, h=60, w=80, scale=255.0):
    rng = np.random.default_rng(seed)
    im = rng.uniform(0, 1, (h, w)).astype(np.float32)
    return np.asarray(imops.gaussian_blur(jnp.asarray(im), 2.0)) * scale


def test_make_sbi_shape_and_zero_mean():
    level3 = jnp.asarray(smooth_image(0))
    s = sbiops.make_sbi(level3, 2.5)
    assert s.template.shape == (30, 40)
    assert abs(float(jnp.mean(s.template))) < 2.0  # near zero-mean
    assert s.jac.shape == (30, 40, 2)


def test_esm_identity_for_same_image():
    level3 = jnp.asarray(smooth_image(1))
    s = sbiops.make_sbi(level3, 2.5)
    se2, score = sbiops.iterate_pos_rel_to_target(s, s, 5)
    np.testing.assert_allclose(se2.R, np.eye(2), atol=1e-4)
    np.testing.assert_allclose(se2.t, 0.0, atol=1e-3)
    assert float(score) < 1.0


def test_esm_recovers_translation():
    im = smooth_image(2, h=120, w=160)
    # Shift by 8 px in x at level-3 scale -> 2 px at SBI scale.
    shifted = np.roll(im, 4, axis=1)
    a = sbiops.make_sbi(jnp.asarray(im), 2.5)
    b = sbiops.make_sbi(jnp.asarray(shifted), 2.5)
    se2, score = sbiops.iterate_pos_rel_to_target(b, a, 12)
    # Warping b onto a must undo the +2px SBI-scale shift.
    assert abs(float(se2.t[0]) - 2.0) < 0.5, np.asarray(se2.t)
    assert abs(float(se2.t[1])) < 0.5


def test_esm_recovers_rotation():
    h, w = 60, 80
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = w / 2, h / 2

    def render(theta):
        c, s = np.cos(theta), np.sin(theta)
        u = c * (xx - cx) - s * (yy - cy)
        v = s * (xx - cx) + c * (yy - cy)
        return (np.sin(u * 0.25) * np.cos(v * 0.35) * 80 + 120).astype(
            np.float32)

    a = sbiops.make_sbi(jnp.asarray(render(0.0)), 1.0)
    b = sbiops.make_sbi(jnp.asarray(render(0.05)), 1.0)
    se2, _ = sbiops.iterate_pos_rel_to_target(b, a, 15)
    theta = float(jnp.arctan2(se2.R[1, 0], se2.R[0, 0]))
    assert abs(abs(theta) - 0.05) < 0.02, theta


def test_se3_from_se2_identity():
    T = sbiops.se3_from_se2(sbiops.se2_identity(), REF_PARAMS, (30, 40))
    np.testing.assert_allclose(T.R, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(T.t, 0.0)


def test_se3_from_se2_translation_gives_rotation():
    se2 = sbiops.SE2(jnp.eye(2), jnp.array([2.0, 0.0]))
    T = sbiops.se3_from_se2(se2, REF_PARAMS, (30, 40))
    # A pure image translation maps to a small camera rotation (pan).
    w = np.asarray(jax.device_get(T.R))
    assert not np.allclose(w, np.eye(3), atol=1e-3)
    # Rotation should be mostly about the y axis (pan for x shift).
    from ptam_cg_tpu.utils import se3 as se3lib
    rotvec = np.asarray(se3lib.so3_log(T.R))
    assert abs(rotvec[1]) > abs(rotvec[0])
    assert abs(rotvec[1]) > abs(rotvec[2])


def test_calc_sbi_rotation_jits():
    im = smooth_image(5, 120, 160)
    a = sbiops.make_sbi(jnp.asarray(im), 2.5)
    fn = jax.jit(lambda x, y: sbiops.calc_sbi_rotation(
        x, y, REF_PARAMS, (30, 40), 8))
    T, score = fn(a, a)
    np.testing.assert_allclose(T.R, np.eye(3), atol=1e-3)

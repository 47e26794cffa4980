"""M-estimator tests (ref parity: include/Tools.h:88-256)."""

import jax.numpy as jnp
import numpy as np

from ptam_cg_tpu.utils import mest


def ref_sigma_sq(errs, scale):
    """Direct transcription of the reference formula for golden checks."""
    v = np.sort(np.asarray(errs, np.float64))
    med = v[len(v) // 2]
    sigma = 1.4826 * (1 + 5.0 / (len(v) * 2 - 6)) * np.sqrt(med)
    sigma *= scale
    return sigma * sigma


def test_find_sigma_squared_tukey_golden():
    errs = np.array([1.0, 4.0, 9.0, 16.0, 25.0, 0.25, 100.0], np.float32)
    mask = np.ones(7, bool)
    got = mest.find_sigma_squared(jnp.asarray(errs), jnp.asarray(mask),
                                  mest.TUKEY)
    np.testing.assert_allclose(got, ref_sigma_sq(errs, 4.6851), rtol=1e-4)


def test_find_sigma_squared_huber_golden():
    errs = np.array([1.0, 2.0, 3.0, 4.0, 5.0], np.float32)
    got = mest.find_sigma_squared(jnp.asarray(errs), jnp.ones(5, bool),
                                  mest.HUBER)
    np.testing.assert_allclose(got, ref_sigma_sq(errs, 1.345), rtol=1e-4)


def test_find_sigma_squared_respects_mask():
    errs = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0, 1e9, 1e9], jnp.float32)
    mask = jnp.array([True, True, True, True, True, False, False])
    got = mest.find_sigma_squared(errs, mask, mest.TUKEY)
    expected = ref_sigma_sq([1.0, 2.0, 3.0, 4.0, 5.0], 4.6851)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_tukey_weight_zero_beyond_sigma():
    w = mest.weight(jnp.array([2.0]), jnp.array(1.0), mest.TUKEY)
    assert float(w[0]) == 0.0
    w = mest.weight(jnp.array([0.0]), jnp.array(1.0), mest.TUKEY)
    np.testing.assert_allclose(w, [1.0])


def test_weights_monotone_decreasing():
    errs = jnp.linspace(0, 10, 50)
    for kind in [mest.TUKEY, mest.CAUCHY, mest.HUBER]:
        w = np.asarray(mest.weight(errs, jnp.array(4.0), kind))
        assert np.all(np.diff(w) <= 1e-7), kind


def test_huber_weight_formula():
    np.testing.assert_allclose(
        mest.weight(jnp.array([4.0]), jnp.array(1.0), mest.HUBER), [0.5])
    np.testing.assert_allclose(
        mest.weight(jnp.array([0.5]), jnp.array(1.0), mest.HUBER), [1.0])


def test_cauchy_weight_formula():
    np.testing.assert_allclose(
        mest.weight(jnp.array([3.0]), jnp.array(1.0), mest.CAUCHY), [0.25])


def test_lsq_sigma_is_mean():
    errs = jnp.array([1.0, 2.0, 3.0, 4.0])
    got = mest.find_sigma_squared(errs, jnp.ones(4, bool), mest.LSQ)
    np.testing.assert_allclose(got, 2.5)


def test_objective_tukey_saturates():
    obj = mest.objective(jnp.array([100.0]), jnp.array(1.0), mest.TUKEY)
    np.testing.assert_allclose(obj, [1.0])


def test_min_sigma_floor():
    errs = jnp.array([1e-8, 1e-8, 1e-8], jnp.float32)
    got = mest.find_sigma_squared(errs, jnp.ones(3, bool), mest.TUKEY,
                                  min_sigma=0.4)
    np.testing.assert_allclose(got, 0.16, rtol=1e-5)


def test_approx_median_close_to_exact():
    rng = np.random.default_rng(3)
    for n, frac in [(1152, 1.0), (1000, 0.6), (1024, 0.25)]:
        vals = jnp.asarray(rng.lognormal(0, 1.5, n).astype(np.float32))
        mask = jnp.asarray(rng.uniform(size=n) < frac)
        exact = float(mest.masked_median(vals, mask))
        approx = float(mest.masked_median_approx(vals, mask))
        assert abs(approx - exact) / max(exact, 1e-6) < 0.35, \
            (n, frac, exact, approx)


def test_approx_sigma_close():
    rng = np.random.default_rng(4)
    errs = jnp.asarray((rng.normal(0, 1, 1024) ** 2).astype(np.float32))
    mask = jnp.ones(1024, bool)
    a = float(mest.find_sigma_squared(errs, mask, mest.TUKEY))
    b = float(mest.find_sigma_squared(errs, mask, mest.TUKEY, approx=True))
    assert abs(a - b) / a < 0.3, (a, b)

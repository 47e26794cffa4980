"""Dense image kernel tests (ref parity: src/ImageProcess.cc:20-47,
libCVD halfSample)."""

import jax.numpy as jnp
import numpy as np

from ptam_cg_tpu.ops import image as imops


def rng(seed=0):
    return np.random.default_rng(seed)


def test_half_sample_golden():
    im = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    out = imops.half_sample(im)
    expected = np.array([[2.5, 4.5], [10.5, 12.5]])
    np.testing.assert_allclose(out, expected)


def test_half_sample_odd_dims_dropped():
    im = jnp.ones((5, 7))
    assert imops.half_sample(im).shape == (2, 3)


def test_build_pyramid_shapes():
    im = jnp.zeros((480, 640))
    pyr = imops.build_pyramid(im, 4)
    assert [p.shape for p in pyr] == [(480, 640), (240, 320), (120, 160),
                                      (60, 80)]


def test_box_sum_matches_numpy():
    x = rng(1).normal(size=(20, 24)).astype(np.float32)
    got = np.asarray(imops.box_sum(jnp.asarray(x), 2))
    pad = np.pad(x, 2)
    expected = np.zeros_like(x)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            expected += pad[2 + dy: 2 + dy + 20, 2 + dx: 2 + dx + 24]
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-4)


def test_gaussian_blur_preserves_constant():
    im = jnp.full((32, 32), 7.0)
    out = imops.gaussian_blur(im, 2.5)
    np.testing.assert_allclose(out, im, atol=1e-4)


def test_gaussian_blur_smooths():
    im = jnp.zeros((33, 33)).at[16, 16].set(1.0)
    out = np.asarray(imops.gaussian_blur(im, 1.0))
    assert out[16, 16] < 0.3
    assert abs(out.sum() - 1.0) < 1e-3
    # Symmetric response.
    np.testing.assert_allclose(out[16, 15], out[16, 17], atol=1e-6)
    np.testing.assert_allclose(out[15, 16], out[17, 16], atol=1e-6)


def ref_shi_tomasi(image, half, cx, cy):
    """Direct transcription of ShiTomasiScoreAtPoint
    (ref: src/ImageProcess.cc:20-47)."""
    dXX = dYY = dXY = 0.0
    for y in range(cy - half, cy + half + 1):
        for x in range(cx - half, cx + half + 1):
            dx = float(image[y, x + 1]) - float(image[y, x - 1])
            dy = float(image[y + 1, x]) - float(image[y - 1, x])
            dXX += dx * dx
            dYY += dy * dy
            dXY += dx * dy
    n = (2 * half + 1) ** 2
    dXX /= 2.0 * n
    dYY /= 2.0 * n
    dXY /= 2.0 * n
    return 0.5 * (dXX + dYY - np.sqrt((dXX + dYY) ** 2
                                      - 4 * (dXX * dYY - dXY * dXY)))


def test_shi_tomasi_matches_reference_pointwise():
    im = (rng(3).uniform(0, 255, (24, 24))).astype(np.float32)
    score_map = np.asarray(imops.shi_tomasi_score_map(jnp.asarray(im), 3))
    for (cy, cx) in [(6, 6), (10, 15), (17, 8)]:
        expected = ref_shi_tomasi(im, 3, cx, cy)
        np.testing.assert_allclose(score_map[cy, cx], expected,
                                   rtol=1e-4, atol=1e-3)


def test_shi_tomasi_corner_beats_flat():
    im = np.zeros((32, 32), np.float32)
    im[:16, :16] = 200.0  # corner at (16,16)
    sm = np.asarray(imops.shi_tomasi_score_map(jnp.asarray(im), 3))
    assert sm[16, 16] > sm[5, 5]        # corner > flat
    assert sm[16, 16] > sm[16, 8] * 2   # corner > edge... ish
    assert sm[5, 5] == 0.0


def test_bilinear_sample_exact_and_interp():
    im = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    vals, valid = imops.bilinear_sample(im, jnp.array([[1.0, 1.0],
                                                       [1.5, 0.0],
                                                       [0.0, 0.5]]))
    np.testing.assert_allclose(vals, [5.0, 1.5, 2.0])
    assert np.all(np.asarray(valid))
    _, invalid = imops.bilinear_sample(im, jnp.array([[3.5, 0.0]]))
    assert not bool(invalid[0])


def test_extract_patch():
    im = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
    patch, valid = imops.extract_patch(im, jnp.array([5.0, 5.0]), 4)
    assert bool(valid)
    # top-left = center - size//2 = (3,3)
    np.testing.assert_allclose(patch[0, 0], im[3, 3])
    _, invalid = imops.extract_patch(im, jnp.array([0.0, 0.0]), 8)
    assert not bool(invalid)


def test_central_gradients_no_half_factor():
    im = jnp.asarray(np.arange(25, dtype=np.float32).reshape(5, 5))
    gx, gy = imops.central_gradients(im)
    np.testing.assert_allclose(gx[2, 2], 2.0)  # spacing 1, diff of 2
    np.testing.assert_allclose(gy[2, 2], 10.0)
    np.testing.assert_allclose(gx[0, 0], 0.0)  # border zeroed

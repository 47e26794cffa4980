"""Atlas packing / level transform tests (ref: include/KeyFrame.h:85-124)."""

import jax.numpy as jnp
import numpy as np

from ptam_cg_tpu.ops import image as imops
from ptam_cg_tpu.ops import levels as levelops


def test_level_transforms_golden():
    # LevelZeroPos(0, 1) = (0 + 0.5) * 2 - 0.5 = 0.5
    np.testing.assert_allclose(levelops.level_zero_pos(jnp.float32(0.0), 1),
                               0.5)
    np.testing.assert_allclose(levelops.level_zero_pos(jnp.float32(3.0), 2),
                               13.5)
    np.testing.assert_allclose(levelops.level_n_pos(jnp.float32(13.5), 2),
                               3.0)
    # Roundtrip.
    p = jnp.float32(17.25)
    for lev in range(4):
        np.testing.assert_allclose(
            levelops.level_n_pos(levelops.level_zero_pos(p, lev), lev), p,
            rtol=1e-6)


def test_pack_unpack_roundtrip():
    im = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (64, 64))
                     .astype(np.float32))
    pyr = imops.build_pyramid(im, 4)
    atlas = levelops.pack_atlas(pyr)
    assert atlas.shape == (96, 64)
    for lev in range(4):
        got = levelops.unpack_level(atlas, lev, 64, 64)
        np.testing.assert_allclose(got, pyr[lev])


def test_atlas_pos():
    # Level 1 of a 64x64 image starts at row 64, col 0.
    p = levelops.atlas_pos(jnp.array([3.0, 5.0]), jnp.int32(1), 64, 64)
    np.testing.assert_allclose(p, [3.0, 69.0])
    # Level 2 starts at row 64, col 32.
    p = levelops.atlas_pos(jnp.array([1.0, 2.0]), jnp.int32(2), 64, 64)
    np.testing.assert_allclose(p, [33.0, 66.0])


def test_level_bounds():
    x0, y0, x1, y1 = levelops.level_bounds(jnp.int32(1), 64, 64)
    np.testing.assert_allclose([x0, y0, x1, y1], [0, 64, 32, 96])
    x0, y0, x1, y1 = levelops.level_bounds(jnp.int32(0), 64, 64)
    np.testing.assert_allclose([x0, y0, x1, y1], [0, 0, 64, 64])

"""AR compositor: undistortion-mesh rendering + 3D overlay, offline.

Capability parity with ARDriver + EyeGame (ref: src/ARDriver.cc:38-281,
src/EyeGame.cc): the reference uploads each frame to an OpenGL texture,
renders an undistorted background through a precomputed distortion mesh
into an FBO, draws 3D content with the UFB linear frustum, then
re-distorts to screen. Here the same three stages are batched tensor
ops: (1) undistort via the UFB mapping as one bilinear resample,
(2) rasterize 3D content (z-buffered triangles) over it, (3) re-distort
back — all jittable, producing frames for video export instead of a
GL window.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptam_cg_tpu.camera import atan
from ptam_cg_tpu.ops import image as imops
from ptam_cg_tpu.utils.se3 import SE3

Array = jax.Array


def undistort_frame(frame: Array, cam: atan.Camera,
                    out_size: Tuple[int, int]) -> Array:
    """Distorted camera frame -> linear (UFB) image
    (ref: ARDriver::MakeFrameBuffer + DrawDistortedFB mesh,
    src/ARDriver.cc:96-238). One inverse-map bilinear resample."""
    Wo, Ho = out_size
    ys = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 1)
    ufb = jnp.stack([(xs + 0.5) / Wo, (ys + 0.5) / Ho], axis=-1)
    implane = atan.ufb_linear_unproject(ufb, cam)
    pix = atan.project(implane, cam)
    vals, valid = imops.bilinear_sample(frame, pix.reshape(-1, 2))
    out = jnp.where(valid, vals, 0.0).reshape(Ho, Wo)
    return out


def redistort_frame(linear: Array, cam: atan.Camera,
                    out_size: Tuple[int, int]) -> Array:
    """Linear (UFB) image -> distorted camera frame (the final
    re-distortion pass, ref: src/ARDriver.cc:240-281)."""
    Wo, Ho = out_size
    Hl, Wl = linear.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Ho, Wo), 1)
    pix = jnp.stack([xs, ys], axis=-1)
    implane = atan.unproject(pix.reshape(-1, 2), cam)
    ufb = atan.ufb_linear_project(implane, cam)
    src = jnp.stack([ufb[:, 0] * Wl - 0.5, ufb[:, 1] * Hl - 0.5], -1)
    vals, valid = imops.bilinear_sample(linear, src)
    return jnp.where(valid, vals, 0.0).reshape(Ho, Wo)


def _raster_triangles(img: Array, verts2: Array, depth: Array,
                      tris: Array, shade: Array) -> Array:
    """Tiny z-buffered triangle rasterizer over an intensity image.

    verts2: (V, 2) screen coords; depth: (V,); tris: (T, 3) int indices;
    shade: (T,) intensity per triangle. Brute force per-pixel barycentric
    over all triangles — fine for demo content (the EyeGame equivalent).
    """
    H, W = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)

    def one_tri(img_c, zbuf, t, sh):
        a, b, c = verts2[t[0]], verts2[t[1]], verts2[t[2]]
        za, zb, zc = depth[t[0]], depth[t[1]], depth[t[2]]
        d = ((b[1] - c[1]) * (a[0] - c[0])
             + (c[0] - b[0]) * (a[1] - c[1]))
        d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
        w0 = ((b[1] - c[1]) * (xs - c[0]) + (c[0] - b[0]) * (ys - c[1])) / d
        w1 = ((c[1] - a[1]) * (xs - c[0]) + (a[0] - c[0]) * (ys - c[1])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = w0 * za + w1 * zb + w2 * zc
        win = inside & (z > 0.01) & (z < zbuf)
        return jnp.where(win, sh, img_c), jnp.where(win, z, zbuf)

    zbuf = jnp.full((H, W), jnp.inf)
    out = img
    for ti in range(tris.shape[0]):
        out, zbuf = one_tri(out, zbuf, tris[ti], shade[ti])
    return out


def make_cube(size: float = 0.05, center=(0.0, 0.0, 0.0)):
    """Demo AR content on the z=0 plane (EyeGame stand-in): a cube.
    Returns (verts (8,3), tris (12,3), shades (12,))."""
    s = size / 2
    cx, cy, cz = center
    verts = np.array([[x, y, z] for z in (cz, cz - size)
                      for y in (cy - s, cy + s)
                      for x in (cx - s, cx + s)], np.float32)
    tris = np.array([
        [0, 1, 2], [1, 3, 2],        # bottom (on plane)
        [4, 6, 5], [5, 6, 7],        # top
        [0, 4, 1], [1, 4, 5],
        [2, 3, 6], [3, 7, 6],
        [0, 2, 4], [2, 6, 4],
        [1, 5, 3], [3, 7, 5],
    ], np.int32)
    shades = np.array([140, 140, 250, 250, 180, 180, 200, 200, 160,
                       160, 220, 220], np.float32)
    return jnp.asarray(verts), jnp.asarray(tris), jnp.asarray(shades)


def _unit_octahedron():
    """(6,3) vertices + (8,3) triangles of a unit octahedron — the
    low-poly sphere used for eyeballs."""
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], np.float32)
    tris = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                     [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
                    np.int32)
    return verts, tris


def make_eye_game(cam_center_w: Array, spacing: float = 0.1,
                  radius: float = 0.04):
    """EyeGame-parity animated AR content (ref: src/EyeGame.cc:15-241):
    four eyeballs sitting on the z=0 plane, each with a pupil that
    rotates to face the camera every frame. Geometry is a jnp function
    of the camera center, so the whole AR render stays jittable.

    Returns (verts (V,3), tris (T,3), shades (T,)).
    """
    overts, otris = _unit_octahedron()
    all_verts, all_tris, all_shades = [], [], []
    n_v = 0
    for ex in (-spacing, spacing):
        for ey in (-spacing, spacing):
            center = jnp.asarray([ex, ey, -radius], jnp.float32)
            # Eyeball sphere.
            all_verts.append(center + radius * jnp.asarray(overts))
            all_tris.append(otris + n_v)
            all_shades.append(np.full(len(otris), 235.0, np.float32))
            n_v += len(overts)
            # Pupil: a small disc on the sphere surface facing the
            # camera (the "eyes follow you" behavior, EyeGame.cc:150+).
            d = cam_center_w - center
            d = d / jnp.maximum(jnp.linalg.norm(d), 1e-9)
            # Orthonormal frame around d.
            up = jnp.where(jnp.abs(d[2]) < 0.9,
                           jnp.asarray([0.0, 0.0, 1.0]),
                           jnp.asarray([1.0, 0.0, 0.0]))
            u = jnp.cross(d, up)
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-9)
            v = jnp.cross(d, u)
            pc = center + d * radius * 1.02
            pr = 0.35 * radius
            ang = np.linspace(0, 2 * np.pi, 7)[:6]
            ring = jnp.stack([pc + pr * (np.cos(a) * u + np.sin(a) * v)
                              for a in ang])
            all_verts.append(jnp.concatenate([pc[None], ring]))
            fan = np.array([[0, 1 + i, 1 + (i + 1) % 6] for i in range(6)],
                           np.int32)
            all_tris.append(fan + n_v)
            all_shades.append(np.full(6, 15.0, np.float32))
            n_v += 7
    # tris/shades are static (pure numpy) so callers can jit with them as
    # compile-time constants; verts are traced (pose-dependent).
    return (jnp.concatenate(all_verts),
            np.concatenate(all_tris),
            np.concatenate(all_shades))


def render_ar_frame(frame: Array, pose: SE3, cam: atan.Camera,
                    image_size: Tuple[int, int], verts: Array,
                    tris: Array, shades: Array,
                    ufb_size: Tuple[int, int] = (640, 480)) -> Array:
    """Full AR pipeline for one frame (ref: ARDriver::Render,
    src/ARDriver.cc:60-92): undistort -> overlay 3D -> re-distort."""
    linear = undistort_frame(frame, cam, ufb_size)
    Wl, Hl = ufb_size
    p_cam = verts @ pose.R.T + pose.t
    z = jnp.maximum(p_cam[:, 2], 1e-3)
    implane = p_cam[:, :2] / z[:, None]
    ufb = atan.ufb_linear_project(implane, cam)
    verts2 = jnp.stack([ufb[:, 0] * Wl - 0.5, ufb[:, 1] * Hl - 0.5], -1)
    linear = _raster_triangles(linear, verts2, z, np.asarray(tris),
                               np.asarray(shades))
    return redistort_frame(linear, cam, image_size)

"""ATAN (FOV / Devernay-Faugeras) camera model, batched + jittable.

Capability parity with the reference's ATANCamera (ref: src/ATANCamera.cc,
include/ATANCamera.h:130-160). The reference caches per-projection state in
mutable members and warns it is not thread-safe (ref: include/ATANCamera.h:
13-16); here every function is pure and broadcasts over arbitrary batch
dims, so one camera serves every thread of execution for free.

Normalized parameters [fx, fy, cx, cy, w] scale with image size exactly as
the reference does (ref: src/ATANCamera.cc:34-37, including the -0.5 pixel
center offset).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class Camera(NamedTuple):
    """Precomputed camera state (ref: ATANCamera::RefreshParams,
    src/ATANCamera.cc:27-105)."""

    params: Array        # (5,) normalized [fx fy cx cy w]
    image_size: Array    # (2,) [width, height] float
    focal: Array         # (2,) pixel focal
    center: Array        # (2,) pixel center
    inv_focal: Array     # (2,)
    w: Array             # () distortion param
    two_tan: Array       # () 2*tan(w/2)
    one_over_2tan: Array # ()
    winv: Array          # () 1/w
    distortion_enabled: Array  # () 1.0 or 0.0
    largest_radius: Array      # ()
    max_r: Array               # () 1.5 * largest
    one_pixel_dist: Array      # () z=1 distance of one pixel
    implane_tl: Array          # (2,) undistorted image-plane bounding box
    implane_br: Array          # (2,)
    ufb_linear_focal: Array    # (2,)
    ufb_linear_center: Array   # (2,)


def _rtrans_factor(r: Array, cam: Camera) -> Array:
    """Distorted/undistorted radius ratio (ref: include/ATANCamera.h:143-149)."""
    safe_r = jnp.where(r < 0.001, 1.0, r)
    fac = cam.winv * jnp.arctan(safe_r * cam.two_tan) / safe_r
    return jnp.where((r < 0.001) | (cam.distortion_enabled == 0.0), 1.0, fac)


def _invrtrans(r: Array, cam: Camera) -> Array:
    """Undistorted radius from distorted (ref: include/ATANCamera.h:151-157)."""
    return jnp.where(cam.distortion_enabled == 0.0, r,
                     jnp.tan(r * cam.w) * cam.one_over_2tan)


def make_camera(params, image_size: Tuple[int, int]) -> Camera:
    """Build the precomputed Camera state (RefreshParams equivalent)."""
    p = jnp.asarray(params, jnp.float32)
    size = jnp.asarray(image_size, jnp.float32)
    focal = size * p[:2]
    center = size * p[2:4] - 0.5
    w = p[4]
    dist_on = jnp.where(w != 0.0, 1.0, 0.0)
    safe_w = jnp.where(w != 0.0, w, 1.0)
    two_tan = jnp.where(w != 0.0, 2.0 * jnp.tan(safe_w / 2.0), 0.0)
    one_over_2tan = jnp.where(w != 0.0, 1.0 / jnp.where(two_tan == 0, 1.0,
                                                        two_tan), 0.0)
    winv = jnp.where(w != 0.0, 1.0 / safe_w, 0.0)

    cam = Camera(
        params=p, image_size=size, focal=focal, center=center,
        inv_focal=1.0 / focal, w=w, two_tan=two_tan,
        one_over_2tan=one_over_2tan, winv=winv, distortion_enabled=dist_on,
        largest_radius=jnp.float32(0), max_r=jnp.float32(jnp.inf),
        one_pixel_dist=jnp.float32(0),
        implane_tl=jnp.zeros(2, jnp.float32),
        implane_br=jnp.zeros(2, jnp.float32),
        ufb_linear_focal=jnp.ones(2, jnp.float32),
        ufb_linear_center=jnp.zeros(2, jnp.float32),
    )
    # Largest valid radius (ref: src/ATANCamera.cc:59-66).
    v2 = jnp.stack([jnp.maximum(p[2], 1.0 - p[2]) / p[0],
                    jnp.maximum(p[3], 1.0 - p[3]) / p[1]])
    largest = _invrtrans(jnp.linalg.norm(v2), cam)
    cam = cam._replace(largest_radius=largest, max_r=1.5 * largest)
    # One-pixel z=1 distance (ref: :68-75).
    c0 = unproject(size / 2.0, cam)
    c1 = unproject(size / 2.0 + 1.0, cam)
    one_px = jnp.linalg.norm(c0 - c1) / jnp.sqrt(2.0)
    cam = cam._replace(one_pixel_dist=one_px)
    # UFB linear bounds (ref: :77-103).
    corners = jnp.stack([
        unproject(jnp.array([-0.5, -0.5], jnp.float32), cam),
        unproject(jnp.array([size[0] - 0.5, -0.5]), cam),
        unproject(jnp.array([size[0] - 0.5, size[1] - 0.5]), cam),
        unproject(jnp.array([-0.5, size[1] - 0.5]), cam),
    ])
    tl = jnp.min(corners, axis=0)
    br = jnp.max(corners, axis=0)
    rng = br - tl
    ufb_focal = 1.0 / rng
    ufb_center = -tl * ufb_focal
    return cam._replace(implane_tl=tl, implane_br=br,
                        ufb_linear_focal=ufb_focal,
                        ufb_linear_center=ufb_center)


def project(cam_xy: Array, cam: Camera) -> Array:
    """z=1-plane coords (..., 2) -> pixels (..., 2)
    (ref: ATANCamera::Project, src/ATANCamera.cc:109-121)."""
    r = jnp.linalg.norm(cam_xy, axis=-1)
    factor = _rtrans_factor(r, cam)
    dist = factor[..., None] * cam_xy
    return cam.center + cam.focal * dist


def project_valid(cam_xy: Array, cam: Camera) -> Array:
    """Validity of the last projection (ref: mbInvalid, r > mdMaxR)."""
    r = jnp.linalg.norm(cam_xy, axis=-1)
    return r <= cam.max_r


def unproject(pix: Array, cam: Camera) -> Array:
    """Pixels (..., 2) -> z=1-plane coords
    (ref: ATANCamera::UnProject, src/ATANCamera.cc:125-140)."""
    dist = (pix - cam.center) * cam.inv_focal
    dist_r = jnp.linalg.norm(dist, axis=-1)
    r = _invrtrans(dist_r, cam)
    factor = jnp.where(dist_r > 0.01,
                       r / jnp.where(dist_r <= 0.01, 1.0, dist_r), 1.0)
    return factor[..., None] * dist


def project_derivs(cam_xy: Array, cam: Camera) -> Array:
    """d(pixel)/d(z=1 coords), (..., 2, 2)
    (ref: ATANCamera::GetProjectionDerivs, src/ATANCamera.cc:179-209)."""
    x, y = cam_xy[..., 0], cam_xy[..., 1]
    r = jnp.linalg.norm(cam_xy, axis=-1) * cam.distortion_enabled
    factor = _rtrans_factor(jnp.linalg.norm(cam_xy, axis=-1), cam)
    k = cam.two_tan
    small = r < 0.01
    rr = jnp.where(small, 1.0, r * r)
    frac_dx = jnp.where(small, 0.0,
                        cam.winv * (k * x) / (rr * (1 + k * k * rr))
                        - x * factor / rr)
    frac_dy = jnp.where(small, 0.0,
                        cam.winv * (k * y) / (rr * (1 + k * k * rr))
                        - y * factor / rr)
    fx, fy = cam.focal[0], cam.focal[1]
    j00 = fx * (frac_dx * x + factor)
    j10 = fy * (frac_dx * y)
    j01 = fx * (frac_dy * x)
    j11 = fy * (frac_dy * y + factor)
    return jnp.stack([jnp.stack([j00, j01], axis=-1),
                      jnp.stack([j10, j11], axis=-1)], axis=-2)


def param_derivs(cam_xy: Array, cam: Camera) -> Array:
    """d(pixel)/d(5 normalized params), numeric, (..., 2, 5) — used by the
    calibrator (ref: ATANCamera::GetCameraParameterDerivs,
    src/ATANCamera.cc:211-237; same 1e-3 step)."""
    size = (int(cam.image_size[0]), int(cam.image_size[1]))

    def proj_with(p):
        return project(cam_xy, make_camera(p, size))

    base = proj_with(cam.params)
    eps = 1e-3
    cols = []
    for i in range(5):
        dp = cam.params.at[i].add(eps)
        cols.append((proj_with(dp) - base) / eps)
    J = jnp.stack(cols, axis=-1)  # (..., 2, 5)
    # Reference zeroes the w column when distortion is off.
    J = J.at[..., 4].multiply(cam.distortion_enabled)
    return J


def ufb_project(cam_xy: Array, cam: Camera) -> Array:
    """Project to unit frame buffer coords (ref: src/ATANCamera.cc:254-267)."""
    r = jnp.linalg.norm(cam_xy, axis=-1)
    dist = _rtrans_factor(r, cam)[..., None] * cam_xy
    return cam.params[2:4] + cam.params[:2] * dist


def ufb_unproject(ufb: Array, cam: Camera) -> Array:
    """(ref: src/ATANCamera.cc:269-284)."""
    dist = (ufb - cam.params[2:4]) / cam.params[:2]
    dist_r = jnp.linalg.norm(dist, axis=-1)
    r = _invrtrans(dist_r, cam)
    factor = jnp.where(dist_r > 0.01,
                       r / jnp.where(dist_r <= 0.01, 1.0, dist_r), 1.0)
    return factor[..., None] * dist


def ufb_linear_project(cam_xy: Array, cam: Camera) -> Array:
    """Linear (undistorted) UFB projection (ref: ATANCamera.h UFBLinear*)."""
    return cam_xy * cam.ufb_linear_focal + cam.ufb_linear_center


def ufb_linear_unproject(ufb: Array, cam: Camera) -> Array:
    return (ufb - cam.ufb_linear_center) / cam.ufb_linear_focal

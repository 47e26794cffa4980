"""Offline map visualization.

Capability parity with the reference MapViewer (ref: src/MapViewer.cc:
19-226 — grid, per-level colored point dots, camera/keyframe frusta,
orbitable view) re-imagined as headless renders: instead of an OpenGL
window, a jitted rasterizer draws the map into an RGB array that can be
saved to disk (PPM, dependency-free) or returned to notebooks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ptam_cg_tpu.models.map_state import MapState
from ptam_cg_tpu.utils.se3 import SE3

#: Per-level point colors (ref: Level::mvLevelColors, src/KeyFrame.cc:84-90).
LEVEL_COLORS = np.array([
    [1.0, 0.0, 0.0],
    [1.0, 1.0, 0.0],
    [0.0, 1.0, 0.0],
    [0.0, 0.0, 0.7],
], np.float32)


def _world_to_canvas(pts: np.ndarray, center, scale, size):
    x = (pts[:, 0] - center[0]) * scale + size[0] / 2
    y = (pts[:, 1] - center[1]) * scale + size[1] / 2
    return np.stack([x, y], -1)


def render_topdown(m: MapState, size: Tuple[int, int] = (800, 800),
                   trajectory: Optional[np.ndarray] = None,
                   grid_step: float = 0.1) -> np.ndarray:
    """Top-down (x-y plane) render: grid lines, map points colored by
    source level, keyframe positions, optional trajectory polyline.
    Returns (H, W, 3) uint8."""
    W, H = size
    img = np.full((H, W, 3), 25, np.uint8)
    valid = np.asarray(m.point_valid)
    pts = np.asarray(m.point_pos)[valid]
    lvl = np.asarray(m.point_src_level)[valid]
    kf_valid = np.asarray(m.kf_valid)
    centers = -np.einsum("kji,kj->ki", np.asarray(m.kf_R),
                         np.asarray(m.kf_t))[kf_valid]

    all_xy = np.concatenate(
        [pts[:, :2] if len(pts) else np.zeros((0, 2)),
         centers[:, :2] if len(centers) else np.zeros((0, 2))])
    if len(all_xy) == 0:
        return img
    lo = all_xy.min(0)
    hi = all_xy.max(0)
    center = (lo + hi) / 2
    span = max(float((hi - lo).max()), 1e-3)
    scale = 0.85 * min(W, H) / span

    # Grid lines every grid_step world units (ref: DrawGrid).
    def draw_px(canvas, xy, color, radius=1):
        xi = np.round(xy[:, 0]).astype(int)
        yi = np.round(xy[:, 1]).astype(int)
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                xs = np.clip(xi + dx, 0, W - 1)
                ys = np.clip(yi + dy, 0, H - 1)
                canvas[ys, xs] = color

    n_lines = int(span / grid_step) + 2
    g0 = np.floor(lo / grid_step) * grid_step
    for i in range(n_lines):
        v = g0[0] + i * grid_step
        x = int(round((v - center[0]) * scale + W / 2))
        if 0 <= x < W:
            img[:, x] = (45, 45, 45)
        v = g0[1] + i * grid_step
        y = int(round((v - center[1]) * scale + H / 2))
        if 0 <= y < H:
            img[y, :] = (45, 45, 45)

    for level in range(4):
        sel = lvl == level
        if sel.any():
            xy = _world_to_canvas(pts[sel], center, scale, (W, H))
            draw_px(img, xy, (LEVEL_COLORS[level] * 255).astype(np.uint8))

    if trajectory is not None and len(trajectory):
        xy = _world_to_canvas(np.asarray(trajectory), center, scale,
                              (W, H))
        draw_px(img, xy, np.array([200, 200, 255], np.uint8), 0)

    if len(centers):
        xy = _world_to_canvas(centers, center, scale, (W, H))
        draw_px(img, xy, np.array([255, 255, 255], np.uint8), 2)
    return img


def project_points_into_frame(m: MapState, pose: SE3, cam, image_size):
    """Per-frame overlay data (the reference draws tracked dots colored
    by level, src/Tracker.cc:646-660): returns (pix (N,2), level (N,),
    visible mask)."""
    import jax.numpy as jnp

    from ptam_cg_tpu.camera import atan

    W, H = image_size
    p_cam = np.asarray(m.point_pos) @ np.asarray(pose.R).T \
        + np.asarray(pose.t)
    z = p_cam[:, 2]
    ok = (z > 1e-3) & np.asarray(m.point_valid)
    z1 = p_cam[:, :2] / np.where(ok, z, 1.0)[:, None]
    pix = np.asarray(atan.project(jnp.asarray(z1, jnp.float32), cam))
    ok &= ((pix[:, 0] >= 0) & (pix[:, 1] >= 0)
           & (pix[:, 0] < W) & (pix[:, 1] < H))
    return pix, np.asarray(m.point_src_level), ok


def overlay_tracked_points(frame: np.ndarray, pix, levels, mask
                           ) -> np.ndarray:
    """Draw tracked-point dots on a grayscale frame -> RGB uint8."""
    img = np.stack([np.asarray(frame)] * 3, -1).astype(np.uint8)
    H, W = img.shape[:2]
    for level in range(4):
        sel = mask & (levels == level)
        if not sel.any():
            continue
        xi = np.clip(np.round(pix[sel, 0]).astype(int), 1, W - 2)
        yi = np.clip(np.round(pix[sel, 1]).astype(int), 1, H - 2)
        c = (LEVEL_COLORS[level] * 255).astype(np.uint8)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                img[yi + dy, xi + dx] = c
    return img


def save_ppm(path: str, img: np.ndarray) -> None:
    """Dependency-free image writer (binary PPM)."""
    img = np.asarray(img, np.uint8)
    with open(path, "wb") as f:
        f.write(f"P6 {img.shape[1]} {img.shape[0]} 255\n".encode())
        f.write(img.tobytes())

"""Trajectory evaluation: Sim(3) alignment + ATE.

The monocular map is defined up to a similarity transform (the reference
pins scale with the 0.1m wiggle baseline, ref: src/MapMaker.cc:295-297),
so absolute trajectory error is measured after a least-squares Sim(3)
alignment of camera centers (Umeyama) — the standard TUM-RGBD evaluation
protocol the reference's dataset harness targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ptam_cg_tpu.utils.se3 import SE3

Array = jax.Array


def camera_centers(poses: SE3) -> Array:
    """Batched camera centers in world coords: -R^T t."""
    return -jnp.einsum("nji,nj->ni", poses.R, poses.t)


def align_sim3(est: Array, gt: Array):
    """Umeyama similarity alignment est -> gt.

    est/gt: (N, 3) point sets. Returns (s, R, t) with
    gt ~= s * R @ est + t.
    """
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    ec = est - mu_e
    gc = gt - mu_g
    cov = gc.T @ ec / len(est)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_e = (ec ** 2).sum() / len(est)
    s = float(np.trace(np.diag(D) @ S) / max(var_e, 1e-12))
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est_centers: Array, gt_centers: Array) -> float:
    """ATE RMSE (meters, in GT scale) after Sim(3) alignment."""
    s, R, t = align_sim3(est_centers, gt_centers)
    est = np.asarray(est_centers, np.float64)
    gt = np.asarray(gt_centers, np.float64)
    aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=-1))))

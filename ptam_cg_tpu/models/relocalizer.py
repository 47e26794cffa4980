"""Relocalization after lost tracking.

Capability parity with the reference Relocaliser (ref: src/Relocaliser.cc:
12-38): score the current frame's SBI against every keyframe's SBI by
zero-mean SSD, ESM-align to the best, convert the SE2 to a pure camera
rotation, and propose pose = rotation ∘ best-KF pose. Success iff the ESM
score beats ``Reloc2.MaxScore`` (9e6, ref: config/settings.cfg:34).

The reference's linear scan over keyframes is one batched reduction here.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ptam_cg_tpu.models.map_state import MapState
from ptam_cg_tpu.ops import sbi as sbiops
from ptam_cg_tpu.utils import se3 as se3lib
from ptam_cg_tpu.utils.se3 import SE3, _pinned_f32

Array = jax.Array


class RelocResult(NamedTuple):
    pose: SE3        # proposed camera-from-world pose
    best_kf: Array   # () int32
    score: Array     # () final ESM score
    success: Array   # () bool


@_pinned_f32
def attempt_recovery(m: MapState, cur_sbi: sbiops.SBI, cam_params: Array,
                     sbi_size: Tuple[int, int],
                     max_score: float = 9e6,
                     esm_iterations: int = 10) -> RelocResult:
    """Jittable recovery attempt (ref: Relocaliser::AttemptRecovery)."""
    # Batched zero-mean SSD against every keyframe SBI (ref: :21-31).
    diff = m.kf_sbi - cur_sbi.template[None]
    ssd = jnp.sum(diff * diff, axis=(-2, -1))
    ssd = jnp.where(m.kf_valid, ssd, jnp.inf)
    best = jnp.argmin(ssd)

    target = sbiops.SBI(template=m.kf_sbi[best], jac=m.kf_sbi_jac[best])
    rot, score = sbiops.calc_sbi_rotation(cur_sbi, target, cam_params,
                                          sbi_size, esm_iterations)
    # pose = delta-rotation ∘ best-KF pose (ref: :35-36).
    best_pose = SE3(m.kf_R[best], m.kf_t[best])
    pose = se3lib.mul(rot, best_pose)
    return RelocResult(pose=pose, best_kf=best, score=score,
                       success=(score < max_score) & m.kf_valid[best])

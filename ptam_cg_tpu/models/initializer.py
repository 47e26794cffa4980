"""Map bootstrap: trail tracking + two-view stereo initialization.

Capability parity with the reference's init path (ref:
Tracker::TrackForInitialMap / TrailTracking_* src/Tracker.cc:311-432 and
MapMaker::InitFromStereo src/MapMaker.cc:268-405):

- trails: 9x9 MiniPatch SSD tracking of the strongest Shi-Tomasi
  candidates with forward/backward married matching — batched over all
  trails with the windowed SSD search
- stereo init: homography MLESAC from surviving trails, wiggle-scale
  baseline, per-trail subpixel alignment in the second view,
  triangulation, 5x global BA, epipolar expansion at all levels, BA to
  convergence, dominant-plane alignment to z=0
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ptam_cg_tpu.camera import atan
from ptam_cg_tpu.config import InitConfig, MINI_PATCH_SIZE
from ptam_cg_tpu.models import homography as homoglib
from ptam_cg_tpu.models import map_state as ms
from ptam_cg_tpu.models.keyframe import FrameFeatures
from ptam_cg_tpu.models.mapmaker import MapMaker
from ptam_cg_tpu.ops import levels as levelops
from ptam_cg_tpu.ops import patch as patchops
from ptam_cg_tpu.utils import geometry
from ptam_cg_tpu.utils import se3 as se3lib
from ptam_cg_tpu.utils.se3 import SE3

Array = jax.Array

MINI_MAX_SSD = 100000.0      # ref: include/ImageProcess.h:39
TRAIL_RANGE = 10             # ref: include/ImageProcess.h:43


class TrailState(NamedTuple):
    init_pos: Array    # (N, 2) level-0 position in the first keyframe
    cur_pos: Array     # (N, 2) current position
    patch: Array       # (N, 9, 9) MiniPatch sampled at trail start
    valid: Array       # (N,) bool


def _extract_patches(atlas: Array, pos: Array, size: int):
    """Integer-centered patches; top-left = pos - size//2 (GetImageROI
    convention, ref: src/ImageProcess.cc:11-18)."""
    Ha, Wa = atlas.shape

    def one(p):
        x0 = p[0].astype(jnp.int32) - size // 2
        y0 = p[1].astype(jnp.int32) - size // 2
        ok = (x0 >= 0) & (y0 >= 0) & (x0 + size <= Wa) & (y0 + size <= Ha)
        x0c = jnp.clip(x0, 0, Wa - size)
        y0c = jnp.clip(y0, 0, Ha - size)
        patch = jax.lax.dynamic_slice(atlas, (y0c, x0c), (size, size))
        return patch.astype(jnp.float32), ok

    return jax.vmap(one)(pos)


def trail_start(frame: FrameFeatures, image_size,
                max_trails: int = 1000) -> TrailState:
    """Start trails at the strongest level-0 Shi-Tomasi candidates
    (ref: TrailTracking_Start, src/Tracker.cc:352-370)."""
    cand_xy = frame.cand_xy[0].astype(jnp.float32)       # already sorted
    cand_ok = frame.cand_valid[0]
    N = min(max_trails, cand_xy.shape[0])
    pos = cand_xy[:N]
    ok = cand_ok[:N]
    patches, pok = _extract_patches(frame.atlas, pos, MINI_PATCH_SIZE)
    return TrailState(init_pos=pos, cur_pos=pos, patch=patches,
                      valid=ok & pok)


def trail_advance(trails: TrailState, prev_frame: FrameFeatures,
                  cur_frame: FrameFeatures,
                  image_size) -> Tuple[TrailState, Array]:
    """One frame of trail tracking with married matching
    (ref: TrailTracking_Advance, src/Tracker.cc:376-432)."""
    W, H = image_size
    N = trails.cur_pos.shape[0]
    bounds = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, float(W), float(H)]), (N, 4))
    radius = jnp.full(N, float(TRAIL_RANGE))

    fwd = patchops.ssd_search(
        cur_frame.atlas, cur_frame.corner_mask, trails.patch,
        trails.cur_pos, radius, bounds, r_win=TRAIL_RANGE,
        max_ssd=MINI_MAX_SSD, zero_mean=False,
        patch_size=MINI_PATCH_SIZE)
    found = trails.valid & fwd.found

    # Married backwards match: sample the found patch in the current
    # frame, search back in the previous frame, must return to the start.
    back_patch, bok = _extract_patches(cur_frame.atlas, fwd.pos,
                                       MINI_PATCH_SIZE)
    bwd = patchops.ssd_search(
        prev_frame.atlas, prev_frame.corner_mask, back_patch, fwd.pos,
        radius, bounds, r_win=TRAIL_RANGE, max_ssd=MINI_MAX_SSD,
        zero_mean=False, patch_size=MINI_PATCH_SIZE)
    ret = jnp.sum((bwd.pos - trails.cur_pos) ** 2, axis=-1)
    married = bwd.found & (ret <= 2.0)
    good = found & bok & married

    new_pos = jnp.where(good[:, None], fwd.pos, trails.cur_pos)
    out = TrailState(init_pos=trails.init_pos, cur_pos=new_pos,
                     patch=trails.patch, valid=good)
    return out, jnp.sum(good.astype(jnp.int32))


def trails_to_matches(trails: TrailState, cam: atan.Camera,
                      cap: int) -> homoglib.Matches:
    """Trail pairs -> z=1-plane homography matches
    (ref: src/MapMaker.cc:272-279)."""
    N = trails.init_pos.shape[0]
    n = min(N, cap)
    first = atan.unproject(trails.init_pos[:n], cam)
    second = atan.unproject(trails.cur_pos[:n], cam)
    jac = atan.project_derivs(second, cam)
    pad = cap - n
    z2 = jnp.zeros((pad, 2))
    return homoglib.Matches(
        first=jnp.concatenate([first, z2]),
        second=jnp.concatenate([second, z2]),
        pixel_jac=jnp.concatenate(
            [jac, jnp.broadcast_to(jnp.eye(2), (pad, 2, 2))]),
        valid=jnp.concatenate([trails.valid[:n],
                               jnp.zeros(pad, bool)]))


def init_from_stereo(mapmaker: MapMaker, first: FrameFeatures,
                     second: FrameFeatures, trails: TrailState,
                     key: Array,
                     cfg: InitConfig = InitConfig()) -> Optional[SE3]:
    """Full stereo initialization (ref: MapMaker::InitFromStereo,
    src/MapMaker.cc:268-405). Returns the second-view pose on success
    (the tracker's new pose), None on failure."""
    cam = mapmaker.cam
    W, H = mapmaker.image_size
    m = mapmaker.map
    P = m.point_pos.shape[0]

    matches = trails_to_matches(trails, cam, cfg.max_matches)
    res = homoglib.compute(matches, key, cfg.mlesac_sigma,
                           cfg.mlesac_trials, cfg.refine_iterations)
    if not bool(res.success):
        return None
    se3 = res.se3_second_from_first
    tnorm = float(jnp.linalg.norm(se3.t))
    if tnorm < 1e-6:
        return None
    wiggle = mapmaker.cfg.wiggle_scale
    se3 = SE3(se3.R, se3.t * (wiggle / tnorm))

    # Insert the two keyframes: first fixed at the origin.
    m = ms.insert_keyframe(m, 0, first, se3lib.identity(), fixed=True)
    m = ms.insert_keyframe(m, 1, second, se3)

    # Per-trail subpixel alignment in the second view (ref: :330-344).
    n = min(trails.init_pos.shape[0], cfg.max_matches)
    tmpl, tok = _extract_patches(first.atlas, trails.init_pos[:n], 8)
    bounds = jnp.broadcast_to(jnp.asarray([0.0, 0.0, float(W), float(H)]),
                              (n, 4))
    sp = patchops.subpix_refine(second.atlas, tmpl, trails.cur_pos[:n],
                                bounds, max_its=10)
    ok = trails.valid[:n] & tok & sp.converged

    v2_first = atan.unproject(trails.init_pos[:n], cam)
    v2_second = atan.unproject(sp.pos, cam)
    p_world = geometry.triangulate(se3, v2_second, v2_first)
    ok = ok & (p_world[:, 2] > 0.0)

    # Write points into the first n map slots.
    idx = jnp.arange(n)
    slot = jnp.where(ok, idx, P)
    c_nc, r_nc, d_nc, nrm = ms.make_point_rays(
        trails.init_pos[:n], jnp.zeros(n, jnp.int32), se3lib.identity(),
        cam, (W, H))

    def scat(arr, val):
        return arr.at[slot].set(val, mode="drop")

    m = m._replace(
        point_pos=scat(m.point_pos, p_world),
        point_valid=m.point_valid.at[slot].set(True, mode="drop"),
        point_src_kf=scat(m.point_src_kf, jnp.zeros(n, jnp.int32)),
        point_src_level=scat(m.point_src_level, jnp.zeros(n, jnp.int32)),
        point_center=scat(m.point_center, trails.init_pos[:n]),
        point_center_nc=scat(m.point_center_nc, c_nc),
        point_right_nc=scat(m.point_right_nc, r_nc),
        point_down_nc=scat(m.point_down_nc, d_nc),
        point_normal_nc=scat(m.point_normal_nc, nrm),
        point_source=scat(m.point_source,
                          jnp.full(n, ms.SRC_ROOT, jnp.int32)),
        good=jnp.asarray(True),
    )
    m = ms.refresh_pixel_vectors(m)
    m = ms.set_measurements(m, 0, slot, trails.init_pos[:n],
                            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                            jnp.full(n, ms.SRC_ROOT, jnp.int32), ok)
    m = ms.set_measurements(m, 1, slot, sp.pos,
                            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
                            jnp.full(n, ms.SRC_TRAIL, jnp.int32), ok)
    mapmaker.map = m
    mapmaker.good_host = True   # host mirror of map.good (set above)
    mapmaker._n_kfs_host = 2
    if int(m.n_points()) < 4:
        return None

    def ba_failed() -> bool:
        """BA numerical failure inside init = the stereo pair was too
        ill-conditioned (e.g. an under-baselined auto-init pair: the LM
        outlier pruning death-spirals to an empty problem and a singular
        Schur system). The reference's InitFromStereo returns false when
        its init-time BA fails (ref: src/MapMaker.cc:374-405) so the
        tracker restarts trail-tracking — fail HERE instead of letting
        the engine enter TRACKING for one frame and then ditch the map
        via the reset handshake."""
        if mapmaker.reset_requested:
            mapmaker.reset_requested = False
            return True
        return False

    # 5x global BA (ref: :372-373); unbudgeted — init is one-time.
    for _ in range(5):
        mapmaker.bundle_adjust_all(full=True)
        if ba_failed():
            return None

    # Scene depth stats + wiggle normalization (ref: :376-380).
    d0, s0 = ms.scene_depth_for_kf(mapmaker.map, 0)
    d1, s1 = ms.scene_depth_for_kf(mapmaker.map, 1)
    mapmaker.map = mapmaker.map._replace(
        kf_depth_mean=mapmaker.map.kf_depth_mean.at[0].set(d0).at[1]
        .set(d1),
        kf_depth_sigma=mapmaker.map.kf_depth_sigma.at[0].set(s0).at[1]
        .set(s1))
    mapmaker.wiggle_depth_norm = wiggle / max(float(d0), 1e-6)

    # Epipolar expansion at all levels from the second KF (ref: :382-385).
    for lev in (0, 3, 1, 2):
        mapmaker.add_some_map_points(1, lev)

    # Global BA to convergence (ref: :390-394).
    mapmaker.converged_full = False
    for _ in range(20):
        if mapmaker.converged_full:
            break
        mapmaker.bundle_adjust_all(full=True)
        if ba_failed():
            return None

    # Plane alignment (ref: :396-397) — one jitted dispatch.
    mapmaker.map = mapmaker._jit_plane_align(mapmaker.map,
                                             mapmaker._next_key())

    pose2 = SE3(mapmaker.map.kf_R[1], mapmaker.map.kf_t[1])
    return pose2

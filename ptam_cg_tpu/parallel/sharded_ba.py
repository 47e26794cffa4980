"""Distributed global bundle adjustment over a JAX device mesh.

The reference has no distributed backend — global BA runs on one CPU core
and is the scaling bottleneck (ref: src/Bundle.cc:364-446 O(meas*cams)
per LM step; SURVEY §5.7-5.8). Here the problem is **point-sharded**: each
device owns a contiguous block of map points, every measurement lives on
the device that owns its point, and the only things that ever cross the
ICI are camera-sized blocks:

per LM step      U (36C) + ea (6C) + error scalar      [psum]
                 squared residuals for the robust sigma [all_gather, O(M)
                 scalars — the one meas-sized collective, 4 bytes/meas]
per inner lambda retry
                 S_off partial (36 C^2) + rhs corr (6C)
                 + update-norm / new-error scalars      [psum]

The big tensors — V (P,3,3), eb, and the W blocks (P,C,6,3), which are
O(P*18C) and were the scaling killer when psummed densely — never move:
each device holds only its point-shard slice (P/D, C, 6, 3), computes its
partial of the reduced camera system S_off = sum_p W_p V*_p^-1 W_p^T as
ONE local (6C, 3P/D) @ (3P/D, 6C) MXU matmul, and contributes a (6C)^2
block to the psum. This is the TPU-native form of the reference's
camera-pair "off-diagonal scripts" (ref: src/Bundle.cc:572-599): the
scripts exploit per-point observer sparsity serially; the dense per-shard
matmul replays exactly the same sum with the MXU's throughput, and the
collective is independent of both P and M. Point back-substitution
(ref: src/Bundle.cc:461-483) is local to the point shard; the (6C)^2
Cholesky of S runs replicated (at the 500-KF north star S is 3000^2 —
~9 GFLOP, negligible next to the per-shard S_off matmul).

``make_sharded_lm_step`` returns a jitted shard_map program; the driver's
``dryrun_multichip`` compiles it on an N-virtual-device CPU mesh, and
``tests/test_sharded_ba.py`` checks equal-results vs the single-chip step
at 128 KF / 16k points / 64k measurements.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ptam_cg_tpu.camera import atan
from ptam_cg_tpu.ops import patch as patchops
from ptam_cg_tpu.config import BundleConfig
from ptam_cg_tpu.models import bundle as bundlelib
from ptam_cg_tpu.models.bundle import BundleProblem, LMState
from ptam_cg_tpu.utils import mest
from ptam_cg_tpu.utils import se3 as se3lib

Array = jax.Array

#: Per-shard measurement capacity is padded to this multiple so the
#: reordered table tiles cleanly onto the VPU lanes.
_MEAS_PAD = 128


def _shard_permutation(meas_pt: np.ndarray, meas_valid: np.ndarray,
                       points_per_shard: int, n_shards: int
                       ) -> Tuple[np.ndarray, int]:
    """Group measurements by owning point shard.

    Returns ``(perm, per_shard)`` where ``perm`` has length
    ``n_shards * per_shard``; entry j holds the original measurement index
    placed at slot j, or -1 for padding.
    """
    owner = np.where(meas_valid, meas_pt // points_per_shard, -1)
    counts = np.bincount(owner[owner >= 0], minlength=n_shards)
    per_shard = max(int(counts.max()) if counts.size else 1, 1)
    per_shard = -(-per_shard // _MEAS_PAD) * _MEAS_PAD
    perm = np.full(n_shards * per_shard, -1, np.int64)
    for d in range(n_shards):
        idx = np.nonzero(owner == d)[0]
        perm[d * per_shard:d * per_shard + len(idx)] = idx
    return perm, per_shard


def shard_problem(problem: BundleProblem, mesh: Mesh, axis: str = "mp",
                  return_perm: bool = False):
    """Point-shard a BundleProblem onto ``mesh``.

    Points (and their V/W blocks, computed later) are block-sharded on
    ``axis``; measurements are reordered host-side so each lands on the
    device owning its point, padded per shard to a common static count;
    cameras are replicated. ``meas_pt`` stays a GLOBAL point index — the
    sharded step localizes it with ``axis_index``.

    The point capacity must divide the mesh size (capacities are powers
    of two in this framework; see config.MAX_POINTS).
    """
    D = mesh.shape[axis]
    Pn = problem.pt_pos.shape[0]
    if Pn % D != 0:
        raise ValueError(
            f"point capacity {Pn} not divisible by mesh size {D}")
    Pl = Pn // D
    mp_np = np.asarray(problem.meas_pt)
    mv_np = np.asarray(problem.meas_valid)
    perm, per_shard = _shard_permutation(mp_np, mv_np, Pl, D)
    take = np.maximum(perm, 0)
    pad = perm < 0
    shard_of = np.arange(D * per_shard) // per_shard

    def reord(a, pad_val):
        a = np.asarray(a)[take]
        return np.where(pad, pad_val, a)

    meas_cam = reord(problem.meas_cam, 0).astype(np.int32)
    # Padding points at the first point of the OWN shard (valid local
    # index; masked out by meas_valid anyway).
    meas_pt = reord(problem.meas_pt, 0).astype(np.int32)
    meas_pt = np.where(pad, shard_of * Pl, meas_pt)
    meas_pos = np.asarray(problem.meas_pos)[take]
    meas_pos = np.where(pad[:, None], 0.0, meas_pos).astype(np.float32)
    meas_noise = reord(problem.meas_sqrt_inv_noise, 1.0).astype(np.float32)
    meas_valid = reord(problem.meas_valid, False).astype(bool)
    meas_bad = reord(problem.meas_bad, False).astype(bool)

    repl = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis))
    put = jax.device_put
    out = BundleProblem(
        cam_R=put(problem.cam_R, repl), cam_t=put(problem.cam_t, repl),
        cam_fixed=put(problem.cam_fixed, repl),
        cam_valid=put(problem.cam_valid, repl),
        pt_pos=put(problem.pt_pos, shd),
        pt_valid=put(problem.pt_valid, shd),
        meas_cam=put(meas_cam, shd), meas_pt=put(meas_pt, shd),
        meas_pos=put(meas_pos, shd),
        meas_sqrt_inv_noise=put(meas_noise, shd),
        meas_valid=put(meas_valid, shd), meas_bad=put(meas_bad, shd))
    if return_perm:
        return out, perm
    return out


def unshard_measurements(original: BundleProblem, sharded: BundleProblem,
                         perm: np.ndarray) -> BundleProblem:
    """Map the sharded problem's measurement state back to the original
    measurement order (dropping padding), with updated cams/points."""
    m_bad = np.asarray(original.meas_bad).copy()
    m_valid = np.asarray(original.meas_valid).copy()
    live = perm >= 0
    m_bad[perm[live]] = np.asarray(sharded.meas_bad)[live]
    m_valid[perm[live]] = np.asarray(sharded.meas_valid)[live]
    return original._replace(
        cam_R=jnp.asarray(np.asarray(sharded.cam_R)),
        cam_t=jnp.asarray(np.asarray(sharded.cam_t)),
        pt_pos=jnp.asarray(np.asarray(sharded.pt_pos)),
        meas_bad=jnp.asarray(m_bad), meas_valid=jnp.asarray(m_valid))


def _sigma_squared_global(local_prob: BundleProblem, cam: atan.Camera,
                          cfg: BundleConfig, mest_kind: int, axis: str):
    """Robust sigma over ALL shards: all_gather the per-measurement
    squared errors (scalars — 4 bytes/meas, the only O(M) collective)
    and take the global masked median (ref sigma: src/Bundle.cc:230-237).
    """
    active = local_prob.meas_valid & ~local_prob.meas_bad
    _, _, _, err_sq, bad_proj = bundlelib._project_meas(
        local_prob.cam_R, local_prob.cam_t, local_prob.pt_pos,
        local_prob, cam)
    ok = active & ~bad_proj
    err_all = jax.lax.all_gather(err_sq, axis).reshape(-1)
    ok_all = jax.lax.all_gather(ok, axis).reshape(-1)
    return mest.find_sigma_squared(err_all, ok_all, mest_kind,
                                   min_sigma=cfg.min_sigma)


def _state_spec(axis: str) -> LMState:
    """shard_map partition specs for an LMState: cameras + control
    scalars replicated, points/measurements sharded on ``axis``."""
    repl = P()
    shd = P(axis)
    prob_spec = BundleProblem(
        cam_R=repl, cam_t=repl, cam_fixed=repl, cam_valid=repl,
        pt_pos=shd, pt_valid=shd,
        meas_cam=shd, meas_pt=shd, meas_pos=shd,
        meas_sqrt_inv_noise=shd, meas_valid=shd, meas_bad=shd)
    return LMState(problem=prob_spec, lam=repl, lam_factor=repl,
                   converged=repl, accepted=repl, iters=repl,
                   last_error=repl, failed=repl)


#: Replicated spec for the Camera pytree (all leaves are tiny scalars).
_CAM_SPEC = atan.Camera(*([P()] * len(atan.Camera._fields)))


def _sharded_step(state: LMState, cam: atan.Camera, cfg: BundleConfig,
                  mest_kind: int, axis: str) -> LMState:
    """One point-sharded LM step; runs INSIDE shard_map (per-shard views).

    Pinned f32 matmul precision — same rationale as bundle.lm_step
    (TPU default bf16 passes corrupt the normal equations)."""
    with jax.default_matmul_precision("float32"):
        return _sharded_step_body(state, cam, cfg, mest_kind, axis)


def _sharded_step_body(state: LMState, cam: atan.Camera,
                       cfg: BundleConfig, mest_kind: int,
                       axis: str) -> LMState:
    prob = state.problem            # local views inside shard_map
    C = prob.cam_R.shape[0]
    Pl = prob.pt_pos.shape[0]       # points on THIS shard
    shard = jax.lax.axis_index(axis)
    # Localize the global point indices to this shard's block.
    local = prob._replace(meas_pt=prob.meas_pt - shard * Pl)

    sigma_sq = _sigma_squared_global(local, cam, cfg, mest_kind, axis)

    # Per-shard accumulators; only the camera-sized U/ea (and the
    # error scalar) are completed over the mesh. V/eb/W stay local.
    # The lean-memory tiling (cfg.soff_tiles/u_chunks, round 5) is a
    # single-device big-problem mode — point-sharding already divides
    # the per-device working set by the mesh size, so it is forced OFF
    # here (the code below assumes the flat (18C, Pl) W layout).
    import dataclasses
    if cfg.soff_tiles or cfg.u_chunks:
        cfg = dataclasses.replace(cfg, soff_tiles=0, u_chunks=0)
    (U, ea, V9, eb, W2d, err_local, new_bad,
     good) = bundlelib._accumulators(local, cam, sigma_sq, cfg,
                                     mest_kind)
    U = jax.lax.psum(U, axis)
    ea = jax.lax.psum(ea, axis)
    current_error = jax.lax.psum(err_local, axis)

    # Loop-invariant (C6, 3Pl) view of the LOCAL flat W (P-minormost —
    # see bundle._accumulators' layout note; trailing tiny dims would
    # tile-pad 28-57x).
    W_m = W2d.reshape(C * 6, 3 * Pl)
    ebT = eb.T                                            # (3, Pl)
    free = prob.cam_valid & ~prob.cam_fixed
    free_f = free.astype(jnp.float32)

    def try_lambda(carry):
        lam, lam_factor, _, _, _, n_inner, _c, _u = carry
        Vi = bundlelib._vinv_cols(V9, lam)                # (3, 3, Pl)

        # Partial reduced camera system from this point shard,
        # completed with ONE (6C)^2 psum — communication independent
        # of P and M (the whole point of this module).
        WV_m = bundlelib._wv_product(W2d, Vi, C * 6, Pl)
        S_off = jax.lax.psum(WV_m @ W_m.T, axis).reshape(C, 6, C, 6)
        corr_rhs = jax.lax.psum(WV_m @ ebT.reshape(-1), axis)
        Ustar = U * (jnp.ones((6, 6)) + lam * jnp.eye(6))
        S = -S_off + jnp.einsum("jab,jk->jakb", Ustar, jnp.eye(C))
        rhs = ea - corr_rhs.reshape(C, 6)
        blk = (free_f[:, None, None, None]
               * free_f[None, None, :, None])
        S = S * blk + jnp.einsum(
            "jab,jk->jakb", jnp.eye(6)[None].repeat(C, 0),
            jnp.eye(C)) * (1.0 - free_f)[:, None, None, None]
        rhs = rhs * free_f[:, None]
        Sm = S.reshape(C * 6, C * 6)
        # Replicated solve: every device factors the same (6C)^2 S.
        delta_cam = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Sm + 1e-8 * jnp.eye(C * 6),
                                        lower=True),
            rhs.reshape(-1)).reshape(C, 6)
        delta_cam = delta_cam * free_f[:, None]

        # Back-substitution is local to the point shard
        # (ref: src/Bundle.cc:461-483).
        corr = (delta_cam.reshape(-1) @ W_m).reshape(3, Pl)
        rb = ebT - corr
        delta_pt = jnp.stack(
            [Vi[a, 0] * rb[0] + Vi[a, 1] * rb[1] + Vi[a, 2] * rb[2]
             for a in range(3)], axis=1)                  # (Pl, 3)
        delta_pt = delta_pt * prob.pt_valid[:, None]
        upd_sq = (jnp.sum(delta_cam ** 2)
                  + jax.lax.psum(jnp.sum(delta_pt ** 2), axis))
        conv = upd_sq < cfg.update_squared_convergence_limit

        d_pose = se3lib.se3_exp(delta_cam)
        new_R = jnp.einsum("cij,cjk->cik", d_pose.R, prob.cam_R)
        new_t = (jnp.einsum("cij,cj->ci", d_pose.R, prob.cam_t)
                 + d_pose.t)
        new_pt = prob.pt_pos + delta_pt
        # New error: local partial + psum (ref: FindNewError,
        # src/Bundle.cc:174-203).
        _, _, _, nerr_sq, nb = bundlelib._project_meas(
            new_R, new_t, new_pt, local, cam)
        active = prob.meas_valid & ~prob.meas_bad
        nerr_local = (jnp.sum(jnp.where(
            good & ~nb, mest.objective(nerr_sq, sigma_sq, mest_kind),
            0.0)) + jnp.sum((new_bad | (active & nb))
                            .astype(jnp.float32)))
        new_error = jax.lax.psum(nerr_local, axis)
        return (lam, lam_factor, new_R, new_t, new_pt, n_inner + 1,
                conv, upd_sq), new_error

    def cond_fn(full):
        carry, new_error = full
        *_, n_inner, conv, _u = carry
        hit_max = (state.iters + n_inner) >= cfg.max_iterations
        # NaN counts as "not improved" — retry with a larger lambda.
        return ~(new_error < current_error) & ~conv & ~hit_max

    def body_fn(full):
        carry, _ = full
        lam, lam_factor, R_, t_, p_, n_inner, conv, upd = carry
        lam_factor = lam_factor * 2.0
        lam = lam * lam_factor
        return try_lambda((lam, lam_factor, R_, t_, p_, n_inner, conv,
                           upd))

    first = try_lambda((state.lam, state.lam_factor, prob.cam_R,
                        prob.cam_t, prob.pt_pos, jnp.int32(0),
                        jnp.asarray(False), jnp.float32(0.0)))
    ((lam, lam_factor, new_R, new_t, new_pt, n_inner, conv, upd_sq),
     new_error) = jax.lax.while_loop(cond_fn, body_fn, first)

    # Numerical failure — see models/bundle.py lm_step (ref:
    # src/Bundle.cc:149-150).
    failed = (~jnp.isfinite(new_error) | ~jnp.isfinite(current_error)
              | ~jnp.isfinite(upd_sq))
    accept = (new_error < current_error) & ~failed
    lam = jnp.where(accept,
                    jnp.maximum(lam * cfg.lambda_good_mult, 1e-10),
                    lam)
    lam_factor = jnp.where(accept,
                           jnp.float32(cfg.lambda_factor_initial),
                           lam_factor)
    out_R = jnp.where(accept, new_R, prob.cam_R)
    out_t = jnp.where(accept, new_t, prob.cam_t)
    out_pt = jnp.where(accept, new_pt, prob.pt_pos)
    new_prob = prob._replace(cam_R=out_R, cam_t=out_t, pt_pos=out_pt,
                             meas_bad=prob.meas_bad | new_bad)
    return LMState(problem=new_prob, lam=lam, lam_factor=lam_factor,
                   converged=state.converged | conv,
                   accepted=state.accepted + accept.astype(jnp.int32),
                   iters=state.iters + n_inner, last_error=new_error,
                   failed=state.failed | failed)


def make_sharded_lm_step(mesh: Mesh, cam: atan.Camera,
                         cfg: BundleConfig = BundleConfig(),
                         mest_kind: int = mest.TUKEY, axis: str = "mp"):
    """Build a jitted point-sharded LM step: LMState -> LMState.

    Cameras replicated; points, V/W blocks, and measurements sharded on
    ``axis``. See the module docstring for the communication schedule.
    """
    state_spec = _state_spec(axis)
    sharded = jax.shard_map(
        lambda s: _sharded_step(s, cam, cfg, mest_kind, axis),
        mesh=mesh, in_specs=(state_spec,), out_specs=state_spec,
        check_vma=False)
    return jax.jit(sharded)


@functools.lru_cache(maxsize=None)
def cached_sharded_lm_chunk(mesh: Mesh, cfg: BundleConfig,
                            mest_kind: int, axis: str = "mp"):
    """Device-side sharded LM loop, cached per (mesh, cfg, estimator)
    with the camera passed as a traced ARGUMENT — the distributed twin of
    ``bundle._cached_lm_chunk``. Runs LM steps until converged/failed or
    ``iter_limit`` inner iterations as ONE dispatch and returns
    ``(state, flags)`` where flags is the replicated int32 vector
    (converged, iters, failed, accepted) — exactly one host read per
    chunk instead of the per-step ``bool(state.converged)`` sync
    (VERDICT r2: compute_sharded host-synced every LM step)."""
    state_spec = _state_spec(axis)

    def chunk(state: LMState, cam: atan.Camera, iter_limit):
        def cond(s):
            return (~s.converged) & (~s.failed) & (s.iters < iter_limit)

        def body(s):
            return _sharded_step(s, cam, cfg, mest_kind, axis)

        out = jax.lax.while_loop(cond, body, state)
        flags = jnp.stack([out.converged.astype(jnp.int32), out.iters,
                           out.failed.astype(jnp.int32), out.accepted])
        return out, flags

    sharded = jax.shard_map(
        chunk, mesh=mesh, in_specs=(state_spec, _CAM_SPEC, P()),
        out_specs=(state_spec, P()), check_vma=False)
    return jax.jit(sharded)


def compute_sharded(problem: BundleProblem, mesh: Mesh, cam: atan.Camera,
                    cfg: BundleConfig = BundleConfig(),
                    mest_kind: int = mest.TUKEY,
                    abort_check=None,
                    checkpoint_path: str | None = None,
                    checkpoint_every: int = 5,
                    steps_per_dispatch: int = 5,
                    _initial_state: LMState | None = None
                    ) -> Tuple[LMState, int]:
    """Distributed Bundle::Compute: loop sharded LM chunks on the host.

    The returned state's measurement arrays are mapped back to the input
    problem's measurement order (padding dropped), so callers can index
    outlier flags exactly as with the single-chip ``bundle.compute``.

    ``checkpoint_path``: if set, the LMState is written to disk every
    ``checkpoint_every`` dispatched chunks (``steps_per_dispatch`` LM
    iterations each), giving the multi-host global BA restartability the
    reference lacks (SURVEY §5.3); resume with ``resume_sharded`` on any
    mesh size.
    """
    if _initial_state is None:
        original = problem
        sharded_prob, perm = shard_problem(problem, mesh,
                                           return_perm=True)
        state = bundlelib.init_lm(sharded_prob, cfg)
    else:
        original = _initial_state.problem
        sharded_prob, perm = shard_problem(original, mesh,
                                           return_perm=True)
        state = _initial_state._replace(problem=sharded_prob)
    chunkf = cached_sharded_lm_chunk(mesh, cfg, mest_kind)
    n = 0
    iters = int(state.iters)
    while iters < cfg.max_iterations:
        target = jnp.int32(min(iters + steps_per_dispatch,
                               cfg.max_iterations))
        state, flags = chunkf(state, cam, target)
        n += 1
        # ONE blocking read per chunk (not per LM step).
        conv, iters, failed, _accepted = (
            int(x) for x in np.asarray(flags))
        if conv or failed:
            break
        if checkpoint_path is not None and n % checkpoint_every == 0:
            from ptam_cg_tpu.io.checkpoint import save_ba_state
            save_ba_state(checkpoint_path, state)
        if abort_check is not None and abort_check():
            break
    if checkpoint_path is not None:
        from ptam_cg_tpu.io.checkpoint import save_ba_state
        save_ba_state(checkpoint_path, state)
    state = state._replace(
        problem=unshard_measurements(original, state.problem, perm))
    return state, n


def resume_sharded(checkpoint_path: str, mesh: Mesh, cam: atan.Camera,
                   cfg: BundleConfig = BundleConfig(),
                   mest_kind: int = mest.TUKEY,
                   abort_check=None) -> Tuple[LMState, int]:
    """Restart a checkpointed global BA on ``mesh`` (which may have a
    different device count than the failed run — elastic recovery).
    ``meas_pt`` is stored with global point indices, so the checkpoint
    re-shards cleanly onto any divisor mesh."""
    from ptam_cg_tpu.io.checkpoint import load_ba_state
    state = load_ba_state(checkpoint_path)
    return compute_sharded(state.problem, mesh, cam, cfg, mest_kind,
                           abort_check=abort_check,
                           checkpoint_path=checkpoint_path,
                           _initial_state=state)

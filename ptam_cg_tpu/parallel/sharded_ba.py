"""Distributed global bundle adjustment over a JAX device mesh.

The reference has no distributed backend — global BA runs on one CPU core
and is the scaling bottleneck (ref: src/Bundle.cc:364-446 O(meas*cams)
per LM step; SURVEY §5.7-5.8). Here the measurement set is sharded across
a 1-D mesh axis (``"mp"``, map-parallel): each device accumulates partial
U/V/W/gradient blocks from its measurement shard, the Schur reduction is
completed with ``psum`` collectives over ICI, and the (small, dense)
reduced camera solve runs replicated. Point back-substitution is
elementwise over (replicated) V^-1 so it stays local.

This is the "Schur-complement reduction over collectives" design from
BASELINE.json: communication volume per LM iteration is
O(C^2 * 36 + P * (9 + 18C)) floats, independent of the measurement count
— measurements (the big axis) never move.

``make_sharded_lm_step`` returns a jitted shard_map program; the driver's
``dryrun_multichip`` compiles it on an N-virtual-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ptam_cg_tpu.camera import atan
from ptam_cg_tpu.ops import patch as patchops
from ptam_cg_tpu.config import BundleConfig
from ptam_cg_tpu.models import bundle as bundlelib
from ptam_cg_tpu.models.bundle import BundleProblem, LMState
from ptam_cg_tpu.utils import mest
from ptam_cg_tpu.utils import se3 as se3lib

Array = jax.Array


def shard_problem(problem: BundleProblem, mesh: Mesh,
                  axis: str = "mp") -> BundleProblem:
    """Place the measurement axis on the mesh; cameras/points replicated."""
    meas_sharded = NamedSharding(mesh, P(axis))
    meas2_sharded = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())
    put = jax.device_put
    return BundleProblem(
        cam_R=put(problem.cam_R, repl), cam_t=put(problem.cam_t, repl),
        cam_fixed=put(problem.cam_fixed, repl),
        cam_valid=put(problem.cam_valid, repl),
        pt_pos=put(problem.pt_pos, repl),
        pt_valid=put(problem.pt_valid, repl),
        meas_cam=put(problem.meas_cam, meas_sharded),
        meas_pt=put(problem.meas_pt, meas_sharded),
        meas_pos=put(problem.meas_pos, meas2_sharded),
        meas_sqrt_inv_noise=put(problem.meas_sqrt_inv_noise, meas_sharded),
        meas_valid=put(problem.meas_valid, meas_sharded),
        meas_bad=put(problem.meas_bad, meas_sharded))


def _local_accumulators(prob: BundleProblem, cam: atan.Camera,
                        sigma_sq: Array, cfg: BundleConfig,
                        mest_kind: int, axis: str):
    """Per-shard U/V/W/gradient partials from the local measurement shard,
    completed with psum (the distributed half of Do_LM_Step part (ii)).
    Delegates to the single-chip accumulator builder — the psum is the
    only distributed addition."""
    (U, ea, V, eb, Wfull, err_local, new_bad,
     good) = bundlelib._accumulators(prob, cam, sigma_sq, cfg, mest_kind)

    # --- the collectives: complete the global accumulators over ICI ---
    U = jax.lax.psum(U, axis)
    ea = jax.lax.psum(ea, axis)
    V = jax.lax.psum(V, axis)
    eb = jax.lax.psum(eb, axis)
    Wfull = jax.lax.psum(Wfull, axis)
    current_error = jax.lax.psum(err_local, axis)
    return U, ea, V, eb, Wfull, current_error, new_bad, good


def _sigma_squared_global(prob: BundleProblem, cam: atan.Camera,
                          cfg: BundleConfig, mest_kind: int, axis: str):
    """Robust sigma over ALL shards: all_gather the (scalar-per-meas)
    squared errors — tiny traffic — and take the global masked median."""
    active = prob.meas_valid & ~prob.meas_bad
    _, _, _, err_sq, bad_proj = bundlelib._project_meas(
        prob.cam_R, prob.cam_t, prob.pt_pos, prob, cam)
    ok = active & ~bad_proj
    err_all = jax.lax.all_gather(err_sq, axis).reshape(-1)
    ok_all = jax.lax.all_gather(ok, axis).reshape(-1)
    return mest.find_sigma_squared(err_all, ok_all, mest_kind,
                                   min_sigma=cfg.min_sigma)


def make_sharded_lm_step(mesh: Mesh, cam: atan.Camera,
                         cfg: BundleConfig = BundleConfig(),
                         mest_kind: int = mest.TUKEY, axis: str = "mp"):
    """Build a jitted sharded LM step: LMState -> LMState.

    Camera/point state replicated; measurement arrays sharded on ``axis``.
    """
    repl = P()
    mspec = P(axis)
    m2spec = P(axis, None)
    prob_spec = BundleProblem(
        cam_R=repl, cam_t=repl, cam_fixed=repl, cam_valid=repl,
        pt_pos=repl, pt_valid=repl,
        meas_cam=mspec, meas_pt=mspec, meas_pos=m2spec,
        meas_sqrt_inv_noise=mspec, meas_valid=mspec, meas_bad=mspec)
    state_spec = LMState(problem=prob_spec, lam=repl, lam_factor=repl,
                         converged=repl, accepted=repl, iters=repl,
                         last_error=repl)

    def step(state: LMState) -> LMState:
        prob = state.problem
        C = prob.cam_R.shape[0]

        sigma_sq = _sigma_squared_global(prob, cam, cfg, mest_kind, axis)
        (U, ea, V, eb, Wfull, current_error, new_bad,
         good) = _local_accumulators(prob, cam, sigma_sq, cfg, mest_kind,
                                     axis)
        Pn = Wfull.shape[0]
        # Loop-invariant matrix view (hoisted) — see models/bundle.py.
        W_m = Wfull.transpose(1, 2, 0, 3).reshape(C * 6, Pn * 3)
        free = prob.cam_valid & ~prob.cam_fixed
        free_f = free.astype(jnp.float32)

        def try_lambda(carry):
            lam, lam_factor, _, _, _, n_inner, _c = carry
            Vstar = V * (jnp.ones((3, 3)) + lam * jnp.eye(3))
            diag_prod = V[:, 0, 0] * V[:, 1, 1] * V[:, 2, 2]
            Vinv = patchops.inv3x3(Vstar + 1e-12 * jnp.eye(3))
            Vinv = jnp.where((diag_prod == 0.0)[:, None, None], 0.0, Vinv)
            WV = jnp.einsum("pcab,pbd->pcad", Wfull, Vinv)
            WV_m = WV.transpose(1, 2, 0, 3).reshape(C * 6, Pn * 3)
            S_off = (WV_m @ W_m.T).reshape(C, 6, C, 6)
            Ustar = U * (jnp.ones((6, 6)) + lam * jnp.eye(6))
            S = -S_off + jnp.einsum("jab,jk->jakb", Ustar, jnp.eye(C))
            rhs = ea - (WV_m @ eb.reshape(-1)).reshape(C, 6)
            blk = (free_f[:, None, None, None]
                   * free_f[None, None, :, None])
            S = S * blk + jnp.einsum(
                "jab,jk->jakb", jnp.eye(6)[None].repeat(C, 0),
                jnp.eye(C)) * (1.0 - free_f)[:, None, None, None]
            rhs = rhs * free_f[:, None]
            Sm = S.reshape(C * 6, C * 6)
            delta_cam = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Sm + 1e-8 * jnp.eye(C * 6),
                                            lower=True),
                rhs.reshape(-1)).reshape(C, 6)
            delta_cam = delta_cam * free_f[:, None]
            corr = (delta_cam.reshape(-1) @ W_m).reshape(Pn, 3)
            delta_pt = jnp.einsum("pab,pb->pa", Vinv, eb - corr)
            delta_pt = delta_pt * prob.pt_valid[:, None]
            upd_sq = jnp.sum(delta_cam ** 2) + jnp.sum(delta_pt ** 2)
            conv = upd_sq < cfg.update_squared_convergence_limit
            d_pose = se3lib.se3_exp(delta_cam)
            new_R = jnp.einsum("cij,cjk->cik", d_pose.R, prob.cam_R)
            new_t = (jnp.einsum("cij,cj->ci", d_pose.R, prob.cam_t)
                     + d_pose.t)
            new_pt = prob.pt_pos + delta_pt
            # New error: local partial + psum.
            _, _, _, nerr_sq, nb = bundlelib._project_meas(
                new_R, new_t, new_pt, prob, cam)
            active = prob.meas_valid & ~prob.meas_bad
            nerr_local = (jnp.sum(jnp.where(
                good & ~nb, mest.objective(nerr_sq, sigma_sq, mest_kind),
                0.0)) + jnp.sum((new_bad | (active & nb))
                                .astype(jnp.float32)))
            new_error = jax.lax.psum(nerr_local, axis)
            return (lam, lam_factor, new_R, new_t, new_pt, n_inner + 1,
                    conv), new_error

        def cond_fn(full):
            carry, new_error = full
            *_, n_inner, conv = carry
            hit_max = (state.iters + n_inner) >= cfg.max_iterations
            return (new_error > current_error) & ~conv & ~hit_max

        def body_fn(full):
            carry, _ = full
            lam, lam_factor, R_, t_, p_, n_inner, conv = carry
            lam_factor = lam_factor * 2.0
            lam = lam * lam_factor
            return try_lambda((lam, lam_factor, R_, t_, p_, n_inner, conv))

        first = try_lambda((state.lam, state.lam_factor, prob.cam_R,
                            prob.cam_t, prob.pt_pos, jnp.int32(0),
                            jnp.asarray(False)))
        (lam, lam_factor, new_R, new_t, new_pt, n_inner,
         conv), new_error = jax.lax.while_loop(cond_fn, body_fn, first)

        accept = new_error < current_error
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
                       iters=state.iters + n_inner, last_error=new_error)

    sharded = jax.shard_map(step, mesh=mesh, in_specs=(state_spec,),
                            out_specs=state_spec, check_vma=False)
    return jax.jit(sharded)


def compute_sharded(problem: BundleProblem, mesh: Mesh, cam: atan.Camera,
                    cfg: BundleConfig = BundleConfig(),
                    mest_kind: int = mest.TUKEY,
                    abort_check=None,
                    checkpoint_path: str | None = None,
                    checkpoint_every: int = 5,
                    _initial_state: LMState | None = None
                    ) -> Tuple[LMState, int]:
    """Distributed Bundle::Compute: loop sharded LM steps on the host.

    ``checkpoint_path``: if set, the LMState is written to disk every
    ``checkpoint_every`` accepted LM steps, giving the multi-host global
    BA restartability the reference lacks (SURVEY §5.3); resume with
    ``resume_sharded`` on any mesh size.
    """
    if _initial_state is None:
        problem = shard_problem(problem, mesh)
        state = bundlelib.init_lm(problem, cfg)
    else:
        state = _initial_state._replace(
            problem=shard_problem(_initial_state.problem, mesh))
    step = make_sharded_lm_step(mesh, cam, cfg, mest_kind)
    n = 0
    while (not bool(state.converged)
           and int(state.iters) < cfg.max_iterations):
        state = step(state)
        n += 1
        if checkpoint_path is not None and n % checkpoint_every == 0:
            from ptam_cg_tpu.io.checkpoint import save_ba_state
            save_ba_state(checkpoint_path, state)
        if abort_check is not None and abort_check():
            break
    if checkpoint_path is not None:
        from ptam_cg_tpu.io.checkpoint import save_ba_state
        save_ba_state(checkpoint_path, state)
    return state, n


def resume_sharded(checkpoint_path: str, mesh: Mesh, cam: atan.Camera,
                   cfg: BundleConfig = BundleConfig(),
                   mest_kind: int = mest.TUKEY,
                   abort_check=None) -> Tuple[LMState, int]:
    """Restart a checkpointed global BA on ``mesh`` (which may have a
    different device count than the failed run — elastic recovery)."""
    from ptam_cg_tpu.io.checkpoint import load_ba_state
    state = load_ba_state(checkpoint_path)
    return compute_sharded(state.problem, mesh, cam, cfg, mest_kind,
                           abort_check=abort_check,
                           checkpoint_path=checkpoint_path,
                           _initial_state=state)

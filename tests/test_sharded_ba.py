"""Distributed BA tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ptam_cg_tpu.camera import atan
from ptam_cg_tpu.config import BundleConfig
from ptam_cg_tpu.models import bundle
from ptam_cg_tpu.parallel import sharded_ba
from ptam_cg_tpu.utils import se3 as se3lib
from tests.test_bundle import make_problem, REF_PARAMS, SIZE


def make_problem_large(n_cams=128, n_pts=16384, obs_per_pt=4, seed=7,
                       perturb_cams=0.01, perturb_pts=0.02):
    """Vectorized global-BA-scale problem: ``n_cams`` cameras on an arc
    looking at a point cloud, ``obs_per_pt`` observations per point."""
    rng = np.random.default_rng(seed)
    cam = atan.make_camera(REF_PARAMS, SIZE)
    pts = rng.uniform([-2.0, -1.5, 3.5], [2.0, 1.5, 6.0],
                      (n_pts, 3)).astype(np.float32)

    # Cameras slide sideways and pan to keep the cloud centered.
    j = np.arange(n_cams, dtype=np.float32)
    xi = np.zeros((n_cams, 6), np.float32)
    xi[:, 0] = 0.015 * j
    xi[:, 4] = -0.003 * j
    poses = se3lib.se3_exp(jnp.asarray(xi))
    R_gt = np.asarray(poses.R)
    t_gt = np.asarray(poses.t)

    # Visibility (C, P): project every point in every camera (vectorized).
    p_cam = np.einsum("cij,pj->cpi", R_gt, pts) + t_gt[:, None]
    z = p_cam[..., 2]
    z1 = p_cam[..., :2] / np.maximum(z[..., None], 1e-6)
    pix = np.asarray(atan.project(jnp.asarray(z1.reshape(-1, 2)), cam)
                     ).reshape(n_cams, n_pts, 2)
    vis = ((z > 0.5) & (pix[..., 0] > 5) & (pix[..., 0] < SIZE[0] - 5)
           & (pix[..., 1] > 5) & (pix[..., 1] < SIZE[1] - 5))

    # Pick obs_per_pt visible cameras per point (random preference).
    pref = np.where(vis, rng.random((n_cams, n_pts)), -1.0)
    order = np.argsort(-pref, axis=0)[:obs_per_pt]          # (obs, P)
    ok = np.take_along_axis(pref, order, axis=0) > 0
    M = n_pts * obs_per_pt
    mc = order.reshape(-1).astype(np.int32)
    mp = np.tile(np.arange(n_pts, dtype=np.int32), obs_per_pt)
    mvalid = ok.reshape(-1)
    mpos = pix[mc, mp].astype(np.float32)
    assert mvalid.mean() > 0.9, mvalid.mean()   # problem is well-posed

    dxi = rng.normal(0, perturb_cams, (n_cams, 6)).astype(np.float32)
    dxi[:2] = 0.0                                # first two fixed
    d = se3lib.se3_exp(jnp.asarray(dxi))
    R0 = np.einsum("cij,cjk->cik", np.asarray(d.R), R_gt)
    t0 = np.einsum("cij,cj->ci", np.asarray(d.R), t_gt) + np.asarray(d.t)
    pts0 = pts + rng.normal(0, perturb_pts, pts.shape).astype(np.float32)
    fixed = np.zeros(n_cams, bool)
    fixed[:2] = True

    prob = bundle.BundleProblem(
        cam_R=jnp.asarray(R0), cam_t=jnp.asarray(t0),
        cam_fixed=jnp.asarray(fixed), cam_valid=jnp.ones(n_cams, bool),
        pt_pos=jnp.asarray(pts0), pt_valid=jnp.ones(n_pts, bool),
        meas_cam=jnp.asarray(mc), meas_pt=jnp.asarray(mp),
        meas_pos=jnp.asarray(mpos),
        meas_sqrt_inv_noise=jnp.ones(M, jnp.float32),
        meas_valid=jnp.asarray(mvalid),
        meas_bad=jnp.zeros(M, bool))
    return prob, cam, (R_gt, t_gt, jnp.asarray(pts))


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices())
    assert len(devs) == 8
    return Mesh(devs, ("mp",))


def test_sharded_matches_single_device(mesh):
    prob, cam, (R_gt, t_gt, pts_gt), _ = make_problem(
        seed=21, perturb_cams=0.02, perturb_pts=0.05)
    # Single device reference run.
    ss, _ = bundle.compute(prob, cam)
    rms_single = float(bundle.residual_rms(ss.problem, cam))
    # Sharded run.
    sh, n = sharded_ba.compute_sharded(prob, mesh, cam)
    rms_sharded = float(bundle.residual_rms(sh.problem, cam))
    assert rms_sharded < 0.05, rms_sharded
    assert abs(rms_sharded - rms_single) < 0.02
    # Geometry recovered.
    err = np.linalg.norm(np.asarray(sh.problem.pt_pos)
                         - np.asarray(pts_gt), axis=-1)
    assert np.median(err) < 5e-3


def test_sharded_prunes_outliers(mesh):
    prob, cam, _, out_idx = make_problem(seed=22, perturb_pts=0.02,
                                         outliers=12)
    sh, _ = sharded_ba.compute_sharded(prob, mesh, cam)
    bad = np.asarray(sh.problem.meas_bad)
    assert bad[out_idx].mean() > 0.7


def test_sharded_step_compiles_on_mesh(mesh):
    """The program must actually compile+run with sharded meas inputs."""
    prob, cam, _, _ = make_problem(seed=23, perturb_pts=0.03)
    prob = sharded_ba.shard_problem(prob, mesh)
    step = sharded_ba.make_sharded_lm_step(mesh, cam)
    state = bundle.init_lm(prob)
    out = step(state)
    assert int(out.iters) >= 1
    # Measurement arrays stay sharded across the mesh.
    shardings = out.problem.meas_valid.sharding
    assert len(shardings.device_set) == 8


def test_mesh_helpers():
    from ptam_cg_tpu.parallel import mesh as meshlib
    m = meshlib.make_map_mesh()
    assert m.axis_names == ("mp",)
    assert len(m.devices.ravel()) == 8
    m2 = meshlib.make_map_mesh(4)
    assert len(m2.devices.ravel()) == 4
    assert meshlib.pad_to_multiple(1000, 8) == 1000
    assert meshlib.pad_to_multiple(1001, 8) == 1008
    # Single-host: distributed init is a no-op without coordinator env.
    assert meshlib.initialize_distributed() is False


def test_ba_checkpoint_resume_elastic(mesh, tmp_path):
    """Failure-recovery: checkpoint mid-BA, 'crash', resume on a mesh of
    a DIFFERENT size; final quality matches the uninterrupted run."""
    from ptam_cg_tpu.io.checkpoint import load_ba_state

    prob, cam, _, _ = make_problem(seed=24, perturb_cams=0.02,
                                   perturb_pts=0.05)
    full, _ = sharded_ba.compute_sharded(prob, mesh, cam)
    rms_full = float(bundle.residual_rms(full.problem, cam))

    ckpt = str(tmp_path / "ba.npz")
    # Interrupted run: abort after 3 steps, checkpointing every step.
    calls = {"n": 0}

    def abort_after_1():
        calls["n"] += 1
        return calls["n"] >= 1

    part, n1 = sharded_ba.compute_sharded(
        prob, mesh, cam, abort_check=abort_after_1,
        checkpoint_path=ckpt, checkpoint_every=1)
    assert n1 == 1
    st = load_ba_state(ckpt)
    assert int(st.iters) == int(part.iters)

    # Elastic resume on a 4-device mesh.
    mesh4 = Mesh(np.array(jax.devices()[:4]), ("mp",))
    resumed, n2 = sharded_ba.resume_sharded(ckpt, mesh4, cam)
    assert n2 >= 1
    rms_resumed = float(bundle.residual_rms(resumed.problem, cam))
    assert rms_resumed < 0.05, rms_resumed
    assert abs(rms_resumed - rms_full) < 0.02


@pytest.mark.slow
def test_point_sharded_at_scale_matches_single_chip(mesh):
    """VERDICT r1 item 1 'done' criterion: 128 KF / 16k pts / 64k meas,
    point-sharded step vs single-chip step give equal results, and the
    W blocks stay sharded (never psummed densely)."""
    prob, cam, _ = make_problem_large()
    cfg = BundleConfig(max_iterations=2)

    # Single-chip LM step.
    step1 = jax.jit(lambda s: bundle.lm_step(s, cam, cfg))
    s1 = step1(bundle.init_lm(prob, cfg))

    # Point-sharded LM step on the 8-device mesh.
    sp, perm = sharded_ba.shard_problem(prob, mesh, return_perm=True)
    sstep = sharded_ba.make_sharded_lm_step(mesh, cam, cfg)
    ss = sstep(bundle.init_lm(sp, cfg))

    # Points / measurements actually live sharded across all 8 devices.
    assert len(ss.problem.pt_pos.sharding.device_set) == 8
    assert len(ss.problem.meas_valid.sharding.device_set) == 8

    assert int(ss.iters) == int(s1.iters)
    assert bool(ss.accepted) == bool(s1.accepted)
    err1, errs = float(s1.last_error), float(ss.last_error)
    assert abs(err1 - errs) / max(err1, 1.0) < 1e-3, (err1, errs)
    np.testing.assert_allclose(np.asarray(ss.problem.cam_t),
                               np.asarray(s1.problem.cam_t),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ss.problem.cam_R),
                               np.asarray(s1.problem.cam_R),
                               rtol=0, atol=2e-4)
    # Point shards are blocks in original order -> compare directly.
    dp = np.abs(np.asarray(ss.problem.pt_pos)
                - np.asarray(s1.problem.pt_pos))
    assert np.percentile(dp, 99) < 2e-3, np.percentile(dp, 99)
    # Outlier flags agree through the shard permutation.
    bad_sh = np.zeros(prob.meas_bad.shape[0], bool)
    live = perm >= 0
    bad_sh[perm[live]] = np.asarray(ss.problem.meas_bad)[live]
    assert (bad_sh == np.asarray(s1.problem.meas_bad)).mean() > 0.999

"""Distributed BA tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ptam_cg_tpu.models import bundle
from ptam_cg_tpu.parallel import sharded_ba
from tests.test_bundle import make_problem


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

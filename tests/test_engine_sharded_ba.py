"""Engine e2e with DISTRIBUTED global bundle adjustment (VERDICT r2 #3).

The reference's mapping loop always reaches global BA
(ref: src/MapMaker.cc:98-99); here the same product path — stereo-init
full BA and the priority loop's BundleAdjustAll — must dispatch the
point-sharded solver when the engine is given a multi-device mesh, and
produce the same tracking results as the single-device engine.
"""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ptam_cg_tpu.config import CameraConfig, EngineConfig, MapMakerConfig
from ptam_cg_tpu.io import synth
from ptam_cg_tpu.models import engine as engine_lib
from ptam_cg_tpu.parallel import sharded_ba

REF_PARAMS = (1.0803, 1.43987, 0.519983, 0.548655, 0.244943)
SIZE = (320, 240)
N_FRAMES = 26


def _run(mesh, counter=None, monkeypatch=None):
    seq = synth.SyntheticSequence(REF_PARAMS, image_size=SIZE,
                                  n_frames=N_FRAMES, seed=5, height=1.5,
                                  radius=0.35, sweep=1.3)
    cfg = EngineConfig(
        camera=CameraConfig(params=REF_PARAMS, image_size=SIZE),
        mapmaker=MapMakerConfig(candidate_min_shi_tomasi_score=70.0))
    eng = engine_lib.SLAMEngine(cfg, image_size=SIZE, max_points=1024,
                                max_kfs=8, auto_init_frames=6, seed=0,
                                mesh=mesh)
    if counter is not None:
        orig = sharded_ba.shard_problem

        def counting(*a, **kw):
            counter.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(sharded_ba, "shard_problem", counting)
    infos = [eng.process_frame(seq.frame(i)) for i in range(N_FRAMES)]
    return eng, infos


def test_engine_global_ba_runs_sharded(monkeypatch):
    mesh = Mesh(np.array(jax.devices()[:8]), ("mp",))
    counter = []
    eng, infos = _run(mesh, counter, monkeypatch)
    # The sharded solver actually ran (stereo-init full BA at minimum,
    # priority-loop BundleAdjustAll afterwards).
    assert len(counter) >= 1, "global BA never dispatched sharded"
    assert eng.mapmaker._use_sharded
    final = infos[-1]
    assert final.stage == "TRACKING"
    assert final.n_points > 100

    # Same tracking results as the single-device engine. Per-STEP
    # equality is pinned tightly by tests/test_sharded_ba.py (cams atol
    # 2e-4); through a full closed-loop run those f32 reordering
    # differences (the shard permutation changes accumulator summation
    # order) feed back through tracking and amplify chaotically, so the
    # run-level tolerance is looser — ~1% of the 1.4-unit scene depth.
    eng1, infos1 = _run(None)
    assert [i.stage for i in infos] == [i.stage for i in infos1]
    for a, b in zip(infos, infos1):
        if a.stage != "TRACKING":
            continue
        np.testing.assert_allclose(np.asarray(a.pose.t),
                                   np.asarray(b.pose.t), atol=2e-2)
        np.testing.assert_allclose(np.asarray(a.pose.R),
                                   np.asarray(b.pose.R), atol=2e-2)
    assert abs(final.n_points - infos1[-1].n_points) \
        <= 0.05 * infos1[-1].n_points + 5


def test_mapmaker_rejects_indivisible_capacity():
    """Point capacity not divisible by mesh size must fail loudly at the
    shard step, not corrupt silently."""
    from ptam_cg_tpu.camera import atan
    from ptam_cg_tpu.models import bundle as bundlelib
    import jax.numpy as jnp

    mesh = Mesh(np.array(jax.devices()[:8]), ("mp",))
    C, P, M = 2, 12, 8   # 12 % 8 != 0
    prob = bundlelib.BundleProblem(
        cam_R=jnp.tile(jnp.eye(3), (C, 1, 1)), cam_t=jnp.zeros((C, 3)),
        cam_fixed=jnp.zeros(C, bool), cam_valid=jnp.ones(C, bool),
        pt_pos=jnp.zeros((P, 3)), pt_valid=jnp.ones(P, bool),
        meas_cam=jnp.zeros(M, jnp.int32), meas_pt=jnp.zeros(M, jnp.int32),
        meas_pos=jnp.zeros((M, 2)), meas_sqrt_inv_noise=jnp.ones(M),
        meas_valid=jnp.ones(M, bool), meas_bad=jnp.zeros(M, bool))
    with pytest.raises(ValueError, match="not divisible"):
        sharded_ba.shard_problem(prob, mesh)

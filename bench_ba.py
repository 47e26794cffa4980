"""Secondary benchmark: bundle-adjustment LM-step throughput.

Prints one JSON line per problem size. The reference runs global BA on
one CPU core (ref: src/Bundle.cc); this measures the MXU Schur-complement
step at local-BA and global-BA scales on the current backend.
"""

import json
import sys
import time

import numpy as np


def make_problem(n_cams, n_pts, n_meas, seed=0):
    import jax.numpy as jnp

    from ptam_cg_tpu.camera import atan
    from ptam_cg_tpu.models import bundle
    from ptam_cg_tpu.utils import se3 as se3lib

    rng = np.random.default_rng(seed)
    cam = atan.make_camera((1.0803, 1.43987, 0.519983, 0.548655,
                            0.244943), (640, 480))
    pts = rng.uniform([-2, -1.5, 3], [2, 1.5, 6],
                      (n_pts, 3)).astype(np.float32)
    poses = [se3lib.se3_exp(jnp.asarray(np.array(
        [0.08 * j, 0.01 * j, 0, 0, -0.015 * j, 0], np.float32)))
        for j in range(n_cams)]
    R = np.stack([np.asarray(p.R) for p in poses])
    t = np.stack([np.asarray(p.t) for p in poses])
    mc = rng.integers(0, n_cams, n_meas).astype(np.int32)
    mp = rng.integers(0, n_pts, n_meas).astype(np.int32)
    p_cam = np.einsum("mij,mj->mi", R[mc], pts[mp]) + t[mc]
    z1 = p_cam[:, :2] / p_cam[:, 2:3]
    pix = np.array(atan.project(jnp.asarray(z1), cam))
    pix += rng.normal(0, 0.3, pix.shape)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    prob = bundle.BundleProblem(
        cam_R=jnp.asarray(R), cam_t=jnp.asarray(t),
        cam_fixed=jnp.asarray(fixed), cam_valid=jnp.ones(n_cams, bool),
        pt_pos=jnp.asarray(pts + rng.normal(0, 0.02, pts.shape)
                           .astype(np.float32)),
        pt_valid=jnp.ones(n_pts, bool),
        meas_cam=jnp.asarray(mc), meas_pt=jnp.asarray(mp),
        meas_pos=jnp.asarray(pix.astype(np.float32)),
        meas_sqrt_inv_noise=jnp.ones(n_meas, jnp.float32),
        meas_valid=jnp.ones(n_meas, bool),
        meas_bad=jnp.zeros(n_meas, bool))
    return prob, cam


def main():
    import jax

    from ptam_cg_tpu.models import bundle

    results = []
    for name, (C, P, M) in {
        "local_ba_5kf": (5, 512, 2048),
        "global_ba_64kf": (64, 4096, 16384),
    }.items():
        prob, cam = make_problem(C, P, M)
        step = jax.jit(lambda s: bundle.lm_step(s, cam))
        state = bundle.init_lm(prob)
        state = step(state)
        state.problem.pt_pos.block_until_ready()
        n = 10
        t0 = time.perf_counter()
        s = state
        for _ in range(n):
            s = step(s)
        s.problem.pt_pos.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        results.append({
            "metric": f"ba_lm_steps_per_s_{name}",
            "value": round(1.0 / dt, 2),
            "unit": "steps/s",
            "vs_baseline": None,
        })
        print(json.dumps(results[-1]))
        print(f"# {name}: C={C} P={P} M={M} step={dt*1000:.1f}ms",
              file=sys.stderr)


if __name__ == "__main__":
    main()

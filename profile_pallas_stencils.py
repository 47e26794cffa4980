"""Gate the Pallas banded stencils on real TPU: parity + timing.

1. compile+run fast_score_map_banded / shi_tomasi_banded at the four
   640x480-pyramid shapes, compare against the XLA formulation.
2. time build_frame_tracking (per-frame path: FAST only) and
   build_frame (keyframe path: FAST + Shi-Tomasi) with the Pallas flag
   off vs on.

Each kernel/shape is wrapped in try/except: one Mosaic failure must not
kill the whole measurement (round-3 lesson — the original shi kernel
500'd the remote compiler and took the timing section down with it).
"""
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

assert jax.default_backend() == "tpu", jax.default_backend()

from ptam_cg_tpu.ops import fast as fastops
from ptam_cg_tpu.ops import image as imops
from ptam_cg_tpu.ops import pallas_kernels as pk
from ptam_cg_tpu.models import keyframe
from ptam_cg_tpu.config import FrontendConfig

rng = np.random.RandomState(0)
shapes = [(480, 640), (240, 320), (120, 160), (60, 80)]
thr = [10.0, 15.0, 15.0, 10.0]

for (h, w), t in zip(shapes, thr):
    im = jnp.asarray((rng.rand(h, w) * 255).astype(np.float32))
    try:
        t0 = time.time()
        cb, sb = pk.fast_score_map_banded(im, t)
        cb, sb = np.asarray(cb), np.asarray(sb)
        print(f"fast banded {h}x{w}: compile+run {time.time()-t0:.1f}s")
        cx, sx = jax.jit(fastops.fast_score_map, static_argnums=1)(im, t)
        cx, sx = np.asarray(cx), np.asarray(sx)
        print(f"  corner match {np.mean(cb == cx):.6f} "
              f"score maxdiff {np.abs(sb - sx).max():.3g}")
    except Exception:
        print(f"fast banded {h}x{w}: FAILED")
        traceback.print_exc(limit=2)
    try:
        t0 = time.time()
        stb = np.asarray(pk.shi_tomasi_banded(im, 3))
        print(f"shi banded {h}x{w}: compile+run {time.time()-t0:.1f}s")
        stx = np.asarray(jax.jit(imops.shi_tomasi_score_map,
                                 static_argnums=1)(im, 3))
        scale = max(1.0, np.abs(stx).max())
        print(f"  shi reldiff {np.abs(stb - stx).max() / scale:.3g}")
    except Exception:
        print(f"shi banded {h}x{w}: FAILED")
        traceback.print_exc(limit=2)

# ---- end-to-end frontend timing, flag off vs on -------------------
im = jnp.asarray((rng.rand(480, 640) * 255).astype(np.float32))
for build_name, build in (("build_frame_tracking",
                           keyframe.build_frame_tracking),
                          ("build_frame",
                           lambda x, c: keyframe.build_frame(
                               x, c, candidate_min_score=70.0))):
    for flag in (False, True):
        try:
            cfg = FrontendConfig(pallas_stencils=flag)
            fn = jax.jit(lambda x, c=cfg, b=build: b(x, c))
            out = fn(im)
            jax.block_until_ready(out)
            N = 50
            t0 = time.time()
            for _ in range(N):
                out = fn(im)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / N * 1e3
            print(f"{build_name} pallas={flag}: {dt:.3f} ms/call "
                  f"(throughput, pipelined)")
            t0 = time.time()
            for _ in range(N):
                jax.block_until_ready(fn(im))
            dt = (time.time() - t0) / N * 1e3
            print(f"{build_name} pallas={flag}: {dt:.3f} ms/call (blocked)")
        except Exception:
            print(f"{build_name} pallas={flag}: FAILED")
            traceback.print_exc(limit=2)
print("DONE")

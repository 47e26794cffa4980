"""One-off: window-gather strategies on the real TPU (pipelined)."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ptam_cg_tpu.ops import pallas_gather as pg

    rng = np.random.default_rng(0)
    atlas = jnp.asarray(rng.normal(size=(720, 640)).astype(np.float32))
    atlas = jax.device_put(atlas)

    for (N, D) in [(1152, 40), (1152, 33)]:
        oy = rng.integers(0, 720 - D, N)
        ox = rng.integers(0, 640 - D, N)
        org = jax.device_put(
            jnp.asarray(np.stack([oy, ox], -1).astype(np.int32)))

        variants = {
            "vmap_dynslice": jax.jit(
                lambda a, o, D=D: pg.gather_windows(a, o, D)),
            "aligned_dma": jax.jit(
                lambda a, o, D=D: pg.gather_windows_aligned(a, o, D)),
            "rowtake_dot": jax.jit(
                lambda a, o, D=D: pg.gather_windows_rowtake(a, o, D)),
        }
        for name, fn in variants.items():
            try:
                out = fn(atlas, org)
                jax.block_until_ready(out)
            except Exception as e:
                print(f"N={N} D={D} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            iters = 50
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(atlas, org)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            print(f"N={N} D={D} {name}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()

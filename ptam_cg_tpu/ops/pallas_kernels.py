"""Pallas TPU kernels for the frontend stencil ops (EXPERIMENTAL).

Interpret-mode-validated implementations of FAST-10 and Shi-Tomasi as
single-pass VMEM kernels. NOT yet wired into the production path:

- Mosaic (this jax version) lowers neither ``dynamic_update_slice`` nor
  ``dynamic_slice`` on values — use ``jnp.pad`` + static ``lax.slice``.
- The one-grid-step whole-image strategy OOMs scoped VMEM (Mosaic
  materializes every shifted copy: ~121 MB for 480x640): a production
  version needs a row-band grid with halo handling (overlapping block
  reads), which plain BlockSpecs do not express — use manual DMA from
  an ANY-space input.
- Meanwhile XLA's fused stencil for FAST measures fast enough that the
  frontend's cost is distributed elsewhere (see CLAUDE.md profile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptam_cg_tpu.ops.fast import ARC, CIRCLE

Array = jax.Array


def _fast_kernel(threshold: float, im_ref, corner_ref, score_ref):
    im = im_ref[:]
    H, W = im.shape
    pad = 3
    # Zero-padded image; all shifts read from this value (VMEM-resident).
    p = jnp.pad(im, ((pad, pad), (pad, pad)))

    def shifted(dx, dy):
        # Static offsets -> lax.slice (dynamic_slice is not lowered
        # by this Mosaic version).
        return jax.lax.slice(p, (pad + dy, pad + dx),
                             (pad + dy + H, pad + dx + W))

    center = im
    hi = center + threshold
    lo = center - threshold

    ring = [shifted(dx, dy) for dx, dy in CIRCLE]
    bright = [r - hi for r in ring]
    dark = [lo - r for r in ring]

    def arc_max(margins):
        ext = margins + margins[: ARC - 1]
        best = jnp.full((H, W), -jnp.inf, im.dtype)
        for s in range(16):
            m = ext[s]
            for k in range(1, ARC):
                m = jnp.minimum(m, ext[s + k])
            best = jnp.maximum(best, m)
        return best

    score = jnp.maximum(arc_max(bright), arc_max(dark))
    is_corner = score > 0.0
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inner = ((rows >= pad) & (rows < H - pad)
             & (cols >= pad) & (cols < W - pad))
    is_corner = is_corner & inner
    corner_ref[:] = is_corner.astype(jnp.float32)
    score_ref[:] = jnp.where(is_corner, score + threshold, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_map_pallas(im: Array, threshold: float,
                          interpret: bool = False):
    """Drop-in replacement for ops.fast.fast_score_map on TPU."""
    H, W = im.shape
    corner, score = pl.pallas_call(
        functools.partial(_fast_kernel, float(threshold)),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.float32),
                   jax.ShapeDtypeStruct((H, W), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY
                               if False else pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(im.astype(jnp.float32))
    return corner > 0.5, score


def _shi_tomasi_kernel(half_box: int, im_ref, out_ref):
    im = im_ref[:]
    H, W = im.shape
    pad = half_box + 1
    p = jnp.pad(im, ((pad, pad), (pad, pad)))

    def sh(dx, dy):
        return jax.lax.slice(p, (pad + dy, pad + dx),
                             (pad + dy + H, pad + dx + W))

    gx = sh(1, 0) - sh(-1, 0)
    gy = sh(0, 1) - sh(0, -1)

    def box(v):
        q = jnp.pad(v, ((pad, pad), (pad, pad)))
        acc = jnp.zeros((H, W), im.dtype)
        for dy in range(-half_box, half_box + 1):
            for dx in range(-half_box, half_box + 1):
                acc = acc + jax.lax.slice(
                    q, (pad + dy, pad + dx), (pad + dy + H, pad + dx + W))
        return acc

    dxx = box(gx * gx)
    dyy = box(gy * gy)
    dxy = box(gx * gy)
    n = float((2 * half_box + 1) ** 2) * 2.0
    dxx, dyy, dxy = dxx / n, dyy / n, dxy / n
    disc = (dxx + dyy) ** 2 - 4.0 * (dxx * dyy - dxy * dxy)
    score = 0.5 * (dxx + dyy - jnp.sqrt(jnp.maximum(disc, 0.0)))
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    b = half_box + 1
    inner = ((rows >= b) & (rows < H - b) & (cols >= b) & (cols < W - b))
    out_ref[:] = jnp.where(inner, score, 0.0)


@functools.partial(jax.jit, static_argnames=("half_box", "interpret"))
def shi_tomasi_pallas(im: Array, half_box: int = 3,
                      interpret: bool = False) -> Array:
    H, W = im.shape
    return pl.pallas_call(
        functools.partial(_shi_tomasi_kernel, half_box),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(im.astype(jnp.float32))


def use_pallas() -> bool:
    """Pallas kernels only on real TPU backends."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

"""Pallas window gather: per-point rectangular windows via async DMA.

``vmap(dynamic_slice)`` lowers to a *sequential* while loop on TPU
(~6 us per point: thousands of serial slice+update pairs per frame — see
the round-1 profile). This kernel instead issues one DMA per grid step
from the HBM-resident atlas into the output block, so window extraction
runs at copy bandwidth.

Used by the patch search / subpix paths on TPU; the vmapped-slice
formulation remains the portable fallback (and the interpret-mode
reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _gather_kernel(D: int, origins_ref, atlas_ref, out_ref, sem):
    i = pl.program_id(0)
    oy = origins_ref[i, 0]
    ox = origins_ref[i, 1]
    copy = pltpu.make_async_copy(
        atlas_ref.at[pl.ds(oy, D), pl.ds(ox, D)], out_ref.at[0], sem)
    copy.start()
    copy.wait()


@functools.partial(jax.jit, static_argnames=("D", "interpret"))
def gather_windows_pallas(atlas: Array, origin_yx: Array, D: int,
                          interpret: bool = False) -> Array:
    """atlas (H, W) f32, origin_yx (N, 2) int32 clipped top-left corners
    -> windows (N, D, D)."""
    N = origin_yx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, D, D), lambda i, origins: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, D),
        out_shape=jax.ShapeDtypeStruct((N, D, D), atlas.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(origin_yx, atlas)


def gather_windows(atlas: Array, origin_yx: Array, D: int) -> Array:
    """Per-point window extraction.

    Currently always the vmapped-dynamic-slice formulation: it lowers to
    a serial loop, but at ~1-2 ms per 1152 windows it is NOT the hot
    spot (the per-iteration resampling was — fixed by the one-hot blend
    in subpix_refine). The Pallas DMA variant above fails Mosaic's
    HBM-slice alignment (row offsets must divide the (8, 128) tiling);
    revisit with band-aligned DMA + in-VMEM shifts.
    """
    def one(o):
        return jax.lax.dynamic_slice(atlas, (o[0], o[1]), (D, D))

    return jax.vmap(one)(origin_yx)

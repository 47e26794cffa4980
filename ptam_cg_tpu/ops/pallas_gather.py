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


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _aligned_block_kernel(B: int, R: int, C: int,
                          origins_ref, atlas_ref, out_ref, sems):
    i = pl.program_id(0)
    for b in range(B):
        ay = origins_ref[i * B + b, 0]
        ax = origins_ref[i * B + b, 1]
        pltpu.make_async_copy(
            atlas_ref.at[pl.ds(ay, R), pl.ds(ax, C)],
            out_ref.at[b], sems.at[b]).start()
    for b in range(B):
        pltpu.make_async_copy(
            atlas_ref.at[pl.ds(0, R), pl.ds(0, C)],
            out_ref.at[b], sems.at[b]).wait()


@functools.partial(jax.jit, static_argnames=("D", "block", "interpret"))
def gather_windows_aligned(atlas: Array, origin_yx: Array, D: int,
                           block: int = 8,
                           interpret: bool = False) -> Array:
    """Per-point windows via TILE-ALIGNED HBM DMA + one-hot shift matmuls.

    Mosaic only lowers HBM `memref_slice` DMAs whose offsets are
    tile-aligned ((8, 128) for f32). So each point DMAs the enclosing
    aligned block (R, C) ⊇ (D, D), with ``block`` DMAs in flight per grid
    step, and the residual (sub-tile) shift is applied OUTSIDE the kernel
    as two batched one-hot matmuls on the MXU — the same separable
    selection trick as subpix re-basing, but as dots instead of FMA loops.
    """
    N = origin_yx.shape[0]
    Ha, Wa = atlas.shape
    R = _round_up(D + 7, 8)
    C = _round_up(D + 127, 128)
    # Pad the atlas so aligned blocks always fit.
    pad_h = _round_up(max(Ha, R), 8) - Ha
    pad_w = _round_up(max(Wa, C), 128) - Wa
    if pad_h or pad_w:
        atlas = jnp.pad(atlas, ((0, pad_h), (0, pad_w)))
        Ha, Wa = atlas.shape
    # Pad N to a multiple of block.
    Np = _round_up(max(N, 1), block)
    oy = jnp.clip(origin_yx[:, 0], 0, Ha - D)
    ox = jnp.clip(origin_yx[:, 1], 0, Wa - D)
    if Np != N:
        oy = jnp.concatenate([oy, jnp.zeros(Np - N, oy.dtype)])
        ox = jnp.concatenate([ox, jnp.zeros(Np - N, ox.dtype)])
    ay = jnp.minimum((oy // 8) * 8, Ha - R)
    ax = jnp.minimum((ox // 128) * 128, Wa - C)
    ry = oy - ay                     # in [0, R - D]
    rx = ox - ax                     # in [0, C - D]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((block, R, C),
                               lambda i, origins: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((block,))],
    )
    blocks = pl.pallas_call(
        functools.partial(_aligned_block_kernel, block, R, C),
        out_shape=jax.ShapeDtypeStruct((Np, R, C), atlas.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(jnp.stack([ay, ax], -1), atlas)

    # Residual shifts as batched one-hot dots (MXU work).
    ii = jnp.arange(D, dtype=jnp.int32)
    rsel = (ry[:, None, None] + ii[None, :, None]
            == jnp.arange(R, dtype=jnp.int32)[None, None, :])
    rows = jnp.einsum("nir,nrc->nic", rsel.astype(atlas.dtype), blocks,
                      preferred_element_type=jnp.float32)
    csel = (rx[:, None, None] + ii[None, None, :]
            == jnp.arange(C, dtype=jnp.int32)[None, :, None])
    win = jnp.einsum("nic,ncj->nij", rows, csel.astype(atlas.dtype),
                     preferred_element_type=jnp.float32)
    return win[:N].astype(atlas.dtype)


@functools.partial(jax.jit, static_argnames=("D",))
def gather_windows_rowtake(atlas: Array, origin_yx: Array, D: int) -> Array:
    """XLA-only window gather: take row segments, then select the
    D-column window with a batched one-hot dot (MXU).

    When the atlas width is a multiple of 128 and D <= 128, rows are
    taken as PAIRS of 128-wide bands from a (Ha*Wa/128, 128) view —
    2.5x less gather traffic than full 640-wide rows at 640x480."""
    N = origin_yx.shape[0]
    Ha, Wa = atlas.shape
    oy = jnp.clip(origin_yx[:, 0], 0, Ha - D)
    ox = jnp.clip(origin_yx[:, 1], 0, Wa - D)
    ii = jnp.arange(D, dtype=jnp.int32)

    band = 128
    nb = Wa // band
    if Wa % band == 0 and D <= band and nb >= 2:
        b0 = jnp.minimum(ox // band, nb - 2)        # window spans <= 2 bands
        lx = ox - b0 * band                         # in [0, 2*band - D]
        banded = atlas.reshape(Ha * nb, band)
        rb = (oy[:, None] + ii[None, :]) * nb + b0[:, None]   # (N, D)
        seg_idx = jnp.stack([rb, rb + 1], axis=-1).reshape(-1)
        rows = jnp.take(banded, seg_idx, axis=0).reshape(N, D, 2 * band)
        C = 2 * band
    else:
        lx = ox
        rows_idx = (oy[:, None] + ii[None, :]).reshape(-1)
        rows = jnp.take(atlas, rows_idx, axis=0).reshape(N, D, Wa)
        C = Wa

    csel = (lx[:, None, None] + ii[None, None, :]
            == jnp.arange(C, dtype=jnp.int32)[None, :, None])
    # A bfloat16 atlas (FrontendConfig.atlas_bf16) halves the row-take
    # HBM traffic and runs this dot at bf16 MXU rate; accumulation and
    # output are always float32 so downstream ZMSSD/subpix math keeps
    # full precision. Explicit DEFAULT precision: image values are
    # uint8-in-spec (exact in bf16) and the selector is one-hot (exact),
    # so the fast single-pass dot is exact — and must stay fast under
    # the callers' pinned-f32 contexts (tracker/mapmaker programs).
    return jnp.einsum("ndc,ncj->ndj", rows, csel.astype(atlas.dtype),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT
                      ).astype(jnp.float32)


def gather_windows_vmap(atlas: Array, origin_yx: Array, D: int) -> Array:
    """vmapped-dynamic-slice window extraction — the portable reference
    formulation. On TPU inside a large program XLA lowers it to a SERIAL
    while loop (~1 us/point: 2.2 ms/frame at N=1024x2 in the round-1
    trace)."""
    def one(o):
        return jax.lax.dynamic_slice(atlas, (o[0], o[1]), (D, D))

    return jax.vmap(one)(origin_yx)


def gather_windows(atlas: Array, origin_yx: Array, D: int) -> Array:
    """Per-point window extraction (production path).

    Row-take + one-hot column dot: the row gather stays vectorized and
    the column selection runs on the MXU, unlike the vmapped
    dynamic_slice (serial while loop) and the per-point HBM DMA (Mosaic
    rejects sub-tile offsets; the tile-aligned variant above crashes the
    remote Mosaic compiler on this backend).
    """
    return gather_windows_rowtake(atlas, origin_yx, D)

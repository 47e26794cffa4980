"""Pallas TPU kernels for the frontend stencil ops.

FAST-10 corner test + score and Shi-Tomasi min-eigenvalue score as
single-pass fused stencils (ref semantics: src/KeyFrame.cc:23-53 uses
libCVD fast_corner_detect_10; src/ImageProcess.cc:20-47 Shi-Tomasi).

Two strategies live here:

- ``*_pallas`` (whole image, one grid step): validated in interpret
  mode, but Mosaic materializes every shifted copy so a 480x640 image
  needs ~121 MB of VMEM — it OOMs on real hardware. Kept as the
  interpret-mode reference the banded kernels are tested against.
- ``*_banded`` (PRODUCTION): grid over row bands. Halo handling uses a
  clamped three-band trick: the SAME image is passed three times with
  block index maps i-1 / i / i+1 (clamped to the valid range), so the
  kernel sees the previous, current, and next band and slices its halo
  from the neighbors — no manual DMA, no arbitrary-offset HBM slices
  (which this backend's Mosaic rejects). At the first/last band the
  clamp duplicates the current band into the halo; the rows this
  corrupts are exactly the image-border rows the FAST/Shi-Tomasi inner
  masks zero out anyway.

Mosaic notes (this jax version): neither ``dynamic_update_slice`` nor
``dynamic_slice`` on values lowers — use ``jnp.pad`` + static
``lax.slice``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptam_cg_tpu.ops.fast import ARC, CIRCLE

Array = jax.Array


def _fast_body(im, threshold: float):
    """FAST-10 arc-margin score on a VMEM-resident image/strip — NO
    border masking (the caller masks; a row band's top/bottom rows are
    interior image rows)."""
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

    return jnp.maximum(arc_max(bright), arc_max(dark))


def _fast_kernel(threshold: float, im_ref, corner_ref, score_ref):
    im = im_ref[:]
    H, W = im.shape
    pad = 3
    score = _fast_body(im, threshold)
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


def _shi_body(im, half_box: int):
    """Shi-Tomasi min-eigenvalue score on a VMEM-resident image/strip —
    NO border masking (see _fast_body)."""
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
    return 0.5 * (dxx + dyy - jnp.sqrt(jnp.maximum(disc, 0.0)))


def _shi_tomasi_kernel(half_box: int, im_ref, out_ref):
    im = im_ref[:]
    H, W = im.shape
    score = _shi_body(im, half_box)
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


# --------------------------------------------------------------------
# Row-band production kernels (clamped three-band halo; see module doc).
# --------------------------------------------------------------------

def _pick_band(H: int, target: int = 64) -> int:
    """Grid row-band height: the largest divisor of H that is <= target
    AND a multiple of 8 — Mosaic requires the sublane (second-to-last)
    block dim to be divisible by 8 unless the block spans the whole
    dimension, so a non-conforming H (e.g. the 60-row level-3 image)
    falls back to a single full-height band.

    The full-height fallback reintroduces the whole-image VMEM footprint
    the banding exists to avoid, so it is only safe for SMALL images:
    the pyramid heights here are 480/240/120/60 (banded / banded /
    banded / one 60-row band). A large prime-ish H (e.g. 482) would
    blow VMEM — reject it loudly instead of compiling a kernel that
    OOMs Mosaic (ADVICE r2)."""
    for b in range(min(target, H) & ~7, 0, -8):
        if H % b == 0:
            return b
    if H > 4 * target:
        raise ValueError(
            f"image height {H} has no multiple-of-8 divisor <= {target}; "
            f"the banded stencils would fall back to one full-height "
            f"VMEM band. Pad the image rows to a multiple of 8 first.")
    return H


def _band_specs(H: int, W: int, band: int):
    """Three BlockSpecs over the same (H, W) input: previous / current /
    next row band, block index clamped to the valid range."""
    n = H // band

    def clamp(j):
        return jnp.clip(j, 0, n - 1)

    return [
        pl.BlockSpec((band, W), lambda i: (clamp(i - 1), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((band, W), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((band, W), lambda i: (clamp(i + 1), 0),
                     memory_space=pltpu.VMEM),
    ]


def _fast_band_kernel(threshold: float, H: int, band: int,
                      prev_ref, cur_ref, next_ref, corner_ref, score_ref):
    pad = 3
    W = cur_ref.shape[1]
    strip = jnp.concatenate(
        [prev_ref[band - pad:, :], cur_ref[:], next_ref[:pad, :]], axis=0)
    score = jax.lax.slice(_fast_body(strip, threshold),
                          (pad, 0), (pad + band, W))
    is_corner = score > 0.0
    row0 = pl.program_id(0) * band
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (band, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (band, W), 1)
    inner = ((rows >= pad) & (rows < H - pad)
             & (cols >= pad) & (cols < W - pad))
    is_corner = is_corner & inner
    corner_ref[:] = is_corner.astype(jnp.float32)
    score_ref[:] = jnp.where(is_corner, score + threshold, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_map_banded(im: Array, threshold: float,
                          interpret: bool = False):
    """PRODUCTION drop-in for ops.fast.fast_score_map on TPU: fused
    single-pass FAST-10 corner+score over row bands (the reference's
    fast_corner_detect_10 + V-score, src/KeyFrame.cc:35-53)."""
    im = im.astype(jnp.float32)
    H, W = im.shape
    band = _pick_band(H)
    corner, score = pl.pallas_call(
        functools.partial(_fast_band_kernel, float(threshold), H, band),
        grid=(H // band,),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.float32),
                   jax.ShapeDtypeStruct((H, W), jnp.float32)),
        in_specs=_band_specs(H, W, band),
        out_specs=(pl.BlockSpec((band, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((band, W), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(im, im, im)
    return corner > 0.5, score


def _shi_band_kernel(half_box: int, H: int, band: int,
                     prev_ref, cur_ref, next_ref, out_ref):
    """Single-pad Shi-Tomasi band. This backend's Mosaic rejects ANY
    ``tpu.concatenate`` whose non-zero-pad operand carries a non-zero
    offset layout ("result/input offset mismatch on non-concat
    dimension") — which kills every ``jnp.pad`` of a sliced/derived
    value. So: concatenate the three FULL bands (all offsets zero), pad
    that ONCE (zero-offset operands — the pattern the FAST band kernel
    already compiles), and from there use only static slices +
    elementwise ops. The current band's outputs read real halo rows
    (never row padding) and zero-padded columns, exactly matching the
    whole-image ``_shi_body`` semantics wherever the inner mask is
    true."""
    hb = half_box
    ext = hb + 1
    W = cur_ref.shape[1]
    strip3 = jnp.concatenate([prev_ref[:], cur_ref[:], next_ref[:]],
                             axis=0)                 # (3*band, W)
    p3 = jnp.pad(strip3, ((ext, ext), (ext, ext)))

    # View of p3 sized (band + 2*hb, W + 2*hb): output row r, col c map
    # to view position (r + hb, c + hb); view (i, j) = image value at
    # row band0 + i - hb, col j - hb (zero outside columns).
    def sh(dy, dx):
        # (band + 2*hb, W + 2*hb) view shifted by (dy, dx), dy/dx in
        # [-1, 1] here (gradient taps); row start >= band + ext - hb - 1
        # - 1 >= 0 for band >= 0; always in range.
        r0 = ext + band - hb + dy
        c0 = ext - hb + dx
        return jax.lax.slice(
            p3, (r0, c0), (r0 + band + 2 * hb, c0 + W + 2 * hb))

    gxe = sh(0, 1) - sh(0, -1)
    gye = sh(1, 0) - sh(-1, 0)
    prods = (gxe * gxe, gye * gye, gxe * gye)

    def box(v):
        # Separable: row-sum then col-sum — 14 slice temporaries instead
        # of 49 (the 2-D loop's 49x3 live slice copies blew the 16 MB
        # Mosaic VMEM stack at 480x640).
        rs = jnp.zeros((band, W + 2 * hb), v.dtype)
        for dy in range(2 * hb + 1):
            rs = rs + jax.lax.slice(v, (dy, 0), (dy + band, W + 2 * hb))
        acc = jnp.zeros((band, W), v.dtype)
        for dx in range(2 * hb + 1):
            acc = acc + jax.lax.slice(rs, (0, dx), (band, dx + W))
        return acc

    n = float((2 * hb + 1) ** 2) * 2.0
    dxx, dyy, dxy = (box(v) / n for v in prods)
    disc = (dxx + dyy) ** 2 - 4.0 * (dxx * dyy - dxy * dxy)
    score = 0.5 * (dxx + dyy - jnp.sqrt(jnp.maximum(disc, 0.0)))
    row0 = pl.program_id(0) * band
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (band, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (band, W), 1)
    inner = ((rows >= ext) & (rows < H - ext)
             & (cols >= ext) & (cols < W - ext))
    out_ref[:] = jnp.where(inner, score, 0.0)


@functools.partial(jax.jit, static_argnames=("half_box", "interpret"))
def shi_tomasi_banded(im: Array, half_box: int = 3,
                      interpret: bool = False) -> Array:
    """PRODUCTION drop-in for ops.image.shi_tomasi_score_map on TPU
    (ref: src/ImageProcess.cc:20-47)."""
    im = im.astype(jnp.float32)
    H, W = im.shape
    # Smaller bands than FAST: this kernel holds 5 gradient/product
    # planes plus the 3-band strip in VMEM per grid step.
    band = _pick_band(H, target=32)
    return pl.pallas_call(
        functools.partial(_shi_band_kernel, half_box, H, band),
        grid=(H // band,),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=_band_specs(H, W, band),
        out_specs=pl.BlockSpec((band, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(im, im, im)


def use_pallas() -> bool:
    """Pallas kernels only on real TPU backends."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

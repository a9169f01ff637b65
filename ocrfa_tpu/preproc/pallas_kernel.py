"""Pallas TPU kernel: fused line-crop extraction (the north-star preproc).

One grid step per crop: DMA a slab of the uint8 page from HBM into VMEM,
then perform the bilinear crop-resize as **two banded-matrix MXU matmuls**
instead of gathers:

    out = A(64 x SLAB_H) @ slab(SLAB_H x W) @ B(W x out_w)

where A/B hold the per-crop bilinear weights, built on the VPU from
``broadcasted_iota`` — no dynamic indexing anywhere, so everything lowers
to dense MXU work.  Normalisation to [-1, 1] is fused into the epilogue.

Boxes arrive via scalar prefetch (``PrefetchScalarGridSpec``) so the DMA
source offset is known before the kernel body runs.

Numerics match :func:`ocrfa_tpu.preproc.device.crop_resize_normalize`
(same half-pixel sampling, same clamping => same replicate-edge padding),
with one restriction: crops taller than ``SLAB_H`` rows are sampled from
their top ``SLAB_H`` rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB_H = 256  # max source rows per crop held in VMEM (u8: 256 x W bytes)


def _interp_matrix(dst_positions, n_src, valid_src):
    """Bilinear interpolation matrix M[(d, s)] = weight of source row s for
    destination position d; rows sum to 1 within the valid range."""
    d = dst_positions.shape[0]
    src_ids = jax.lax.broadcasted_iota(jnp.int32, (d, n_src), 1).astype(jnp.float32)
    pos = dst_positions[:, None]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src_ids - pos))
    # restrict to the valid source extent (replicate handled by clamping pos)
    mask = src_ids < valid_src
    return jnp.where(mask, w, 0.0)


def _crop_kernel(boxes_ref, page_ref, out_ref, slab, sem, *, out_h, out_w, page_w):
    i = pl.program_id(0)
    x0 = boxes_ref[i, 0]
    x1 = boxes_ref[i, 1]
    y0 = boxes_ref[i, 2]
    y1 = boxes_ref[i, 3]

    page_h = page_ref.shape[0]
    # clamp the slab start so the DMA stays in bounds, and align it to the
    # int8 tile height (32 sublanes) so Mosaic can slice HBM
    slab_rows = SLAB_H + 32
    y0c = jnp.minimum(y0, jnp.maximum(page_h - slab_rows, 0))
    y0a = pl.multiple_of((y0c // 32) * 32, 32)
    shift = (y0 - y0a).astype(jnp.float32)

    copy = pltpu.make_async_copy(
        page_ref.at[pl.ds(y0a, slab_rows), :], slab, sem
    )
    copy.start()

    crop_h = jnp.maximum(y1 - y0, 1).astype(jnp.float32)
    crop_w = jnp.maximum(x1 - x0, 1).astype(jnp.float32)
    crop_h = jnp.minimum(crop_h, float(SLAB_H))
    new_w = jnp.clip(jnp.ceil(out_h * crop_w / crop_h), 1.0, float(out_w))

    # vertical sampling positions within the slab
    oy = jax.lax.broadcasted_iota(jnp.int32, (out_h, 1), 0).astype(jnp.float32)[:, 0]
    sy = (oy + 0.5) * (crop_h / out_h) - 0.5
    sy = jnp.clip(sy, 0.0, crop_h - 1.0) + shift
    sy = jnp.clip(sy, 0.0, float(SLAB_H + 31))

    # horizontal positions within the full page row (absolute columns)
    ox = jax.lax.broadcasted_iota(jnp.int32, (out_w, 1), 0).astype(jnp.float32)[:, 0]
    sx = (ox + 0.5) * (crop_w / new_w) - 0.5
    sx = jnp.clip(sx, 0.0, crop_w - 1.0) + x0.astype(jnp.float32)
    sx = jnp.clip(sx, 0.0, float(page_w - 1))

    copy.wait()

    a = _interp_matrix(sy, SLAB_H + 32, jnp.float32(SLAB_H + 32))  # (out_h, slab)

    # contract over page width in static chunks to stay within VMEM:
    # crop = sum_c (a @ src[:, c]) @ b_c
    chunk = 256
    crop = jnp.zeros((out_h, out_w), jnp.float32)
    for c0 in range(0, page_w, chunk):
        cw = min(chunk, page_w - c0)
        # Mosaic lacks a direct u8->f32 cast; hop through int32
        src_c = slab[:, c0:c0 + cw].astype(jnp.int32).astype(jnp.float32)
        rows_c = jnp.dot(a, src_c, preferred_element_type=jnp.float32)
        # (cw, out_w) bilinear weights for this column chunk
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (cw, out_w), 0).astype(jnp.float32) + c0
        b_c = jnp.maximum(0.0, 1.0 - jnp.abs(col_ids - sx[None, :]))
        crop = crop + jnp.dot(rows_c, b_c, preferred_element_type=jnp.float32)
    out_ref[0] = (crop / 255.0 - 0.5) / 0.5


@partial(jax.jit, static_argnames=("out_h", "out_w", "interpret"))
def crop_resize_normalize_pallas(page_u8, boxes, out_h: int = 64,
                                 out_w: int = 512, interpret: bool = False):
    """Pallas twin of ``crop_resize_normalize`` (same signature contract).

    Args:
      page_u8: (H, W) uint8 page (H should be >= SLAB_H for exactness).
      boxes:   (N, 4) int32 [x_min, x_max, y_min, y_max].
    Returns (N, out_h, out_w, 1) float32 in [-1, 1].
    """
    n = boxes.shape[0]
    page_h, page_w = page_u8.shape
    # short pages pad down so the fixed-height slab DMA stays in bounds
    if page_h < SLAB_H + 32:
        page_u8 = jnp.pad(page_u8, ((0, SLAB_H + 32 - page_h), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        # NB no trailing singleton dim: a (.., 1) minor dim tile-pads x8 in
        # VMEM and blew the scoped-vmem budget; channel axis is added below.
        out_specs=pl.BlockSpec(
            (1, out_h, out_w), lambda i, boxes: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((SLAB_H + 32, page_w), jnp.uint8),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = partial(_crop_kernel, out_h=out_h, out_w=out_w, page_w=page_w)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, out_h, out_w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(boxes, page_u8)
    return out[..., None]

"""Deformable position-sensitive RoI pooling (DCN API surface).

XLA counterpart of the reference's ``deform_psroi_pooling_{cpu,cuda}``
native ops (``DBNet/assets/ops/dcn/src/deform_pool_*``; kernel semantics
``deform_pool_cpu_kernel.cpp:52-131``).  The production configs never call
it (SURVEY.md §2.6) — it exists for API-surface parity.

Semantics: each RoI (scaled by ``spatial_scale``) is divided into a
``pooled_size x pooled_size`` grid; each bin averages ``sample_per_part^2``
bilinear samples, optionally shifted by a learned per-bin (trans) offset,
with position-sensitive channel mapping when ``no_trans`` is False.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("pooled_size", "sample_per_part", "output_dim",
                                   "no_trans", "part_size", "group_size"))
def deform_roi_pool(x, rois, trans=None, *, spatial_scale: float = 1.0,
                    pooled_size: int = 7, output_dim: int | None = None,
                    sample_per_part: int = 2, trans_std: float = 0.0,
                    no_trans: bool = True, part_size: int | None = None,
                    group_size: int = 1):
    """x: (N, H, W, C); rois: (R, 5) [batch_idx, x1, y1, x2, y2].

    trans: (R, part, part, 2) learned offsets (ignored when ``no_trans``).
    Returns (R, pooled, pooled, output_dim).
    """
    n, h, w, c = x.shape
    output_dim = output_dim or c
    part_size = part_size or pooled_size
    r = rois.shape[0]
    p = pooled_size

    batch_idx = rois[:, 0].astype(jnp.int32)
    # reference rounds RoI corners and inflates by 0.5/0.1 px
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)

    bin_w = roi_w / p
    bin_h = roi_h / p
    sub_w = bin_w / sample_per_part
    sub_h = bin_h / sample_per_part

    iy, ix = jnp.meshgrid(jnp.arange(p), jnp.arange(p), indexing="ij")

    if no_trans or trans is None:
        off_x = jnp.zeros((r, p, p))
        off_y = jnp.zeros((r, p, p))
    else:
        part_y = (iy[None] * part_size) // p
        part_x = (ix[None] * part_size) // p
        off_y = trans[jnp.arange(r)[:, None, None], part_y, part_x, 0] * trans_std
        off_x = trans[jnp.arange(r)[:, None, None], part_y, part_x, 1] * trans_std

    # sample grid: (R, p, p, s, s)
    s = sample_per_part
    sy, sx = jnp.meshgrid(jnp.arange(s), jnp.arange(s), indexing="ij")
    samp_y = (y1[:, None, None] + iy[None] * bin_h[:, None, None]
              + off_y * roi_h[:, None, None])[..., None, None] \
        + (sy[None, None, None] + 0.5) * sub_h[:, None, None, None, None]
    samp_x = (x1[:, None, None] + ix[None] * bin_w[:, None, None]
              + off_x * roi_w[:, None, None])[..., None, None] \
        + (sx[None, None, None] + 0.5) * sub_w[:, None, None, None, None]

    valid = (samp_y > -1) & (samp_y < h) & (samp_x > -1) & (samp_x < w)
    samp_y = jnp.clip(samp_y, 0.0, h - 1.0)
    samp_x = jnp.clip(samp_x, 0.0, w - 1.0)

    # position-sensitive channel selection
    gh = (iy * group_size) // p
    gw = (ix * group_size) // p
    cpg = c // (group_size * group_size) if group_size > 1 else output_dim
    chan0 = ((gh * group_size + gw)[None] * cpg) if group_size > 1 else jnp.zeros((1, p, p), jnp.int32)

    def pool_one(bi, ys, xs, vmask, ch0):
        img = x[bi]  # (H, W, C)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        fy = ys - y0
        fx = xs - x0

        def corner(yi, xi):
            yi = jnp.clip(yi, 0, h - 1)
            xi = jnp.clip(xi, 0, w - 1)
            return img[yi, xi]  # (..., C)

        val = (
            corner(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
            + corner(y0, x0 + 1) * ((1 - fy) * fx)[..., None]
            + corner(y0 + 1, x0) * (fy * (1 - fx))[..., None]
            + corner(y0 + 1, x0 + 1) * (fy * fx)[..., None]
        )
        val = val * vmask[..., None]
        pooled = jnp.mean(val, axis=(-3, -2))  # (p, p, C)
        if group_size > 1:
            ch = ch0[..., None] + jnp.arange(output_dim)[None, None]
            pooled = jnp.take_along_axis(pooled, ch, axis=-1)
        else:
            pooled = pooled[..., :output_dim]
        return pooled

    return jax.vmap(pool_one)(batch_idx, samp_y, samp_x,
                              valid.astype(x.dtype), chan0 * jnp.ones((r, 1, 1), jnp.int32))

"""Modulated deformable convolution (DCNv2) for TPU.

Replaces the reference's C++/CUDA extension
(``/root/reference/src/ocrfa/DBNet/assets/ops/dcn/``) with an XLA-native
formulation.  Semantics follow the reference kernels exactly
(``src/deform_conv_cuda_kernel.cu:570-633``; CPU twin
``src/deform_conv_cpu_kernel.cpp:528-766``):

* offset channels are interleaved ``[dy(k0), dx(k0), dy(k1), dx(k1), ...]``
  over kernel taps in row-major order; mask channels follow tap order;
* sample position for tap (i, j) at output (ho, wo):
  ``(ho*stride - pad + i*dil + dy, wo*stride - pad + j*dil + dx)``;
* bilinear sampling with zero outside the input extent;
* v2 modulation: each sampled value is scaled by its (sigmoided) mask.

TPU mapping: the deformable im2col is built with vectorised XLA gathers
(four corner lookups per tap), then contracted against the weights with one
large MXU matmul — the same im2col+GEMM scheme as the reference, with the
compiler owning layout and fusion.  A host C++ parity kernel lives in
``ocrfa_tpu/runtime`` for cross-checking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_gather(x, ys, xs):
    """Sample ``x`` (H, W, C) at float coords (ys, xs) of shape (P,).

    Zero padding outside; returns (P, C).

    The four corner lookups are expressed as axis-0 gathers of whole
    C-channel rows from the flattened (H*W, C) map rather than 2-D advanced
    indexing: on TPU a flat row gather keeps each gathered unit
    lane-contiguous and measures ~25% faster at DBNet's /8 stage (the same
    element-vs-row-gather lesson as preproc/ribbon.py).
    """
    h, w, c = x.shape
    xf = x.reshape(h * w, c)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[:, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = jnp.take(xf, yc * w + xc, axis=0)  # (P, C) row gather
        return vals * valid[:, None]

    return (
        corner(y0, x0) * (1 - fy) * (1 - fx)
        + corner(y0, x0 + 1) * (1 - fy) * fx
        + corner(y0 + 1, x0) * fy * (1 - fx)
        + corner(y0 + 1, x0 + 1) * fy * fx
    )


@partial(jax.jit, static_argnames=("stride", "padding", "dilation"))
def modulated_deform_conv(x, offset, mask, w, b=None,
                          stride: int = 1, padding: int = 1, dilation: int = 1):
    """DCNv2 forward.

    Args:
      x:      (N, H, W, Cin) activations.
      offset: (N, Ho, Wo, 2*Kh*Kw) interleaved (dy, dx) per tap.
      mask:   (N, Ho, Wo, Kh*Kw) modulation (already sigmoided).
      w:      (Kh, Kw, Cin, Cout) weights (HWIO).
      b:      optional (Cout,).

    Returns (N, Ho, Wo, Cout).
    """
    n, h, width, cin = x.shape
    kh, kw, _, cout = w.shape
    k = kh * kw
    _, ho, wo, _ = offset.shape

    # base sampling grid per tap
    hs = jnp.arange(ho) * stride - padding
    ws = jnp.arange(wo) * stride - padding
    ih = jnp.arange(kh) * dilation
    iw = jnp.arange(kw) * dilation
    # (Ho, Wo, K) base coords
    base_y = (hs[:, None, None] + ih.repeat(kw)[None, None, :])
    base_x = (ws[None, :, None] + jnp.tile(iw, kh)[None, None, :])
    base_y = jnp.broadcast_to(base_y, (ho, wo, k)).astype(x.dtype)
    base_x = jnp.broadcast_to(base_x, (ho, wo, k)).astype(x.dtype)

    off = offset.reshape(n, ho, wo, k, 2)
    samp_y = base_y[None] + off[..., 0]
    samp_x = base_x[None] + off[..., 1]

    def one_image(xi, yi, xj, mi):
        cols = _bilinear_gather(xi, yi.reshape(-1), xj.reshape(-1))  # (Ho*Wo*K, Cin)
        cols = cols * mi.reshape(-1)[:, None]
        return cols.reshape(ho * wo, k * cin)

    cols = jax.vmap(one_image)(x, samp_y, samp_x, mask)  # (N, Ho*Wo, K*Cin)

    # weights (Kh, Kw, Cin, Cout) -> (K*Cin, Cout), tap-major like the cols
    w_mat = w.reshape(k, cin, cout).reshape(k * cin, cout)
    out = jax.lax.dot_general(
        cols, w_mat,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b
    return out.reshape(n, ho, wo, cout)


def deform_conv(x, offset, w, b=None,
                stride: int = 1, padding: int = 1, dilation: int = 1):
    """DCNv1 forward — deformable sampling without modulation.

    The reference exports this beside the modulated op
    (``deform_conv_forward_cpu``, ``dcn/src/deform_conv_cpu.cpp:743-758``;
    module wrapper ``DeformConv``, ``dcn/modules/deform_conv.py:10-70``)
    even though no shipped config reaches it (the production backbones use
    ``modulated=True`` only, ``backbones/resnet.py:62-64``).  v1 is exactly
    v2 with a unit modulation mask, so it shares the row-gather kernel.
    """
    n, ho, wo, k2 = offset.shape
    mask = jnp.ones((n, ho, wo, k2 // 2), x.dtype)
    return modulated_deform_conv(x, offset, mask, w, b, stride=stride,
                                 padding=padding, dilation=dilation)


@partial(jax.jit, static_argnames=("stride", "padding", "dilation", "radius"))
def modulated_deform_conv_bounded(x, offset, mask, w, b=None,
                                  stride: int = 1, padding: int = 1,
                                  dilation: int = 1, radius: int = 2):
    """DCNv2 forward with offsets clamped to ``[-radius, radius]`` — the
    gather-free dense-shift formulation.

    Bilinear interpolation over integer lags is a triangular-hat sum:
    ``x(p + Δ) = Σ_d tri(Δ - d) · x(p + d)`` with ``tri(t) = max(0, 1-|t|)``
    and ``d`` ranging over the ``2R+2`` integers ``[-R, R+1]`` once
    ``|Δ| ≤ R``.  Each tap's sampled map is therefore a weighted sum of
    STATIC shifted slices of the (zero-padded) input — pure VPU elementwise
    work XLA can fuse, no data-dependent gathers — followed by the same
    im2col GEMM as :func:`modulated_deform_conv`.

    Semantics match the reference kernels (deform_conv_cuda_kernel.cu:
    570-633) exactly *when every offset is within ±radius*; larger trained
    offsets are clamped (the approximation this formulation trades for
    MXU/VPU-only execution).

    Cost: ``Kh·Kw·(2R+2)²`` shifted FMA passes (324 at R=2 for a 3x3) vs 36
    gather passes — worth it only if XLA's fusion beats the TPU's gather
    throughput; measured on-device by scripts/probe_dcn.py.
    """
    n, h, width, cin = x.shape
    kh, kw, _, cout = w.shape
    k = kh * kw
    _, ho, wo, _ = offset.shape

    shifts = list(range(-radius, radius + 2))  # 2R+2 integer lags
    off = jnp.clip(offset.reshape(n, ho, wo, k, 2).astype(jnp.float32),
                   -float(radius), float(radius))
    mask = mask.astype(jnp.float32)

    # zero-pad once so every (tap, lag) slice is in-bounds; row r of the
    # output reads padded row r*stride + i*dilation + dy
    lo_y = padding + radius
    hi_y = (ho - 1) * stride + (kh - 1) * dilation + radius + 1 - padding - (h - 1)
    lo_x = padding + radius
    hi_x = (wo - 1) * stride + (kw - 1) * dilation + radius + 1 - padding - (width - 1)
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (lo_y, max(hi_y, 0)), (lo_x, max(hi_x, 0)), (0, 0)))

    def tri(t):
        return jnp.maximum(0.0, 1.0 - jnp.abs(t))

    cols = []
    for ki in range(kh):
        for kj in range(kw):
            tap = ki * kw + kj
            dy_off = off[..., tap, 0]
            dx_off = off[..., tap, 1]
            m = mask[..., tap]
            acc = jnp.zeros((n, ho, wo, cin), jnp.float32)
            for dy in shifts:
                wy = tri(dy_off - dy)
                y0 = ki * dilation + dy + radius
                for dx in shifts:
                    gamma = (wy * tri(dx_off - dx) * m)[..., None]
                    x0 = kj * dilation + dx + radius
                    sl = jax.lax.slice(
                        xp,
                        (0, y0, x0, 0),
                        (n, y0 + (ho - 1) * stride + 1,
                         x0 + (wo - 1) * stride + 1, cin),
                        (1, stride, stride, 1))
                    acc = acc + gamma * sl
            cols.append(acc)

    cols = jnp.stack(cols, axis=3).reshape(n, ho * wo, k * cin)
    w_mat = w.reshape(k * cin, cout).astype(jnp.float32)
    out = jax.lax.dot_general(
        cols, w_mat,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        out = out + b
    return out.reshape(n, ho, wo, cout)


def modulated_deform_conv_block(x, p, stride: int = 1, padding: int = 1):
    """The DBNet block pattern: offsets/mask from a plain conv, then DCNv2.

    ``p`` holds ``offset_conv`` ({w, b}, producing 27 channels: 18 offsets +
    9 mask logits, backbones/resnet.py:92-96) and ``conv`` ({w}).
    """
    from ocrfa_tpu.models.layers import conv2d

    om = conv2d(x, p["offset_conv"]["w"], p["offset_conv"]["b"], padding=1)
    offset = om[..., :18]
    mask = jax.nn.sigmoid(om[..., 18:])
    return modulated_deform_conv(
        x, offset, mask, p["conv"]["w"], stride=stride, padding=padding
    )

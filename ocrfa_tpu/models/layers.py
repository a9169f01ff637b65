"""Functional NN primitives with torch-compatible semantics, NHWC layout.

These are thin wrappers over ``jax.lax`` that reproduce the exact padding /
normalisation conventions of the reference's torch layers so that converted
checkpoints are numerically interchangeable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


def conv2d(x, w, b=None, stride=(1, 1), padding=(0, 0), dilation=(1, 1)):
    """2-D convolution, NHWC activations x HWIO weights.

    ``padding`` is the torch convention: symmetric (pad_h, pad_w).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b
    return out


def batch_norm(x, p, train: bool = False):
    """Batch norm with torch eps; ``p`` holds scale/bias/mean/var.

    ``train=True`` normalises with the current batch's moments (needed to
    train from scratch — with untouched running stats the 30-layer towers
    have no signal); inference uses the stored running statistics.
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + BN_EPS) * p["scale"]
    return x * inv + (p["bias"] - mean * inv)


def max_pool(x, window, stride=None, padding=(0, 0)):
    """Max pool with torch semantics (symmetric padding, -inf pad value)."""
    if isinstance(window, int):
        window = (window, window)
    stride = stride or window
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, *window, 1),
        window_strides=(1, *stride, 1),
        padding=((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)),
    )


def relu(x):
    return jnp.maximum(x, 0)


def linear(x, w, b=None):
    """Dense layer with torch weight layout ``(Out, In)``."""
    out = x @ w.T
    if b is not None:
        out = out + b
    return out


def resize_bilinear(x, size):
    """``F.interpolate(mode='bilinear', align_corners=False)`` equivalent.

    ``x`` is NHWC; ``size`` the target (H, W).
    """
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="bilinear")


def resize_nearest(x, size):
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="nearest")


# ---------------------------------------------------------------------------
# Parameter initialisation (reference init_weights parity:
# modules/blocks.py:10-21 — xavier-uniform conv, unit BN, N(0, 0.01) linear).


def init_conv(rng, kh, kw, cin, cout, bias=False, dtype=jnp.float32):
    fan_in, fan_out = cin * kh * kw, cout * kh * kw
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    w = jax.random.uniform(rng, (kh, kw, cin, cout), dtype, -limit, limit)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_bn(c, dtype=jnp.float32):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def init_linear(rng, cin, cout, std=0.01, dtype=jnp.float32):
    return {
        "w": std * jax.random.normal(rng, (cout, cin), dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def init_lstm(rng, cin, hidden, dtype=jnp.float32):
    """Torch nn.LSTM default init: U(-1/sqrt(H), 1/sqrt(H)) everywhere."""
    k = 1.0 / np.sqrt(hidden)
    keys = jax.random.split(rng, 8)
    u = lambda key, shape: jax.random.uniform(key, shape, dtype, -k, k)
    return {
        "w_ih": u(keys[0], (4 * hidden, cin)),
        "w_hh": u(keys[1], (4 * hidden, hidden)),
        "b_ih": u(keys[2], (4 * hidden,)),
        "b_hh": u(keys[3], (4 * hidden,)),
        "w_ih_rev": u(keys[4], (4 * hidden, cin)),
        "w_hh_rev": u(keys[5], (4 * hidden, hidden)),
        "b_ih_rev": u(keys[6], (4 * hidden,)),
        "b_hh_rev": u(keys[7], (4 * hidden,)),
    }

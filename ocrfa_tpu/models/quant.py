"""int8 quantization for the CRNN feature extractor (dynamic + static).

The reference runs its recognizer through ``torch.quantization.
quantize_dynamic(dtype=qint8)`` on CPU by default (utils.py:687-690 — and
defect #2 makes the flag always-truthy, so int8 *is* the reference's
production numerics).  This module is the TPU equivalent: per-output-channel
int8 weights, int8 x int8 -> int32 convolutions on the v5e MXU (2x the bf16
throughput), with residuals and the BiLSTM head kept in higher precision.

Two activation-scaling modes:

* **dynamic** (``quantize_crnn_gen1`` / ``crnn_apply_int8``): per-tensor
  scales from a full amax reduction before every conv — faithful to torch's
  quantize_dynamic, but the reduction serializes against the conv and caps
  the speedup (~+17% end to end, round-1 measurement).
* **static** (``calibrate_crnn_gen1`` -> ``quantize_crnn_gen1_static`` ->
  ``crnn_apply_int8_static``): activation scales are fixed offline from
  calibration batches and batch norm is folded into the conv's per-channel
  output scale/bias, so the runtime epilogue is one fused
  multiply-add-relu-requantize with no reductions — the near-2x path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.layers import (
    BN_EPS,
    batch_norm,
    conv2d,
    linear,
    max_pool,
    relu,
)
from ocrfa_tpu.ops.lstm import bilstm


def _quantize_weight(w):
    """HWIO weight -> (int8 weight, per-Cout f32 scale)."""
    amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "w_scale": scale.astype(jnp.float32)}


def _quantize_tree(p):
    if isinstance(p, dict):
        if "w" in p and hasattr(p["w"], "ndim") and p["w"].ndim == 4:
            q = _quantize_weight(p["w"])
            if "b" in p:
                q["b"] = p["b"]
            return q
        return {k: _quantize_tree(v) for k, v in p.items()}
    if isinstance(p, list):
        return [_quantize_tree(v) for v in p]
    return p


def quantize_crnn_gen1(params):
    """Quantize the conv tower; sequence head stays bf16."""
    return {
        "feat": _quantize_tree(params["feat"]),
        "seq0": jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params["seq0"]),
        "seq1": jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params["seq1"]),
        "pred": jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params["pred"]),
    }


def _conv_int8(x, q, stride=(1, 1), padding=(0, 0)):
    """Dynamic-quantized conv: f32/bf16 activations -> int8 -> int32 MXU ->
    rescale to f32."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    x32 = x.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8)
    x_scale = amax / 127.0
    x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, q["w_q"], window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (x_scale * q["w_scale"])
    if "b" in q:
        out = out + q["b"]
    return out


def _block_int8(p, x):
    residual = x
    if "downsample" in p:
        residual = batch_norm(_conv_int8(x, p["downsample"]["conv"]), p["downsample"]["bn"])
    y = relu(batch_norm(_conv_int8(x, p["conv1"], padding=1), p["bn1"]))
    y = batch_norm(_conv_int8(y, p["conv2"], padding=1), p["bn2"])
    return relu(y + residual)


def resnet_features_int8(p, x, w8: bool = False):
    """int8 twin of ``crnn.resnet_features`` (same topology/order)."""
    x = relu(batch_norm(_conv_int8(x, p["conv0_1"], padding=1), p["bn0_1"]))
    x = relu(batch_norm(_conv_int8(x, p["conv0_2"], padding=1), p["bn0_2"]))

    def layer(blocks, v):
        for bp in blocks:
            v = _block_int8(bp, v)
        return v

    x = max_pool(x, 2, 2)
    x = layer(p["layer1"], x)
    x = relu(batch_norm(_conv_int8(x, p["conv1"], padding=1), p["bn1"]))

    x = max_pool(x, 2, 2)
    x = layer(p["layer2"], x)
    x = relu(batch_norm(_conv_int8(x, p["conv2"], padding=1), p["bn2"]))

    x = max_pool(x, 2, stride=(2, 2 if w8 else 1), padding=(0, 1))
    x = layer(p["layer3"], x)
    x = relu(batch_norm(_conv_int8(x, p["conv3"], padding=1), p["bn3"]))

    x = layer(p["layer4"], x)
    x = relu(batch_norm(_conv_int8(x, p["conv4_1"], stride=(2, 1), padding=(0, 1)), p["bn4_1"]))
    x = relu(batch_norm(_conv_int8(x, p["conv4_2"], stride=1, padding=0), p["bn4_2"]))
    return x


def crnn_apply_int8(qparams, x, w8: bool = False):
    """gen1 forward with the int8 conv tower; head in bf16."""
    feats = resnet_features_int8(qparams["feat"], x, w8=w8)
    seq = jnp.mean(feats, axis=1).astype(jnp.bfloat16)
    seq = bilstm(seq, qparams["seq0"])
    seq = bilstm(seq, qparams["seq1"])
    return linear(seq, qparams["pred"]["w"], qparams["pred"]["b"])


# ---------------------------------------------------------------------------
# Static-scale int8 (calibrated activation scales + BN folding)


def _walk_gen1_tower(feat, x, conv_bn, w8: bool = False):
    """Drive the gen1 tower topology once, delegating every conv+BN pair to
    ``conv_bn(x, parent, conv_name, bn_name, key, stride, padding)``.

    Shared by calibration (f32 compute + amax recording) and the static-int8
    forward (quantized compute); topology mirrors ``crnn.resnet_features``
    (``w8`` selects the gen1w8 width-strided /8 pool).
    """

    def block(x, bp, key):
        residual = x
        if "downsample" in bp:
            residual = conv_bn(x, bp["downsample"], "conv", "bn",
                               key + ".down", 1, 0)
        y = relu(conv_bn(x, bp, "conv1", "bn1", key + ".c1", 1, 1))
        y = conv_bn(y, bp, "conv2", "bn2", key + ".c2", 1, 1)
        return relu(y + residual)

    def layer(x, name):
        for i, bp in enumerate(feat[name]):
            x = block(x, bp, f"{name}.{i}")
        return x

    x = relu(conv_bn(x, feat, "conv0_1", "bn0_1", "conv0_1", 1, 1))
    x = relu(conv_bn(x, feat, "conv0_2", "bn0_2", "conv0_2", 1, 1))
    x = max_pool(x, 2, 2)
    x = layer(x, "layer1")
    x = relu(conv_bn(x, feat, "conv1", "bn1", "conv1", 1, 1))
    x = max_pool(x, 2, 2)
    x = layer(x, "layer2")
    x = relu(conv_bn(x, feat, "conv2", "bn2", "conv2", 1, 1))
    x = max_pool(x, 2, stride=(2, 2 if w8 else 1), padding=(0, 1))
    x = layer(x, "layer3")
    x = relu(conv_bn(x, feat, "conv3", "bn3", "conv3", 1, 1))
    x = layer(x, "layer4")
    x = relu(conv_bn(x, feat, "conv4_1", "bn4_1", "conv4_1", (2, 1), (0, 1)))
    x = relu(conv_bn(x, feat, "conv4_2", "bn4_2", "conv4_2", 1, 0))
    return x


def calibrate_crnn_gen1(params, batches, w8: bool = False):
    """Per-conv-input activation amax over calibration batches.

    ``batches``: iterable of normalized f32 crop batches (N, 64, W, 1).
    Returns ``{conv_key: float amax}`` for ``quantize_crnn_gen1_static``.
    """
    feat = params["feat"]

    def forward(x):
        record = {}

        def conv_bn(v, parent, cn, bn, key, stride, padding):
            record[key] = jnp.max(jnp.abs(v))
            y = conv2d(v, parent[cn]["w"], stride=stride, padding=padding)
            return batch_norm(y, parent[bn])

        _walk_gen1_tower(feat, x, conv_bn, w8=w8)
        return record

    forward_j = jax.jit(forward)
    amax = {}
    for batch in batches:
        rec = jax.device_get(forward_j(jnp.asarray(batch, jnp.float32)))
        for key, value in rec.items():
            amax[key] = max(amax.get(key, 0.0), float(value))
    return amax


def _fold_quant_one(conv_p, bn_p, amax_in):
    """Fold BN into one conv and quantize: int8 weights + fused epilogue.

    out = relu-less(acc_int32 * out_scale + bias) where out_scale bundles
    the activation scale, per-channel weight scale, and BN gamma/sigma.
    """
    w = conv_p["w"].astype(jnp.float32)
    bn_mul = bn_p["scale"] * jax.lax.rsqrt(bn_p["var"] + BN_EPS)
    bias = bn_p["bias"] - bn_p["mean"] * bn_mul
    if "b" in conv_p:
        bias = bias + conv_p["b"] * bn_mul

    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    s_in = max(amax_in, 1e-8) / 127.0
    return {
        "w_q": w_q,
        "out_scale": (w_scale * bn_mul * s_in).astype(jnp.float32),
        "bias": bias.astype(jnp.float32),
        "inv_in": jnp.float32(1.0 / s_in),
    }


def quantize_crnn_gen1_static(params, act_amax):
    """Static-quantized gen1 params (conv tower int8+folded BN, head bf16)."""
    feat = params["feat"]

    def q(parent, cn, bn, key):
        return _fold_quant_one(parent[cn], parent[bn], act_amax[key])

    qfeat = {}
    for name in ("conv0_1", "conv0_2", "conv1", "conv2", "conv3",
                 "conv4_1", "conv4_2"):
        qfeat[name] = q(feat, name, "bn" + name[4:], name)
    for lname in ("layer1", "layer2", "layer3", "layer4"):
        qblocks = []
        for i, bp in enumerate(feat[lname]):
            qb = {
                "conv1": q(bp, "conv1", "bn1", f"{lname}.{i}.c1"),
                "conv2": q(bp, "conv2", "bn2", f"{lname}.{i}.c2"),
            }
            if "downsample" in bp:
                qb["downsample"] = {
                    "conv": q(bp["downsample"], "conv", "bn", f"{lname}.{i}.down")
                }
            qblocks.append(qb)
        qfeat[lname] = qblocks

    to_bf16 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), t)
    return {
        "feat": qfeat,
        "seq0": to_bf16(params["seq0"]),
        "seq1": to_bf16(params["seq1"]),
        "pred": to_bf16(params["pred"]),
    }


def _conv_static(x, q, stride, padding):
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    # quantize in f32 (bf16's 8-bit mantissa would wobble near +-127.5)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * q["inv_in"]),
                   -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, q["w_q"], window_strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * q["out_scale"] + q["bias"]
    # bf16-resident inter-layer activations: halves the tower's HBM
    # traffic (+6% lines/s at b512/w256 on v5e) with argmax identity
    # unchanged (99.78% vs f32 — the next conv re-quantizes to int8
    # anyway, so bf16 storage noise is sub-quantization-step)
    return y.astype(jnp.bfloat16)


def resnet_features_int8_static(qfeat, x, w8: bool = False):
    """Static-int8 twin of ``crnn.resnet_features`` (BN pre-folded)."""

    def conv_bn(v, parent, cn, bn, key, stride, padding):
        return _conv_static(v, parent[cn], stride, padding)

    return _walk_gen1_tower(qfeat, x, conv_bn, w8=w8)


def crnn_apply_int8_static(qparams, x, w8: bool = False):
    """gen1 forward with the calibrated static-int8 conv tower."""
    feats = resnet_features_int8_static(qparams["feat"], x.astype(jnp.float32),
                                        w8=w8)
    seq = jnp.mean(feats.astype(jnp.float32), axis=1).astype(jnp.bfloat16)
    seq = bilstm(seq, qparams["seq0"])
    seq = bilstm(seq, qparams["seq1"])
    return linear(seq, qparams["pred"]["w"], qparams["pred"]["b"])

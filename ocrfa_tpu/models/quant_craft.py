"""Calibrated static-int8 CRAFT tower (detector quantization).

The reference quantizes its CRAFT detector with ``torch.quantization.
quantize_dynamic`` on CPU (``/root/reference/src/ocrfa/detectors.py:81-85``
— and defect #2 makes the flag always-truthy, so int8 detection *is* the
reference's production numerics).  This is the TPU equivalent, built the
same way as the recognizer's static path (:mod:`ocrfa_tpu.models.quant`):

* activation scales fixed offline from calibration pages;
* BatchNorm folded into each conv's per-channel output scale/bias;
* int8 x int8 -> int32 on the v5e MXU (2x bf16 throughput), bf16-resident
  activations between layers;
* the U-net resize/concat glue and the final heatmap stay high precision.

Detection consumes the heatmaps only through loose threshold comparisons
(text/link/low-text masks), so int8 tower noise must merely stay below the
threshold margins — box equality is asserted in tests, not assumed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.layers import batch_norm, conv2d, max_pool, relu
from ocrfa_tpu.models.layers import resize_bilinear
from ocrfa_tpu.models.quant import _fold_quant_one


def _walk_craft(p, x, cbr, cv):
    """Drive the CRAFT topology once (mirrors ``craft.craft_apply``).

    ``cbr(v, parent, conv_key, bn_key, tag, padding, act)`` handles a
    conv+BN(+ReLU) unit; ``cv(v, parent, conv_key, tag, padding, dilation,
    act)`` a bias-only conv.  Shared by calibration (f32 + amax recording)
    and the static-int8 forward.
    """
    v = p["vgg"]
    x = cbr(x, v, "conv0", "bn0", "vgg0", 1, True)
    x = cbr(x, v, "conv1", "bn1", "vgg1", 1, True)
    x = max_pool(x, 2, 2)
    x = cbr(x, v, "conv2", "bn2", "vgg2", 1, True)
    s2 = cbr(x, v, "conv3", "bn3", "vgg3", 1, True)

    x = max_pool(s2, 2, 2)
    x = cbr(x, v, "conv4", "bn4", "vgg4", 1, True)
    s4 = cbr(x, v, "conv5", "bn5", "vgg5", 1, True)

    x = cbr(s4, v, "conv6", "bn6", "vgg6", 1, True)
    x = max_pool(x, 2, 2)
    x = cbr(x, v, "conv7", "bn7", "vgg7", 1, True)
    s8 = cbr(x, v, "conv8", "bn8", "vgg8", 1, True)

    x = cbr(s8, v, "conv9", "bn9", "vgg9", 1, True)
    x = max_pool(x, 2, 2)
    x = cbr(x, v, "conv10", "bn10", "vgg10", 1, True)
    s16 = cbr(x, v, "conv11", "bn11", "vgg11", 1, False)

    x = max_pool(s16, (3, 3), (1, 1), padding=(1, 1))
    x = cv(x, v, "fc6", "fc6", 6, 6, False)
    fc7 = cv(x, v, "fc7", "fc7", 0, 1, False)

    def double_conv(name, y):
        q = p[name]
        y = cbr(y, q, "conv1", "bn1", name + ".c1", 0, True)
        return cbr(y, q, "conv2", "bn2", name + ".c2", 1, True)

    y = jnp.concatenate([fc7, s16], axis=-1)
    y = double_conv("upconv1", y)
    y = resize_bilinear(y, s8.shape[1:3])
    y = double_conv("upconv2", jnp.concatenate([y, s8], axis=-1))
    y = resize_bilinear(y, s4.shape[1:3])
    y = double_conv("upconv3", jnp.concatenate([y, s4], axis=-1))
    y = resize_bilinear(y, s2.shape[1:3])
    feature = double_conv("upconv4", jnp.concatenate([y, s2], axis=-1))

    cls = p["conv_cls"]
    y = cv(feature, cls, 0, "cls0", 1, 1, True)
    y = cv(y, cls, 1, "cls1", 1, 1, True)
    y = cv(y, cls, 2, "cls2", 1, 1, True)
    y = cv(y, cls, 3, "cls3", 0, 1, True)
    y = cv(y, cls, 4, "cls4", 0, 1, False)
    return y, feature


def calibrate_craft(params, batches):
    """Per-conv-input activation amax over calibration canvases.

    ``batches``: iterable of ImageNet-normalised f32 page canvases
    (N, H, W, 3), H/W multiples of 32.  Returns ``{tag: float amax}``.
    """
    record = {}

    def forward(x):
        rec = {}

        def cbr(v, parent, cn, bn, tag, padding, act):
            rec[tag] = jnp.max(jnp.abs(v))
            y = batch_norm(conv2d(v, parent[cn]["w"], parent[cn]["b"],
                                  padding=padding), parent[bn])
            return relu(y) if act else y

        def cv(v, parent, cn, tag, padding, dilation, act):
            rec[tag] = jnp.max(jnp.abs(v))
            y = conv2d(v, parent[cn]["w"], parent[cn]["b"],
                       padding=padding, dilation=dilation)
            return relu(y) if act else y

        _walk_craft(params, x, cbr, cv)
        return rec

    forward_j = jax.jit(forward)
    for batch in batches:
        rec = jax.device_get(forward_j(jnp.asarray(batch, jnp.float32)))
        for tag, value in rec.items():
            record[tag] = max(record.get(tag, 0.0), float(value))
    return record


def _fold_quant_plain(conv_p, amax_in):
    """Quantize a bias-only conv (no BN): fused scale epilogue."""
    w = conv_p["w"].astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
    s_in = max(amax_in, 1e-8) / 127.0
    return {
        "w_q": w_q,
        "out_scale": (w_scale * s_in).astype(jnp.float32),
        "bias": conv_p["b"].astype(jnp.float32),
        "inv_in": jnp.float32(1.0 / s_in),
    }


def quantize_craft_static(params, act_amax):
    """Static-quantized CRAFT params (BN folded, all convs int8)."""
    vgg = params["vgg"]
    qvgg = {}
    for i in range(12):
        qvgg[f"conv{i}"] = _fold_quant_one(
            vgg[f"conv{i}"], vgg[f"bn{i}"], act_amax[f"vgg{i}"])
    qvgg["fc6"] = _fold_quant_plain(vgg["fc6"], act_amax["fc6"])
    qvgg["fc7"] = _fold_quant_plain(vgg["fc7"], act_amax["fc7"])

    out = {"vgg": qvgg}
    for name in ("upconv1", "upconv2", "upconv3", "upconv4"):
        u = params[name]
        out[name] = {
            "conv1": _fold_quant_one(u["conv1"], u["bn1"],
                                     act_amax[name + ".c1"]),
            "conv2": _fold_quant_one(u["conv2"], u["bn2"],
                                     act_amax[name + ".c2"]),
        }
    out["conv_cls"] = [
        _fold_quant_plain(c, act_amax[f"cls{i}"])
        for i, c in enumerate(params["conv_cls"])
    ]
    return out


def _conv_int8_static(x, q, padding=0, dilation=1):
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) * q["inv_in"]),
                   -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q, q["w_q"], window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * q["out_scale"] + q["bias"]
    return y.astype(jnp.bfloat16)


def resolve_craft_inference(params, quantized=None, calibration_batches=None):
    """Resolve ``(params, apply_fn)`` for the requested quantization mode.

    Shared by :class:`~ocrfa_tpu.detector.CraftDetector` and
    :class:`~ocrfa_tpu.serving.ServingPipeline` so the mode validation and
    calibration flow cannot drift between them.
    """
    from ocrfa_tpu.models.craft import craft_apply

    if not quantized:
        return params, craft_apply
    if quantized != "static":
        raise ValueError(f"unknown quantized mode {quantized!r}")
    if not calibration_batches:
        raise ValueError("quantized='static' needs calibration batches")
    amax = calibrate_craft(params, calibration_batches)
    return quantize_craft_static(params, amax), craft_apply_int8_static


def craft_apply_int8_static(qparams, x):
    """Static-int8 CRAFT forward; same signature/returns as
    ``craft.craft_apply`` (heatmaps in f32)."""

    def cbr(v, parent, cn, bn, tag, padding, act):
        y = _conv_int8_static(v, parent[cn], padding=padding)
        return relu(y) if act else y

    def cv(v, parent, cn, tag, padding, dilation, act):
        y = _conv_int8_static(v, parent[cn], padding=padding,
                              dilation=dilation)
        return relu(y) if act else y

    y, feature = _walk_craft(qparams, x, cbr, cv)
    return y.astype(jnp.float32), feature

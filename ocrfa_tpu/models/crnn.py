"""CRNN text-line recognizers (gen1 ResNet-CRNN, gen2 VGG-CRNN).

TPU-native re-design of the reference recognizers
(``/root/reference/src/ocrfa/modules/blocks.py:105-447``):

* gen1 ``Model``: custom ResNet [1,2,5,3] feature extractor with asymmetric
  strides -> mean-pool over height -> BiLSTM x2 -> linear CTC head
  (blocks.py:422-447).  This is the Farsi production recognizer
  (``arabic_g1``: input_channel=1, output_channel=512, hidden=512).
* gen2 ``VGGModel``: 7-conv VGG extractor -> BiLSTM x2 -> linear
  (blocks.py:394-419).  The reference's gen2 crashes at construction
  (undefined ``self.output_channel``, blocks.py:407); this rebuild wires the
  channel count correctly.

All activations are NHWC; input line crops are ``(N, 64, W, 1)`` float32 in
[-1, 1].  Time dimension after the extractor is ``W/4 + 1``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.layers import (
    batch_norm,
    conv2d,
    init_bn,
    init_conv,
    init_linear,
    init_lstm,
    linear,
    max_pool,
    relu,
)
from ocrfa_tpu.ops.lstm import bilstm

# ---------------------------------------------------------------------------
# gen1 ResNet feature extractor (blocks.py:195-391)


def _basic_block(p, x, train: bool = False):
    """BlockB: two 3x3 conv-BN with identity (or 1x1-projected) residual."""
    residual = x
    if "downsample" in p:
        residual = batch_norm(conv2d(x, p["downsample"]["conv"]["w"]),
                              p["downsample"]["bn"], train)
    y = relu(batch_norm(conv2d(x, p["conv1"]["w"], padding=1), p["bn1"], train))
    y = batch_norm(conv2d(y, p["conv2"]["w"], padding=1), p["bn2"], train)
    return relu(y + residual)


def _layer(p_blocks, x, train: bool = False):
    for p in p_blocks:
        x = _basic_block(p, x, train)
    return x


def resnet_features(p, x, train: bool = False, w8: bool = False):
    """gen1 extractor: (N, 64, W, 1) -> (N, 3, W/4+1, C_out).

    ``w8=True`` is the serving FLOP-cut variant (``gen1w8``): the /8-stage
    max pool strides the width axis too, so layer3/layer4 — 78% of the
    tower's FLOPs — run at W/8 instead of W/4 (T = W/8+1).  The parameter
    tree is IDENTICAL to stock gen1; only the pool stride differs, so
    warm starts/exports move freely between the variants.
    """
    x = relu(batch_norm(conv2d(x, p["conv0_1"]["w"], padding=1), p["bn0_1"], train))
    x = relu(batch_norm(conv2d(x, p["conv0_2"]["w"], padding=1), p["bn0_2"], train))

    x = max_pool(x, 2, 2)
    x = _layer(p["layer1"], x, train)
    x = relu(batch_norm(conv2d(x, p["conv1"]["w"], padding=1), p["bn1"], train))

    x = max_pool(x, 2, 2)
    x = _layer(p["layer2"], x, train)
    x = relu(batch_norm(conv2d(x, p["conv2"]["w"], padding=1), p["bn2"], train))

    x = max_pool(x, 2, stride=(2, 2 if w8 else 1), padding=(0, 1))
    x = _layer(p["layer3"], x, train)
    x = relu(batch_norm(conv2d(x, p["conv3"]["w"], padding=1), p["bn3"], train))

    x = _layer(p["layer4"], x, train)
    x = relu(batch_norm(conv2d(x, p["conv4_1"]["w"], stride=(2, 1), padding=(0, 1)),
                        p["bn4_1"], train))
    x = relu(batch_norm(conv2d(x, p["conv4_2"]["w"], stride=1, padding=0),
                        p["bn4_2"], train))
    return x


# ---------------------------------------------------------------------------
# gen2 VGG feature extractor (blocks.py:105-183)


def vgg_features(p, x, train: bool = False):
    """gen2 extractor: (N, 64, W, 1) -> (N, 3, W/4-1, C_out)."""
    x = relu(conv2d(x, p["conv0"]["w"], p["conv0"]["b"], padding=1))
    x = max_pool(x, 2, 2)
    x = relu(conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1))
    x = max_pool(x, 2, 2)
    x = relu(conv2d(x, p["conv2"]["w"], p["conv2"]["b"], padding=1))
    x = relu(conv2d(x, p["conv3"]["w"], p["conv3"]["b"], padding=1))
    x = max_pool(x, (2, 1), (2, 1))
    x = relu(batch_norm(conv2d(x, p["conv4"]["w"], padding=1), p["bn4"], train))
    x = relu(batch_norm(conv2d(x, p["conv5"]["w"], padding=1), p["bn5"], train))
    x = max_pool(x, (2, 1), (2, 1))
    x = relu(conv2d(x, p["conv6"]["w"], p["conv6"]["b"], padding=0))
    return x


# ---------------------------------------------------------------------------
# Full models


def crnn_apply(params, x, variant: str = "gen1", train: bool = False):
    """Line crops (N, H, W, 1) -> CTC logits (N, T, num_class).

    Variants: ``gen1`` (reference-parity ResNet extractor), ``gen1w8``
    (same params, extra width stride — the reduced-FLOP serving tower),
    ``gen2`` (VGG extractor).
    """
    if variant in ("gen1", "gen1w8"):
        feats = resnet_features(params["feat"], x, train, w8=variant == "gen1w8")
    else:
        feats = vgg_features(params["feat"], x, train)
    # torch: permute NCHW->(N,W,C,H), AdaptiveAvgPool2d((None,1)) == mean
    # over H (blocks.py:440-446); NHWC: mean over axis 1.
    seq = jnp.mean(feats, axis=1)  # (N, T, C)
    seq = bilstm(seq, params["seq0"])
    seq = bilstm(seq, params["seq1"])
    return linear(seq, params["pred"]["w"], params["pred"]["b"])


def sequence_length(width: int, variant: str = "gen1") -> int:
    """Feature-sequence length for an input crop width."""
    if variant == "gen1":
        return width // 4 + 1
    if variant == "gen1w8":
        return width // 8 + 1
    return width // 4 - 1


# ---------------------------------------------------------------------------
# Initialisation


def _init_block(rng, cin, cout, downsample: bool):
    keys = jax.random.split(rng, 3)
    p = {
        "conv1": init_conv(keys[0], 3, 3, cin, cout),
        "bn1": init_bn(cout),
        "conv2": init_conv(keys[1], 3, 3, cout, cout),
        "bn2": init_bn(cout),
    }
    if downsample:
        p["downsample"] = {"conv": init_conv(keys[2], 1, 1, cin, cout), "bn": init_bn(cout)}
    return p


def init_crnn_gen1(rng, num_class: int, input_channel: int = 1,
                   output_channel: int = 512, hidden_size: int = 512,
                   late_channel: int = None):
    """Random gen1 parameters (layers [1, 2, 5, 3], blocks.py:189).

    ``late_channel`` thins ONLY layer3/layer4 (78% of tower FLOPs,
    CLAUDE.md) while layer1/2 keep the stock widths — the serving FLOP-cut
    axis that preserves the CTC sequence resolution (T = W/4+1), unlike
    ``gen1w8``'s width stride.  ``late_channel=384`` ≈ 0.66x tower FLOPs.
    The apply path is shape-agnostic, so every variant="gen1" consumer
    (bf16, dynamic/static int8, converters) runs a thin tower unchanged.
    """
    oc = [output_channel // 4, output_channel // 2,
          late_channel or output_channel, late_channel or output_channel]
    inplanes = output_channel // 8
    keys = iter(jax.random.split(rng, 64))

    def make_layer(cin, cout, blocks):
        ps = [_init_block(next(keys), cin, cout, downsample=cin != cout)]
        ps += [_init_block(next(keys), cout, cout, downsample=False) for _ in range(blocks - 1)]
        return ps

    feat = {
        "conv0_1": init_conv(next(keys), 3, 3, input_channel, output_channel // 16),
        "bn0_1": init_bn(output_channel // 16),
        "conv0_2": init_conv(next(keys), 3, 3, output_channel // 16, inplanes),
        "bn0_2": init_bn(inplanes),
        "layer1": make_layer(inplanes, oc[0], 1),
        "conv1": init_conv(next(keys), 3, 3, oc[0], oc[0]),
        "bn1": init_bn(oc[0]),
        "layer2": make_layer(oc[0], oc[1], 2),
        "conv2": init_conv(next(keys), 3, 3, oc[1], oc[1]),
        "bn2": init_bn(oc[1]),
        "layer3": make_layer(oc[1], oc[2], 5),
        "conv3": init_conv(next(keys), 3, 3, oc[2], oc[2]),
        "bn3": init_bn(oc[2]),
        "layer4": make_layer(oc[2], oc[3], 3),
        "conv4_1": init_conv(next(keys), 2, 2, oc[3], oc[3]),
        "bn4_1": init_bn(oc[3]),
        "conv4_2": init_conv(next(keys), 2, 2, oc[3], oc[3]),
        "bn4_2": init_bn(oc[3]),
    }
    return {
        "feat": feat,
        "seq0": {**init_lstm(next(keys), oc[3], hidden_size),
                 **_lstm_linear(next(keys), hidden_size)},
        "seq1": {**init_lstm(next(keys), hidden_size, hidden_size),
                 **_lstm_linear(next(keys), hidden_size)},
        "pred": init_linear(next(keys), hidden_size, num_class),
    }


def _lstm_linear(rng, hidden):
    p = init_linear(rng, 2 * hidden, hidden)
    return {"linear_w": p["w"], "linear_b": p["b"]}


def init_crnn_gen2(rng, num_class: int, input_channel: int = 1,
                   output_channel: int = 256, hidden_size: int = 256):
    """Random gen2 parameters (VGG extractor, blocks.py:105-183)."""
    oc = [output_channel // 8, output_channel // 4, output_channel // 2, output_channel]
    keys = iter(jax.random.split(rng, 16))
    feat = {
        "conv0": init_conv(next(keys), 3, 3, input_channel, oc[0], bias=True),
        "conv1": init_conv(next(keys), 3, 3, oc[0], oc[1], bias=True),
        "conv2": init_conv(next(keys), 3, 3, oc[1], oc[2], bias=True),
        "conv3": init_conv(next(keys), 3, 3, oc[2], oc[2], bias=True),
        "conv4": init_conv(next(keys), 3, 3, oc[2], oc[3]),
        "bn4": init_bn(oc[3]),
        "conv5": init_conv(next(keys), 3, 3, oc[3], oc[3]),
        "bn5": init_bn(oc[3]),
        "conv6": init_conv(next(keys), 2, 2, oc[3], oc[3], bias=True),
    }
    return {
        "feat": feat,
        "seq0": {**init_lstm(next(keys), output_channel, hidden_size),
                 **_lstm_linear(next(keys), hidden_size)},
        "seq1": {**init_lstm(next(keys), hidden_size, hidden_size),
                 **_lstm_linear(next(keys), hidden_size)},
        "pred": init_linear(next(keys), hidden_size, num_class),
    }

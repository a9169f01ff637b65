"""DBNet text detector: (deformable) ResNet + SegDetector FPN.

TPU-native rebuild of the reference DBNet model graph
(``/root/reference/src/ocrfa/DBNet/``):

* backbone: ResNet-18 (BasicBlock) / ResNet-50 (Bottleneck) with modulated
  deformable conv on conv2 of every block in stages 2-4
  (``backbones/resnet.py:37-254``; shipped configs use
  ``deformable_resnet18/50`` with ``modulated=True``).
* decoder: ``SegDetector`` FPN — 1x1 laterals, nearest x2 top-down adds,
  per-level heads to 1/4 res, concat fuse, ``binarize`` head
  (conv-BN-ReLU-deconv-BN-ReLU-deconv-sigmoid) to full res
  (``decoders/seg_detector.py:7-152``).
* optional ASF decoder ``SegSpatialScaleDetector`` with
  ``ScaleFeatureSelection`` attention (``decoders/seg_detector_asf.py``,
  ``decoders/feature_attention.py``).
* training heads: adaptive ``thresh`` branch + differentiable binarization
  ``1/(1+exp(-k(binary-thresh)))`` with k=50 (seg_detector.py:151-152);
  losses live in :mod:`ocrfa_tpu.models.losses`.

All NHWC; deformable conv via :mod:`ocrfa_tpu.ops.deform_conv`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.layers import batch_norm, conv2d, max_pool, relu, resize_bilinear, resize_nearest
from ocrfa_tpu.ops.deform_conv import (
    modulated_deform_conv,
    modulated_deform_conv_bounded,
)

# ---------------------------------------------------------------------------
# backbone


def _dcn_conv2(p, x, stride: int = 1, dcn_impl: str = "gather",
               offset_sink: list | None = None):
    """conv2_offset -> split offsets/mask -> DCNv2 (backbones/resnet.py:92-96).

    NB: the reference's Bottleneck passes a stride to conv2 but not to
    conv2_offset (backbones/resnet.py:139-145), so its offset map has the
    wrong spatial size whenever stride != 1 — latent, since the shipped
    ``dbnet18`` path only uses BasicBlock (stride lives on conv1 there) and
    ``dbnet50`` is not routable (SURVEY.md defect #7).  We compute offsets
    at the output resolution (the mmcv-correct semantics).

    ``dcn_impl``: ``"gather"`` (exact, arbitrary offsets) or
    ``"bounded<R>"`` (offsets clamped to ±R px, dense-shift formulation —
    1.4-2.6x faster per stage on TPU, scripts/probe_dcn.py).
    """
    om = conv2d(x, p["conv2_offset"]["w"], p["conv2_offset"]["b"],
                stride=stride, padding=1)
    offset = om[..., :18]
    mask = jax.nn.sigmoid(om[..., 18:])
    if offset_sink is not None:
        offset_sink.append(offset)
    if dcn_impl.startswith("bounded"):
        return modulated_deform_conv_bounded(
            x, offset, mask, p["conv2"]["w"], stride=stride, padding=1,
            radius=int(dcn_impl[len("bounded"):] or 2))
    return modulated_deform_conv(x, offset, mask, p["conv2"]["w"],
                                 stride=stride, padding=1)


def _basic_block(p, x, stride: int = 1, train: bool = False,
                 dcn_impl: str = "gather", offset_sink: list | None = None):
    residual = x
    out = relu(batch_norm(conv2d(x, p["conv1"]["w"], stride=stride, padding=1),
                          p["bn1"], train))
    if "conv2_offset" in p:
        out = _dcn_conv2(p, out, dcn_impl=dcn_impl, offset_sink=offset_sink)
    else:
        out = conv2d(out, p["conv2"]["w"], padding=1)
    out = batch_norm(out, p["bn2"], train)
    if "downsample" in p:
        residual = batch_norm(
            conv2d(x, p["downsample"]["conv"]["w"], stride=stride),
            p["downsample"]["bn"], train
        )
    return relu(out + residual)


def _bottleneck(p, x, stride: int = 1, train: bool = False,
                dcn_impl: str = "gather", offset_sink: list | None = None):
    residual = x
    out = relu(batch_norm(conv2d(x, p["conv1"]["w"]), p["bn1"], train))
    if "conv2_offset" in p:
        out = _dcn_conv2(p, out, stride=stride, dcn_impl=dcn_impl,
                         offset_sink=offset_sink)
    else:
        out = conv2d(out, p["conv2"]["w"], stride=stride, padding=1)
    out = relu(batch_norm(out, p["bn2"], train))
    out = batch_norm(conv2d(out, p["conv3"]["w"]), p["bn3"], train)
    if "downsample" in p:
        residual = batch_norm(
            conv2d(x, p["downsample"]["conv"]["w"], stride=stride),
            p["downsample"]["bn"], train
        )
    return relu(out + residual)


def resnet_backbone(p, x, block: str = "basic", train: bool = False,
                    dcn_impl: str = "gather",
                    offset_sink: list | None = None):
    """(N, H, W, 3) -> pyramid (c2 /4, c3 /8, c4 /16, c5 /32)."""
    block_fn = _basic_block if block == "basic" else _bottleneck
    x = relu(batch_norm(conv2d(x, p["conv1"]["w"], stride=2, padding=3),
                        p["bn1"], train))
    x = max_pool(x, 3, 2, padding=1)

    feats = []
    for name in ("layer1", "layer2", "layer3", "layer4"):
        stride = 1 if name == "layer1" else 2
        blocks = p[name]
        x = block_fn(blocks[0], x, stride=stride, train=train,
                     dcn_impl=dcn_impl, offset_sink=offset_sink)
        for bp in blocks[1:]:
            x = block_fn(bp, x, train=train, dcn_impl=dcn_impl,
                         offset_sink=offset_sink)
        feats.append(x)
    return tuple(feats)


def dcn_offset_maps(p, x, block: str = "basic"):
    """Diagnostic: walk the ResNet backbone collecting every DCN block's
    raw offset map (pre-clamp), keyed ``layer<i>.<j>``.

    Used to decide whether ``dcn_impl="bounded<R>"`` is safe for a given
    set of trained weights: if the offset distribution fits ±R px, the
    bounded formulation is exact (ops/deform_conv.py).  Mirrors the block
    structure exactly: BasicBlock computes offsets on post-conv1 features
    at the block's output stride; Bottleneck computes them on the 1x1
    conv1 features with the stride on the offset conv itself (the
    mmcv-correct placement, see ``_dcn_conv2``).
    """
    block_fn = _basic_block if block == "basic" else _bottleneck
    x = relu(batch_norm(conv2d(x, p["conv1"]["w"], stride=2, padding=3),
                        p["bn1"], False))
    x = max_pool(x, 3, 2, padding=1)
    offsets = {}
    for name in ("layer1", "layer2", "layer3", "layer4"):
        stride = 1 if name == "layer1" else 2
        for j, bp in enumerate(p[name]):
            bstride = stride if j == 0 else 1
            if "conv2_offset" in bp:
                # offsets are computed on the block's post-conv1 features
                if block == "basic":
                    pre = relu(batch_norm(
                        conv2d(x, bp["conv1"]["w"], stride=bstride,
                               padding=1), bp["bn1"], False))
                    om = conv2d(pre, bp["conv2_offset"]["w"],
                                bp["conv2_offset"]["b"], padding=1)
                else:
                    pre = relu(batch_norm(conv2d(x, bp["conv1"]["w"]),
                                          bp["bn1"], False))
                    om = conv2d(pre, bp["conv2_offset"]["w"],
                                bp["conv2_offset"]["b"], stride=bstride,
                                padding=1)
                offsets[f"{name}.{j}"] = om[..., :18]
            x = block_fn(bp, x, stride=bstride)
    return offsets


# ---------------------------------------------------------------------------
# SegDetector decoder


def _deconv2x2(x, w, b=None):
    """torch ConvTranspose2d(k=2, s=2): exact pixel-doubling via einsum.

    ``w``: torch layout (Cin, Cout, 2, 2).
    """
    n, h, width, cin = x.shape
    y = jnp.einsum("nhwc,cdij->nhwijd", x, w,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(n, h, width, 2, 2, -1).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(n, h * 2, width * 2, -1)
    if b is not None:
        y = y + b
    return y


def _binarize_head(p, fuse, train: bool = False):
    y = relu(batch_norm(conv2d(fuse, p["conv"]["w"], padding=1), p["bn1"], train))
    y = relu(batch_norm(_deconv2x2(y, p["deconv1"]["w"], p["deconv1"]["b"]),
                        p["bn2"], train))
    y = _deconv2x2(y, p["deconv2"]["w"], p["deconv2"]["b"])
    return jax.nn.sigmoid(y)


def _fpn_fuse(p, features):
    c2, c3, c4, c5 = features
    in5 = conv2d(c5, p["in5"]["w"])
    in4 = conv2d(c4, p["in4"]["w"])
    in3 = conv2d(c3, p["in3"]["w"])
    in2 = conv2d(c2, p["in2"]["w"])

    def up2(x):
        return resize_nearest(x, (x.shape[1] * 2, x.shape[2] * 2))

    out4 = up2(in5) + in4
    out3 = up2(out4) + in3
    out2 = up2(out3) + in2

    def upn(x, n):
        return resize_nearest(x, (x.shape[1] * n, x.shape[2] * n))

    p5 = upn(conv2d(in5, p["out5"]["w"], padding=1), 8)
    p4 = upn(conv2d(out4, p["out4"]["w"], padding=1), 4)
    p3 = upn(conv2d(out3, p["out3"]["w"], padding=1), 2)
    p2 = conv2d(out2, p["out2"]["w"], padding=1)
    return jnp.concatenate([p5, p4, p3, p2], axis=-1), (p5, p4, p3, p2)


def seg_detector(p, features, training: bool = False, k: float = 50.0,
                 bn_train: bool = False):
    """FPN decode -> probability map (N, H, W, 1) at input resolution.

    With ``training=True`` also returns the adaptive thresh map and the
    differentiable binarization (seg_detector.py:117-152).  ``bn_train``
    switches batch norms to batch statistics (training from scratch).
    """
    fuse, _ = _fpn_fuse(p, features)
    binary = _binarize_head(p["binarize"], fuse, bn_train)
    if not training:
        return binary
    result = {"binary": binary}
    if "thresh" in p:
        thresh = _binarize_head(p["thresh"], fuse, bn_train)
        result["thresh"] = thresh
        result["thresh_binary"] = step_function(binary, thresh, k)
    return result


def seg_detector_asf(p, features, training: bool = False, k: float = 50.0,
                     attention_type: str = "scale_spatial"):
    """ASF variant: attention-reweighted per-level features before the
    binarize head (seg_detector_asf.py:9-163)."""
    fuse, levels = _fpn_fuse(p, features)
    fuse = scale_feature_selection(p["concat_attention"], fuse, levels,
                                   attention_type=attention_type)
    binary = _binarize_head(p["binarize"], fuse)
    if not training:
        return binary
    result = {"binary": binary}
    if "thresh" in p:
        thresh = _binarize_head(p["thresh"], fuse)
        result["thresh"] = thresh
        result["thresh_binary"] = step_function(binary, thresh, k)
    return result


def step_function(x, y, k: float = 50.0):
    """Differentiable binarization (seg_detector.py:151-152)."""
    return 1.0 / (1.0 + jnp.exp(-k * (x - y)))


# ---------------------------------------------------------------------------
# ASF attention (feature_attention.py)


def scale_spatial_attention(p, x):
    """ScaleSpatialAttention (feature_attention.py:80-111)."""
    g = jnp.mean(x, axis=-1, keepdims=True)
    g = relu(conv2d(g, p["spatial1"]["w"], padding=1))
    g = jax.nn.sigmoid(conv2d(g, p["spatial2"]["w"]))
    g = g + x
    return jax.nn.sigmoid(conv2d(g, p["attention"]["w"]))


def scale_channel_spatial_attention(p, x):
    """ScaleChannelSpatialAttention (feature_attention.py:34-78)."""
    g = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = relu(conv2d(g, p["channel1"]["w"]))
    g = conv2d(g, p["channel2"]["w"])
    g = jax.nn.sigmoid(g) + x
    m = jnp.mean(g, axis=-1, keepdims=True)
    s = relu(conv2d(m, p["spatial1"]["w"], padding=1))
    s = jax.nn.sigmoid(conv2d(s, p["spatial2"]["w"]))
    g = s + g
    return jax.nn.sigmoid(conv2d(g, p["attention"]["w"]))


def scale_channel_attention(p, x):
    """ScaleChannelAttention (feature_attention.py:5-32)."""
    g = jnp.mean(x, axis=(1, 2), keepdims=True)
    g = relu(batch_norm(conv2d(g, p["fc1"]["w"]), p["bn"]))
    g = conv2d(g, p["fc2"]["w"])
    return jax.nn.softmax(g, axis=-1)


def scale_feature_selection(p, concat_x, features_list,
                            attention_type: str = "scale_spatial"):
    """ScaleFeatureSelection (feature_attention.py:113-145)."""
    x = conv2d(concat_x, p["conv"]["w"], p["conv"]["b"], padding=1)
    if attention_type == "scale_spatial":
        score = scale_spatial_attention(p["attn"], x)
    elif attention_type == "scale_channel_spatial":
        score = scale_channel_spatial_attention(p["attn"], x)
    else:
        score = scale_channel_attention(p["attn"], x)
        score = resize_bilinear(score, features_list[0].shape[1:3])
    parts = [score[..., i:i + 1] * f for i, f in enumerate(features_list)]
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# full model


ARCHS = {
    "resnet18": {"block": "basic", "layers": (2, 2, 2, 2),
                 "channels": (64, 128, 256, 512), "expansion": 1},
    "resnet50": {"block": "bottleneck", "layers": (3, 4, 6, 3),
                 "channels": (64, 128, 256, 512), "expansion": 4},
}


def dbnet_apply(params, x, backbone: str = "resnet18", training: bool = False,
                bn_train: bool = False, decoder: str = "fpn",
                attention_type: str = "scale_spatial",
                dcn_impl: str = "gather",
                offset_sink: list | None = None):
    """BGR-mean-normalised page (N, H, W, 3) -> probability heatmap.

    ``backbone``: resnet18/resnet50 (resnet.py) or mobilenetv3_large/
    mobilenetv3_small (backbones/mobilenetv3.py).  ``decoder="asf"``
    selects the attention decoder (seg_detector_asf.py).

    ``dcn_impl="bounded2"/"bounded1"`` swaps the deformable convs to the
    clamped dense-shift formulation (ops/deform_conv.py) — 1.4-2.6x
    faster per DCN stage on TPU at the cost of clamping offsets to ±R px
    (exact whenever the trained offsets fit the radius)."""
    if backbone.startswith("mobilenetv3"):
        from ocrfa_tpu.models.mobilenetv3 import mobilenetv3_backbone

        features = mobilenetv3_backbone(params["backbone"], x,
                                        mode=backbone.split("_", 1)[1])
    else:
        arch = ARCHS[backbone]
        features = resnet_backbone(params["backbone"], x, block=arch["block"],
                                   train=bn_train, dcn_impl=dcn_impl,
                                   offset_sink=offset_sink)
    if decoder == "asf":
        return seg_detector_asf(params["decoder"], features, training=training,
                                attention_type=attention_type)
    return seg_detector(params["decoder"], features, training=training,
                        bn_train=bn_train)


# ---------------------------------------------------------------------------
# init (random params, production shapes)


def _init_block(rng, cin, cout, block, stride, dcn, expansion=1):
    from ocrfa_tpu.models.layers import init_bn, init_conv

    keys = iter(jax.random.split(rng, 8))
    if block == "basic":
        p = {
            "conv1": init_conv(next(keys), 3, 3, cin, cout),
            "bn1": init_bn(cout),
            "bn2": init_bn(cout),
        }
        if dcn:
            p["conv2_offset"] = init_conv(next(keys), 3, 3, cout, 27, bias=True)
            p["conv2"] = init_conv(next(keys), 3, 3, cout, cout)
        else:
            p["conv2"] = init_conv(next(keys), 3, 3, cout, cout)
        out_ch = cout
    else:
        p = {
            "conv1": init_conv(next(keys), 1, 1, cin, cout),
            "bn1": init_bn(cout),
            "bn2": init_bn(cout),
            "conv3": init_conv(next(keys), 1, 1, cout, cout * expansion),
            "bn3": init_bn(cout * expansion),
        }
        if dcn:
            p["conv2_offset"] = init_conv(next(keys), 3, 3, cout, 27, bias=True)
            p["conv2"] = init_conv(next(keys), 3, 3, cout, cout)
        else:
            p["conv2"] = init_conv(next(keys), 3, 3, cout, cout)
        out_ch = cout * expansion
    if stride != 1 or cin != out_ch:
        p["downsample"] = {
            "conv": init_conv(next(keys), 1, 1, cin, out_ch),
            "bn": init_bn(out_ch),
        }
    return p


def init_dbnet(rng, backbone: str = "resnet18", adaptive: bool = True,
               inner_channels: int = 256, decoder: str = "fpn",
               attention_type: str = "scale_spatial"):
    from ocrfa_tpu.models.layers import init_bn, init_conv

    if backbone.startswith("mobilenetv3"):
        from ocrfa_tpu.models.mobilenetv3 import (
            PYRAMID_CHANNELS_BY_MODE,
            init_mobilenetv3,
        )

        mode = backbone.split("_", 1)[1]
        rng, bb_rng = jax.random.split(rng)
        bb = init_mobilenetv3(bb_rng, mode=mode)
        in_channels = list(PYRAMID_CHANNELS_BY_MODE[mode])
        keys = iter(jax.random.split(rng, 16))
        ic = inner_channels
    else:
        arch = ARCHS[backbone]
        exp = arch["expansion"]
        keys = iter(jax.random.split(rng, 80))

        bb = {"conv1": init_conv(next(keys), 7, 7, 3, 64), "bn1": init_bn(64)}
        cin = 64
        for li, (name, cout, nblocks) in enumerate(
            zip(("layer1", "layer2", "layer3", "layer4"), arch["channels"], arch["layers"])
        ):
            stride = 1 if li == 0 else 2
            dcn = li >= 1  # deformable on stages 2-4 (resnet.py:269-282)
            blocks = [_init_block(next(keys), cin, cout, arch["block"], stride, dcn, exp)]
            cin = cout * exp
            blocks += [
                _init_block(next(keys), cin, cout, arch["block"], 1, dcn, exp)
                for _ in range(nblocks - 1)
            ]
            bb[name] = blocks

        in_channels = [c * exp for c in arch["channels"]]
        ic = inner_channels

    def head(rng):
        ks = iter(jax.random.split(rng, 6))
        return {
            "conv": init_conv(next(ks), 3, 3, ic, ic // 4),
            "bn1": init_bn(ic // 4),
            # deconv weights in torch layout (Cin, Cout, 2, 2)
            "deconv1": {
                "w": 0.05 * jax.random.normal(next(ks), (ic // 4, ic // 4, 2, 2)),
                "b": jnp.zeros((ic // 4,)),
            },
            "bn2": init_bn(ic // 4),
            "deconv2": {
                "w": 0.05 * jax.random.normal(next(ks), (ic // 4, 1, 2, 2)),
                "b": jnp.zeros((1,)),
            },
        }

    decoder_p = {
        "in5": init_conv(next(keys), 1, 1, in_channels[3], ic),
        "in4": init_conv(next(keys), 1, 1, in_channels[2], ic),
        "in3": init_conv(next(keys), 1, 1, in_channels[1], ic),
        "in2": init_conv(next(keys), 1, 1, in_channels[0], ic),
        "out5": init_conv(next(keys), 3, 3, ic, ic // 4),
        "out4": init_conv(next(keys), 3, 3, ic, ic // 4),
        "out3": init_conv(next(keys), 3, 3, ic, ic // 4),
        "out2": init_conv(next(keys), 3, 3, ic, ic // 4),
        "binarize": head(next(keys)),
    }
    if adaptive:
        decoder_p["thresh"] = head(next(keys))
    if decoder == "asf":
        decoder_p["concat_attention"] = init_scale_feature_selection(
            next(keys), ic, ic // 4, attention_type=attention_type)
    return {"backbone": bb, "decoder": decoder_p}


def init_scale_feature_selection(rng, in_ch: int, inter_ch: int,
                                 out_features_num: int = 4,
                                 attention_type: str = "scale_spatial"):
    """Random params for ScaleFeatureSelection (feature_attention.py:113-145)."""
    from ocrfa_tpu.models.layers import init_bn, init_conv

    keys = iter(jax.random.split(rng, 8))
    p = {"conv": init_conv(next(keys), 3, 3, in_ch, inter_ch, bias=True)}
    if attention_type == "scale_spatial":
        p["attn"] = {
            "spatial1": init_conv(next(keys), 3, 3, 1, 1),
            "spatial2": init_conv(next(keys), 1, 1, 1, 1),
            "attention": init_conv(next(keys), 1, 1, inter_ch, out_features_num),
        }
    elif attention_type == "scale_channel_spatial":
        p["attn"] = {
            "channel1": init_conv(next(keys), 1, 1, inter_ch, inter_ch // 4),
            "channel2": init_conv(next(keys), 1, 1, inter_ch // 4, inter_ch),
            "spatial1": init_conv(next(keys), 3, 3, 1, 1),
            "spatial2": init_conv(next(keys), 1, 1, 1, 1),
            "attention": init_conv(next(keys), 1, 1, inter_ch, out_features_num),
        }
    else:  # scale_channel
        p["attn"] = {
            "fc1": init_conv(next(keys), 1, 1, inter_ch, inter_ch // 2),
            "bn": init_bn(inter_ch // 2),
            "fc2": init_conv(next(keys), 1, 1, inter_ch // 2, out_features_num),
        }
    return p

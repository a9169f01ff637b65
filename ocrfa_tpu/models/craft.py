"""CRAFT text detector: VGG16-BN U-Net producing region/affinity heatmaps.

TPU-native rebuild of the reference ``OCRFA`` module
(``/root/reference/src/ocrfa/utils.py:48-98``) over its ``Vgg16BN`` base
(``modules/blocks.py:24-82``).  Notable reference quirks preserved exactly:

* The VGG slices are cut mid-block (blocks.py:42-49) and vgg16_bn's final
  conv block (indices 39-43) is never used.  Each slice formally ends at a
  BatchNorm, but because the next slice begins with an ``inplace=True`` ReLU
  that mutates the returned tensor, the /2, /4 and /8 taps the U-net
  actually concatenates are *post*-ReLU; only the /16 tap (followed by
  slice5's MaxPool, not a ReLU) stays pre-ReLU.
* slice5 is maxpool(3,1,1) + dilated 3x3 (pad=6, dil=6) + 1x1, no ReLU.
* Up-path: bilinear resize (align_corners=False) to the skip's spatial
  size, concat, DoubleConv(1x1 -> BN -> ReLU -> 3x3 -> BN -> ReLU).

Input: NHWC float32 ImageNet-normalised page canvas (H, W multiples of 32).
Output: ``(N, H/2, W/2, 2)`` heatmaps (region, affinity) + 32-ch feature.
"""

from __future__ import annotations

import jax.numpy as jnp

from ocrfa_tpu.models.layers import batch_norm, conv2d, max_pool, relu, resize_bilinear


def _cbr(p_conv, p_bn, x, act=True, train=False):
    x = batch_norm(conv2d(x, p_conv["w"], p_conv["b"], padding=1), p_bn,
                   train=train)
    return relu(x) if act else x


def vgg16_bn_features(p, x, train=False):
    """Reference-sliced VGG16-BN: returns (fc7, s16, s8, s4, s2) taps."""
    t = train
    x = _cbr(p["conv0"], p["bn0"], x, train=t)
    x = _cbr(p["conv1"], p["bn1"], x, train=t)
    x = max_pool(x, 2, 2)
    x = _cbr(p["conv2"], p["bn2"], x, train=t)
    s2 = _cbr(p["conv3"], p["bn3"], x, train=t)            # 128ch, /2 (post-relu tap)

    x = max_pool(s2, 2, 2)
    x = _cbr(p["conv4"], p["bn4"], x, train=t)
    s4 = _cbr(p["conv5"], p["bn5"], x, train=t)            # 256ch, /4 (post-relu tap)

    x = _cbr(p["conv6"], p["bn6"], s4, train=t)
    x = max_pool(x, 2, 2)
    x = _cbr(p["conv7"], p["bn7"], x, train=t)
    s8 = _cbr(p["conv8"], p["bn8"], x, train=t)            # 512ch, /8 (post-relu tap)

    x = _cbr(p["conv9"], p["bn9"], s8, train=t)
    x = max_pool(x, 2, 2)
    x = _cbr(p["conv10"], p["bn10"], x, train=t)
    s16 = _cbr(p["conv11"], p["bn11"], x, act=False, train=t)  # 512ch, /16 (pre-relu tap)

    x = max_pool(s16, (3, 3), (1, 1), padding=(1, 1))
    x = conv2d(x, p["fc6"]["w"], p["fc6"]["b"], padding=6, dilation=6)
    fc7 = conv2d(x, p["fc7"]["w"], p["fc7"]["b"])          # 1024ch, /16

    return fc7, s16, s8, s4, s2


def _double_conv(p, x, train=False):
    x = relu(batch_norm(conv2d(x, p["conv1"]["w"], p["conv1"]["b"]), p["bn1"],
                        train=train))
    return relu(batch_norm(conv2d(x, p["conv2"]["w"], p["conv2"]["b"], padding=1),
                           p["bn2"], train=train))


def craft_apply(params, x, train=False):
    """Page canvas (N, H, W, 3) -> ((N, H/2, W/2, 2) heatmaps, feature).

    ``train=True`` runs the batch norms on batch statistics (the trainer
    path; the reference has no CRAFT trainer at all — SURVEY.md §3.5)."""
    fc7, s16, s8, s4, s2 = vgg16_bn_features(params["vgg"], x, train=train)

    y = jnp.concatenate([fc7, s16], axis=-1)
    y = _double_conv(params["upconv1"], y, train=train)

    y = resize_bilinear(y, s8.shape[1:3])
    y = jnp.concatenate([y, s8], axis=-1)
    y = _double_conv(params["upconv2"], y, train=train)

    y = resize_bilinear(y, s4.shape[1:3])
    y = jnp.concatenate([y, s4], axis=-1)
    y = _double_conv(params["upconv3"], y, train=train)

    y = resize_bilinear(y, s2.shape[1:3])
    y = jnp.concatenate([y, s2], axis=-1)
    feature = _double_conv(params["upconv4"], y, train=train)

    y = feature
    cls = params["conv_cls"]
    y = relu(conv2d(y, cls[0]["w"], cls[0]["b"], padding=1))
    y = relu(conv2d(y, cls[1]["w"], cls[1]["b"], padding=1))
    y = relu(conv2d(y, cls[2]["w"], cls[2]["b"], padding=1))
    y = relu(conv2d(y, cls[3]["w"], cls[3]["b"]))
    y = conv2d(y, cls[4]["w"], cls[4]["b"])

    return y, feature


def init_craft(rng, base: int = 64):
    """Random CRAFT params.  ``base=64`` is production shape; smaller bases
    scale every channel width proportionally (for dryruns/tests)."""
    import jax

    from ocrfa_tpu.models.layers import init_bn, init_conv

    b = base
    keys = iter(jax.random.split(rng, 40))
    chans = [(3, b), (b, b), (b, 2 * b), (2 * b, 2 * b), (2 * b, 4 * b),
             (4 * b, 4 * b), (4 * b, 4 * b), (4 * b, 8 * b), (8 * b, 8 * b),
             (8 * b, 8 * b), (8 * b, 8 * b), (8 * b, 8 * b)]
    vgg = {}
    for i, (cin, cout) in enumerate(chans):
        vgg[f"conv{i}"] = init_conv(next(keys), 3, 3, cin, cout, bias=True)
        vgg[f"bn{i}"] = init_bn(cout)
    vgg["fc6"] = init_conv(next(keys), 3, 3, 8 * b, 16 * b, bias=True)
    vgg["fc7"] = init_conv(next(keys), 1, 1, 16 * b, 16 * b, bias=True)

    def dc(cin, mid, cout):
        return {
            "conv1": init_conv(next(keys), 1, 1, cin + mid, mid, bias=True),
            "bn1": init_bn(mid),
            "conv2": init_conv(next(keys), 3, 3, mid, cout, bias=True),
            "bn2": init_bn(cout),
        }

    return {
        "vgg": vgg,
        "upconv1": dc(16 * b, 8 * b, 4 * b),
        "upconv2": dc(8 * b, 4 * b, 2 * b),
        "upconv3": dc(4 * b, 2 * b, b),
        "upconv4": dc(2 * b, b, b // 2),
        "conv_cls": [
            init_conv(next(keys), 3, 3, b // 2, b // 2, bias=True),
            init_conv(next(keys), 3, 3, b // 2, b // 2, bias=True),
            init_conv(next(keys), 3, 3, b // 2, b // 4, bias=True),
            init_conv(next(keys), 1, 1, b // 4, b // 4, bias=True),
            init_conv(next(keys), 1, 1, b // 4, 2, bias=True),
        ],
    }

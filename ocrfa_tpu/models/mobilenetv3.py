"""MobileNetV3 backbones for DBNet (4-level pyramid), large and small.

Rebuild of the reference's registered-but-unconfigured backbone
(``/root/reference/src/ocrfa/DBNet/backbones/mobilenetv3.py``): stem
conv-BN-hswish (s2), MobileBottleneck blocks (pw-expand -> depthwise ->
optional SE -> pw-linear, residual when stride 1 and channels match), final
1x1 conv-BN-hswish.

* **large**: 15 blocks (Table 1, mobilenetv3.py:126-143); pyramid taps at
  features 3/6/12/16 (:204-220) -> channels (24, 40, 112, 960) at strides
  /4 /8 /16 /32.
* **small**: 11 blocks (Table 2, :146-157).  The reference's small forward
  indexes past its own 16-entry feature list (``range(17)``, :210) and
  crashes; this rebuild fixes it with the analogous taps — the last block
  of each resolution plus the final 1x1 conv -> channels (16, 24, 48, 576).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.layers import batch_norm, conv2d, init_bn, init_conv, relu

# k, exp, c, se, nl, s  (Table 1 / Table 2, mobilenetv3.py:126-157)
_SETTINGS = {
    "large": [
        (3, 16, 16, False, "RE", 1),
        (3, 64, 24, False, "RE", 2),
        (3, 72, 24, False, "RE", 1),    # tap x2 (/4)
        (5, 72, 40, True, "RE", 2),
        (5, 120, 40, True, "RE", 1),
        (5, 120, 40, True, "RE", 1),    # tap x3 (/8)
        (3, 240, 80, False, "HS", 2),
        (3, 200, 80, False, "HS", 1),
        (3, 184, 80, False, "HS", 1),
        (3, 184, 80, False, "HS", 1),
        (3, 480, 112, True, "HS", 1),
        (3, 672, 112, True, "HS", 1),   # tap x4 (/16)
        (5, 672, 160, True, "HS", 2),
        (5, 960, 160, True, "HS", 1),
        (5, 960, 160, True, "HS", 1),
    ],
    "small": [
        (3, 16, 16, True, "RE", 2),     # tap x2 (/4)
        (3, 72, 24, False, "RE", 2),
        (3, 88, 24, False, "RE", 1),    # tap x3 (/8)
        (5, 96, 40, True, "HS", 2),
        (5, 240, 40, True, "HS", 1),
        (5, 240, 40, True, "HS", 1),
        (5, 120, 48, True, "HS", 1),
        (5, 144, 48, True, "HS", 1),    # tap x4 (/16)
        (5, 288, 96, True, "HS", 2),
        (5, 576, 96, True, "HS", 1),
        (5, 576, 96, True, "HS", 1),
    ],
}
# block indices (1-based over the features list) tapped before the last conv
_TAPS = {"large": {3, 6, 12}, "small": {1, 3, 8}}
_LAST_CONV = {"large": 960, "small": 576}

PYRAMID_CHANNELS = (24, 40, 112, 960)  # large (back-compat export)
PYRAMID_CHANNELS_BY_MODE = {
    "large": (24, 40, 112, 960),
    "small": (16, 24, 48, 576),
}


def hswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _depthwise(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _se(p, x):
    y = jnp.mean(x, axis=(1, 2))
    y = relu(y @ p["fc1"])
    y = hsigmoid(y @ p["fc2"])
    return x * y[:, None, None, :]


def _bottleneck(p, x, k, stride, se, nl):
    act = hswish if nl == "HS" else relu
    residual = x
    y = act(batch_norm(conv2d(x, p["pw"]["w"]), p["pw_bn"]))
    y = batch_norm(_depthwise(y, p["dw"]["w"], stride, (k - 1) // 2), p["dw_bn"])
    if se:
        y = _se(p["se"], y)
    y = act(y)
    y = batch_norm(conv2d(y, p["pw2"]["w"]), p["pw2_bn"])
    if stride == 1 and residual.shape[-1] == y.shape[-1]:
        y = y + residual
    return y


def mobilenetv3_backbone(p, x, mode: str = "large"):
    """(N, H, W, 3) -> pyramid (x2 /4, x3 /8, x4 /16, x5 /32)."""
    x = hswish(batch_norm(conv2d(x, p["stem"]["w"], stride=2, padding=1), p["stem_bn"]))
    taps = []
    for i, (blk, (k, _, _, se, nl, s)) in enumerate(
            zip(p["blocks"], _SETTINGS[mode]), start=1):
        x = _bottleneck(blk, x, k, s, se, nl)
        if i in _TAPS[mode]:
            taps.append(x)
    x = hswish(batch_norm(conv2d(x, p["last"]["w"]), p["last_bn"]))
    taps.append(x)
    return tuple(taps)


def init_mobilenetv3(rng, mode: str = "large"):
    setting = _SETTINGS[mode]
    keys = iter(jax.random.split(rng, 4 + 6 * len(setting)))
    p = {
        "stem": init_conv(next(keys), 3, 3, 3, 16),
        "stem_bn": init_bn(16),
        "blocks": [],
    }
    cin = 16
    for k, exp, c, se, nl, s in setting:
        blk = {
            "pw": init_conv(next(keys), 1, 1, cin, exp),
            "pw_bn": init_bn(exp),
            # depthwise HWIO with I=1, grouped over exp channels
            "dw": {"w": 0.1 * jax.random.normal(next(keys), (k, k, 1, exp))},
            "dw_bn": init_bn(exp),
            "pw2": init_conv(next(keys), 1, 1, exp, c),
            "pw2_bn": init_bn(c),
        }
        if se:
            r = exp // 4
            blk["se"] = {
                "fc1": 0.1 * jax.random.normal(next(keys), (exp, r)),
                "fc2": 0.1 * jax.random.normal(next(keys), (r, exp)),
            }
        p["blocks"].append(blk)
        cin = c
    p["last"] = init_conv(next(keys), 1, 1, cin, _LAST_CONV[mode])
    p["last_bn"] = init_bn(_LAST_CONV[mode])
    return p

"""Simple alternative detection decoder heads (Seg / EAST / Textsnake / MSR).

Rebuilt from the reference's DEAD module
``DBNet/decoders/simple_detection.py:9-191`` — dead because its only
dependency, ``backbones.upsample_head.SimpleUpsampleHead``, does not exist
anywhere in the reference (defect #5 in SURVEY.md): the module cannot even
be imported there.  We reconstruct the obvious intent — a light upsampling
head over a backbone feature map followed by per-task 1x1 prediction
convs — with the semantics that ARE pinned down by the surviving code:

* the head maps ``feature_channel`` -> ``feature_channel // 4`` through
  the channel ladder ``[C, C/2, C/4]`` (``simple_detection.py:19-22``);
* each pred layer is a bias-free 1x1 conv from ``C/4``
  (``simple_detection.py:24-27``);
* training losses run on RAW logits, postprocess (sigmoid / exp /
  rescale) applies to the returned prediction (``forward``,
  ``simple_detection.py:38-52``);
* per-flavor losses: weighted BCE-with-logits heatmaps everywhere;
  EAST adds an 8-channel densebox MSE x ``densebox_ratio``
  (``:97-115``), Textsnake a smooth-L1 on ``log1p`` radius x
  ``radius_ratio`` (``:135-153``), MSR a 2-channel offset MSE x
  ``offset_ratio`` (``:174-191``).

The unknowable part (the head's internals) is one inferred design,
stated here so it can be judged as such: per ladder stage a 3x3 conv +
ReLU followed by 2x nearest-neighbour upsampling — the minimal "simple
upsample head" consistent with the name and the channel ladder.  NHWC,
bias-free like the pred layers, everything jit-friendly (static shapes,
no Python control flow on values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.layers import conv2d, init_conv

# flavor -> {pred name: channels}  (simple_detection.py:56-59, 86-90,
# 124-128, 163-167)
PRED_LAYERS = {
    "seg": {"heatmap": 1},
    "east": {"heatmap": 1, "densebox": 8},
    "textsnake": {"heatmap": 1, "radius": 1},
    "msr": {"heatmap": 1, "offset": 2},
}


def init_simple_decoder(key, flavor: str = "seg", feature_channel: int = 256):
    """Parameters for head ladder [C, C/2, C/4] + per-task 1x1 preds."""
    if flavor not in PRED_LAYERS:
        raise ValueError(f"unknown flavor {flavor!r}; one of "
                         f"{sorted(PRED_LAYERS)}")
    c = feature_channel
    ladder = [c, c, c // 2, c // 4]
    keys = jax.random.split(key, len(ladder) + len(PRED_LAYERS[flavor]))
    params = {"head": [
        init_conv(keys[i], 3, 3, ladder[i], ladder[i + 1])
        for i in range(len(ladder) - 1)
    ]}
    for j, (name, ch) in enumerate(sorted(PRED_LAYERS[flavor].items())):
        params[name] = init_conv(keys[len(ladder) - 1 + j], 1, 1, c // 4, ch)
    return params


def _upsample2x(x):
    n, h, w, c = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None, :],
                            (n, h, 2, w, 2, c)).reshape(n, 2 * h, 2 * w, c)


def simple_decoder_apply(params, feature, flavor: str = "seg"):
    """Feature (N, H, W, C) -> dict of RAW prediction maps at 8x resolution.

    Raw = pre-postprocess, what the losses consume; pass through
    :func:`simple_decoder_postprocess` for the inference-facing maps."""
    x = feature
    for layer in params["head"]:
        x = _upsample2x(jax.nn.relu(conv2d(x, layer["w"], padding=1)))
    return {name: conv2d(x, params[name]["w"])
            for name in PRED_LAYERS[flavor]}


def simple_decoder_postprocess(preds_raw, flavor: str = "seg",
                               densebox_rescale_factor: float = 512.0,
                               offset_rescale_factor: float = 512.0):
    """The reference's postprocess_pred per flavor: sigmoid heatmap; EAST
    densebox and MSR offset x rescale; Textsnake radius exp
    (simple_detection.py:61-63, 92-95, 130-133, 169-172)."""
    preds = dict(preds_raw)
    preds["heatmap"] = jax.nn.sigmoid(preds["heatmap"])
    if flavor == "east":
        preds["densebox"] = preds["densebox"] * densebox_rescale_factor
    elif flavor == "textsnake":
        preds["radius"] = jnp.exp(preds["radius"])
    elif flavor == "msr":
        preds["offset"] = preds["offset"] * offset_rescale_factor
    return preds


def _bce_with_logits(logits, targets):
    # stable max(x,0) - x*z + log1p(exp(-|x|)) form
    # (= F.binary_cross_entropy_with_logits)
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _weighted_mean(loss, weight):
    # reference semantics: (loss * weight).mean(dim=(1,2,3)) — an
    # unnormalised weighted mean over ALL positions, per sample
    return (loss * weight).mean(axis=(1, 2, 3))


def simple_decoder_losses(preds_raw, label, flavor: str = "seg",
                          densebox_ratio: float = 1000.0,
                          densebox_rescale_factor: float = 512.0,
                          radius_ratio: float = 10.0,
                          offset_ratio: float = 1000.0,
                          offset_rescale_factor: float = 512.0):
    """Per-sample loss dict on RAW predictions (simple_detection.py:65-76,
    97-115, 135-153, 174-191).  Labels are NHWC like the preds."""
    losses = {"heatmap_loss": _weighted_mean(
        _bce_with_logits(preds_raw["heatmap"], label["heatmap"]),
        label["heatmap_weight"])}
    if flavor == "east":
        d = label["densebox"] / densebox_rescale_factor
        losses["densebox_loss"] = _weighted_mean(
            (preds_raw["densebox"] - d) ** 2,
            label["densebox_weight"]) * densebox_ratio
    elif flavor == "textsnake":
        r = jnp.log1p(label["radius"])
        diff = preds_raw["radius"] - r
        smooth_l1 = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                              jnp.abs(diff) - 0.5)
        losses["radius_loss"] = _weighted_mean(
            smooth_l1, label["radius_weight"]) * radius_ratio
    elif flavor == "msr":
        o = label["offset"] / offset_rescale_factor
        losses["offset_loss"] = _weighted_mean(
            (preds_raw["offset"] - o) ** 2,
            label["offset_weight"]) * offset_ratio
    return losses


def simple_decoder_forward(params, feature, label=None, flavor: str = "seg",
                           train: bool = False, **ratios):
    """The reference ``forward`` contract (simple_detection.py:38-52):
    train -> ``(total_loss, postprocessed_preds, loss_dict)``;
    eval -> postprocessed preds only."""
    raw = simple_decoder_apply(params, feature, flavor=flavor)
    post_kw = {k: v for k, v in ratios.items()
               if k.endswith("rescale_factor")}
    preds = simple_decoder_postprocess(raw, flavor=flavor, **post_kw)
    if not train:
        return preds
    losses = simple_decoder_losses(raw, label, flavor=flavor, **ratios)
    total = sum(losses.values())
    return total, preds, losses

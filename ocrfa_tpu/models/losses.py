"""DBNet training losses (JAX).

Functional port of the reference loss library
(``/root/reference/src/ocrfa/DBNet/decoders/``): ``DiceLoss``/``LeakyDiceLoss``
(dice_loss.py:8-70), ``BalanceCrossEntropyLoss`` with 3:1 OHEM
(balance_cross_entropy_loss.py:5-56), ``MaskL1Loss``/``BalanceL1Loss``
(l1_loss.py:5-41), and the composite losses of seg_detector_loss.py —
``L1BalanceCELoss`` is the shipped default (configs/DBNet_inference.yaml).

Data-dependent top-k (OHEM) is expressed as a descending sort + prefix mask
so everything stays static-shape under jit.

Layouts: ``pred``/``gt`` are (N, H, W, 1); ``mask`` is (N, H, W).
Each loss returns ``(loss, metrics_dict)`` like the reference convention.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def _squeeze(x):
    return x[..., 0] if x.ndim == 4 else x


def dice_loss(pred, gt, mask, weights=None, eps: float = EPS):
    """1 - 2*|P∩G| / (|P| + |G|) over masked pixels (dice_loss.py:8-42)."""
    pred = _squeeze(pred)
    gt = _squeeze(gt)
    if weights is not None:
        mask = weights * mask
    intersection = jnp.sum(pred * gt * mask)
    union = jnp.sum(pred * mask) + jnp.sum(gt * mask) + eps
    return 1.0 - 2.0 * intersection / union


def leaky_dice_loss(pred, gt, mask, coverage_scale: float = 5.0, eps: float = EPS):
    """Coverage/excess split variant (dice_loss.py:45-70)."""
    pred = _squeeze(pred)
    gt = _squeeze(gt)
    coverage = jnp.sum(pred * mask * gt) / (jnp.sum(gt * mask) + eps)
    coverage = 1.0 - coverage
    excede = jnp.sum(pred * mask * gt) / (jnp.sum(pred * mask) + eps)
    excede = 1.0 - excede
    loss = coverage * coverage_scale + excede
    return loss, {"coverage": coverage, "excede": excede}


def _bce(pred, gt, eps: float = 1e-6):
    # eps must survive float32: 1.0 - 1e-12 rounds to exactly 1.0f, so a
    # saturated sigmoid (reached by ~step 200 of DBNet training) made
    # log(1-pred) = -inf and inf * <zero positive mask> = NaN.  1e-6 is
    # representable (log -> -13.8) and matches torch's BCE clamp intent
    # (F.binary_cross_entropy clamps the log at -100).
    pred = jnp.clip(pred, eps, 1.0 - eps)
    return -(gt * jnp.log(pred) + (1.0 - gt) * jnp.log(1.0 - pred))


def balance_bce_loss(pred, gt, mask, negative_ratio: float = 3.0,
                     eps: float = EPS, return_origin: bool = False):
    """Hard-negative-mined BCE (balance_cross_entropy_loss.py:5-56).

    Negatives are capped at ``negative_ratio x positives``; only the top-k
    hardest negatives contribute.
    """
    gt2 = _squeeze(gt)
    positive = gt2 * mask
    negative = (1.0 - gt2) * mask
    positive_count = jnp.sum(positive)
    negative_count = jnp.minimum(jnp.sum(negative), positive_count * negative_ratio)
    negative_count = jnp.floor(negative_count)

    loss = _bce(_squeeze(pred), gt2)
    positive_loss = loss * positive
    negative_loss = loss * negative

    flat = jnp.sort(negative_loss.reshape(-1))[::-1]
    take = jnp.arange(flat.shape[0]) < negative_count
    negative_sum = jnp.sum(jnp.where(take, flat, 0.0))

    balance_loss = (jnp.sum(positive_loss) + negative_sum) / (
        positive_count + negative_count + eps
    )
    if return_origin:
        return balance_loss, loss
    return balance_loss


def mask_l1_loss(pred, gt, mask):
    """Masked mean absolute error (l1_loss.py:5-16)."""
    mask_sum = jnp.sum(mask)
    loss = jnp.sum(jnp.abs(_squeeze(pred) - gt) * mask) / jnp.maximum(mask_sum, EPS)
    loss = jnp.where(mask_sum == 0, 0.0, loss)
    return loss, {"l1_loss": loss}


def balance_l1_loss(pred, gt, mask, negative_ratio: float = 3.0):
    """L1 with top-k mined negatives (l1_loss.py:19-41)."""
    loss = jnp.abs(_squeeze(pred) - gt)
    positive = loss * mask
    negative = loss * (1.0 - mask)
    positive_count = jnp.sum(mask)
    negative_count = jnp.minimum(jnp.sum(1.0 - mask), positive_count * negative_ratio)
    negative_count = jnp.floor(negative_count)

    flat = jnp.sort(negative.reshape(-1))[::-1]
    take = jnp.arange(flat.shape[0]) < negative_count
    negative_loss = jnp.sum(jnp.where(take, flat, 0.0)) / jnp.maximum(negative_count, 1.0)
    positive_loss = jnp.sum(positive) / jnp.maximum(positive_count, 1.0)
    return positive_loss + negative_loss, {
        "l1_loss": positive_loss, "nge_l1_loss": negative_loss
    }


# ---------------------------------------------------------------------------
# composite losses (seg_detector_loss.py)


def dice_only_loss(pred, batch, eps: float = EPS):
    loss = dice_loss(pred["binary"], batch["gt"], batch["mask"], eps=eps)
    return loss, {"dice_loss": loss}


def balance_ce_only_loss(pred, batch):
    loss = balance_bce_loss(pred["binary"], batch["gt"], batch["mask"])
    return loss, {"bce_loss": loss}


def l1_balance_ce_loss(pred, batch, eps: float = EPS,
                       l1_scale: float = 10.0, bce_scale: float = 5.0):
    """The production DBNet objective (seg_detector_loss.py:173-204):
    OHEM-BCE on binary + L1 on thresh + Dice on thresh_binary."""
    bce = balance_bce_loss(pred["binary"], batch["gt"], batch["mask"])
    metrics = {"bce_loss": bce}
    if "thresh" in pred:
        l1, l1_metric = mask_l1_loss(pred["thresh"], batch["thresh_map"], batch["thresh_mask"])
        dice = dice_loss(pred["thresh_binary"], batch["gt"], batch["mask"], eps=eps)
        metrics["thresh_loss"] = dice
        metrics.update(l1_metric)
        loss = dice + l1_scale * l1 + bce * bce_scale
    else:
        loss = bce
    return loss, metrics


def l1_bce_mining_loss(pred, batch, eps: float = EPS,
                       l1_scale: float = 10.0, bce_scale: float = 5.0):
    """L1BalanceCELoss with the BCE map reused as dice attention weights
    (seg_detector_loss.py:207-236)."""
    bce, bce_map = balance_bce_loss(
        pred["binary"], batch["gt"], batch["mask"], return_origin=True
    )
    l1, l1_metric = mask_l1_loss(pred["thresh"], batch["thresh_map"], batch["thresh_mask"])
    bce_map = (bce_map - bce_map.min()) / (bce_map.max() - bce_map.min() + EPS)
    dice = dice_loss(pred["thresh_binary"], batch["gt"], batch["mask"],
                     weights=bce_map + 1.0, eps=eps)
    loss = dice + l1_scale * l1 + bce * bce_scale
    metrics = {"bce_loss": bce, "thresh_loss": dice, **l1_metric}
    return loss, metrics


def l1_leaky_dice_loss(pred, batch, coverage_scale: float = 5.0,
                       l1_scale: float = 10.0, eps: float = EPS):
    """LeakyDice on binary + L1 on thresh + Dice on thresh_binary
    (seg_detector_loss.py:239-264)."""
    main, metrics = leaky_dice_loss(pred["binary"], batch["gt"], batch["mask"],
                                    coverage_scale=coverage_scale)
    thresh = dice_loss(pred["thresh_binary"], batch["gt"], batch["mask"], eps=eps)
    l1, l1_metric = mask_l1_loss(pred["thresh"], batch["thresh_map"], batch["thresh_mask"])
    metrics = {**metrics, **l1_metric, "thresh_loss": thresh}
    return main + thresh + l1 * l1_scale, metrics


def adaptive_dice_loss(pred, batch, eps: float = EPS):
    """Dice on binary + dice on thresh_binary (seg_detector_loss.py:69-93)."""
    main = dice_loss(pred["binary"], batch["gt"], batch["mask"], eps=eps)
    thresh = dice_loss(pred["thresh_binary"], batch["gt"], batch["mask"], eps=eps)
    return main + thresh, {"main_loss": main, "thresh_loss": thresh}


def l1_dice_loss(pred, batch, eps: float = EPS, l1_scale: float = 10.0):
    """AdaptiveDice (binary + thresh_binary) + scaled MaskL1 on thresh
    (seg_detector_loss.py:137-156)."""
    dice, metrics = adaptive_dice_loss(pred, batch, eps=eps)
    l1, l1_metric = mask_l1_loss(pred["thresh"], batch["thresh_map"], batch["thresh_mask"])
    loss = dice + l1_scale * l1
    return loss, {**metrics, **l1_metric}


def full_l1_dice_loss(pred, batch, eps: float = EPS, l1_scale: float = 10.0):
    """L1DiceLoss with BalanceL1 (mined non-text pixels count too;
    seg_detector_loss.py:159-171)."""
    dice, metrics = adaptive_dice_loss(pred, batch, eps=eps)
    l1, l1_metric = balance_l1_loss(pred["thresh"], batch["thresh_map"],
                                    batch["thresh_mask"])
    loss = dice + l1_scale * l1
    return loss, {**metrics, **l1_metric}


# ---------------------------------------------------------------------------
# instance dice family (dice_loss.py:72-186) — per-text-instance
# normalisation needs connected-component labeling, which is host compute in
# the reference too (``tensor_on_gpu.cpu()``, dice_loss.py:102).  These run
# as host numpy/scipy functions and are NOT jit-able; like the reference's,
# they exist for training research, not the production configs.


def _instance_maps(arr, threshold=None, max_regions: int = 100):
    """Per-sample instance masks via 4-connected labeling.

    Faithful to the reference's ``label()`` (dice_loss.py:96-118) including
    its off-by-one: instances iterate ``range(1, instance_count)``, so the
    highest-numbered component is silently dropped.
    """
    from scipy.ndimage import label as cc_label

    import numpy as onp

    arr = onp.asarray(arr)
    if threshold is not None:
        arr = arr > threshold
    out = []
    for sample in arr:
        label_map, n = cc_label(sample[..., 0] if sample.ndim == 3 else sample)
        n = min(max_regions, n)
        out.append([(label_map == k).astype(onp.float32) for k in range(1, n)])
    return out


def _dice_np(pred, gt, mask, eps: float = EPS):
    import numpy as onp

    inter = float(onp.sum(pred * gt * mask))
    union = float(onp.sum(pred * mask)) + float(onp.sum(gt * mask)) + eps
    return 1.0 - 2.0 * inter / union


def instance_dice_loss(pred, gt, mask, threshold: float = 0.3,
                       iou_thresh: float = 0.2, reduction: str = "mean",
                       max_regions: int = 100, eps: float = EPS):
    """Dice normalised per matched text instance (dice_loss.py:72-186).

    Host-side: labels pred>threshold and gt into instances, matches them by
    IoU-like overlap, computes dice restricted to each matched union region
    (unmatched gt instances score against their own region; unmatched pred
    instances are added as false-positive regions).
    """
    import numpy as onp

    pred = onp.asarray(pred, onp.float32)
    gt = onp.asarray(gt, onp.float32)
    mask = onp.asarray(mask, onp.float32)
    pred2 = pred[..., 0] if pred.ndim == 4 else pred
    gt2 = gt[..., 0] if gt.ndim == 4 else gt

    pred_maps = _instance_maps(pred2, threshold=threshold, max_regions=max_regions)
    gt_maps = _instance_maps(gt2, max_regions=max_regions)

    def overlap_ratio(a, b):
        ov = float(onp.sum(a * b))
        return max(ov / max(float(a.sum()), eps), ov / max(float(b.sum()), eps))

    losses = []
    for b, gt_instances in enumerate(gt_maps):
        pred_instances = pred_maps[b]
        single = None
        not_matched = set(range(len(pred_instances)))
        for g in gt_instances:
            inst = None
            for idx, p in enumerate(pred_instances):
                if overlap_ratio(p, g) > iou_thresh:
                    region = ((p + g) > 0).astype(onp.float32)
                    match = _dice_np(pred2[b], gt2[b], mask[b] * region, eps)
                    inst = match if inst is None else inst + match
                    not_matched.discard(idx)
            if inst is None:
                inst = _dice_np(pred2[b], gt2[b], mask[b] * g, eps)
            single = inst if single is None else single + inst
        for idx in not_matched:
            fp = _dice_np(pred2[b], gt2[b], mask[b] * pred_instances[idx], eps)
            single = fp if single is None else single + fp
        if single is not None:
            losses.append(single)

    if reduction == "none":
        return losses
    total = sum(losses)
    if reduction == "mean":
        # the reference divides by len(losses) and would ZeroDivisionError
        # on an instance-free batch; return 0 instead of crashing
        return total / len(losses) if losses else 0.0
    return total


def instance_dice_only_loss(pred, batch, **kwargs):
    """Registry wrapper: InstanceDiceLoss on the binary head."""
    loss = instance_dice_loss(pred["binary"], batch["gt"], batch["mask"], **kwargs)
    return loss, {"instance_dice_loss": loss}


def adaptive_instance_dice_loss(pred, batch, weights=None,
                                threshold: float = 0.3,
                                iou_thresh: float = 0.2, eps: float = EPS):
    """Dice + InstanceDice on both binary and thresh_binary with learned
    uncertainty weights (seg_detector_loss.py:96-134).

    ``weights``: dict of positive scalars for ``main``/``thresh``/
    ``main_instance``/``thresh_instance`` (the reference's nn.Parameters;
    defaults 1.0).  Each term contributes ``loss/w + log(sqrt(w))``.
    """
    import math

    weights = dict(main=1.0, thresh=1.0, main_instance=1.0,
                   thresh_instance=1.0, **(weights or {}))
    main = float(dice_loss(pred["binary"], batch["gt"], batch["mask"], eps=eps))
    thresh = float(dice_loss(pred["thresh_binary"], batch["gt"], batch["mask"], eps=eps))
    main_inst = instance_dice_loss(pred["binary"], batch["gt"], batch["mask"],
                                   threshold=threshold, iou_thresh=iou_thresh)
    thresh_inst = instance_dice_loss(pred["thresh_binary"], batch["gt"],
                                     batch["mask"], threshold=threshold,
                                     iou_thresh=iou_thresh)

    def partial(w, value):
        return value / w + math.log(math.sqrt(w))

    loss = (partial(weights["main"], main)
            + partial(weights["thresh"], thresh)
            + partial(weights["main_instance"], main_inst)
            + partial(weights["thresh_instance"], thresh_inst))
    metrics = {"main_loss": main, "thresh_loss": thresh,
               "main_instance_loss": main_inst,
               "thresh_instance_loss": thresh_inst, **weights}
    return loss, metrics


# ---------------------------------------------------------------------------
# PSS loss (pss_loss.py:5-115) — multi-channel progressive-scale supervision


def _pss_dice(pred, gt, m, eps: float = EPS):
    inter = jnp.sum(pred * gt * m)
    union = jnp.sum(pred * m) + jnp.sum(gt * m) + eps
    return 1.0 - 2.0 * inter / union


def _pss_dice_ohnm(pred, gt, m, eps: float = EPS):
    """Dice with 3:1 online hard negative mining (pss_loss.py:20-44).

    Host-side (data-dependent gather like the reference's boolean
    indexing).  Faithful to the reference's union term, which sums the
    FULL gt map rather than the sampled one (pss_loss.py:42).
    """
    import numpy as onp

    pred = onp.asarray(pred)
    gt_a = onp.asarray(gt)
    m_a = onp.asarray(m)
    pos = (gt_a == 1) & (m_a == 1)
    neg = (gt_a == 0) & (m_a == 1)
    pos_num, neg_num = float(pos.sum()), float(neg.sum())
    if pos_num == 0 or neg_num < pos_num * 3.0:
        return float(_pss_dice(jnp.asarray(pred), jnp.asarray(gt_a),
                               jnp.asarray(m_a), eps))
    k = int(pos_num * 3)
    neg_sorted = onp.sort(pred[neg])[::-1][:k]
    tpred = onp.concatenate([pred[pos], neg_sorted])
    tgt = onp.concatenate([onp.ones_like(pred[pos]),
                           onp.zeros_like(neg_sorted)])
    inter = float((tpred * tgt).sum())
    union = float(tpred.sum()) + float(gt_a.sum()) + eps
    return 1.0 - 2.0 * inter / union


def _pss_bce(pred, gt, m, eps: float = EPS):
    return jnp.sum(_bce(pred, gt) * m) / (jnp.sum(m) + eps)


def _pss_focal(pred, gt, m, alpha: float = 0.25, gamma: float = 0.6,
               eps: float = EPS):
    pos = (gt == 1).astype(jnp.float32)
    neg = (gt == 0).astype(jnp.float32)
    w = (alpha * pos * (1.0 - jax_stop_gradient(pred)) ** gamma
         + (1.0 - alpha) * neg * jax_stop_gradient(pred) ** gamma)
    loss = jnp.sum(_bce(pred, gt) * w * m) / (eps + jnp.sum(m))
    return loss * 10.0


def _pss_wbce(pred, gt, m, eps: float = EPS):
    pos = (gt == 1).astype(jnp.float32) * m
    neg = (gt == 0).astype(jnp.float32) * m
    w = pos * jnp.sum(neg) / jnp.maximum(jnp.sum(pos), eps) + neg
    return jnp.sum(_bce(pred, gt) * w) / (jnp.sum(m) + eps)


def _pss_wbce_orig(pred, gt, m):
    """Masked class-frequency-weighted BCE summed over masked pixels
    (pss_loss.py:57-67), masked-select expressed as multiplies."""
    m = m.astype(jnp.float32)
    pos = (gt == 1).astype(jnp.float32) * m
    neg = m - pos
    n_masked = jnp.maximum(jnp.sum(m), 1.0)
    w = (pos * jnp.sum(neg) + neg * jnp.sum(pos)) / n_masked
    return jnp.sum(_bce(pred, gt) * w * m)


def _pss_dice_bce(pred, gt, m, eps: float = EPS):
    return (_pss_dice(pred, gt, m, eps) + _pss_bce(pred, gt, m, eps)) / 2.0


def _pss_dice_ohnm_bce(pred, gt, m, eps: float = EPS):
    return (_pss_dice_ohnm(pred, gt, m, eps) + _pss_bce(pred, gt, m, eps)) / 2.0


def jax_stop_gradient(x):
    import jax

    return jax.lax.stop_gradient(x)


_PSS_CRITERIA = {
    "dice": _pss_dice,
    "dice_ohnm": _pss_dice_ohnm,
    "focal": _pss_focal,
    "bce": _pss_bce,
    "wbce": _pss_wbce,
    "wbce_orig": _pss_wbce_orig,
    "dice_bce": _pss_dice_bce,
    "dice_ohnm_bce": _pss_dice_ohnm_bce,
}


def pss_loss(pred, gt, mask, cls_loss: str = "dice", gt_type: str = "shrink",
             eps: float = EPS):
    """Progressive-scale-supervision loss (pss_loss.py:5-115).

    ``pred``: (N, C, H, W) score maps (channel-first like the reference —
    PSS preds are raw multi-channel tensors, not the dict convention);
    ``gt``: (N, C[, +1 global [, +1 shrink]], H, W); ``mask``: (N, H, W).
    ``gt_type``: ``shrink`` (per-channel loss), ``pss`` (4 scale channels +
    a global max-pooled channel), ``both`` (returns ``(pss, shrink)``).
    """
    criterion = _PSS_CRITERIA[cls_loss]
    pred = jnp.asarray(pred)
    gt = jnp.asarray(gt)
    mask = jnp.asarray(mask)

    def get_loss(p, g):
        total = 0.0
        for c in range(p.shape[1]):
            total = total + criterion(p[:, c], g[:, c], mask)
        return total

    if gt_type == "shrink":
        return get_loss(pred, gt)
    if gt_type == "pss":
        loss = get_loss(pred, gt[:, :4])
        loss = loss + criterion(jnp.max(pred, axis=1), gt[:, 4], mask)
        return loss
    if gt_type == "both":
        pss = get_loss(pred[:, :4], gt[:, :4])
        pss = pss + criterion(jnp.max(pred, axis=1), gt[:, 4], mask)
        shrink = criterion(pred[:, 4], gt[:, 5], mask)
        return pss, shrink
    raise NotImplementedError(f"gt_type [{gt_type}] is not implemented")


def pss_only_loss(pred, batch, cls_loss: str = "dice", gt_type: str = "shrink"):
    """Registry wrapper: channel-first maps come from ``batch``/``pred``
    dicts under the PSS convention (``pred`` key in pred, ``gt``/``mask``
    in batch)."""
    loss = pss_loss(pred["pred"] if isinstance(pred, dict) else pred,
                    batch["gt"], batch["mask"], cls_loss=cls_loss,
                    gt_type=gt_type)
    return loss, {"pss_loss": loss}


# name -> fn registry (SegDetectorLossBuilder parity,
# seg_detector_loss.py:7-34, plus the dice_loss.py / pss_loss.py classes)
LOSS_BUILDERS = {
    "DiceLoss": dice_only_loss,
    "BalanceBCELoss": balance_ce_only_loss,
    "AdaptiveDiceLoss": adaptive_dice_loss,
    "AdaptiveInstanceDiceLoss": adaptive_instance_dice_loss,
    "InstanceDiceLoss": instance_dice_only_loss,
    "L1BalanceCELoss": l1_balance_ce_loss,
    "L1BCEMiningLoss": l1_bce_mining_loss,
    "L1LeakyDiceLoss": l1_leaky_dice_loss,
    "L1DiceLoss": l1_dice_loss,
    "FullL1DiceLoss": full_l1_dice_loss,
    "PSS_Loss": pss_only_loss,
}


def build_loss(name: str):
    try:
        return LOSS_BUILDERS[name]
    except KeyError:
        raise ValueError(
            f"unknown loss {name!r}; available: {sorted(LOSS_BUILDERS)}"
        ) from None

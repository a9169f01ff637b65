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


def l1_dice_loss(pred, batch, eps: float = EPS, l1_scale: float = 10.0):
    """Dice on thresh_binary + scaled L1 on thresh (L1DiceLoss family)."""
    dice = dice_loss(pred["thresh_binary"], batch["gt"], batch["mask"], eps=eps)
    l1, l1_metric = mask_l1_loss(pred["thresh"], batch["thresh_map"], batch["thresh_mask"])
    loss = dice + l1_scale * l1
    return loss, {"dice_loss": dice, **l1_metric}


# name -> fn registry (SegDetectorLossBuilder parity,
# seg_detector_loss.py:7-34)
LOSS_BUILDERS = {
    "DiceLoss": dice_only_loss,
    "BalanceBCELoss": balance_ce_only_loss,
    "L1BalanceCELoss": l1_balance_ce_loss,
    "L1BCEMiningLoss": l1_bce_mining_loss,
    "L1LeakyDiceLoss": l1_leaky_dice_loss,
    "L1DiceLoss": l1_dice_loss,
}


def build_loss(name: str):
    try:
        return LOSS_BUILDERS[name]
    except KeyError:
        raise ValueError(
            f"unknown loss {name!r}; available: {sorted(LOSS_BUILDERS)}"
        ) from None

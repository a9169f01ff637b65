"""On-device (XLA) probability post-processing and greedy CTC decode.

The reference's hot decode path pulls the full ``(N, T, C)`` softmax to the
host, zeroes ignored characters, renormalises, and argmaxes in numpy
(``/root/reference/src/ocrfa/utils.py:628-649``).  Here the entire
softmax -> mask -> renormalise -> argmax/max reduction runs on-device; only
two small ``(N, T)`` arrays (argmax indices, max probabilities) cross back
over PCIe for the final string collapse.

The ignore mask is passed as a dense ``(C,)`` float vector rather than an
index list so the jitted function is shape-stable across allowlist changes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def ctc_confidences(indices, values):
    """Vectorised per-row confidence: ``custom_mean`` of max probs at
    non-blank steps (utils.py:650-660); 0 when the row is all-blank.

    f32 product matches the reference's numpy-float32 accumulation.
    """
    mask = indices != 0
    count = jnp.sum(mask, axis=1)
    prod = jnp.prod(jnp.where(mask, values, 1.0), axis=1)
    safe_count = jnp.maximum(count, 1)
    conf = prod ** (2.0 / jnp.sqrt(safe_count.astype(jnp.float32)))
    return jnp.where(count > 0, conf, 0.0)


@partial(jax.jit, static_argnames=("return_probs",))
def postprocess_logits(logits, keep_mask, return_probs: bool = False):
    """Softmax + ignore-mask + renormalise; reduce to (argmax, maxprob).

    ``keep_mask``: float ``(C,)``, 1.0 for allowed classes, 0.0 for ignored.
    Returns ``(indices, values)`` each ``(N, T)``; with ``return_probs`` also
    the full renormalised ``(N, T, C)`` (for beam decoding).
    """
    probs = jax.nn.softmax(logits, axis=2)
    probs = probs * keep_mask
    norm = jnp.sum(probs, axis=2, keepdims=True)
    probs = probs / norm
    indices = jnp.argmax(probs, axis=2)
    values = jnp.max(probs, axis=2)
    if return_probs:
        return indices, values, probs
    return indices, values


def decode_greedy_batch(indices: np.ndarray, characters, ignore_idx=(0,)) -> list:
    """Vectorised greedy collapse over an equal-length (N, T) batch.

    Same semantics as ``CTCLabelConverter.decode_greedy`` (repeat
    suppression computed before ignore removal, utils.py:1099-1115).
    """
    chars = np.array(characters)
    not_repeated = np.concatenate(
        [np.ones((indices.shape[0], 1), dtype=bool), indices[:, 1:] != indices[:, :-1]],
        axis=1,
    )
    ignore = np.asarray(list(ignore_idx))
    keep = not_repeated & ~np.isin(indices, ignore)
    return ["".join(chars[row[k]]) for row, k in zip(indices, keep)]


def greedy_confidences(indices: np.ndarray, values: np.ndarray):
    """Per-row confidence = custom_mean of max probs at non-blank steps
    (utils.py:650-660)."""
    from ocrfa_tpu.preproc.host import custom_mean

    out = []
    for idx_row, val_row in zip(indices, values):
        max_probs = val_row[idx_row != 0]
        if len(max_probs) == 0:
            max_probs = np.array([0.0])
        out.append(custom_mean(max_probs))
    return out


def keep_mask_for(num_classes: int, ignore_idx=()) -> np.ndarray:
    """Class-keep mask for the ignore-char renormalisation.

    Mirrors ``preds_prob[:, :, ignore_idx] = 0`` (utils.py:630): the
    reference builds ``ignore_idx`` from ignored CHARACTERS (+1 offset,
    get_text utils.py:716-723), so index 0 — the CTC blank — can never be
    masked there.  Class 0 is therefore always kept here too: masking the
    blank makes greedy CTC emit a runner-up junk character at every
    inter-glyph timestep (callers passing ``converter.ignore_idx``, whose
    first entry is the blank used for decode-time collapse, used to
    trigger exactly that).
    """
    mask = np.ones((num_classes,), dtype=np.float32)
    ignore = [i for i in ignore_idx if 0 < i < num_classes]
    mask[ignore] = 0.0
    return mask

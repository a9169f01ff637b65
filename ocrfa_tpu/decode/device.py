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


def compact_indices(indices, num_classes: int):
    """Narrow argmax class ids to the smallest holding dtype before they
    leave the device.  The ``(N, T)`` index array is the dominant return
    payload of the fused decode programs, and the host->device link's
    download direction is the slow one (measured ~3-20 MB/s through the
    relay): int32 -> uint8 cuts that wire 4x.  Lossless: argmax over C
    classes is always < C."""
    if num_classes <= 255:
        return indices.astype(jnp.uint8)
    if num_classes <= 32767:
        return indices.astype(jnp.int16)
    return indices


def pack_decode_payload(indices_compact, confs):
    """Fuse (indices, confidences) into ONE device array.

    Materialising a device output is a full host round trip through the
    relay (~26 ms RTT regardless of size — measured: a scalar and a 129 KB
    array cost the same); fetching indices and confidences separately
    doubles that.  The f32 confidences are bitcast to the index dtype and
    prepended as extra columns, so a chunk's entire decode result downloads
    as one array.  Inverse: :func:`unpack_decode_payload`.
    """
    confs = confs.astype(jnp.float32)
    dt = indices_compact.dtype
    conf_cols = jax.lax.bitcast_convert_type(confs, dt)
    conf_cols = conf_cols.reshape(confs.shape[0], -1)
    return jnp.concatenate([conf_cols, indices_compact], axis=1)


def unpack_decode_payload(payload: np.ndarray):
    """Host-side inverse of :func:`pack_decode_payload` -> (indices, confs)."""
    k = 4 // payload.dtype.itemsize
    confs = np.ascontiguousarray(payload[:, :k]).view(np.float32).ravel()
    return payload[:, k:], confs


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

"""Training: CTC loss + data-parallel train step.

The reference ships no trainer (SURVEY.md §3.5) — its DBNet losses are dead
code.  This module adds a real one for the CRNN recognizers: CTC loss
(optax) with an Adam step, sharded over the device mesh (params replicated,
batch split; XLA inserts the gradient all-reduce over ICI).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ocrfa_tpu.models.crnn import crnn_apply


def ctc_loss(logits, labels, label_lengths, blank_id: int = 0):
    """Mean CTC loss over the batch.

    ``logits``: (N, T, C); ``labels``: (N, L) int32 padded with zeros;
    ``label_lengths``: (N,).
    """
    n, t, _ = logits.shape
    _, l = labels.shape
    logit_paddings = jnp.zeros((n, t), dtype=jnp.float32)
    label_paddings = (
        jnp.arange(l)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32), logit_paddings, labels, label_paddings,
        blank_id=blank_id,
    )
    return jnp.mean(per_seq)


def make_train_step(optimizer, variant: str = "gen1"):
    """Build a jitted CTC train step closed over the optimizer.

    Data parallelism: place ``images``/``labels`` with a batch-sharded
    ``NamedSharding`` and params replicated — XLA emits the psum for the
    gradient reduction (SURVEY.md §2.7's DataParallel equivalent).
    """

    @jax.jit
    def train_step(params, opt_state, images, labels, label_lengths):
        def loss_fn(p):
            logits = crnn_apply(p, images, variant=variant, train=True)
            return ctc_loss(logits, labels, label_lengths)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    return train_step


def make_optimizer(learning_rate: float = 1e-3, clip_norm: float | None = 1.0):
    """Adam with global-norm clipping (default on — the 512-wide BiLSTM
    stack diverges without it at practical learning rates)."""
    if clip_norm is None:
        return optax.adam(learning_rate)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adam(learning_rate),
    )


def make_trocr_train_step(optimizer, heads: int = 8):
    """Jitted teacher-forced cross-entropy step for the TrOCR recognizer.

    Same dp discipline as :func:`make_train_step`: shard the batch, keep
    params replicated, XLA inserts the gradient psum.
    """
    from ocrfa_tpu.models.trocr import trocr_loss

    @jax.jit
    def train_step(params, opt_state, images, tokens_in, tokens_out):
        loss, grads = jax.value_and_grad(trocr_loss)(
            params, images, tokens_in, tokens_out, heads)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss

    return train_step


def make_trocr_optimizer(learning_rate: float = 3e-4, warmup_steps: int = 200,
                         total_steps: int = 10_000,
                         weight_decay: float = 0.01):
    """AdamW + linear-warmup cosine decay — the standard transformer
    pretraining schedule (the CTC path keeps plain Adam for parity)."""
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=warmup_steps,
        decay_steps=max(total_steps, warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    )


def ctc_labels_to_trocr_tokens(labels, lengths, max_len: int | None = None):
    """(N, L) CTC label ids (0 = blank) -> teacher-forced decoder tokens.

    Returns ``(tokens_in, tokens_out)``: BOS-prefixed inputs and
    EOS-terminated targets, PAD-filled.  CTC id ``i`` (charset index i-1)
    maps to decoder token ``i - 1 + NUM_SPECIAL``.
    """
    import numpy as np

    from ocrfa_tpu.models.trocr import BOS, EOS, NUM_SPECIAL, PAD

    labels = np.asarray(labels)
    lengths = np.asarray(lengths)
    n, l = labels.shape
    t = (max_len or l) + 1
    tokens_in = np.full((n, t), PAD, dtype=np.int32)
    tokens_out = np.full((n, t), PAD, dtype=np.int32)
    tokens_in[:, 0] = BOS
    for i in range(n):
        k = int(lengths[i])
        toks = labels[i, :k] - 1 + NUM_SPECIAL
        tokens_in[i, 1:k + 1] = toks
        tokens_out[i, :k] = toks
        tokens_out[i, k] = EOS
    return tokens_in, tokens_out


def calibrate_bn_stats(params, apply_fn, batches, momentum: float | None = None):
    """Post-training BN calibration: write batch statistics into the
    running ``mean``/``var`` slots so the trained model can run in
    inference mode (train-mode BN never updates them).

    ``apply_fn(params, batch)`` must run a forward pass whose batch norms
    see representative activations; statistics are captured by re-running
    each norm's input through a traced intercept.

    Implementation: wraps ``ocrfa_tpu.models.layers.batch_norm`` to record
    per-call moments, then averages over ``batches`` (equal weighting when
    ``momentum`` is None, EMA otherwise).
    """
    import contextlib
    from unittest import mock

    import numpy as np

    from ocrfa_tpu.models import layers

    # models bind batch_norm via `from layers import batch_norm`, so every
    # model module's own reference must be patched, not just layers'
    import ocrfa_tpu.models.craft as _craft
    import ocrfa_tpu.models.crnn as _crnn
    import ocrfa_tpu.models.dbnet as _dbnet
    import ocrfa_tpu.models.mobilenetv3 as _mnv3

    _PATCH_MODULES = [layers, _crnn, _craft, _dbnet, _mnv3]

    records: dict = {}
    orig = layers.batch_norm
    counter = [0]

    def recording_bn(x, p, train: bool = False):
        idx = counter[0]
        counter[0] += 1
        axes = tuple(range(x.ndim - 1))
        mean = np.asarray(jnp.mean(x, axis=axes).astype(jnp.float32))
        var = np.asarray(jnp.var(x, axis=axes).astype(jnp.float32))
        slot = records.setdefault(idx, {"p": p, "means": [], "vars": []})
        slot["means"].append(mean)
        slot["vars"].append(var)
        return orig(x, p, train=True)

    for batch in batches:
        counter[0] = 0
        with contextlib.ExitStack() as stack:
            for module in _PATCH_MODULES:
                if getattr(module, "batch_norm", None) is not None:
                    stack.enter_context(
                        mock.patch.object(module, "batch_norm", recording_bn)
                    )
            apply_fn(params, batch)

    # write averaged moments into the (identity-matched) param dicts
    id_to_stats = {}
    for slot in records.values():
        key = id(slot["p"])
        if momentum is None:
            mean = np.mean(slot["means"], axis=0)
            var = np.mean(slot["vars"], axis=0)
        else:
            mean, var = slot["means"][0], slot["vars"][0]
            for m2, v2 in zip(slot["means"][1:], slot["vars"][1:]):
                mean = (1 - momentum) * mean + momentum * m2
                var = (1 - momentum) * var + momentum * v2
        id_to_stats[key] = (mean, var)

    def rewrite(tree):
        if isinstance(tree, dict):
            if id(tree) in id_to_stats and "mean" in tree and "var" in tree:
                mean, var = id_to_stats[id(tree)]
                return {**tree, "mean": jnp.asarray(mean), "var": jnp.asarray(var)}
            return {k: rewrite(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [rewrite(v) for v in tree]
        return tree

    return rewrite(params)


def craft_ohem_mse_loss(pred, batch, negative_ratio: float = 3.0,
                        pos_thresh: float = 0.1, min_negatives: int = 512):
    """CRAFT objective: pixel MSE over (region, affinity) with online hard
    negative mining — every positive plus the hardest ``negative_ratio`` x
    negatives contribute (``min_negatives`` keeps the mining alive on
    near-empty pages).  Expressed as descending sort + prefix mask so the
    data-dependent top-k stays static-shape under jit (same trick as
    losses.balance_bce_loss).

    ``pred``: (N, h, w, 2) raw heads; ``batch["region"]``/``["affinity"]``:
    (N, h, w) gaussian targets in [0, 1].
    """
    gt = jnp.stack([batch["region"], batch["affinity"]], axis=-1)
    err = (pred.astype(jnp.float32) - gt) ** 2
    pos = (gt > pos_thresh).astype(jnp.float32)
    n_pos = jnp.sum(pos)
    n_neg = jnp.minimum(
        jnp.maximum(n_pos * negative_ratio, float(min_negatives)),
        jnp.sum(1.0 - pos))
    n_neg = jnp.floor(n_neg)

    pos_loss = jnp.sum(err * pos) / jnp.maximum(n_pos, 1.0)
    flat = jnp.sort((err * (1.0 - pos)).reshape(-1))[::-1]
    take = jnp.arange(flat.shape[0]) < n_neg
    neg_loss = jnp.sum(jnp.where(take, flat, 0.0)) / jnp.maximum(n_neg, 1.0)
    return pos_loss + neg_loss


def make_craft_train_step(optimizer):
    """Jitted CRAFT train step — the detection trainer the reference never
    shipped for its primary detector.  ``batch``: ``image`` (N, H, W, 3)
    mean/variance-normalised canvases + the ``geometry.craft_maps``
    supervision maps (``region``/``affinity`` at (N, H/2, W/2))."""
    from ocrfa_tpu.models.craft import craft_apply

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            pred, _ = craft_apply(p, batch["image"], train=True)
            return craft_ohem_mse_loss(pred, batch)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return train_step


def make_dbnet_train_step(optimizer, backbone: str = "resnet18",
                          loss_name: str = "L1BalanceCELoss"):
    """DBNet training step — the trainer the reference never shipped
    (SURVEY.md §3.5): differentiable-binarization heads + the configured
    loss (configs/DBNet_inference.yaml's L1BalanceCELoss by default).

    ``batch`` dict: ``image`` (N,H,W,3) BGR-mean-normalised, plus the loss
    supervision maps ``gt``/``mask``/``thresh_map``/``thresh_mask``.
    """
    from ocrfa_tpu.models.dbnet import dbnet_apply
    from ocrfa_tpu.models.losses import build_loss

    loss_fn_inner = build_loss(loss_name)

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            pred = dbnet_apply(p, batch["image"], backbone=backbone,
                               training=True, bn_train=True)
            loss, metrics = loss_fn_inner(pred, batch)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss, metrics

    return train_step

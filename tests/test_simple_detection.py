"""Simple detection decoder family (Seg/EAST/Textsnake/MSR).

The reference module (``DBNet/decoders/simple_detection.py``) is dead code
there — its ``SimpleUpsampleHead`` import target does not exist — so no
direct golden import is possible.  The loss math IS pinned down by the
surviving source, and that is what we golden here: each flavor's loss
expression replicated verbatim in torch (the same ``F.*`` calls and
weighted ``.mean(dim=(1,2,3))`` reductions, simple_detection.py:65-76,
97-115, 135-153, 174-191) against our JAX implementation on shared
random data.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.simple_detection import (
    PRED_LAYERS,
    init_simple_decoder,
    simple_decoder_apply,
    simple_decoder_forward,
    simple_decoder_losses,
    simple_decoder_postprocess,
)


def _rand_preds_labels(flavor, n=2, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    preds, label = {}, {}
    for name, ch in PRED_LAYERS[flavor].items():
        preds[name] = rng.standard_normal((n, h, w, ch)).astype(np.float32)
        if name == "heatmap":
            label[name] = (rng.random((n, h, w, ch)) > 0.7).astype(np.float32)
        elif name == "radius":
            label[name] = rng.uniform(0, 20, (n, h, w, ch)).astype(np.float32)
        else:
            label[name] = rng.uniform(-64, 64, (n, h, w, ch)).astype(
                np.float32)
        label[name + "_weight"] = rng.random((n, h, w, ch)).astype(np.float32)
    return preds, label


def _torch_reference_losses(flavor, preds, label):
    """The reference loss expressions, replicated verbatim in torch
    (NCHW there; we transpose both ways)."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v).permute(0, 3, 1, 2) for k, v in preds.items()}
    lb = {k: torch.from_numpy(v).permute(0, 3, 1, 2) for k, v in label.items()}
    out = {}
    hl = F.binary_cross_entropy_with_logits(t["heatmap"], lb["heatmap"],
                                            reduction="none")
    out["heatmap_loss"] = (hl * lb["heatmap_weight"]).mean(dim=(1, 2, 3))
    if flavor == "east":
        db = lb["densebox"] / 512.0
        dl = F.mse_loss(t["densebox"], db, reduction="none")
        out["densebox_loss"] = (dl * lb["densebox_weight"]).mean(
            dim=(1, 2, 3)) * 1000.0
    elif flavor == "textsnake":
        r = torch.log(lb["radius"] + 1)
        rl = F.smooth_l1_loss(t["radius"], r, reduction="none")
        out["radius_loss"] = (rl * lb["radius_weight"]).mean(
            dim=(1, 2, 3)) * 10.0
    elif flavor == "msr":
        o = lb["offset"] / 512.0
        ol = F.mse_loss(t["offset"], o, reduction="none")
        out["offset_loss"] = (ol * lb["offset_weight"]).mean(
            dim=(1, 2, 3)) * 1000.0
    return {k: v.numpy() for k, v in out.items()}


class TestLossGoldens:
    @pytest.mark.parametrize("flavor", sorted(PRED_LAYERS))
    def test_matches_reference_expressions(self, flavor):
        preds, label = _rand_preds_labels(flavor)
        ours = simple_decoder_losses(
            {k: jnp.asarray(v) for k, v in preds.items()},
            {k: jnp.asarray(v) for k, v in label.items()}, flavor=flavor)
        ref = _torch_reference_losses(flavor, preds, label)
        assert set(ours) == set(ref)
        for k in ref:
            np.testing.assert_allclose(np.asarray(ours[k]), ref[k],
                                       atol=1e-5, rtol=1e-5)


class TestDecoderGraph:
    def test_shapes_and_postprocess(self):
        params = init_simple_decoder(jax.random.PRNGKey(0), "east",
                                     feature_channel=32)
        feat = jnp.zeros((1, 4, 6, 32), jnp.float32)
        raw = simple_decoder_apply(params, feat, flavor="east")
        # ladder has 3 stages of 2x upsample -> 8x resolution
        assert raw["heatmap"].shape == (1, 32, 48, 1)
        assert raw["densebox"].shape == (1, 32, 48, 8)
        post = simple_decoder_postprocess(raw, flavor="east")
        h = np.asarray(post["heatmap"])
        assert (h >= 0).all() and (h <= 1).all()
        # zero feature -> zero densebox logits -> zero after rescale
        np.testing.assert_array_equal(np.asarray(post["densebox"]), 0.0)

    def test_forward_contract_and_grads(self):
        flavor = "msr"
        params = init_simple_decoder(jax.random.PRNGKey(1), flavor,
                                     feature_channel=16)
        rng = np.random.default_rng(3)
        feat = jnp.asarray(rng.standard_normal((2, 4, 4, 16)), jnp.float32)
        _, label = _rand_preds_labels(flavor, n=2, h=32, w=32, seed=4)
        label = {k: jnp.asarray(v) for k, v in label.items()}

        preds = simple_decoder_forward(params, feat, flavor=flavor)
        assert set(preds) == set(PRED_LAYERS[flavor])

        def loss_fn(p):
            total, _preds, _losses = simple_decoder_forward(
                p, feat, label, flavor=flavor, train=True)
            return total.sum()

        total, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(total))
        leaf_max = max(float(jnp.abs(g).max())
                       for g in jax.tree.leaves(grads))
        assert leaf_max > 0.0

    def test_unknown_flavor_raises(self):
        with pytest.raises(ValueError, match="unknown flavor"):
            init_simple_decoder(jax.random.PRNGKey(0), "nope")

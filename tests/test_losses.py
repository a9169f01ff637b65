"""DBNet loss parity vs the reference torch loss classes."""

import numpy as np
import pytest

from ocrfa_tpu.models import losses


@pytest.fixture(scope="module")
def ref_losses(ref_utils):
    import importlib

    return importlib.import_module("ocrfa.DBNet.decoders.seg_detector_loss")


def _batch(rng, n=2, h=16, w=24):
    pred = {
        "binary": rng.random((n, h, w, 1), dtype=np.float32),
        "thresh": rng.random((n, h, w, 1), dtype=np.float32),
        "thresh_binary": rng.random((n, h, w, 1), dtype=np.float32),
    }
    batch = {
        "gt": (rng.random((n, h, w, 1)) > 0.7).astype(np.float32),
        "mask": (rng.random((n, h, w)) > 0.1).astype(np.float32),
        "thresh_map": rng.random((n, h, w), dtype=np.float32),
        "thresh_mask": (rng.random((n, h, w)) > 0.3).astype(np.float32),
    }
    return pred, batch


def _to_torch(pred, batch):
    import torch

    tp = {k: torch.from_numpy(v.transpose(0, 3, 1, 2)) for k, v in pred.items()}
    tb = {
        "gt": torch.from_numpy(batch["gt"].transpose(0, 3, 1, 2)),
        "mask": torch.from_numpy(batch["mask"]),
        "thresh_map": torch.from_numpy(batch["thresh_map"]),
        "thresh_mask": torch.from_numpy(batch["thresh_mask"]),
    }
    return tp, tb


class TestLossParity:
    @pytest.mark.parametrize("seed", range(3))
    def test_l1_balance_ce(self, ref_losses, seed):
        rng = np.random.default_rng(seed)
        pred, batch = _batch(rng)
        tp, tb = _to_torch(pred, batch)

        ref_loss, ref_metrics = ref_losses.L1BalanceCELoss()(tp, tb)
        ours, metrics = losses.l1_balance_ce_loss(pred, batch)
        assert np.isclose(float(ours), float(ref_loss), rtol=1e-4, atol=1e-5)
        assert np.isclose(float(metrics["bce_loss"]), float(ref_metrics["bce_loss"]),
                          rtol=1e-4, atol=1e-5)

    def test_dice(self, ref_losses):
        rng = np.random.default_rng(5)
        pred, batch = _batch(rng)
        tp, tb = _to_torch(pred, batch)
        ref_loss, _ = ref_losses.DiceLoss()(tp, tb)
        ours, _ = losses.dice_only_loss(pred, batch)
        assert np.isclose(float(ours), float(ref_loss), rtol=1e-5)

    def test_l1_leaky_dice(self, ref_losses):
        rng = np.random.default_rng(6)
        pred, batch = _batch(rng)
        tp, tb = _to_torch(pred, batch)
        ref_loss, _ = ref_losses.L1LeakyDiceLoss()(tp, tb)
        ours, _ = losses.l1_leaky_dice_loss(pred, batch)
        assert np.isclose(float(ours), float(ref_loss), rtol=1e-4, atol=1e-5)

    def test_no_thresh_branch(self, ref_losses):
        rng = np.random.default_rng(7)
        pred, batch = _batch(rng)
        pred = {"binary": pred["binary"]}
        tp, tb = _to_torch(pred, batch)
        ref_loss, _ = ref_losses.L1BalanceCELoss()(tp, tb)
        ours, _ = losses.l1_balance_ce_loss(pred, batch)
        assert np.isclose(float(ours), float(ref_loss), rtol=1e-4)

    def test_bce_finite_at_saturated_sigmoid(self):
        """A binary head that saturates to exactly 1.0f (which real DBNet
        training reaches by ~step 200) must yield a finite loss: with a
        sub-f32 eps, log(1-1.0) = -inf and inf * zero-mask = NaN."""
        rng = np.random.default_rng(0)
        pred, batch = _batch(rng)
        pred["binary"][:] = np.float32(1.0)
        batch["gt"][:] = 0.0  # every saturated pixel is a negative
        loss = losses.balance_bce_loss(pred["binary"], batch["gt"],
                                       batch["mask"])
        assert np.isfinite(float(loss))
        total, metrics = losses.l1_balance_ce_loss(pred, batch)
        assert np.isfinite(float(total))
        assert np.isfinite(float(metrics["bce_loss"]))

    def test_build_loss_registry(self):
        assert losses.build_loss("L1BalanceCELoss") is losses.l1_balance_ce_loss
        with pytest.raises(ValueError):
            losses.build_loss("NopeLoss")

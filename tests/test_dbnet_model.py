"""DBNet graph parity: JAX vs torch replica (plain-conv path) through the
converter.  The deformable conv itself is spec-tested in
test_deform_conv.py; the full deformable graph is their composition."""

import numpy as np
import pytest

from ocrfa_tpu import checkpoints
from ocrfa_tpu.models import dbnet


def _randomize_bn_stats(model, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5


class TestDBNetGraph:
    def test_forward_parity_plain_resnet18(self):
        import torch

        from tests.torch_replicas import DBNetRefModel

        torch.manual_seed(0)
        model = DBNetRefModel().eval()
        _randomize_bn_stats(model)
        # checkpoint keys carry the DataParallel prefix in the zoo files
        sd = {f"model.module.{k}": v.detach().numpy()
              for k, v in model.state_dict().items()
              if "num_batches_tracked" not in k}
        params = checkpoints.convert_dbnet(sd, backbone="resnet18")

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
        with torch.no_grad():
            ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(dbnet.dbnet_apply(params, x, backbone="resnet18"))
        assert ours.transpose(0, 3, 1, 2).shape == ref.shape
        np.testing.assert_allclose(
            ours.transpose(0, 3, 1, 2), ref, atol=2e-3, rtol=1e-2
        )

    def test_deformable_init_runs(self):
        import jax

        params = dbnet.init_dbnet(jax.random.PRNGKey(0), backbone="resnet18")
        x = np.zeros((1, 64, 96, 3), dtype=np.float32)
        y = dbnet.dbnet_apply(params, x, backbone="resnet18")
        assert y.shape == (1, 64, 96, 1)
        out = dbnet.dbnet_apply(params, x, backbone="resnet18", training=True)
        assert set(out) == {"binary", "thresh", "thresh_binary"}

    def test_resnet50_init_runs(self):
        import jax

        params = dbnet.init_dbnet(jax.random.PRNGKey(1), backbone="resnet50")
        x = np.zeros((1, 64, 64, 3), dtype=np.float32)
        y = dbnet.dbnet_apply(params, x, backbone="resnet50")
        assert y.shape == (1, 64, 64, 1)


class TestDBNetTraining:
    def test_train_step_reduces_loss(self):
        import jax
        import numpy as np

        from ocrfa_tpu.train import make_dbnet_train_step, make_optimizer

        params = dbnet.init_dbnet(jax.random.PRNGKey(0), backbone="resnet18")
        opt = make_optimizer(1e-3)
        state = opt.init(params)
        step = make_dbnet_train_step(opt)

        rng = np.random.default_rng(0)
        h = w = 64
        gt = np.zeros((2, h, w, 1), np.float32)
        gt[:, 20:40, 10:50] = 1.0
        batch = {
            "image": rng.standard_normal((2, h, w, 3)).astype(np.float32) * 0.1,
            "gt": gt,
            "mask": np.ones((2, h, w), np.float32),
            "thresh_map": gt[..., 0] * 0.5,
            "thresh_mask": np.ones((2, h, w), np.float32),
        }
        p, s = params, state
        losses = []
        for _ in range(5):
            p, s, loss, metrics = step(p, s, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert "bce_loss" in metrics

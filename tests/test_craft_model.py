"""Numerical parity: JAX CRAFT vs torch replica through the converter."""

import numpy as np
import pytest

from ocrfa_tpu import checkpoints
from ocrfa_tpu.models import craft


def _randomize_bn_stats(model, seed=0):
    """Give BN layers non-trivial running stats so parity is meaningful."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean = torch.randn(m.num_features, generator=g) * 0.1
            m.running_var = torch.rand(m.num_features, generator=g) + 0.5


class TestCraft:
    def test_forward_parity(self):
        import torch

        from tests.torch_replicas import CraftModel

        torch.manual_seed(0)
        model = CraftModel().eval()
        _randomize_bn_stats(model)
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()
              if "num_batches_tracked" not in k}
        params = checkpoints.convert_craft(sd)

        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
        with torch.no_grad():
            ref_y, ref_feat = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ours_y, ours_feat = craft.craft_apply(params, x)

        assert ours_y.shape == tuple(ref_y.shape)  # both NHWC
        np.testing.assert_allclose(
            np.asarray(ours_y), ref_y.numpy(), atol=1e-3, rtol=1e-2
        )
        np.testing.assert_allclose(
            np.asarray(ours_feat).transpose(0, 3, 1, 2), ref_feat.numpy(),
            atol=1e-3, rtol=1e-2,
        )

    def test_output_resolution(self):
        import jax

        params = craft.init_craft(jax.random.PRNGKey(0))
        x = np.zeros((1, 96, 128, 3), dtype=np.float32)
        y, feat = craft.craft_apply(params, x)
        assert y.shape == (1, 48, 64, 2)
        assert feat.shape == (1, 48, 64, 32)

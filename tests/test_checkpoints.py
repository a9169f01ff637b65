"""Checkpoint persistence: Orbax save/load roundtrip; torch loading."""

import numpy as np


class TestOrbax:
    def test_roundtrip(self, tmp_path):
        import jax

        from ocrfa_tpu.checkpoints import load_pytree, save_pytree
        from ocrfa_tpu.models.crnn import init_crnn_gen1

        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=12,
                                output_channel=64, hidden_size=64)
        path = str(tmp_path / "ckpt")
        save_pytree(path, params)
        restored = load_pytree(path)

        flat1, tree1 = jax.tree.flatten(params)
        flat2, tree2 = jax.tree.flatten(restored)
        assert tree1 == tree2
        for a, b in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTorchLoad:
    def test_module_prefix_stripped(self, tmp_path):
        import torch

        from ocrfa_tpu.checkpoints import load_torch_state_dict

        path = str(tmp_path / "m.pth")
        torch.save({"module.layer.weight": torch.ones(2, 3)}, path)
        sd = load_torch_state_dict(path)
        assert list(sd) == ["layer.weight"]
        assert sd["layer.weight"].shape == (2, 3)

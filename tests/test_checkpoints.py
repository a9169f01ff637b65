"""Checkpoint persistence: Orbax save/load roundtrip; torch loading."""

import numpy as np
import pytest


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


class TestExportGen1:
    def test_roundtrip_and_torch_load(self):
        """export -> torch replica strict load -> convert back == original."""
        import jax
        import numpy as np
        import torch

        from ocrfa_tpu.checkpoints import convert_crnn_gen1, export_crnn_gen1
        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from torch_replicas import Gen1Model

        params = init_crnn_gen1(jax.random.PRNGKey(3), num_class=11,
                                output_channel=64, hidden_size=64)
        sd = export_crnn_gen1(params)

        model = Gen1Model(num_class=11, output_channel=64, hidden_size=64)
        model.load_state_dict({k: torch.from_numpy(np.array(v))
                               for k, v in sd.items()}, strict=True)

        back = convert_crnn_gen1(sd)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back),
        ):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_torch_forward_matches_jax(self):
        """The exported weights reproduce the JAX forward inside torch."""
        import jax
        import numpy as np
        import torch

        from ocrfa_tpu.checkpoints import export_crnn_gen1
        from ocrfa_tpu.models.crnn import crnn_apply, init_crnn_gen1
        from torch_replicas import Gen1Model

        params = init_crnn_gen1(jax.random.PRNGKey(4), num_class=11,
                                output_channel=64, hidden_size=64)
        model = Gen1Model(num_class=11, output_channel=64, hidden_size=64)
        model.load_state_dict({k: torch.from_numpy(np.array(v))
                               for k, v in export_crnn_gen1(params).items()},
                              strict=True)
        model.eval()

        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (2, 64, 96, 1)).astype(np.float32)
        ours = np.asarray(crnn_apply(params, x), np.float32)
        with torch.no_grad():
            theirs = model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


class TestExportCraft:
    def test_roundtrip_and_torch_load(self):
        """export_craft -> replica strict load -> convert back == original."""
        import jax
        import numpy as np
        import torch

        from ocrfa_tpu.checkpoints import convert_craft, export_craft
        from ocrfa_tpu.models.craft import init_craft
        from torch_replicas import CraftModel

        params = init_craft(jax.random.PRNGKey(5))  # full-size: key parity
        sd = export_craft(params)

        model = CraftModel()
        model.load_state_dict({k: torch.from_numpy(np.array(v))
                               for k, v in sd.items()}, strict=True)

        back = convert_craft(sd)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back),
        ):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
class TestExportDBNet:
    @staticmethod
    def _roundtrip(params, backbone):
        import jax
        import numpy as np

        from ocrfa_tpu.checkpoints import convert_dbnet, export_dbnet

        sd = export_dbnet(params, backbone=backbone)
        back = convert_dbnet(sd, backbone=backbone)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back),
        ):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        return sd

    def test_resnet18_roundtrip_and_torch_load(self):
        import jax
        import numpy as np
        import torch

        from ocrfa_tpu.models.dbnet import init_dbnet
        from torch_replicas import DBNetRefModel

        params = init_dbnet(jax.random.PRNGKey(6), backbone="resnet18")
        sd = self._roundtrip(params, "resnet18")
        model = DBNetRefModel()
        keep = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
        missing, unexpected = model.load_state_dict(keep, strict=False)
        missing = [m for m in missing if "num_batches_tracked" not in m]
        # the replica is the plain-conv (dcn=None) variant, so the DCN
        # offset convs are the only admissible extras
        assert not missing, missing
        assert all("conv2_offset" in k for k in unexpected), unexpected

    def test_resnet50_roundtrip(self):
        import jax

        from ocrfa_tpu.models.dbnet import init_dbnet

        params = init_dbnet(jax.random.PRNGKey(7), backbone="resnet50")
        self._roundtrip(params, "resnet50")

    def test_asf_roundtrip(self):
        import jax

        from ocrfa_tpu.models.dbnet import init_dbnet

        params = init_dbnet(jax.random.PRNGKey(8), backbone="resnet18",
                            decoder="asf",
                            attention_type="scale_channel_spatial")
        self._roundtrip(params, "resnet18")

    def test_data_parallel_prefix(self):
        import jax

        from ocrfa_tpu.checkpoints import export_dbnet
        from ocrfa_tpu.models.dbnet import init_dbnet

        params = init_dbnet(jax.random.PRNGKey(9), backbone="resnet18")
        sd = export_dbnet(params, data_parallel_prefix=True)
        assert all(k.startswith("model.module.") for k in sd)

    def test_mobilenetv3_large_roundtrip(self):
        import jax

        from ocrfa_tpu.models.dbnet import init_dbnet

        params = init_dbnet(jax.random.PRNGKey(10),
                            backbone="mobilenetv3_large")
        self._roundtrip(params, "mobilenetv3_large")

    def test_mobilenetv3_small_roundtrip_and_torch_load(self):
        """convert -> export -> convert identity AND the exported backbone
        loads strict into the same torch replica the convert tests use."""
        import jax
        import numpy as np
        import torch

        from ocrfa_tpu.models.dbnet import init_dbnet
        from torch_replicas import MobileNetV3Ref

        params = init_dbnet(jax.random.PRNGKey(11),
                            backbone="mobilenetv3_small")
        sd = self._roundtrip(params, "mobilenetv3_small")
        model = MobileNetV3Ref(mode="small")
        bb = {k[len("backbone."):]: torch.from_numpy(np.array(v))
              for k, v in sd.items() if k.startswith("backbone.")}
        missing, unexpected = model.load_state_dict(bb, strict=False)
        missing = [m for m in missing if "num_batches_tracked" not in m]
        assert not missing, missing
        assert not unexpected, unexpected

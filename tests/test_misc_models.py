"""SeraQ configurable model, deform RoI pool, and user-network hook."""

import numpy as np
import pytest


class TestSeraQ:
    @pytest.mark.parametrize("feat,seq", [("ResNet", "BiLSTM"), ("VGG", "None")])
    def test_forward_shapes(self, feat, seq):
        import jax

        from ocrfa_tpu.models.seraq import SeraQConfig, init_seraq, seraq_apply

        cfg = SeraQConfig(feature_extraction=feat, sequence_modeling=seq,
                          output_channel=64, hidden_size=48, num_class=20)
        params = init_seraq(jax.random.PRNGKey(0), cfg)
        x = np.zeros((2, 64, 96, 1), dtype=np.float32)
        out = seraq_apply(params, x, cfg)
        assert out.shape[0] == 2 and out.shape[2] == 20

    def test_invalid_config(self):
        from ocrfa_tpu.models.seraq import SeraQConfig

        with pytest.raises(ValueError):
            SeraQConfig(feature_extraction="nope").validate()
        with pytest.raises(ValueError):
            SeraQConfig(prediction="Attn").validate()


class TestDeformRoIPool:
    def test_plain_average_pool_parity(self):
        """With no_trans and a constant image, pooling returns the constant."""
        from ocrfa_tpu.ops.deform_pool import deform_roi_pool

        x = np.full((1, 16, 16, 4), 3.0, dtype=np.float32)
        rois = np.array([[0, 2, 2, 10, 10]], dtype=np.float32)
        out = deform_roi_pool(x, rois, pooled_size=3, output_dim=4)
        assert out.shape == (1, 3, 3, 4)
        np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)

    def test_gradient_image(self):
        """Bins over a left-right ramp must increase monotonically in x."""
        from ocrfa_tpu.ops.deform_pool import deform_roi_pool

        ramp = np.tile(np.arange(16, dtype=np.float32)[None, :, None], (16, 1, 1))
        x = ramp[None]
        rois = np.array([[0, 0, 0, 15, 15]], dtype=np.float32)
        out = np.asarray(deform_roi_pool(x, rois, pooled_size=4, output_dim=1))[0, :, :, 0]
        assert np.all(np.diff(out, axis=1) > 0)

    def test_trans_offsets_shift_samples(self):
        from ocrfa_tpu.ops.deform_pool import deform_roi_pool

        ramp = np.tile(np.arange(16, dtype=np.float32)[None, :, None], (16, 1, 1))
        x = ramp[None]
        rois = np.array([[0, 2, 2, 12, 12]], dtype=np.float32)
        trans = np.zeros((1, 2, 2, 2), dtype=np.float32)
        trans[..., 1] = 1.0  # shift right by trans_std * roi_w
        base = np.asarray(deform_roi_pool(x, rois, pooled_size=2, output_dim=1,
                                          no_trans=True, part_size=2))
        shifted = np.asarray(deform_roi_pool(x, rois, trans, pooled_size=2,
                                             output_dim=1, no_trans=False,
                                             trans_std=0.1, part_size=2))
        assert np.all(shifted >= base - 1e-5)
        assert shifted.mean() > base.mean()


class TestUserNetworkHook:
    def test_custom_module_import(self, tmp_path, monkeypatch):
        """build_recognizer imports `<name>.build_recognizer` for custom nets
        (reference loads user models via importlib, utils.py:676)."""
        import sys

        mod = tmp_path / "mynet.py"
        mod.write_text(
            "def build_recognizer(sd, converter, network_params):\n"
            "    return ('custom', sorted(sd), converter, network_params)\n"
        )
        monkeypatch.syspath_prepend(str(tmp_path))
        # fake torch checkpoint
        import torch

        ckpt = tmp_path / "mynet.pth"
        torch.save({"w": torch.zeros(2)}, str(ckpt))

        from ocrfa_tpu.api import build_recognizer

        out = build_recognizer("mynet", {"hidden": 8}, "اب", {}, {}, str(ckpt))
        assert out[0] == "custom" and out[1] == ["w"]
        assert out[3] == {"hidden": 8}
        sys.modules.pop("mynet", None)


class TestDeformRoIPoolGroups:
    def test_position_sensitive_channel_mapping(self):
        """group_size=2: each pooled bin reads its own channel group."""
        from ocrfa_tpu.ops.deform_pool import deform_roi_pool

        c = 16
        x = np.broadcast_to(
            np.arange(c, dtype=np.float32), (1, 16, 16, c)
        ).copy()
        rois = np.array([[0, 0, 0, 15, 15]], dtype=np.float32)
        out = np.asarray(deform_roi_pool(
            x, rois, pooled_size=2, output_dim=4, group_size=2
        ))[0]
        cpg = c // 4  # channels per group cell
        for gy in range(2):
            for gx in range(2):
                cell = gy * 2 + gx
                expected = cell * cpg + np.arange(4)
                np.testing.assert_allclose(out[gy, gx], expected, atol=1e-4)


class TestMobileNetV3:
    @pytest.mark.parametrize("mode", ["large", "small"])
    def test_pyramid_shapes(self, mode):
        import jax

        from ocrfa_tpu.models.mobilenetv3 import (
            PYRAMID_CHANNELS_BY_MODE,
            init_mobilenetv3,
            mobilenetv3_backbone,
        )

        params = init_mobilenetv3(jax.random.PRNGKey(0), mode=mode)
        x = np.zeros((1, 64, 96, 3), dtype=np.float32)
        taps = mobilenetv3_backbone(params, x, mode=mode)
        assert len(taps) == 4
        chans = PYRAMID_CHANNELS_BY_MODE[mode]
        for tap, stride, c in zip(taps, (4, 8, 16, 32), chans):
            assert tap.shape == (1, 64 // stride, 96 // stride, c), (
                f"{mode} tap /{stride}: {tap.shape}"
            )

    def test_small_block_count_matches_reference_table2(self):
        """Reference small mode has 11 bottlenecks (mobilenetv3.py:146-157);
        its forward crashes (range(17) over 16 features, :210) — we fix the
        taps rather than replicate the crash."""
        from ocrfa_tpu.models.mobilenetv3 import _SETTINGS

        assert len(_SETTINGS["small"]) == 11
        assert len(_SETTINGS["large"]) == 15

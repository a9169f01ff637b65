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

    def test_bounded_dcn_impl_matches_gather_for_small_offsets(self):
        """dcn_impl="bounded2" == "gather" whenever offsets fit ±2 px.

        Offset convs are shrunk so every offset is guaranteed inside the
        radius (random-init offsets can exceed it); with that invariant
        the two formulations must agree through the full net."""
        import jax

        params = dbnet.init_dbnet(jax.random.PRNGKey(2), backbone="resnet18")

        def shrink(p):
            if isinstance(p, dict):
                return {k: (jax.tree.map(lambda a: a * 0.05, v)
                            if k == "conv2_offset" else shrink(v))
                        for k, v in p.items()}
            if isinstance(p, list):
                return [shrink(v) for v in p]
            return p

        params = shrink(params)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 64, 96, 3)).astype(np.float32) * 0.3
        ref = np.asarray(dbnet.dbnet_apply(params, x, backbone="resnet18"))
        ours = np.asarray(dbnet.dbnet_apply(params, x, backbone="resnet18",
                                            dcn_impl="bounded2"))
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-2)

    def test_dcn_guard_falls_back_on_large_offsets(self):
        """Bounded-impl guard (VERDICT r3 #2): a checkpoint whose measured
        |offset| p95 exceeds the clamp radius must warn and fall back to
        the exact gather formulation on the first batch."""
        import jax

        from ocrfa_tpu.detector_db import DBNetDetector

        params = dbnet.init_dbnet(jax.random.PRNGKey(3), backbone="resnet18")

        def scale_offsets(p, f):
            if isinstance(p, dict):
                return {k: (jax.tree.map(lambda a: a * f, v)
                            if k == "conv2_offset" else scale_offsets(v, f))
                        for k, v in p.items()}
            if isinstance(p, list):
                return [scale_offsets(v, f) for v in p]
            return p

        big = scale_offsets(params, 50.0)
        det = DBNetDetector(big, dcn_impl="bounded1")
        x = np.random.default_rng(0).standard_normal(
            (1, 64, 96, 3)).astype(np.float32)
        with pytest.warns(UserWarning, match="unsafe for this checkpoint"):
            det.image2hmap(x)
        assert det.dcn_impl == "gather"
        assert det.dcn_offset_stats["p95"] > 1.0
        # and the fallback actually runs
        assert det.image2hmap(x).shape == (1, 64, 96)

    def test_dcn_guard_keeps_bounded_for_small_offsets(self):
        import warnings

        import jax

        from ocrfa_tpu.detector_db import DBNetDetector

        params = dbnet.init_dbnet(jax.random.PRNGKey(3), backbone="resnet18")

        def shrink(p):
            if isinstance(p, dict):
                return {k: (jax.tree.map(lambda a: a * 1e-3, v)
                            if k == "conv2_offset" else shrink(v))
                        for k, v in p.items()}
            if isinstance(p, list):
                return [shrink(v) for v in p]
            return p

        det = DBNetDetector(shrink(params), dcn_impl="bounded1")
        x = np.random.default_rng(1).standard_normal(
            (1, 64, 96, 3)).astype(np.float32)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            det.image2hmap(x)
        assert det.dcn_impl == "bounded1"
        assert det.dcn_offset_stats["p95"] <= 1.0
        # guard runs once, not per batch
        det.image2hmap(x)

    def test_dcn_guard_opt_out(self):
        import jax

        from ocrfa_tpu.detector_db import DBNetDetector

        params = dbnet.init_dbnet(jax.random.PRNGKey(3), backbone="resnet18")
        det = DBNetDetector(params, dcn_impl="bounded2", dcn_guard=False)
        assert det._dcn_validated
        x = np.zeros((1, 64, 96, 3), dtype=np.float32)
        det.image2hmap(x)
        assert det.dcn_impl == "bounded2"
        assert det.dcn_offset_stats is None

    def test_zoo_init_convention_passes_guard(self):
        """Zoo applicability of the bounded fast path (VERDICT r3 #2):
        reference-architecture checkpoints ZERO-init their DCN offset
        convs — weight AND bias (dcn/modules/deform_conv.py:74-76,
        146-149 ``init_offset``) — so a zoo-layout state dict at that
        convention converts to offsets == 0 everywhere and bounded1 is
        EXACT for it.  Trained offsets can still grow past the radius
        (self-trained dbnet18 measured p95 8.1 px,
        EVAL_SELFTRAINED_DBNET_r3.json) which is what the first-batch
        guard catches; real zoo release files remain unmeasurable here
        (no network egress)."""
        import warnings

        import jax

        from ocrfa_tpu.checkpoints import export_dbnet
        from ocrfa_tpu.detector_db import DBNetDetector

        params = dbnet.init_dbnet(jax.random.PRNGKey(5), backbone="resnet18")
        sd = export_dbnet(params, data_parallel_prefix=True)
        n_off = 0
        for k in sd:
            if ".conv2_offset." in k:
                sd[k] = np.zeros_like(sd[k])
                n_off += 1
        assert n_off  # resnet18 stages 2-4 carry DCN offset convs
        det = DBNetDetector.from_torch(sd, dcn_impl="bounded1")
        x = np.random.default_rng(2).standard_normal(
            (1, 64, 96, 3)).astype(np.float32)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            det.image2hmap(x)
        assert det.dcn_impl == "bounded1"
        assert det.dcn_offset_stats["max"] == 0.0

    def test_resnet50_init_runs(self):
        import jax

        params = dbnet.init_dbnet(jax.random.PRNGKey(1), backbone="resnet50")
        x = np.zeros((1, 64, 64, 3), dtype=np.float32)
        y = dbnet.dbnet_apply(params, x, backbone="resnet50")
        assert y.shape == (1, 64, 64, 1)


@pytest.mark.slow
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

    def test_bounded_native_offset_penalty_plumbing(self):
        """dcn_impl="bounded1" + offset_penalty wires the hinge into the
        loss: inflated offsets yield a positive, finite penalty metric,
        and a huge margin zeroes it (VERDICT r3 #2b — convergence of the
        hinge is validated on the real TPU training run, not here: 12 CPU
        steps cannot visibly move x20-inflated offset convs)."""
        import jax
        import numpy as np

        from ocrfa_tpu.train import make_dbnet_train_step, make_optimizer

        params = dbnet.init_dbnet(jax.random.PRNGKey(1), backbone="resnet18")

        # start from offsets that clearly violate the radius
        def scale_offsets(p, f):
            if isinstance(p, dict):
                return {k: (jax.tree.map(lambda a: a * f, v)
                            if k == "conv2_offset" else scale_offsets(v, f))
                        for k, v in p.items()}
            if isinstance(p, list):
                return [scale_offsets(v, f) for v in p]
            return p

        params = scale_offsets(params, 20.0)
        opt = make_optimizer(2e-3)
        state = opt.init(params)

        rng = np.random.default_rng(1)
        h = w = 32
        gt = np.zeros((1, h, w, 1), np.float32)
        gt[:, 10:20, 5:25] = 1.0
        batch = {
            "image": rng.standard_normal((1, h, w, 3)).astype(np.float32) * 0.1,
            "gt": gt,
            "mask": np.ones((1, h, w), np.float32),
            "thresh_map": gt[..., 0] * 0.5,
            "thresh_mask": np.ones((1, h, w), np.float32),
        }

        step = make_dbnet_train_step(opt, dcn_impl="bounded1",
                                     offset_penalty=10.0)
        _p, _s, loss, metrics = step(params, state, batch)
        assert np.isfinite(float(loss))
        pen = float(metrics["offset_penalty"])
        assert np.isfinite(pen) and pen > 0.0

        # margin far beyond any offset -> hinge exactly zero
        step0 = make_dbnet_train_step(opt, dcn_impl="bounded1",
                                      offset_penalty=10.0,
                                      offset_margin=1e6)
        _p, _s, loss0, metrics0 = step0(params, state, batch)
        assert float(metrics0["offset_penalty"]) == 0.0
        # and with a zero hinge the two losses agree
        np.testing.assert_allclose(float(loss0), float(loss) - 10.0 * pen,
                                   rtol=1e-5)


class TestMobileNetV3Converter:
    def _parity(self, mode):
        import torch

        from tests.torch_replicas import MobileNetV3Ref

        torch.manual_seed(3)
        model = MobileNetV3Ref(mode).eval()
        _randomize_bn_stats(model, seed=3)
        sd = {f"backbone.{k}": v.detach().numpy()
              for k, v in model.state_dict().items()
              if "num_batches_tracked" not in k}
        params = checkpoints.convert_mobilenetv3(sd, mode=mode)

        from ocrfa_tpu.models.mobilenetv3 import mobilenetv3_backbone

        rng = np.random.default_rng(3)
        x = rng.standard_normal((1, 64, 96, 3), dtype=np.float32)
        with torch.no_grad():
            ref = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        ours = mobilenetv3_backbone(params, x, mode=mode)
        assert len(ours) == 4
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(
                np.asarray(o).transpose(0, 3, 1, 2), r.numpy(),
                atol=2e-4, rtol=1e-3)

    def test_large_parity(self):
        self._parity("large")

    def test_small_parity(self):
        self._parity("small")


class TestASFDecoderConverter:
    def _parity(self, attention_type):
        import torch

        from tests.torch_replicas import SegDetectorASFRef

        torch.manual_seed(4)
        model = SegDetectorASFRef(attention_type).eval()
        _randomize_bn_stats(model, seed=4)
        sd = {f"decoder.{k}": v.detach().numpy()
              for k, v in model.state_dict().items()
              if "num_batches_tracked" not in k}
        params = checkpoints._convert_dbnet_decoder(sd, bb={})
        assert checkpoints.asf_attention_type(params) == attention_type

        rng = np.random.default_rng(4)
        shapes = [(1, 64, 16, 24), (1, 128, 8, 12), (1, 256, 4, 6), (1, 512, 2, 3)]
        feats_t = [torch.from_numpy(
            rng.standard_normal(s, dtype=np.float32)) for s in shapes]
        with torch.no_grad():
            ref = model(feats_t).numpy()
        feats_j = [f.numpy().transpose(0, 2, 3, 1) for f in feats_t]
        ours = dbnet.seg_detector_asf(params["decoder"], feats_j,
                                      attention_type=attention_type)
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=2e-4, rtol=1e-3)

    def test_scale_spatial(self):
        self._parity("scale_spatial")

    def test_scale_channel_spatial(self):
        self._parity("scale_channel_spatial")

    def test_scale_channel(self):
        self._parity("scale_channel")

    def test_init_asf_mobilenet_runs(self):
        import jax

        params = dbnet.init_dbnet(jax.random.PRNGKey(2),
                                  backbone="mobilenetv3_small", decoder="asf")
        x = np.zeros((1, 64, 96, 3), dtype=np.float32)
        y = dbnet.dbnet_apply(params, x, backbone="mobilenetv3_small",
                              decoder="asf")
        assert y.shape == (1, 64, 96, 1)

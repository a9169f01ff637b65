"""int8 conv-tower quantization: dynamic and calibrated-static paths."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trainer/compile-heavy suite

import jax
import jax.numpy as jnp

from ocrfa_tpu.models.crnn import crnn_apply, init_crnn_gen1
from ocrfa_tpu.models.quant import (
    calibrate_crnn_gen1,
    crnn_apply_int8,
    crnn_apply_int8_static,
    quantize_crnn_gen1,
    quantize_crnn_gen1_static,
)


@pytest.fixture(scope="module")
def toy():
    params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=12,
                            output_channel=64, hidden_size=64)
    # give BN non-trivial running stats so folding is actually exercised
    # (crc32, not hash(): str hashing is salted per process and made the
    # sibling CRAFT suite's error gates a per-run lottery)
    import zlib

    def perturb(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else ""
        if name in ("mean", "var", "scale"):
            k = jax.random.fold_in(jax.random.PRNGKey(7),
                                   zlib.crc32(str(path).encode()) % 2**31)
            jitter = 0.2 * jax.random.normal(k, leaf.shape)
            return leaf + (jnp.abs(jitter) if name == "var" else jitter)
        return leaf
    params = jax.tree_util.tree_map_with_path(perturb, params)
    rng = np.random.default_rng(0)
    x = ((rng.integers(0, 255, (16, 64, 96, 1)) / 255.0 - 0.5) / 0.5).astype(np.float32)
    return params, x


class TestDynamicInt8:
    def test_argmax_identity(self, toy):
        params, x = toy
        ref = np.asarray(crnn_apply(params, jnp.asarray(x)), np.float32)
        got = np.asarray(crnn_apply_int8(quantize_crnn_gen1(params), jnp.asarray(x)),
                         np.float32)
        match = (ref.argmax(-1) == got.argmax(-1)).mean()
        assert match > 0.97, f"argmax identity {match:.4f}"


class TestStaticInt8:
    def test_argmax_identity(self, toy):
        params, x = toy
        amax = calibrate_crnn_gen1(params, [x])
        q = quantize_crnn_gen1_static(params, amax)
        ref = np.asarray(crnn_apply(params, jnp.asarray(x)), np.float32)
        got = np.asarray(crnn_apply_int8_static(q, jnp.asarray(x)), np.float32)
        match = (ref.argmax(-1) == got.argmax(-1)).mean()
        assert match > 0.97, f"argmax identity {match:.4f}"

    def test_calibration_keys_cover_every_conv(self, toy):
        params, x = toy
        amax = calibrate_crnn_gen1(params, [x])
        # gen1 [1,2,5,3]: 7 standalone convs + 11 blocks x 2 + 3 downsamples
        assert len(amax) == 7 + 22 + 3
        assert all(v > 0 for v in amax.values())

    def test_fold_matches_conv_bn(self, toy):
        """One folded-int8 conv ~= f32 conv + batch_norm."""
        from ocrfa_tpu.models.layers import batch_norm, conv2d
        from ocrfa_tpu.models.quant import _conv_static, _fold_quant_one

        params, x = toy
        cp = params["feat"]["conv0_2"]
        bnp = params["feat"]["bn0_2"]
        rng = np.random.default_rng(1)
        cin = cp["w"].shape[2]
        v = rng.uniform(-1, 1, (2, 16, 24, cin)).astype(np.float32)

        ref = np.asarray(batch_norm(conv2d(jnp.asarray(v), cp["w"], padding=1), bnp))
        q = _fold_quant_one(cp, bnp, float(np.abs(v).max()))
        got = np.asarray(_conv_static(jnp.asarray(v), q, 1, 1))
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 0.05, f"relative error {err:.4f}"

    def test_recognizer_static_mode(self, toy):
        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.pipeline import Recognizer

        conv = CTCLabelConverter("ابتثجخدذرزسشصضطظعغفقکگل")
        params = init_crnn_gen1(jax.random.PRNGKey(1), num_class=conv.num_classes,
                                output_channel=64, hidden_size=64)
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        rng = np.random.default_rng(2)
        batch = rng.integers(0, 255, (8, 64, 64, 1)).astype(np.uint8)
        calib = ((batch.astype(np.float32) / 255.0) - 0.5) / 0.5

        ref = Recognizer(params, conv).predict(batch, keep)
        got = Recognizer(params, conv, quantized="static",
                         calibration_batches=[calib]).predict(batch, keep)
        same = sum(a[0] == b[0] for a, b in zip(ref, got))
        assert same >= 7, f"{same}/8 texts identical"

    def test_static_requires_calibration(self, toy):
        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.pipeline import Recognizer

        params, _ = toy
        with pytest.raises(ValueError):
            Recognizer(params, CTCLabelConverter("اب"), quantized="static")


class TestActAmaxPersistence:
    def test_amax_roundtrip_identical_outputs(self, toy):
        """A recognizer rebuilt from the persisted act_amax tree (no
        calibration data) must produce the exact quantized params — the
        serve-startup path (server.build_pipeline_from_args --quantize
        static with a blob meta["act_amax"])."""
        import pickle

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.decode.device import keep_mask_for
        from ocrfa_tpu.pipeline import Recognizer

        params, x = toy
        conv = CTCLabelConverter("ابتثجخدذرزس")
        keep = keep_mask_for(conv.num_classes, conv.ignore_idx)
        r1 = Recognizer(params, conv, quantized="static",
                        calibration_batches=[x])
        assert r1.act_amax, "calibrated recognizer must expose act_amax"
        # the tree must survive a pickle round trip (blob meta persistence)
        amax = pickle.loads(pickle.dumps(r1.act_amax))
        r2 = Recognizer(params, conv, quantized="static", act_amax=amax)

        batch = np.random.default_rng(3).integers(
            0, 255, (8, 64, 64, 1)).astype(np.uint8)
        out1 = r1.predict(batch, keep)
        out2 = r2.predict(batch, keep)
        assert [t for t, _ in out1] == [t for t, _ in out2]
        np.testing.assert_allclose([c for _, c in out1],
                                   [c for _, c in out2], rtol=1e-6)

"""CTC loss wrapper behavior."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trainer/compile-heavy suite


class TestCTCLoss:
    def test_padding_invariance(self):
        """Extra label-column padding must not change the loss."""
        import jax

        from ocrfa_tpu.train import ctc_loss

        rng = np.random.default_rng(0)
        logits = rng.standard_normal((2, 12, 6)).astype(np.float32)
        labels = np.array([[1, 2, 3], [4, 5, 0]], dtype=np.int32)
        lengths = np.array([3, 2], dtype=np.int32)

        l1 = float(ctc_loss(logits, labels, lengths))
        padded = np.concatenate([labels, np.zeros((2, 4), np.int32)], axis=1)
        l2 = float(ctc_loss(logits, padded, lengths))
        assert np.isclose(l1, l2, rtol=1e-6)

    def test_perfect_prediction_low_loss(self):
        from ocrfa_tpu.train import ctc_loss

        # logits strongly favouring the path [1, 0, 2] -> label [1, 2]
        logits = np.full((1, 3, 3), -20.0, dtype=np.float32)
        logits[0, 0, 1] = 20.0
        logits[0, 1, 0] = 20.0
        logits[0, 2, 2] = 20.0
        labels = np.array([[1, 2]], dtype=np.int32)
        loss = float(ctc_loss(logits, labels, np.array([2], np.int32)))
        assert loss < 1e-3

    def test_gradient_flows(self):
        import jax

        from ocrfa_tpu.train import ctc_loss

        rng = np.random.default_rng(1)
        logits = rng.standard_normal((2, 8, 5)).astype(np.float32)
        labels = np.array([[1, 2], [3, 4]], dtype=np.int32)
        lengths = np.array([2, 2], dtype=np.int32)
        g = jax.grad(lambda lg: ctc_loss(lg, labels, lengths))(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestDistillStep:
    def test_kd_term_added_and_optimizes_toward_teacher(self):
        """make_train_step(distill=...) adds the framewise-KL teacher term:
        the distill loss exceeds the plain CTC loss at step 0 (positive KL
        against a different teacher) and repeated steps shrink the KL."""
        import jax
        import jax.numpy as jnp

        from ocrfa_tpu.models.crnn import crnn_apply, init_crnn_gen1
        from ocrfa_tpu.train import (ctc_loss, make_optimizer,
                                     make_train_step)

        rng = np.random.default_rng(0)
        images = rng.standard_normal((2, 64, 128, 1)).astype(np.float32) * 0.3
        labels = np.array([[1, 2, 0], [3, 1, 2]], np.int32)
        lengths = np.array([2, 3], np.int32)

        student = init_crnn_gen1(jax.random.PRNGKey(0), num_class=5,
                                 output_channel=64, hidden_size=64)
        teacher = init_crnn_gen1(jax.random.PRNGKey(7), num_class=5,
                                 output_channel=64, hidden_size=64)
        # random-init logits are ~1e-4 (near-uniform posteriors, KL ~ 0);
        # give the teacher a decisive head so there is something to match
        teacher["pred"]["b"] = jnp.asarray(
            np.array([0.0, 4.0, -2.0, 1.0, -3.0], np.float32))
        opt = make_optimizer(1e-3)

        plain = make_train_step(opt)
        kd = make_train_step(opt, distill=dict(params=teacher, weight=1.0,
                                               temp=2.0))
        s0 = opt.init(student)
        _, _, l_plain = plain(student, s0, images, labels, lengths)
        p, s, l_kd = kd(student, s0, images, labels, lengths)
        assert np.isfinite(float(l_kd))
        assert float(l_kd) > float(l_plain)  # the KL term is live

        def kl_to_teacher(sp):
            t = jax.nn.log_softmax(crnn_apply(teacher, images), axis=-1)
            st = jax.nn.log_softmax(
                crnn_apply(sp, images, train=True), axis=-1)
            return float(jnp.mean(jnp.sum(jnp.exp(t) * (t - st), axis=-1)))

        before = kl_to_teacher(student)
        for _ in range(8):
            p, s, _l = kd(p, s, images, labels, lengths)
        assert kl_to_teacher(p) < before


class TestStreamingTrainer:
    def test_train_gen1_streams_and_returns_calibrated_params(self):
        """The streaming trainer (scripts/eval_farsi.train_gen1) must run
        its producer thread to completion, train on fresh u8 batches, and
        return inference-calibrated params + normalized f32 calib batches."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
        import jax
        import jax.numpy as jnp
        from eval_farsi import train_gen1

        from ocrfa_tpu.models.crnn import crnn_apply

        charset = "ابت"
        params, conv, font, loss, calib = train_gen1(
            charset, steps=5, batch=4, oc=16, hs=16, glyph_w=8,
            verbose=False, reuse=2)
        assert np.isfinite(float(loss))
        assert len(calib) == 2
        # calib batches are normalized f32 in [-1, 1]
        assert calib[0].dtype == np.float32
        assert calib[0].min() >= -1.0 and calib[0].max() <= 1.0
        # BN running stats were calibrated (non-init var) and the model
        # runs in inference mode
        logits = crnn_apply(params, jnp.asarray(calib[0][:2]))
        assert logits.shape[0] == 2
        assert logits.shape[2] == conv.num_classes
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_sample_texts_space_structure(self):
        """Spaces are interior-only, never leading/trailing/adjacent."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
        from eval_farsi import sample_texts

        rng = np.random.default_rng(0)
        texts = sample_texts(rng, "ابت ", 200)
        for t in texts:
            assert not t.startswith(" ") and not t.endswith(" ")
            assert "  " not in t
            assert t.count(" ") <= 1

    def test_train_gen1_with_shaped_renderer_and_ema(self):
        """Renderer + EMA plumbing: rung widths probe measured shaped
        pixels, labels always match the rendered (possibly truncated)
        text, and the EMA/best-restore machinery runs to completion."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
        import pytest

        from eval_farsi import train_gen1

        try:
            from ocrfa_tpu.data import FontLineRenderer
            renderer = FontLineRenderer(height=64)
        except RuntimeError as e:
            pytest.skip(str(e))
        params, conv, font, loss, calib = train_gen1(
            "ابت", steps=5, batch=4, oc=16, hs=16, glyph_w=8,
            verbose=False, reuse=2, renderer=renderer, ema_decay=0.9)
        assert np.isfinite(float(loss))
        assert len(calib) == 2

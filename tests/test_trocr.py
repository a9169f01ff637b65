"""TrOCR-style recognizer: shapes, causal consistency, on-device decode."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trainer/compile-heavy suite

from ocrfa_tpu.models import trocr


@pytest.fixture(scope="module")
def small():
    import jax

    params = trocr.init_trocr(
        jax.random.PRNGKey(0), num_class=10, d_model=32, heads=4,
        enc_layers=2, dec_layers=2, max_src=64, max_tgt=16,
    )
    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 64, 32, 1)).astype(np.float32)
    return params, images


class TestTrOCR:
    def test_teacher_forced_shapes(self, small):
        params, images = small
        tokens = np.array([[1, 5, 6, 7], [1, 4, 2, 0]], dtype=np.int32)
        logits = trocr.trocr_apply(params, images, tokens, heads=4)
        # vocab = 10 - 1 + 3 specials = 12
        assert logits.shape == (2, 4, 12)

    def test_causality(self, small):
        # changing a later token must not affect earlier logits
        params, images = small
        t1 = np.array([[1, 5, 6, 7]], dtype=np.int32)
        t2 = np.array([[1, 5, 9, 3]], dtype=np.int32)
        l1 = np.asarray(trocr.trocr_apply(params, images[:1], t1, heads=4))
        l2 = np.asarray(trocr.trocr_apply(params, images[:1], t2, heads=4))
        np.testing.assert_allclose(l1[:, :2], l2[:, :2], atol=1e-5)
        assert np.abs(l1[:, 2:] - l2[:, 2:]).max() > 1e-6

    def test_incremental_matches_teacher_forced(self, small):
        """Greedy scan with KV cache must reproduce the teacher-forced
        argmax chain."""
        import jax.numpy as jnp

        params, images = small
        tokens, lengths = trocr.greedy_generate(params, images, heads=4, max_len=8)
        tokens = np.asarray(tokens)

        # re-derive greedily with full teacher forcing
        seq = np.full((2, 9), trocr.BOS, dtype=np.int32)
        done = np.zeros(2, bool)
        for i in range(8):
            logits = np.asarray(
                trocr.trocr_apply(params, images, jnp.asarray(seq[:, : i + 1]), heads=4)
            )
            nxt = logits[:, -1].argmax(-1).astype(np.int32)
            nxt = np.where(done, trocr.EOS, nxt)
            done |= nxt == trocr.EOS
            seq[:, i + 1] = nxt
        np.testing.assert_array_equal(tokens, seq[:, 1:])

    def test_loss_and_overfit_step(self, small):
        import jax
        import optax

        params, images = small
        tokens_in = np.array([[1, 5, 6], [1, 4, 2]], dtype=np.int32)
        tokens_out = np.array([[5, 6, 2], [4, 2, 0]], dtype=np.int32)

        loss_fn = lambda p: trocr.trocr_loss(p, images, tokens_in, tokens_out, heads=4)
        l0 = float(loss_fn(params))
        opt = optax.adam(1e-3)
        state = opt.init(params)
        p = params
        for _ in range(5):
            g = jax.grad(loss_fn)(p)
            updates, state = opt.update(g, state, p)
            p = optax.apply_updates(p, updates)
        l1 = float(trocr.trocr_loss(p, images, tokens_in, tokens_out, heads=4))
        assert np.isfinite(l0) and l1 < l0

    def test_tokens_to_text(self):
        chars = ["[blank]", "a", "b", "c"]
        tokens = np.array([[3, 4, 2, 2], [5, 2, 2, 2]])
        lengths = np.array([2, 1])
        assert trocr.tokens_to_text(tokens, lengths, chars) == ["ab", "c"]


class TestPretrainRecipe:
    def test_recipe_smoke_and_resume(self, tmp_path):
        """Two short runs: train + snapshot, then resume from the snapshot."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
        import pretrain_trocr

        ckpt = str(tmp_path / "ckpt")
        out = tmp_path / "m.json"
        rc = pretrain_trocr.main([
            "--small", "--steps", "4", "--batch", "4", "--width", "128",
            "--eval-every", "4", "--eval-lines", "4",
            "--ckpt-dir", ckpt, "--out", str(out)])
        assert rc == 0
        import json

        m = json.loads(out.read_text())
        assert m["steps"] == 4 and m["final_cer"] is not None

        # resume picks up the saved step and continues to 6
        rc = pretrain_trocr.main([
            "--small", "--steps", "6", "--batch", "4", "--width", "128",
            "--eval-every", "6", "--eval-lines", "4",
            "--ckpt-dir", ckpt, "--out", str(out)])
        assert rc == 0

    def test_ctc_to_trocr_tokens(self):
        import numpy as np

        from ocrfa_tpu.models.trocr import BOS, EOS, PAD
        from ocrfa_tpu.train import ctc_labels_to_trocr_tokens

        labels = np.array([[1, 2, 0], [3, 0, 0]], dtype=np.int32)
        lengths = np.array([2, 1], dtype=np.int32)
        tin, tout = ctc_labels_to_trocr_tokens(labels, lengths)
        np.testing.assert_array_equal(tin[0], [BOS, 3, 4, PAD])
        np.testing.assert_array_equal(tout[0], [3, 4, EOS, PAD])
        np.testing.assert_array_equal(tin[1], [BOS, 5, PAD, PAD])
        np.testing.assert_array_equal(tout[1], [5, EOS, PAD, PAD])


class TestTrocrRecognizer:
    """Facade-compatible wrapper: pipeline surface, masking, confidence."""

    @pytest.fixture(scope="class")
    def rec(self):
        import jax

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.pipeline import TrocrRecognizer

        charset = "ابجدهوز"
        conv = CTCLabelConverter(charset)
        params = trocr.init_trocr(
            jax.random.PRNGKey(1), num_class=conv.num_classes, d_model=32,
            heads=4, enc_layers=2, dec_layers=2, max_src=64, max_tgt=16)
        return TrocrRecognizer(params, conv, heads=4, max_len=8)

    def test_scored_matches_plain_generate(self, rec):
        """With an all-ones mask, greedy_generate_scored must emit the
        same tokens as greedy_generate."""
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        images = rng.standard_normal((3, 64, 32, 1)).astype(np.float32)
        keep = jnp.ones((rec.vocab,))
        t1, l1 = trocr.greedy_generate(rec.params, jnp.asarray(images),
                                       heads=4, max_len=8)
        t2, l2, confs = trocr.greedy_generate_scored(
            rec.params, jnp.asarray(images), keep, heads=4, max_len=8)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
        c = np.asarray(confs)
        assert ((0.0 <= c) & (c <= 1.0)).all()

    def test_pipeline_surface(self, rec):
        """predict_async/collect round the full packed-payload path."""
        from ocrfa_tpu.decode.device import keep_mask_for

        rng = np.random.default_rng(4)
        batch = rng.integers(0, 255, (4, 64, 32, 1)).astype(np.uint8)
        keep = keep_mask_for(rec.converter.num_classes,
                             rec.converter.ignore_idx)
        out = rec.collect(rec.predict_async(batch, keep))
        assert len(out) == 4
        for text, conf in out:
            assert isinstance(text, str)
            assert 0.0 <= conf <= 1.0
        # predict() (beam fallback) must agree with greedy
        assert rec.predict(batch, keep, decoder="beamsearch") == out

    def test_allowlist_masks_tokens(self, rec):
        """Masking all charset classes but one can only emit that char."""
        rng = np.random.default_rng(5)
        batch = rng.integers(0, 255, (2, 64, 32, 1)).astype(np.uint8)
        keep = np.zeros((rec.converter.num_classes,), np.float32)
        keep[0] = 1.0  # blank (unused by trocr) — parity with CTC masks
        keep[3] = 1.0  # only charset char index 2
        allowed = rec.converter.character[3]
        for text, _conf in rec.collect(rec.predict_async(batch, keep)):
            assert set(text) <= {allowed}

    def test_get_text_integration(self, rec):
        """The production get_text driver runs unchanged over the
        transformer recognizer (facade-injection path)."""
        from ocrfa_tpu.pipeline import get_text

        rng = np.random.default_rng(6)
        crops = [rng.integers(0, 255, (64, 40), dtype=np.uint8)
                 for _ in range(3)]
        il = []
        y = 0
        for c in crops:
            il.append(([[0, y], [40, y], [40, y + 64], [0, y + 64]], c))
            y += 70
        out = get_text("".join(rec.converter.character[1:]), 64, 64, rec, il)
        assert len(out) == 3
        for _box, text, conf in out:
            assert isinstance(text, str) and 0.0 <= conf <= 1.0

"""CTC loss wrapper behavior."""

import numpy as np


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

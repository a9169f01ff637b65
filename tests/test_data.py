"""Synthetic data pipeline tests."""

import numpy as np

from ocrfa_tpu.data import Prefetcher, SyntheticFarsiLines


class TestSyntheticFarsiLines:
    def test_batch_shapes_and_ranges(self):
        ds = SyntheticFarsiLines("ابتث", batch_size=8, width=192, seed=3)
        images, labels, lengths, texts = ds.batch()
        assert images.shape == (8, 64, 192, 1)
        assert images.min() >= -1.0 and images.max() <= 1.0
        assert labels.shape[0] == 8 and len(texts) == 8
        for lab, n, text in zip(labels, lengths, texts):
            assert n == len(text)
            assert all(lab[:n] > 0) and all(lab[n:] == 0)

    def test_deterministic_per_seed(self):
        a = SyntheticFarsiLines("اب", batch_size=4, seed=7).batch()
        b = SyntheticFarsiLines("اب", batch_size=4, seed=7).batch()
        np.testing.assert_array_equal(a[0], b[0])
        assert a[3] == b[3]

    def test_rtl_layout(self):
        ds = SyntheticFarsiLines("اب", batch_size=1, width=96, glyph_w=24,
                                 noise=0.0, seed=0)
        img = ds.render("اب")
        # first logical char occupies the RIGHTMOST glyph cell
        first = ds.font["ا"]
        np.testing.assert_array_equal(img[:, 24:48], first)

    def test_trains_with_ctc(self):
        """One train step on a synthetic batch runs and yields finite loss."""
        import jax

        from ocrfa_tpu.models.crnn import init_crnn_gen1
        from ocrfa_tpu.train import make_optimizer, make_train_step

        ds = SyntheticFarsiLines("ابتث", batch_size=4, width=128)
        images, labels, lengths, _ = ds.batch()
        params = init_crnn_gen1(jax.random.PRNGKey(0), num_class=5,
                                output_channel=64, hidden_size=64)
        opt = make_optimizer()
        step = make_train_step(opt)
        _, _, loss = step(params, opt.init(params), images, labels, lengths)
        assert np.isfinite(float(loss))


class TestPrefetcher:
    def test_prefetch_order(self):
        pf = Prefetcher(iter(range(5)), depth=2)
        assert list(pf) == [0, 1, 2, 3, 4]

    def test_close(self):
        pf = Prefetcher(iter(range(1000)), depth=2)
        next(pf)
        pf.close()

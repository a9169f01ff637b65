"""Synthetic data pipeline tests."""

import pytest
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

    @pytest.mark.slow
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


class TestFontLineRenderer:
    """Shaped real-typography rendering (skipped if PIL lacks libraqm)."""

    @staticmethod
    def _renderer():
        import pytest

        from ocrfa_tpu.data import FontLineRenderer

        try:
            return FontLineRenderer(height=64)
        except RuntimeError as e:
            pytest.skip(str(e))

    def test_render_shape_and_ink(self):
        r = self._renderer()
        crop = r.render("سلام دنیا")
        assert crop.dtype == np.uint8
        assert crop.shape[0] == 64
        # white background at the corners, real ink somewhere
        assert crop[0, 0] == 255 and crop[-1, -1] == 255
        assert (crop < 128).sum() > 50

    def test_measure_monotonic_and_matches_render(self):
        r = self._renderer()
        short, long = "اب", "ابجدهوزحطی"
        assert r.measure(long) > r.measure(short) > 0
        crop = r.render(long)
        assert crop.shape[1] == max(8, r.measure(long)) + 2 * r.margin

    def test_fit_text_truncates_to_budget(self):
        r = self._renderer()
        text = "ابجد هوز حطی کلمن"
        budget = r.measure(text) // 2
        fitted = r.fit_text(text, budget)
        assert fitted and r.measure(fitted) <= budget
        assert text.startswith(fitted)

    def test_shaping_is_contextual(self):
        """Joined text is narrower than the sum of isolated letterforms —
        proof the render goes through real shaping, not glyph stamping."""
        r = self._renderer()
        word = "بببب"
        assert r.measure(word) < 4 * r.measure("ب")

    def test_covers(self):
        r = self._renderer()
        assert r.covers("سلام دنیا")
        assert not r.covers("ٱۀ")  # known gaps in DejaVu Sans


class TestRtlLetters:
    def test_filters_to_safe_subset(self):
        from ocrfa_tpu.data import rtl_letters

        sub = rtl_letters("اب1a ًA")
        assert "ا" in sub and "ب" in sub and " " in sub
        assert "1" not in sub and "a" not in sub and "ً" not in sub


class TestMultiFontLineRenderer:
    def test_pick_stable_under_truncation(self):
        import pytest

        from ocrfa_tpu.data import FontLineRenderer, MultiFontLineRenderer

        try:
            mix = MultiFontLineRenderer([FontLineRenderer(height=64),
                                         FontLineRenderer(height=64, bold=True)])
        except RuntimeError as e:
            pytest.skip(str(e))
        text = "ابجد هوز حطی"
        fitted = mix.fit_text(text, mix.measure(text) // 2)
        # same underlying renderer before and after truncation
        assert mix._pick(text) is mix._pick(fitted)
        crop = mix.render(fitted)
        assert crop.shape == (64, max(8, mix.measure(fitted)) + 2 * mix.margin)
        # both fonts are actually reachable across different first letters
        picks = {id(mix._pick(c)) for c in "ابجدهوزحطيكلمنسعفص"}
        assert len(picks) == 2


class TestShapedFarsiLines:
    def test_batch_contract_matches_synthetic(self):
        """Same yield contract as SyntheticFarsiLines: normalized f32
        images, visual-order labels that index the FULL charset exactly
        like CTCLabelConverter.dict (duplicates: last occurrence wins)."""
        import pytest

        from ocrfa_tpu.data import ShapedFarsiLines
        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.registry import RECOGNITION_MODELS

        chars = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
        try:
            ds = ShapedFarsiLines(chars, batch_size=6, width=256, seed=3)
        except RuntimeError as e:
            pytest.skip(str(e))
        conv = CTCLabelConverter(chars)
        images, labels, lengths, texts = ds.batch()
        assert images.shape == (6, 64, 256, 1)
        assert images.dtype == np.float32
        assert images.min() >= -1.0 and images.max() <= 1.0
        for t, lab, n in zip(texts, labels, lengths):
            assert n == len(t)
            assert [conv.dict[c] for c in t[::-1]] == list(lab[:n])
            assert (lab[n:] == 0).all()

    def test_clean_eval_mode_deterministic(self):
        import pytest

        from ocrfa_tpu.data import ShapedFarsiLines

        try:
            a = ShapedFarsiLines("ابجدهوز ", batch_size=3, seed=7,
                                 jitter=False)
            b = ShapedFarsiLines("ابجدهوز ", batch_size=3, seed=7,
                                 jitter=False)
        except RuntimeError as e:
            pytest.skip(str(e))
        ia, *_ , ta = a.batch()
        ib, *_ , tb = b.batch()
        assert ta == tb
        np.testing.assert_array_equal(ia, ib)

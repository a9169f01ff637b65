"""Self-trained e2e pieces: shaped char quads, the detection-crop
augmentation, and the trainer's warm-start path."""

import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trainer/compile-heavy suite

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))


@pytest.fixture(scope="module")
def renderer():
    try:
        from ocrfa_tpu.data import FontLineRenderer
        return FontLineRenderer(height=64)
    except RuntimeError as e:
        pytest.skip(str(e))


class TestCharQuadsShaped:
    def test_spans_cover_run_rtl(self, renderer):
        from eval_selftrained import char_quads_shaped

        text = "ابتث جح"
        words = char_quads_shaped(text, renderer)
        assert len(words) == 2  # split at the space
        crop = renderer.render(text)
        flat = [q for w in words for q in w]
        for q in flat:
            assert q[:, 0].min() >= 0 and q[:, 0].max() <= crop.shape[1]
            assert q[:, 1].min() == 0 and q[:, 1].max() == renderer.height
        # logical char 0 is the RIGHTMOST glyph (RTL): its span must sit
        # right of the last word's spans
        first = words[0][0]
        last = words[-1][-1]
        assert first[:, 0].min() > last[:, 0].max() - 1

    def test_zero_width_ligature_chars_dropped(self, renderer):
        from eval_selftrained import char_quads_shaped

        # lam + alef usually ligates; quads must never be degenerate
        words = char_quads_shaped("لا", renderer)
        for w in words:
            for q in w:
                assert q[:, 0].max() - q[:, 0].min() >= 1.0

    def test_ligature_spans_fold_into_neighbors(self, renderer):
        """Degenerate (near-zero-advance) joined forms must not leave
        SUPERVISION GAPS: their span folds into a neighbouring char's
        quad, so each word's quads tile its full x-extent contiguously
        (affinity gaps at ligatures trained detectors that emitted
        disconnected fragment boxes — r3 FP audit, diag_craft_arm.py)."""
        from eval_selftrained import char_quads_shaped

        for text in ("لا", "للا", "ابتث جلا", "لالا"):
            for word in char_quads_shaped(text, renderer):
                spans = sorted((q[:, 0].min(), q[:, 0].max()) for q in word)
                for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                    assert b0 - a1 <= 0.51, (text, spans)


class TestDetCropAugment:
    def test_shape_and_dtype(self, renderer):
        from eval_selftrained import det_crop_augment

        crop = renderer.render("ابتث جح")
        rng = np.random.default_rng(1)
        for _ in range(8):
            out = det_crop_augment(crop, rng)
            assert out.dtype == np.uint8
            assert out.shape[0] == crop.shape[0]
            assert out.shape[1] >= 8

    def test_ink_preserved(self, renderer):
        from eval_selftrained import det_crop_augment

        crop = renderer.render("ابتث جح")
        rng = np.random.default_rng(2)
        base_ink = (crop < 128).mean()
        for _ in range(8):
            out = det_crop_augment(crop, rng)
            # margins/tilt shrink glyphs but the line must stay readable
            assert (out < 128).mean() > 0.4 * base_ink

    def test_negative_and_asymmetric_pads_keep_model_height(self, renderer):
        # DB arms CLIP the top edge (r4 diag: top_out p5 = -4 px) while
        # padding the bottom; every augmented crop must still come back at
        # model height — a clipped 63px return broke render_batch's fixed
        # 64-row canvas mid-fine-tune
        from eval_selftrained import det_crop_augment

        crop = renderer.render("ابتث جح")
        rng = np.random.default_rng(3)
        for _ in range(64):
            out = det_crop_augment(crop, rng, pad_top=(-4, 5),
                                   pad_bot=(2, 11), pad_lr=(3, 9), tilt=0.0)
            assert out.shape[0] == crop.shape[0]
            assert out.dtype == np.uint8

    def test_clean_anchor_identity(self, renderer):
        from eval_selftrained import det_crop_augment

        crop = renderer.render("اب")

        class FixedRng:
            def random(self):
                return 0.0  # always below the 0.3 anchor probability

        out = det_crop_augment(crop, FixedRng())
        np.testing.assert_array_equal(out, crop)


class TestShapedPages:
    def test_records_match_quads(self, renderer):
        from eval_selftrained import make_shaped_pages

        pages, line_quads, char_structs, records = make_shaped_pages(
            2, renderer, "ابتث ", page=256, seed=3, max_len=5)
        assert len(pages) == 2
        for page_img, lines, recs in zip(pages, line_quads, records):
            assert page_img.shape == (256, 256)
            assert len(lines) == len(recs)
            for quad, (text, box) in zip(lines, recs):
                assert text
                x0, y0, x1, y1 = box
                np.testing.assert_allclose(
                    quad, [[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
                # ink actually sits inside the recorded box
                assert (page_img[y0:y1, x0:x1] < 128).any()


class TestDbRoundtripExpansion:
    def test_roundtrip_identity(self):
        from eval_selftrained import _rect, expand_quads_for_db

        for w, h in [(250, 64), (120, 40), (400, 64)]:
            out = expand_quads_for_db([[_rect(10, 20, 10 + w, 20 + h)]]
                                      )[0][0]
            we = out[:, 0].max() - out[:, 0].min()
            he = out[:, 1].max() - out[:, 1].min()
            r, k = 0.4, 1.5
            ds = we * he * (1 - r * r) / (2 * (we + he))
            w1, h1 = we - 2 * ds, he - 2 * ds
            du = w1 * h1 * k / (2 * (w1 + h1))
            assert abs((he - 2 * ds + 2 * du) - h) < 0.5
            assert abs((we - 2 * ds + 2 * du) - w) < 0.5
            # expansion is centered
            np.testing.assert_allclose(out.mean(axis=0),
                                       [10 + w / 2, 20 + h / 2])


class TestWarmStart:
    def test_train_gen1_warm_start_resumes(self):
        import jax
        from eval_farsi import train_gen1

        from ocrfa_tpu.decode import CTCLabelConverter
        from ocrfa_tpu.models.crnn import init_crnn_gen1

        charset = "ابت"
        conv = CTCLabelConverter(charset)
        init = init_crnn_gen1(jax.random.PRNGKey(7),
                              num_class=conv.num_classes,
                              output_channel=16, hidden_size=16)
        params, conv2, _font, loss, calib = train_gen1(
            charset, steps=5, batch=4, oc=16, hs=16, glyph_w=8,
            verbose=False, reuse=2, init_params=init, warm_start=True)
        assert np.isfinite(float(loss))
        # training moved the params away from the provided start
        a = np.asarray(jax.tree.leaves(params)[0])
        b = np.asarray(jax.tree.leaves(init)[0])
        assert not np.allclose(a, b)
        assert len(calib) == 2

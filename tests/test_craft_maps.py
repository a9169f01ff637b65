"""CRAFT supervision maps (geometry/craft_maps.py) + the CRAFT trainer.

Geometry checks use axis-aligned character boxes (warped-gaussian peaks
and affinity placement have closed-form positions there); the trainer
test drives make_craft_train_step on a width-scaled model.
"""

import pytest
import numpy as np

from ocrfa_tpu.geometry.craft_maps import (
    affinity_quad,
    craft_supervision_maps,
    gaussian_template,
    make_craft_batch,
    splat_quads,
)


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)


class TestGaussianTemplate:
    def test_peak_and_symmetry(self):
        g = gaussian_template(64)
        assert g.shape == (64, 64)
        c = (64 - 1) // 2
        assert g.max() <= 1.0 and g[c:c + 2, c:c + 2].max() > 0.99
        np.testing.assert_allclose(g, g.T, atol=1e-6)
        np.testing.assert_allclose(g, g[::-1, ::-1], atol=1e-6)

    def test_edges_are_soft(self):
        g = gaussian_template(64)
        assert g[0, 0] < 0.05              # corner ~ 2.8 sigma
        assert 0.05 < g[31, 0] < 0.3       # edge midpoint ~ 2 sigma


class TestAffinityQuad:
    def test_bridges_adjacent_boxes(self):
        a = _rect(0, 0, 10, 10)
        b = _rect(12, 0, 22, 10)
        quad = affinity_quad(a, b)
        # joins the triangle centroids: x spans the two box centers,
        # y pinches toward the vertical center
        assert abs(quad[0][0] - 5.0) < 1e-9 and abs(quad[1][0] - 17.0) < 1e-9
        assert quad[:, 1].min() > 0 and quad[:, 1].max() < 10
        # upper centroids above the center line, lower below
        assert quad[0][1] < 5.0 < quad[3][1]


class TestSplat:
    def test_peak_at_quad_center(self):
        canvas = splat_quads((60, 80), [_rect(20, 10, 44, 34)])
        yy, xx = np.unravel_index(np.argmax(canvas), canvas.shape)
        assert abs(xx - 32) <= 1 and abs(yy - 22) <= 1
        assert canvas.max() > 0.95
        assert canvas[0, 0] == 0.0 and canvas[:, 60:].max() < 0.05

    def test_max_composition_of_overlaps(self):
        one = splat_quads((40, 40), [_rect(4, 4, 24, 24)])
        two = splat_quads((40, 40), [_rect(4, 4, 24, 24), _rect(14, 14, 34, 34)])
        assert (two >= one - 1e-6).all()

    def test_degenerate_quad_is_skipped(self):
        canvas = splat_quads((40, 40), [_rect(10, 10, 10, 30)])
        assert canvas.sum() == 0.0

    def test_collinear_quad_with_nondegenerate_bbox_is_skipped(self):
        # affinity quad of two zero-area char boxes: coincident point
        # pairs on a diagonal — singular homography, non-empty bbox
        quad = np.array([[10, 10], [30, 30], [30, 30], [10, 10]], np.float64)
        canvas = splat_quads((40, 40), [quad])
        assert canvas.sum() == 0.0


class TestSupervisionMaps:
    def test_region_and_affinity_layout(self):
        chars = [_rect(10, 40, 40, 70), _rect(44, 40, 74, 70)]
        maps = craft_supervision_maps((128, 128), [chars])
        assert maps["region"].shape == (64, 64)
        # two region peaks at the half-res char centers
        assert maps["region"][27, 12] > 0.9    # (25/2, 55/2)
        assert maps["region"][27, 29] > 0.9
        # one affinity blob between them, none at the char centers' outside
        assert maps["affinity"][27, 21] > 0.5
        assert maps["affinity"][5, 5] == 0.0

    def test_single_char_line_has_no_affinity(self):
        maps = craft_supervision_maps((64, 64), [[_rect(10, 10, 30, 30)]])
        assert maps["region"].max() > 0.9
        assert maps["affinity"].sum() == 0.0

    def test_make_craft_batch(self):
        imgs = np.zeros((2, 64, 64, 3), np.float32)
        quads = [[[_rect(8, 8, 24, 24)]], [[]]]
        batch = make_craft_batch(imgs, quads)
        assert batch["region"].shape == (2, 32, 32)
        assert batch["affinity"].shape == (2, 32, 32)
        assert batch["region"][1].sum() == 0.0

    def test_batch_length_mismatch_raises(self):
        import pytest

        with pytest.raises(ValueError):
            make_craft_batch(np.zeros((2, 32, 32, 3), np.float32), [[]])


@pytest.mark.slow
class TestCraftLoss:
    def _batch(self):
        rng = np.random.default_rng(0)
        imgs = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.1
        return make_craft_batch(imgs, [[[_rect(8, 20, 28, 44),
                                         _rect(32, 20, 52, 44)]]])

    def test_perfect_prediction_scores_zero(self):
        from ocrfa_tpu.train import craft_ohem_mse_loss

        batch = self._batch()
        pred = np.stack([batch["region"], batch["affinity"]], axis=-1)
        assert float(craft_ohem_mse_loss(pred, batch)) < 1e-10

    def test_wrong_prediction_scores_positive(self):
        from ocrfa_tpu.train import craft_ohem_mse_loss

        batch = self._batch()
        pred = np.zeros((1, 32, 32, 2), np.float32)
        assert float(craft_ohem_mse_loss(pred, batch)) > 0.05

    def test_train_step_reduces_loss(self):
        import jax

        from ocrfa_tpu.models.craft import init_craft
        from ocrfa_tpu.train import make_craft_train_step, make_optimizer

        batch = self._batch()
        params = init_craft(jax.random.PRNGKey(0), base=8)
        opt = make_optimizer(1e-3)
        step = make_craft_train_step(opt)
        p, s = params, opt.init(params)
        losses = []
        for _ in range(4):
            p, s, loss = step(p, s, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

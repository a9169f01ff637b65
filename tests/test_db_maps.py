"""DB supervision-map generator (geometry/db_maps.py).

Geometry checks are exact-by-construction on axis-aligned rectangles
(shrink distance and border band have closed forms there); the trainer
integration proves the generated batch drives a real DBNet train step.
"""

import pytest
import numpy as np

from ocrfa_tpu.geometry.db_maps import (
    db_supervision_maps,
    make_db_batch,
    quad_from_ref_box,
)

RECT = np.array([[10, 20], [80, 20], [80, 50], [10, 50]], dtype=np.float64)
# area 70*30, perimeter 200 -> D = 2100 * (1 - 0.16) / 200 = 8.82
D = 2100 * (1 - 0.4 ** 2) / 200.0


class TestRectangleGeometry:
    def setup_method(self):
        self.maps = db_supervision_maps((100, 100), [RECT])

    def test_gt_is_the_shrunk_interior(self):
        gt = self.maps["gt"]
        assert gt[35, 45] == 1.0                       # deep interior
        assert gt[22, 12] == 0.0                       # 2px inside the edge
        assert gt[35, 45 + 0] == 1.0
        # first gt row along x=45: starts ~D inside the top edge
        ys = np.flatnonzero(gt[:, 45])
        assert abs(ys.min() - (20 + D)) <= 1.5
        assert abs(ys.max() - (50 - D)) <= 1.5

    def test_mask_defaults_to_ones(self):
        assert (self.maps["mask"] == 1.0).all()

    def test_thresh_map_peaks_at_the_boundary(self):
        tm = self.maps["thresh_map"]
        assert tm[20, 45] > 0.65                       # on the top edge
        assert abs(tm[0, 0] - 0.3) < 1e-6              # background floor
        # halfway across the band: 0.3 + 0.4 * (1 - 0.5) = 0.5
        mid = tm[int(round(20 - D / 2)), 45]
        assert 0.40 < mid < 0.60
        assert tm.max() <= 0.7 + 1e-6 and tm.min() >= 0.3 - 1e-6

    def test_thresh_mask_covers_both_sides_of_the_edge(self):
        bm = self.maps["thresh_mask"]
        assert bm[int(20 - D / 2), 45] == 1.0          # outside band
        assert bm[int(20 + D / 2), 45] == 1.0          # inside band
        assert bm[0, 0] == 0.0
        assert bm[35, 45] == 0.0                       # deep interior

    def test_band_width_is_the_shrink_distance(self):
        bm = self.maps["thresh_mask"][:, 45]
        top = np.flatnonzero(bm[:35])
        assert abs(top.min() - (20 - D)) <= 1.5


class TestIgnoreAndDegenerate:
    def test_ignore_flag_masks_without_gt(self):
        maps = db_supervision_maps((100, 100), [RECT], ignore=[True])
        assert maps["gt"].sum() == 0
        assert maps["mask"][35, 45] == 0.0
        assert maps["mask"][0, 0] == 1.0

    def test_tiny_polygon_is_ignored(self):
        tiny = np.array([[5, 5], [11, 5], [11, 11], [5, 11]], np.float64)
        maps = db_supervision_maps((50, 50), [tiny], min_text_size=8)
        assert maps["gt"].sum() == 0
        assert maps["mask"][8, 8] == 0.0

    def test_edt_shrink_never_annihilates_thin_text(self):
        # Divergence from vertex-clipper shrinking (upstream DB), on
        # purpose: D = A(1-r^2)/L is always below the raster inradius, so
        # the EDT shrink keeps a spine even for very thin regions where
        # pyclipper's vertex offsets cave in and the sample gets thrown
        # away.  Thin lines stay trainable.
        thin = np.array([[10, 20], [90, 20], [90, 23], [10, 23]], np.float64)
        maps = db_supervision_maps((50, 110), [thin], min_text_size=2)
        assert maps["gt"].sum() > 0
        assert (maps["mask"] == 1.0).all()

    def test_two_char_degenerate_polygon_is_skipped(self):
        maps = db_supervision_maps((20, 20), [np.array([[1, 1], [5, 5]])])
        assert maps["gt"].sum() == 0
        assert (maps["mask"] == 1.0).all()

    def test_fully_offimage_polygon_is_skipped(self):
        off = RECT - [200, 200]
        maps = db_supervision_maps((100, 100), [off])
        assert maps["gt"].sum() == 0
        assert (maps["mask"] == 1.0).all()

    def test_partially_offimage_polygon_clips(self):
        maps = db_supervision_maps((100, 100), [RECT - [30, 0]])
        assert maps["gt"].sum() > 0
        assert maps["gt"].shape == (100, 100)

    def test_ignore_length_mismatch_raises(self):
        import pytest

        with pytest.raises(ValueError):
            db_supervision_maps((100, 100), [RECT, RECT + 5], ignore=[True])


class TestOverlapAndBatch:
    def test_overlapping_polygons_take_the_max(self):
        other = RECT + [5, 5]
        one = db_supervision_maps((100, 100), [RECT])
        both = db_supervision_maps((100, 100), [RECT, other])
        assert (both["gt"] >= one["gt"]).all()
        assert (both["thresh_map"] >= one["thresh_map"] - 1e-6).all()

    def test_quad_from_ref_box(self):
        q = quad_from_ref_box([10, 80, 20, 50])
        np.testing.assert_array_equal(q, RECT)

    def test_make_db_batch_shapes(self):
        imgs = np.zeros((2, 64, 64, 3), np.float32)
        polys = [[quad_from_ref_box([8, 56, 10, 30])],
                 [quad_from_ref_box([8, 56, 34, 54]),
                  quad_from_ref_box([8, 30, 6, 28])]]
        batch = make_db_batch(imgs, polys)
        for key in ("gt", "mask", "thresh_map", "thresh_mask"):
            assert batch[key].shape == (2, 64, 64)
        assert batch["image"].shape == (2, 64, 64, 3)
        assert batch["gt"][0].sum() > 0

    def test_batch_length_mismatch_raises(self):
        import pytest

        with pytest.raises(ValueError):
            make_db_batch(np.zeros((2, 32, 32, 3), np.float32), [[]])

    def test_batch_ignore_accepts_arrays_and_checks_length(self):
        import pytest

        imgs = np.zeros((2, 32, 32, 3), np.float32)
        polys = [[quad_from_ref_box([4, 28, 4, 28])]] * 2
        batch = make_db_batch(imgs, polys,
                              ignore_per_image=np.array([[True], [False]]))
        assert batch["mask"][0].min() == 0.0  # page 0's polygon ignored
        with pytest.raises(ValueError):
            make_db_batch(imgs, polys, ignore_per_image=[[True]])


@pytest.mark.slow
class TestTrainerIntegration:
    def test_generated_maps_drive_a_dbnet_train_step(self):
        import jax

        from ocrfa_tpu.models.dbnet import init_dbnet
        from ocrfa_tpu.train import make_dbnet_train_step, make_optimizer

        rng = np.random.default_rng(0)
        img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.1
        batch = make_db_batch(img, [[quad_from_ref_box([8, 56, 20, 44])]])

        params = init_dbnet(jax.random.PRNGKey(0), backbone="resnet18")
        opt = make_optimizer(1e-3)
        step = make_dbnet_train_step(opt)
        p, s = params, opt.init(params)
        p, s, loss, metrics = step(p, s, batch)
        assert np.isfinite(float(loss)) and float(loss) > 0
        assert "bce_loss" in metrics and "l1_loss" in metrics

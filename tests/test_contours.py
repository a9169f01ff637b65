"""Tests for contour tracing, DP simplification, fill, and unclip."""

import numpy as np

from ocrfa_tpu.geometry.contours import (
    approx_poly_dp,
    arc_length,
    fill_poly,
    find_contours,
    polygon_area,
    polygon_mean,
    unclip,
)


class TestFindContours:
    def test_single_rect(self):
        bmp = np.zeros((20, 30), dtype=np.uint8)
        bmp[5:15, 10:25] = 1
        contours = find_contours(bmp)
        assert len(contours) == 1
        c = contours[0]
        assert c[:, 0].min() == 10 and c[:, 0].max() == 24
        assert c[:, 1].min() == 5 and c[:, 1].max() == 14

    def test_two_components(self):
        bmp = np.zeros((20, 30), dtype=np.uint8)
        bmp[2:6, 2:8] = 1
        bmp[10:15, 15:28] = 1
        assert len(find_contours(bmp)) == 2

    def test_single_pixel(self):
        bmp = np.zeros((5, 5), dtype=np.uint8)
        bmp[2, 2] = 1
        contours = find_contours(bmp)
        assert len(contours) == 1 and len(contours[0]) == 1


class TestApproxPolyDP:
    def test_rectangle_simplifies_to_corners(self):
        bmp = np.zeros((40, 60), dtype=np.uint8)
        bmp[10:30, 15:50] = 1
        contour = find_contours(bmp)[0]
        eps = 0.02 * arc_length(contour)
        approx = approx_poly_dp(contour, eps)
        assert 4 <= len(approx) <= 6

    def test_below_epsilon_collapses(self):
        pts = np.array([[0, 0], [5, 0.1], [10, 0], [10, 10], [0, 10]])
        out = approx_poly_dp(pts, epsilon=1.0)
        assert len(out) <= 4


class TestFillPoly:
    def test_rect_area(self):
        mask = fill_poly((20, 20), [[2, 3], [12, 3], [12, 9], [2, 9]])
        assert mask.sum() > 0
        ys, xs = np.nonzero(mask)
        assert xs.min() >= 2 and xs.max() <= 12 and ys.min() >= 3 and ys.max() <= 9

    def test_polygon_mean(self):
        hmap = np.zeros((20, 20), dtype=np.float32)
        hmap[5:10, 5:10] = 1.0
        score = polygon_mean(hmap, np.array([[5, 5], [9, 5], [9, 9], [5, 9]]))
        assert score > 0.9


class TestUnclip:
    def test_rect_expansion(self):
        box = np.array([[10, 10], [40, 10], [40, 20], [10, 20]], dtype=np.float64)
        area = polygon_area(box)
        length = arc_length(box)
        d = area * 1.5 / length
        out = unclip(box, 1.5)
        assert out.dtype != object
        pts = out.reshape(-1, 2)
        # expansion reaches ~d beyond each side
        assert pts[:, 0].min() <= 10 - d + 1.5
        assert pts[:, 0].max() >= 40 + d - 1.5
        grown_area = polygon_area(pts)
        assert grown_area > area


class TestDBNetPost:
    def test_boxes_from_bitmap(self):
        from ocrfa_tpu.detector_db import DBNetDetector

        det = object.__new__(DBNetDetector)  # postprocessing only
        hmap = np.zeros((64, 96), dtype=np.float32)
        hmap[20:30, 10:60] = 0.9
        hmap[40:50, 30:80] = 0.85
        bitmap = hmap > 0.2
        boxes, scores = det.boxes_from_bitmap(hmap, bitmap, 96, 64)
        kept = [b for b, s in zip(boxes, scores) if s > 0]
        assert len(kept) == 2
        for box in kept:
            arr = np.array(box)
            assert arr.shape == (4, 2)

    def test_hmap2bbox_zero_filter(self):
        from ocrfa_tpu.detector_db import DBNetDetector

        det = object.__new__(DBNetDetector)
        hmap = np.zeros((1, 64, 96), dtype=np.float32)
        boxes, scores = det.hmap2bbox([(64, 96)], hmap)
        assert boxes == [()] and scores == [()]

    def test_polygons_from_bitmap(self):
        from ocrfa_tpu.detector_db import DBNetDetector

        det = object.__new__(DBNetDetector)
        hmap = np.zeros((64, 96), dtype=np.float32)
        hmap[20:35, 10:70] = 0.9
        bitmap = hmap > 0.2
        polys, scores = det.polygons_from_bitmap(hmap, bitmap, 96, 64)
        assert len(polys) == 1
        assert np.array(polys[0]).shape[1] == 2


class TestUnclipRotated:
    def test_rotated_rect_expansion(self):
        """min-area rect of a round-join offset rectangle equals the
        original expanded by the offset distance on each side."""
        from ocrfa_tpu.detector_db import get_mini_boxes

        theta = np.deg2rad(20)
        c, s = np.cos(theta), np.sin(theta)
        base = np.array([[0, 0], [60, 0], [60, 16], [0, 16]], dtype=np.float64)
        rot = base @ np.array([[c, s], [-s, c]]) + [40, 40]
        d = polygon_area(rot) * 1.5 / arc_length(rot)

        out = unclip(rot, 1.5)
        assert out.dtype != object
        box, sside = get_mini_boxes(out.reshape(-1, 2))
        _, orig_sside = get_mini_boxes(rot)
        # short side grows by ~2d (raster EDT gives ~±1px accuracy)
        assert abs(sside - (orig_sside + 2 * d)) < 2.5


class TestGetMiniBoxes:
    def test_corner_ordering(self):
        """Reference index shuffle: output order is tl, tr, br, bl
        (DBNet.py:335-356)."""
        from ocrfa_tpu.detector_db import get_mini_boxes

        pts = np.array([[10, 5], [50, 5], [50, 25], [10, 25]], dtype=np.float64)
        box, sside = get_mini_boxes(pts)
        box = np.array(box)
        assert np.isclose(sside, 20)
        # tl has min x+y; br has max x+y
        sums = box.sum(axis=1)
        assert sums.argmin() == 0 and sums.argmax() == 2
        assert box[1][0] > box[0][0]  # tr right of tl
        assert box[3][1] > box[0][1]  # bl below tl

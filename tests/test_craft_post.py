"""Tests for CRAFT heatmap post-processing (cv2-free) and min-area rect."""

import numpy as np
import pytest

from ocrfa_tpu.geometry.craft_post import (
    adjust_result_coordinates,
    get_det_boxes,
    get_det_boxes_core,
)
from ocrfa_tpu.geometry.minrect import convex_hull, min_area_rect


def synthetic_maps(shape=(60, 100)):
    """Two word blobs joined by a link region."""
    text = np.zeros(shape, dtype=np.float32)
    link = np.zeros(shape, dtype=np.float32)
    text[20:30, 10:30] = 0.9   # word 1
    text[20:30, 40:60] = 0.85  # word 2
    link[20:30, 28:42] = 0.6   # link between them
    text[45:52, 70:90] = 0.95  # separate word
    return text, link


class TestMinAreaRect:
    def test_axis_aligned(self):
        pts = np.array([[0, 0], [10, 0], [10, 4], [0, 4], [5, 2]])
        box, (w, h) = min_area_rect(pts)
        assert sorted([round(w), round(h)]) == [4, 10]
        np.testing.assert_allclose(sorted(box[:, 0]), [0, 0, 10, 10], atol=1e-6)

    def test_rotated_45(self):
        base = np.array([[0, 0], [10, 0], [10, 2], [0, 2]], dtype=np.float64)
        theta = np.pi / 4
        rot = np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
        pts = base @ rot.T
        box, (w, h) = min_area_rect(pts)
        assert abs(max(w, h) - 10) < 1e-6 and abs(min(w, h) - 2) < 1e-6

    def test_clockwise_output(self):
        pts = np.array([[0, 0], [8, 1], [7, 5], [1, 4]])
        box, _ = min_area_rect(pts)
        # shoelace in y-down coords must be negative (clockwise)
        area2 = sum(
            box[i][0] * box[(i + 1) % 4][1] - box[(i + 1) % 4][0] * box[i][1]
            for i in range(4)
        )
        assert area2 <= 0

    def test_hull_of_collinear(self):
        pts = np.array([[0, 0], [1, 1], [2, 2], [3, 3]])
        hull = convex_hull(pts)
        assert len(hull) == 2


class TestGetDetBoxes:
    def test_linked_words_merge(self):
        text, link = synthetic_maps()
        boxes, labels, mapper = get_det_boxes_core(text, link, 0.7, 0.4, 0.4)
        assert len(boxes) == 2  # linked pair merged + the separate word
        # the merged component must span both words
        widths = sorted(np.ptp(b[:, 0]) for b in boxes)
        assert widths[-1] >= 48

    def test_no_link_three_components(self):
        text, _ = synthetic_maps()
        link = np.zeros_like(text)
        boxes, _, _ = get_det_boxes_core(text, link, 0.7, 0.4, 0.4)
        assert len(boxes) == 3

    def test_size_filter(self):
        text = np.zeros((40, 40), dtype=np.float32)
        text[5:7, 5:8] = 0.9  # 6 px < 10 px area threshold
        boxes, _, _ = get_det_boxes_core(text, np.zeros_like(text), 0.7, 0.4, 0.4)
        assert boxes == []

    def test_score_filter(self):
        text = np.zeros((40, 40), dtype=np.float32)
        text[5:20, 5:20] = 0.5  # above low_text but below text_threshold
        boxes, _, _ = get_det_boxes_core(text, np.zeros_like(text), 0.7, 0.4, 0.4)
        assert boxes == []

    def test_estimate_num_chars(self):
        text, link = synthetic_maps()
        boxes, polys, mapper = get_det_boxes(
            text, link, 0.7, 0.4, 0.4, estimate_num_chars=True
        )
        assert len(mapper) == len(boxes)
        assert all(isinstance(m, (int, np.integer)) for m in mapper)

    def test_adjust_coordinates(self):
        text, link = synthetic_maps()
        boxes, _, _ = get_det_boxes_core(text, link, 0.7, 0.4, 0.4)
        adj = adjust_result_coordinates(boxes, 0.5, 0.5)
        np.testing.assert_allclose(
            np.asarray(adj[0], dtype=np.float64), np.asarray(boxes[0], dtype=np.float64)
        )


class TestCraftDetectorEndToEnd:
    def test_synthetic_page(self):
        import jax

        from ocrfa_tpu.detector import CraftDetector, get_textbox
        from ocrfa_tpu.models.craft import init_craft

        params = init_craft(jax.random.PRNGKey(0))
        det = CraftDetector(params)
        page = np.random.default_rng(0).integers(0, 255, (64, 96, 3)).astype(np.uint8)
        result = get_textbox(det, page, canvas_size=96, mag_ratio=1.0,
                             text_threshold=0.7, link_threshold=0.4,
                             low_text=0.4, poly=False)
        assert isinstance(result, list) and len(result) == 1
        for box in result[0]:
            assert box.dtype == np.int32 and box.size == 8


class TestGetPolyCore:
    def test_poly_on_wide_component(self):
        from ocrfa_tpu.geometry.craft_post import get_det_boxes

        # wide, thin text-like band -> polygon refinement has room to work
        text = np.zeros((80, 240), dtype=np.float32)
        text[30:50, 20:220] = 0.9
        link = np.zeros_like(text)
        boxes, polys, mapper = get_det_boxes(text, link, 0.7, 0.4, 0.4, poly=True)
        assert len(boxes) == 1
        assert len(polys) == 1
        poly = polys[0]
        # refinement either produces a >=4-point polygon or falls back (None)
        if poly is not None:
            assert poly.shape[0] >= 4 and poly.shape[1] == 2

    def test_small_box_skipped(self):
        from ocrfa_tpu.geometry.craft_post import get_poly_core

        boxes = [np.array([[0, 0], [5, 0], [5, 5], [0, 5]], dtype=np.float32)]
        labels = np.zeros((20, 20), dtype=np.int32)
        polys = get_poly_core(boxes, labels, [1], labels.astype(np.float32))
        assert polys == [None]

    def test_poly_with_estimate_chars_raises(self):
        from ocrfa_tpu.geometry.craft_post import get_det_boxes

        with pytest.raises(Exception):
            get_det_boxes(np.zeros((10, 10), np.float32),
                          np.zeros((10, 10), np.float32),
                          0.7, 0.4, 0.4, poly=True, estimate_num_chars=True)


class TestCanvasBucketing:
    def test_bucketed_canvas_runs(self):
        """canvas_bucket trades exactness near borders for a bounded compile
        count (the zero pad can perturb border components); the option must
        produce structurally valid detections."""
        import jax

        from ocrfa_tpu.detector import CraftDetector, get_textbox
        from ocrfa_tpu.models.craft import init_craft

        params = init_craft(jax.random.PRNGKey(0))
        bucketed = CraftDetector(params, canvas_bucket=64)
        page = np.random.default_rng(0).integers(0, 255, (70, 100, 3)).astype(np.uint8)
        kw = dict(canvas_size=128, mag_ratio=1.0, text_threshold=0.7,
                  link_threshold=0.4, low_text=0.4, poly=False)
        out = get_textbox(bucketed, page, **kw)
        assert isinstance(out, list) and len(out) == 1
        for box in out[0]:
            assert box.dtype == np.int32 and box.size == 8

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
        # clockwise in y-down coords has POSITIVE shoelace (tl tr br bl of
        # the unit square gives +2) — the cv2.boxPoints convention the
        # reference's roll + 4-point warp assume (utils.py:169-171)
        area2 = sum(
            box[i][0] * box[(i + 1) % 4][1] - box[(i + 1) % 4][0] * box[i][1]
            for i in range(4)
        )
        assert area2 >= 0

    def test_tilted_rect_warp_order(self):
        # a mildly tilted rectangle must come back tl, tr, br, bl after the
        # caller's roll-to-min(x+y): the second point sits to the RIGHT of
        # the first (top edge), not below it — the inverted-winding bug
        # rotated every downstream crop 90 degrees
        theta = 0.1
        rot = np.array([[np.cos(theta), -np.sin(theta)],
                        [np.sin(theta), np.cos(theta)]])
        base = np.array([[0, 0], [200, 0], [200, 60], [0, 60]], np.float64)
        pts = base @ rot.T + 50
        box, _ = min_area_rect(pts)
        box = np.roll(box, 4 - box.sum(axis=1).argmin(), 0)
        assert box[1][0] - box[0][0] > 100  # top edge runs rightward
        assert box[3][1] - box[0][1] > 30   # last point is below the first

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


class TestGetPolyCoreGolden:
    """Golden vs the REFERENCE get_poly_core, with cv2 shimmed onto our own
    geometric primitives (homography warp + 1px line raster).  This checks
    every piece of refinement logic AROUND the cv2 calls — column scan,
    segment machine, pivot selection, gradients, rail expansion, assembly —
    is behaviorally identical; the primitives themselves are approximate
    relative to real cv2 (PARITY.md notes)."""

    @staticmethod
    def _shim_cv2():
        import sys

        from ocrfa_tpu.geometry.transform import (
            perspective_transform,
            warp_perspective,
        )

        cv2 = sys.modules["cv2"]  # conftest's empty stub module
        cv2.INTER_NEAREST = 0

        def getPerspectiveTransform(src, dst):
            return perspective_transform(src, dst)

        def warpPerspective(src, m, size, flags=None):
            interp = "nearest" if flags == cv2.INTER_NEAREST else "bilinear"
            return warp_perspective(src, m, size, interpolation=interp)

        def line(canvas, p0, p1, color, thickness=1):
            h, w = canvas.shape
            x0, y0 = int(p0[0]), int(p0[1])
            x1, y1 = int(p1[0]), int(p1[1])
            n = max(abs(x1 - x0), abs(y1 - y0), 1)
            xs = np.rint(np.linspace(x0, x1, n + 1)).astype(int)
            ys = np.rint(np.linspace(y0, y1, n + 1)).astype(int)
            ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
            canvas[ys[ok], xs[ok]] = color
            return canvas

        cv2.getPerspectiveTransform = getPerspectiveTransform
        cv2.warpPerspective = warpPerspective
        cv2.line = line

    @staticmethod
    def _curved_scene(seed, shape=(140, 380)):
        """Curved bands labeled 1..n plus hand-built enclosing quads.

        Hand-built boxes (rather than min-area rects) guarantee the long
        edge is the first edge so refinement has room to work; the curvature
        exceeds the band thickness so the reference's ``h*0.7 < max_len``
        gate passes.
        """
        rng = np.random.default_rng(seed)
        labels = np.zeros(shape, dtype=np.int32)
        boxes, mapper = [], []
        lanes = [(10, 60), (75, 130)]
        for lane_id, (lane_lo, lane_hi) in enumerate(lanes[: rng.integers(1, 3)]):
            x0 = int(rng.integers(5, 60))
            width = int(rng.integers(180, 290))
            half = int(rng.integers(4, 8))
            amp = float(rng.uniform(1.0, 2.2) * half)
            y_mid = (lane_lo + lane_hi) // 2
            freq = rng.uniform(0.5, 2.0) * np.pi / width
            phase = rng.uniform(0, np.pi)
            x1 = min(x0 + width, shape[1] - 4)
            for x in range(x0, x1):
                yc = int(y_mid + amp * np.sin(freq * (x - x0) + phase))
                labels[max(lane_lo, yc - half):min(lane_hi, yc + half), x] = lane_id + 1
            pad = 2
            y_lo = max(0, int(y_mid - amp - half) - pad)
            y_hi = min(shape[0] - 1, int(y_mid + amp + half) + pad)
            boxes.append(np.array(
                [[x0 - pad, y_lo], [x1 + pad, y_lo],
                 [x1 + pad, y_hi], [x0 - pad, y_hi]], dtype=np.float32))
            mapper.append(lane_id + 1)
        return boxes, labels, mapper

    @pytest.mark.parametrize("seed", range(10))
    def test_matches_reference(self, ref_utils, seed):
        from ocrfa_tpu.geometry.craft_post import get_poly_core

        self._shim_cv2()
        boxes, labels, mapper = self._curved_scene(seed)
        link = np.zeros(labels.shape, dtype=np.float32)

        ours = get_poly_core(boxes, labels, mapper, link)
        theirs = ref_utils.get_poly_core(boxes, labels.copy(), mapper, link)
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            if b is None:
                assert a is None
            else:
                np.testing.assert_allclose(a, b)

    def test_yield_is_nonvacuous(self, ref_utils):
        """At least some seeds must produce real polygons, or the golden
        comparison above proves nothing."""
        from ocrfa_tpu.geometry.craft_post import get_poly_core

        produced = 0
        for seed in range(10):
            boxes, labels, mapper = self._curved_scene(seed)
            link = np.zeros(labels.shape, dtype=np.float32)
            produced += sum(
                p is not None for p in get_poly_core(boxes, labels, mapper, link)
            )
        assert produced >= 3, f"only {produced} non-None polygons over 10 seeds"


class TestDilatedExtremePts:
    """The fast per-row-extremes dilation must match the 2-D max filter
    exactly (it replaces it for components whose dilation window is not
    clipped by an image border)."""

    @pytest.mark.parametrize("seed", range(4))
    def test_matches_2d_max_filter(self, seed):
        from scipy.ndimage import maximum_filter

        from ocrfa_tpu.geometry.craft_post import _dilated_extreme_pts

        rng = np.random.default_rng(seed)
        for _ in range(100):
            h, w = int(rng.integers(1, 25)), int(rng.integers(1, 60))
            comp = rng.random((h, w)) < 0.4
            if not comp.any():
                continue
            k = int(rng.integers(1, 8))
            x0, y0 = int(rng.integers(0, 50)), int(rng.integers(0, 50))
            # ground truth: embed on a margin large enough that boundary
            # handling cannot matter, 2-D max filter, per-row extremes
            pad = k + 2
            canvas = np.zeros((h + 2 * pad, w + 2 * pad), np.uint8)
            canvas[pad:pad + h, pad:pad + w][comp] = 255
            dil = maximum_filter(canvas, size=k)
            ridx = np.flatnonzero(dil.any(axis=1))
            xf = dil.argmax(axis=1)[ridx]
            xl = dil.shape[1] - 1 - dil[:, ::-1].argmax(axis=1)[ridx]
            want = {(int(a) - pad + x0, int(r) - pad + y0)
                    for r, a in zip(ridx, xf)}
            want |= {(int(b) - pad + x0, int(r) - pad + y0)
                     for r, b in zip(ridx, xl)}
            got = set(map(tuple, _dilated_extreme_pts(comp, k, x0, y0)))
            assert got == want, (h, w, k)

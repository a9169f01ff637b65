"""Golden: reference DBNet bitmap->boxes vs our detector_db implementation.

The reference methods run with cv2/pyclipper/shapely shimmed onto our own
geometric primitives (contour trace, DP simplify, min-area rect, EDT round
offset), so the comparison pins every piece of logic AROUND those
primitives — score gating, min-size thresholds, rescale/clip, output
packing.  The primitives themselves are spec-tested separately
(tests/test_contours.py); absolute cv2 parity is approximate (PARITY.md).
"""

import sys

import numpy as np
import pytest

import torch

from ocrfa_tpu.detector_db import DBNetDetector
from ocrfa_tpu.geometry.contours import (
    approx_poly_dp,
    arc_length,
    find_contours,
    offset_polygon,
    polygon_area,
)
from ocrfa_tpu.geometry.minrect import min_area_rect


def _install_dbnet_shims():
    from ref_stubs import install_reference_stubs

    install_reference_stubs()
    cv2 = sys.modules["cv2"]
    cv2.RETR_LIST = 1
    cv2.CHAIN_APPROX_SIMPLE = 2

    def findContours(img, mode, method):
        contours = find_contours(np.asarray(img) > 0)
        return [np.asarray(c, np.int32).reshape(-1, 1, 2) for c in contours], None

    def arcLength(contour, closed):
        return arc_length(np.asarray(contour).reshape(-1, 2), closed=closed)

    def approxPolyDP(contour, epsilon, closed):
        pts = np.asarray(contour).reshape(-1, 2)
        return approx_poly_dp(pts, epsilon, closed=closed).reshape(-1, 1, 2)

    def minAreaRect(points):
        corners, (w, h) = min_area_rect(
            np.asarray(points, dtype=np.float64).reshape(-1, 2))
        return corners.astype(np.float32), (w, h)

    def boxPoints(rect):
        return np.asarray(rect[0], dtype=np.float32)

    def fillPoly(mask, pts, color):
        from ocrfa_tpu.geometry.contours import fill_poly

        filled = fill_poly(mask.shape, np.asarray(pts[0]))
        mask[filled > 0] = color
        return mask

    def mean(img, mask):
        sel = np.asarray(img)[np.asarray(mask) > 0]
        return (float(sel.mean()) if sel.size else 0.0, 0.0, 0.0, 0.0)

    cv2.mean = mean
    cv2.fillPoly = fillPoly
    cv2.findContours = findContours
    cv2.arcLength = arcLength
    cv2.approxPolyDP = approxPolyDP
    cv2.minAreaRect = minAreaRect
    cv2.boxPoints = boxPoints

    import types

    if "pyclipper" not in sys.modules:
        pc = types.ModuleType("pyclipper")
        pc.JT_ROUND = 0
        pc.ET_CLOSEDPOLYGON = 0

        class PyclipperOffset:
            def __init__(self):
                self._path = None

            def AddPath(self, path, jt, et):
                self._path = np.asarray(path, dtype=np.float64)

            def Execute(self, distance):
                out = offset_polygon(self._path, distance)
                if out.dtype == object:
                    return [np.asarray(p).tolist() for p in out]
                return [out[0].tolist()]

        pc.PyclipperOffset = PyclipperOffset
        sys.modules["pyclipper"] = pc

    if "shapely" not in sys.modules:
        shapely = types.ModuleType("shapely")
        geometry = types.ModuleType("shapely.geometry")

        class Polygon:
            def __init__(self, pts):
                self._pts = np.asarray(pts, dtype=np.float64)

            @property
            def area(self):
                return polygon_area(self._pts)

            @property
            def length(self):
                return arc_length(self._pts, closed=True)

        geometry.Polygon = Polygon
        shapely.geometry = geometry
        sys.modules["shapely"] = shapely
        sys.modules["shapely.geometry"] = geometry


@pytest.fixture(scope="module")
def ref_dbnet():
    _install_dbnet_shims()
    ref_src = "/root/reference/src"
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    from ocrfa.DBNet.DBNet import DBNet as RefDBNet

    # the methods under test touch no constructor state
    return RefDBNet.__new__(RefDBNet)


def _scene(seed, shape=(160, 224)):
    """Synthetic binarization heatmap with a few solid text-like blobs."""
    rng = np.random.default_rng(seed)
    hmap = np.zeros(shape, dtype=np.float32)
    for _ in range(rng.integers(2, 5)):
        y = int(rng.integers(8, shape[0] - 40))
        x = int(rng.integers(8, shape[1] - 90))
        h = int(rng.integers(10, 26))
        w = int(rng.integers(40, 85))
        hmap[y:y + h, x:x + w] = float(rng.uniform(0.55, 0.95))
    bitmap = hmap > 0.3
    return hmap, bitmap


class TestBoxesFromBitmapGolden:
    @pytest.mark.parametrize("seed", range(6))
    def test_matches_reference(self, ref_dbnet, seed):
        hmap, bitmap = _scene(seed)
        dest_w, dest_h = 448, 320

        ours = DBNetDetector.boxes_from_bitmap(
            hmap, bitmap, dest_w, dest_h,
            bbox_min_score=0.2, bbox_min_size=3, max_candidates=0)
        ref = ref_dbnet.boxes_from_bitmap(
            torch.from_numpy(hmap)[None], torch.from_numpy(bitmap)[None],
            dest_w, dest_h, bbox_min_score=0.2, bbox_min_size=3,
            max_candidates=0)
        assert len(ours[0]) == len(ref[0])
        np.testing.assert_array_equal(
            np.asarray(ours[0], np.int16), np.asarray(ref[0], np.int16))
        np.testing.assert_allclose(ours[1], ref[1], rtol=1e-6)

    def test_min_size_filter_matches(self, ref_dbnet):
        hmap = np.zeros((64, 64), dtype=np.float32)
        hmap[10:13, 10:13] = 0.9  # below bbox_min_size after unclip
        bitmap = hmap > 0.3
        ours = DBNetDetector.boxes_from_bitmap(hmap, bitmap, 64, 64,
                                               bbox_min_size=30)
        ref = ref_dbnet.boxes_from_bitmap(
            torch.from_numpy(hmap)[None], torch.from_numpy(bitmap)[None],
            64, 64, bbox_min_size=30)
        np.testing.assert_array_equal(
            np.asarray(ours[0], np.int16), np.asarray(ref[0], np.int16))


class TestPolygonsFromBitmapGolden:
    @pytest.mark.parametrize("seed", range(6))
    def test_matches_reference(self, ref_dbnet, seed):
        hmap, bitmap = _scene(seed)
        dest_w, dest_h = 448, 320

        ours = DBNetDetector.polygons_from_bitmap(
            hmap, bitmap, dest_w, dest_h,
            bbox_min_score=0.2, bbox_min_size=3, max_candidates=0)
        ref = ref_dbnet.polygons_from_bitmap(
            torch.from_numpy(hmap)[None], torch.from_numpy(bitmap)[None],
            dest_w, dest_h, bbox_min_score=0.2, bbox_min_size=3,
            max_candidates=0)
        assert len(ours[0]) == len(ref[0])
        for a, b in zip(ours[0], ref[0]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(ours[1], ref[1], rtol=1e-6)

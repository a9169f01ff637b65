"""Contour extraction and polygon utilities (cv2/pyclipper replacements).

Provides the primitives DBNet post-processing needs
(``/root/reference/src/ocrfa/DBNet/DBNet.py:203-373``):

* ``find_contours``: connected components (8-conn) + Moore boundary
  tracing -> outer contours (cv2.findContours RETR_LIST equivalent for
  solid regions).
* ``approx_poly_dp``: Douglas-Peucker simplification (cv2.approxPolyDP).
* ``arc_length``: closed-polygon perimeter (cv2.arcLength).
* ``fill_poly`` / ``polygon_mean``: scanline rasterisation for
  ``box_score_fast`` (cv2.fillPoly + cv2.mean-with-mask).
* ``unclip``: polygon outward offset by ``area * ratio / perimeter`` with
  round joins — pyclipper.PyclipperOffset(JT_ROUND) equivalent, computed by
  thresholding the Euclidean distance transform of the rasterised polygon
  and tracing the result.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import distance_transform_edt, label as cc_label

_EIGHT = np.ones((3, 3), dtype=np.uint8)

# Moore neighbourhood in clockwise order starting from W (dx, dy)
_MOORE = [(-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0), (1, 1), (0, 1), (-1, 1)]


def _trace_boundary(mask: np.ndarray, start):
    """Moore boundary trace (clockwise, y-down) of a connected region."""
    h, w = mask.shape
    sy, sx = start
    contour = [(sx, sy)]
    # backtrack direction: entered from the west
    b = 0
    cy, cx = sy, sx
    for _ in range(4 * mask.sum() + 8):
        found = False
        for i in range(8):
            d = (b + 1 + i) % 8
            dx, dy = _MOORE[d]
            ny, nx = cy + dy, cx + dx
            if 0 <= ny < h and 0 <= nx < w and mask[ny, nx]:
                # new backtrack: direction pointing back at the previous px
                b = (d + 4) % 8
                cy, cx = ny, nx
                found = True
                break
        if not found:  # isolated pixel
            break
        if (cy, cx) == (sy, sx):
            break
        contour.append((cx, cy))
    return np.array(contour, dtype=np.int64)


def find_contours(bitmap: np.ndarray):
    """Outer boundary of every 8-connected foreground component.

    Returns a list of (P, 2) int arrays in (x, y) order.  Uses the native
    C++ tracer when built (ocrfa_tpu/runtime), else pure Python.
    """
    try:
        from ocrfa_tpu.runtime import available, find_contours_native

        if available():
            return find_contours_native(bitmap)
    except Exception:
        pass
    labels, n = cc_label(bitmap.astype(np.uint8), structure=_EIGHT)
    contours = []
    for k in range(1, n + 1):
        mask = labels == k
        ys, xs = np.nonzero(mask)
        # topmost, then leftmost start pixel
        top = ys.min()
        left = xs[ys == top].min()
        contours.append(_trace_boundary(mask, (top, left)))
    return contours


def arc_length(points: np.ndarray, closed: bool = True) -> float:
    pts = np.asarray(points, dtype=np.float64)
    if closed:
        pts = np.vstack([pts, pts[:1]])
    return float(np.sum(np.hypot(np.diff(pts[:, 0]), np.diff(pts[:, 1]))))


def _point_segment_dist(pts, a, b):
    ab = b - a
    denom = ab @ ab
    if denom == 0:
        return np.hypot(*(pts - a).T)
    t = np.clip(((pts - a) @ ab) / denom, 0, 1)
    proj = a + t[:, None] * ab
    return np.hypot(*(pts - proj).T)


def approx_poly_dp(points: np.ndarray, epsilon: float, closed: bool = True) -> np.ndarray:
    """Douglas-Peucker simplification (cv2.approxPolyDP semantics)."""
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return pts.astype(points.dtype)

    if closed:
        # split at the two farthest-apart points for a stable closed DP
        i0 = 0
        d = np.hypot(*(pts - pts[0]).T)
        i1 = int(np.argmax(d))
        if i1 == 0:
            return pts[:1].astype(points.dtype)
        idx1 = list(range(i0, i1 + 1))
        idx2 = list(range(i1, n)) + [0]
        keep = set()

        def dp(idx):
            if len(idx) < 3:
                keep.update(idx)
                return
            a, b = pts[idx[0]], pts[idx[-1]]
            inner = np.array(idx[1:-1])
            dists = _point_segment_dist(pts[inner], a, b)
            imax = int(np.argmax(dists))
            if dists[imax] > epsilon:
                split = idx[1 + imax]
                pos = idx.index(split)
                dp(idx[:pos + 1])
                dp(idx[pos:])
            else:
                keep.add(idx[0])
                keep.add(idx[-1])

        dp(idx1)
        dp(idx2)
        order = sorted(i % n for i in keep)
        # dedupe while preserving order
        seen, out = set(), []
        for i in order:
            if i not in seen:
                seen.add(i)
                out.append(i)
        return pts[out].astype(points.dtype)

    keep = set()

    def dp_open(lo, hi):
        if hi - lo < 2:
            keep.update((lo, hi))
            return
        inner = np.arange(lo + 1, hi)
        dists = _point_segment_dist(pts[inner], pts[lo], pts[hi])
        imax = int(np.argmax(dists))
        if dists[imax] > epsilon:
            mid = lo + 1 + imax
            dp_open(lo, mid)
            dp_open(mid, hi)
        else:
            keep.update((lo, hi))

    dp_open(0, n - 1)
    return pts[sorted(keep)].astype(points.dtype)


def fill_poly(shape, polygon) -> np.ndarray:
    """Rasterise a polygon to a binary mask (cv2.fillPoly even-odd scanline,
    pixel centers at integer coordinates)."""
    h, w = shape
    mask = np.zeros((h, w), dtype=np.uint8)
    poly = np.asarray(polygon, dtype=np.float64)
    if len(poly) < 3:
        return mask
    ys = poly[:, 1]
    y_min = max(int(np.floor(ys.min())), 0)
    y_max = min(int(np.ceil(ys.max())), h - 1)
    n = len(poly)
    for y in range(y_min, y_max + 1):
        xs = []
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 <= y < y2) or (y2 <= y < y1):
                xs.append(x1 + (y - y1) / (y2 - y1) * (x2 - x1))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            x_start = max(int(np.ceil(xs[i])), 0)
            x_end = min(int(np.floor(xs[i + 1])), w - 1)
            if x_end >= x_start:
                mask[y, x_start:x_end + 1] = 1
    return mask


def polygon_mean(hmap: np.ndarray, box: np.ndarray) -> float:
    """``box_score_fast`` (DBNet.py:358-373): mean heatmap inside the box."""
    h, w = hmap.shape[:2]
    box = box.copy().astype(np.float64)
    xmin = np.clip(np.floor(box[:, 0].min()).astype(np.int32), 0, w - 1)
    xmax = np.clip(np.ceil(box[:, 0].max()).astype(np.int32), 0, w - 1)
    ymin = np.clip(np.floor(box[:, 1].min()).astype(np.int32), 0, h - 1)
    ymax = np.clip(np.ceil(box[:, 1].max()).astype(np.int32), 0, h - 1)
    box[:, 0] -= xmin
    box[:, 1] -= ymin
    # the reference truncates vertices to int32 before filling
    # (DBNet.py:371 ``astype(np.int32)``); match that
    mask = fill_poly((ymax - ymin + 1, xmax - xmin + 1), box.astype(np.int32))
    if mask.sum() == 0:
        return 0.0
    region = hmap[ymin:ymax + 1, xmin:xmax + 1]
    return float(region[mask.astype(bool)].mean())


def polygon_area(points) -> float:
    pts = np.asarray(points, dtype=np.float64)
    x, y = pts[:, 0], pts[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2)


def unclip(box: np.ndarray, unclip_ratio: float = 1.5) -> np.ndarray:
    """Outward polygon offset by ``d = area * ratio / perimeter`` with round
    joins (pyclipper JT_ROUND equivalent, DBNet.py:326-333)."""
    box = np.asarray(box, dtype=np.float64)
    area = polygon_area(box)
    length = arc_length(box, closed=True)
    if length == 0:
        return box[None].astype(np.int64)
    return offset_polygon(box, area * unclip_ratio / length)


def offset_polygon(box: np.ndarray, distance: float) -> np.ndarray:
    """Round-join outward offset of a polygon by ``distance`` pixels.

    Raster formulation: threshold the EDT of the filled polygon's
    complement at ``distance`` and trace the boundary of the result.
    Returns (1, P, 2) int coordinates, or an object array when the offset
    region splits (degenerate inputs).
    """
    box = np.asarray(box, dtype=np.float64)
    pad = int(np.ceil(distance)) + 2
    xmin, ymin = np.floor(box.min(axis=0)).astype(int) - pad
    xmax, ymax = np.ceil(box.max(axis=0)).astype(int) + pad
    w, h = xmax - xmin + 1, ymax - ymin + 1
    shifted = box - [xmin, ymin]
    mask = fill_poly((h, w), shifted)
    if mask.sum() == 0:
        return box[None].astype(np.int64)

    dist = distance_transform_edt(1 - mask)
    grown = dist <= distance
    contours = find_contours(grown)
    if not contours:
        return box[None].astype(np.int64)
    # a simple polygon should offset to exactly one region
    contours.sort(key=len, reverse=True)
    out = contours[0] + [xmin, ymin]
    return out[None] if len(contours) == 1 else np.array(
        [c + [xmin, ymin] for c in contours], dtype=object
    )

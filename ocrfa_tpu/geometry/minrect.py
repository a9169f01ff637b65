"""Minimum-area rotated rectangle via rotating calipers (cv2.minAreaRect
replacement) and convex hull utilities."""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns hull vertices CCW (y-up convention)."""
    pts = np.unique(points.astype(np.float64), axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort by (x, y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(points: np.ndarray):
    """Minimum-area oriented bounding box of a point set.

    Returns ``(corners, (w, h))`` where ``corners`` is a (4, 2) float32 array
    in clockwise order (image coordinates, y down) starting from the corner
    the caller normalises away anyway (reference rolls to min(x+y),
    utils.py:169-171).  Replaces cv2.minAreaRect + cv2.boxPoints.
    """
    pts = np.asarray(points, dtype=np.float64)
    hull = convex_hull(pts)
    if len(hull) == 1:
        c = np.repeat(hull, 4, axis=0).astype(np.float32)
        return c, (0.0, 0.0)
    if len(hull) == 2:
        # degenerate: zero-width box along the segment
        a, b = hull
        c = np.array([a, b, b, a], dtype=np.float32)
        return c, (float(np.linalg.norm(b - a)), 0.0)

    edges = np.diff(np.vstack([hull, hull[:1]]), axis=0)
    angles = np.arctan2(edges[:, 1], edges[:, 0])
    # each hull edge direction is a candidate box orientation
    best = None
    for theta in np.unique(np.mod(angles, np.pi / 2)):
        c, s = np.cos(theta), np.sin(theta)
        rot = np.array([[c, s], [-s, c]])
        proj = hull @ rot.T
        mins = proj.min(axis=0)
        maxs = proj.max(axis=0)
        wh = maxs - mins
        area = wh[0] * wh[1]
        if best is None or area < best[0]:
            best = (area, theta, mins, maxs)

    _, theta, mins, maxs = best
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, s], [-s, c]])
    (x0, y0), (x1, y1) = mins, maxs
    corners_rot = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
    corners = corners_rot @ rot  # inverse rotation (rot is orthonormal)

    # enforce clockwise order in image coordinates (y down) — the order
    # cv2.boxPoints yields and the 4-point warp assumes (tl, tr, br, bl
    # after the caller's roll-to-min(x+y)).  In y-down coords a clockwise
    # polygon has POSITIVE shoelace sum: tl(0,0) tr(1,0) br(1,1) bl(0,1)
    # gives +2.  Reversing on the wrong sign rotates every warped crop
    # 90 degrees downstream.
    area2 = 0.0
    for i in range(4):
        x_a, y_a = corners[i]
        x_b, y_b = corners[(i + 1) % 4]
        area2 += x_a * y_b - x_b * y_a
    if area2 < 0:  # counter-clockwise in y-down coords -> reverse
        corners = corners[::-1]

    w, h = maxs - mins
    return corners.astype(np.float32), (float(w), float(h))

"""Visualisation helpers.

``heatmap_to_image``: render a [0, 1] heatmap with a JET colormap
(cv2.applyColorMap(COLORMAP_JET) equivalent of the reference's
``cvt2_heatmap_img``, utils.py:527-530) without cv2.  Returns RGB uint8.
"""

from __future__ import annotations

import numpy as np


def _jet(v: np.ndarray) -> np.ndarray:
    """Classic JET colormap over v in [0, 1] -> RGB float in [0, 1]."""
    four = 4.0 * v
    r = np.clip(np.minimum(four - 1.5, -four + 4.5), 0, 1)
    g = np.clip(np.minimum(four - 0.5, -four + 3.5), 0, 1)
    b = np.clip(np.minimum(four + 0.5, -four + 2.5), 0, 1)
    return np.stack([r, g, b], axis=-1)


def heatmap_to_image(hmap: np.ndarray) -> np.ndarray:
    """[0, 1]-clipped heatmap -> RGB uint8 JET rendering."""
    v = np.clip(np.asarray(hmap, dtype=np.float64), 0, 1)
    return (np.rint(_jet(v) * 255)).astype(np.uint8)


def draw_boxes(image: np.ndarray, boxes, value=(255, 0, 0)) -> np.ndarray:
    """Overlay quad outlines on an RGB uint8 image (debug helper)."""
    out = np.array(image, copy=True)
    h, w = out.shape[:2]
    for quad in boxes:
        pts = np.asarray(quad, dtype=np.int64).reshape(-1, 2)
        for i in range(len(pts)):
            x0, y0 = pts[i]
            x1, y1 = pts[(i + 1) % len(pts)]
            n = max(abs(x1 - x0), abs(y1 - y0), 1)
            xs = np.clip(np.rint(np.linspace(x0, x1, n + 1)).astype(int), 0, w - 1)
            ys = np.clip(np.rint(np.linspace(y0, y1, n + 1)).astype(int), 0, h - 1)
            out[ys, xs] = value
    return out

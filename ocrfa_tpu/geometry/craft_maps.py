"""CRAFT training supervision maps — region/affinity gaussians.

The reference ships CRAFT as inference-only weights (no trainer, no
dataset — SURVEY.md §3.5).  This module builds the training targets of
the CRAFT recipe (Baek et al., CVPR 2019 — the paper behind the
``OCRFA`` detector, utils.py:48-98): an isotropic 2-D gaussian warped
into every character box (region score) and into every affinity box
between adjacent characters (affinity score), at the model's half-
resolution output grid.

Affinity boxes follow the paper's construction: each character box is
split into four triangles by its diagonals; the affinity quad connects
the upper- and lower-triangle centroids of neighbouring characters.

Used with ``ocrfa_tpu.train.make_craft_train_step`` (MSE + online hard
negative mining) and the ``scripts/train_craft_demo.py`` end-to-end
detection-training demo.
"""

from __future__ import annotations

import numpy as np

from ocrfa_tpu.geometry.transform import perspective_transform, warp_perspective

__all__ = ["gaussian_template", "affinity_quad", "splat_quads",
           "craft_supervision_maps", "make_craft_batch"]


def gaussian_template(size: int = 64, sigma_ratio: float = 0.25) -> np.ndarray:
    """(size, size) isotropic gaussian, peak 1 at the center.

    ``sigma_ratio`` scales sigma relative to the template side; 0.25
    puts the box edge midpoints at ~2 sigma (value ~0.14) so a warped
    character box carries a confident core with soft edges.
    """
    sigma = size * sigma_ratio
    c = (size - 1) / 2.0
    xs = np.arange(size, dtype=np.float64) - c
    d2 = xs[None, :] ** 2 + xs[:, None] ** 2
    return np.exp(-d2 / (2.0 * sigma * sigma)).astype(np.float32)


def affinity_quad(box_a, box_b) -> np.ndarray:
    """Affinity box between two adjacent character boxes (paper fig. 3).

    Each box's diagonals define an upper triangle (top edge + center)
    and a lower triangle (bottom edge + center); the affinity quad joins
    the four triangle centroids: (upper_a, upper_b, lower_b, lower_a).
    Boxes are (4, 2) arrays in (tl, tr, br, bl) order.
    """
    quads = []
    for box in (np.asarray(box_a, np.float64), np.asarray(box_b, np.float64)):
        center = box.mean(axis=0)
        upper = (box[0] + box[1] + center) / 3.0
        lower = (box[2] + box[3] + center) / 3.0
        quads.append((upper, lower))
    (ua, la), (ub, lb) = quads
    return np.array([ua, ub, lb, la], dtype=np.float64)


def splat_quads(shape, quads, template=None) -> np.ndarray:
    """Max-compose the gaussian template warped into each quad.

    ``shape``: (H, W) of the output map; ``quads``: iterable of (4, 2)
    point arrays in map coordinates, (tl, tr, br, bl) order.
    """
    h, w = shape
    canvas = np.zeros((h, w), dtype=np.float32)
    if template is None:
        template = gaussian_template()
    s = template.shape[0]
    src = np.array([[0, 0], [s - 1, 0], [s - 1, s - 1], [0, s - 1]],
                   dtype=np.float64)
    for quad in quads:
        quad = np.asarray(quad, dtype=np.float64).reshape(4, 2)
        x0 = max(int(np.floor(quad[:, 0].min())), 0)
        x1 = min(int(np.ceil(quad[:, 0].max())), w - 1)
        y0 = max(int(np.floor(quad[:, 1].min())), 0)
        y1 = min(int(np.ceil(quad[:, 1].max())), h - 1)
        if x1 <= x0 or y1 <= y0:
            continue
        try:
            m = perspective_transform(src, quad - [x0, y0])
        except np.linalg.LinAlgError:
            # degenerate quad (collinear/coincident points) with a
            # non-degenerate bounding box — e.g. the affinity quad of two
            # zero-area character boxes; no meaningful warp exists
            continue
        patch = warp_perspective(template, m, (x1 - x0 + 1, y1 - y0 + 1))
        canvas[y0:y1 + 1, x0:x1 + 1] = np.maximum(
            canvas[y0:y1 + 1, x0:x1 + 1], patch.astype(np.float32))
    return canvas


def craft_supervision_maps(page_shape, char_quads_per_line, template=None):
    """Region + affinity maps for one page at the CRAFT output grid (/2).

    ``page_shape``: (H, W) of the INPUT page (the maps come back
    (H//2, W//2), the model's output resolution); ``char_quads_per_line``:
    one list of per-character (4, 2) quads (page pixel coordinates,
    (tl, tr, br, bl) order, reading order) per text line — affinity links
    only consecutive characters within a line.
    """
    h, w = page_shape
    shape = (h // 2, w // 2)
    chars, links = [], []
    for line in char_quads_per_line:
        line = [np.asarray(q, dtype=np.float64).reshape(4, 2) / 2.0
                for q in line]
        chars.extend(line)
        links.extend(affinity_quad(a, b) for a, b in zip(line, line[1:]))
    return {
        "region": splat_quads(shape, chars, template=template),
        "affinity": splat_quads(shape, links, template=template),
    }


def make_craft_batch(images, char_quads_per_page, template=None):
    """Stack per-page maps into the batch dict
    ``ocrfa_tpu.train.make_craft_train_step`` consumes.

    ``images``: (N, H, W, 3) float32 canvases, already mean/variance
    normalised (``preproc.host.normalize_mean_variance`` — the CRAFT
    input convention, detectors.py:40-43); ``char_quads_per_page``: one
    ``char_quads_per_line`` structure per page.
    """
    images = np.asarray(images, dtype=np.float32)
    n, h, w = images.shape[:3]
    if len(char_quads_per_page) != n:
        raise ValueError(
            f"{len(char_quads_per_page)} quad structures for {n} images")
    maps = [craft_supervision_maps((h, w), quads, template=template)
            for quads in char_quads_per_page]
    return {
        "image": images,
        "region": np.stack([m["region"] for m in maps]),
        "affinity": np.stack([m["affinity"] for m in maps]),
    }

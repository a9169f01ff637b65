"""DBNet training supervision maps — the data side the reference never built.

The reference ships DBNet's loss library as dead code (SURVEY.md §3.5: no
trainer, no dataset, nothing produces the maps the losses consume).
``ocrfa_tpu.train.make_dbnet_train_step`` revives the losses; this module
supplies their targets from text polygons, per the Differentiable
Binarization recipe (Liao et al., AAAI 2020 — the paper behind
`/root/reference/src/ocrfa/DBNet/`):

* ``gt`` — the probability-map target: each polygon shrunk inward by
  ``D = area * (1 - r^2) / perimeter`` (r = ``shrink_ratio``) and filled.
* ``mask`` — the OHEM-BCE validity mask: 1 everywhere except polygons
  marked ignore (explicitly, or too small to shrink / below
  ``min_text_size``).
* ``thresh_map`` / ``thresh_mask`` — the border target for the thresh
  head: within a band of width D on BOTH sides of each polygon boundary,
  ``1 - dist/D`` scaled into [``thresh_min``, ``thresh_max``]; the mask
  is 1 on the band.

Formulation is raster-native rather than vertex-clipping: the inward
shrink and outward dilation are both Euclidean-distance-transform
thresholdings of the rasterised polygon (the same trick
``geometry.contours.offset_polygon`` uses for unclip), and the border
distance is the two-sided EDT distance to the polygon boundary.  No
polygon-clipper library involved.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import distance_transform_edt

from ocrfa_tpu.geometry.contours import arc_length, fill_poly, polygon_area

__all__ = ["db_supervision_maps", "make_db_batch", "quad_from_ref_box"]


def quad_from_ref_box(box) -> np.ndarray:
    """Reference horizontal-list box ``[x_min, x_max, y_min, y_max]``
    (utils.py:1235-1348 output format) -> (4, 2) clockwise quad."""
    x0, x1, y0, y1 = box
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], dtype=np.float64)


def _polygon_window(poly, shape, pad):
    """Clip-padded integer window around ``poly``: (y0, y1, x0, x1)."""
    h, w = shape
    x0 = max(int(np.floor(poly[:, 0].min())) - pad, 0)
    x1 = min(int(np.ceil(poly[:, 0].max())) + pad, w - 1)
    y0 = max(int(np.floor(poly[:, 1].min())) - pad, 0)
    y1 = min(int(np.ceil(poly[:, 1].max())) + pad, h - 1)
    return y0, y1, x0, x1


def db_supervision_maps(shape, polygons, ignore=None, shrink_ratio: float = 0.4,
                        thresh_min: float = 0.3, thresh_max: float = 0.7,
                        min_text_size: float = 8.0):
    """Supervision maps for one page.

    ``shape``: (H, W); ``polygons``: iterable of (P, 2) point arrays in
    pixel coordinates; ``ignore``: optional per-polygon bool flags (the
    '###'-transcription convention — region excluded from the BCE loss
    instead of trained as text).

    Returns a dict of float32 (H, W) maps: ``gt``, ``mask``,
    ``thresh_map``, ``thresh_mask``.
    """
    h, w = shape
    gt = np.zeros((h, w), dtype=np.float32)
    mask = np.ones((h, w), dtype=np.float32)
    canvas = np.zeros((h, w), dtype=np.float32)   # unscaled border closeness
    thresh_mask = np.zeros((h, w), dtype=np.float32)
    polygons = [np.asarray(p, dtype=np.float64).reshape(-1, 2)
                for p in polygons]
    flags = list(ignore) if ignore is not None else [False] * len(polygons)
    if len(flags) != len(polygons):
        raise ValueError(
            f"{len(flags)} ignore flags for {len(polygons)} polygons")

    for poly, skip in zip(polygons, flags):
        if len(poly) < 3:
            continue
        if (poly[:, 0].max() < 0 or poly[:, 1].max() < 0
                or poly[:, 0].min() > w - 1 or poly[:, 1].min() > h - 1):
            continue  # entirely off-image (page cropping/augmentation)
        area = polygon_area(poly)
        length = arc_length(poly, closed=True)
        side = min(poly[:, 0].max() - poly[:, 0].min(),
                   poly[:, 1].max() - poly[:, 1].min())
        if skip or area < 1.0 or length < 1.0 or side < min_text_size:
            # ignore region: no positive target, excluded from BCE
            region = fill_poly((h, w), poly)
            mask[region.astype(bool)] = 0.0
            continue

        dist = area * (1.0 - shrink_ratio ** 2) / length
        pad = int(np.ceil(dist)) + 2
        y0, y1, x0, x1 = _polygon_window(poly, (h, w), pad)
        local = fill_poly((y1 - y0 + 1, x1 - x0 + 1), poly - [x0, y0])
        if local.sum() == 0:
            continue

        # two-sided EDT distance to the polygon boundary; the half-pixel
        # correction accounts for EDT measuring center-to-center (the true
        # edge lies between the last inside and first outside pixel), so
        # boundary pixels peak near closeness 1 even for small polygons
        d_in = distance_transform_edt(local)        # inside -> to background
        d_out = distance_transform_edt(1 - local)   # outside -> to polygon
        d_edge = np.maximum(np.where(local > 0, d_in, d_out) - 0.5, 0.0)

        shrunk = d_in > dist
        if not shrunk.any():
            # Defensive only: D = A(1-r^2)/L is provably below the raster
            # inradius for nondegenerate regions, so the EDT shrink keeps
            # a spine even where vertex-clipper shrinking (upstream DB's
            # pyclipper) caves in on thin/skewed quads.  If a pathological
            # raster still empties, exclude it from the BCE rather than
            # training the binarize head to erase the region.
            mask[y0:y1 + 1, x0:x1 + 1][local.astype(bool)] = 0.0
            continue
        gt[y0:y1 + 1, x0:x1 + 1] = np.maximum(
            gt[y0:y1 + 1, x0:x1 + 1], shrunk.astype(np.float32))

        band = d_edge <= dist
        closeness = np.clip(1.0 - d_edge / max(dist, 1e-6), 0.0, 1.0)
        canvas[y0:y1 + 1, x0:x1 + 1] = np.maximum(
            canvas[y0:y1 + 1, x0:x1 + 1], closeness.astype(np.float32))
        thresh_mask[y0:y1 + 1, x0:x1 + 1] = np.maximum(
            thresh_mask[y0:y1 + 1, x0:x1 + 1], band.astype(np.float32))

    thresh_map = canvas * (thresh_max - thresh_min) + thresh_min
    return {"gt": gt, "mask": mask, "thresh_map": thresh_map.astype(np.float32),
            "thresh_mask": thresh_mask}


def make_db_batch(images, polygons_per_image, ignore_per_image=None, **kwargs):
    """Stack per-page maps into the batch dict
    ``ocrfa_tpu.train.make_dbnet_train_step`` consumes.

    ``images``: (N, H, W, 3) float32, already BGR-mean-normalised (the
    DBNet input convention, DBNet.py:136-138); ``polygons_per_image``:
    list of per-page polygon lists.  Extra kwargs forward to
    :func:`db_supervision_maps`.
    """
    images = np.asarray(images, dtype=np.float32)
    n, h, w = images.shape[:3]
    if len(polygons_per_image) != n:
        raise ValueError(
            f"{len(polygons_per_image)} polygon lists for {n} images")
    if ignore_per_image is None:
        ignores = [None] * n
    else:
        ignores = list(ignore_per_image)
        if len(ignores) != n:
            raise ValueError(f"{len(ignores)} ignore lists for {n} images")
    maps = [db_supervision_maps((h, w), polys, ignore=ign, **kwargs)
            for polys, ign in zip(polygons_per_image, ignores)]
    batch = {k: np.stack([m[k] for m in maps]) for k in maps[0]}
    batch["image"] = images
    return batch

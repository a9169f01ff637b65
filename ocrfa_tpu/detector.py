"""Detector drivers: CRAFT (and DBNet) page -> text-box extraction.

TPU-native rebuild of ``/root/reference/src/ocrfa/detectors.py``:
``test_net`` (:24-73) becomes a jitted batched forward with the heatmaps
reduced on-device; ``get_textbox`` (:95-114) flattens boxes identically.

Shape policy: each page canvas is the reference's aspect-preserving /32
padded size by default (exact parity; XLA caches one executable per page
shape).  ``canvas_bucket`` optionally rounds canvases up to coarser steps to
bound compile count in serving.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ocrfa_tpu.geometry.craft_post import adjust_result_coordinates, get_det_boxes
from ocrfa_tpu.models.craft import craft_apply
from ocrfa_tpu.preproc.host import normalize_mean_variance, resize_aspect_ratio


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class CraftDetector:
    """Device-resident CRAFT with per-shape jit cache."""

    def __init__(self, params, compute_dtype=jnp.float32, mesh=None,
                 canvas_bucket: int | None = None, quantized=None,
                 calibration_batches=None):
        """``quantized="static"`` runs the calibrated int8 tower (the TPU
        twin of the reference's always-on detector quantize_dynamic,
        detectors.py:81-85); pass normalised f32 canvas
        ``calibration_batches`` to fix the activation scales."""
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.canvas_bucket = canvas_bucket
        if quantized:
            from ocrfa_tpu.models.quant_craft import resolve_craft_inference

            params, apply_fn = resolve_craft_inference(
                params, quantized, calibration_batches)
        else:
            apply_fn = craft_apply
            if compute_dtype != jnp.float32:
                params = jax.tree.map(
                    lambda a: jnp.asarray(a, compute_dtype), params)
        if mesh is not None:
            from ocrfa_tpu.parallel.mesh import replicate

            params = replicate(params, mesh)
        self.params = jax.device_put(params)
        self._apply = jax.jit(apply_fn)

    def heatmaps(self, batch: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) normalised canvases -> (N, H/2, W/2, 2) maps."""
        x = jnp.asarray(batch, self.compute_dtype)
        if self.mesh is not None:
            from ocrfa_tpu.parallel.mesh import shard_batch

            x = shard_batch(x, self.mesh)
        y, _ = self._apply(self.params, x)
        return np.asarray(y.astype(jnp.float32))

    def __call__(self, image, canvas_size: int = 2560, mag_ratio: float = 1.0,
                 text_threshold: float = 0.7, link_threshold: float = 0.4,
                 low_text: float = 0.4, poly: bool = False,
                 estimate_num_chars: bool = False):
        """Page(s) -> (boxes_list, polys_list), test_net parity
        (detectors.py:24-73)."""
        if isinstance(image, np.ndarray) and image.ndim == 4:
            image_arrs = image
        else:
            image_arrs = [image]

        img_resized_list = []
        for img in image_arrs:
            img_resized, target_ratio, _ = resize_aspect_ratio(
                img, canvas_size, mag_ratio=mag_ratio
            )
            if self.canvas_bucket:
                h, w, c = img_resized.shape
                hb = _round_up(h, self.canvas_bucket)
                wb = _round_up(w, self.canvas_bucket)
                if (hb, wb) != (h, w):
                    padded = np.zeros((hb, wb, c), dtype=img_resized.dtype)
                    padded[:h, :w] = img_resized
                    img_resized = padded
            img_resized_list.append(img_resized)
        ratio_h = ratio_w = 1 / target_ratio

        x = np.stack([normalize_mean_variance(img) for img in img_resized_list])
        y = self.heatmaps(x)

        boxes_list, polys_list = [], []
        for out in y:
            score_text = out[:, :, 0]
            score_link = out[:, :, 1]
            boxes, polys, mapper = get_det_boxes(
                score_text, score_link, text_threshold, link_threshold,
                low_text, poly, estimate_num_chars,
            )
            boxes = adjust_result_coordinates(boxes, ratio_w, ratio_h)
            polys = adjust_result_coordinates(polys, ratio_w, ratio_h)
            if estimate_num_chars:
                boxes = list(boxes)
                polys = list(polys)
            for k in range(len(polys)):
                if estimate_num_chars:
                    boxes[k] = (boxes[k], mapper[k])
                if polys[k] is None:
                    polys[k] = boxes[k]
            boxes_list.append(boxes)
            polys_list.append(polys)
        return boxes_list, polys_list


def get_textbox(detector: CraftDetector, image, canvas_size, mag_ratio,
                text_threshold, link_threshold, low_text, poly,
                optimal_num_chars=None, **kwargs):
    """Flatten detected polys to int32 arrays (get_textbox parity,
    detectors.py:95-114)."""
    estimate_num_chars = optimal_num_chars is not None
    _, polys_list = detector(
        image, canvas_size=canvas_size, mag_ratio=mag_ratio,
        text_threshold=text_threshold, link_threshold=link_threshold,
        low_text=low_text, poly=poly, estimate_num_chars=estimate_num_chars,
    )
    if estimate_num_chars:
        polys_list = [
            [p for p, _ in sorted(polys, key=lambda x: abs(optimal_num_chars - x[1]))]
            for polys in polys_list
        ]

    return [
        [np.array(box).astype(np.int32).reshape(-1) for box in polys]
        for polys in polys_list
    ]

"""DBNet detector driver: page -> binarization heatmap -> text boxes.

Rebuild of the reference ``DBNet`` facade + driver pair
(``/root/reference/src/ocrfa/DBNet/DBNet.py``, ``detectors.py:117-220``):
resize-to-/32, BGR-mean normalisation, jitted model forward, then
bitmap -> boxes via contour tracing, min-area rects, score gating, and
round-join polygon unclipping (pyclipper/shapely/cv2 replaced by
:mod:`ocrfa_tpu.geometry.contours`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ocrfa_tpu.geometry.contours import (
    approx_poly_dp,
    arc_length,
    find_contours,
    polygon_mean,
    unclip,
)
from ocrfa_tpu.geometry.minrect import min_area_rect
from ocrfa_tpu.models.dbnet import dbnet_apply, init_dbnet

# configs/DBNet_inference.yaml:44-50
BGR_MEAN = np.array([122.67891434, 116.66876762, 104.00698793])
MIN_DETECTION_SIZE = 640
MAX_DETECTION_SIZE = 2560


def get_mini_boxes(points):
    """Min-area rect corners in the reference's index order
    (DBNet.py:335-356); returns (4-point box, short side)."""
    corners, (w, h) = min_area_rect(np.asarray(points, dtype=np.float64))
    pts = sorted(corners.tolist(), key=lambda x: x[0])
    if pts[1][1] > pts[0][1]:
        i1, i4 = 0, 1
    else:
        i1, i4 = 1, 0
    if pts[3][1] > pts[2][1]:
        i2, i3 = 2, 3
    else:
        i2, i3 = 3, 2
    box = [pts[i1], pts[i2], pts[i3], pts[i4]]
    return box, min(w, h)


class DBNetDetector:
    """Device-resident DBNet with /32-shaped jit cache."""

    def __init__(self, params, backbone: str = "resnet18",
                 compute_dtype=jnp.float32, mesh=None,
                 dcn_impl: str = "gather", dcn_guard: bool = True):
        """``dcn_impl="bounded2"/"bounded1"``: clamped dense-shift DCN —
        1.4-2.6x faster per stage on TPU (scripts/probe_dcn.py); exact vs
        the default ``"gather"`` whenever trained offsets fit the radius.

        ``dcn_guard`` (default on): whether a bounded impl validates the
        checkpoint's actual offset magnitudes on the first batch it sees
        and FALLS BACK to the exact gather formulation when they exceed
        the radius.  Offsets are input-dependent, so this can't run at
        build time — but one measured page is representative (self-trained
        dbnet18: p95 8.1 px, EVAL_SELFTRAINED_DBNET_r3.json, where the
        unguarded bounded1 path silently cratered e2e CER 0.05 -> 0.44).
        """
        self.backbone = backbone
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.device = "tpu"
        self.dcn_impl = dcn_impl
        # bounded impls validate trained-offset magnitudes on first use
        self._dcn_validated = not (dcn_guard
                                   and dcn_impl.startswith("bounded"))
        self.dcn_offset_stats = None
        if compute_dtype != jnp.float32:
            params = jax.tree.map(lambda a: jnp.asarray(a, compute_dtype), params)
        if mesh is not None:
            from ocrfa_tpu.parallel.mesh import replicate

            params = replicate(params, mesh)
        self.params = jax.device_put(params)
        if "concat_attention" in params.get("decoder", {}):
            from ocrfa_tpu.checkpoints import asf_attention_type

            self._decoder, self._attn = "asf", asf_attention_type(params)
        else:
            self._decoder, self._attn = "fpn", "scale_spatial"
        self._apply = self._build_apply(dcn_impl)

    def _build_apply(self, dcn_impl):
        return jax.jit(
            lambda p, x: dbnet_apply(p, x.astype(self.compute_dtype),
                                     backbone=self.backbone,
                                     decoder=self._decoder,
                                     attention_type=self._attn,
                                     dcn_impl=dcn_impl).astype(jnp.float32)
        )

    def _validate_dcn_offsets(self, x):
        """First-batch bounded-DCN guard: measure the checkpoint's offset
        percentiles on one real canvas; fall back to exact gather when the
        p95 |offset| exceeds the clamp radius (the bounded formulation is
        only exact inside it — deform_conv_cuda_kernel.cu:570-633 semantics
        are unbounded)."""
        import warnings

        from ocrfa_tpu.models.dbnet import dcn_offset_maps

        radius = float(self.dcn_impl[len("bounded"):])
        block = "basic" if self.backbone == "resnet18" else "bottleneck"

        def stats(p, x1):
            offs = dcn_offset_maps(p, x1, block=block)
            flat = jnp.abs(jnp.concatenate(
                [v.astype(jnp.float32).ravel() for v in offs.values()]))
            return jnp.percentile(flat, jnp.asarray([50.0, 95.0, 99.0, 100.0]))

        q = np.asarray(jax.jit(stats)(self.params["backbone"], x[:1]))
        self.dcn_offset_stats = {
            "p50": float(q[0]), "p95": float(q[1]),
            "p99": float(q[2]), "max": float(q[3]), "radius": radius,
        }
        self._dcn_validated = True
        if q[1] > radius:
            warnings.warn(
                f"dcn_impl={self.dcn_impl!r} is unsafe for this checkpoint: "
                f"measured |offset| p95={q[1]:.2f} px exceeds the ±{radius:g} "
                f"clamp (p99={q[2]:.2f}, max={q[3]:.2f}) — falling back to "
                f"the exact 'gather' formulation. Pass dcn_guard=False to "
                f"force the bounded path.", stacklevel=3)
            self.dcn_impl = "gather"
            self._apply = self._build_apply("gather")

    @classmethod
    def from_torch(cls, state_dict, backbone: str = "resnet18", **kwargs):
        from ocrfa_tpu.checkpoints import convert_dbnet

        return cls(convert_dbnet(state_dict, backbone), backbone=backbone, **kwargs)

    @classmethod
    def random_init(cls, seed: int = 0, backbone: str = "resnet18", **kwargs):
        return cls(init_dbnet(jax.random.PRNGKey(seed), backbone=backbone),
                   backbone=backbone, **kwargs)

    # -- preprocessing (DBNet.py:116-138) --------------------------------

    def resize_image(self, img, detection_size=None):
        height, width, _ = img.shape
        if detection_size is None:
            detection_size = max(
                MIN_DETECTION_SIZE, min(height, width, MAX_DETECTION_SIZE)
            )
        if height < width:
            new_height = int(math.ceil(detection_size / 32) * 32)
            new_width = int(math.ceil(new_height / height * width / 32) * 32)
        else:
            new_width = int(math.ceil(detection_size / 32) * 32)
            new_height = int(math.ceil(new_width / width * height / 32) * 32)
        resized = np.asarray(
            Image.fromarray(img.astype(np.uint8)).resize(
                (new_width, new_height), Image.BILINEAR
            ),
            dtype=np.float32,
        )
        return resized, (height, width)

    def normalize_image(self, image):
        return (image - BGR_MEAN) / 255.0

    def load_image(self, image, detection_size=None):
        """Path/array/PIL -> normalised tensor + original shape
        (DBNet.py:101-146 equivalent)."""
        if isinstance(image, str):
            img = np.asarray(Image.open(image).convert("RGB"), dtype=np.float32)
            img = img[:, :, ::-1]  # reference reads BGR via cv2
        elif isinstance(image, np.ndarray):
            img = image.astype(np.float32)
        elif isinstance(image, Image.Image):
            img = np.asarray(image, dtype=np.float32)[:, :, ::-1]
        else:
            raise TypeError(
                "Unsupport image format. Only path-to-file, opencv BGR image, "
                "and PIL image are supported."
            )
        img, original_shape = self.resize_image(img, detection_size)
        return self.normalize_image(img), original_shape

    def inference(self, image, text_threshold=0.2, bbox_min_score=0.2,
                  bbox_min_size=3, max_candidates=0, detection_size=None,
                  as_polygon=False, return_scores=False):
        """Standalone detection API (DBNet.py:378-410 equivalent)."""
        if not isinstance(image, list):
            image = [image]
        pairs = [self.load_image(img, detection_size) for img in image]
        batch = np.stack([p[0] for p in pairs]).astype(np.float32)
        original_shapes = [p[1] for p in pairs]
        hmaps = self.image2hmap(batch)
        batch_boxes, batch_scores = self.hmap2bbox(
            original_shapes, hmaps, text_threshold=text_threshold,
            bbox_min_score=bbox_min_score, bbox_min_size=bbox_min_size,
            max_candidates=max_candidates, as_polygon=as_polygon,
        )
        if return_scores:
            return batch_boxes, batch_scores
        return batch_boxes

    # -- forward ----------------------------------------------------------

    def image2hmap(self, batch: np.ndarray) -> np.ndarray:
        """(N, H, W, 3) normalised -> (N, H, W) probability heatmaps."""
        x = jnp.asarray(batch.astype(np.float32))
        if not self._dcn_validated:
            self._validate_dcn_offsets(x)
        if self.mesh is not None:
            from ocrfa_tpu.parallel.mesh import shard_batch

            x = shard_batch(x, self.mesh)
        return np.asarray(self._apply(self.params, x))[..., 0]

    # -- postprocessing (DBNet.py:154-373) --------------------------------

    @staticmethod
    def binarize(hmap, threshold):
        return hmap > threshold

    @staticmethod
    def boxes_from_bitmap(hmap, bitmap, dest_width, dest_height,
                          bbox_min_score=0.2, bbox_min_size=3, max_candidates=0):
        height, width = bitmap.shape
        contours = find_contours(bitmap)
        if max_candidates > 0:
            contours = contours[:max_candidates]

        boxes, scores = [], []
        for contour in contours:
            points, sside = get_mini_boxes(contour)
            if sside < bbox_min_size:
                boxes.append(np.zeros((4, 2), dtype=np.int16).tolist())
                scores.append(0.0)
                continue
            points = np.array(points)
            score = polygon_mean(hmap, points)
            if score < bbox_min_score:
                boxes.append(np.zeros((4, 2), dtype=np.int16).tolist())
                scores.append(0.0)
                continue
            expanded = unclip(points)
            if expanded.dtype == object:  # split into multiple regions
                boxes.append(np.zeros((4, 2), dtype=np.int16).tolist())
                scores.append(0.0)
                continue
            box, sside = get_mini_boxes(expanded.reshape(-1, 2))
            if sside < bbox_min_size + 2:
                boxes.append(np.zeros((4, 2), dtype=np.int16).tolist())
                scores.append(0.0)
                continue
            box = np.array(box)
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width), 0, dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height), 0, dest_height)
            boxes.append(box.astype(np.int16).tolist())
            scores.append(score)
        return boxes, np.array(scores, dtype=np.float32)

    @staticmethod
    def polygons_from_bitmap(hmap, bitmap, dest_width, dest_height,
                             bbox_min_score=0.2, bbox_min_size=3, max_candidates=0):
        height, width = bitmap.shape
        contours = find_contours(bitmap)
        if max_candidates > 0:
            contours = contours[:max_candidates]

        boxes, scores = [], []
        for contour in contours:
            epsilon = 0.002 * arc_length(contour, closed=True)
            points = approx_poly_dp(contour, epsilon, closed=True)
            if points.shape[0] < 4:
                continue
            score = polygon_mean(hmap, points.reshape(-1, 2).astype(np.float64))
            if score < bbox_min_score:
                continue
            expanded = unclip(points, unclip_ratio=2.0)
            if expanded.dtype == object:
                continue
            box = expanded.reshape(-1, 2).astype(np.float64)
            _, sside = get_mini_boxes(box)
            if sside < bbox_min_size + 2:
                continue
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width), 0, dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height), 0, dest_height)
            boxes.append(box.tolist())
            scores.append(score)
        return boxes, np.array(scores, dtype=np.float32)

    def hmap2bbox(self, original_shapes, hmaps, text_threshold=0.2,
                  bbox_min_score=0.2, bbox_min_size=3, max_candidates=0,
                  as_polygon=False):
        """Per-image bitmap -> boxes with the reference's zero-score filter
        (DBNet.py:154-201)."""
        segmentation = self.binarize(hmaps, text_threshold)
        boxes_batch, scores_batch = [], []
        for i in range(hmaps.shape[0]):
            height, width = original_shapes[i]
            fn = self.polygons_from_bitmap if as_polygon else self.boxes_from_bitmap
            boxes, scores = fn(
                hmaps[i], segmentation[i], width, height,
                bbox_min_score=bbox_min_score, bbox_min_size=bbox_min_size,
                max_candidates=max_candidates,
            )
            if np.any(np.asarray(scores) > 0):
                kept = [(b, s) for b, s in zip(boxes, scores) if s > 0]
                boxes, scores = zip(*kept)
            else:
                boxes, scores = (), ()
            boxes_batch.append(boxes)
            scores_batch.append(scores)
        return boxes_batch, scores_batch


def test_net_db(image, detector: DBNetDetector, threshold=0.2, bbox_min_score=0.2,
                bbox_min_size=3, max_candidates=0, canvas_size=None, poly=False):
    """detectors.py:117-163 equivalent."""
    if isinstance(image, np.ndarray) and image.ndim == 4:
        image_arrs = image
    else:
        image_arrs = [image]

    images, original_shapes = zip(
        *[detector.resize_image(img, canvas_size) for img in image_arrs]
    )
    batch = np.stack([detector.normalize_image(img) for img in images]).astype(np.float32)
    hmaps = detector.image2hmap(batch)
    bboxes, _ = detector.hmap2bbox(
        original_shapes, hmaps, text_threshold=threshold,
        bbox_min_score=bbox_min_score, bbox_min_size=bbox_min_size,
        max_candidates=max_candidates, as_polygon=False,
    )
    if poly:
        polys, _ = detector.hmap2bbox(
            original_shapes, hmaps, text_threshold=threshold,
            bbox_min_score=bbox_min_score, bbox_min_size=bbox_min_size,
            max_candidates=max_candidates, as_polygon=True,
        )
    else:
        polys = bboxes
    return bboxes, polys


def get_textbox_db(detector: DBNetDetector, image, canvas_size=None, poly=False,
                   threshold=0.2, bbox_min_score=0.2, bbox_min_size=3,
                   max_candidates=0, **kwargs):
    """detectors.py:190-220 equivalent."""
    _, polys_list = test_net_db(
        image, detector, threshold=threshold, bbox_min_score=bbox_min_score,
        bbox_min_size=bbox_min_size, max_candidates=max_candidates,
        canvas_size=canvas_size, poly=poly,
    )
    return [
        [np.array(box).astype(np.int32).reshape(-1) for box in polys]
        for polys in polys_list
    ]

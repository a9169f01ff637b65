"""Corpus-scale page serving (BASELINE config 5).

Streams pages through the full OCR pipeline with device-resident data:

1. each grey page uploads **once** as uint8;
2. the detection canvas (aspect resize to /32, ImageNet normalise,
   grey->RGB broadcast) is built on-device from that page;
3. CRAFT heatmaps come back (small) for host box extraction + grouping;
4. recognition runs through the fused device page pipeline
   (:class:`ocrfa_tpu.preproc.device.DevicePagePipeline`) against the same
   resident page — crops never touch the host.

Pages are processed with a simple software pipeline: detection for page
i+1 is dispatched while page i's boxes are being extracted/recognised.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

from ocrfa_tpu.decode.device import keep_mask_for
from ocrfa_tpu.geometry import group_text_box
from ocrfa_tpu.geometry.craft_post import (
    adjust_result_coordinates,
    get_det_boxes_from_masks,
)
from ocrfa_tpu.models.craft import craft_apply
from ocrfa_tpu.preproc.device import DevicePagePipeline


def _packbits(mask):
    """(..., W) bool -> (..., W/8) uint8, np.unpackbits-compatible order."""
    *lead, w = mask.shape
    bits = mask.reshape(*lead, w // 8, 8).astype(jnp.uint8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (bits * weights).sum(axis=-1).astype(jnp.uint8)


def _seed_detection(heatmaps, text_threshold, low_text, link_threshold):
    """Device epilogue: the three threshold masks, bit-packed and stacked.

    Exactly the masks :func:`get_det_boxes_from_masks` consumes — the f32
    comparisons happen on-device, so the host component loop is bit-exact
    with the parity path while the download shrinks ~21x vs f32 heatmaps.
    Returns ONE ``(3, ..., W/8)`` uint8 array (comb, link_only, text_over
    along axis 0): each materialisation is a full relay round trip
    (~26 ms regardless of size), so the three planes travel together.
    """
    text = heatmaps[..., 0]
    link = heatmaps[..., 1]
    text_mask = text > low_text
    link_mask = link > link_threshold
    comb = text_mask | link_mask
    link_only = link_mask & ~text_mask
    text_over = text >= text_threshold
    return jnp.stack(
        [_packbits(comb), _packbits(link_only), _packbits(text_over)])

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32) * 255.0
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32) * 255.0


def _round32(x: int) -> int:
    return -(-x // 32) * 32


class _Immediate:
    """Future-alike for the overlap=False path of process_waves."""

    def __init__(self, value):
        self._value = value

    def result(self):
        return self._value


class ServingPipeline:
    """Full-page OCR over a page stream with device-resident staging."""

    def __init__(self, detector_params, recognizer, canvas_size: int = 1280,
                 use_pallas: bool = False, text_threshold: float = 0.7,
                 link_threshold: float = 0.4, low_text: float = 0.4,
                 min_size: int = 20, mesh=None, detector_quantized=None,
                 detector_calibration=None, detector_family: str = "craft",
                 db_backbone: str = "resnet18", db_min_size: int = 640,
                 db_threshold: float = 0.2, db_bbox_min_score: float = 0.2,
                 db_bbox_min_size: int = 3, db_dcn_impl: str = "gather",
                 page_wire: str = "u8"):
        """``mesh``: replicate detector/recognizer params across a device
        mesh; page batches submitted via :meth:`submit_page_batch` then
        shard along the data axis.

        ``detector_quantized="static"`` runs the calibrated int8 CRAFT
        tower (:mod:`ocrfa_tpu.models.quant_craft`); pass normalised f32
        canvases as ``detector_calibration``.

        ``detector_family="dbnet"`` serves DBNet pages instead of CRAFT:
        the reference's stretch-to-/32 resize + BGR normalisation run
        on-device, and the seeds downloaded per page are the bit-packed
        binarized mask plus a u8-quantized probability map (~4.5x smaller
        than the f32 heatmap; box scores drift < 1/255 against the parity
        path; ``db_threshold`` is DBNet.py's binarize threshold, default
        0.2 like the reference — CRAFT's ``text_threshold`` does not
        apply).
        ``db_min_size`` mirrors the reference MIN_DETECTION_SIZE=640 —
        lower it for small test pages.

        ``page_wire="u4"/"u2"/"u1"``: sub-byte page upload (host pack ->
        device unpack), the recognition-ribbon playbook applied to the
        detection path — config-3 e2e is page-upload-bound on this relay
        (PAGES_r3.json: 29-51 e2e vs 187-237 compute pages/s)."""
        self.mesh = mesh
        self.page_wire = page_wire
        self.recognizer = recognizer
        # per-stage wall-second accumulators (host-blocking sections only;
        # SERVE_CORPUS_r4's 12 pages/s had no breakdown — never again).
        # With the wave pipeline's dispatch thread, stages OVERLAP: the
        # per-stage sums can exceed the stream's wall time.
        import threading

        self.stage_seconds = defaultdict(float)
        self._stage_lock = threading.Lock()
        self.page_pipe = DevicePagePipeline(recognizer, use_pallas=use_pallas)
        self.canvas_size = canvas_size
        self.text_threshold = text_threshold
        self.link_threshold = link_threshold
        self.low_text = low_text
        self.min_size = min_size
        self.keep_mask = keep_mask_for(
            recognizer.converter.num_classes, recognizer.converter.ignore_idx
        )
        self.family = detector_family
        if detector_family == "dbnet":
            if detector_quantized:
                raise ValueError("detector_quantized supports craft only")
            self.db_min_size = db_min_size
            self.db_threshold = db_threshold
            self.db_bbox_min_score = db_bbox_min_score
            self.db_bbox_min_size = db_bbox_min_size
            # "bounded2"/"bounded1": clamped dense-shift DCN, 1.4-2.6x
            # faster per stage on TPU (scripts/probe_dcn.py); "gather" is
            # the exact reference-parity path
            self.db_dcn_impl = db_dcn_impl
            self._init_dbnet(detector_params, db_backbone)
            return
        if detector_family != "craft":
            raise ValueError(f"unknown detector_family {detector_family!r}")
        if detector_quantized:
            from ocrfa_tpu.models.quant_craft import resolve_craft_inference

            detector_params, det_apply = resolve_craft_inference(
                detector_params, detector_quantized, detector_calibration)
        else:
            det_apply = craft_apply
        if mesh is not None:
            from ocrfa_tpu.parallel.mesh import replicate

            detector_params = replicate(detector_params, mesh)
        self.det_params = jax.device_put(detector_params)

        def _detect(params, page_u8, *, target_hw, canvas_hw):
            # device-side detector preproc: aspect resize + zero-pad to /32
            # (resize_aspect_ratio semantics) + ImageNet norm + grey->RGB
            page = page_u8.astype(jnp.float32)
            resized = jax.image.resize(page, target_hw, method="bilinear")
            canvas = jnp.zeros(canvas_hw, jnp.float32)
            canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, 0))
            rgb = jnp.broadcast_to(canvas[..., None], (*canvas_hw, 3))
            x = (rgb - _IMAGENET_MEAN) / _IMAGENET_STD
            y, _ = det_apply(params, x[None])
            return _seed_detection(y[0], self.text_threshold, self.low_text,
                                   self.link_threshold)

        self._detect = jax.jit(_detect, static_argnames=("target_hw", "canvas_hw"))

        def _detect_batch(params, pages_u8, *, target_hw, canvas_hw):
            n = pages_u8.shape[0]
            pages = pages_u8.astype(jnp.float32)
            resized = jax.image.resize(pages, (n, *target_hw), method="bilinear")
            canvas = jnp.zeros((n, *canvas_hw), jnp.float32)
            canvas = jax.lax.dynamic_update_slice(canvas, resized, (0, 0, 0))
            rgb = jnp.broadcast_to(canvas[..., None], (n, *canvas_hw, 3))
            x = (rgb - _IMAGENET_MEAN) / _IMAGENET_STD
            y, _ = det_apply(params, x)
            return _seed_detection(y, self.text_threshold, self.low_text,
                                   self.link_threshold)

        self._detect_batch = jax.jit(
            _detect_batch, static_argnames=("target_hw", "canvas_hw"))

    def _init_dbnet(self, detector_params, backbone: str):
        from ocrfa_tpu.detector_db import BGR_MEAN
        from ocrfa_tpu.models.dbnet import dbnet_apply

        if "concat_attention" in detector_params.get("decoder", {}):
            from ocrfa_tpu.checkpoints import asf_attention_type

            decoder, attn = "asf", asf_attention_type(detector_params)
        else:
            decoder, attn = "fpn", "scale_spatial"
        if self.mesh is not None:
            from ocrfa_tpu.parallel.mesh import replicate

            detector_params = replicate(detector_params, self.mesh)
        self.det_params = jax.device_put(detector_params)
        bgr_mean = jnp.asarray(np.asarray(BGR_MEAN, np.float32))

        def seeds(prob):
            # one payload per page (single download round trip): packed
            # binarized mask (W/8 cols) + u8-quantized prob map (W cols)
            mask = prob > self.db_threshold
            q = jnp.round(prob * 255.0).astype(jnp.uint8)
            return jnp.concatenate([_packbits(mask), q], axis=-1)

        def _detect(params, page_u8, *, canvas_hw):
            page = page_u8.astype(jnp.float32)
            # reference resize_image STRETCHES both dims to /32 multiples
            # (no aspect pad, DBNet.py:116-130); grey -> identical BGR
            resized = jax.image.resize(page, canvas_hw, method="bilinear")
            bgr = jnp.broadcast_to(resized[..., None], (*canvas_hw, 3))
            x = (bgr - bgr_mean) / 255.0
            prob = dbnet_apply(params, x[None], backbone=backbone,
                               decoder=decoder, attention_type=attn,
                               dcn_impl=self.db_dcn_impl)[0, ..., 0]
            return seeds(prob)

        self._detect = jax.jit(_detect, static_argnames=("canvas_hw",))

        def _detect_batch(params, pages_u8, *, canvas_hw):
            n = pages_u8.shape[0]
            pages = pages_u8.astype(jnp.float32)
            resized = jax.image.resize(pages, (n, *canvas_hw),
                                       method="bilinear")
            bgr = jnp.broadcast_to(resized[..., None], (n, *canvas_hw, 3))
            x = (bgr - bgr_mean) / 255.0
            prob = dbnet_apply(params, x, backbone=backbone,
                               decoder=decoder, attention_type=attn,
                               dcn_impl=self.db_dcn_impl)[..., 0]
            return seeds(prob)

        self._detect_batch = jax.jit(_detect_batch,
                                     static_argnames=("canvas_hw",))

    def _canvas_hw_db(self, h: int, w: int):
        """Reference resize_image dims (DBNet.py:116-130) with
        ``canvas_size`` as MAX_DETECTION_SIZE."""
        import math

        ds = max(self.db_min_size, min(h, w, self.canvas_size))
        if h < w:
            nh = int(math.ceil(ds / 32) * 32)
            nw = int(math.ceil(nh / h * w / 32) * 32)
        else:
            nw = int(math.ceil(ds / 32) * 32)
            nh = int(math.ceil(nw / w * h / 32) * 32)
        return (nh, nw)

    def _canvas_hw(self, h: int, w: int):
        target = min(self.canvas_size, max(h, w))
        ratio = target / max(h, w)
        th, tw = int(h * ratio), int(w * ratio)
        return (th, tw), (_round32(th), _round32(tw)), ratio

    def submit_page(self, page_grey_u8: np.ndarray):
        """Dispatch device work for one page; returns an opaque handle."""
        h, w = page_grey_u8.shape
        page_dev = self.page_pipe.put_page(page_grey_u8, wire=self.page_wire)
        if self.family == "dbnet":
            canvas_hw = self._canvas_hw_db(h, w)
            seeds = self._detect(self.det_params, page_dev,
                                 canvas_hw=canvas_hw)
            return (page_dev, seeds, (h, w))
        target_hw, canvas_hw, ratio = self._canvas_hw(h, w)
        seeds = self._detect(self.det_params, page_dev, target_hw=target_hw,
                             canvas_hw=canvas_hw)
        return (page_dev, seeds, ratio)

    def submit_page_batch(self, pages):
        """Dispatch a batch of same-shape grey pages, sharded across the
        mesh when one is configured.  Returns a list of per-page handles."""
        batch = np.stack(pages)
        h, w = batch.shape[1:]
        if self.page_wire != "u8":
            from ocrfa_tpu.preproc.device import pack_page, unpack_page

            packed = np.stack([pack_page(p, self.page_wire) for p in pages])
            x = unpack_page(jnp.asarray(packed), self.page_wire, w)
        else:
            x = jnp.asarray(batch)
        if self.mesh is not None:
            from ocrfa_tpu.parallel.mesh import shard_batch

            x = shard_batch(x, self.mesh)
        if self.family == "dbnet":
            canvas_hw = self._canvas_hw_db(h, w)
            seeds = self._detect_batch(self.det_params, x,
                                       canvas_hw=canvas_hw)
            return [(x[i], seeds[i], (h, w)) for i in range(len(pages))]
        target_hw, canvas_hw, ratio = self._canvas_hw(h, w)
        seeds = self._detect_batch(
            self.det_params, x, target_hw=target_hw, canvas_hw=canvas_hw)
        # pages stay device-resident; recognition slices reuse them
        return [(x[i], seeds[:, i], ratio) for i in range(len(pages))]

    @contextmanager
    def _stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._stage_lock:
                self.stage_seconds[name] += dt

    def _boxes_from_seeds(self, seeds_np, geom):
        """Downloaded detection seeds (host arrays) -> page-space boxes."""
        if self.family == "dbnet":
            from ocrfa_tpu.detector_db import DBNetDetector

            h, w = geom
            payload = seeds_np
            cw = payload.shape[-1] * 8 // 9  # packed W/8 cols + u8 W cols
            mask = np.unpackbits(payload[:, :cw // 8], axis=-1).astype(bool)
            hmap = payload[:, cw // 8:].astype(np.float32) / 255.0
            boxes, scores = DBNetDetector.boxes_from_bitmap(
                hmap, mask, w, h, bbox_min_score=self.db_bbox_min_score,
                bbox_min_size=self.db_bbox_min_size)
            return [np.asarray(b, np.float64) for b, s in zip(boxes, scores)
                    if s > 0]
        comb_p, link_p, over_p = seeds_np
        comb = np.unpackbits(comb_p, axis=-1).astype(bool)
        link_only = np.unpackbits(link_p, axis=-1).astype(bool)
        text_over = np.unpackbits(over_p, axis=-1).astype(bool)
        boxes, _, _ = get_det_boxes_from_masks(comb, link_only, text_over)
        inv = 1.0 / geom
        return adjust_result_coordinates(boxes, inv, inv)

    def _horizontal_from_boxes(self, boxes):
        polys = [np.array(b).astype(np.int32).reshape(-1) for b in boxes]
        horizontal, _free = group_text_box(polys)
        if self.min_size:
            horizontal = [
                b for b in horizontal
                if max(b[1] - b[0], b[3] - b[2]) > self.min_size
            ]
        return horizontal

    @staticmethod
    def _page_output(horizontal, results):
        out = []
        for box, (text, conf) in zip(horizontal, results):
            x0, x1, y0, y1 = box
            quad = [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
            out.append((quad, text, conf))
        return out

    def detect_boxes(self, handle):
        """Detection seeds -> page-space quad boxes (pre-grouping)."""
        _page_dev, seeds, geom = handle
        with self._stage("seed_fetch"):
            seeds_np = np.asarray(seeds)  # one round trip
        with self._stage("host_geometry"):
            return self._boxes_from_seeds(seeds_np, geom)

    def finish_page(self, handle):
        """Detection seeds -> boxes -> batched recognition; returns
        [(box, text, confidence), ...]."""
        page_dev = handle[0]
        boxes = self.detect_boxes(handle)
        with self._stage("host_geometry"):
            horizontal = self._horizontal_from_boxes(boxes)
        with self._stage("recognize"):
            results = self.page_pipe.recognize_boxes(
                page_dev, horizontal, self.keep_mask)
        return self._page_output(horizontal, results)

    def process(self, pages, depth: int = 2):
        """Pipeline a stream of grey uint8 pages; yields per-page results."""
        inflight = []
        for page in pages:
            inflight.append(self.submit_page(page))
            if len(inflight) >= depth:
                yield self.finish_page(inflight.pop(0))
        while inflight:
            yield self.finish_page(inflight.pop(0))

    # ---- wave path: corpus-scale batched serving ---------------------------
    # SERVE_CORPUS_r4 measured 12 pages/s because finish_page serialises
    # ~3 host-blocking relay round trips (~26 ms each, CLAUDE.md) per page:
    # seed download, recognition dispatch, payload download — with ~6 lines
    # per page the RTT chain, not compute, set the rate.  The wave path
    # amortises every round trip over a WAVE of pages: one batched
    # detection dispatch, ONE seed download per wave, cross-page bucketed
    # recognition from the resident page stack (one dispatch + one download
    # per occupied width bucket), with waves double-buffered so recognition
    # of wave i overlaps detection of wave i+1.

    def submit_wave(self, pages):
        """Upload + dispatch batched detection for same-shape grey pages.

        Returns an opaque wave handle for :meth:`finish_wave`."""
        batch = np.stack(pages)
        h, w = batch.shape[1:]
        with self._stage("upload_pack"):
            if self.page_wire != "u8":
                from ocrfa_tpu.preproc.device import pack_page, unpack_page

                packed = np.stack([pack_page(p, self.page_wire)
                                   for p in pages])
                x = unpack_page(jnp.asarray(packed), self.page_wire, w)
            else:
                x = jnp.asarray(batch)
            if self.mesh is not None:
                from ocrfa_tpu.parallel.mesh import shard_batch

                x = shard_batch(x, self.mesh)
        with self._stage("detect_dispatch"):
            if self.family == "dbnet":
                geom = (h, w)
                seeds = self._detect_batch(self.det_params, x,
                                           canvas_hw=self._canvas_hw_db(h, w))
            else:
                target_hw, canvas_hw, ratio = self._canvas_hw(h, w)
                geom = ratio
                seeds = self._detect_batch(self.det_params, x,
                                           target_hw=target_hw,
                                           canvas_hw=canvas_hw)
            try:  # start the seed d2h transfer behind the next wave's work
                seeds.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
        return (x, seeds, geom, len(pages))

    def dispatch_wave(self, handle):
        """Seed download + host geometry + recognition dispatch for a wave
        (everything except the final payload download)."""
        x, seeds, geom, n = handle
        with self._stage("seed_fetch"):
            seeds_np = np.asarray(seeds)  # ONE round trip for the wave
        boxes_per_page = []
        with self._stage("host_geometry"):
            for i in range(n):
                per_page = (seeds_np[i] if self.family == "dbnet"
                            else seeds_np[:, i])
                boxes = self._boxes_from_seeds(per_page, geom)
                boxes_per_page.append(self._horizontal_from_boxes(boxes))
        with self._stage("rec_dispatch"):
            if self.mesh is not None:
                # recognition gathers arbitrary (page, row) pairs across the
                # wave; pages ride replicated for the crop gather (the
                # sharded-recognition shape is covered by the multichip
                # dryrun's pad-and-shard path)
                from ocrfa_tpu.parallel.mesh import replicate

                x = replicate(x, self.mesh)
            rec = self.page_pipe.dispatch_boxes_multi(
                x, boxes_per_page, self.keep_mask)
        return (rec, boxes_per_page)

    def collect_wave(self, dispatched):
        """Block on a dispatched wave; returns per-page result lists."""
        rec, boxes_per_page = dispatched
        with self._stage("rec_collect"):
            per_page = self.page_pipe.collect_boxes_multi(rec)
        return [self._page_output(h, r)
                for h, r in zip(boxes_per_page, per_page)]

    def finish_wave(self, handle):
        return self.collect_wave(self.dispatch_wave(handle))

    def process_waves(self, pages, wave: int = 16, depth: int = 2,
                      overlap: bool = True):
        """Stream pages through the wave pipeline; yields per-page results.

        ``depth`` waves of detection stay in flight ahead of the
        seed-fetch/recognition stage, and one recognition wave stays in
        flight behind it, so detector compute, relay transfers, and host
        geometry overlap.

        ``overlap`` (default): :meth:`dispatch_wave` (seed download + host
        box geometry + recognition dispatch) runs on ONE worker thread so
        it overlaps the main thread's page packing/uploads and payload
        collection — the seed np.asarray releases the GIL during the relay
        transfer and the geometry is numpy/scipy C under the hood, so the
        two threads genuinely interleave (these two stages were ~80% of
        the serial wave wall).  Wave ORDER is preserved (single worker,
        FIFO queues)."""
        from concurrent.futures import ThreadPoolExecutor

        det_q, rec_q = [], []
        buf = []
        pool = ThreadPoolExecutor(1) if overlap else None
        dispatch = (pool.submit if overlap
                    else lambda fn, h: _Immediate(fn(h)))

        try:
            def pump():
                while det_q and len(det_q) >= depth:
                    rec_q.append(dispatch(self.dispatch_wave, det_q.pop(0)))
                    while len(rec_q) > 1:
                        yield from self.collect_wave(rec_q.pop(0).result())

            for page in pages:
                buf.append(page)
                if len(buf) >= wave:
                    det_q.append(self.submit_wave(buf))
                    buf = []
                    yield from pump()
            if buf:
                det_q.append(self.submit_wave(buf))
            while det_q:
                rec_q.append(dispatch(self.dispatch_wave, det_q.pop(0)))
            while rec_q:
                yield from self.collect_wave(rec_q.pop(0).result())
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

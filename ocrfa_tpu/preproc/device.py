"""On-device page -> line-crop preprocessing (the north-star fused path).

The reference's per-crop host loop (slice -> PIL resize -> normalise -> pad,
``utils.py:1375-1418`` + ``:567-602``) becomes one device computation: the
grey page is uploaded once as uint8 and every line crop is produced by a
batched bilinear crop-resize directly into the width-bucketed recognition
batch, normalised to [-1, 1] in the same program.

Replicate-edge right padding falls out of coordinate clamping: output
columns beyond a crop's aspect-preserved width sample the crop's last
source column.

This path is for high-throughput serving (configs 3/5); the host path in
:mod:`ocrfa_tpu.preproc.host` reproduces the reference's exact PIL kernels
for parity work.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PAGE_WIRE_PX = {"u8": 1, "u4": 2, "u2": 4, "u1": 8}


def pack_page(page_u8, wire: str = "u4"):
    """Grey (H, W) uint8 page -> packed (H, ceil(W/px)) uint8 wire bytes.

    The detection-page analog of the recognition ribbon's sub-byte wire
    (``preproc.ribbon.pack_crops``): page uploads are the config-3 e2e
    wall (a 736^2 u8 page is 542 KB through a ~20-45 MB/s relay), and the
    heatmap survives 4-bit pixels — wire throughput is measured in
    ``scripts/bench_detectors.py --page-wire`` and wire accuracy rides
    along in ``scripts/serve_corpus.py`` (sampled CER on a u4 stream).
    LSB-first like the ribbon.
    Ragged widths pad with 255 (background white); ``unpack_page`` slices
    back to the true width.
    """
    import numpy as np

    px = _PAGE_WIRE_PX[wire]
    if px == 1:
        return np.asarray(page_u8, np.uint8)
    bits = 8 // px
    h, w = page_u8.shape
    wp = -(-w // px) * px
    rows = np.full((h, wp), 255, np.uint8)
    rows[:, :w] = page_u8
    q = rows >> (8 - bits)
    packed = np.zeros((h, wp // px), dtype=np.uint8)
    for i in range(px):
        packed |= q[:, i::px] << (i * bits)
    return packed


@partial(jax.jit, static_argnames=("wire", "width"))
def unpack_page(packed_u8, wire: str, width: int):
    """Inverse of :func:`pack_page` on-device: packed bytes -> (..., width)
    uint8 grey page(s) (quantized levels rescaled onto 0..255).  Leading
    batch dims pass through."""
    px = _PAGE_WIRE_PX[wire]
    if px == 1:
        return packed_u8[..., :width]
    bits = 8 // px
    mask = (1 << bits) - 1
    scale = jnp.uint8(255 // mask)
    parts = [((packed_u8 >> (i * bits)) & mask) * scale for i in range(px)]
    page = jnp.stack(parts, axis=-1).reshape(*packed_u8.shape[:-1], -1)
    return page[..., :width]


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def crop_resize_normalize(page_u8, boxes, out_h: int = 64, out_w: int = 512):
    """Batched crop + bilinear resize + normalise from a device page.

    Args:
      page_u8: (H, W) uint8 grey page.
      boxes:   (N, 4) int32 ``[x_min, x_max, y_min, y_max]`` (clipped,
               x_max/y_max exclusive).  Degenerate boxes produce junk rows
               the caller drops.
      out_h/out_w: static output shape (bucketed).

    Returns (N, out_h, out_w, 1) float32 in [-1, 1], plus (N,) int32 valid
    output widths.
    """
    page = page_u8.astype(jnp.float32)
    h, w = page.shape

    x0 = boxes[:, 0].astype(jnp.float32)
    x1 = boxes[:, 1].astype(jnp.float32)
    y0 = boxes[:, 2].astype(jnp.float32)
    y1 = boxes[:, 3].astype(jnp.float32)
    crop_w = jnp.maximum(x1 - x0, 1.0)
    crop_h = jnp.maximum(y1 - y0, 1.0)

    # aspect-preserved width at out_h, clamped to the bucket
    new_w = jnp.clip(jnp.ceil(out_h * crop_w / crop_h), 1, out_w)

    # half-pixel-center sampling grids, clamped to the crop (clamp beyond
    # new_w == replicate-edge pad)
    oy = jnp.arange(out_h, dtype=jnp.float32)
    ox = jnp.arange(out_w, dtype=jnp.float32)

    sy = (oy[None, :] + 0.5) * (crop_h[:, None] / out_h) - 0.5
    sy = jnp.clip(sy, 0.0, crop_h[:, None] - 1.0) + y0[:, None]        # (N, H)
    sx = (ox[None, :] + 0.5) * (crop_w[:, None] / new_w[:, None]) - 0.5
    sx = jnp.clip(sx, 0.0, crop_w[:, None] - 1.0) + x0[:, None]        # (N, W)

    y0i = jnp.floor(sy).astype(jnp.int32)
    x0i = jnp.floor(sx).astype(jnp.int32)
    fy = sy - y0i
    fx = sx - x0i
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y0i + 1, 0, h - 1)
    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x0i + 1, 0, w - 1)

    def sample(yi, xi):
        # (N, H) x (N, W) -> (N, H, W) gather from the page
        return page[yi[:, :, None], xi[:, None, :]]

    out = (
        sample(y0c, x0c) * (1 - fy)[:, :, None] * (1 - fx)[:, None, :]
        + sample(y0c, x1c) * (1 - fy)[:, :, None] * fx[:, None, :]
        + sample(y1c, x0c) * fy[:, :, None] * (1 - fx)[:, None, :]
        + sample(y1c, x1c) * fy[:, :, None] * fx[:, None, :]
    )
    out = (out / 255.0 - 0.5) / 0.5
    return out[..., None], new_w.astype(jnp.int32)


def crop_resize_normalize_pages(pages_u8, boxes, out_h: int = 64,
                                out_w: int = 512):
    """:func:`crop_resize_normalize` over a page STACK.

    Cross-page recognition batching for corpus serving: one fused dispatch
    covers crops from many resident pages, so the ~26 ms relay round trip
    per dispatch amortises over a wave of pages instead of one
    (SERVE_CORPUS_r4 measured 12 pages/s with per-page dispatches — the
    per-page RTT chain, not compute, was the wall).

    Args:
      pages_u8: (P, H, W) uint8 grey pages (same shape — corpus pages).
      boxes:    (N, 5) int32 ``[page, x_min, x_max, y_min, y_max]``.

    Returns (N, out_h, out_w, 1) float32 in [-1, 1], plus (N,) int32 valid
    widths.  The gather stays an axis-0 ROW gather from the (P*H, W)
    flattened stack — the fast formulation on TPU (CLAUDE.md perf notes).
    """
    p, h, w = pages_u8.shape
    flat = pages_u8.reshape(p * h, w).astype(jnp.float32)

    pi = boxes[:, 0]
    x0 = boxes[:, 1].astype(jnp.float32)
    x1 = boxes[:, 2].astype(jnp.float32)
    y0 = boxes[:, 3].astype(jnp.float32)
    y1 = boxes[:, 4].astype(jnp.float32)
    crop_w = jnp.maximum(x1 - x0, 1.0)
    crop_h = jnp.maximum(y1 - y0, 1.0)

    new_w = jnp.clip(jnp.ceil(out_h * crop_w / crop_h), 1, out_w)

    oy = jnp.arange(out_h, dtype=jnp.float32)
    ox = jnp.arange(out_w, dtype=jnp.float32)

    sy = (oy[None, :] + 0.5) * (crop_h[:, None] / out_h) - 0.5
    sy = jnp.clip(sy, 0.0, crop_h[:, None] - 1.0) + y0[:, None]
    sx = (ox[None, :] + 0.5) * (crop_w[:, None] / new_w[:, None]) - 0.5
    sx = jnp.clip(sx, 0.0, crop_w[:, None] - 1.0) + x0[:, None]

    y0i = jnp.floor(sy).astype(jnp.int32)
    x0i = jnp.floor(sx).astype(jnp.int32)
    fy = sy - y0i
    fx = sx - x0i
    row_off = (pi * h)[:, None]
    y0c = jnp.clip(y0i, 0, h - 1) + row_off
    y1c = jnp.clip(y0i + 1, 0, h - 1) + row_off
    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x0i + 1, 0, w - 1)

    def sample(yi, xi):
        return flat[yi[:, :, None], xi[:, None, :]]

    out = (
        sample(y0c, x0c) * (1 - fy)[:, :, None] * (1 - fx)[:, None, :]
        + sample(y0c, x1c) * (1 - fy)[:, :, None] * fx[:, None, :]
        + sample(y1c, x0c) * fy[:, :, None] * (1 - fx)[:, None, :]
        + sample(y1c, x1c) * fy[:, :, None] * fx[:, None, :]
    )
    out = (out / 255.0 - 0.5) / 0.5
    return out[..., None], new_w.astype(jnp.int32)


class DevicePagePipeline:
    """Page-resident recognition: one upload, one dispatch per bucket.

    Fuses crop-resize-normalise + CRNN forward + CTC postprocess into a
    single jitted program keyed on (n_boxes bucket, width bucket).
    """

    def __init__(self, recognizer, use_pallas: bool = False):
        from ocrfa_tpu.decode.device import (compact_indices, ctc_confidences,
                                             pack_decode_payload,
                                             postprocess_logits)

        self.recognizer = recognizer
        self.use_pallas = use_pallas
        nc = recognizer.converter.num_classes
        # the recognizer's variant/quantization-resolved forward — raw
        # crnn_apply would reject a quantized tower's transformed params
        model_fn = recognizer.model_fn

        def _fused(params, page_u8, boxes, keep_mask, *, out_w):
            if use_pallas:
                from ocrfa_tpu.preproc.pallas_kernel import crop_resize_normalize_pallas

                crops = crop_resize_normalize_pallas(page_u8, boxes, out_w=out_w)
            else:
                crops, _ = crop_resize_normalize(page_u8, boxes, out_w=out_w)
            crops = crops.astype(recognizer.compute_dtype)
            logits = model_fn(params, crops)
            indices, values = postprocess_logits(logits.astype(jnp.float32), keep_mask)
            return pack_decode_payload(compact_indices(indices, nc),
                                       ctc_confidences(indices, values))

        self._fused = jax.jit(_fused, static_argnames=("out_w",))

        def _fused_pages(params, pages_u8, boxes, keep_mask, *, out_w):
            crops, _ = crop_resize_normalize_pages(pages_u8, boxes,
                                                   out_w=out_w)
            crops = crops.astype(recognizer.compute_dtype)
            logits = model_fn(params, crops)
            indices, values = postprocess_logits(
                logits.astype(jnp.float32), keep_mask)
            return pack_decode_payload(compact_indices(indices, nc),
                                       ctc_confidences(indices, values))

        self._fused_pages = jax.jit(_fused_pages, static_argnames=("out_w",))

    def put_page(self, page_grey_u8, wire: str = "u8"):
        """Upload a grey page; ``wire="u4"/"u2"/"u1"`` packs pixels on the
        host and unpacks on-device, trading grey depth for relay bytes
        (the page analog of the recognition ribbon wire).  The returned
        device page is always (H, W) uint8 — downstream detection and
        crop-recognition consume it unchanged."""
        if wire == "u8":
            return jax.device_put(jnp.asarray(page_grey_u8, jnp.uint8))
        packed = jax.device_put(jnp.asarray(pack_page(page_grey_u8, wire)))
        return unpack_page(packed, wire, page_grey_u8.shape[1])

    def dispatch_boxes_multi(self, pages_dev, boxes_per_page, keep_mask,
                             img_height: int = 64, ladder=None):
        """Dispatch recognition for boxes spanning a page STACK.

        ``pages_dev``: (P, H, W) uint8 resident stack; ``boxes_per_page``:
        per-page lists of ``[x_min, x_max, y_min, y_max]``.  Boxes are
        grouped by their PAGE's width bucket and dispatched as ONE fused
        program per occupied (width, batch) bucket — dispatch + download
        round trips amortise over the wave instead of per page.  Returns an
        opaque handle for :meth:`collect_boxes_multi` (dispatch-only: no
        host sync happens here).

        Bucketing is per PAGE-max on the parity ladder — the exact
        :meth:`recognize_boxes` semantics — NOT per box: the BiLSTM's
        backward pass runs over the replicate-edge right pad before it
        reaches content, so logits (and decoded text) genuinely change
        with pad length.  Measured on the shaped corpus (r5): per-box
        tight buckets read e2e CER 0.173 vs 0.090 for page-max buckets,
        with end-of-line characters dropped/garbled; forcing the same
        out_w reproduced the per-page texts exactly."""
        import numpy as np

        from ocrfa_tpu.preproc.buckets import (bucket_for_batch,
                                               bucket_for_width)

        _p, h, w = pages_dev.shape
        flat = []
        owner = []
        page_bucket = []  # per flat box: its page's out_w bucket
        for pi, page_boxes in enumerate(boxes_per_page):
            if not page_boxes:
                continue
            pb = np.asarray(page_boxes, dtype=np.int32)
            pb[:, 0] = np.clip(pb[:, 0], 0, w)
            pb[:, 1] = np.clip(pb[:, 1], 0, w)
            pb[:, 2] = np.clip(pb[:, 2], 0, h)
            pb[:, 3] = np.clip(pb[:, 3], 0, h)
            widths = np.maximum(pb[:, 1] - pb[:, 0], 1)
            heights = np.maximum(pb[:, 3] - pb[:, 2], 1)
            ratios = np.where(widths / heights < 1.0,
                              heights / widths, widths / heights)
            need_w = np.ceil(ratios).astype(int) * img_height
            out_w = (bucket_for_width(int(need_w.max())) if ladder is None
                     else bucket_for_width(int(need_w.max()), ladder))
            for b in pb:
                flat.append((pi, b[0], b[1], b[2], b[3]))
                owner.append(pi)
                page_bucket.append(out_w)
        if not flat:
            return ([], [len(b) for b in boxes_per_page], owner, None)
        boxes = np.asarray(flat, dtype=np.int32)

        groups = {}
        for gi, out_w in enumerate(page_bucket):
            groups.setdefault(out_w, []).append(gi)
        dispatches = []
        for out_w, idxs in sorted(groups.items()):
            n = len(idxs)
            nb = bucket_for_batch(n)
            sel = boxes[idxs]
            if nb != n:
                sel = np.concatenate([sel, np.repeat(sel[-1:], nb - n, axis=0)])
            payload = self._fused_pages(
                self.recognizer.params, pages_dev, jnp.asarray(sel),
                jnp.asarray(keep_mask), out_w=out_w)
            dispatches.append((payload, idxs, n))
        # Fuse the wave's per-bucket payloads into ONE device array: every
        # np.asarray of a device output is a full ~26 ms relay round trip
        # regardless of size, so a wave spanning K width buckets fetched
        # per-bucket pays K RTTs — the dominant cost of the corpus
        # collect stage.  The flatten+concat is an eager device op (one
        # small compile per distinct bucket-shape combination, which the
        # corpus page pool cycles through a handful of times).
        fused = None
        if len(dispatches) > 1:
            fused = jnp.concatenate([d[0].reshape(-1) for d in dispatches])
        tail = fused if fused is not None else dispatches[0][0]
        try:  # start the d2h transfer early; harmless if unsupported
            tail.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        return (dispatches, [len(b) for b in boxes_per_page], owner, fused)

    def collect_boxes_multi(self, handle):
        """Block on :meth:`dispatch_boxes_multi` results; returns per-page
        ``[[text, conf], ...]`` lists (order within a page preserved)."""
        import numpy as np

        from ocrfa_tpu.decode.device import (decode_greedy_batch,
                                             unpack_decode_payload)

        dispatches, counts, owner, fused = handle
        conv = self.recognizer.converter
        texts_flat = [None] * len(owner)
        confs_flat = [0.0] * len(owner)
        host_payloads = []
        if fused is not None:
            buf = np.asarray(fused)  # ONE round trip for the whole wave
            pos = 0
            for payload, _idxs, _n in dispatches:
                sz = int(np.prod(payload.shape))
                host_payloads.append(buf[pos:pos + sz].reshape(payload.shape))
                pos += sz
        else:
            host_payloads = [np.asarray(p) for p, _i, _n in dispatches]
        for (payload, idxs, n), host in zip(dispatches, host_payloads):
            indices, confs = unpack_decode_payload(host[:n])
            texts = decode_greedy_batch(indices, conv.character,
                                        conv.ignore_idx)
            for j, gi in enumerate(idxs):
                texts_flat[gi] = texts[j]
                confs_flat[gi] = float(confs[j])
        out = []
        pos = 0
        for c in counts:
            out.append([[texts_flat[pos + k], confs_flat[pos + k]]
                        for k in range(c)])
            pos += c
        return out

    def recognize_boxes(self, page_dev, horizontal_list, keep_mask,
                        img_height: int = 64):
        """``[[x_min, x_max, y_min, y_max], ...]`` -> [[text, conf], ...]."""
        import numpy as np

        from ocrfa_tpu.decode.device import decode_greedy_batch
        from ocrfa_tpu.preproc.buckets import bucket_for_batch, bucket_for_width

        if not horizontal_list:
            return []
        h, w = page_dev.shape
        boxes = np.asarray(horizontal_list, dtype=np.int32)
        boxes[:, 0] = np.clip(boxes[:, 0], 0, w)
        boxes[:, 1] = np.clip(boxes[:, 1], 0, w)
        boxes[:, 2] = np.clip(boxes[:, 2], 0, h)
        boxes[:, 3] = np.clip(boxes[:, 3], 0, h)

        widths = np.maximum(boxes[:, 1] - boxes[:, 0], 1)
        heights = np.maximum(boxes[:, 3] - boxes[:, 2], 1)
        ratios = np.where(widths / heights < 1.0, heights / widths, widths / heights)
        need_w = np.ceil(ratios).astype(int) * img_height
        out_w = bucket_for_width(int(need_w.max()))

        n = len(boxes)
        nb = bucket_for_batch(n)
        if nb != n:
            boxes = np.concatenate([boxes, np.repeat(boxes[-1:], nb - n, axis=0)])

        payload = self._fused(
            self.recognizer.params, page_dev, jnp.asarray(boxes),
            jnp.asarray(keep_mask), out_w=out_w,
        )
        from ocrfa_tpu.decode.device import unpack_decode_payload

        indices, confs = unpack_decode_payload(np.asarray(payload)[:n])
        conv = self.recognizer.converter
        texts = decode_greedy_batch(indices, conv.character, conv.ignore_idx)
        return [[t, c] for t, c in zip(texts, confs.tolist())]

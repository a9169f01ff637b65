"""Page-level serving eval: device-resident paths vs the host parity path.

Quantifies the serving approximations on full pages with a TRAINED model
(the drift VERDICT/ROADMAP flagged as unmeasured):

1. **recognition crop path** — host PIL warp/resize + AlignCollate
   (reference parity, ``pipeline.get_text``) vs the device page-resident
   ``crop_resize_normalize`` (``DevicePagePipeline``), over pages composed
   of rendered Farsi lines at known boxes.  Reports CER vs ground truth
   for both paths plus their mutual exact-match rate.
2. **detection canvas** — host ``resize_aspect_ratio`` (PIL bilinear)
   heatmaps vs the serving pipeline's on-device ``jax.image.resize``
   canvas + bit-packed seed download, same CRAFT weights.  Reports box
   agreement (greedy IoU match) between the two paths in page space.

Usage:
  python scripts/eval_pages.py [--steps 600] [--pages 16] [--small] [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))
sys.path.insert(0, str(REPO / "tests"))

import numpy as np

from eval_farsi import render_crop, sample_texts, train_gen1


def compose_page(texts, render_line, page_w=640, margin=16, pitch=80):
    """Stack rendered lines on a white page; returns (page, horizontal_list)
    with reference-format boxes [x_min, x_max, y_min, y_max].
    ``render_line``: text -> u8 (64, W) crop."""
    page_h = margin * 2 + pitch * len(texts)
    page = np.full((page_h, page_w), 245, dtype=np.uint8)
    boxes = []
    for i, t in enumerate(texts):
        crop = render_line(t)
        h, w = crop.shape
        y, x = margin + i * pitch, margin
        w = min(w, page_w - 2 * margin)
        page[y:y + h, x:x + w] = crop[:, :w]
        boxes.append([x, x + w, y, y + h])
    return page, boxes


def _aabb(quad):
    q = np.asarray(quad, dtype=np.float64).reshape(-1, 2)
    return q[:, 0].min(), q[:, 1].min(), q[:, 0].max(), q[:, 1].max()


def _iou(a, b):
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / union if union > 0 else 0.0


def match_boxes(quads_a, quads_b):
    """Greedy IoU matching; returns (matched_ious, n_unmatched_a, n_unmatched_b)."""
    boxes_a = [_aabb(q) for q in quads_a]
    boxes_b = [_aabb(q) for q in quads_b]
    used = set()
    ious = []
    for a in boxes_a:
        best, best_j = 0.0, None
        for j, b in enumerate(boxes_b):
            if j in used:
                continue
            v = _iou(a, b)
            if v > best:
                best, best_j = v, j
        if best_j is not None and best > 0.1:
            used.add(best_j)
            ious.append(best)
    return ious, len(boxes_a) - len(ious), len(boxes_b) - len(used)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--pages", type=int, default=16)
    ap.add_argument("--lines-per-page", type=int, default=8)
    ap.add_argument("--small", action="store_true", help="64-ch model + tiny charset")
    ap.add_argument("--page-width", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (CTC lock-in over 184 classes is "
                         "seed-sensitive; retry with another seed if the "
                         "loss plateaus ~27)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (axon overrides JAX_PLATFORMS)")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--load-params", type=str, default=None,
                    help="reuse a model trained by eval_farsi --save-params "
                         "instead of retraining here")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ocrfa_tpu.decode.device import keep_mask_for
    from ocrfa_tpu.detector import CraftDetector
    from ocrfa_tpu.eval import cer
    from ocrfa_tpu.geometry import get_image_list
    from ocrfa_tpu.geometry.craft_post import adjust_result_coordinates, get_det_boxes
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.pipeline import Recognizer, get_text
    from ocrfa_tpu.preproc.device import DevicePagePipeline
    from ocrfa_tpu.preproc.host import normalize_mean_variance, resize_aspect_ratio
    from ocrfa_tpu.registry import RECOGNITION_MODELS
    from ocrfa_tpu.serving import ServingPipeline

    glyph_w = 24
    if args.small:
        charset = "ابتثجچحخد"
        oc = hs = 64
    else:
        charset = RECOGNITION_MODELS["gen1"]["arabic_g1"]["characters"]
        oc = hs = 512
    if args.load_params:
        from eval_farsi import load_trained

        params, conv, font, loss, calib, meta = load_trained(args.load_params)
        charset, oc, hs, glyph_w = (meta["charset"], meta["oc"], meta["hs"],
                                    meta["glyph_w"])
        args.steps = meta["steps"]
    else:
        meta = {}
        params, conv, font, loss, calib = train_gen1(
            charset, steps=args.steps, oc=oc, hs=hs, glyph_w=glyph_w,
            seed=args.seed)
    text_charset = charset
    if meta.get("realfont"):
        # pickle trained on shaped typography: compose pages the same way
        from ocrfa_tpu.data import (FontLineRenderer, MultiFontLineRenderer,
                                    rtl_letters)

        renderer = FontLineRenderer(height=64)
        if meta.get("font_mix"):
            renderer = MultiFontLineRenderer(
                [renderer, FontLineRenderer(height=64, bold=True)])
        render_line = renderer.render
        text_charset = "".join(c for c in rtl_letters(charset)
                               if renderer.covers(c))
    else:
        render_line = lambda t: render_crop(t, font, glyph_w, margin=6)  # noqa: E731
    recognizer = Recognizer(params, conv)
    keep = keep_mask_for(conv.num_classes, conv.ignore_idx)

    rng = np.random.default_rng(7)
    pages, truth, gt_boxes = [], [], []
    for _ in range(args.pages):
        texts = sample_texts(rng, text_charset, args.lines_per_page)
        page, boxes = compose_page(texts, render_line, page_w=args.page_width)
        pages.append(page)
        truth.append(texts)
        gt_boxes.append(boxes)

    # ---- 1a. host parity crop path ---------------------------------------
    host_texts, host_lat = [], []
    for page, boxes in zip(pages, gt_boxes):
        t0 = time.time()
        image_list, max_w = get_image_list(boxes, [], page)
        res = get_text(charset, 64, int(max_w), recognizer, image_list)
        host_lat.append((time.time() - t0) * 1000)
        host_texts.append([t for _, t, _ in res])

    # ---- 1b. device page-resident crop path ------------------------------
    pipe = DevicePagePipeline(recognizer)
    dev_texts, dev_lat = [], []
    for page, boxes in zip(pages, gt_boxes):
        t0 = time.time()
        res = pipe.recognize_boxes(pipe.put_page(page), boxes, keep)
        dev_lat.append((time.time() - t0) * 1000)
        dev_texts.append([t for t, _ in res])

    flat = lambda lists: [t for sub in lists for t in sub]  # noqa: E731
    # recognizers emit visual order; reverse the logical truth
    flat_truth = [t[::-1] for t in flat(truth)]
    host_flat, dev_flat = flat(host_texts), flat(dev_texts)

    # ---- 2. detection canvas drift (host PIL vs device bilinear) ---------
    det_params = init_craft(jax.random.PRNGKey(0))
    det = CraftDetector(det_params)
    canvas_size = args.page_width

    # quantile thresholds from the first host heatmap (random-init CRAFT)
    rgb0 = np.stack([pages[0]] * 3, axis=-1)
    canvas0, _, _ = resize_aspect_ratio(rgb0, canvas_size)
    maps0 = det.heatmaps(normalize_mean_variance(canvas0)[None])[0]
    low_text = float(np.quantile(maps0[..., 0], 0.92))
    text_threshold = float(np.quantile(maps0[..., 0], 0.97))
    link_threshold = float(np.quantile(maps0[..., 1], 0.97))

    serving = ServingPipeline(
        det_params, recognizer, canvas_size=canvas_size,
        text_threshold=text_threshold, link_threshold=link_threshold,
        low_text=low_text)

    all_ious, miss_host, miss_dev = [], 0, 0
    for page in pages:
        rgb = np.stack([page] * 3, axis=-1)
        canvas, ratio, _ = resize_aspect_ratio(rgb, canvas_size)
        maps = det.heatmaps(normalize_mean_variance(canvas)[None])[0]
        boxes_h, _, _ = get_det_boxes(
            maps[..., 0], maps[..., 1], text_threshold, link_threshold, low_text)
        boxes_h = adjust_result_coordinates(boxes_h, 1 / ratio, 1 / ratio)

        handle = serving.submit_page(page)
        boxes_d = serving.detect_boxes(handle)

        ious, a_miss, b_miss = match_boxes(boxes_h, boxes_d)
        all_ious += ious
        miss_host += a_miss
        miss_dev += b_miss

    # ---- 3. DBNet serving drift (host PIL stretch + f32 scores vs device
    # resize + bit-packed mask + u8 scores) -------------------------------
    from ocrfa_tpu.detector_db import DBNetDetector
    from ocrfa_tpu.models.dbnet import init_dbnet

    db_params = init_dbnet(jax.random.PRNGKey(1), backbone="resnet18")
    det_db = DBNetDetector(db_params)
    rgb0 = np.stack([pages[0]] * 3, axis=-1)
    norm0, shape0 = det_db.load_image(rgb0.astype(np.float32),
                                      detection_size=args.page_width)
    prob0 = det_db.image2hmap(norm0[None])[0]
    # random-init DBNet probabilities are near-flat: a 0.98-quantile
    # threshold leaves only specks below bbox_min_size (zero boxes on both
    # paths); 0.9 yields blob-scale components on this net
    db_threshold = float(np.quantile(prob0, 0.9))

    db_serving = ServingPipeline(
        db_params, recognizer, canvas_size=args.page_width,
        detector_family="dbnet", db_min_size=args.page_width,
        db_threshold=db_threshold, db_bbox_min_score=0.0)

    db_ious, db_miss_host, db_miss_dev = [], 0, 0
    for page in pages:
        rgb = np.stack([page] * 3, axis=-1).astype(np.float32)
        boxes_h = det_db.inference(rgb, text_threshold=db_threshold,
                                   bbox_min_score=0.0,
                                   detection_size=args.page_width)[0]
        boxes_h = [b for b in boxes_h if np.asarray(b).any()]
        boxes_d = db_serving.detect_boxes(db_serving.submit_page(page))
        ious, a_miss, b_miss = match_boxes(boxes_h, boxes_d)
        db_ious += ious
        db_miss_host += a_miss
        db_miss_dev += b_miss

    metrics = {
        "pages": args.pages,
        "lines_per_page": args.lines_per_page,
        "model": (f"gen1 {oc}/{hs}, {len(charset)}-char charset"
                  + (" (shaped typography)" if meta.get("realfont") else "")),
        "train_steps": args.steps,
        "final_ctc_loss": round(float(loss), 4),
        "cer_host_path_vs_truth": round(cer(host_flat, flat_truth), 6),
        "cer_device_path_vs_truth": round(cer(dev_flat, flat_truth), 6),
        "cer_device_vs_host": round(cer(dev_flat, host_flat), 6),
        "exact_match_device_vs_host": round(
            float(np.mean([a == b for a, b in zip(dev_flat, host_flat)])), 4),
        "page_latency_ms_p50_host": round(float(np.percentile(host_lat, 50)), 2),
        "page_latency_ms_p50_device": round(float(np.percentile(dev_lat, 50)), 2),
        "det_boxes_matched": len(all_ious),
        "det_boxes_only_host": miss_host,
        "det_boxes_only_device": miss_dev,
        "det_matched_iou_mean": round(float(np.mean(all_ious)) if all_ious else 0.0, 4),
        "det_matched_iou_min": round(float(np.min(all_ious)) if all_ious else 0.0, 4),
        "db_det_boxes_matched": len(db_ious),
        "db_det_boxes_only_host": db_miss_host,
        "db_det_boxes_only_device": db_miss_dev,
        "db_det_matched_iou_mean": round(float(np.mean(db_ious)) if db_ious else 0.0, 4),
        "db_det_matched_iou_min": round(float(np.min(db_ious)) if db_ious else 0.0, 4),
    }
    print(json.dumps(metrics, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())

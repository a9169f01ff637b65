"""Diagnose a self-trained detector arm's residual errors (CRAFT or DBNet).

Loads the saved detector + fine-tuned recognizer blobs and re-runs the
held-out pages of ``eval_selftrained.py`` (same seed), but instead of one
aggregate score it prints the failure inventory the aggregate hides:

* every UNMATCHED predicted box (the precision misses): geometry, the
  text read from it, and its best IoU against ground truth — tells
  whether FPs are split lines (IoU just under 0.5), affinity bridges
  (box spanning two GT lines), or noise blobs (tiny, low confidence);
* the worst matched lines by CER, with the box-vs-GT geometry error
  decomposed into vertical (dot-band clipping) and horizontal slack —
  the same supervision-vs-postprocess audit that fixed the DBNet arm
  (pre-expansion, eval_selftrained.expand_quads_for_db);
* crop-height / tilt statistics of the matched boxes, i.e. the ACTUAL
  det-crop distribution the recognizer fine-tune should be imitating
  (det_crop_augment's pads/tilt ranges are guesses; this measures them).

The detector kind comes from the blob's recorded meta (eval_selftrained
--save-craft writes ``meta["detector"]``), so DBNet arms diagnose the same
way — the r3 lesson: DB's fixed shrink/unclip postprocess produces a
DIFFERENT margin distribution than CRAFT region boxes, and a recognizer
fine-tuned to CRAFT-measured margins loses 3x CER through DBNet crops.

Usage:
  python scripts/diag_craft_arm.py --craft blobs/dbnet_arm_r3.pkl \
      --recognizer blobs/gen1t384_shaped.pkl \
      --recognizer-ft blobs/gen1t384_ft_dbnet_r3.pkl --eval-pages 32
"""

import argparse
import pickle
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--craft", type=str, required=True)
    ap.add_argument("--recognizer", type=str,
                    default="blobs/gen1t384_shaped.pkl")
    ap.add_argument("--recognizer-ft", type=str, default=None)
    ap.add_argument("--eval-pages", type=int, default=32)
    ap.add_argument("--page-size", type=int, default=512)
    ap.add_argument("--text-threshold", type=float, default=0.5)
    ap.add_argument("--low-text", type=float, default=0.3)
    ap.add_argument("--link-threshold", type=float, default=0.4)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json-out", type=str, default=None,
                    help="write the measured crop-distribution stats as "
                         "JSON (for chaining a matched fine-tune)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from ocrfa_tpu.utils.resilience import require_backend

        require_backend()

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from eval_farsi import load_trained
    from eval_selftrained import _aabb_iou, build_facade, make_shaped_pages

    from ocrfa_tpu.data import (FontLineRenderer, MultiFontLineRenderer,
                                rtl_letters)
    from ocrfa_tpu.detector import CraftDetector
    from ocrfa_tpu.eval import levenshtein
    from ocrfa_tpu.pipeline import Recognizer

    recog_params, conv, _font, _loss, _calib, meta = load_trained(
        args.recognizer)
    if args.recognizer_ft:
        with open(args.recognizer_ft, "rb") as f:
            recog_params = pickle.load(f)["params"]
    renderer = FontLineRenderer(height=64)
    if meta.get("font_mix", True):
        renderer = MultiFontLineRenderer(
            [renderer, FontLineRenderer(height=64, bold=True)])
    ocr = build_facade(None, None, None)
    text_charset = "".join(c for c in rtl_letters(meta["charset"])
                           if renderer.covers(c) and c in ocr.lang_char)

    with open(args.craft, "rb") as f:
        det_blob = pickle.load(f)
    det_params = det_blob["params"]
    if det_blob.get("meta", {}).get("detector") == "dbnet":
        from ocrfa_tpu.detector_db import DBNetDetector

        ocr.detect_network = "dbnet18"
        ocr.detector = DBNetDetector(det_params)
    else:
        ocr.detector = CraftDetector(det_params)
    ocr.recognizer = Recognizer(recog_params, conv,
                                variant=meta.get("variant", "gen1"))
    ocr.converter = conv

    heldout, _lines, _hc, records = make_shaped_pages(
        args.eval_pages, renderer, text_charset,
        page=args.page_size, seed=1234)

    unmatched, matched = [], []
    heights, tilts, dx0, dx1, dy0, dy1 = [], [], [], [], [], []
    for pi, (pg, recs) in enumerate(zip(heldout, records)):
        res = ocr.readtext(pg, batch_size=32, canvas_size=args.page_size,
                           mag_ratio=1.0, min_size=10,
                           text_threshold=args.text_threshold,
                           low_text=args.low_text,
                           link_threshold=args.link_threshold)
        preds = []
        for box, text, conf in res:
            q = np.asarray(box, np.float64).reshape(-1, 2)
            preds.append(((q[:, 0].min(), q[:, 1].min(),
                           q[:, 0].max(), q[:, 1].max()), text, conf, q))
        used = set()
        for text, gt in recs:
            best_j, best_iou = -1, 0.5
            for j, (pb, _t, _c, _q) in enumerate(preds):
                if j in used:
                    continue
                iou = _aabb_iou(pb, gt)
                if iou > best_iou:
                    best_j, best_iou = j, iou
            if best_j < 0:
                continue
            used.add(best_j)
            pb, pt, _c, q = preds[best_j]
            d = levenshtein(pt, text)
            matched.append((d / max(len(text), 1), pi, pt, text,
                            best_iou, pb, gt))
            heights.append(pb[3] - pb[1])
            e = q[1] - q[0]  # top edge vector
            tilts.append(np.degrees(np.arctan2(e[1], e[0])))
            dx0.append(gt[0] - pb[0])
            dx1.append(pb[2] - gt[2])
            dy0.append(gt[1] - pb[1])
            dy1.append(pb[3] - gt[3])
        for j, (pb, pt, conf, _q) in enumerate(preds):
            if j in used:
                continue
            best = max((_aabb_iou(pb, gt) for _t, gt in recs), default=0.0)
            w, h = pb[2] - pb[0], pb[3] - pb[1]
            unmatched.append((pi, pb, w, h, pt, conf, best))

    print(f"\n=== {len(unmatched)} unmatched predicted boxes (FPs) ===")
    for pi, pb, w, h, pt, conf, best in unmatched:
        print(f"page {pi:2d}  box=({pb[0]:.0f},{pb[1]:.0f})-"
              f"({pb[2]:.0f},{pb[3]:.0f})  {w:.0f}x{h:.0f}  "
              f"best_iou={best:.2f}  conf={conf:.2f}  text={pt!r}")

    matched.sort(reverse=True)
    print("\n=== 12 worst matched lines ===")
    for cer_l, pi, pt, text, iou, pb, gt in matched[:12]:
        print(f"cer={cer_l:.2f} page={pi} iou={iou:.2f}\n"
              f"  pred={pt!r}\n  gt  ={text!r}\n"
              f"  box=({pb[0]:.0f},{pb[1]:.0f})-({pb[2]:.0f},{pb[3]:.0f})"
              f" gt=({gt[0]:.0f},{gt[1]:.0f})-({gt[2]:.0f},{gt[3]:.0f})")

    def stats(name, v):
        v = np.asarray(v)
        print(f"{name:>10}: p5={np.percentile(v, 5):6.1f} "
              f"p50={np.percentile(v, 50):6.1f} "
              f"p95={np.percentile(v, 95):6.1f}")

    print(f"\n=== matched-box geometry vs GT (n={len(matched)}) ===")
    stats("height", heights)
    stats("tilt_deg", tilts)
    # all four are OUTWARD margins: >0 = pred box extends past the GT
    # edge (padding the crop), <0 = pred box clips inside the GT extent
    stats("left_out", dx0)
    stats("right_out", dx1)
    stats("top_out", dy0)
    stats("bot_out", dy1)
    cers = np.asarray([m[0] for m in matched])
    print(f"\nmatched_line_cer={cers.mean():.4f}  "
          f"exact={float((cers == 0).mean()):.4f}")
    if args.json_out:
        import json

        def pcts(v):
            v = np.asarray(v)
            return {p: round(float(np.percentile(v, p)), 2)
                    for p in (5, 50, 95)}

        stats_json = {
            "n_matched": len(matched),
            "n_unmatched": len(unmatched),
            "height": pcts(heights),
            "tilt_deg": pcts(tilts),
            "left_out": pcts(dx0),
            "right_out": pcts(dx1),
            "top_out": pcts(dy0),
            "bot_out": pcts(dy1),
            "matched_line_cer": round(float(cers.mean()), 6),
            "matched_exact": round(float((cers == 0).mean()), 4),
        }
        Path(args.json_out).write_text(json.dumps(stats_json, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Sweep CRAFT postprocess thresholds over a trained detector's score maps.

The detector forward is threshold-independent, so the maps are computed
once per held-out page (the expensive part) and every
(text_threshold, low_text, link_threshold) triple is scored on the host
in milliseconds.  Used to tune the self-trained CRAFT arm's detection
precision (eval_results/EVAL_SELFTRAINED_r3.json) without retraining —
the thresholds feed eval_selftrained's --text-threshold/--low-text/
--link-threshold flags (same postprocess as the reference's getDetBoxes,
craft_utils.py:19-77).

Usage:
  python scripts/sweep_craft_thresholds.py --craft blobs/craft_arm_r3.pkl \
      --recognizer blobs/gen1t384_shaped.pkl [--cpu] [--pages 32]
"""
import argparse
import itertools
import json
import pickle
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--craft", default="blobs/craft_arm_r3.pkl")
    ap.add_argument("--recognizer", default="blobs/gen1t384_shaped.pkl",
                    help="only used for its charset/font-mix meta")
    ap.add_argument("--pages", type=int, default=32)
    ap.add_argument("--page-size", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from ocrfa_tpu.utils.resilience import require_backend
        require_backend()
    from ocrfa_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from eval_farsi import load_trained
    from eval_selftrained import build_facade, make_shaped_pages, score_boxes

    from ocrfa_tpu.data import FontLineRenderer, MultiFontLineRenderer, \
        rtl_letters
    from ocrfa_tpu.detector import CraftDetector
    from ocrfa_tpu.geometry.craft_post import get_det_boxes
    from ocrfa_tpu.preproc.host import normalize_mean_variance

    _p, _conv, _font, _loss, _calib, meta = load_trained(args.recognizer)
    renderer = FontLineRenderer(height=64)
    if meta.get("font_mix", True):
        renderer = MultiFontLineRenderer(
            [renderer, FontLineRenderer(height=64, bold=True)])
    ocr = build_facade(None, None, None)
    text_charset = "".join(c for c in rtl_letters(meta["charset"])
                           if renderer.covers(c) and c in ocr.lang_char)

    heldout, heldout_lines, _hc, _records = make_shaped_pages(
        args.pages, renderer, text_charset, page=args.page_size, seed=1234)

    with open(args.craft, "rb") as f:
        det_params = pickle.load(f)["params"]
    det = CraftDetector(det_params)

    # one forward per page; canvas == page size so ratio is exactly 1
    t0 = time.time()
    maps = []
    for i in range(0, len(heldout), args.batch):
        chunk = heldout[i:i + args.batch]
        x = np.stack([normalize_mean_variance(
            np.repeat(pg[..., None], 3, axis=-1)) for pg in chunk])
        maps.extend(det.heatmaps(x))
    print(f"score maps for {len(heldout)} pages in "
          f"{time.time() - t0:.1f}s", flush=True)

    from ocrfa_tpu.geometry import group_text_box

    def grouped_line_boxes(raw_boxes, min_size=10):
        """The facade's detect() grouping stage on raw CRAFT quads
        (api.py:396-408 with readtext defaults, min_size matching the
        eval's readtext call)."""
        flat = [np.asarray(b, np.float64).reshape(8) for b in raw_boxes]
        horiz, free = group_text_box(flat, 0.1, 0.5, 0.5, 0.5, 0.1, True)
        horiz = [i for i in horiz if max(i[1] - i[0], i[3] - i[2]) > min_size]
        free = [f for f in free
                if max(max(c[0] for c in f) - min(c[0] for c in f),
                       max(c[1] for c in f) - min(c[1] for c in f)) > min_size]
        out = [np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)
               for (x0, x1, y0, y1) in horiz]
        out += [np.asarray(f, np.float64) for f in free]
        return out

    rows = []
    for tt, lt, lk in itertools.product(
            (0.3, 0.4, 0.5, 0.6), (0.2, 0.3, 0.4, 0.5), (0.1, 0.2, 0.4)):
        boxes_pages = []
        for m in maps:
            boxes, _polys, _mapper = get_det_boxes(
                m[:, :, 0], m[:, :, 1], tt, lk, lt, False, False)
            # maps are at half canvas resolution; ratio_h == ratio_w == 1
            boxes_pages.append(grouped_line_boxes(
                [np.asarray(b, np.float64) * 2 for b in boxes]))
        s = score_boxes(boxes_pages, heldout_lines)
        rows.append({"text_threshold": tt, "low_text": lt,
                     "link_threshold": lk, **s})
        print(f"tt={tt} low={lt} link={lk} -> recall {s['recall']:.3f} "
              f"precision {s['precision']:.3f} iou {s['matched_iou_mean']:.3f} "
              f"pred {s['pred_boxes']}", flush=True)

    rows.sort(key=lambda r: (r["recall"], r["precision"],
                             r["matched_iou_mean"]), reverse=True)
    print("\nbest:", json.dumps(rows[0], indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Train CRAFT end-to-end on synthetic Farsi pages (detection-trainer demo).

The reference's primary detector ships as inference-only weights — no
trainer, no dataset, no supervision-map code anywhere (SURVEY.md §3.5).
This script proves the full revived loop for it:

1. render synthetic Farsi pages tracking PER-CHARACTER boxes (the glyph
   renderer knows every advance);
2. build the CRAFT region/affinity gaussian targets from them
   (``geometry.craft_maps``);
3. train the VGG16-BN U-Net from random init with
   ``train.make_craft_train_step`` (MSE + hard negative mining);
4. BN-calibrate and score detection on held-out pages through the
   PRODUCTION postprocess (``CraftDetector.__call__`` -> get_det_boxes):
   IoU-matched recall/precision vs the ground-truth line boxes, before
   vs after training.

Usage:
  python scripts/train_craft_demo.py [--steps 600] [--pages 32] [--cpu]
  python scripts/train_craft_demo.py --small --cpu   # smoke (tiny model)
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

import numpy as np

from detdemo_common import make_pages, score_boxes


def to_canvases(pages_u8):
    """Grey u8 pages -> (N, H, W, 3) mean/variance-normalised float32
    (the CRAFT input convention, detectors.py:40-43)."""
    from ocrfa_tpu.preproc.host import normalize_mean_variance

    return np.stack([
        normalize_mean_variance(np.repeat(p[:, :, None], 3, axis=2))
        for p in pages_u8]).astype(np.float32)


def detection_scores(detector, pages_u8, gt_line_quads, page,
                     text_threshold=0.5, low_text=0.3, link_threshold=0.4):
    """Recall/precision of IoU>=0.5 matches through the production
    CraftDetector path (resize/normalize/forward/get_det_boxes)."""
    rgb = np.stack([np.repeat(p[:, :, None], 3, axis=2) for p in pages_u8])
    boxes_list, _ = detector(rgb, canvas_size=page, mag_ratio=1.0,
                             text_threshold=text_threshold,
                             low_text=low_text,
                             link_threshold=link_threshold)
    return score_boxes(boxes_list, gt_line_quads)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--pages", type=int, default=32)
    ap.add_argument("--eval-pages", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--page-size", type=int, default=320)
    ap.add_argument("--base", type=int, default=64,
                    help="VGG width (64 = production shape)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--small", action="store_true",
                    help="96px pages / base 16 / 40 steps (CPU smoke)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin overrides "
                         "JAX_PLATFORMS, so an env var is not enough)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.small:
        args.page_size, args.steps, args.pages = 96, 40, 6
        args.eval_pages, args.base = 2, 16

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ocrfa_tpu.detector import CraftDetector
    from ocrfa_tpu.geometry.craft_maps import make_craft_batch
    from ocrfa_tpu.models.craft import craft_apply, init_craft
    from ocrfa_tpu.train import (calibrate_bn_stats, make_craft_train_step,
                                 make_optimizer)

    page = args.page_size
    pages, _, char_structs = make_pages(args.pages, page=page, seed=0)
    heldout, heldout_lines, _ = make_pages(args.eval_pages, page=page, seed=77)
    batch_full = make_craft_batch(to_canvases(pages), char_structs)

    params = init_craft(jax.random.PRNGKey(0), base=args.base)
    baseline = detection_scores(
        CraftDetector(params), heldout, heldout_lines, page)
    print("before training:", baseline, flush=True)

    opt = make_optimizer(args.lr)
    state = opt.init(params)
    step = make_craft_train_step(opt)
    rng = np.random.default_rng(1)
    t0 = time.time()
    first_loss = float("nan")
    for i in range(args.steps):
        idx = rng.choice(args.pages, size=min(args.batch, args.pages),
                         replace=False)
        minibatch = {k: v[idx] for k, v in batch_full.items()}
        params, state, loss = step(params, state, minibatch)
        if i == 0:
            first_loss = float(loss)
        if i % 50 == 0:
            print(f"step {i:4d}  loss {float(loss):8.5f}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
    final_loss = float(loss)

    calib = [batch_full["image"][i:i + args.batch]
             for i in range(0, min(16, args.pages), args.batch)]
    params = calibrate_bn_stats(
        params, lambda p, b: craft_apply(p, b)[0], calib)
    trained = detection_scores(
        CraftDetector(params), heldout, heldout_lines, page)
    print("after training:", trained, flush=True)

    metrics = {
        "model": f"CRAFT (VGG16-BN U-Net, base {args.base})",
        "page_size": page,
        "train_pages": args.pages,
        "heldout_pages": args.eval_pages,
        "steps": args.steps,
        "loss_first": round(first_loss, 5),
        "loss_final": round(final_loss, 5),
        "before": baseline,
        "after": trained,
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(metrics, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())

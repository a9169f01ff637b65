"""Train DBNet end-to-end on synthetic Farsi pages (detection-trainer demo).

The reference carries DBNet's loss library as dead code — no trainer, no
dataset, nothing produces the supervision maps the losses consume
(SURVEY.md §3.5).  This script proves the revived loop end-to-end:

1. render synthetic Farsi pages with known line boxes (blob-glyph lines,
   variable heights/positions);
2. build the DB probability/border targets from those boxes
   (``geometry.db_maps``);
3. train ``dbnet18`` (deformable ResNet18 + SegDetector, the production
   config) from random init with ``train.make_dbnet_train_step``;
4. BN-calibrate and score detection on held-out pages through the
   PRODUCTION postprocess (``DBNetDetector.hmap2bbox``): IoU-matched
   recall/precision, before vs after training.

Usage:
  python scripts/train_dbnet_demo.py [--steps 600] [--pages 32] [--cpu]
  python scripts/train_dbnet_demo.py --small --cpu   # smoke (tiny pages)
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


def to_model_input(pages_u8):
    """Grey u8 pages -> (N, H, W, 3) BGR-mean-normalised float32
    (the DBNet input convention, detector_db.normalize_image)."""
    from ocrfa_tpu.detector_db import BGR_MEAN

    stack = np.stack([np.repeat(p[:, :, None], 3, axis=2) for p in pages_u8])
    return ((stack.astype(np.float32) - BGR_MEAN) / 255.0).astype(np.float32)


def detection_scores(detector, pages_u8, gt_quads, page):
    """Recall/precision of IoU>=0.5 matches through the production
    inference path (native resolution, no canvas rescale)."""
    bgr = [np.repeat(p[:, :, None], 3, axis=2).astype(np.float32)
           for p in pages_u8]
    batch_boxes = detector.inference(bgr, detection_size=page)
    return score_boxes(batch_boxes, gt_quads)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--pages", type=int, default=32)
    ap.add_argument("--eval-pages", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--page-size", type=int, default=320)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--small", action="store_true",
                    help="96px pages + 40 steps (CPU smoke)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon plugin overrides "
                         "JAX_PLATFORMS, so an env var is not enough)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.small:
        args.page_size, args.steps, args.pages, args.eval_pages = 96, 40, 6, 2

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from ocrfa_tpu.detector_db import DBNetDetector
    from ocrfa_tpu.geometry.db_maps import make_db_batch
    from ocrfa_tpu.models.dbnet import dbnet_apply, init_dbnet
    from ocrfa_tpu.train import (calibrate_bn_stats, make_dbnet_train_step,
                                 make_optimizer)

    page = args.page_size
    pages, quads, _ = make_pages(args.pages, page=page, seed=0)
    heldout, heldout_quads, _ = make_pages(args.eval_pages, page=page, seed=77)
    batch_full = make_db_batch(to_model_input(pages), quads)

    params = init_dbnet(jax.random.PRNGKey(0), backbone="resnet18")
    baseline = detection_scores(
        DBNetDetector(params), heldout, heldout_quads, page)
    print("before training:", baseline, flush=True)

    opt = make_optimizer(args.lr)
    state = opt.init(params)
    step = make_dbnet_train_step(opt)
    rng = np.random.default_rng(1)
    t0 = time.time()
    first_loss = final_loss = float("nan")
    for i in range(args.steps):
        idx = rng.choice(args.pages, size=min(args.batch, args.pages),
                         replace=False)
        minibatch = {k: v[idx] for k, v in batch_full.items()}
        params, state, loss, metrics = step(params, state, minibatch)
        if i == 0:
            first_loss = float(loss)
        if i % 50 == 0:
            print(f"step {i:4d}  loss {float(loss):7.4f}  "
                  f"({time.time()-t0:.0f}s)", flush=True)
    final_loss = float(loss)

    # inference-mode BN: write calibrated running stats, then score through
    # the production detector (jitted forward + hmap2bbox postprocess)
    calib = [batch_full["image"][i:i + args.batch]
             for i in range(0, min(16, args.pages), args.batch)]
    params = calibrate_bn_stats(
        params, lambda p, b: dbnet_apply(p, b, backbone="resnet18"), calib)
    trained = detection_scores(
        DBNetDetector(params), heldout, heldout_quads, page)
    print("after training:", trained, flush=True)

    metrics = {
        "model": "dbnet18 (deformable resnet18 + SegDetector)",
        "page_size": page,
        "train_pages": args.pages,
        "heldout_pages": args.eval_pages,
        "steps": args.steps,
        "loss_first": round(first_loss, 4),
        "loss_final": round(final_loss, 4),
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

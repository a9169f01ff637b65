"""Fully self-trained end-to-end OCR: facade `readtext` with ZERO torch weights.

The reference cannot do this at all — it ships inference-only checkpoints
and no trainer for either stage (SURVEY.md §3.5).  This script closes the
loop entirely inside the framework:

1. train CRAFT (production VGG16-BN U-Net, base 64) from random init on
   synthetic pages of REAL shaped Farsi typography (PIL+libraqm DejaVu
   Sans/Bold — contextual joining forms), with region/affinity gaussian
   supervision built from per-character advance measurements of the shaped
   run (``geometry.craft_maps``);
2. load the shaped-typography gen1 recognizer trained by
   ``eval_farsi.py --realfont --font-mix`` (``--recognizer`` pickle);
3. inject both into the PRODUCTION ``OCR`` facade and run ``readtext``
   on held-out pages — detection, grouping, cropping, recognition,
   RTL display ordering, exactly the reference call stack (ocr.py:504-582);
4. score detection (IoU-matched recall/precision) and recognition
   (line CER over matched boxes + an aggregate end-to-end CER where a
   missed line costs its full length).

Usage:
  python scripts/eval_selftrained.py --recognizer eval_results/shaped_gen1.pkl
  python scripts/eval_selftrained.py --small --cpu        # smoke
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

from detdemo_common import score_boxes


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)


def char_quads_shaped(text, renderer):
    """Per-WORD lists of per-character quads for a shaped RTL render.

    Character x-spans come from prefix advance measurements of the shaped
    run: logical char ``i`` occupies the horizontal band between the
    shaped widths of ``text[:i]`` and ``text[:i+1]``, measured from the
    RIGHT edge of the run (RTL).  Contextual forms make this approximate
    (a prefix shapes its last letter in final form), but the CRAFT
    gaussians are soft targets — a few pixels of skew is within the
    supervision's own blur.
    """
    r = renderer._pick(text) if hasattr(renderer, "_pick") else renderer
    total = r.measure(text)
    pw = [r.measure(text[:i]) for i in range(len(text) + 1)]
    h, m = r.height, r.margin
    words, cur = [], []
    carry = 0.0  # sub-pixel advances fold into the next char's band

    def flush():
        nonlocal carry
        if cur:
            if carry > 0.0:
                # word ended on a degenerate char (RTL: the line's LEFT
                # tail): stretch the last quad leftward over its span
                cur[-1][[0, 3], 0] -= carry
            words.append(cur)
        carry = 0.0

    for i, ch in enumerate(text):
        if ch.isspace():
            flush()
            cur = []
            continue
        x1 = m + total - pw[i] + carry
        x0 = m + total - pw[i + 1]
        if x1 - x0 >= 1.0:
            cur.append(_rect(x0, 0, x1, h))
            carry = 0.0
        else:
            # joined/contextual forms can shape to near-zero advance;
            # DROPPING them leaves an affinity gap in the CRAFT
            # supervision exactly at ligature positions — the trained
            # detector then emits disconnected fragments there (the r3
            # FP audit: 6px slivers at line ends, diag_craft_arm.py).
            # Widen the neighbouring char's band over the degenerate span.
            carry = x1 - x0
    flush()
    return words


def make_shaped_pages(n, renderer, text_charset, page=512, seed=0,
                      min_len=2, max_len=9):
    """Pages of shaped Farsi lines at the renderer's native height.

    Returns ``(pages u8 (H, W), line quads, char structures, line records)``
    where each line record is ``(text, [x0, y0, x1, y1])`` in page coords —
    the recognition ground truth for the end-to-end score.
    """
    from eval_farsi import sample_texts

    rng = np.random.default_rng(seed)
    lh = renderer.height
    pages, line_quads, char_structs, records = [], [], [], []
    for _ in range(n):
        img = np.full((page, page), 250, dtype=np.uint8)
        lines, chars, recs = [], [], []
        y = int(rng.integers(6, 20))
        while y + lh <= page - 6:
            text = sample_texts(rng, text_charset, 1,
                                min_len=min_len, max_len=max_len)[0]
            text = renderer.fit_text(text, page - 24)
            if not text:
                y += lh // 2
                continue
            crop = renderer.render(text)
            h, w = crop.shape
            x = int(rng.integers(6, max(7, page - w - 6)))
            w = min(w, page - 6 - x)
            img[y:y + h, x:x + w] = np.minimum(img[y:y + h, x:x + w],
                                               crop[:, :w])
            lines.append(_rect(x, y, x + w, y + h))
            recs.append((text, [x, y, x + w, y + h]))
            x_max = x + w
            for word in char_quads_shaped(text, renderer):
                vis = []
                for q in word:
                    q = q + [x, y]
                    q_w = q[:, 0].max() - q[:, 0].min()
                    visible = min(q[:, 0].max(), x_max) - q[:, 0].min()
                    if q_w <= 0 or visible < 0.6 * q_w:
                        continue
                    q[:, 0] = np.clip(q[:, 0], x, x_max)
                    vis.append(q)
                if vis:
                    chars.append(vis)
            y += lh + int(rng.integers(10, 30))
        pages.append(img)
        line_quads.append(lines)
        char_structs.append(chars)
        records.append(recs)
    return pages, line_quads, char_structs, records


def det_crop_augment(crop, r, pad_tb=(4, 9), pad_lr=(0, 8),
                     tilt: float = 0.02, clean_p: float = 0.15,
                     pad_top=None, pad_bot=None):
    """Simulate the detection->crop pipeline on a clean rendered line.

    A trained detector's box is never the exact render rect: it carries
    margins (the region-map threshold + add_margin), occasional tilt
    (minAreaRect of a soft blob), and the 4-point warp +
    height-normalise resampling (``get_image_list``).  A recognizer
    trained only on native 64px renders loses ~10x CER through that
    transform; fine-tuning THROUGH the production crop functions
    (four_point_transform + compute_ratio_and_resize, the exact
    deployment code path) closes the domain gap.

    Pad/tilt ranges must be set to the MEASURED box-vs-GT distribution
    of the detector arm being deployed against
    (``scripts/diag_craft_arm.py``) — the defaults are the CRAFT arm's
    (n=185 matched boxes: top/bottom margin p5-p95 = 6-7 px, left/right
    0-6 px, tilt identically 0).  The r3 lesson, twice over: guessed
    wide ranges (±0.1 rad / 0-12 px) cost matched CER, and one arm's
    measured ranges do NOT transfer to the other — DB's fixed
    shrink/unclip postprocess produces different margins than CRAFT
    region boxes, and the CRAFT-tuned recognizer lost 3x CER through
    DBNet crops (EVAL_SELFTRAINED_DBNET_r3).  ``clean_p`` of crops pass
    through clean as alignment anchors.
    """
    from ocrfa_tpu.geometry.transform import four_point_transform
    from ocrfa_tpu.preproc.host import compute_ratio_and_resize

    if r.random() < clean_p:
        return crop
    h, w = crop.shape
    # DB boxes are vertically ASYMMETRIC on shaped Farsi (measured r4 diag,
    # n=185: top_out p5..p95 = -4..+4 — the box CLIPS above the line —
    # while bot_out = +2..+10): a single symmetric range over-disperses
    # the domain, so the two edges get their own measured ranges
    pt = int(r.integers(*(pad_top if pad_top is not None else pad_tb)))
    pb = int(r.integers(*(pad_bot if pad_bot is not None else pad_tb)))
    pl, pr = int(r.integers(*pad_lr)), int(r.integers(*pad_lr))
    # NEGATIVE pads = the detector's box clips INSIDE the GT extent (DB's
    # fixed shrink/unclip roundtrip does this on tall lines) — crop the
    # source before padding
    ct, cb = max(-pt, 0), max(-pb, 0)
    cl, cr = max(-pl, 0), max(-pr, 0)
    model_h = h  # the consumer (render_batch / AlignCollate) needs this back
    orig = crop  # aliases (no copy) — keeps every fallback exit well-defined
    if ct or cb or cl or cr:
        if h - ct - cb < 8 or w - cl - cr < 4:
            return crop
        crop = crop[ct:h - cb, cl:w - cr]
        h, w = crop.shape
        pt, pb, pl, pr = max(pt, 0), max(pb, 0), max(pl, 0), max(pr, 0)
    ang = float(r.uniform(-tilt, tilt))
    ch, cw = h + pt + pb, w + pl + pr
    border = int(np.ceil(abs(ang) * np.hypot(ch, cw) / 2)) + 2
    canvas = np.full((ch + 2 * border, cw + 2 * border), 250, np.uint8)
    canvas[border + pt:border + pt + h, border + pl:border + pl + w] = crop
    quad = np.array([[0, 0], [cw - 1, 0], [cw - 1, ch - 1], [0, ch - 1]],
                    np.float64)
    ctr = quad.mean(axis=0)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s], [s, c]])
    quad = (quad - ctr) @ rot.T + ctr + border
    warped = four_point_transform(canvas, quad)
    if warped.shape[1] <= warped.shape[0]:
        # near-square/vertical crops route through the rotated vertical-
        # text branch of compute_ratio_and_resize — not this domain.
        # Return the UNCLIPPED source: every exit must keep model height
        # (a clipped 63px return broke render_batch's fixed-64 canvas);
        # horizontal-only clipping also falls back to orig so the exit is
        # uniformly full-height/full-width (ADVICE r4)
        return orig
    # normalise to MODEL height (not the clipped height): deployment's
    # AlignCollate resizes every det crop to imgH=64, and that resample
    # of a clipped line is exactly the domain being imitated
    out, _ = compute_ratio_and_resize(
        warped, warped.shape[1], warped.shape[0], model_h)
    return np.asarray(out, np.uint8)


def to_canvases(pages_u8):
    """Grey u8 pages -> (N, H, W, 3) CRAFT-normalised float32 canvases
    (detectors.py:40-43 convention)."""
    from ocrfa_tpu.preproc.host import normalize_mean_variance

    return np.stack([
        normalize_mean_variance(np.repeat(p[:, :, None], 3, axis=2))
        for p in pages_u8]).astype(np.float32)


def train_craft_shaped(pages, char_structs, base=64, steps=1500, batch=8,
                       lr=1e-3, log_every=100):
    """Train the production CRAFT net on a device-resident page corpus.

    The whole supervision batch uploads ONCE; each step gathers its
    minibatch on-device (the relay's ~45 MB/s would otherwise make every
    step upload-bound — CLAUDE.md bandwidth notes).
    """
    import jax
    import jax.numpy as jnp

    from ocrfa_tpu.geometry.craft_maps import make_craft_batch
    from ocrfa_tpu.models.craft import init_craft
    from ocrfa_tpu.train import make_craft_train_step, make_optimizer

    batch_full = make_craft_batch(to_canvases(pages), char_structs)
    dev = {k: jax.device_put(jnp.asarray(v)) for k, v in batch_full.items()}
    n_pages = len(pages)

    params = init_craft(jax.random.PRNGKey(0), base=base)
    opt = make_optimizer(lr)
    state = opt.init(params)
    step = make_craft_train_step(opt)
    rng = np.random.default_rng(1)
    t0 = time.time()
    losses = []
    for i in range(steps):
        idx = jnp.asarray(rng.choice(n_pages, size=min(batch, n_pages),
                                     replace=False))
        minibatch = {k: v[idx] for k, v in dev.items()}
        params, state, loss = step(params, state, minibatch)
        if i % log_every == 0 or i == steps - 1:
            losses.append((i, float(loss)))
            print(f"craft step {i:5d}  loss {losses[-1][1]:8.5f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params, losses, batch_full["image"], time.time() - t0


def expand_quads_for_db(line_quads, shrink_ratio=0.4, unclip_ratio=1.5,
                        iters=6):
    """Pre-expand GT rects so the production DB postprocess returns them.

    DB's shrink(r=0.4) -> unclip(1.5) roundtrip is NOT identity for wide
    text lines: a 64x250 line comes back ~50 px tall, and the clipped
    top/bottom bands are exactly where Arabic dots live (measured: dot-
    level confusions dominated the dbnet arm's CER).  The reference
    inference surface fixes both constants (DBNet.py:326-333), so the
    training-side fix is to supervise boxes pre-expanded by e solving
    ``roundtrip(h + 2e) = h`` (isotropic distances -> one scalar per box,
    fixed-point in a few iterations).
    """
    out = []
    for quads in line_quads:
        exp = []
        for q in quads:
            q = np.asarray(q, np.float64)
            w = q[:, 0].max() - q[:, 0].min()
            h = q[:, 1].max() - q[:, 1].min()
            e = 0.0
            for _ in range(iters):
                we, he = w + 2 * e, h + 2 * e
                ds = we * he * (1 - shrink_ratio ** 2) / (2 * (we + he))
                w1, h1 = max(we - 2 * ds, 1.0), max(he - 2 * ds, 1.0)
                du = w1 * h1 * unclip_ratio / (2 * (w1 + h1))
                e += (h - (he - 2 * ds + 2 * du)) / 2
                e = max(e, 0.0)
            c = q.mean(axis=0)
            exp.append((q - c) * [(w + 2 * e) / w, (h + 2 * e) / h] + c)
        out.append(exp)
    return out


def train_dbnet_shaped(pages, line_quads, steps=1500, batch=8, lr=1e-3,
                       log_every=100, dcn_impl="gather", offset_penalty=0.0):
    """Train dbnet18 (deformable ResNet18 + SegDetector) on a
    device-resident shaped-page corpus, mirroring ``train_craft_shaped``.

    Supervision quads are pre-expanded (``expand_quads_for_db``) so the
    fixed-constant inference postprocess recovers full line extents.

    ``dcn_impl="bounded1"`` + ``offset_penalty>0`` trains bounded-native:
    clamped forward + a hinge keeping raw offsets inside the radius, so
    the resulting checkpoint runs the 1.27x-CRAFT fast inference path
    exactly (train.make_dbnet_train_step)."""
    import jax
    import jax.numpy as jnp

    from ocrfa_tpu.detector_db import BGR_MEAN
    from ocrfa_tpu.geometry.db_maps import make_db_batch
    from ocrfa_tpu.models.dbnet import init_dbnet
    from ocrfa_tpu.train import make_dbnet_train_step, make_optimizer

    stack = np.stack([np.repeat(p[:, :, None], 3, axis=2) for p in pages])
    canvases = ((stack.astype(np.float32) - BGR_MEAN) / 255.0
                ).astype(np.float32)
    batch_full = make_db_batch(canvases, expand_quads_for_db(line_quads))
    dev = {k: jax.device_put(jnp.asarray(v)) for k, v in batch_full.items()}
    n_pages = len(pages)

    params = init_dbnet(jax.random.PRNGKey(0), backbone="resnet18")
    opt = make_optimizer(lr)
    state = opt.init(params)
    step = make_dbnet_train_step(opt, dcn_impl=dcn_impl,
                                 offset_penalty=offset_penalty)
    rng = np.random.default_rng(1)
    t0 = time.time()
    losses = []
    for i in range(steps):
        idx = jnp.asarray(rng.choice(n_pages, size=min(batch, n_pages),
                                     replace=False))
        minibatch = {k: v[idx] for k, v in dev.items()}
        params, state, loss, _m = step(params, state, minibatch)
        if i % log_every == 0 or i == steps - 1:
            losses.append((i, float(loss)))
            print(f"dbnet step {i:5d}  loss {losses[-1][1]:8.5f}  "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return params, losses, batch_full["image"], time.time() - t0


def build_facade(craft_params, recog_params, converter, quantize=False):
    """The production ``OCR`` facade with self-trained weights injected.

    ``detector=False, recognizer=False`` skips the checkpoint-download
    path (api.py:169,209 — the only weight consumers); everything else of
    the cold-start (charset resolution, language lists, kwarg surface) is
    the stock constructor.  ``craft_params=None`` leaves the detector
    slot empty (inject later once trained).
    """
    from ocrfa_tpu.api import OCR
    from ocrfa_tpu.detector import CraftDetector
    from ocrfa_tpu.pipeline import Recognizer

    ocr = OCR(gpu=True, detector=False, recognizer=False, verbose=False,
              quantize=quantize)
    ocr.detect_network = "craft"
    if craft_params is not None:
        ocr.detector = CraftDetector(craft_params)
    if recog_params is not None:
        ocr.recognizer = Recognizer(recog_params, converter)
        ocr.converter = converter
    return ocr


def _aabb_iou(a, b):
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    ix = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    if inter <= 0:
        return 0.0
    ua = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / ua


def score_pages(results_per_page, records_per_page, iou_threshold=0.5,
                show=0, worst=0):
    """Greedy IoU matching of readtext results to ground-truth lines.

    Returns detection recall/precision over line boxes plus recognition
    CER on matched lines and an aggregate end-to-end CER: edit distance
    on matched pairs, full-length deletion cost for each missed
    ground-truth line, full-length insertion cost for each spurious
    detection's text.

    ``worst=N`` adds a ``worst_lines`` key: the N worst matched lines by
    per-line CER with the pred/gt texts and the detection box's per-edge
    deltas vs the GT extent (px; positive = pred box outside GT) — the
    residual-error evidence for whether misses are box-extent or model
    ambiguity (VERDICT r4 #6).
    """
    from ocrfa_tpu.eval import levenshtein

    # Arabic<->Farsi variant pairs that DejaVu renders (near-)identically
    # in initial/medial position: confusions between them are rendering
    # ambiguity shared with the reference model family, not a recognition
    # defect (r5 worst-lines: ~half the residual DBNet-arm errors are
    # these). CER is reported both raw and variant-folded to separate the
    # irreducible floor from real errors.
    _FOLD = str.maketrans({"ي": "ی", "ى": "ی", "ك": "ک"})

    n_gt = n_pred = n_match = 0
    edit_sum = gt_len = ins_len = 0
    matched_edit = matched_gt_len = 0
    folded_edit_sum = folded_matched_edit = 0
    exact = 0
    details = []
    for page_i, (results, records) in enumerate(
            zip(results_per_page, records_per_page)):
        preds = []
        for box, text, _conf in results:
            q = np.asarray(box, dtype=np.float64).reshape(-1, 2)
            preds.append(((q[:, 0].min(), q[:, 1].min(),
                           q[:, 0].max(), q[:, 1].max()), text))
        n_gt += len(records)
        n_pred += len(preds)
        gt_len += sum(len(t) for t, _ in records)
        used = set()
        for text, (x0, y0, x1, y1) in records:
            best_j, best_iou = -1, iou_threshold
            for j, (pb, _pt) in enumerate(preds):
                if j in used:
                    continue
                iou = _aabb_iou((x0, y0, x1, y1), pb)
                if iou > best_iou:
                    best_j, best_iou = j, iou
            if best_j < 0:
                edit_sum += len(text)  # missed line: full deletion cost
                folded_edit_sum += len(text)
                continue
            used.add(best_j)
            n_match += 1
            if n_match <= show:
                print(f"  match iou={best_iou:.2f} pred={preds[best_j][1]!r} "
                      f"gt={text!r}", flush=True)
            d = levenshtein(preds[best_j][1], text)
            df = levenshtein(preds[best_j][1].translate(_FOLD),
                             text.translate(_FOLD))
            edit_sum += d
            folded_edit_sum += df
            matched_edit += d
            folded_matched_edit += df
            matched_gt_len += len(text)
            exact += int(d == 0)
            if worst and d:
                pb = preds[best_j][0]
                details.append({
                    "page": page_i,
                    "cer": round(d / max(len(text), 1), 4),
                    "gt": text, "pred": preds[best_j][1],
                    "iou": round(best_iou, 3),
                    # per-edge px deltas, positive = pred box OUTSIDE gt
                    "d_left": round(x0 - pb[0], 1),
                    "d_top": round(y0 - pb[1], 1),
                    "d_right": round(pb[2] - x1, 1),
                    "d_bot": round(pb[3] - y1, 1),
                })
        for j, (_pb, pt) in enumerate(preds):
            if j not in used:
                ins_len += len(pt)  # spurious detection: insertion cost
    folded_edit_sum += ins_len
    edit_sum += ins_len
    out = {
        "detection_recall": round(n_match / max(n_gt, 1), 4),
        "detection_precision": round(n_match / max(n_pred, 1), 4),
        "matched_line_cer": round(matched_edit / max(matched_gt_len, 1), 6),
        "matched_line_cer_variant_folded": round(
            folded_matched_edit / max(matched_gt_len, 1), 6),
        "matched_exact": round(exact / max(n_match, 1), 4),
        "e2e_cer": round(edit_sum / max(gt_len, 1), 6),
        "e2e_cer_variant_folded": round(
            folded_edit_sum / max(gt_len, 1), 6),
        "gt_lines": n_gt,
        "pred_lines": n_pred,
        "matched_lines": n_match,
    }
    if worst:
        details.sort(key=lambda r: (-r["cer"], -len(r["gt"])))
        out["worst_lines"] = details[:worst]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recognizer", type=str,
                    default="eval_results/shaped_gen1.pkl",
                    help="pickle from eval_farsi.py --save-params "
                         "(--realfont --font-mix)")
    ap.add_argument("--detector", choices=["craft", "dbnet"],
                    default="craft")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--pages", type=int, default=64)
    ap.add_argument("--eval-pages", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--page-size", type=int, default=512)
    ap.add_argument("--base", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--text-threshold", type=float, default=0.5)
    ap.add_argument("--low-text", type=float, default=0.3)
    ap.add_argument("--link-threshold", type=float, default=0.4)
    ap.add_argument("--dcn-impl", default="gather",
                    help="DBNet training DCN impl: gather (exact) or "
                         "bounded1/bounded2 (bounded-native training — "
                         "pair with --offset-penalty)")
    ap.add_argument("--offset-penalty", type=float, default=0.0,
                    help="hinge weight keeping raw DCN offsets inside the "
                         "impl radius (bounded-native training)")
    ap.add_argument("--no-font-mix", action="store_true",
                    help="snapshot was trained single-face (no Bold mix)")
    ap.add_argument("--small", action="store_true",
                    help="tiny model / few steps (CPU smoke)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save-craft", type=str, default=None,
                    help="pickle the trained CRAFT params here")
    ap.add_argument("--load-craft", type=str, default=None,
                    help="skip detector training; load a --save-craft pickle")
    ap.add_argument("--finetune-steps", type=int, default=0,
                    help="fine-tune the recognizer for N steps through the "
                         "production crop transform (det_crop_augment) and "
                         "report a second recognition arm")
    ap.add_argument("--finetune-from", type=str, default=None,
                    help="warm-start the fine-tune from a previous "
                         "--save-recognizer-ft pickle instead of the "
                         "--recognizer snapshot")
    ap.add_argument("--save-recognizer-ft", type=str, default=None)
    ap.add_argument("--ft-pad-tb", default="4,9",
                    help="fine-tune augment top/bottom pad range (px, "
                         "exclusive hi) — set to the arm's MEASURED crop "
                         "margins from diag_craft_arm.py")
    ap.add_argument("--ft-pad-lr", default="0,8")
    ap.add_argument("--ft-pad-top", default=None,
                    help="override --ft-pad-tb for the TOP edge only "
                         "(negative lo = the box clips into the line; use "
                         "the = form for negative values under "
                         "await_relay).  DB arms measure asymmetric: r4 "
                         "diag top -4..+4 vs bottom +2..+10")
    ap.add_argument("--ft-pad-bot", default=None,
                    help="override --ft-pad-tb for the BOTTOM edge only")
    ap.add_argument("--ft-tilt", type=float, default=0.02)
    ap.add_argument("--load-recognizer-ft", type=str, default=None)
    ap.add_argument("--worst", type=int, default=0,
                    help="include the N worst matched lines (per-line CER, "
                         "texts, box-edge deltas) in the metrics JSON — "
                         "residual-error analysis")
    ap.add_argument("--show", type=int, default=0,
                    help="print the first N matched (pred, gt) pairs")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # the relay can die such that every dispatch hangs forever — fail
        # fast instead of hanging at step 0 (utils/resilience.py)
        from ocrfa_tpu.utils.resilience import require_backend

        require_backend()
    if args.small:
        args.page_size, args.steps, args.pages = 256, 60, 6
        args.eval_pages, args.base, args.batch = 2, 16, 2

    from ocrfa_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from eval_farsi import load_trained

    from ocrfa_tpu.data import (FontLineRenderer, MultiFontLineRenderer,
                                rtl_letters)
    from ocrfa_tpu.models.craft import craft_apply
    from ocrfa_tpu.train import calibrate_bn_stats

    # ---- recognizer: the shaped-typography trained snapshot ---------------
    # Two families inject the same way (TrocrRecognizer is facade-
    # compatible, pipeline.py:379): CRNN blobs from eval_farsi
    # --save-params, TrOCR blobs from pretrain_trocr --save-params
    # (meta family=trocr; fine-tune those through the crop transform with
    # pretrain_trocr --det-augment --continue-from, not --finetune-steps).
    import pickle as _pkl

    with open(args.recognizer, "rb") as f:
        _blob_probe = _pkl.load(f)
    family = _blob_probe.get("meta", {}).get("family", "crnn")
    if family == "trocr":
        from ocrfa_tpu.decode import CTCLabelConverter

        meta = _blob_probe["meta"]
        recog_params = _blob_probe["params"]
        conv = CTCLabelConverter(meta["charset"])
        recog_loss = float(meta.get("best_cer") or 0.0)
        if args.finetune_steps:
            raise SystemExit(
                "--finetune-steps is the CTC fine-tune; for trocr blobs "
                "run pretrain_trocr --det-augment --continue-from and pass "
                "the result as --recognizer (or --load-recognizer-ft)")
    else:
        recog_params, conv, _font, recog_loss, _calib, meta = load_trained(
            args.recognizer)
    # periodic training snapshots predate the realfont meta keys; the flag
    # mirrors how the snapshot was trained (shaped_gen1.pkl: Sans+Bold mix)
    font_mix = meta.get("font_mix", not args.no_font_mix)
    renderer = FontLineRenderer(height=64)
    if font_mix:
        renderer = MultiFontLineRenderer(
            [renderer, FontLineRenderer(height=64, bold=True)])
    # the facade's language filter masks charset chars outside lang_char
    # (recognize(): ignore_char renorm, ocr.py:366-371) — page text must
    # come from the unmasked subset or matched lines can never be exact
    ocr = build_facade(None, None, None)
    text_charset = "".join(c for c in rtl_letters(meta["charset"])
                           if renderer.covers(c) and c in ocr.lang_char)

    # ---- detector: train from random init on shaped pages -----------------
    page = args.page_size
    pages, det_lines, char_structs, _recs = make_shaped_pages(
        args.pages, renderer, text_charset, page=page, seed=0)
    if args.load_craft:
        import pickle

        from ocrfa_tpu.checkpoints import DETECTOR_KIND_ALIASES

        with open(args.load_craft, "rb") as f:
            blob = pickle.load(f)
        det_params = blob["params"]
        losses, train_s = blob.get("losses", []), 0.0
        blob_meta = blob.get("meta", {})
        # the blob's recorded kind wins over the --detector default: loading
        # a dbnet blob without re-passing --detector dbnet must not push
        # DBNet params through the CRAFT apply
        kind = DETECTOR_KIND_ALIASES.get(
            blob_meta.get("detector", args.detector), "craft")
        args.detector = "dbnet" if kind == "dbnet18" else "craft"
        args.base = blob_meta.get("base", args.base)
        args.steps = blob_meta.get("steps", args.steps)
    else:
        if args.detector == "craft":
            det_params, losses, canvases, train_s = train_craft_shaped(
                pages, char_structs, base=args.base, steps=args.steps,
                batch=args.batch, lr=args.lr)
            apply_fn = lambda p, b: craft_apply(p, b)[0]  # noqa: E731
        else:
            from ocrfa_tpu.models.dbnet import dbnet_apply

            det_params, losses, canvases, train_s = train_dbnet_shaped(
                pages, det_lines, steps=args.steps, batch=args.batch,
                lr=args.lr, dcn_impl=args.dcn_impl,
                offset_penalty=args.offset_penalty)
            apply_fn = lambda p, b: dbnet_apply(  # noqa: E731
                p, b, backbone="resnet18")
        calib = [canvases[i:i + args.batch]
                 for i in range(0, min(16, args.pages), args.batch)]
        det_params = calibrate_bn_stats(det_params, apply_fn, calib)
        if args.save_craft:
            import pickle

            import jax

            blob = {"params": jax.tree.map(np.asarray, det_params),
                    "losses": losses,
                    "meta": dict(detector=args.detector, base=args.base,
                                 steps=args.steps, page=page,
                                 pages=args.pages, dcn_impl=args.dcn_impl,
                                 offset_penalty=args.offset_penalty)}
            with open(args.save_craft, "wb") as f:
                pickle.dump(blob, f)

    # ---- recognizer fine-tune THROUGH the production crop transform -------
    ft = None
    if args.load_recognizer_ft:
        import pickle

        with open(args.load_recognizer_ft, "rb") as f:
            ft = pickle.load(f)["params"]
    elif args.finetune_steps:
        from eval_farsi import sample_texts, train_gen1

        def mk(lo, hi):
            return lambda r, n: sample_texts(r, text_charset, n,
                                             min_len=lo, max_len=hi)

        start = recog_params
        if args.finetune_from:
            import pickle

            with open(args.finetune_from, "rb") as f:
                start = pickle.load(f)["params"]
        pad_tb = tuple(int(v) for v in args.ft_pad_tb.split(","))
        pad_lr = tuple(int(v) for v in args.ft_pad_lr.split(","))
        pad_top = (tuple(int(v) for v in args.ft_pad_top.split(","))
                   if args.ft_pad_top else None)
        pad_bot = (tuple(int(v) for v in args.ft_pad_bot.split(","))
                   if args.ft_pad_bot else None)

        def aug(crop, r):
            return det_crop_augment(crop, r, pad_tb=pad_tb, pad_lr=pad_lr,
                                    tilt=args.ft_tilt,
                                    pad_top=pad_top, pad_bot=pad_bot)

        ft, _c2, _f2, ft_loss, _cb = train_gen1(
            meta["charset"], steps=args.finetune_steps, batch=64,
            oc=meta["oc"], hs=meta["hs"], lr=2e-4,
            renderer=renderer, short_sampler=mk(1, 3), ladder_samplers=[],
            pool_sampler=mk(2, 9), augment=aug,
            init_params=start, warm_start=True,
            variant=meta.get("variant", "gen1"),
            late_channel=meta.get("late_channel"),
            buffer_batches=24, reuse=12)
        print(f"fine-tune final ctc loss {float(ft_loss):.4f}", flush=True)
        if args.save_recognizer_ft:
            import pickle

            import jax

            with open(args.save_recognizer_ft, "wb") as f:
                pickle.dump({"params": jax.tree.map(np.asarray, ft)}, f)

    # ---- held-out pages through the production facade ---------------------
    heldout, heldout_lines, _hc, records = make_shaped_pages(
        args.eval_pages, renderer, text_charset, page=page, seed=1234)
    from ocrfa_tpu.pipeline import Recognizer, TrocrRecognizer

    def make_recognizer(rp):
        if family == "trocr":
            return TrocrRecognizer(rp, conv, heads=meta.get("heads", 8),
                                   max_len=meta.get("max_len", 48))
        return Recognizer(rp, conv, variant=meta.get("variant", "gen1"))

    if args.detector == "craft":
        from ocrfa_tpu.detector import CraftDetector

        ocr.detector = CraftDetector(det_params)
    else:
        from ocrfa_tpu.detector_db import DBNetDetector

        ocr.detect_network = "dbnet18"
        # serve with the impl the detector was TRAINED with (a bounded-
        # native checkpoint served through gather is the same train/serve
        # mismatch the bounded rows measure in reverse — r4's bounded-
        # native eval read e2e 0.93 because of exactly this); the guard
        # stays on, so an unsafe checkpoint still falls back loudly
        trained_impl = (blob_meta.get("dcn_impl", "gather")
                        if args.load_craft else args.dcn_impl)
        ocr.detector = DBNetDetector(det_params, dcn_impl=trained_impl)
    ocr.converter = conv

    def run_eval(rp, show=0):
        ocr.recognizer = make_recognizer(rp)
        t0 = time.time()
        results_per_page, det_boxes = [], []
        for pg in heldout:
            res = ocr.readtext(
                pg, batch_size=32, canvas_size=page, mag_ratio=1.0,
                text_threshold=args.text_threshold, low_text=args.low_text,
                link_threshold=args.link_threshold, min_size=10)
            results_per_page.append(res)
            det_boxes.append([np.asarray(b, np.float64).reshape(-1, 2)
                              for b, _t, _c in res])
        wall = time.time() - t0
        # ground truth for recognition is LOGICAL order — readtext applies
        # get_display (visual -> logical, ocr.py:482-486) before returning
        det = score_boxes(det_boxes, heldout_lines)
        rec = score_pages(results_per_page, records, show=show,
                          worst=args.worst)
        return det, rec, wall

    det, rec, wall = run_eval(recog_params, show=args.show)
    served_impl_info = None
    if args.detector == "dbnet":
        served_impl_info = {"requested": trained_impl,
                            "after_guard": ocr.detector.dcn_impl}
    rec_ft = None
    if ft is not None:
        _det2, rec_ft, _w2 = run_eval(ft, show=args.show)
    det_name = ("CRAFT base {}".format(args.base) if args.detector == "craft"
                else "dbnet18 (deformable resnet18 + SegDetector)")
    metrics = {
        "detector": f"{det_name}, trained {args.steps} steps "
                    f"from random init on {args.pages} shaped pages",
        "recognizer": (
            f"trocr d{meta['d_model']} x{meta['layers']}L shaped "
            f"({meta['steps']} steps, best cer {recog_loss:.4f})"
            if family == "trocr" else
            f"{meta.get('variant', 'gen1')}"
            f"{' late' + str(meta['late_channel']) if meta.get('late_channel') else ''}"
            f" {meta['oc']}/{meta['hs']} shaped snapshot "
            f"({meta['steps']} steps, ctc {recog_loss:.4f})"),
        "torch_weights_used": 0,
        "page_size": page,
        "craft_loss_first": round(losses[0][1], 5) if losses else None,
        "craft_loss_final": round(losses[-1][1], 5) if losses else None,
        "craft_train_seconds": round(train_s, 1),
        "detection": det,
        "recognition": rec,
        "readtext_wall_s_per_page": round(wall / max(len(heldout), 1), 3),
    }
    if served_impl_info is not None:
        metrics["served_dcn_impl"] = served_impl_info
    if rec_ft is not None:
        metrics["recognition_finetuned"] = rec_ft
        metrics["finetune_steps"] = args.finetune_steps

    if args.detector == "dbnet":
        # bounded-DCN safety evidence on TRAINED weights (VERDICT r2 #5):
        # offset distribution + detection quality under dcn_impl=bounded
        import jax

        from ocrfa_tpu.models.dbnet import dcn_offset_maps

        page_bgr = np.repeat(np.asarray(heldout[0])[..., None], 3, axis=-1)
        canvas, _shape = ocr.detector.load_image(page_bgr)
        offs = jax.jit(dcn_offset_maps)(det_params["backbone"],
                                        canvas[None].astype(np.float32))
        flat = np.abs(np.concatenate(
            [np.asarray(v).ravel() for v in offs.values()]))
        metrics["dcn_offset_abs"] = {
            "p50": round(float(np.percentile(flat, 50)), 3),
            "p95": round(float(np.percentile(flat, 95)), 3),
            "p99": round(float(np.percentile(flat, 99)), 3),
            "max": round(float(flat.max()), 3),
        }
        for impl in ("bounded2", "bounded1"):
            from ocrfa_tpu.detector_db import DBNetDetector as _DB

            # dcn_guard=False: this measurement exists to show what the
            # bounded path does to accuracy — the production guard would
            # (correctly) refuse it for this checkpoint's offsets
            ocr.detector = _DB(det_params, dcn_impl=impl, dcn_guard=False)
            det_b, rec_b, _wb = run_eval(
                ft if ft is not None else recog_params)
            metrics[f"detection_{impl}"] = det_b
            metrics[f"e2e_cer_{impl}"] = rec_b["e2e_cer"]
    print(json.dumps(metrics, indent=2, ensure_ascii=False))
    if args.out:
        Path(args.out).write_text(
            json.dumps(metrics, indent=2, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())

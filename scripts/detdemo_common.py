"""Shared page synthesis + scoring for the detection-training demos.

Both ``train_craft_demo.py`` and ``train_dbnet_demo.py`` train a detector
from random init on rendered Farsi pages and score through their
production postprocess; this module holds the common page renderer
(line placement with tracked boxes, optionally per-character quads) and
the IoU recall/precision scorer so the two demos cannot drift apart.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)


def render_line_with_chars(text, font, glyph_w, margin=2, bearing=3):
    """u8 line crop + per-WORD lists of per-character quads (crop coords).

    Words split at spaces: CRAFT affinity links adjacent characters
    within a word only.  The render is visual RTL; quads come back in
    list order with spatial neighbours consecutive, which is all the
    affinity construction needs.
    """
    from eval_farsi import render_crop

    crop = render_crop(text, font, glyph_w, margin=margin, bearing=bearing)
    adv = glyph_w + bearing
    h = crop.shape[0]
    words, cur = [], []
    for i, ch in enumerate(text):
        if ch.isspace():
            if cur:
                words.append(cur)
            cur = []
            continue
        col = margin + (len(text) - 1 - i) * adv
        cur.append(_rect(col, 0, col + glyph_w, h))
    if cur:
        words.append(cur)
    return crop, words


def make_pages(n, page=320, seed=0, charset="ابتثجچحخدذرزژس", glyph_w=24):
    """Render ``n`` synthetic pages of blob-glyph Farsi lines.

    Returns ``(pages u8 (H, W), line quads per page, char-quad structures
    per page)`` — the char structures (per-line lists of per-character
    quads) feed ``craft_supervision_maps``; the line quads feed
    ``db_supervision_maps`` and the scorer.

    Lines scale to random heights 24-40 px at random positions.  When a
    line is clipped at the page edge, character quads keep the DRAWN
    glyph scale (not the clipped width): glyphs less than 60% visible
    are dropped, the rest clip to the visible span — so the supervision
    gaussians sit on actual ink.
    """
    from PIL import Image

    from eval_farsi import make_font, sample_texts

    rng = np.random.default_rng(seed)
    font = make_font(charset, np.random.default_rng(0), glyph_w)
    pages, line_quads, char_structs = [], [], []
    for _ in range(n):
        img = np.full((page, page), 245, dtype=np.uint8)
        lines, chars = [], []
        y = int(rng.integers(8, 24))
        while True:
            lh = int(rng.integers(24, 41))
            if y + lh > page - 8:
                break
            text = sample_texts(rng, charset, 1, min_len=2, max_len=7)[0]
            crop, words = render_line_with_chars(text, font, glyph_w)
            w_drawn = max(8, int(round(crop.shape[1] * lh / crop.shape[0])))
            crop_r = np.asarray(
                Image.fromarray(crop).resize((w_drawn, lh), Image.BILINEAR))
            x = int(rng.integers(8, max(9, page - w_drawn - 8)))
            w = min(w_drawn, page - 8 - x)
            img[y:y + lh, x:x + w] = np.minimum(
                img[y:y + lh, x:x + w], crop_r[:, :w])
            lines.append(_rect(x, y, x + w, y + lh))
            # char quads at the DRAWN scale, clipped to the visible span
            sx, sy = w_drawn / crop.shape[1], lh / crop.shape[0]
            x_max = x + w
            for word in words:
                vis = []
                for q in word:
                    q = q * [sx, sy] + [x, y]
                    q_w = q[:, 0].max() - q[:, 0].min()
                    visible = min(q[:, 0].max(), x_max) - q[:, 0].min()
                    if q_w <= 0 or visible < 0.6 * q_w:
                        continue
                    q[:, 0] = np.clip(q[:, 0], x, x_max)
                    vis.append(q)
                if vis:
                    chars.append(vis)
            y += lh + int(rng.integers(10, 28))
        pages.append(img)
        line_quads.append(lines)
        char_structs.append(chars)
    return pages, line_quads, char_structs


def score_boxes(batch_boxes, gt_quads_per_page, iou_threshold=0.5):
    """IoU-matched recall/precision over pages.

    ``batch_boxes``: per-page lists of predicted boxes (any (K, 2)
    point-array-compatible form); ``gt_quads_per_page``: per-page lists
    of ground-truth quads.
    """
    from eval_pages import match_boxes

    n_gt = n_pred = n_match = 0
    ious = []
    for pred, gt in zip(batch_boxes, gt_quads_per_page):
        pred = [np.asarray(b, dtype=np.float64).reshape(-1, 2) for b in pred]
        matched, _, _ = match_boxes(pred, gt)
        good = [v for v in matched if v >= iou_threshold]
        n_gt += len(gt)
        n_pred += len(pred)
        n_match += len(good)
        ious.extend(good)
    return {
        "recall": round(n_match / max(n_gt, 1), 4),
        "precision": round(n_match / max(n_pred, 1), 4),
        "matched_iou_mean": round(float(np.mean(ious)) if ious else 0.0, 4),
        "gt_boxes": n_gt,
        "pred_boxes": n_pred,
    }

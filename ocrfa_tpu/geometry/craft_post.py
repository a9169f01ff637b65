"""CRAFT heatmap post-processing: component boxes and polygon refinement.

cv2/scipy-reimplementation of the reference extraction
(``/root/reference/src/ocrfa/utils.py:101-349``):

* ``get_det_boxes_core`` (:106-175): threshold text+link maps, 4-connected
  components, size/score filters, per-component dilation, min-area rect.
* ``get_poly_core`` (:178-326): per-box perspective rectification, column
  scan for pivots, gradient edge search, inverse warp.
* ``adjust_result_coordinates`` (:343-349).

cv2 calls are replaced with scipy.ndimage (label == 4-connected CC,
maximum_filter == rect-kernel dilate with cv2's anchor convention) and the
numpy homography warp in :mod:`ocrfa_tpu.geometry.transform`.
"""

from __future__ import annotations

import math

import numpy as np
from scipy.ndimage import find_objects
from scipy.ndimage import label as cc_label
from scipy.ndimage import maximum_filter

from ocrfa_tpu.geometry.minrect import min_area_rect as _min_area_rect_py
from ocrfa_tpu.geometry.transform import perspective_transform, warp_perspective

# 4-connectivity structuring element (cv2 connectivity=4)
_CROSS = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8)


def _min_area_rect(points):
    try:
        from ocrfa_tpu.runtime import available, min_area_rect_native

        if available():
            return min_area_rect_native(points)
    except Exception:
        pass
    return _min_area_rect_py(points)


def get_det_boxes_core(textmap, linkmap, text_threshold, link_threshold, low_text,
                       estimate_num_chars: bool = False):
    """Identical results to the reference loop (utils.py:106-175), but each
    component is processed inside its own bounding window instead of
    allocating full-canvas masks per label (O(sum of windows), not
    O(labels x H x W))."""
    text_mask = textmap > low_text  # cv2.threshold is strictly >
    link_mask = linkmap > link_threshold
    comb = text_mask | link_mask
    link_only = link_mask & ~text_mask
    text_over = textmap >= text_threshold
    return get_det_boxes_from_masks(
        comb, link_only, text_over,
        textmap=textmap if estimate_num_chars else None,
        linkmap=linkmap if estimate_num_chars else None,
        text_threshold=text_threshold)


def _dilated_extreme_pts(comp, k_size, x0, y0):
    """Per-row (min x, max x) extreme points of ``comp`` dilated by a
    ``k_size``-square rect kernel, in global ``(x, y)`` coordinates.

    Exactly replicates the windowed ``maximum_filter(size=k_size)``
    dilation for components whose dilation window is NOT clipped by an
    image border (the window margin then guarantees no boundary-mode
    interaction): a k-size max filter lets input row/col ``j`` reach
    outputs ``[j - (k-1)//2, j + k//2]``, so the dilated occupancy of an
    output row is the union of the input rows in that vertical window
    (a 1-D min/max filter over the per-row extremes), and the dilated
    x extremes extend by the same horizontal reach.
    """
    occ = comp.any(axis=1)
    rr = np.flatnonzero(occ)
    n_rows = comp.shape[0]
    rowmin = np.full(n_rows, np.inf)
    rowmax = np.full(n_rows, -np.inf)
    rowmin[rr] = comp.argmax(axis=1)[rr]
    rowmax[rr] = comp.shape[1] - 1 - comp[:, ::-1].argmax(axis=1)[rr]
    ext_l, ext_r = (k_size - 1) // 2, k_size // 2
    if k_size > 1:
        # vertical window min/max as k shifted elementwise passes over the
        # tiny per-row arrays (rows ≈ line height; cheaper than filter1d's
        # per-call setup).  Input row j reaches output rows [j-ext_l,
        # j+ext_r]; in the 0-based output frame that is [j, j+k-1].
        n_out = n_rows + ext_l + ext_r
        vmin = np.full(n_out, np.inf)
        vmax = np.full(n_out, -np.inf)
        for s in range(k_size):
            np.minimum(vmin[s:s + n_rows], rowmin, out=vmin[s:s + n_rows])
            np.maximum(vmax[s:s + n_rows], rowmax, out=vmax[s:s + n_rows])
        row_off = -ext_l
    else:
        vmin, vmax = rowmin, rowmax
        row_off = 0
    dr = np.flatnonzero(vmax > -np.inf)
    m = dr.size
    pts = np.empty((2 * m, 2), dtype=np.int64)
    pts[:m, 0] = vmin[dr] - ext_l + x0
    pts[m:, 0] = vmax[dr] + ext_r + x0
    pts[:m, 1] = pts[m:, 1] = dr + row_off + y0
    return pts


def get_det_boxes_from_masks(text_score_comb, link_only, text_over,
                             textmap=None, linkmap=None, text_threshold=None):
    """Component loop over precomputed threshold masks.

    ``text_over`` is the exact ``textmap >= text_threshold`` mask (the
    reference's per-component ``max(textmap[comp]) < text_threshold`` gate,
    utils.py:130, is equivalently "no text_over pixel in the component").
    Serving ships the three masks bit-packed from the device — ~21x
    smaller than the f32 heatmap download — while the parity path builds
    them on host in :func:`get_det_boxes_core`; the loop below is shared.
    ``textmap``/``linkmap`` are only needed for ``estimate_num_chars``.
    """
    estimate_num_chars = textmap is not None and linkmap is not None
    img_h, img_w = text_score_comb.shape

    labels, n_labels = cc_label(text_score_comb.astype(np.uint8), structure=_CROSS)
    slices = find_objects(labels)

    det = []
    mapper = []

    for k in range(1, n_labels + 1):
        sl = slices[k - 1]
        if sl is None:
            continue
        local = labels[sl] == k
        size = int(local.sum())
        if size < 10:
            continue
        if not np.any(text_over[sl][local]):
            continue

        y, x = sl[0].start, sl[1].start
        h, w = sl[0].stop - y, sl[1].stop - x
        niter = int(math.sqrt(size * min(w, h) / (w * h)) * 2)
        sx, ex = max(x - niter, 0), min(x + w + niter + 1, img_w)
        sy, ey = max(y - niter, 0), min(y + h + niter + 1, img_h)

        if estimate_num_chars:
            character_locs = (
                (textmap[sl] - linkmap[sl]) * local
            ) > text_threshold
            _, n_chars = cc_label(character_locs)
            mapper.append(n_chars)
        else:
            mapper.append(k)

        k_size = 1 + niter
        unclipped = (x - niter >= 0 and y - niter >= 0
                     and x + w + niter + 1 <= img_w
                     and y + h + niter + 1 <= img_h)
        # Only the per-row x extremes of the dilated component feed the
        # rect solver: every convex-hull vertex is a row extreme (an
        # interior-of-row point is a convex combination of its row's two
        # extremes) and the monotone chain pops collinear points, so the
        # hull — and the rect — are EXACTLY those of the full pixel set,
        # at ~2 points/row instead of the whole dilated component (the
        # np.where + full-set hull sort dominated the corpus
        # host-geometry stage, ~0.5 ms/box).
        if unclipped:
            pts = _dilated_extreme_pts(local & ~link_only[sl], k_size,
                                       sl[1].start, sl[0].start)
        else:
            # clipped at an image border: the dilation window interacts
            # with the max filter's boundary handling — keep the exact
            # windowed-filter path for these (rare) components
            win = (slice(sy, ey), slice(sx, ex))
            segwin = np.zeros((ey - sy, ex - sx), dtype=np.uint8)
            segwin[sl[0].start - sy:sl[0].stop - sy,
                   sl[1].start - sx:sl[1].stop - sx][local] = 255
            segwin[link_only[win]] = 0  # remove link-only area
            # rect-kernel dilation == max filter (cv2.dilate anchor math)
            segwin = maximum_filter(segwin, size=k_size)
            ridx = np.flatnonzero(segwin.any(axis=1))
            xfirst = segwin.argmax(axis=1)[ridx]
            xlast = segwin.shape[1] - 1 - segwin[:, ::-1].argmax(axis=1)[ridx]
            pts = np.empty((2 * ridx.size, 2), dtype=np.int64)
            pts[:ridx.size, 0] = xfirst + sx
            pts[ridx.size:, 0] = xlast + sx
            pts[:ridx.size, 1] = pts[ridx.size:, 1] = ridx + sy
        box, (bw, bh) = _min_area_rect(pts)

        # align diamond-shape: near-square boxes snap to axis-aligned
        w_box = np.linalg.norm(box[0] - box[1])
        h_box = np.linalg.norm(box[1] - box[2])
        box_ratio = max(w_box, h_box) / (min(w_box, h_box) + 1e-5)
        if abs(1 - box_ratio) <= 0.1:
            l, r = pts[:, 0].min(), pts[:, 0].max()
            t, b = pts[:, 1].min(), pts[:, 1].max()
            box = np.array([[l, t], [r, t], [r, b], [l, b]], dtype=np.float32)

        # clockwise order starting at min(x+y) corner
        startidx = box.sum(axis=1).argmin()
        box = np.roll(box, 4 - startidx, 0)
        det.append(np.array(box))

    return det, labels, mapper


def warp_coord(minv, pt):
    out = minv @ np.array([pt[0], pt[1], 1.0])
    return np.array([out[0] / out[2], out[1] / out[2]])


# polygon-refinement constants (utils.py:179-183)
_NUM_PIVOTS = 5
_TOT_SEG = _NUM_PIVOTS * 2 + 1
_MAX_LEN_RATIO = 0.7
_EXPAND_RATIO = 1.45
_MAX_R = 2.0
_STEP_R = 0.2


def _column_profile(mask):
    """Per-column extent of a rectified component mask.

    Returns ``(cols, tops, bots)`` for the columns holding at least two
    labeled pixels (the reference skips columns with fewer, utils.py:210).
    """
    counts = mask.sum(axis=0)
    cols = np.flatnonzero(counts >= 2)
    if cols.size == 0:
        return cols, cols, cols
    tops = mask.argmax(axis=0)[cols]
    bots = mask.shape[0] - 1 - mask[::-1].argmax(axis=0)[cols]
    return cols, tops, bots


def _assign_segments(cols, seg_w):
    """Sequential segment ids for an ascending column list.

    Replicates two reference quirks (utils.py:231-243): a column advances
    the open segment by at most ONE even if its x lands further right, and
    advancing past a segment that collected no columns aborts the whole
    polygon (returns ``None``).
    """
    seg = np.zeros(cols.size, dtype=np.int64)
    open_seg = 0
    collected = 0
    for j, x in enumerate(cols):
        if (open_seg + 1) * seg_w <= x and open_seg <= _TOT_SEG:
            if collected == 0:
                return None, open_seg
            open_seg += 1
            collected = 0
        seg[j] = open_seg
        collected += 1
    return seg, open_seg


def _section_means(seg, cols, centers, last_seg):
    """Per-segment (mean x, mean cy), replicating the reference's
    close-on-advance bookkeeping: segments closed by an advance are
    averaged; the trailing segment stays a RAW SUM unless it is the final
    index, and slot -1 is divided regardless (utils.py:257-259 quirk)."""
    sums = np.zeros((_TOT_SEG, 2))
    sums[:, 0] = np.bincount(seg, weights=cols, minlength=_TOT_SEG)
    sums[:, 1] = np.bincount(seg, weights=centers, minlength=_TOT_SEG)
    cnt = np.bincount(seg, minlength=_TOT_SEG).astype(np.float64)

    sec = sums.copy()
    closed = np.arange(_TOT_SEG) < last_seg
    sec[closed] = sums[closed] / cnt[closed, None]
    tail_cnt = cnt[last_seg]
    if last_seg == _TOT_SEG - 1:
        sec[last_seg] = sums[last_seg] / tail_cnt
    else:
        # reference divides cp_section[-1] (all-zero here) by the tail count
        sec[-1] = sums[-1] / tail_cnt
    return sec


def _rail_clear(mask, rail):
    """True when the 1-px segment ``rail = [x0, y0, x1, y1]`` crosses no
    labeled pixel.  Samples the same integer raster a thickness-1 line draw
    would touch instead of allocating a canvas per probe."""
    h, w = mask.shape
    x0, y0, x1, y1 = (int(v) for v in rail)
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    xs = np.rint(np.linspace(x0, x1, n + 1)).astype(int)
    ys = np.rint(np.linspace(y0, y1, n + 1)).astype(int)
    inside = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    return not mask[ys[inside], xs[inside]].any()


def _expand_rail(mask, base, grad, sign, half_h):
    """Slide an end rail outward along ``grad`` until it clears the
    component (or the ladder runs out, in which case the widest candidate
    is accepted — reference behavior at utils.py:294/302)."""
    base = np.asarray(base, dtype=np.float64)
    for r in np.arange(0.5, _MAX_R, _STEP_R):
        dx = 2 * half_h * r
        cand = base + sign * np.array([dx, grad * dx, dx, grad * dx])
        if _rail_clear(mask, cand) or r + 2 * _STEP_R >= _MAX_R:
            return cand
    return None


def _refine_one(box, labels, label_id):
    """Polygon for one detected box, or None when refinement bails."""
    w = int(np.linalg.norm(box[0] - box[1]) + 1)
    h = int(np.linalg.norm(box[1] - box[2]) + 1)
    if w < 10 or h < 10:
        return None

    # rectify the label map into the box frame
    frame = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float32)
    m = perspective_transform(box, frame)
    try:
        minv = np.linalg.inv(m)
    except np.linalg.LinAlgError:
        return None
    mask = warp_perspective(labels, m, (w, h), interpolation="nearest") == label_id

    cols, tops, bots = _column_profile(mask)
    if cols.size == 0:
        return None
    heights = bots - tops + 1
    if h * _MAX_LEN_RATIO < heights.max():
        return None
    centers = (tops + bots) * 0.5

    seg_w = w / _TOT_SEG
    seg, last_seg = _assign_segments(cols, seg_w)
    if seg is None or last_seg < _TOT_SEG - 2:
        # aborted, or some odd segment never collected a column -> no pivot
        return None
    sec = _section_means(seg, cols, centers, last_seg)

    # one pivot per odd segment: the first column achieving that segment's
    # max height (running-max selection in the reference, utils.py:252-255)
    piv_x = np.empty(_NUM_PIVOTS)
    piv_cy = np.empty(_NUM_PIVOTS)
    piv_h = np.empty(_NUM_PIVOTS, dtype=np.int64)
    for i in range(_NUM_PIVOTS):
        members = np.flatnonzero(seg == 2 * i + 1)
        if members.size == 0:
            return None
        best = members[np.argmax(heights[members])]
        piv_x[i] = cols[best]
        piv_cy[i] = centers[best]
        piv_h[i] = heights[best]

    if seg_w < np.max(piv_h) * 0.25:
        return None
    half_h = np.median(piv_h) * _EXPAND_RATIO / 2

    # tilt each pivot into a vertical rail along the local section gradient
    rails = []
    for i in range(_NUM_PIVOTS):
        dx = sec[2 * i + 2][0] - sec[2 * i][0]
        dy = sec[2 * i + 2][1] - sec[2 * i][1]
        x, cy = piv_x[i], piv_cy[i]
        if dx == 0:
            rails.append([x, cy - half_h, x, cy + half_h])
        else:
            ang = -math.atan2(dy, dx)
            run, rise = half_h * math.cos(ang), half_h * math.sin(ang)
            rails.append([x - rise, cy - run, x + rise, cy + run])

    # extrapolate the boundary slope from the three outermost pivots on
    # each side, then push the end rails out until they clear the mask
    slope_s = (piv_cy[1] - piv_cy[0]) / (piv_x[1] - piv_x[0]) \
        + (piv_cy[2] - piv_cy[1]) / (piv_x[2] - piv_x[1])
    slope_e = (piv_cy[-2] - piv_cy[-1]) / (piv_x[-2] - piv_x[-1]) \
        + (piv_cy[-3] - piv_cy[-2]) / (piv_x[-3] - piv_x[-2])
    head = _expand_rail(mask, rails[0], slope_s, -1.0, half_h)
    tail = _expand_rail(mask, rails[-1], slope_e, +1.0, half_h)
    if head is None or tail is None:
        return None

    # walk the top edge left->right, then the bottom edge right->left
    ring = [(head[0], head[1])]
    ring += [(r[0], r[1]) for r in rails]
    ring += [(tail[0], tail[1]), (tail[2], tail[3])]
    ring += [(r[2], r[3]) for r in reversed(rails)]
    ring.append((head[2], head[3]))
    return np.array([warp_coord(minv, pt) for pt in ring])


def get_poly_core(boxes, labels, mapper, linkmap):
    """Polygon refinement around each detected box (behavioral parity with
    utils.py:178-326; vectorized column/segment analysis, see helpers)."""
    return [_refine_one(np.asarray(box), labels, mapper[k])
            for k, box in enumerate(boxes)]


def get_det_boxes(textmap, linkmap, text_threshold, link_threshold, low_text,
                  poly: bool = False, estimate_num_chars: bool = False):
    if poly and estimate_num_chars:
        raise Exception(
            "Estimating the number of characters not currently supported with poly."
        )
    boxes, labels, mapper = get_det_boxes_core(
        textmap, linkmap, text_threshold, link_threshold, low_text, estimate_num_chars
    )
    if poly:
        polys = get_poly_core(boxes, labels, mapper, linkmap)
    else:
        polys = [None] * len(boxes)
    return boxes, polys, mapper


def adjust_result_coordinates(polys, ratio_w, ratio_h, ratio_net: int = 2):
    if len(polys) > 0:
        polys = np.array(polys, dtype=object)
        for k in range(len(polys)):
            if polys[k] is not None:
                polys[k] = polys[k] * (ratio_w * ratio_net, ratio_h * ratio_net)
    return polys

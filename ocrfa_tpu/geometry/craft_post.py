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
    img_h, img_w = textmap.shape

    text_score = (textmap > low_text).astype(np.float32)  # cv2.threshold is strictly >
    link_score = (linkmap > link_threshold).astype(np.float32)

    text_score_comb = np.clip(text_score + link_score, 0, 1)
    labels, n_labels = cc_label(text_score_comb.astype(np.uint8), structure=_CROSS)
    slices = find_objects(labels)

    det = []
    mapper = []
    link_only = np.logical_and(link_score == 1, text_score == 0)

    for k in range(1, n_labels + 1):
        sl = slices[k - 1]
        if sl is None:
            continue
        local = labels[sl] == k
        size = int(local.sum())
        if size < 10:
            continue
        if np.max(textmap[sl][local]) < text_threshold:
            continue

        y, x = sl[0].start, sl[1].start
        h, w = sl[0].stop - y, sl[1].stop - x
        niter = int(math.sqrt(size * min(w, h) / (w * h)) * 2)
        sx, ex = max(x - niter, 0), min(x + w + niter + 1, img_w)
        sy, ey = max(y - niter, 0), min(y + h + niter + 1, img_h)

        # component + link-removal inside the dilation window only — all
        # nonzero pixels of the reference's full-canvas segmap live here
        win = (slice(sy, ey), slice(sx, ex))
        segwin = np.zeros((ey - sy, ex - sx), dtype=np.uint8)
        segwin[sl[0].start - sy:sl[0].stop - sy,
               sl[1].start - sx:sl[1].stop - sx][local] = 255
        if estimate_num_chars:
            character_locs = (
                (textmap[sl] - linkmap[sl]) * local
            ) > text_threshold
            _, n_chars = cc_label(character_locs)
            mapper.append(n_chars)
        else:
            mapper.append(k)
        segwin[link_only[win]] = 0  # remove link-only area

        # rect-kernel dilation == max filter (same anchor math as cv2.dilate)
        k_size = 1 + niter
        segwin = maximum_filter(segwin, size=k_size)

        # min-area rect over the component pixels in (x, y) order
        ys2, xs2 = np.where(segwin != 0)
        np_contours = np.stack([xs2 + sx, ys2 + sy], axis=1)
        box, (bw, bh) = _min_area_rect(np_contours)

        # align diamond-shape: near-square boxes snap to axis-aligned
        w_box = np.linalg.norm(box[0] - box[1])
        h_box = np.linalg.norm(box[1] - box[2])
        box_ratio = max(w_box, h_box) / (min(w_box, h_box) + 1e-5)
        if abs(1 - box_ratio) <= 0.1:
            l, r = np_contours[:, 0].min(), np_contours[:, 0].max()
            t, b = np_contours[:, 1].min(), np_contours[:, 1].max()
            box = np.array([[l, t], [r, t], [r, b], [l, b]], dtype=np.float32)

        # clockwise order starting at min(x+y) corner
        startidx = box.sum(axis=1).argmin()
        box = np.roll(box, 4 - startidx, 0)
        det.append(np.array(box))

    return det, labels, mapper


def _draw_line(canvas, p0, p1):
    """Rasterise a 1-px segment (cv2.line equivalent for the overlap test)."""
    h, w = canvas.shape
    x0, y0 = int(p0[0]), int(p0[1])
    x1, y1 = int(p1[0]), int(p1[1])
    n = max(abs(x1 - x0), abs(y1 - y0), 1)
    xs = np.rint(np.linspace(x0, x1, n + 1)).astype(int)
    ys = np.rint(np.linspace(y0, y1, n + 1)).astype(int)
    valid = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    canvas[ys[valid], xs[valid]] = 1
    return canvas


def warp_coord(minv, pt):
    out = minv @ np.array([pt[0], pt[1], 1.0])
    return np.array([out[0] / out[2], out[1] / out[2]])


def get_poly_core(boxes, labels, mapper, linkmap):
    """Polygon refinement around each detected box (utils.py:178-326)."""
    num_cp = 5
    max_len_ratio = 0.7
    expand_ratio = 1.45
    max_r = 2.0
    step_r = 0.2

    polys = []
    for k, box in enumerate(boxes):
        w = int(np.linalg.norm(box[0] - box[1]) + 1)
        h = int(np.linalg.norm(box[1] - box[2]) + 1)
        if w < 10 or h < 10:
            polys.append(None)
            continue

        tar = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float32)
        m = perspective_transform(box, tar)
        word_label = warp_perspective(labels, m, (w, h), interpolation="nearest")
        try:
            minv = np.linalg.inv(m)
        except np.linalg.LinAlgError:
            polys.append(None)
            continue

        cur_label = mapper[k]
        word_label = (word_label == cur_label).astype(np.int32)

        # column scan: top/bottom extent per column
        cp = []
        max_len = -1
        for i in range(w):
            region = np.where(word_label[:, i] != 0)[0]
            if len(region) < 2:
                continue
            cp.append((i, region[0], region[-1]))
            max_len = max(max_len, region[-1] - region[0] + 1)

        if h * max_len_ratio < max_len:
            polys.append(None)
            continue

        # pivot points at fixed segments
        tot_seg = num_cp * 2 + 1
        seg_w = w / tot_seg
        pp = [None] * num_cp
        cp_section = [[0, 0]] * tot_seg
        seg_height = [0] * num_cp
        seg_num = 0
        num_sec = 0
        prev_h = -1
        for i in range(len(cp)):
            (x, sy, ey) = cp[i]
            if (seg_num + 1) * seg_w <= x and seg_num <= tot_seg:
                if num_sec == 0:
                    break
                cp_section[seg_num] = [cp_section[seg_num][0] / num_sec,
                                       cp_section[seg_num][1] / num_sec]
                num_sec = 0
                seg_num += 1
                prev_h = -1

            cy = (sy + ey) * 0.5
            cur_h = ey - sy + 1
            cp_section[seg_num] = [cp_section[seg_num][0] + x, cp_section[seg_num][1] + cy]
            num_sec += 1

            if seg_num % 2 == 0:
                continue
            if prev_h < cur_h:
                pp[int((seg_num - 1) / 2)] = (x, cy)
                seg_height[int((seg_num - 1) / 2)] = cur_h
                prev_h = cur_h

        if num_sec != 0:
            cp_section[-1] = [cp_section[-1][0] / num_sec, cp_section[-1][1] / num_sec]

        if None in pp or seg_w < np.max(seg_height) * 0.25:
            polys.append(None)
            continue

        half_char_h = np.median(seg_height) * expand_ratio / 2

        # tilt each pivot by the local gradient
        new_pp = []
        for i, (x, cy) in enumerate(pp):
            dx = cp_section[i * 2 + 2][0] - cp_section[i * 2][0]
            dy = cp_section[i * 2 + 2][1] - cp_section[i * 2][1]
            if dx == 0:
                new_pp.append([x, cy - half_char_h, x, cy + half_char_h])
                continue
            rad = -math.atan2(dy, dx)
            c, s = half_char_h * math.cos(rad), half_char_h * math.sin(rad)
            new_pp.append([x - s, cy - c, x + s, cy + c])

        # expand start/end edges until they clear the heatmap
        is_spp_found, is_epp_found = False, False
        grad_s = (pp[1][1] - pp[0][1]) / (pp[1][0] - pp[0][0]) + \
                 (pp[2][1] - pp[1][1]) / (pp[2][0] - pp[1][0])
        grad_e = (pp[-2][1] - pp[-1][1]) / (pp[-2][0] - pp[-1][0]) + \
                 (pp[-3][1] - pp[-2][1]) / (pp[-3][0] - pp[-2][0])
        spp = epp = None
        for r in np.arange(0.5, max_r, step_r):
            dx = 2 * half_char_h * r
            if not is_spp_found:
                line_img = np.zeros(word_label.shape, dtype=np.uint8)
                dy = grad_s * dx
                p = np.array(new_pp[0]) - np.array([dx, dy, dx, dy])
                _draw_line(line_img, (p[0], p[1]), (p[2], p[3]))
                if np.sum(np.logical_and(word_label, line_img)) == 0 or r + 2 * step_r >= max_r:
                    spp = p
                    is_spp_found = True
            if not is_epp_found:
                line_img = np.zeros(word_label.shape, dtype=np.uint8)
                dy = grad_e * dx
                p = np.array(new_pp[-1]) + np.array([dx, dy, dx, dy])
                _draw_line(line_img, (p[0], p[1]), (p[2], p[3]))
                if np.sum(np.logical_and(word_label, line_img)) == 0 or r + 2 * step_r >= max_r:
                    epp = p
                    is_epp_found = True
            if is_spp_found and is_epp_found:
                break

        if not (is_spp_found and is_epp_found):
            polys.append(None)
            continue

        poly = [warp_coord(minv, (spp[0], spp[1]))]
        for p in new_pp:
            poly.append(warp_coord(minv, (p[0], p[1])))
        poly.append(warp_coord(minv, (epp[0], epp[1])))
        poly.append(warp_coord(minv, (epp[2], epp[3])))
        for p in reversed(new_pp):
            poly.append(warp_coord(minv, (p[2], p[3])))
        poly.append(warp_coord(minv, (spp[2], spp[3])))
        polys.append(np.array(poly))

    return polys


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

"""Detection-box grouping, paragraph assembly, and reading-order merges.

Behavioral parity targets (``/root/reference/src/ocrfa/utils.py``):
``group_text_box`` (:1235-1348), ``get_paragraph`` (:1442-1509),
``merge_to_free`` (:1176-1215), ``diff`` (:1438-1439).  The implementations
here are original: quad partitioning and free-box margin expansion are
vectorized over the whole detection set, line/run clustering walks index
arrays with numpy reductions over contiguous slices, and paragraph growth
uses boolean overlap masks.  Outputs are float-identical to the reference
(mean/min/max reductions see the same operands in the same order), which the
golden tests in ``tests/test_geometry.py`` enforce against the reference
directly.

All pure numpy/host logic — these operate on a few dozen boxes per page,
far off the hot path.
"""

from __future__ import annotations

import numpy as np


def diff(input_list):
    """Range (max - min) of a list (utils.py:1438-1439)."""
    return max(input_list) - min(input_list)


def _expand_slanted(quads: np.ndarray, add_margin: float):
    """Margin-expand slanted quads along their own edge directions.

    ``quads`` is (M, 8) flat corner data.  Returns the reference's
    ``free_list`` rows: four (x, y) corner pairs per quad, each corner
    pushed outward by a margin rotated onto the box's long-edge angles.
    """
    left_dx = quads[:, 6] - quads[:, 0]
    left_dy = quads[:, 7] - quads[:, 1]
    top_dx = quads[:, 2] - quads[:, 0]
    top_dy = quads[:, 3] - quads[:, 1]
    edge_h = np.sqrt(left_dx * left_dx + left_dy * left_dy)
    edge_w = np.sqrt(top_dx * top_dx + top_dy * top_dy)
    margin = (1.44 * add_margin * np.minimum(edge_w, edge_h)).astype(int)

    # diagonal angles: corner1->corner3 and corner2->corner4
    ang13 = np.abs(np.arctan((quads[:, 1] - quads[:, 5])
                             / np.maximum(10, quads[:, 0] - quads[:, 4])))
    ang24 = np.abs(np.arctan((quads[:, 3] - quads[:, 7])
                             / np.maximum(10, quads[:, 2] - quads[:, 6])))
    c13, s13 = np.cos(ang13) * margin, np.sin(ang13) * margin
    c24, s24 = np.cos(ang24) * margin, np.sin(ang24) * margin

    out = np.empty((len(quads), 4, 2))
    out[:, 0, 0] = quads[:, 0] - c13
    out[:, 0, 1] = quads[:, 1] - s13
    out[:, 1, 0] = quads[:, 2] + c24
    out[:, 1, 1] = quads[:, 3] - s24
    out[:, 2, 0] = quads[:, 4] + c13
    out[:, 2, 1] = quads[:, 5] + s13
    out[:, 3, 0] = quads[:, 6] - c24
    out[:, 3, 1] = quads[:, 7] + s24
    return [[list(corner) for corner in quad] for quad in out]


def _runs_by(values, belongs):
    """Split an ordered index sequence into runs.

    ``belongs(members, nxt)`` decides whether index ``nxt`` extends the open
    run given the member indices collected so far.  Yields lists of indices.
    """
    run = []
    for idx in values:
        if run and not belongs(run, idx):
            yield run
            run = []
        run.append(idx)
    if run:
        yield run


def group_text_box(
    polys,
    slope_ths: float = 0.1,
    ycenter_ths: float = 0.5,
    height_ths: float = 0.5,
    width_ths: float = 1.0,
    add_margin: float = 0.05,
    sort_output: bool = True,
):
    """Split detector quads into horizontal lines vs slanted 'free' boxes,
    cluster horizontals by y-center, merge adjacent boxes within a line.

    Input quads are flat ``[x1,y1,x2,y2,x3,y3,x4,y4]`` arrays; output is
    ``(merged_list, free_list)`` where merged entries are
    ``[x_min, x_max, y_min, y_max]`` (behavior of utils.py:1235-1348).
    """
    if len(polys) == 0:
        return [], []
    quads = np.asarray(polys)

    # partition: a quad is "horizontal" when both long edges are near-flat
    top_slope = (quads[:, 3] - quads[:, 1]) / np.maximum(10, quads[:, 2] - quads[:, 0])
    bot_slope = (quads[:, 5] - quads[:, 7]) / np.maximum(10, quads[:, 4] - quads[:, 6])
    flat = np.maximum(np.abs(top_slope), np.abs(bot_slope)) < slope_ths

    free_list = _expand_slanted(quads[~flat], add_margin) if (~flat).any() else []

    hq = quads[flat]
    if len(hq) == 0:
        return [], free_list

    xs = hq[:, 0::2]
    ys = hq[:, 1::2]
    x_lo, x_hi = xs.min(axis=1), xs.max(axis=1)
    y_lo, y_hi = ys.min(axis=1), ys.max(axis=1)
    y_mid = 0.5 * (y_lo + y_hi)
    heights = y_hi - y_lo

    order = np.argsort(y_mid, kind="stable") if sort_output else np.arange(len(hq))

    # rows: consecutive (in y_mid order) boxes whose center sits within
    # ycenter_ths x running-mean-height of the open row's mean center
    def same_row(members, nxt):
        return (abs(np.mean(y_mid[members]) - y_mid[nxt])
                < ycenter_ths * np.mean(heights[members]))

    merged_list = []
    for row in _runs_by(order, same_row):
        if len(row) == 1:
            only = row[0]
            runs = [[only]]
        else:
            # left-to-right runs: similar height AND horizontal gap (from
            # the previous member's right edge) under width_ths x own-height;
            # each run becomes one merged box
            row = [row[i] for i in np.argsort(x_lo[row], kind="stable")]
            runs = []
            open_run = []
            prev_right = None
            for idx in row:
                if open_run:
                    fits = (abs(np.mean(heights[open_run]) - heights[idx])
                            < height_ths * np.mean(heights[open_run])
                            and (x_lo[idx] - prev_right)
                            < width_ths * (y_hi[idx] - y_lo[idx]))
                    if not fits:
                        runs.append(open_run)
                        open_run = []
                open_run.append(idx)
                prev_right = x_hi[idx]
            if open_run:
                runs.append(open_run)

        for run in runs:
            lo_x, hi_x = x_lo[run].min(), x_hi[run].max()
            lo_y, hi_y = y_lo[run].min(), y_hi[run].max()
            pad = int(add_margin * min(hi_x - lo_x, hi_y - lo_y))
            merged_list.append([lo_x - pad, hi_x + pad, lo_y - pad, hi_y + pad])

    return merged_list, free_list


def get_paragraph(raw_result, x_ths: float = 1, y_ths: float = 0.5, mode: str = "ltr"):
    """Greedy box clustering into paragraphs + reading-order traversal
    (``ltr`` or ``rtl``); behavior of utils.py:1442-1509."""
    n = len(raw_result)
    texts = [entry[1] for entry in raw_result]
    ext = np.empty((n, 4), dtype=np.int64)  # x_lo, x_hi, y_lo, y_hi
    for i, entry in enumerate(raw_result):
        px = [int(pt[0]) for pt in entry[0]]
        py = [int(pt[1]) for pt in entry[0]]
        ext[i] = min(px), max(px), min(py), max(py)
    box_h = (ext[:, 3] - ext[:, 2]).astype(np.float64)
    box_yc = 0.5 * (ext[:, 2] + ext[:, 3])

    # grow paragraphs one box at a time: a group absorbs the first
    # unassigned box whose extent overlaps the group bbox inflated by
    # ths x mean member height, in both axes
    gid = np.zeros(n, dtype=np.int64)
    group = 1
    while (gid == 0).any():
        members = np.flatnonzero(gid == group)
        if members.size == 0:
            gid[np.flatnonzero(gid == 0)[0]] = group
            continue
        infl = np.mean(box_h[members])
        gx_lo = ext[members, 0].min() - x_ths * infl
        gx_hi = ext[members, 1].max() + x_ths * infl
        gy_lo = ext[members, 2].min() - y_ths * infl
        gy_hi = ext[members, 3].max() + y_ths * infl
        todo = np.flatnonzero(gid == 0)
        x_touch = ((gx_lo <= ext[todo, 0]) & (ext[todo, 0] <= gx_hi)) | \
                  ((gx_lo <= ext[todo, 1]) & (ext[todo, 1] <= gx_hi))
        y_touch = ((gy_lo <= ext[todo, 2]) & (ext[todo, 2] <= gy_hi)) | \
                  ((gy_lo <= ext[todo, 3]) & (ext[todo, 3] <= gy_hi))
        hits = todo[x_touch & y_touch]
        if hits.size:
            gid[hits[0]] = group
        else:
            group += 1

    result = []
    for g in set(gid.tolist()):
        members = np.flatnonzero(gid == g)
        mean_h = np.mean(box_h[members])
        para_x_lo = int(ext[members, 0].min())
        para_x_hi = int(ext[members, 1].max())
        para_y_lo = int(ext[members, 2].min())
        para_y_hi = int(ext[members, 3].max())

        # reading order: repeatedly take the topmost band (within 0.4 x mean
        # height of the highest center), then the extreme-x candidate —
        # last tie wins, matching the reference's non-breaking scan
        words = []
        remaining = list(members)
        while remaining:
            band_top = min(box_yc[i] for i in remaining)
            band = [i for i in remaining if box_yc[i] < band_top + 0.4 * mean_h]
            if mode == "ltr":
                edge = min(ext[i, 0] for i in band)
                pick = [i for i in band if ext[i, 0] == edge][-1]
            elif mode == "rtl":
                edge = max(ext[i, 1] for i in band)
                pick = [i for i in band if ext[i, 1] == edge][-1]
            words.append(texts[pick])
            remaining.remove(pick)

        result.append([
            [[para_x_lo, para_y_lo], [para_x_hi, para_y_lo],
             [para_x_hi, para_y_hi], [para_x_lo, para_y_hi]],
            " ".join(words),
        ])
    return result


def merge_to_free(merge_result, free_list):
    """Reinsert free-box results into row-major reading order; behavior of
    utils.py:1176-1215 (including its quirks — see inline notes)."""
    if not free_list:
        return merge_result

    body = merge_result[:-len(free_list)]
    free_items = merge_result[-len(free_list):]

    # split the body into reading rows: a row continues while quads are
    # lexicographically increasing; the final entry ALWAYS joins the open
    # row, even out of order (reference quirk, utils.py:1183-1188)
    rows = []
    open_row = []
    for pos, item in enumerate(body):
        if pos == len(body) - 1:
            open_row.append(item)
            rows.append(open_row)
            open_row = []
        elif open_row and not (open_row[-1][0] < item[0]):
            rows.append(open_row)
            open_row = [item]
        else:
            open_row.append(item)

    for item in free_items:
        fx, fy = item[0][0][0], item[0][0][1]
        # the column default is the LAST row's length regardless of which
        # row is chosen, and a free box above row i+1 lands in row i — both
        # reference quirks (utils.py:1199-1209) reproduced as-is
        row_at = len(rows)
        col_at = len(rows[row_at - 1])
        for i, below in enumerate(rows[1:]):
            if fy < below[0][0][0][1]:
                row_at = i
                break
        for i, neighbor in enumerate(rows[row_at]):
            if fx < neighbor[0][0][0]:
                col_at = i
                break
        rows[row_at].insert(col_at, item)

    flat = []
    for row in rows:
        flat.extend(row)
    return flat

"""Detection-box grouping, paragraph assembly, and reading-order merges.

Parity targets (``/root/reference/src/ocrfa/utils.py``): ``group_text_box``
(:1235-1348), ``get_paragraph`` (:1442-1509), ``merge_to_free`` (:1176-1215),
``diff`` (:1438-1439).  All pure numpy/host logic — these operate on a few
dozen boxes per page, far off the hot path.
"""

from __future__ import annotations

import numpy as np


def diff(input_list):
    """Range (max - min) of a list (utils.py:1438-1439)."""
    return max(input_list) - min(input_list)


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
    ``[x_min, x_max, y_min, y_max]`` (utils.py:1235-1348).
    """
    horizontal_list, free_list, combined_list, merged_list = [], [], [], []

    for poly in polys:
        slope_up = (poly[3] - poly[1]) / np.maximum(10, poly[2] - poly[0])
        slope_down = (poly[5] - poly[7]) / np.maximum(10, poly[4] - poly[6])
        if max(abs(slope_up), abs(slope_down)) < slope_ths:
            x_max = max([poly[0], poly[2], poly[4], poly[6]])
            x_min = min([poly[0], poly[2], poly[4], poly[6]])
            y_max = max([poly[1], poly[3], poly[5], poly[7]])
            y_min = min([poly[1], poly[3], poly[5], poly[7]])
            horizontal_list.append(
                [x_min, x_max, y_min, y_max, 0.5 * (y_min + y_max), y_max - y_min]
            )
        else:
            height = np.linalg.norm([poly[6] - poly[0], poly[7] - poly[1]])
            width = np.linalg.norm([poly[2] - poly[0], poly[3] - poly[1]])
            margin = int(1.44 * add_margin * min(width, height))

            theta13 = abs(np.arctan((poly[1] - poly[5]) / np.maximum(10, poly[0] - poly[4])))
            theta24 = abs(np.arctan((poly[3] - poly[7]) / np.maximum(10, poly[2] - poly[6])))
            x1 = poly[0] - np.cos(theta13) * margin
            y1 = poly[1] - np.sin(theta13) * margin
            x2 = poly[2] + np.cos(theta24) * margin
            y2 = poly[3] - np.sin(theta24) * margin
            x3 = poly[4] + np.cos(theta13) * margin
            y3 = poly[5] + np.sin(theta13) * margin
            x4 = poly[6] - np.cos(theta24) * margin
            y4 = poly[7] + np.sin(theta24) * margin
            free_list.append([[x1, y1], [x2, y2], [x3, y3], [x4, y4]])

    if sort_output:
        horizontal_list = sorted(horizontal_list, key=lambda item: item[4])

    # cluster into lines by y-center proximity relative to running mean height
    new_box = []
    b_height, b_ycenter = [], []
    for poly in horizontal_list:
        if len(new_box) == 0:
            b_height = [poly[5]]
            b_ycenter = [poly[4]]
            new_box.append(poly)
        elif abs(np.mean(b_ycenter) - poly[4]) < ycenter_ths * np.mean(b_height):
            b_height.append(poly[5])
            b_ycenter.append(poly[4])
            new_box.append(poly)
        else:
            b_height = [poly[5]]
            b_ycenter = [poly[4]]
            combined_list.append(new_box)
            new_box = [poly]
    combined_list.append(new_box)

    # within each line, merge boxes whose horizontal gap is under width_ths
    for boxes in combined_list:
        if len(boxes) == 1:
            box = boxes[0]
            margin = int(add_margin * min(box[1] - box[0], box[5]))
            merged_list.append([box[0] - margin, box[1] + margin, box[2] - margin, box[3] + margin])
            continue

        boxes = sorted(boxes, key=lambda item: item[0])
        merged_box, new_box = [], []
        b_height = []
        x_max = 0
        for box in boxes:
            if len(new_box) == 0:
                b_height = [box[5]]
                x_max = box[1]
                new_box.append(box)
            elif (abs(np.mean(b_height) - box[5]) < height_ths * np.mean(b_height)) and (
                (box[0] - x_max) < width_ths * (box[3] - box[2])
            ):
                b_height.append(box[5])
                x_max = box[1]
                new_box.append(box)
            else:
                b_height = [box[5]]
                x_max = box[1]
                merged_box.append(new_box)
                new_box = [box]
        if len(new_box) > 0:
            merged_box.append(new_box)

        for mbox in merged_box:
            if len(mbox) != 1:
                x_min = min(mbox, key=lambda x: x[0])[0]
                x_max = max(mbox, key=lambda x: x[1])[1]
                y_min = min(mbox, key=lambda x: x[2])[2]
                y_max = max(mbox, key=lambda x: x[3])[3]
                margin = int(add_margin * min(x_max - x_min, y_max - y_min))
            else:
                box = mbox[0]
                x_min, x_max, y_min, y_max = box[0], box[1], box[2], box[3]
                margin = int(add_margin * min(x_max - x_min, y_max - y_min))
            merged_list.append([x_min - margin, x_max + margin, y_min - margin, y_max + margin])

    return merged_list, free_list


def get_paragraph(raw_result, x_ths: float = 1, y_ths: float = 0.5, mode: str = "ltr"):
    """Greedy box clustering into paragraphs + reading-order traversal
    (``ltr`` or ``rtl``), matching utils.py:1442-1509."""
    box_group = []
    for box in raw_result:
        all_x = [int(coord[0]) for coord in box[0]]
        all_y = [int(coord[1]) for coord in box[0]]
        min_x, max_x = min(all_x), max(all_x)
        min_y, max_y = min(all_y), max(all_y)
        height = max_y - min_y
        # final slot: paragraph-group id (0 = unassigned)
        box_group.append([box[1], min_x, max_x, min_y, max_y, height, 0.5 * (min_y + max_y), 0])

    current_group = 1
    while any(box[7] == 0 for box in box_group):
        box_group0 = [box for box in box_group if box[7] == 0]
        if not any(box[7] == current_group for box in box_group):
            box_group0[0][7] = current_group
        else:
            current_box_group = [box for box in box_group if box[7] == current_group]
            mean_height = np.mean([box[5] for box in current_box_group])
            min_gx = min(box[1] for box in current_box_group) - x_ths * mean_height
            max_gx = max(box[2] for box in current_box_group) + x_ths * mean_height
            min_gy = min(box[3] for box in current_box_group) - y_ths * mean_height
            max_gy = max(box[4] for box in current_box_group) + y_ths * mean_height
            add_box = False
            for box in box_group0:
                same_horizontal = (min_gx <= box[1] <= max_gx) or (min_gx <= box[2] <= max_gx)
                same_vertical = (min_gy <= box[3] <= max_gy) or (min_gy <= box[4] <= max_gy)
                if same_horizontal and same_vertical:
                    box[7] = current_group
                    add_box = True
                    break
            if not add_box:
                current_group += 1

    result = []
    for i in set(box[7] for box in box_group):
        current_box_group = [box for box in box_group if box[7] == i]
        mean_height = np.mean([box[5] for box in current_box_group])
        min_gx = min(box[1] for box in current_box_group)
        max_gx = max(box[2] for box in current_box_group)
        min_gy = min(box[3] for box in current_box_group)
        max_gy = max(box[4] for box in current_box_group)

        text = ""
        while len(current_box_group) > 0:
            highest = min(box[6] for box in current_box_group)
            candidates = [box for box in current_box_group if box[6] < highest + 0.4 * mean_height]
            best_box = None
            if mode == "ltr":
                most_left = min(box[1] for box in candidates)
                for box in candidates:
                    if box[1] == most_left:
                        best_box = box
            elif mode == "rtl":
                most_right = max(box[2] for box in candidates)
                for box in candidates:
                    if box[2] == most_right:
                        best_box = box
            text += " " + best_box[0]
            current_box_group.remove(best_box)

        result.append(
            [[[min_gx, min_gy], [max_gx, min_gy], [max_gx, max_gy], [min_gx, max_gy]], text[1:]]
        )
    return result


def merge_to_free(merge_result, free_list):
    """Reinsert free-box results into row-major reading order
    (utils.py:1176-1215)."""
    merge_result_buf, mr_buf = [], []

    if not free_list:
        return merge_result

    free_list_buf = merge_result[-len(free_list):]
    merge_result = merge_result[:-len(free_list)]

    for idx, r in enumerate(merge_result):
        if idx == len(merge_result) - 1:
            mr_buf.append(r)
            merge_result_buf.append(mr_buf)
            mr_buf = []
            continue
        if (mr_buf == []) or (mr_buf[-1][0] < r[0]):
            mr_buf.append(r)
        else:
            merge_result_buf.append(mr_buf)
            mr_buf = [r]

    for free_pos in free_list_buf:
        y_pos = len(merge_result_buf)
        x_pos = len(merge_result_buf[y_pos - 1])
        for i, result_pos in enumerate(merge_result_buf[1:]):
            if free_pos[0][0][1] < result_pos[0][0][0][1]:
                y_pos = i
                break
        for i, result_pos in enumerate(merge_result_buf[y_pos]):
            if free_pos[0][0][0] < result_pos[0][0][0]:
                x_pos = i
                break
        merge_result_buf[y_pos].insert(x_pos, free_pos)

    merged = []
    for r in merge_result_buf:
        merged.extend(r)
    return merged

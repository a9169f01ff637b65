"""Perspective transforms and line-crop extraction, cv2-free.

Replaces ``cv2.getPerspectiveTransform`` / ``cv2.warpPerspective`` with a
numpy homography solve + vectorised inverse-map sampling, and ports
``four_point_transform`` / ``get_image_list``
(``/root/reference/src/ocrfa/utils.py:1218-1231, 1375-1418``).
"""

from __future__ import annotations

import math

import numpy as np

from ocrfa_tpu.preproc.host import calculate_ratio, compute_ratio_and_resize


def perspective_transform(src, dst) -> np.ndarray:
    """3x3 homography mapping 4 ``src`` points onto 4 ``dst`` points."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.zeros(8, dtype=np.float64)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def warp_perspective(img, m, size, interpolation: str = "bilinear") -> np.ndarray:
    """Warp ``img`` by homography ``m`` into a ``(w, h)`` output canvas.

    Inverse-maps every output pixel through ``m^-1`` and samples with
    bilinear or nearest interpolation; out-of-bounds reads are 0, matching
    cv2's default constant border.
    """
    w, h = size
    minv = np.linalg.inv(m)

    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    denom = minv[2, 0] * xs + minv[2, 1] * ys + minv[2, 2]
    sx = (minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]) / denom
    sy = (minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]) / denom

    src_h, src_w = img.shape[:2]
    img_f = np.asarray(img)

    if interpolation == "nearest":
        ix = np.rint(sx).astype(np.int64)
        iy = np.rint(sy).astype(np.int64)
        valid = (ix >= 0) & (ix < src_w) & (iy >= 0) & (iy < src_h)
        out = np.zeros((h, w) + img_f.shape[2:], dtype=img_f.dtype)
        out[valid] = img_f[iy[valid], ix[valid]]
        return out

    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    if img_f.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]

    def sample(yi, xi):
        valid = (xi >= 0) & (xi < src_w) & (yi >= 0) & (yi < src_h)
        vals = np.zeros((h, w) + img_f.shape[2:], dtype=np.float64)
        vals[valid] = img_f[yi[valid], xi[valid]]
        return vals

    out = (
        sample(y0, x0) * (1 - fx) * (1 - fy)
        + sample(y0, x0 + 1) * fx * (1 - fy)
        + sample(y0 + 1, x0) * (1 - fx) * fy
        + sample(y0 + 1, x0 + 1) * fx * fy
    )
    if np.issubdtype(img_f.dtype, np.integer):
        return np.clip(np.rint(out), np.iinfo(img_f.dtype).min, np.iinfo(img_f.dtype).max).astype(img_f.dtype)
    return out.astype(img_f.dtype)


def four_point_transform(image, rect) -> np.ndarray:
    """Rectify a quadrilateral region to an axis-aligned crop (utils.py:1218-1231)."""
    tl, tr, br, bl = np.asarray(rect, dtype=np.float64)

    width_a = np.hypot(br[0] - bl[0], br[1] - bl[1])
    width_b = np.hypot(tr[0] - tl[0], tr[1] - tl[1])
    mw = max(int(width_a), int(width_b))

    height_a = np.hypot(tr[0] - br[0], tr[1] - br[1])
    height_b = np.hypot(tl[0] - bl[0], tl[1] - bl[1])
    mh = max(int(height_a), int(height_b))

    dst = np.array([[0, 0], [mw - 1, 0], [mw - 1, mh - 1], [0, mh - 1]], dtype=np.float64)
    m = perspective_transform(np.asarray(rect, dtype=np.float64), dst)
    return warp_perspective(image, m, (mw, mh))


def get_image_list(horizontal_list, free_list, img, model_height: int = 64, sort_output: bool = True):
    """Produce (box, crop) pairs resized to ``model_height`` and the batch's
    dynamic max width (utils.py:1375-1418).

    Free (slanted) boxes are perspective-rectified; horizontal boxes are
    sliced directly.  ``max_width`` = ceil(max aspect ratio) * model_height.
    """
    image_list = []
    maximum_y, maximum_x = img.shape

    max_ratio_hori, max_ratio_free = 1, 1
    for box in free_list:
        rect = np.array(box, dtype="float32")
        transformed_img = four_point_transform(img, rect)
        ratio = calculate_ratio(transformed_img.shape[1], transformed_img.shape[0])
        if int(model_height * ratio) == 0:
            continue
        crop_img, ratio = compute_ratio_and_resize(
            transformed_img, transformed_img.shape[1], transformed_img.shape[0], model_height
        )
        image_list.append((box, crop_img))
        max_ratio_free = max(ratio, max_ratio_free)
    max_ratio_free = math.ceil(max_ratio_free)

    for box in horizontal_list:
        x_min = max(0, box[0])
        x_max = min(box[1], maximum_x)
        y_min = max(0, box[2])
        y_max = min(box[3], maximum_y)
        crop_img = img[y_min:y_max, x_min:x_max]
        width = x_max - x_min
        height = y_max - y_min
        ratio = calculate_ratio(width, height)
        if int(model_height * ratio) == 0:
            continue
        crop_img, ratio = compute_ratio_and_resize(crop_img, width, height, model_height)
        image_list.append(
            ([[x_min, y_min], [x_max, y_min], [x_max, y_max], [x_min, y_max]], crop_img)
        )
        max_ratio_hori = max(ratio, max_ratio_hori)

    max_ratio_hori = math.ceil(max_ratio_hori)
    max_ratio = max(max_ratio_hori, max_ratio_free)
    max_width = math.ceil(max_ratio) * model_height

    if sort_output:
        image_list = sorted(image_list, key=lambda item: item[0][0][1])
    return image_list, max_width

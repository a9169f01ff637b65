"""Host-side (numpy/PIL) image preprocessing.

Replaces the reference's cv2/torchvision pipeline (AlignCollate/NormalizePAD,
``/root/reference/src/ocrfa/utils.py:446-602``) with a vectorised, cv2-free
implementation.  Resampling uses PIL (bicubic for line crops, bilinear for
detector canvases) — numerically close to, but not bit-identical with, the
cv2 kernels the reference links against.

The TPU production path moves resize+normalise+pad on-device
(:mod:`ocrfa_tpu.preproc.device`); these host functions are the behavioral
reference and the fallback.
"""

from __future__ import annotations

import math

import numpy as np
from PIL import Image


def custom_mean(x) -> float:
    """Confidence aggregation: ``prod(x) ** (2/sqrt(len(x)))`` (utils.py:446-447)."""
    x = np.asarray(x)
    return x.prod() ** (2.0 / np.sqrt(len(x)))


def contrast_grey(img):
    """(p90-p10)/max(10, p90+p10) contrast statistic (utils.py:450-453)."""
    high = np.percentile(img, 90)
    low = np.percentile(img, 10)
    return (high - low) / np.maximum(10, high + low), high, low


def adjust_contrast_grey(img, target: float = 0.4):
    """Stretch low-contrast grey crops to ~[25, 225] (utils.py:456-463)."""
    contrast, high, low = contrast_grey(img)
    if contrast < target:
        img = img.astype(int)
        ratio = 200.0 / np.maximum(10, high - low)
        img = (img - low + 25) * ratio
        img = np.maximum(
            np.full(img.shape, 0), np.minimum(np.full(img.shape, 255), img)
        ).astype(np.uint8)
    return img


def normalize_mean_variance(img, mean=(0.485, 0.456, 0.406), variance=(0.229, 0.224, 0.225)):
    """ImageNet-normalise an RGB uint8 image to float32 (utils.py:479-484)."""
    out = img.astype(np.float32, copy=True)
    out -= np.array([m * 255.0 for m in mean], dtype=np.float32)
    out /= np.array([v * 255.0 for v in variance], dtype=np.float32)
    return out


def denormalize_mean_variance(img, mean=(0.485, 0.456, 0.406), variance=(0.229, 0.224, 0.225)):
    """Inverse of :func:`normalize_mean_variance` (utils.py:487-494)."""
    out = img.copy()
    out *= variance
    out += mean
    out *= 255.0
    return np.clip(out, 0, 255).astype(np.uint8)


def _pil_resize(img: np.ndarray, size, resample) -> np.ndarray:
    """Resize an (H, W) or (H, W, C) numpy image to (width, height)=size."""
    mode_img = Image.fromarray(img.astype(np.uint8) if img.dtype != np.uint8 else img)
    return np.asarray(mode_img.resize(size, resample))


def resize_aspect_ratio(img, square_size, mag_ratio: float = 1.0):
    """Detector canvas prep: aspect-preserving resize + pad to /32.

    Returns ``(canvas, ratio, size_heatmap)`` like the reference
    (utils.py:497-524).  Bilinear resample.
    """
    height, width, channel = img.shape
    target_size = mag_ratio * max(height, width)
    if target_size > square_size:
        target_size = square_size
    ratio = target_size / max(height, width)

    target_h, target_w = int(height * ratio), int(width * ratio)
    proc = _pil_resize(img, (target_w, target_h), Image.BILINEAR)

    target_h32 = target_h + (32 - target_h % 32) if target_h % 32 != 0 else target_h
    target_w32 = target_w + (32 - target_w % 32) if target_w % 32 != 0 else target_w
    resized = np.zeros((target_h32, target_w32, channel), dtype=np.float32)
    resized[:target_h, :target_w, :] = proc

    size_heatmap = (int(target_w32 / 2), int(target_h32 / 2))
    return resized, ratio, size_heatmap


def calculate_ratio(width, height) -> float:
    """Aspect ratio, flipped above 1 for vertical text (utils.py:1351-1358)."""
    ratio = width / height
    if ratio < 1.0:
        ratio = 1.0 / ratio
    return ratio


def compute_ratio_and_resize(img, width, height, model_height):
    """Resize a crop to ``model_height`` preserving (possibly flipped) ratio.

    Mirrors utils.py:1361-1372: vertical crops (h > w) are resized to
    ``(model_height, model_height*ratio)`` — i.e. rotated into a wide strip.
    """
    ratio = width / height
    if ratio < 1.0:
        ratio = calculate_ratio(width, height)
        img = _pil_resize(img, (model_height, int(model_height * ratio)), Image.LANCZOS)
    else:
        img = _pil_resize(img, (int(model_height * ratio), model_height), Image.LANCZOS)
    return img, ratio


def normalize_pad(images, img_h: int, max_w: int) -> np.ndarray:
    """Grey crops -> ``(N, img_h, max_w, 1)`` float32 in [-1, 1].

    Equivalent of ToTensor + (x-0.5)/0.5 + replicate-edge right padding
    (NormalizePAD, utils.py:533-550), vectorised over the batch.  Layout is
    NHWC (TPU-native) rather than the reference's NCHW.
    """
    n = len(images)
    out = np.zeros((n, img_h, max_w, 1), dtype=np.float32)
    for i, img in enumerate(images):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = (arr - 0.5) / 0.5
        h, w = arr.shape[:2]
        out[i, :, :w, 0] = arr
        if w < max_w:
            out[i, :, w:, 0] = arr[:, w - 1:w]
    return out


def align_collate_u8(images, img_h: int = 64, img_w: int = 1280,
                     adjust_contrast: float = 0.0) -> np.ndarray:
    """Batch line crops to a padded uint8 NHWC batch.

    Optional contrast stretch, bicubic resize to ``img_h``, replicate-edge
    right pad to ``img_w`` (AlignCollate semantics, utils.py:567-602) —
    but kept in uint8: normalisation to [-1, 1] runs on-device
    (4x less host->device traffic; values match the reference's
    ToTensor + (x-0.5)/0.5 bit-for-bit in f32).
    """
    n = len(images)
    out = np.zeros((n, img_h, img_w, 1), dtype=np.uint8)
    for i, image in enumerate(images):
        image = np.asarray(image)
        if adjust_contrast > 0:
            image = adjust_contrast_grey(image, target=adjust_contrast)
        h, w = image.shape[:2]
        ratio = w / float(h)
        resized_w = img_w if math.ceil(img_h * ratio) > img_w else math.ceil(img_h * ratio)
        resized = _pil_resize(image, (resized_w, img_h), Image.BICUBIC)
        out[i, :, :resized_w, 0] = resized
        if resized_w < img_w:
            out[i, :, resized_w:, 0] = resized[:, resized_w - 1:resized_w]
    return out


def align_collate(images, img_h: int = 64, img_w: int = 1280, adjust_contrast: float = 0.0) -> np.ndarray:
    """Batch line crops: optional contrast stretch, bicubic resize to
    ``img_h``, replicate-pad to ``img_w`` (AlignCollate, utils.py:567-602).

    ``images`` are grey uint8 arrays of shape (h, w).  Returns NHWC float32.
    """
    u8 = align_collate_u8(images, img_h, img_w, adjust_contrast)
    return (u8.astype(np.float32) / 255.0 - 0.5) / 0.5

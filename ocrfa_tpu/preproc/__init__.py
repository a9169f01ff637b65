"""Image preprocessing: host (numpy/PIL) reference path and fused device path."""

from ocrfa_tpu.preproc.host import (
    adjust_contrast_grey,
    align_collate,
    calculate_ratio,
    compute_ratio_and_resize,
    contrast_grey,
    custom_mean,
    normalize_mean_variance,
    denormalize_mean_variance,
    normalize_pad,
    resize_aspect_ratio,
)
from ocrfa_tpu.preproc.buckets import WIDTH_BUCKETS, bucket_for_width, bucketize

__all__ = [
    "adjust_contrast_grey",
    "align_collate",
    "calculate_ratio",
    "compute_ratio_and_resize",
    "contrast_grey",
    "custom_mean",
    "normalize_mean_variance",
    "denormalize_mean_variance",
    "normalize_pad",
    "resize_aspect_ratio",
    "WIDTH_BUCKETS",
    "bucket_for_width",
    "bucketize",
]

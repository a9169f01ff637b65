"""Native (C++) host runtime: geometry and DCN parity kernels."""

from ocrfa_tpu.runtime.native import (
    available,
    cc_label_native,
    dcn_forward_native,
    find_contours_native,
    min_area_rect_native,
)

__all__ = [
    "available",
    "cc_label_native",
    "dcn_forward_native",
    "find_contours_native",
    "min_area_rect_native",
]

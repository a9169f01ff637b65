"""Host geometry: box grouping, perspective warps, paragraph assembly."""

from ocrfa_tpu.geometry.boxes import diff, get_paragraph, group_text_box, merge_to_free
from ocrfa_tpu.geometry.transform import (
    four_point_transform,
    get_image_list,
    perspective_transform,
    warp_perspective,
)

__all__ = [
    "diff",
    "get_paragraph",
    "group_text_box",
    "merge_to_free",
    "four_point_transform",
    "get_image_list",
    "perspective_transform",
    "warp_perspective",
]

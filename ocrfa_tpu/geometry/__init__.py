"""Host geometry: box grouping, perspective warps, paragraph assembly."""

from ocrfa_tpu.geometry.boxes import diff, get_paragraph, group_text_box, merge_to_free
from ocrfa_tpu.geometry.db_maps import (
    db_supervision_maps,
    make_db_batch,
    quad_from_ref_box,
)
from ocrfa_tpu.geometry.transform import (
    four_point_transform,
    get_image_list,
    perspective_transform,
    warp_perspective,
)

__all__ = [
    "db_supervision_maps",
    "make_db_batch",
    "quad_from_ref_box",
    "diff",
    "get_paragraph",
    "group_text_box",
    "merge_to_free",
    "four_point_transform",
    "get_image_list",
    "perspective_transform",
    "warp_perspective",
]

from scene_generation_tpu.ops.sampling import (
    interp_matrix,
    box_sample_matrices,
    crop_matrices,
    bilinear_sample_gather,
)
from scene_generation_tpu.ops.layout import masks_to_layout, boxes_to_layout
from scene_generation_tpu.ops.crop import crop_bbox_batch, uncrop_bbox
from scene_generation_tpu.ops.graph_ops import triple_gather, segment_pool_objects
from scene_generation_tpu.ops.images import wire_to_float

__all__ = [
    "interp_matrix",
    "box_sample_matrices",
    "crop_matrices",
    "bilinear_sample_gather",
    "masks_to_layout",
    "boxes_to_layout",
    "crop_bbox_batch",
    "uncrop_bbox",
    "triple_gather",
    "segment_pool_objects",
    "wire_to_float",
]

from .preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    preprocess_frames,
    yuv420_to_bgr,
)
from .db_postprocess import (
    connected_components,
    db_postprocess,
    db_postprocess_batch,
    extract_detections,
)
from .crop import (
    crop_and_resize_boxes,
    crop_and_resize_boxes_mm,
    rectify_polygons,
)
from .ctc import ctc_greedy_decode_arrays, decode_batch, ids_to_text
from .nms import iou_matrix, nms, temporal_dedup

__all__ = [
    "preprocess_frames",
    "yuv420_to_bgr",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "connected_components",
    "db_postprocess",
    "db_postprocess_batch",
    "extract_detections",
    "crop_and_resize_boxes",
    "crop_and_resize_boxes_mm",
    "rectify_polygons",
    "ctc_greedy_decode_arrays",
    "decode_batch",
    "ids_to_text",
    "iou_matrix",
    "nms",
    "temporal_dedup",
]

from .preprocess import preprocess_frames, IMAGENET_MEAN, IMAGENET_STD
from .db_postprocess import db_postprocess_batch, extract_detections
from .crop import crop_and_resize_boxes, rectify_polygons
from .ctc import ctc_greedy_decode_arrays, ids_to_text

__all__ = [
    "preprocess_frames",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "db_postprocess_batch",
    "extract_detections",
    "crop_and_resize_boxes",
    "rectify_polygons",
    "ctc_greedy_decode_arrays",
    "ids_to_text",
]

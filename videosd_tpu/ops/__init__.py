from videosd_tpu.ops.preprocess import (
    center_crop_box,
    crop_resize,
    i420_to_rgb255,
    i420_to_rgb_host,
    postprocess_image,
    preprocess_frame,
    rgb_to_i420,
    rgb_to_i420_host,
    yuv420_to_rgb,
)
from videosd_tpu.ops.sobel import rgb_to_gray, sobel_control_image, sobel_edges

__all__ = [
    "center_crop_box",
    "crop_resize",
    "postprocess_image",
    "preprocess_frame",
    "yuv420_to_rgb",
    "rgb_to_i420",
    "i420_to_rgb255",
    "rgb_to_i420_host",
    "i420_to_rgb_host",
    "rgb_to_gray",
    "sobel_control_image",
    "sobel_edges",
]

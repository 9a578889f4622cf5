from .image import (
    sep_conv2d,
    gaussian_kernel1d,
    gaussian_blur,
    box_sum,
    resize_bilinear,
    resize_area,
    threshold_binary,
)
from .color import bgr2gray, gray2bgr, bgr2hsv, hsv2bgr, saturating_add
from .pyramid import pyr_down, build_pyramid
from .deriv import scharr_deriv, sobel_deriv
from .patch import extract_patches
from .warp import bilinear_sample, warp_image
from .stats import median, percentile, histogram256
from .lk import pyr_lk, LKResult
from .farneback import farneback
from .features import min_eig_map, good_features_to_track

__all__ = [
    "sep_conv2d",
    "gaussian_kernel1d",
    "gaussian_blur",
    "box_sum",
    "resize_bilinear",
    "resize_area",
    "threshold_binary",
    "bgr2gray",
    "gray2bgr",
    "bgr2hsv",
    "hsv2bgr",
    "saturating_add",
    "pyr_down",
    "build_pyramid",
    "scharr_deriv",
    "sobel_deriv",
    "extract_patches",
    "bilinear_sample",
    "warp_image",
    "median",
    "percentile",
    "histogram256",
    "pyr_lk",
    "LKResult",
    "farneback",
    "min_eig_map",
    "good_features_to_track",
]

from .normalize import radial_normalize, radial_normalize_dense
from .filter import robust_mask, robust_mask_masked
from .danger import danger_values, danger_image
from .foe import estimate_foe
from .camera import Pinhole
from .pose import estimate_relative_pose, RelativePose
from .ba import BAState, BAStats, bundle_adjust, rodrigues, so3_log

__all__ = [
    "radial_normalize",
    "radial_normalize_dense",
    "robust_mask",
    "robust_mask_masked",
    "danger_values",
    "danger_image",
    "estimate_foe",
    "Pinhole",
    "estimate_relative_pose",
    "RelativePose",
    "BAState",
    "BAStats",
    "bundle_adjust",
    "rodrigues",
    "so3_log",
]

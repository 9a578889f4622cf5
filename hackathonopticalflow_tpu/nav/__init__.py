from .normalize import radial_normalize
from .filter import robust_mask
from .danger import danger_values, danger_image
from .foe import estimate_foe

__all__ = [
    "radial_normalize",
    "robust_mask",
    "danger_values",
    "danger_image",
    "estimate_foe",
]

"""Camera model.

The reference carries a per-video horizontal viewing angle (155 deg for
the FPV clips, 36 for the zoomed one — DenseOF.py:443-460) but never
builds an intrinsics matrix; the pose/BA extension needs one. A simple
pinhole model from the horizontal FOV (adequate for the navigation-grade
geometry here; distortion calibration can replace it later).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Pinhole:
    fx: float
    fy: float
    cx: float
    cy: float

    @classmethod
    def from_fov(cls, width: int, height: int, h_fov_deg: float = 155.0) -> "Pinhole":
        f = (width / 2.0) / math.tan(math.radians(h_fov_deg) / 2.0)
        return cls(fx=f, fy=f, cx=width / 2.0, cy=height / 2.0)

    def normalize(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Pixel (…, 2) -> normalized camera coords (…, 2)."""
        x = (pts[..., 0] - self.cx) / self.fx
        y = (pts[..., 1] - self.cy) / self.fy
        return jnp.stack([x, y], axis=-1)

    def sq_norm_thresh(self, px: float = 1.0) -> float:
        """Squared normalized-coordinate threshold equivalent to a pixel
        tolerance (what cv2.findEssentialMat's `threshold` is in pixels) —
        pass to estimate_relative_pose.inlier_thresh so RANSAC gating
        matches the camera's focal length instead of assuming f~500."""
        return float((px / self.fx) ** 2)

    def project(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame 3D (…, 3) -> pixel (…, 2)."""
        z = xyz[..., 2]
        x = xyz[..., 0] / z * self.fx + self.cx
        y = xyz[..., 1] / z * self.fy + self.cy
        return jnp.stack([x, y], axis=-1)

"""Measurement-grid construction.

Replicates the reference's centered grid with parity-corrected indents
(pathfinder_viewer.py:255-267): when the number of grid cells along an axis
is even, the indent is enlarged by half a step so the grid stays centered
around the frame midpoint; coordinates are truncated to ints before being
cast to float32 measurement points.
"""

from __future__ import annotations

import numpy as np


def measurement_grid(height: int, width: int, step: int = 30) -> np.ndarray:
    """Return the (N, 2) float32 array of [x, y] measurement points.

    Matches `np.mgrid[indent_w:width:step, indent_h:height:step]` plus the
    reference's indent parity rules (pathfinder_viewer.py:255-263) and its
    x-major flattening order (pathfinder_viewer.py:263-267).
    """
    if width // step % 2 == 1:
        indent_w = width % step / 2
    else:
        indent_w = (width % step + step) / 2
    if height // step % 2 == 1:
        indent_h = height % step / 2
    else:
        indent_h = (height % step + step) / 2
    xs = np.arange(indent_w, width, step).astype(int)
    ys = np.arange(indent_h, height, step).astype(int)
    # x-major order: all y for the first x, then the next x, ...
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([xx.ravel(), yy.ravel()], axis=-1)
    return pts.astype(np.float32)


def grid_shape(height: int, width: int, step: int = 30) -> tuple[int, int]:
    """(n_x, n_y) cell counts of the measurement grid."""
    pts = measurement_grid(height, width, step)
    n_x = len(np.unique(pts[:, 0]))
    n_y = len(np.unique(pts[:, 1]))
    return n_x, n_y

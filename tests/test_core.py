"""core/: measurement grid and config parity."""

import numpy as np

from hackathonopticalflow_tpu.core.grid import measurement_grid, grid_shape
from hackathonopticalflow_tpu.core.config import LKParams, FarnebackParams


def _reference_grid(height, width, step):
    """Literal transcription of pathfinder_viewer.py:255-267 semantics."""
    if width // step % 2 == 1:
        indent_w = width % step / 2
    else:
        indent_w = (width % step + step) / 2
    if height // step % 2 == 1:
        indent_h = height % step / 2
    else:
        indent_h = (height % step + step) / 2
    points_grid = np.mgrid[indent_w:width:step, indent_h:height:step].astype(int)
    points = []
    for x, y in zip(points_grid[0].flatten(), points_grid[1].flatten()):
        points.append([x, y])
    return np.array(points).astype(np.float32).reshape(-1, 2)


def test_grid_matches_reference_1080p():
    ours = measurement_grid(1080, 1920, 30)
    ref = _reference_grid(1080, 1920, 30)
    np.testing.assert_array_equal(ours, ref)
    assert ours.shape == (64 * 36, 2)
    assert ours[0].tolist() == [15.0, 15.0]


def test_grid_matches_reference_various():
    for (h, w, s) in [(270, 480, 30), (540, 960, 30), (720, 1280, 30), (1080, 1920, 100), (333, 517, 21)]:
        np.testing.assert_array_equal(
            measurement_grid(h, w, s), _reference_grid(h, w, s), err_msg=f"{h}x{w}/{s}"
        )


def test_grid_shape():
    nx, ny = grid_shape(1080, 1920, 30)
    assert (nx, ny) == (64, 36)


def test_default_params_match_reference():
    lk = LKParams()
    assert lk.win_size == (45, 45) and lk.max_level == 2
    assert lk.max_iters == 10 and abs(lk.eps - 0.03) < 1e-9
    fb = FarnebackParams()
    assert (fb.pyr_scale, fb.levels, fb.win_size, fb.iterations, fb.poly_n, fb.poly_sigma) == (
        0.5, 3, 15, 3, 5, 1.2,
    )

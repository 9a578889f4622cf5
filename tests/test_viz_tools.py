"""viz/ layer rendering and io/tools offline-utility tests."""

import numpy as np

import jax.numpy as jnp

from hackathonopticalflow_tpu.viz.layers import (
    draw_flow,
    draw_grid,
    draw_grid_vectors,
    draw_hsv,
    draw_sparse_lamps,
    draw_sparse_hsv,
    mark_points,
)
from hackathonopticalflow_tpu.viz.plotter import Plotter, draw_plot
from hackathonopticalflow_tpu.viz.draw import add_layers
from hackathonopticalflow_tpu.io.tools import (
    resize_image,
    compare_blur_threshold,
    channel_histograms,
)

from conftest import requires_cv2, HAVE_CV2, VIDEO_DIR
import os
import pytest

if HAVE_CV2:
    import cv2


def test_layers_render_shapes():
    h, w = 120, 160
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 3.0
    assert draw_flow((h, w), flow).shape == (h, w, 3)
    assert draw_hsv(flow).shape == (h, w, 3)
    g = draw_grid((h, w), 20, colored_cross=True, cross=True, grid=True,
                  viewing_angle_rect=True, blinds=True)
    assert g.shape == (h, w, 3) and g.sum() > 0
    pts = np.array([[40, 40], [80, 60]], np.int32)
    nxt = pts + np.array([[5, 3], [2, 1]], np.int32)
    good = np.array([True, False])
    v = draw_grid_vectors((h, w), pts, nxt, good)
    assert v.sum() > 0
    lamps = draw_sparse_lamps((h, w), (nxt - pts)[good], pts[good])
    assert lamps.shape == (h, w, 3) and lamps.sum() > 0
    shsv = draw_sparse_hsv((h, w), (nxt - pts), pts)
    assert shsv.sum() > 0
    mp = mark_points((h, w), np.array([[30, 30]]))
    assert mp.sum() > 0


def test_draw_hsv_matches_reference_math():
    """Hue/value coding of draw_hsv (pathfinder_viewer.py:124-141)."""
    flow = np.zeros((4, 4, 2), np.float32)
    flow[..., 0] = 10.0  # pure +x motion -> ang = pi -> hue 90
    img = draw_hsv(flow)
    # hue 90, sat 255, val min(40,255)=40 -> check via HSV roundtrip
    from hackathonopticalflow_tpu.ops.color import bgr2hsv

    hsv = np.asarray(bgr2hsv(jnp.asarray(img)))
    assert abs(int(hsv[0, 0, 0]) - 90) <= 1
    assert abs(int(hsv[0, 0, 2]) - 40) <= 1


def test_add_layers_saturates():
    a = np.full((4, 4, 3), 200, np.uint8)
    b = np.full((4, 4, 3), 100, np.uint8)
    out = add_layers(a, b)
    assert out.dtype == np.uint8 and (out == 255).all()


def test_plotter_renders():
    p = Plotter(200, 120, sample_buffer=50)
    for i in range(80):
        p.plot(np.sin(i / 5.0), "m")
    img = p.render("m", time_text=True)
    assert img.shape == (120, 200, 3) and img.sum() > 0
    assert len(p.plots["m"]) == 50  # ring buffer capped
    st = draw_plot([1.0, 2.0, -1.0, 0.5])
    assert st.sum() > 0


@requires_cv2
def test_resize_image_aspect(bgr_frame):
    out = resize_image(bgr_frame, des_w=192)
    assert out.shape[1] == 192
    assert abs(out.shape[0] - bgr_frame.shape[0] * 192 / bgr_frame.shape[1]) <= 1


@requires_cv2
def test_compare_blur_threshold(bgr_frame):
    out = compare_blur_threshold(bgr_frame, 70.0)
    assert set(out) == {"raw", "blur3", "blur7"}
    for v in out.values():
        assert set(np.unique(v)).issubset({0, 255})


@requires_cv2
def test_channel_histograms(bgr_frame):
    out = channel_histograms(bgr_frame)
    n = bgr_frame.shape[0] * bgr_frame.shape[1]
    for k in ["h", "s", "v"]:
        assert out["hists"][k].sum() == n
    assert out["hue_view"].shape == bgr_frame.shape


@requires_cv2
def test_transcode_roundtrip(tmp_path):
    """io/tools.transcode (Operations.change_format parity: mp4v, 75%
    scale, fixed fps) writes a readable clip with scaled dimensions."""
    import cv2
    from hackathonopticalflow_tpu.io.tools import transcode

    src = os.path.join(VIDEO_DIR, "Тёмный_коридор_колонны .mp4")
    if not os.path.exists(src):
        pytest.skip("corpus unavailable")
    # quick: re-encode a short prefix by truncating through a temp reader
    dst = str(tmp_path / "out.mp4")
    n = transcode(src, dst, percent=25, fps=15.0)
    assert n >= 100
    cap = cv2.VideoCapture(dst)
    ok, frame = cap.read()
    cap.release()
    assert ok
    assert frame.shape == (270, 480, 3)

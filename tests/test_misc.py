"""Coverage for smaller pieces: dense normalization, danger image,
frame queue, logging bootstrap."""

import numpy as np

import jax.numpy as jnp

from hackathonopticalflow_tpu.nav.normalize import radial_normalize_dense
from hackathonopticalflow_tpu.nav.danger import danger_image, danger_values
from hackathonopticalflow_tpu.io.tools import FrameQueue
from hackathonopticalflow_tpu.utils.logging import setup_logging, get_logger


def test_radial_normalize_dense_matches_sparse():
    h, w = 60, 80
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 4.0
    m = np.asarray(radial_normalize_dense(jnp.asarray(flow)))
    ys, xs = np.mgrid[0:h, 0:w]
    dc = np.sqrt((int(w / 2) - xs) ** 2 + (int(h / 2) - ys) ** 2)
    ref = 4.0 / (5 + np.sqrt(dc)) * 30
    np.testing.assert_allclose(m, ref, rtol=1e-5)


def test_danger_image_scatter():
    pts = jnp.asarray(np.array([[5, 7], [10, 3], [5, 7]], np.int32))
    vals = danger_values(jnp.asarray(np.array([10.0, 100.0, 50.0], np.float32)))
    good = jnp.asarray(np.array([True, True, True]))
    img = np.asarray(danger_image(pts, vals, good, 12, 16))
    assert img[7, 5] == max(50 + 2 * 10, 50 + 2 * 50)
    assert img[3, 10] == min(50 + 2 * 100, 255)
    assert (img > 0).sum() == 2


def test_frame_queue_ring():
    q = FrameQueue(maxlen=5)
    for i in range(9):
        q.push(np.full((2, 2), i, np.uint8), i)
    # reference semantics: pop when len > maxlen -> capacity maxlen+1
    assert len(q) == 6
    idxs = [i for _, i in q]
    assert idxs == [3, 4, 5, 6, 7, 8]
    assert q.latest(1)[0][1] == 8


def test_logging_bootstrap(tmp_path):
    setup_logging(log_dir=str(tmp_path), file_name="t.log")
    log = get_logger("test")
    log.error("boom %d", 7)
    text = (tmp_path / "t.log").read_text()
    assert "boom 7" in text and "ERROR" in text

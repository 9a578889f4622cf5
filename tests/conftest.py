"""Test harness configuration.

All tests run on CPU with 8 virtual devices (XLA host-platform device
count) so the distributed paths (shard_map tiling, halo exchange,
collective statistics) are exercised without TPU hardware — the strategy
from SURVEY.md §4. NOTE: this environment pre-imports jax through a
sitecustomize hook with JAX_PLATFORMS=axon (a live TPU tunnel), so the
platform must be forced via jax.config, not env vars alone.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VIDEO_DIR = "/root/reference/videos"
CLIP_CORRIDOR = os.path.join(VIDEO_DIR, "Тёмный_коридор_колонны .mp4")
CLIP_BUILDINGS = os.path.join(VIDEO_DIR, "здания_дверь_колонны_перекрытия.mp4")

try:
    import cv2

    HAVE_CV2 = True
except Exception:
    cv2 = None
    HAVE_CV2 = False

requires_cv2 = pytest.mark.skipif(not HAVE_CV2, reason="cv2 oracle unavailable")


@pytest.fixture(scope="session")
def frame_pair():
    """Consecutive gray frame pair from the smallest reference clip."""
    from hackathonopticalflow_tpu.io.video import read_gray_pair

    if not HAVE_CV2 or not os.path.exists(CLIP_CORRIDOR):
        pytest.skip("no decode backend / corpus")
    return read_gray_pair(CLIP_CORRIDOR, 40)


@pytest.fixture(scope="session")
def frame_pair_small(frame_pair):
    """480x270 downscaled pair — keeps CPU golden tests fast."""
    a, b = frame_pair
    a = cv2.resize(a, (480, 270), interpolation=cv2.INTER_AREA)
    b = cv2.resize(b, (480, 270), interpolation=cv2.INTER_AREA)
    return a, b


@pytest.fixture(scope="session")
def bgr_frame():
    from hackathonopticalflow_tpu.io.video import read_frames

    if not HAVE_CV2 or not os.path.exists(CLIP_CORRIDOR):
        pytest.skip("no decode backend / corpus")
    return read_frames(CLIP_CORRIDOR, [40])[0]

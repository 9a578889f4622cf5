"""ops/stats.py and nav/ parity tests."""

import numpy as np

import jax.numpy as jnp

from hackathonopticalflow_tpu.ops.stats import (
    median,
    percentile,
    masked_median,
    masked_percentile,
    histogram256,
)
from hackathonopticalflow_tpu.nav.normalize import radial_normalize
from hackathonopticalflow_tpu.nav.filter import robust_mask, robust_mask_masked
from hackathonopticalflow_tpu.nav.danger import danger_values
from hackathonopticalflow_tpu.nav.foe import estimate_foe
from hackathonopticalflow_tpu.core.config import FilterParams, NormalizeParams


def test_median_percentile_match_numpy():
    rng = np.random.RandomState(0)
    for n in [7, 8, 101, 2304]:
        x = rng.uniform(0, 50, n).astype(np.float32)
        assert abs(float(median(jnp.asarray(x))) - np.median(x)) < 1e-4
        assert abs(float(percentile(jnp.asarray(x), 99)) - np.percentile(x, 99)) < 1e-3


def test_masked_stats_match_numpy():
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 50, 64).astype(np.float32)
    mask = rng.rand(64) > 0.3
    ref_med = np.median(x[mask])
    ref_p99 = np.percentile(x[mask], 99)
    assert abs(float(masked_median(jnp.asarray(x), jnp.asarray(mask))) - ref_med) < 1e-4
    assert abs(float(masked_percentile(jnp.asarray(x), jnp.asarray(mask), 99)) - ref_p99) < 1e-3


def test_histogram256():
    rng = np.random.RandomState(2)
    x = rng.randint(0, 256, (64, 48)).astype(np.uint8)
    ours = np.asarray(histogram256(jnp.asarray(x)))
    ref, _ = np.histogram(x, bins=256, range=(0, 256))
    np.testing.assert_array_equal(ours, ref)


def test_radial_normalize_formula():
    """modulus / (5 + sqrt(dist_center)) * 30 (pathfinder_viewer.py:164-166)."""
    pts = np.array([[960.0, 540.0], [15.0, 15.0], [100.0, 400.0]], np.float32)
    m = np.array([10.0, 10.0, 20.0], np.float32)
    ours = np.asarray(
        radial_normalize(jnp.asarray(m), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), 960, 540)
    )
    dc = np.sqrt((960 - pts[:, 0]) ** 2 + (540 - pts[:, 1]) ** 2)
    ref = m / (5 + np.sqrt(dc)) * 30
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_robust_mask_reference_semantics():
    """median*1.0 < m < P99 (pathfinder_viewer.py:173)."""
    rng = np.random.RandomState(3)
    m = rng.uniform(0, 30, 500).astype(np.float32)
    ours = np.asarray(robust_mask(jnp.asarray(m), FilterParams()))
    ref = (np.median(m) * 1.0 < m) & (m < np.percentile(m, 99))
    np.testing.assert_array_equal(ours, ref)


def test_robust_mask_proto_variant():
    """m > median*1.2, no upper bound (DenseOF.py:228)."""
    rng = np.random.RandomState(4)
    m = rng.uniform(0, 30, 300).astype(np.float32)
    ours = np.asarray(robust_mask(jnp.asarray(m), FilterParams(median_factor=1.2, upper_percentile=None)))
    np.testing.assert_array_equal(ours, m > np.median(m) * 1.2)


def test_robust_mask_masked_consistency():
    rng = np.random.RandomState(5)
    m = rng.uniform(0, 30, 256).astype(np.float32)
    valid = rng.rand(256) > 0.25
    ours = np.asarray(robust_mask_masked(jnp.asarray(m), jnp.asarray(valid), FilterParams()))
    mv = m[valid]
    ref_sub = (np.median(mv) < mv) & (mv < np.percentile(mv, 99))
    np.testing.assert_array_equal(ours[valid], ref_sub)
    assert not ours[~valid].any()


def test_danger_values():
    m = np.array([0.0, 10.0, 200.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(danger_values(jnp.asarray(m))), [50.0, 70.0, 255.0]
    )


def test_foe_recovers_synthetic_center():
    """Synthetic radial expansion about a known FOE."""
    rng = np.random.RandomState(6)
    foe = np.array([300.0, 200.0])
    pts = rng.uniform(0, 640, (400, 2)).astype(np.float32)
    r = pts - foe
    flow = 0.05 * r + rng.normal(0, 0.05, r.shape)
    e, resid = estimate_foe(jnp.asarray(pts), jnp.asarray(flow.astype(np.float32)))
    assert np.linalg.norm(np.asarray(e) - foe) < 5.0
    assert float(resid) < 10.0

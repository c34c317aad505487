"""Pallas speckle kernel vs the XLA reference and the cv2 oracle.

The kernel (ops/speckle_pallas.py) must reproduce cv::filterSpeckles
exactly — the same contract the XLA formulation (ops/speckle.py) is
held to (reference: cfg/i3DR_Disparity.cfg:33-34 speckle params;
ini/quick.param:94-95 engine speckle section).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from i3dr_stereo_tpu.ops.speckle import speckle_filter
from i3dr_stereo_tpu.ops.speckle_pallas import speckle_filter_pallas

cv2 = pytest.importorskip("cv2")


def _xla_keep(d, v, S, md):
    return np.asarray(speckle_filter(jnp.asarray(d), jnp.asarray(v),
                                     max_size=S, max_diff=md))


def _pallas_keep(d, v, S, md):
    return np.asarray(speckle_filter_pallas(jnp.asarray(d), jnp.asarray(v),
                                            max_size=S, max_diff=md,
                                            interpret=True))


def test_single_tile_matches_xla_and_cv2():
    rng = np.random.default_rng(0)
    H, W = 48, 136
    d = (rng.integers(0, 4, (1, H, W)) * 3.0).astype(np.float32)
    v = rng.random((1, H, W)) > 0.15
    got = _pallas_keep(d, v, 12, 1.0)
    np.testing.assert_array_equal(got, _xla_keep(d, v, 12, 1.0))
    cvd = np.where(v[0], d[0] * 16, -16).astype(np.int16)
    cv2.filterSpeckles(cvd, -16, 12, 16)
    np.testing.assert_array_equal(got[0], (cvd != -16) & v[0])


def test_tiled_matches_xla():
    rng = np.random.default_rng(1)
    H, W = 320, 560  # > 320*512 px forces the tiled path
    d = (rng.integers(0, 3, (1, H // 8, W // 8)) * 5.0)
    d = d.repeat(8, 1).repeat(8, 2).astype(np.float32)
    d += (rng.random((1, H, W)) < 0.02) * 7.0
    v = rng.random((1, H, W)) > 0.1
    for S, md in ((12, 1.0), (60, 1.0)):
        np.testing.assert_array_equal(_pallas_keep(d, v, S, md),
                                      _xla_keep(d, v, S, md))


def test_tile_boundary_regions():
    """Regions straddling the 256-px tile boundary must be judged from
    both tiles consistently (halo containment argument)."""
    H, W = 320, 560
    d = np.zeros((1, H, W), np.float32)
    v = np.zeros((1, H, W), bool)
    # 5x5 blob exactly on the column-256 tile edge -> removable (25 px)
    v[0, 100:105, 254:259] = True
    d[0, 100:105, 254:259] = 7.0
    # long thin region crossing the edge, size 300 -> kept
    v[0, 200:202, 100:250] = True
    d[0, 200:202, 100:250] = 3.0
    keep = _pallas_keep(d, v, 25, 1.0)
    assert not keep[0, 100:105, 254:259].any()
    assert keep[0, 200:202, 100:250].all()
    np.testing.assert_array_equal(keep, _xla_keep(d, v, 25, 1.0))


def test_batched():
    rng = np.random.default_rng(3)
    d = (rng.integers(0, 3, (2, 40, 130)) * 4.0).astype(np.float32)
    v = rng.random((2, 40, 130)) > 0.2
    np.testing.assert_array_equal(_pallas_keep(d, v, 9, 1.0),
                                  _xla_keep(d, v, 9, 1.0))


def test_large_threshold_big_frame_falls_back_to_xla():
    """max_size+1 > 128 forces the single-window Pallas path, which at
    full resolution would exceed VMEM; the dispatcher must reroute those
    shapes to XLA instead of failing to compile (ADVICE r2)."""
    from i3dr_stereo_tpu.ops.speckle import speckle_filter

    rng = np.random.default_rng(4)
    H, W = 400, 560  # > 320*512 px with S+1 > 128 -> must not take pallas
    d = (rng.integers(0, 3, (1, H, W)) * 4.0).astype(np.float32)
    v = rng.random((1, H, W)) > 0.15
    out = np.asarray(speckle_filter(d, v, max_size=200, max_diff=1.0,
                                    backend="pallas"))
    ref = np.asarray(speckle_filter(d, v, max_size=200, max_diff=1.0,
                                    backend="xla"))
    np.testing.assert_array_equal(out, ref)

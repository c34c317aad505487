import numpy as np
import jax.numpy as jnp
import pytest

from i3dr_stereo_tpu.core.camera import StereoRig
from i3dr_stereo_tpu.ops.depth import (
    crop_by_disparity,
    disparity_to_depth,
    disparity_to_pointcloud,
    pointcloud_to_numpy,
)


def test_depth_analytic():
    rig = StereoRig.synthetic(64, 48, fx=100.0, baseline_m=0.5)
    disp = np.full((48, 64), 10.0, np.float32)
    valid = np.ones((48, 64), bool)
    depth, ok = disparity_to_depth(jnp.asarray(disp), jnp.asarray(valid),
                                   jnp.asarray(rig.Q), 0.0, 100.0)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(depth), 100.0 * 0.5 / 10.0, rtol=1e-5)


def test_depth_filters_reference_semantics():
    # disparity_to_depth.cpp:156,174-175: d==0, d==nodata(10000), w<=0,
    # Z outside [min,max] are all dropped
    rig = StereoRig.synthetic(8, 4, fx=100.0, baseline_m=0.5)
    disp = np.array([[0.0, 10000.0, 10.0, 1000.0]] * 4, np.float32)
    valid = np.ones((4, 4), bool)
    depth, ok = disparity_to_depth(jnp.asarray(disp), jnp.asarray(valid),
                                   jnp.asarray(rig.Q), 1.0, 10.0)
    ok = np.asarray(ok)
    assert not ok[0, 0]       # d == 0
    assert not ok[0, 1]       # nodata
    assert ok[0, 2]           # Z = 5 in range
    assert not ok[0, 3]       # Z = 0.05 < depth_min
    assert np.asarray(depth)[0, 0] == 0.0


def test_pointcloud_geometry():
    rig = StereoRig.synthetic(32, 24, fx=100.0, baseline_m=0.25)
    d0 = 5.0
    disp = np.full((24, 32), d0, np.float32)
    valid = np.ones((24, 32), bool)
    rgb = np.random.default_rng(0).uniform(0, 255, (24, 32)).astype(np.float32)
    pc = disparity_to_pointcloud(jnp.asarray(disp), jnp.asarray(valid),
                                 jnp.asarray(rig.Q), jnp.asarray(rgb),
                                 0.0, 100.0)
    xyz, rgb_out = pointcloud_to_numpy({k: np.asarray(v) for k, v in pc.items()})
    Z = 100.0 * 0.25 / d0
    np.testing.assert_allclose(xyz[:, 2], Z, rtol=1e-5)
    assert xyz.shape == (24 * 32, 3)
    assert rgb_out.shape == (24 * 32, 3)
    # principal-point pixel maps to X=Y=0
    center_idx = 12 * 32 + 16
    np.testing.assert_allclose(xyz[center_idx, :2], [0, 0], atol=Z / 100.0 * 2)


def test_crop_by_disparity():
    img = np.full((8, 8), 200.0, np.float32)
    disp = np.full((8, 8), 5.0, np.float32)
    disp[0, :] = 10000.0
    valid = np.ones((8, 8), bool)
    valid[1, :] = False
    out = np.asarray(crop_by_disparity(jnp.asarray(img), jnp.asarray(disp),
                                       jnp.asarray(valid)))
    assert (out[0] == 0).all()
    assert (out[1] == 0).all()
    assert (out[2:] == 200.0).all()


def test_wls_fill_holes():
    from i3dr_stereo_tpu.ops.wls import wls_fill
    disp = np.full((32, 32), 8.0, np.float32)
    valid = np.ones((32, 32), bool)
    disp[10:20, 10:20] = 0.0
    valid[10:20, 10:20] = False
    guide = np.full((32, 32), 128.0, np.float32)
    filled, newvalid = wls_fill(jnp.asarray(disp), jnp.asarray(valid),
                                jnp.asarray(guide))
    f = np.asarray(filled)
    assert np.asarray(newvalid).all()
    np.testing.assert_allclose(f[valid], 8.0, atol=1e-3)  # anchors untouched
    assert np.abs(f[14, 14] - 8.0) < 1.0                  # hole filled from context

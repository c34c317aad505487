import numpy as np
import pytest

from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm, PointCloudConfig
from i3dr_stereo_tpu.core.camera import StereoRig
from i3dr_stereo_tpu.io.synthetic import layered_scene
from i3dr_stereo_tpu.pipeline.stereo_pipeline import StereoPipeline
from i3dr_stereo_tpu.pipeline.pairing import (
    ApproximateTimeSync,
    FrameBatcher,
    Stamped,
    pair_streams,
)


def _pipeline(**kw):
    rig = StereoRig.synthetic(128, 96, fx=120.0, baseline_m=0.3)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=32,
                                                     speckle_size=0)
    defaults = dict(rig=rig, config=cfg,
                    cloud=PointCloudConfig(depth_max=100.0, depth_min=0.0),
                    rectify_inputs=False)
    defaults.update(kw)
    return StereoPipeline(**defaults)


def test_fused_pipeline_end_to_end():
    sc = layered_scene(96, 128, max_disp=20)
    pipe = _pipeline(compute_crop=True)
    res = pipe.process(sc.left, sc.right)
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid) & sc.valid
    assert np.median(np.abs(d - sc.disparity)[v]) < 0.5
    # depth consistent with disparity
    depth = np.asarray(res.depth)
    fxB = 120.0 * 0.3
    sel = np.asarray(res.depth_valid)
    np.testing.assert_allclose(depth[sel], fxB / d[sel], rtol=1e-4)
    # points
    xyz = np.asarray(res.points["xyz"])
    assert xyz.shape == (96 * 128, 3)
    # crop masks invalid pixels
    crop = np.asarray(res.cropped_left)
    assert (crop[~np.asarray(res.valid)] == 0).all()


def test_pipeline_depth_clamp_invalidates():
    # generate_disparity.cpp:449-452: depth_max clamp -> disparity floor
    sc = layered_scene(96, 128, max_disp=20, background_disp=8)
    pipe = _pipeline(cloud=PointCloudConfig(depth_max=120.0 * 0.3 / 12.0))
    res = pipe.process(sc.left, sc.right)
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid)
    assert (d[v] >= 12.0 - 0.51).all()  # everything farther was invalidated


def test_pipeline_batched():
    sc = layered_scene(96, 128, max_disp=16)
    pipe = _pipeline(compute_points=False)
    L = np.stack([sc.left] * 2)
    R = np.stack([sc.right] * 2)
    res = pipe.process(L, R)
    assert res.disparity.shape == (2, 96, 128)
    assert res.depth.shape == (2, 96, 128)


def test_pipeline_numeric_reconfigure_no_retrace():
    """Live tuning of numeric params (p1/p2, uniqueness, speckle diff,
    depth bounds) must NOT re-trace the compiled step — they flow in as
    traced arguments (cf. the reference's engine rebuild per setter,
    I3DRSGM.cpp:630-654). Only structural changes re-jit."""
    sc = layered_scene(96, 128, max_disp=16)
    pipe = _pipeline()
    r1 = pipe.process(sc.left, sc.right)
    assert len(pipe._cache) == 1
    fn = next(iter(pipe._cache.values()))
    traces0 = fn._cache_size()

    pipe.update_config(p2=2000.0, p1=150.0, uniqueness_ratio=5.0,
                       speckle_range=2.0, backmatch_distance=2.5)
    pipe.update_cloud(depth_min=0.5, depth_max=50.0)
    r2 = pipe.process(sc.left, sc.right)
    assert len(pipe._cache) == 1                      # same compiled step
    assert fn._cache_size() == traces0                # zero new traces
    assert r2.disparity.shape == r1.disparity.shape
    # and the new values genuinely took effect: a P2 of 2000 over-smooths
    # vs the default 400 somewhere on a layered scene
    assert not np.array_equal(np.asarray(r2.disparity),
                              np.asarray(r1.disparity))

    # an extreme uniqueness ratio (traced) must kill pixels without
    # re-tracing either
    pipe.update_config(uniqueness_ratio=99.0)
    r3 = pipe.process(sc.left, sc.right)
    assert fn._cache_size() == traces0
    assert np.asarray(r3.valid).sum() < np.asarray(r2.valid).sum()

    # structural change (LR check off is a different program) re-jits
    pipe.update_config(disp12_max_diff=-1.0)
    pipe.process(sc.left, sc.right)
    assert len(pipe._cache) == 2


def test_pipeline_with_rectification():
    rig = StereoRig.synthetic(128, 96, fx=120.0)
    cfg = ALGORITHM_DEFAULTS[Algorithm.BM].replace(disparity_range=16)
    pipe = StereoPipeline(rig=rig, config=cfg, rectify_inputs=True,
                          compute_points=False, compute_depth=False)
    sc = layered_scene(96, 128, max_disp=12)
    res = pipe.process(sc.left, sc.right)
    # identity calibration: rectified == input
    np.testing.assert_allclose(np.asarray(res.rect_left), sc.left, atol=1e-2)


# ---------------------------------------------------------------- pairing ---

def test_approximate_time_sync_pairs_closest():
    sync = ApproximateTimeSync(slop=0.02)
    a = np.zeros((2, 2))
    for t in [0.00, 0.10, 0.20]:
        sync.push_left(t, a)
    for t in [0.005, 0.104, 0.21]:
        sync.push_right(t, a)
    pairs = sync.pop_pairs()
    stamps = [(l.stamp, r.stamp) for l, r in pairs]
    assert stamps == [(0.00, 0.005), (0.10, 0.104), (0.20, 0.21)]


def test_sync_drops_unmatched():
    sync = ApproximateTimeSync(slop=0.01)
    a = np.zeros(2)
    sync.push_left(0.0, a)
    for t in [0.5, 0.6]:
        sync.push_right(t, a)
    sync.push_left(0.5, a)
    pairs = sync.pop_pairs()
    assert [(l.stamp, r.stamp) for l, r in pairs] == [(0.5, 0.5)]


def test_pair_streams_iterator():
    a = np.zeros(1)
    ls = [Stamped(t, a) for t in np.arange(0, 1, 0.1)]
    rs = [Stamped(t + 0.01, a) for t in np.arange(0, 1, 0.1)]
    pairs = list(pair_streams(iter(ls), iter(rs), slop=0.05))
    assert len(pairs) >= 9


def test_frame_batcher_pads():
    b = FrameBatcher(batch_size=4)
    img = np.zeros((4, 6))
    out = None
    for i in range(3):
        out = b.push(Stamped(i * 0.1, img), Stamped(i * 0.1, img)) or out
    assert out is None
    out = b.flush()
    assert out.left.shape == (4, 4, 6)
    assert out.count == 3


def test_dyn_scalars_follow_direct_config_assignment():
    """The device-cached dyn scalars must track DIRECT assignments to
    pipeline.config/cloud (the reconfigure servers' path,
    bridge/reconfigure.py bind_pipeline) — not only update_config().
    Regression guard for the round-5 device-side dyn cache."""
    import dataclasses

    import numpy as np

    from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
    from i3dr_stereo_tpu.core.camera import StereoRig
    from i3dr_stereo_tpu.pipeline.stereo_pipeline import StereoPipeline

    rig = StereoRig.synthetic(64, 48, fx=100.0)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=16,
                                                     speckle_size=0)
    pipe = StereoPipeline(rig=rig, config=cfg, compute_points=False,
                          compute_depth=False, rectify_inputs=False)
    v0 = pipe._dyn_values()
    assert float(v0["m"]["p2"]) == cfg.p2
    # the reconfigure servers assign directly
    pipe.config = pipe.config.replace(p2=1234.0)
    pipe.cloud = dataclasses.replace(pipe.cloud, depth_max=7.5)
    v1 = pipe._dyn_values()
    assert float(v1["m"]["p2"]) == 1234.0
    assert float(v1["depth_max"]) == 7.5
    # unchanged values reuse the same device buffers (no re-upload)
    v2 = pipe._dyn_values()
    assert v2 is v1

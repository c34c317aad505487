"""Aux subsystems: frames/TF, metrics, viz, savers."""

import math
import os

import numpy as np
import pytest

from i3dr_stereo_tpu.core.frames import (
    RigDescription,
    points_to_frame,
    rpy_matrix,
    transform_points,
)
from i3dr_stereo_tpu.io.savers import load_ply, save_ply
from i3dr_stereo_tpu.utils.metrics import FPSMeter, Metrics
from i3dr_stereo_tpu.viz.colormap import depth_to_color, disparity_to_color
from i3dr_stereo_tpu.viz.viewer import montage


def test_launch_description_smoke():
    # stereo_description.launch analog: must construct a RigDescription
    # with the requested name/baseline/toe-in (regression: kwargs drift)
    from i3dr_stereo_tpu.bridge.launch import launch_description

    d = launch_description("rigX", baseline=0.25, toe_in=2.0)
    assert d.camera_name == "rigX"
    assert d.baseline == 0.25
    assert d.toe_in_l == 2.0 and d.toe_in_r == 2.0
    assert "rigX_cameraLeft_optical" in d.frame_tree()


def test_frame_tree_names_match_reference():
    # urdf/i3dr_stereo_camera.urdf.xacro:8-19 frame names
    d = RigDescription(camera_name="phobos", baseline=0.3)
    frames = d.frame_tree()
    for suffix in ("_cameraLeft_optical", "_cameraRight_optical",
                   "_cameraLeft", "_cameraRight", "_depth_optical_frame",
                   "_base_link", "_center", "_imu_link"):
        assert f"phobos{suffix}" in frames, suffix


def test_baseline_separation():
    d = RigDescription(baseline=0.4, imu_en=False, height=0.0)
    f = d.frame_tree()
    L = f[f"{d.camera_name}_cameraLeft"][:3, 3]
    R = f[f"{d.camera_name}_cameraRight"][:3, 3]
    assert np.linalg.norm(L - R) == pytest.approx(0.4)


def test_optical_frame_convention():
    # optical z must point along the camera body's x (forward), per the
    # ROS optical rotation rpy(-pi/2, 0, -pi/2)
    d = RigDescription(imu_en=False, toe_in_l=0.0)
    f = d.frame_tree()
    cam = f[f"{d.camera_name}_cameraLeft"]
    opt = f[f"{d.camera_name}_cameraLeft_optical"]
    z_opt_in_cam = (np.linalg.inv(cam) @ opt)[:3, 2]
    np.testing.assert_allclose(z_opt_in_cam, [1, 0, 0], atol=1e-9)


def test_toe_in_rotates_optical_axis():
    d0 = RigDescription(imu_en=False, toe_in_l=0.0)
    d5 = RigDescription(imu_en=False, toe_in_l=5.0)
    z0 = d0.frame_tree()[f"{d0.camera_name}_cameraLeft_optical"][:3, 2]
    z5 = d5.frame_tree()[f"{d5.camera_name}_cameraLeft_optical"][:3, 2]
    ang = math.degrees(math.acos(np.clip(np.dot(z0, z5), -1, 1)))
    assert ang == pytest.approx(5.0, abs=1e-6)


def test_points_roundtrip_between_frames():
    d = RigDescription(imu_en=False)
    f = d.frame_tree()
    pts = np.random.default_rng(0).normal(size=(10, 3))
    a = points_to_frame(f, f"{d.camera_name}_cameraLeft_optical",
                        f"{d.camera_name}_base_link", pts)
    b = points_to_frame(f, f"{d.camera_name}_base_link",
                        f"{d.camera_name}_cameraLeft_optical", a)
    np.testing.assert_allclose(b, pts, atol=1e-12)


def test_rpy_matrix_urdf_convention():
    R = rpy_matrix(0, 0, math.pi / 2)  # yaw 90: x -> y
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)


# ---------------------------------------------------------------- metrics ---

def test_metrics_counters_and_stages():
    m = Metrics()
    m.count("frames", 3)
    with m.time("match"):
        pass
    s = m.summary()
    assert s["counters"]["frames"] == 3
    assert s["stages"]["match"]["count"] == 1
    assert s["stages"]["match"]["p95_ms"] >= 0


def test_fps_meter():
    f = FPSMeter()
    t = 100.0
    for i in range(10):
        f.tick(t + i * 0.1)  # 10 fps
    assert f.fps == pytest.approx(10.0, rel=0.2)


# ---------------------------------------------------------------- viz -------

def test_colormaps_shapes_and_invalid():
    d = np.linspace(0, 30, 100).reshape(10, 10)
    v = np.ones((10, 10), bool)
    v[0, 0] = False
    rgb = disparity_to_color(d, v)
    assert rgb.shape == (10, 10, 3) and rgb.dtype == np.uint8
    assert (rgb[0, 0] == 0).all()
    z = depth_to_color(np.abs(d) + 0.1)
    assert z.shape == (10, 10, 3)


def test_montage_and_viewer(tmp_path):
    from i3dr_stereo_tpu.bridge.graph import Graph
    from i3dr_stereo_tpu.viz.viewer import StereoViewer

    g = Graph()
    viewer = StereoViewer(g, "/stereo")
    img = np.random.default_rng(0).uniform(0, 255, (32, 40)).astype(np.float32)
    g.publish("/stereo/left/image_raw", 0.0, img)
    g.publish("/stereo/left/image_rect", 0.0, img)
    g.publish("/stereo/disparity", 0.0,
              {"disparity": np.full((32, 40), 5.0), "valid": np.ones((32, 40), bool)})
    g.publish("/stereo/depth", 0.0, np.full((32, 40), 2.0))
    out = viewer.save(str(tmp_path / "view.png"))
    assert out and os.path.exists(out)


# ---------------------------------------------------------------- ply -------

def test_ply_ascii_binary_roundtrip(tmp_path):
    xyz = np.random.default_rng(1).normal(size=(50, 3)).astype(np.float32)
    rgb = np.random.default_rng(2).integers(0, 255, (50, 3)).astype(np.uint8)
    for binary in (False, True):
        p = str(tmp_path / f"pts_{binary}.ply")
        save_ply(p, xyz, rgb, binary=binary)
        x2, r2 = load_ply(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-5)
        np.testing.assert_array_equal(r2, rgb)


# ---------------------------------------------------------------- cloud -----

def test_render_cloud_projects_points():
    from i3dr_stereo_tpu.viz.cloud import VIEWPOINTS, render_cloud, render_cloud_views

    rng = np.random.default_rng(0)
    # a flat wall + a near blob: the render must show structure
    wall = np.stack([rng.uniform(-1, 1, 4000), rng.uniform(-1, 1, 4000),
                     np.full(4000, 5.0)], axis=1)
    blob = np.stack([rng.normal(0, 0.1, 500), rng.normal(0, 0.1, 500),
                     np.full(500, 3.0)], axis=1)
    xyz = np.concatenate([wall, blob])
    rgb = np.concatenate([np.full((4000, 3), 200, np.uint8),
                          np.full((500, 3), (255, 0, 0), np.uint8)])
    img = render_cloud(xyz, rgb, width=160, height=120)
    assert img.shape == (120, 160, 3)
    assert (img != 16).any()                     # something was painted
    reds = (img[..., 0] > 200) & (img[..., 1] < 60)
    assert reds.any()                            # near blob visible (on top)
    # all preset viewpoints render and differ
    views = render_cloud_views(xyz, rgb, width=80, height=60)
    assert set(views) == set(VIEWPOINTS)
    assert not np.array_equal(views["front"], views["top_down"])


def test_render_cloud_empty_and_nan():
    from i3dr_stereo_tpu.viz.cloud import render_cloud

    img = render_cloud(np.zeros((0, 3)), width=32, height=24)
    assert img.shape == (24, 32, 3)
    pts = np.array([[np.nan, 0, 1], [0.1, 0.2, 2.0]])
    img2 = render_cloud(pts, width=32, height=24)
    assert img2.shape == (24, 32, 3)


def test_viewer_cloud_pane(tmp_path):
    from i3dr_stereo_tpu.bridge.graph import Graph
    from i3dr_stereo_tpu.viz.viewer import StereoViewer

    g = Graph()
    viewer = StereoViewer(g, "/stereo")
    viewer.set_viewpoint("orbit_right")
    img = np.random.default_rng(0).uniform(0, 255, (32, 40)).astype(np.float32)
    g.publish("/stereo/left/image_rect", 0.0, img)
    H, W = 32, 40
    X, Y = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H))
    xyz = np.dstack([X, Y, np.full((H, W), 4.0)]).reshape(-1, 3)
    g.publish("/stereo/points2", 0.0,
              {"xyz": xyz.reshape(H, W, 3),
               "rgb": np.full((H, W, 3), 128, np.uint8),
               "valid": np.ones((H, W), bool)})
    out = viewer.save(str(tmp_path / "cloudview.png"))
    assert out and os.path.exists(out)

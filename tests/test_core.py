import numpy as np
import pytest

from i3dr_stereo_tpu.core.camera import CameraModel, StereoRig, calc_q


def test_ideal_camera():
    cam = CameraModel.ideal(640, 480, 580.0)
    assert cam.fx == 580.0
    assert cam.cx == 320.0
    assert cam.Tx == 0.0
    cam.validate()


def test_rig_baseline_and_q():
    rig = StereoRig.synthetic(640, 480, fx=580.0, baseline_m=0.3)
    assert rig.baseline == pytest.approx(0.3)
    Q = rig.Q
    # reproject a known disparity: Z = fx * B / d
    d = 20.0
    w = Q[3, 2] * d + Q[3, 3]
    Z = Q[2, 3] / w
    assert Z == pytest.approx(580.0 * 0.3 / 20.0)


def test_q_matches_reference_formula():
    # disparity_to_depth.cpp:62-85: T = -P_r(0,3)/fx
    rig = StereoRig.synthetic(100, 80, fx=100.0, baseline_m=0.5)
    Q = calc_q(rig.left, rig.right)
    assert Q[3, 2] == pytest.approx(1.0 / 0.5)
    assert Q[2, 3] == pytest.approx(100.0)
    assert Q[0, 3] == pytest.approx(-50.0)  # -cx


def test_yaml_roundtrip(tmp_path):
    rig = StereoRig.synthetic(64, 48)
    import yaml

    p = tmp_path / "left.yaml"
    p.write_text(yaml.safe_dump(rig.left.to_dict()))
    cam2 = CameraModel.from_yaml(str(p))
    np.testing.assert_allclose(cam2.K, rig.left.K)
    np.testing.assert_allclose(cam2.P, rig.left.P)
    assert cam2.width == 64


def test_depth_disparity_inverse():
    rig = StereoRig.synthetic()
    z = 2.5
    assert rig.disparity_to_depth(rig.depth_to_disparity(z)) == pytest.approx(z)

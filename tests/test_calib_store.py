import numpy as np

from i3dr_stereo_tpu.bridge.graph import Graph
from i3dr_stereo_tpu.core.camera import StereoRig
from i3dr_stereo_tpu.io.calib_store import CalibrationStore, CameraInfoPublisherNode


def test_store_roundtrip(tmp_path):
    store = CalibrationStore(str(tmp_path))
    rig = StereoRig.synthetic(64, 48, fx=123.0, baseline_m=0.25)
    store.save_rig("phobos", rig)
    assert store.exists("phobos_left")
    assert sorted(store.list()) == ["phobos_left", "phobos_right"]
    rig2 = store.load_rig("phobos")
    np.testing.assert_allclose(rig2.left.K, rig.left.K)
    assert rig2.baseline == rig.baseline


def test_camera_info_publisher():
    g = Graph()
    rig = StereoRig.synthetic(32, 24)
    CameraInfoPublisherNode(g, rig.left, "/stereo/left")
    infos = []
    g.subscribe("/stereo/left/camera_info", lambda s, d: infos.append((s, d)))
    g.publish("/stereo/left/image_raw", 1.25, np.zeros((24, 32)))
    assert len(infos) == 1
    stamp, msg = infos[0]
    assert stamp == 1.25 and msg["stamp"] == 1.25
    assert msg["image_width"] == 32
    assert len(msg["camera_matrix"]["data"]) == 9

"""End-to-end graph tests: the reference's node/topic/service surface."""

import os

import numpy as np
import pytest

from i3dr_stereo_tpu.bridge.graph import Graph
from i3dr_stereo_tpu.bridge.launch import (
    launch_replay,
    launch_stereo_camera,
    launch_stereo_matcher,
    run_source,
)
from i3dr_stereo_tpu.bridge.nodes import (
    CameraControlNode,
    CropByDisparityNode,
    DisparityToDepthNode,
    RectifyNode,
    TriggerNode,
    warmup_matchers,
)
from i3dr_stereo_tpu.bridge.reconfigure import (
    DISPARITY_SCHEMA,
    ReconfigureServer,
    apply_flat_params,
)
from i3dr_stereo_tpu.bridge.services import (
    SaveRectifiedRequest,
    SaveStereoRequest,
    SetIntRequest,
)
from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
from i3dr_stereo_tpu.core.camera import StereoRig
from i3dr_stereo_tpu.io.savers import load_ply
from i3dr_stereo_tpu.io.sources import SyntheticStereoSource, record_pairs
from i3dr_stereo_tpu.io.synthetic import layered_scene


def _rig(w=96, h=80):
    return StereoRig.synthetic(w, h, fx=100.0, baseline_m=0.3)


def _small_cfg():
    return ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=16,
                                                      speckle_size=20)


def test_full_graph_synthetic_stream(tmp_path):
    rig = _rig()
    src = SyntheticStereoSource(width=96, height=80, n_frames=3, max_disp=12)
    lg = launch_stereo_camera(rig, stereo_algorithm=Algorithm.SGBM,
                              source=src, config=_small_cfg(),
                              rectify_inputs=False, warmup=False)
    got = {}
    lg.graph.subscribe("/stereo/disparity", lambda s, d: got.setdefault("disp", []).append(d))
    lg.graph.subscribe("/stereo/depth", lambda s, d: got.setdefault("depth", []).append(d))
    n = run_source(lg)
    assert n == 3
    assert len(got["disp"]) == 3
    assert len(got["depth"]) == 3
    node = lg.node("generate_disparity")
    assert node.frames_processed == 3

    # disparity accuracy against the source's ground truth
    sc = src.scene(0)
    d = got["disp"][0]["disparity"]
    v = got["disp"][0]["valid"] & sc.valid
    assert np.median(np.abs(d - sc.disparity)[v]) < 0.5

    # save_stereo service writes everything
    resp = lg.graph.call("/stereo/save_stereo",
                         SaveStereoRequest(folderpath=str(tmp_path)))
    assert resp.ok
    for key in ("left_raw", "left_rect", "disparity", "points"):
        assert key in resp.paths and os.path.exists(resp.paths[key])
    xyz, rgb = load_ply(resp.paths["points"])
    assert xyz.shape[1] == 3 and len(xyz) > 100


def test_reconfigure_changes_algorithm():
    rig = _rig()
    lg = launch_stereo_matcher(rig, stereo_algorithm=Algorithm.SGBM,
                               config=_small_cfg(), rectify_inputs=False,
                               warmup=False)
    node = lg.node("generate_disparity")
    # hot-swap to BM via the reference's enum (parameterCallback analog)
    node.disparity_cfg.update(stereo_algorithm=int(Algorithm.BM), p2=800.0)
    assert node.pipeline.config.algorithm == Algorithm.BM
    sc = layered_scene(80, 96, max_disp=12)
    lg.graph.publish("/stereo/left/image_raw", 0.0, sc.left)
    lg.graph.publish("/stereo/right/image_raw", 0.0, sc.right)
    assert node.frames_processed == 1


def test_reconfigure_init_preserves_node_config():
    """Constructing the node must NOT round-trip its config through the
    schema (regression: float speckle_range 0.5 was int-coerced to 0 and
    the engine speckle-filtered away every pixel; depth_max was clamped
    to the GUI range; num_directions 4 became 5)."""
    rig = _rig()
    cfg = ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(disparity_range=16)
    from i3dr_stereo_tpu.config.params import PointCloudConfig

    lg = launch_stereo_matcher(rig, stereo_algorithm=Algorithm.I3DRSGM,
                               config=cfg, rectify_inputs=False,
                               cloud=PointCloudConfig(depth_max=200.0,
                                                      depth_min=1.0),
                               warmup=False)
    node = lg.node("generate_disparity")
    assert node.pipeline.config.speckle_range == 0.5
    assert node.pipeline.config.num_directions == 4
    assert node.pipeline.cloud.depth_max == 200.0
    # a later single-key update must not disturb unrelated fields either
    node.disparity_cfg.update(p1=0.2)
    assert node.pipeline.config.p1 == 0.2
    assert node.pipeline.config.speckle_range == 0.5
    assert node.pipeline.config.num_directions == 4


def test_reconfigure_clamps_to_schema():
    rs = ReconfigureServer(DISPARITY_SCHEMA)
    vals = rs.update(disparity_range=5000, prefilter_cap=99)
    assert vals["disparity_range"] == 2056
    assert vals["prefilter_cap"] == 63
    cfg = apply_flat_params(ALGORITHM_DEFAULTS[Algorithm.SGBM], vals)
    assert cfg.disparity_range == 2064  # sanitize: rounded up to x16


def test_rectify_node_and_service(tmp_path):
    g = Graph()
    rig = _rig()
    RectifyNode(g, rig, namespace="/stereo")
    got = []
    g.subscribe("/stereo/left/image_rect", lambda s, d: got.append(d))
    sc = layered_scene(80, 96, max_disp=12)
    g.publish("/stereo/left/image_raw", 0.0, sc.left)
    g.publish("/stereo/right/image_raw", 0.0, sc.right)
    assert len(got) == 1
    np.testing.assert_allclose(got[0], sc.left, atol=1e-2)  # identity rig
    resp = g.call("/stereo/save_rectified",
                  SaveRectifiedRequest(folderpath=str(tmp_path)))
    assert resp.ok and os.path.exists(resp.paths["left"])


def test_disparity_to_depth_node():
    g = Graph()
    rig = _rig()
    DisparityToDepthNode(g, rig, depth_max=100.0)
    got = {}
    g.subscribe("/stereo/depth", lambda s, d: got.setdefault("depth", d))
    g.subscribe("/stereo/points2", lambda s, d: got.setdefault("pts", d))
    d = np.full((80, 96), 10.0, np.float32)
    v = np.ones((80, 96), bool)
    g.publish("/stereo/left/image_rect", 0.0, np.zeros((80, 96), np.float32))
    g.publish("/stereo/disparity", 0.0, {"disparity": d, "valid": v})
    np.testing.assert_allclose(got["depth"], 100.0 * 0.3 / 10.0, rtol=1e-5)
    assert got["pts"]["xyz"].shape == (80 * 96, 3)


def test_disparity_to_depth_node_stamp_sync():
    """Out-of-order rect delivery must pair clouds by stamp, not by
    last-received rect (reference: 3-way ApproximateTime sync,
    disparity_to_depth.cpp:55-57)."""
    g = Graph()
    rig = _rig()
    DisparityToDepthNode(g, rig, depth_max=100.0, slop=0.05)
    clouds = []
    g.subscribe("/stereo/points2", lambda s, d: clouds.append((s, d)))
    H, W = 80, 96
    v = np.ones((H, W), bool)
    # rect for frames arrive first: t=0 black, t=1 white
    g.publish("/stereo/left/image_rect", 0.0, np.zeros((H, W), np.float32))
    g.publish("/stereo/left/image_rect", 1.0, np.full((H, W), 255.0, np.float32))
    # disparity frames arrive late but must pair with their own stamps
    g.publish("/stereo/disparity", 0.0,
              {"disparity": np.full((H, W), 10.0, np.float32), "valid": v})
    g.publish("/stereo/disparity", 1.0,
              {"disparity": np.full((H, W), 10.0, np.float32), "valid": v})
    assert len(clouds) == 2
    (s0, c0), (s1, c1) = clouds
    assert (s0, s1) == (0.0, 1.0)
    # cloud colors come from the SAME-stamp rect, not the latest one
    assert c0["rgb"].max() == 0
    assert c1["rgb"].min() > 0


def test_crop_node_is_lazy():
    g = Graph()
    node = CropByDisparityNode(g, namespace="/stereo")
    d = np.full((8, 8), 4.0, np.float32)
    v = np.ones((8, 8), bool)
    g.publish("/stereo/left/image_rect", 0.0, np.full((8, 8), 9.0, np.float32))
    g.publish("/stereo/disparity", 0.0, {"disparity": d, "valid": v})
    assert g.topic("/stereo/left/image_rect_disp_cropped").n_published == 0
    got = []
    g.subscribe("/stereo/left/image_rect_disp_cropped", lambda s, x: got.append(x))
    g.publish("/stereo/disparity", 0.0, {"disparity": d, "valid": v})
    assert len(got) == 1


def test_camera_control_services_and_laser_split():
    g = Graph()
    applied = []
    node = CameraControlNode(g, "12345", "/stereo/left", split_laser=True,
                             apply_fn=lambda s: applied.append(s))
    trig = TriggerNode(g)
    resp = g.call("/tiscam_12345_set_exposure", SetIntRequest(value=12000))
    assert resp.ok and node.settings.exposure == 12000
    resp = g.call("/tiscam_12345_set_gain", SetIntRequest(value=9999))
    assert node.settings.gain == 480  # clamped
    node.reconf.update(Brightness=100)
    assert node.settings.brightness == 100

    routed = {"with": 0, "no": 0}
    g.subscribe("/stereo/left/image_raw_with_laser",
                lambda s, d: routed.__setitem__("with", routed["with"] + 1))
    g.subscribe("/stereo/left/image_raw_no_laser",
                lambda s, d: routed.__setitem__("no", routed["no"] + 1))
    img = np.zeros((4, 4))
    trig.fire(0.0, True)
    g.publish("/stereo/left/image_raw", 0.0, img)
    trig.fire(0.1, False)
    g.publish("/stereo/left/image_raw", 0.1, img)
    assert routed == {"with": 1, "no": 1}


def test_warmup_matchers():
    assert warmup_matchers(ALGORITHM_DEFAULTS[Algorithm.BM])


def test_replay_roundtrip(tmp_path):
    rig = _rig()
    src = SyntheticStereoSource(width=96, height=80, n_frames=2, max_disp=12)
    n = record_pairs(str(tmp_path), src.pairs())
    assert n == 2
    lg, run = launch_replay(rig, str(tmp_path), stereo_algorithm=Algorithm.SGBM,
                            config=_small_cfg(), rectify_inputs=False,
                            warmup=False)
    disp = []
    lg.graph.subscribe("/stereo/disparity", lambda s, d: disp.append(d))
    list(run)
    assert len(disp) == 2
    sc = src.scene(0)
    v = disp[0]["valid"] & sc.valid
    # uint8 quantization from the PNG roundtrip: allow a slightly looser median
    assert np.median(np.abs(disp[0]["disparity"] - sc.disparity)[v]) < 0.6


def test_match_failure_drops_frame_keeps_running():
    # generate_disparity.cpp:355-365 semantics: failure -> drop, continue
    rig = _rig()
    lg = launch_stereo_matcher(rig, config=_small_cfg(), rectify_inputs=False,
                               warmup=False)
    node = lg.node("generate_disparity")
    lg.graph.publish("/stereo/left/image_raw", 0.0, np.zeros((13,)))  # garbage
    lg.graph.publish("/stereo/right/image_raw", 0.0, np.zeros((13,)))
    assert node.frames_dropped == 1
    sc = layered_scene(80, 96, max_disp=12)
    lg.graph.publish("/stereo/left/image_raw", 1.0, sc.left)
    lg.graph.publish("/stereo/right/image_raw", 1.0, sc.right)
    assert node.frames_processed == 1


def test_bind_pipeline_live_tuning_no_retrace():
    """The operator loop's parameter path: a ReconfigureServer bound to a
    RUNNING StereoPipeline. Numeric tuning (p1/p2/uniqueness/depth_max)
    reuses the compiled step — zero re-traces (the reference rebuilds its
    engine per setter, I3DRSGM.cpp:630-654); a shape change re-jits."""
    from i3dr_stereo_tpu.bridge.reconfigure import bind_pipeline
    from i3dr_stereo_tpu.config.params import PointCloudConfig
    from i3dr_stereo_tpu.pipeline.stereo_pipeline import StereoPipeline

    rig = StereoRig.synthetic(96, 80, fx=120.0, baseline_m=0.3)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=32,
                                                     speckle_size=0)
    pipe = StereoPipeline(rig=rig, config=cfg,
                          cloud=PointCloudConfig(depth_max=15.0),
                          rectify_inputs=False, compute_points=False)
    srv = bind_pipeline(pipe)
    # server seeded from the pipeline, not schema defaults
    assert srv.get()["p1"] == pytest.approx(cfg.p1)

    sc = layered_scene(80, 96, max_disp=12)
    r1 = pipe.process(sc.left, sc.right)
    fn = next(iter(pipe._cache.values()))
    t0 = fn._cache_size()

    srv.update(p1=150.0, p2=1500.0, uniqueness_ratio=3.0, depth_max=8.0)
    assert pipe.config.p2 == 1500.0 and pipe.cloud.depth_max == 8.0
    r2 = pipe.process(sc.left, sc.right)
    assert len(pipe._cache) == 1 and fn._cache_size() == t0
    assert not np.array_equal(np.asarray(r2.disparity),
                              np.asarray(r1.disparity))

    srv.update(disparity_range=48)      # shape-affecting -> re-jit
    pipe.process(sc.left, sc.right)
    assert len(pipe._cache) == 2


def test_replay_clock_paced(tmp_path):
    """rosbag play -r analog (stereo_bag_capture.launch:35-38): rate>0
    paces publishes by recorded stamps / rate; wall-clock ~ span/rate."""
    import time

    rig = _rig()
    src = SyntheticStereoSource(width=96, height=80, n_frames=4, max_disp=12)
    record_pairs(str(tmp_path), src.pairs())

    def run_replay(rate):
        lg, run = launch_replay(rig, str(tmp_path), config=_small_cfg(),
                                rectify_inputs=False, warmup=False,
                                rate=rate, fps=1.0)
        t0 = time.monotonic()
        stamps = list(run)
        return time.monotonic() - t0, stamps

    wall_fast, stamps = run_replay(0.0)       # as-fast baseline (jit cost)
    span = stamps[-1] - stamps[0]             # recorded time span (3 s)
    assert span > 0
    # pick a rate whose pacing floor clearly exceeds the compute time, so
    # wall-clock ~ span/rate is attributable to pacing, not jit
    rate = span / (2.0 * wall_fast + 1.0)
    wall_paced, _ = run_replay(rate)
    assert wall_paced >= span / rate * 0.9    # paced to the stamp clock
    assert wall_fast < span / rate * 0.7      # and pacing caused it

"""The L6 mapping consumer: TSDF fusion fed by the cloud topic through
the launch_processing map_consumer hook (the reference's rtabmap/pcl
slot, stereo_processing.launch:88-122 — here exercised by a first-party
consumer instead of dangling)."""

import numpy as np

from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
from i3dr_stereo_tpu.core.camera import StereoRig
from i3dr_stereo_tpu.io.synthetic import layered_scene
from i3dr_stereo_tpu.mapping import TSDFVolume, make_map_consumer


def test_tsdf_integrates_flat_wall():
    vol = TSDFVolume(shape=(32, 32, 32), voxel_size=0.125,
                     origin=(-2.0, -2.0, 0.0))
    H, W = 64, 80
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32)
    depth = np.full((H, W), 2.0, np.float32)        # wall at z = 2 m
    for _ in range(3):
        vol.integrate(depth, K)
    assert vol.frames_integrated == 3
    pts = vol.occupied_points()
    assert len(pts) > 0
    # every near-surface voxel sits within a voxel of the true wall
    assert np.abs(pts[:, 2] - 2.0).max() <= 2 * 0.125
    # and weights accumulated across frames
    assert float(np.asarray(vol.weight).max()) >= 3.0
    occ = vol.occupancy_grid()
    assert occ.any()


def test_tsdf_pose_moves_surface():
    """A camera translated +0.5 m along z sees the wall 0.5 m closer;
    with the pose supplied, the fused surface stays at the WORLD z."""
    vol = TSDFVolume(shape=(32, 32, 32), voxel_size=0.125,
                     origin=(-2.0, -2.0, 0.0))
    H, W = 64, 80
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = -0.5                                   # world->cam: z_c = z_w - 0.5
    vol.integrate(np.full((H, W), 1.5, np.float32), K, T)
    pts = vol.occupied_points()
    assert len(pts) > 0
    assert np.abs(pts[:, 2] - 2.0).max() <= 2 * 0.125


def test_map_consumer_through_processing_graph():
    """End-to-end: stereo frames -> matcher graph -> points2 -> the
    map_consumer hook -> TSDF volume holding the scene's surfaces."""
    from i3dr_stereo_tpu.bridge.launch import launch_processing

    rig = StereoRig.synthetic(96, 80, fx=100.0, baseline_m=0.3)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=16,
                                                     speckle_size=0)
    vol = TSDFVolume(shape=(40, 40, 40), voxel_size=0.2,
                     origin=(-4.0, -4.0, 0.0))
    consumer = make_map_consumer(vol, rig)
    lg = launch_processing(rig, stereo_algorithm=Algorithm.SGBM,
                           config=cfg, rectify_inputs=False,
                           with_crop=False, warmup=False,
                           map_consumer=consumer)
    sc = layered_scene(80, 96, max_disp=12, background_disp=8)
    for t in (0.0, 0.2):
        lg.graph.publish("/stereo/left/image_raw", t, sc.left)
        lg.graph.publish("/stereo/right/image_raw", t, sc.right)
    assert vol.frames_integrated == 2
    pts = vol.occupied_points()
    assert len(pts) > 0
    # background plane: Z = fx * B / d = 100 * 0.3 / 8 = 3.75 m must be
    # among the fused surfaces
    z = pts[:, 2]
    assert (np.abs(z - 3.75) < 0.45).any()
    # nothing fused beyond the deepest true surface + truncation
    assert z.max() <= 3.75 + 3 * 0.2 + 0.2

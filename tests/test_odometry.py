"""Depth odometry (projective point-to-plane ICP) — the pose source for
the mapping consumer (reference: rtabmap's odometry role,
launch/stereo_processing.launch:88-102)."""

import numpy as np
import pytest

from i3dr_stereo_tpu.mapping.odometry import (
    DepthOdometry,
    _se3_exp,
    estimate_motion,
    render_plane_depth,
)
from i3dr_stereo_tpu.mapping.tsdf import TSDFVolume

H, W = 120, 160
K = np.array([[140.0, 0.0, 80.0], [0.0, 140.0, 60.0], [0.0, 0.0, 1.0]],
             np.float32)

# a geometry-rich room patch: back wall + two tilted surfaces + a box
# face, so all 6 DoF are observable (fronto-parallel planes alone leave
# x/y translation unconstrained in point-to-plane)
SCENE = [
    ((0.0, 0.0, 3.0), (0.0, 0.0, -1.0), (3.0, 3.0, 0.01)),       # back wall
    ((-1.0, 0.0, 2.2), (1.0, 0.0, -0.7), (0.6, 1.6, 0.7)),       # tilted left
    ((0.0, 0.9, 2.0), (0.0, -1.0, -0.4), (1.8, 0.5, 0.9)),       # tilted floor
    ((0.45, -0.25, 1.6), (0.0, 0.0, -1.0), (0.35, 0.25, 0.01)),  # near box
]


def _pose(tx=0.0, ty=0.0, tz=0.0, rx=0.0, ry=0.0, rz=0.0):
    T = np.asarray(_se3_exp(np.array([rx, ry, rz, tx, ty, tz],
                                     np.float32)))
    return T.astype(np.float32)


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))


def test_se3_exp_basics():
    np.testing.assert_allclose(np.asarray(_se3_exp(np.zeros(6))), np.eye(4),
                               atol=1e-7)
    T = np.asarray(_se3_exp(np.array([0.0, 0.0, 0.0, 0.1, -0.2, 0.3])))
    np.testing.assert_allclose(T[:3, 3], [0.1, -0.2, 0.3], atol=1e-7)
    T = np.asarray(_se3_exp(np.array([0.0, 0.0, np.pi / 2, 0, 0, 0])))
    np.testing.assert_allclose(T[:3, :3],
                               [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)


def test_render_plane_depth_sanity():
    d = render_plane_depth(K, np.eye(4), SCENE, H, W)
    assert (d > 0).mean() > 0.9            # scene covers the frame
    # the near box is nearer than the wall behind it
    assert abs(d[60, 110] - 1.6) < 0.05


@pytest.mark.parametrize("motion", [
    dict(tx=0.03),
    dict(tz=0.05),
    dict(ry=np.radians(1.5)),
    dict(tx=0.02, ty=-0.015, tz=0.03, rx=np.radians(0.8),
         ry=np.radians(-1.0), rz=np.radians(0.5)),
])
def test_estimate_motion_recovers_pose(motion):
    T_wc2 = _pose(**motion)               # camera 2 pose in world
    d1 = render_plane_depth(K, np.eye(4), SCENE, H, W)
    d2 = render_plane_depth(K, T_wc2, SCENE, H, W)
    # ground truth mapping cur-frame points -> prev frame: inv(I) @ T_wc2
    T_pc, diag = estimate_motion(d1, d2, K)
    terr = np.linalg.norm(T_pc[:3, 3] - T_wc2[:3, 3])
    rerr = _rot_err_deg(T_pc[:3, :3], T_wc2[:3, :3])
    assert terr < 0.005, (terr, diag)      # < 5 mm
    assert rerr < 0.25, (rerr, diag)       # < 0.25 deg
    assert diag["inlier_frac"] > 0.3


def test_trajectory_ate_under_one_voxel():
    """8-pose sweep; absolute trajectory error of the composed odometry
    must stay below one TSDF voxel (5 cm)."""
    rng = np.random.default_rng(7)
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(7):
        step = _pose(tx=0.025 + rng.normal(0, 0.004),
                     ty=rng.normal(0, 0.004),
                     tz=0.02 + rng.normal(0, 0.004),
                     ry=np.radians(0.7 + rng.normal(0, 0.1)),
                     rx=np.radians(rng.normal(0, 0.1)))
        poses.append((poses[-1] @ step).astype(np.float32))

    odo = DepthOdometry(K=K)
    est = []
    for T_wc in poses:
        d = render_plane_depth(K, T_wc, SCENE, H, W)
        est.append(odo.track(d).copy())
    ate = [np.linalg.norm(e[:3, 3] - g[:3, 3]) for e, g in zip(est, poses)]
    assert max(ate) < 0.05, ate
    rerrs = [_rot_err_deg(e[:3, :3], g[:3, :3]) for e, g in zip(est, poses)]
    assert max(rerrs) < 1.0, rerrs


def test_map_from_estimated_poses_matches_gt_map():
    """TSDF fused with ICP poses ~= TSDF fused with ground-truth poses
    (the mapping story for a MOVING rig)."""
    poses = [np.eye(4, dtype=np.float32)]
    for i in range(5):
        poses.append((poses[-1] @ _pose(tx=0.03, tz=0.025,
                                        ry=np.radians(0.8))).astype(np.float32))
    depths = [render_plane_depth(K, T, SCENE, H, W) for T in poses]

    def fuse(pose_list):
        vol = TSDFVolume(shape=(64, 64, 64), voxel_size=0.08,
                         origin=(-2.0, -2.0, 0.0))
        for d, T_wc in zip(depths, pose_list):
            T_cw = np.linalg.inv(T_wc).astype(np.float32)
            vol.integrate(d, K, T_cw)
        return vol

    odo = DepthOdometry(K=K)
    est = [odo.track(d).copy() for d in depths]

    occ_gt = fuse(poses).occupancy_grid()
    occ_est = fuse(est).occupancy_grid()
    inter = (occ_gt & occ_est).sum()
    union = (occ_gt | occ_est).sum()
    assert union > 0
    assert inter / union > 0.8, inter / union

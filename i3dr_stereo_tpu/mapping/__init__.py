"""Mapping consumers for the /points2 hook (reference: rtabmap + pcl,
launch/stereo_processing.launch:88-122)."""

from i3dr_stereo_tpu.mapping.odometry import (
    DepthOdometry,
    estimate_motion,
    render_plane_depth,
)
from i3dr_stereo_tpu.mapping.tsdf import TSDFVolume, make_map_consumer

__all__ = ["TSDFVolume", "make_map_consumer", "DepthOdometry",
           "estimate_motion", "render_plane_depth"]

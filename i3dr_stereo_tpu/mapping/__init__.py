"""Downstream mapping consumers for the cloud topic (the reference's
stereo_processing.launch:88-122 rtabmap/pcl slot, made first-party)."""

from i3dr_stereo_tpu.mapping.tsdf import TSDFVolume, make_map_consumer

__all__ = ["TSDFVolume", "make_map_consumer"]

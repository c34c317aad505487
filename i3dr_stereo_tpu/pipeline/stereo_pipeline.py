"""The fused stereo pipeline: rectify -> match -> depth -> cloud, one jit.

This replaces the reference's process-per-stage ROS graph — four OS
processes connected by TCPROS topics (generate_disparity + rectify +
disparity_to_depth + crop_image_by_disparity, launch/stereo_matcher.launch:
145-206) — with a single compiled XLA program per batch of frames:

- rectification maps are precomputed once per calibration (the reference
  recomputes them per frame, generate_disparity.cpp:379-383),
- the matcher is selected by the same algorithm enum,
- the depth_max/depth_min -> disparity clamp applied by the reference
  before publishing (generate_disparity.cpp:449-452) is fused in,
- depth image, point cloud and the disparity-masked crop are optional
  fused outputs (the reference's crop node is lazy,
  crop_image_by_disparity.cpp:91 — here unneeded outputs are simply
  dead-code-eliminated by XLA when disabled).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from i3dr_stereo_tpu.config.params import MatcherConfig, PointCloudConfig
from i3dr_stereo_tpu.core.camera import StereoRig
from i3dr_stereo_tpu.core.frame import to_mono_f32
from i3dr_stereo_tpu.matchers.base import MatchResult
from i3dr_stereo_tpu.matchers.registry import MATCHER_REGISTRY
from i3dr_stereo_tpu.ops.depth import (
    crop_by_disparity,
    disparity_to_depth,
    disparity_to_pointcloud,
)
from i3dr_stereo_tpu.ops.rectify import RectifyMap, make_rectify_map, remap

MISSING_Z = 10000.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PipelineResult:
    """Everything the reference publishes, in one pytree."""

    rect_left: jax.Array            # (..., H, W) float32
    rect_right: jax.Array
    disparity: jax.Array            # absolute pixels, float32
    valid: jax.Array                # bool
    depth: Optional[jax.Array] = None      # metres, 0 where invalid
    depth_valid: Optional[jax.Array] = None
    points: Optional[dict] = None          # {"xyz","valid","rgb"} flattened
    cropped_left: Optional[jax.Array] = None

    def disparity_missing_z(self) -> jax.Array:
        return jnp.where(self.valid, self.disparity, MISSING_Z)


@dataclasses.dataclass
class StereoPipeline:
    """Host-side facade holding calibration-derived constants + jit cache."""

    rig: StereoRig
    config: MatcherConfig
    cloud: PointCloudConfig = dataclasses.field(default_factory=PointCloudConfig)
    interpolation: str = "cubic"
    compute_depth: bool = True
    compute_points: bool = True
    compute_crop: bool = False
    rectify_inputs: bool = True

    def __post_init__(self):
        self.config = self.config.sanitize()
        if self.rectify_inputs:
            self._lmap = make_rectify_map(self.rig.left, interpolation=self.interpolation)
            self._rmap = make_rectify_map(self.rig.right, interpolation=self.interpolation)
        else:
            self._lmap = self._rmap = None
        self._Q = jnp.asarray(self.rig.Q, dtype=jnp.float32)
        self._cache = {}

    # -- live reconfigure ------------------------------------------------------
    def update_config(self, **kw) -> None:
        self.config = self.config.replace(**kw)
        self._cache.clear()

    def update_cloud(self, **kw) -> None:
        self.cloud = dataclasses.replace(self.cloud, **kw)
        self._cache.clear()

    def set_rig(self, rig: StereoRig) -> None:
        self.rig = rig
        self.__post_init__()

    # -- the fused step --------------------------------------------------------
    def _build(self):
        cfg = self.config
        cloud = self.cloud
        lmap, rmap, Q = self._lmap, self._rmap, self._Q
        impl = MATCHER_REGISTRY[cfg.algorithm]
        rig_fx = self.rig.fx
        rig_T = self.rig.baseline
        want_depth = self.compute_depth
        want_points = self.compute_points
        want_crop = self.compute_crop

        def step(left, right):
            l = to_mono_f32(left)
            r = to_mono_f32(right)
            if lmap is not None:
                l = remap(l, lmap)
                r = remap(r, rmap)
            res: MatchResult = impl(l, r, cfg)
            disp, valid = res.disparity, res.valid

            # depth-range -> disparity clamp (generate_disparity.cpp:449-452):
            # disparities implying Z outside [depth_min, depth_max] are missing
            if cloud.depth_max > 0:
                min_disp_from_depth = rig_fx * rig_T / cloud.depth_max
                valid = valid & (disp >= min_disp_from_depth)
            if cloud.depth_min > 0:
                max_disp_from_depth = rig_fx * rig_T / max(cloud.depth_min, 1e-6)
                valid = valid & (disp <= max_disp_from_depth)

            depth = depth_valid = points = cropped = None
            if want_depth:
                depth, depth_valid = disparity_to_depth(
                    disp, valid, Q, cloud.depth_min, cloud.depth_max)
            if want_points:
                if disp.ndim == 2:
                    points = disparity_to_pointcloud(
                        disp, valid, Q, l, cloud.depth_min, cloud.depth_max)
                else:
                    points = jax.vmap(
                        lambda d, v, g: disparity_to_pointcloud(
                            d, v, Q, g, cloud.depth_min, cloud.depth_max)
                    )(disp, valid, l)
            if want_crop:
                cropped = crop_by_disparity(l, disp, valid)
            return PipelineResult(
                rect_left=l, rect_right=r, disparity=disp, valid=valid,
                depth=depth, depth_valid=depth_valid, points=points,
                cropped_left=cropped)

        return jax.jit(step)

    def process(self, left, right) -> PipelineResult:
        left = jnp.asarray(left)
        right = jnp.asarray(right)
        key = (left.shape, str(left.dtype),
               dataclasses.astuple(self.config), dataclasses.astuple(self.cloud))
        fn = self._cache.get(key)
        if fn is None:
            fn = self._build()
            self._cache[key] = fn
        return fn(left, right)

    __call__ = process

"""Disparity -> depth image, point cloud, and disparity-masked crop.

Replaces three reference nodes with fused vectorized ops:

- ``disparity_to_depth`` node's per-pixel scalar loop
  (disparity_to_depth.cpp:150-205): w = q32 d + q33, X = (x + q03)/w,
  Y = (y + q13)/w, Z = q23/w, filtering d == 0, d == nodata, w <= 0 and
  Z outside [depth_min, depth_max].
- its PointCloud2 assembly (disparity_to_depth.cpp:224-227) — here a
  fixed-shape (N, 3) float32 array + valid mask (+ optional (N, 3) rgb),
  compacted on the host only when saving.
- ``crop_image_by_disparity`` node (crop_image_by_disparity.cpp:49-75):
  mask the rectified left image to pixels with valid disparity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MISSING_Z = 10000.0  # reference invalid-disparity marker (generate_disparity.cpp:449-452)


@jax.jit
def disparity_to_depth(disp: jax.Array, valid: jax.Array, Q: jax.Array,
                       depth_min: float | jax.Array = 0.0,
                       depth_max: float | jax.Array = 10.0,
                       ) -> tuple[jax.Array, jax.Array]:
    """(…, H, W) disparity -> (depth_m, valid).

    Q is the 4x4 reprojection matrix (core.camera.calc_q). Invalid or
    out-of-range pixels get depth 0 (the reference publishes 0 there —
    32FC1 convention of the depth topic).
    """
    q23 = Q[2, 3]
    q32, q33 = Q[3, 2], Q[3, 3]
    w = q32 * disp + q33
    ok = valid & (disp != 0.0) & (jnp.abs(disp) < MISSING_Z) & (w > 0.0)
    z = jnp.where(ok, q23 / jnp.where(w == 0, 1.0, w), 0.0)
    ok = ok & (z >= depth_min) & (z <= depth_max)
    return jnp.where(ok, z, 0.0), ok


@jax.jit
def disparity_to_pointcloud(disp: jax.Array, valid: jax.Array, Q: jax.Array,
                            rgb: jax.Array | None = None,
                            depth_min: float | jax.Array = 0.0,
                            depth_max: float | jax.Array = 10.0,
                            ) -> dict:
    """(H, W) disparity -> fixed-size point cloud dict.

    Returns {"xyz": (H*W, 3) f32, "valid": (H*W,) bool, "rgb": (H*W, 3)}
    — static shapes on device; host compacts on save (io.ply).
    """
    H, W = disp.shape[-2], disp.shape[-1]
    q03, q13, q23 = Q[0, 3], Q[1, 3], Q[2, 3]
    q32, q33 = Q[3, 2], Q[3, 3]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    w = q32 * disp + q33
    ok = valid & (disp != 0.0) & (jnp.abs(disp) < MISSING_Z) & (w > 0.0)
    wsafe = jnp.where(w == 0, 1.0, w)
    X = (xs + q03) / wsafe
    Y = (ys + q13) / wsafe
    Z = q23 / wsafe
    ok = ok & (Z >= depth_min) & (Z <= depth_max)
    xyz = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(jnp.float32)
    out = {"xyz": xyz, "valid": ok.reshape(-1)}
    if rgb is not None:
        if rgb.ndim == 2:  # mono -> grey rgb, like the reference's mono cloud
            rgb = jnp.stack([rgb] * 3, axis=-1)
        out["rgb"] = rgb.reshape(-1, 3)
    return out


@jax.jit
def crop_by_disparity(image: jax.Array, disp: jax.Array, valid: jax.Array) -> jax.Array:
    """Mask image to pixels with valid disparity (d < 10000 semantics of
    crop_image_by_disparity.cpp:49-75); invalid pixels -> 0."""
    ok = valid & (jnp.abs(disp) < MISSING_Z)
    if image.ndim == disp.ndim + 1:  # color
        ok = ok[..., None]
    return jnp.where(ok, image, 0).astype(image.dtype)


def pointcloud_to_numpy(pc: dict) -> tuple[np.ndarray, np.ndarray | None]:
    """Host-side compaction: drop invalid points (for PLY export)."""
    xyz = np.asarray(pc["xyz"])
    valid = np.asarray(pc["valid"])
    rgb = np.asarray(pc["rgb"]) if "rgb" in pc else None
    xyz = xyz[valid]
    rgb = rgb[valid] if rgb is not None else None
    return xyz, rgb

"""Synthetic stereo scenes with analytic ground-truth disparity.

The reference has no test fixtures at all (SURVEY.md §4) — its only
offline evaluation is bag replay on recorded data. This module provides
the deterministic scenes the test-suite and benchmarks are built on:
layered fronto-parallel planes rendered into both views back-to-front,
so ground truth disparity (and its occlusion mask) is exact by
construction.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def _texture(rng: np.random.Generator, h: int, w: int, smooth: int = 2) -> np.ndarray:
    """Band-limited random texture in [30, 225] — matchable but natural."""
    t = rng.uniform(0.0, 1.0, (h, w))
    for _ in range(smooth):
        t = 0.25 * (np.roll(t, 1, 0) + np.roll(t, -1, 0)
                    + np.roll(t, 1, 1) + np.roll(t, -1, 1))
    t = (t - t.min()) / max(float(np.ptp(t)), 1e-9)
    return 30.0 + 195.0 * t


@dataclasses.dataclass
class SyntheticScene:
    left: np.ndarray          # (H, W) float32 [0,255]
    right: np.ndarray
    disparity: np.ndarray     # (H, W) float32 ground truth (left frame)
    occluded: np.ndarray      # (H, W) bool — true where right view lacks the match
    valid: np.ndarray         # in-image & unoccluded


def layered_scene(height: int = 120, width: int = 160, *,
                  background_disp: int = 8,
                  layers: int = 3,
                  max_disp: int = 24,
                  seed: int = 0) -> SyntheticScene:
    """Back-to-front render of textured rectangles at integer disparities.

    Every pixel's true disparity is exact; occlusions in the right view
    are tracked so accuracy metrics can exclude them (like standard
    stereo benchmarks do).
    """
    rng = np.random.default_rng(seed)
    H, W = height, width
    big = _texture(rng, H, W + max_disp + 1)

    left = np.empty((H, W), np.float32)
    right = np.empty((H, W), np.float32)
    # background at constant disparity d0: L(y,x) = T(y, x), R(y,x) = T(y, x+d0)
    d0 = background_disp
    left[:] = big[:, :W]
    right[:] = big[:, d0:W + d0]
    disp = np.full((H, W), float(d0), np.float32)
    # right-view z-buffer in right coords: which disparity occupies each right pixel
    rdisp = np.full((H, W), float(d0), np.float32)

    for i in range(layers):
        d = int(rng.integers(d0 + 2, max_disp + 1))
        lw = int(rng.integers(W // 6, W // 3))
        lh = int(rng.integers(H // 6, H // 3))
        x0 = int(rng.integers(max_disp + 2, W - lw - 2))
        y0 = int(rng.integers(2, H - lh - 2))
        tex = _texture(rng, lh, lw, smooth=1)
        # left view
        left[y0:y0 + lh, x0:x0 + lw] = tex
        disp[y0:y0 + lh, x0:x0 + lw] = d
        # right view: same surface shifted left by d
        rx0 = x0 - d
        right[y0:y0 + lh, rx0:rx0 + lw] = tex
        rdisp[y0:y0 + lh, rx0:rx0 + lw] = d

    # occlusion: left pixel (y, x) is visible in the right view iff the
    # right pixel (y, x - d) is occupied by the same disparity
    ys, xs = np.mgrid[0:H, 0:W]
    xr = xs - disp.astype(int)
    in_img = (xr >= 0) & (xr < W)
    xr_c = np.clip(xr, 0, W - 1)
    occluded = ~in_img | (rdisp[ys, xr_c] != disp)
    return SyntheticScene(
        left=left.astype(np.float32),
        right=right.astype(np.float32),
        disparity=disp,
        occluded=occluded,
        valid=~occluded,
    )


def slanted_scene(height: int = 120, width: int = 160, *,
                  d_near: float = 20.0, d_far: float = 6.0,
                  seed: int = 1) -> SyntheticScene:
    """A single slanted plane: disparity varies linearly across x, with
    subpixel ground truth — exercises parabolic subpixel refinement.

    Rendered by sampling a continuous texture: L(y,x) = T(y, x),
    R(y,x) = T(y, x + d(x_r)) with linear interpolation.
    """
    rng = np.random.default_rng(seed)
    H, W = height, width
    pad = int(np.ceil(d_near)) + 2
    big = _texture(rng, H, W + 2 * pad, smooth=3)

    xs = np.arange(W)
    # disparity as a function of LEFT x
    disp = d_far + (d_near - d_far) * xs / max(W - 1, 1)
    disp2d = np.broadcast_to(disp, (H, W)).astype(np.float32)

    left = big[:, pad:pad + W].astype(np.float32)
    # right view: find for each right x the left x with x_l - d(x_l) = x_r.
    # With monotone mapping, invert numerically.
    xl_of_xr = np.interp(xs, xs - disp, xs)
    src = pad + xl_of_xr
    i0 = np.floor(src).astype(int)
    frac = src - i0
    right = (big[:, i0] * (1 - frac) + big[:, i0 + 1] * frac).astype(np.float32)

    occluded = np.zeros((H, W), bool)
    occluded[:, : int(np.ceil(d_near))] = True  # left strip has no right match
    return SyntheticScene(left=left, right=right, disparity=disp2d,
                          occluded=occluded, valid=~occluded)

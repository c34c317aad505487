"""Occlusion detection + interpolation.

Reference surface: the engine's "Occlusion Detection" /
"Interpolate Occlusions" switches (I3DRSGM.cpp:566-628; quick.param
"Occlusion Detector Step Size = 1.1", "Occlusion Interpolator Mode =
Percentile 10").

Detection here uses the geometric occlusion criterion on the disparity
map itself: left pixel x is occluded when some other left pixel x' > x
maps onto (or in front of) the same right-image column with a larger
disparity — i.e. the warped column x - d(x) is claimed by a nearer
surface. Computed as a right-image z-buffer via a segment-max scatter
(one pass, vectorized), no iterative region growing needed.

Interpolation of occluded pixels fills from the *background* side (the
standard convention: occluded area belongs to the far surface): a
horizontal scan takes the nearest valid disparity to the left/right and
keeps the smaller (farther) of the two — the "Percentile 10"-flavoured
conservative fill, expressed as a closed form instead of 32-direction
sampling.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1.0e9


@jax.jit
def detect_occlusions(disp: jax.Array, valid: jax.Array,
                      step: float = 1.1) -> jax.Array:
    """Return bool mask of occluded pixels (subset of currently-valid).

    disp: (B, H, W) absolute disparities. A pixel is occluded iff the
    right-image z-buffer at its warped column holds a disparity larger
    than its own by more than ``step`` (the detector step size).
    """
    B, H, W = disp.shape
    xr = jnp.arange(W)[None, None, :] - jnp.round(disp).astype(jnp.int32)
    in_img = (xr >= 0) & (xr < W)
    xr_c = jnp.clip(xr, 0, W - 1)
    d_eff = jnp.where(valid & in_img, disp, -BIG)
    # z-buffer: max disparity claiming each right column
    zbuf = jnp.full((B, H, W), -BIG)
    zbuf = jax.vmap(lambda z, i, d: z.at[jnp.arange(H)[:, None], i].max(d))(
        zbuf, xr_c, d_eff)
    winner = jnp.take_along_axis(zbuf, xr_c, axis=2)
    occluded = valid & in_img & (winner > disp + step)
    return occluded


def _nearest_valid_scan(disp, valid, reverse: bool):
    """Per row: nearest valid disparity at or before each x (or after,
    when reverse)."""
    d = jnp.where(valid, disp, jnp.nan)
    xs = jnp.moveaxis(d, -1, 0)
    if reverse:
        xs = xs[::-1]

    def step(carry, x):
        out = jnp.where(jnp.isnan(x), carry, x)
        return out, out

    init = jnp.full(xs.shape[1:], jnp.nan, dtype=disp.dtype)
    _, ys = jax.lax.scan(step, init, xs)
    if reverse:
        ys = ys[::-1]
    return jnp.moveaxis(ys, 0, -1)


@jax.jit
def fill_occlusions(disp: jax.Array, valid: jax.Array,
                    occluded: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Background fill of occluded pixels; returns (disp, valid) with
    occlusions replaced by the farther of the two nearest horizontal
    valid neighbours (and marked valid)."""
    ok = valid & ~occluded
    left_fill = _nearest_valid_scan(disp, ok, reverse=False)
    right_fill = _nearest_valid_scan(disp, ok, reverse=True)
    both = jnp.fmin(left_fill, right_fill)   # fmin ignores NaN sides
    fill = jnp.where(jnp.isnan(both), disp, both)
    out = jnp.where(occluded, fill, disp)
    newvalid = ok | (occluded & ~jnp.isnan(both))
    return out, newvalid

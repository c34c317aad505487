"""Half-pel disparity refinement — the subpix profile's extra pass.

The reference's subpix.param runs a final DSI pass with
``Disparity Step Size = 0.5`` and parabolic interpolation
("DSI Interpolator = Parabolic"). Equivalent here: around the current
disparity estimate, sample a small matching cost at half-pixel shifts
(right image linearly interpolated on device), then parabola over the
best triple. Cost is Birchfield–Tomasi on intensities (census is not
defined at half-pel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BIG = 1.0e9


def _sample_right(right: jax.Array, xsrc: jax.Array) -> jax.Array:
    """Linearly sample right (B, H, W) at fractional columns xsrc
    (B, H, W, K). Out-of-range clamped."""
    B, H, W = right.shape
    x0 = jnp.floor(xsrc)
    frac = xsrc - x0
    i0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    i1 = jnp.clip(i0 + 1, 0, W - 1)
    r0 = jnp.take_along_axis(right[:, :, :, None], i0, axis=2)
    r1 = jnp.take_along_axis(right[:, :, :, None], i1, axis=2)
    return r0 * (1.0 - frac) + r1 * frac


@partial(jax.jit, static_argnames=("steps", "step_size", "window"))
def halfpel_refine(left: jax.Array, right: jax.Array, disp: jax.Array,
                   valid: jax.Array, *, steps: int = 5, step_size: float = 0.5,
                   window: int = 3) -> jax.Array:
    """Refine disparity to half-pel: sample costs at
    disp + step_size * (k - steps//2), box-aggregate over a small window,
    parabola over the minimum. Returns the refined disparity.
    """
    B, H, W = left.shape
    K = steps
    offs = (jnp.arange(K, dtype=jnp.float32) - K // 2) * step_size
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
    xsrc = xs - (disp[..., None] + offs)
    samples = _sample_right(right, xsrc)             # (B, H, W, K)
    cost = jnp.abs(samples - left[..., None])
    if window > 1:
        r = window // 2
        p = jnp.pad(cost, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
        cost = jax.lax.reduce_window(p, 0.0, jax.lax.add,
                                     (1, window, window, 1), (1, 1, 1, 1),
                                     "VALID")
    in_img = (xsrc >= 0) & (xsrc <= W - 1)
    cost = jnp.where(in_img, cost, BIG)

    best = jnp.argmin(cost, axis=-1)
    cb = jnp.min(cost, axis=-1)
    bm = jnp.clip(best - 1, 0, K - 1)
    bp = jnp.clip(best + 1, 0, K - 1)
    cm = jnp.take_along_axis(cost, bm[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(cost, bp[..., None], axis=-1)[..., 0]
    denom = cm + cp - 2.0 * cb
    frac = jnp.where(denom > 1e-9, (cm - cp) / (2.0 * denom), 0.0)
    frac = jnp.clip(frac, -0.5, 0.5)
    interior = (best > 0) & (best < K - 1)
    delta = (best - K // 2 + jnp.where(interior, frac, 0.0)) * step_size
    refined = disp + delta
    return jnp.where(valid, refined, disp)

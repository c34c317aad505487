"""3x3 median filter (the engine's "Disparity Median Optimizer",
ini/quick.param:89-90, kernel 3x3) and cv::StereoSGBM's final medianBlur.

Vectorized over the whole image: the nine shifted copies are stacked and
reduced with jnp.sort along the stencil axis (XLA lowers this to a fixed
sorting network — no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stencil9(x: jax.Array) -> jax.Array:
    """(…, H, W) -> (…, H, W, 9) edge-padded 3x3 neighbourhoods."""
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(x, pad, mode="edge")
    H, W = x.shape[-2], x.shape[-1]
    vals = [p[..., dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)]
    return jnp.stack(vals, axis=-1)


@jax.jit
def median3x3(x: jax.Array) -> jax.Array:
    """(…, H, W) -> same shape, 3x3 median with edge-replicated borders."""
    s = jnp.sort(_stencil9(x), axis=-1)
    return s[..., 4]


@jax.jit
def median3x3_masked(x: jax.Array, valid: jax.Array) -> jax.Array:
    """Median that ignores invalid samples ("Nodata Policy = Ignore",
    ini/quick.param): invalid neighbours are replaced by the centre value
    before the median, so they never influence it."""
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(x, pad, mode="edge")
    pv = jnp.pad(valid, pad, mode="constant", constant_values=False)
    H, W = x.shape[-2], x.shape[-1]
    vals = []
    for dy in range(3):
        for dx in range(3):
            nb = p[..., dy:dy + H, dx:dx + W]
            nv = pv[..., dy:dy + H, dx:dx + W]
            vals.append(jnp.where(nv, nb, x))
    s = jnp.sort(jnp.stack(vals, axis=-1), axis=-1)
    return s[..., 4]

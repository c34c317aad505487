"""Disparity-shifted gathers shared by all cost functions.

Pairs left pixel (y, x) with right pixel (y, x - d) for every d in
[min_disparity, min_disparity + D), as one ``take_along_axis`` gather
that XLA fuses into the consuming cost computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_disparity_shifted(right: jax.Array, min_disparity: int,
                             disparity_range: int) -> tuple[jax.Array, jax.Array]:
    """right: (B, H, W) or (B, H, W, F) -> (B, H, W, D[, F]) gathered + bool valid.

    valid[b, h, w, d] == True iff 0 <= w - (min_disparity + d) < W.
    Out-of-range taps are clamped (caller masks them via ``valid``).
    """
    has_feat = right.ndim == 4
    if not has_feat:
        right = right[..., None]
    B, H, W, F = right.shape
    D = disparity_range
    m = min_disparity

    w_idx = jnp.arange(W)[:, None]                  # (W, 1)
    d_idx = jnp.arange(D)[None, :] + m              # (1, D)
    src = w_idx - d_idx                             # (W, D)
    valid = (src >= 0) & (src < W)
    src_c = jnp.clip(src, 0, W - 1)

    # gather along the W axis: out[b,h,w,d,f] = right[b,h,src[w,d],f]
    idx = src_c[None, None, :, :, None]
    out = jnp.take_along_axis(right[:, :, :, None, :], idx, axis=2)
    valid_b = jnp.broadcast_to(valid[None, None, :, :], (B, H, W, D))
    if not has_feat:
        out = out[..., 0]
    return out, valid_b

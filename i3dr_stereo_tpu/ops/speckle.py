"""Speckle filtering: invalidate small disconnected disparity regions.

Equivalent of cv::filterSpeckles (used by the reference's BM/SGBM
backends via speckle_size/speckle_range, cfg/i3DR_Disparity.cfg:33-34)
and the engine's "Disparity Speckle Filter Max Difference = 0.5 / Max
Region Size = 100" (ini/quick.param:94-95).

TPU-native formulation: region growing is not expressible as a serial
flood fill under XLA, so connected components are found by iterative
min-label propagation with pointer-jumping (label doubling). Regions are
connected through 4-neighbour edges whose disparity difference is within
``max_diff``; components smaller than ``max_size`` are invalidated.
Pointer jumping makes convergence logarithmic in region diameter, and
speckle regions are by definition small (<= max_size pixels), so a fixed
iteration budget is exact for every region that can possibly be filtered
— larger regions may keep fragmented labels but can never fall below the
size threshold anyway (fragments of giant regions are still above it for
any sane budget; see tests for the oracle comparison vs cv2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _neighbor_shift(x: jax.Array, dy: int, dx: int, fill) -> jax.Array:
    pad = [(0, 0)] * x.ndim
    idx = [slice(None)] * x.ndim
    ay, ax_ = x.ndim - 2, x.ndim - 1
    H, W = x.shape[-2], x.shape[-1]
    pad[ay] = (max(dy, 0), max(-dy, 0))
    pad[ax_] = (max(dx, 0), max(-dx, 0))
    idx[ay] = slice(max(-dy, 0), max(-dy, 0) + H)
    idx[ax_] = slice(max(-dx, 0), max(-dx, 0) + W)
    return jnp.pad(x, pad, constant_values=fill)[tuple(idx)]


@partial(jax.jit, static_argnames=("max_size", "max_diff", "iters", "downsample"))
def speckle_filter(disp: jax.Array, valid: jax.Array, *,
                   max_size: int = 100, max_diff: float = 1.0,
                   iters: int = 16, downsample: int = 1) -> jax.Array:
    """Return the updated valid mask with speckles removed.

    disp: (H, W) or (B, H, W) float disparities; valid: same-shape bool.
    ``iters`` rounds of (4-neighbour min propagation + pointer jump).

    ``downsample`` > 1 runs the labeling on a strided subsample (size
    threshold scaled by downsample^2) and broadcasts the verdict back —
    ~downsample^2 x cheaper; regions near the threshold may be judged
    slightly differently (the reference engine similarly speckle-filters
    at pyramid scales, ini/quick.param per-level sections).
    """
    if max_size <= 0:
        return valid
    if downsample > 1:
        k = downsample
        dd = disp[..., ::k, ::k]
        vv = valid[..., ::k, ::k]
        keep_small = speckle_filter(dd, vv,
                                    max_size=max(max_size // (k * k), 1),
                                    max_diff=max_diff * k,
                                    iters=iters, downsample=1)
        rejected = vv & ~keep_small
        rej_full = jnp.repeat(jnp.repeat(rejected, k, axis=-2), k, axis=-1)
        rej_full = rej_full[..., :disp.shape[-2], :disp.shape[-1]]
        return valid & ~rej_full
    batched = disp.ndim == 3
    d = disp if batched else disp[None]
    v = valid if batched else valid[None]
    B, H, W = d.shape
    INF_LABEL = jnp.int32(H * W)

    flat_ids = (jnp.arange(H * W, dtype=jnp.int32).reshape(1, H, W)
                .repeat(B, axis=0))
    label = jnp.where(v, flat_ids, INF_LABEL)

    neigh = ((1, 0), (-1, 0), (0, 1), (0, -1))

    def connected(dd, vv):
        """Per-direction connectivity masks (static python tuple)."""
        masks = []
        for dy, dx in neigh:
            nd = _neighbor_shift(dd, dy, dx, jnp.inf)
            nv = _neighbor_shift(vv, dy, dx, False)
            masks.append(vv & nv & (jnp.abs(dd - nd) <= max_diff))
        return masks

    conn = connected(d, v)

    def body(_, lab):
        # min-label propagation over connected 4-neighbours
        for (dy, dx), m in zip(neigh, conn):
            nl = _neighbor_shift(lab, dy, dx, INF_LABEL)
            lab = jnp.where(m, jnp.minimum(lab, nl), lab)
        # pointer jump: label <- label[label]
        lab_flat = lab.reshape(B, H * W)
        safe = jnp.clip(lab_flat, 0, H * W - 1)
        jumped = jnp.take_along_axis(lab_flat, safe, axis=1)
        lab = jnp.where(lab_flat < INF_LABEL, jumped, lab_flat).reshape(B, H, W)
        return lab

    label = jax.lax.fori_loop(0, iters, body, label)

    # component sizes via scatter-add on root labels
    lab_flat = label.reshape(B, H * W)
    ones = jnp.where(lab_flat < INF_LABEL, 1, 0)
    safe = jnp.clip(lab_flat, 0, H * W - 1)
    counts = jnp.zeros((B, H * W), dtype=jnp.int32)
    counts = jax.vmap(lambda c, s, o: c.at[s].add(o))(counts, safe, ones)
    size = jnp.take_along_axis(counts, safe, axis=1).reshape(B, H, W)

    keep = v & (size > max_size)
    return keep if batched else keep[0]

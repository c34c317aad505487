"""Block-shift gather: the TPU replacement for per-pixel warp gathers.

The pyramid predictor needs two per-pixel gathers along image rows
(SURVEY.md §2.4, the "Predictor = Shift" schedule of ini/quick.param):

- warping the right image by the coarse prediction before the residual
  search (``rw[x] = r[x - pred(x)]``),
- the backmatching round trip (``d_at = disp[x - round(disp(x))]``,
  the engine's "Maximum Backmatching Distance", ini/quick.param:122).

``jnp.take_along_axis`` lowers to a scalar-core gather (~10 ns/elem —
52 ms per 5 MP image). This kernel exploits that predictions are
*locally* within a bounded band of a per-block anchor: for each
(8-row x 128-column) block with anchor q, it loads the source row once,
rotates it so lane l holds ``src[x - q]`` (one dynamic lane roll per
block), then resolves the per-pixel residual ``idx(x) - q`` — bounded
by ``radius`` — with static shifted selects. Per-pixel indices farther
than ``radius`` from the anchor are clamped to the band edge (callers
choose anchors so this never happens in-band: the residual search and
the backmatch displacement are both bounded by construction).

Out-of-image sources clamp to the edge pixel, matching the
``jnp.clip`` + gather semantics it replaces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 8


def _kernel(q_ref, src_ref, idx_ref, out_ref, *, radius, W_real, Wload, Wpad):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    ni = pl.num_programs(1)
    nj = pl.num_programs(2)
    q = q_ref[(b * ni + i) * nj + j]

    # lane l of the rotated window holds src[j*128 + l - q] (padded coords:
    # src_ref is left-padded by Wpad, so position p maps to ref lane p+Wpad)
    start = j * LANE - q - radius + Wpad
    start = jnp.clip(start, 0, Wload - 3 * LANE)
    aligned = pl.multiple_of((start // LANE) * LANE, LANE)
    off = start - aligned
    # 3 lanes-width: used indices reach 2*radius + 127 + off < 3*LANE
    win = src_ref[0, :, pl.ds(aligned, 3 * LANE)]
    win = pltpu.roll(win, 3 * LANE - off, axis=1)  # lane m == src[j*128 - q - radius + m]

    idx = idx_ref[0]
    res = jnp.clip(idx - q, -radius, radius)
    liota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANE), 1)
    xcol = j * LANE + liota
    out = jnp.zeros((ROWS, LANE), jnp.float32)
    for r in range(-radius, radius + 1):
        out = jnp.where(res == r, win[:, radius - r:radius - r + LANE], out)
    # edge clamp: src column x - idx outside [0, W_real)
    srcc = xcol - jnp.clip(idx - q, -radius, radius) - q
    first = src_ref[0, :, Wpad:Wpad + 1]
    last = src_ref[0, :, Wpad + W_real - 1:Wpad + W_real]
    out = jnp.where(srcc < 0, first, jnp.where(srcc >= W_real, last, out))
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def block_shift_gather(src: jax.Array, idx: jax.Array, q: jax.Array,
                       radius: int, *, interpret: bool = False) -> jax.Array:
    """out[b, y, x] = src[b, y, clip(x - clip(idx, q-radius, q+radius), 0, W-1)]

    src/idx: (B, H, W) float32/int32; q: (B, H//8, W//128) int32 block
    anchors. H must be a multiple of 8; W is padded internally.
    """
    B, H, W = src.shape
    assert H % ROWS == 0
    # the rotated 3-lane window must cover every used index:
    # 2*radius + 127 + off < 3*LANE with off < LANE
    assert 2 * radius + 2 * LANE - 1 < 3 * LANE, (
        f"radius {radius} exceeds the 3-lane window (max {LANE // 2 - 1}); "
        "widen the window before raising the clamp radius")
    Wp = (W + LANE - 1) // LANE * LANE
    # load window must fit for any clipped start: pad by radius+2 lanes both
    # sides (aligned 2*LANE reads + the anchor band)
    Wpad = (radius // LANE + 3) * LANE
    srcp = jnp.pad(src.astype(jnp.float32), ((0, 0), (0, 0), (Wpad, Wpad + Wp - W)),
                   mode="edge")
    Wload = srcp.shape[-1]
    idxp = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, 0), (0, Wp - W)))
    qf = q.reshape(-1)

    kern = functools.partial(_kernel, radius=radius, W_real=W, Wload=Wload,
                             Wpad=Wpad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // ROWS, Wp // LANE),
        in_specs=[pl.BlockSpec((1, ROWS, Wload), lambda b, i, j, qr: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, ROWS, LANE), lambda b, i, j, qr: (b, i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, ROWS, LANE), lambda b, i, j, qr: (b, i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Wp), jnp.float32),
        interpret=interpret,
    )(qf, srcp, idxp)
    return out[:, :, :W]


def block_anchors(pred_int: jax.Array) -> jax.Array:
    """Per-(8x128)-block anchor from a per-pixel prediction map: the
    median-smoothed prediction sampled at block centres (robust to
    depth edges, unlike a block mean)."""
    B, H, W = pred_int.shape
    Hb, Wb = H // ROWS, (W + LANE - 1) // LANE
    pp = jnp.pad(pred_int, ((0, 0), (0, 0), (0, Wb * LANE - W)), mode="edge")
    return pp[:, ROWS // 2::ROWS, LANE // 2::LANE]


def gather_along_rows_reference(src, idx):
    """XLA take_along_axis equivalent (CPU/tests)."""
    W = src.shape[-1]
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    col = jnp.clip(xs - idx.astype(jnp.int32), 0, W - 1)
    return jnp.take_along_axis(src, col, axis=2)

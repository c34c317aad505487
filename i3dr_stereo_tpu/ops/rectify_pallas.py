"""Banded Pallas remap — rectification without per-pixel gathers.

`ops.rectify.remap` expresses cv-style INTER_CUBIC remap as 16 flat
gathers. TPU gathers run on the scalar core at ~6.5 ns per index
(measured), so a 2448x2048 bicubic rectify costs ~690 ms — 25x the
whole matcher. But a rectification map is not an arbitrary gather: the
source coordinate is ``(y, x) + a smooth displacement``. This kernel
exploits that:

- per 8x128 output block, integer ANCHORS (ay, ax) absorb the bulk
  displacement; the source window the block needs is a (RB x 512)
  region assembled from a 2x2 mosaic of aligned blocks whose indices
  come from scalar prefetch — bounded DMA (~128 B in per output px),
  no gathers;
- the per-pixel RESIDUAL (source minus anchor-plus-local-offset) is
  bounded by the map's variation WITHIN one block (a pixel or two for
  real calibrations — the 8x128 block spans only ~5% of the image), so
  the taps x residual space collapses into a small set of CHANNELS:
  t = residual_y + tap_j, s = residual_x + tap_i;
- the interpolation becomes EXACT channel sums
      out[y, x] = sum_t sum_s WV[t](y,x) * WH[s](y,x) * win[r0+y+t, c0+x+s]
  where WV/WH are the cubic tap weights scattered into their channel
  slots at map-build time (host, once per calibration). Every term is a
  static row slice + lane roll of VMEM data — pure VPU FMAs.

Exactness: this is an algebraic regrouping of the separable stencil,
not an approximation — outputs match the gather path to float rounding
(tests assert <= 1e-3). Maps whose within-block variation exceeds the
channel budget (pathological warps; the generic-remap unit tests) are
detected at build time and fall back to the gather path.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
ROWS = 8
CB = 2 * LANE        # column block of the 2x2 mosaic window
MAX_CV = 32          # vertical channel budget (residual span + taps)
MAX_CH = 24          # horizontal channel budget


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandedRemap:
    """Channelized remap data for the Pallas kernel (see module doc)."""

    wv: jax.Array        # (CV, H8, W128) f32 vertical channel weights
    wh: jax.Array        # (CH, H8, W128) f32 horizontal channel weights
    ay: jax.Array        # (nblocks,) i32 padded-source row of channel 0
    ax: jax.Array        # (nblocks,) i32 padded-source col of channel 0
    bands: jax.Array     # (nblocks*3,) i32 per-block (tlo, thi, shi)
    out_h: int = dataclasses.field(metadata=dict(static=True))
    out_w: int = dataclasses.field(metadata=dict(static=True))


def build_banded(by: np.ndarray, bx: np.ndarray, wy: np.ndarray,
                 wx: np.ndarray, src_h: int, src_w: int,
                 pad: int) -> BandedRemap | None:
    """Channelize a remap (host, once). by/bx: (H, W) int top-left tap
    coords IN PADDED source space; wy/wx: (H, W, taps) tap weights.
    Returns None when the map's within-block variation exceeds the
    budget (fall back to the gather path)."""
    H, W = by.shape
    taps = wy.shape[-1]
    # the caller (make_rectify_map) clips tap origins into the padded
    # source; channelization silently mis-anchors if that contract is
    # broken, so enforce it here
    assert by.min() >= 0 and by.max() <= src_h + 2 * pad - taps, (
        int(by.min()), int(by.max()))
    assert bx.min() >= 0 and bx.max() <= src_w + 2 * pad - taps, (
        int(bx.min()), int(bx.max()))
    H8 = -(-H // ROWS) * ROWS
    W128 = -(-W // LANE) * LANE
    # the kernel pre-pads the source by (ROWS, LANE) at top/left so every
    # anchor is strictly positive (residual-relative coords can dip 7/127
    # below the pixel's own row/col); account for it here
    by = by + ROWS
    bx = bx + LANE

    def _pad_linear(a, d_row, d_col):
        """Extend coordinate maps into the tile-padding margin CONTINUING
        the identity slope (+1/row for y, +1/col for x): edge replication
        would freeze the coord while the local offset keeps growing,
        inflating the residual band by the margin width. The padded
        outputs are sliced away; their coords only need to stay in-band
        (the kernel's source slack rows/cols absorb the overhang)."""
        out = np.empty((H8, W128), a.dtype)
        out[:H, :W] = a
        if H8 > H:
            out[H:, :W] = a[H - 1:H, :] + \
                d_row * np.arange(1, H8 - H + 1)[:, None]
        if W128 > W:
            out[:, W:] = out[:, W - 1:W] + \
                d_col * np.arange(1, W128 - W + 1)[None, :]
        return out

    byp = _pad_linear(by, 1, 0)
    bxp = _pad_linear(bx, 0, 1)
    wyp = np.pad(wy, ((0, H8 - H), (0, W128 - W), (0, 0)), mode="edge")
    wxp = np.pad(wx, ((0, H8 - H), (0, W128 - W), (0, 0)), mode="edge")

    yl = np.arange(H8)[:, None] % ROWS
    xl = np.arange(W128)[None, :] % LANE
    nbr, nbc = H8 // ROWS, W128 // LANE

    def _block_min(a):
        return a.reshape(nbr, ROWS, nbc, LANE).min(axis=(1, 3))

    ay = _block_min(byp - yl)
    # ROWS-align the vertical anchor (the remainder moves into the
    # residual channels): every dynamic sublane index in the kernel is
    # then provably a multiple of 8, which Mosaic requires for vector
    # loads — costs at most +7 channels
    ay = (ay // ROWS) * ROWS
    ax = _block_min(bxp - xl)
    ay_up = np.repeat(np.repeat(ay, ROWS, 0), LANE, 1)
    ax_up = np.repeat(np.repeat(ax, ROWS, 0), LANE, 1)
    ry = byp - (ay_up + yl)
    rx = bxp - (ax_up + xl)
    cv = int(ry.max()) + taps
    ch = int(rx.max()) + taps
    if cv > MAX_CV or ch > MAX_CH:
        return None

    wv = np.zeros((cv, H8, W128), np.float32)
    wh = np.zeros((ch, H8, W128), np.float32)
    ii, jj = np.mgrid[0:H8, 0:W128]
    for j in range(taps):
        np.add.at(wv, (ry + j, ii, jj), wyp[..., j])
        np.add.at(wh, (rx + j, ii, jj), wxp[..., j])

    # per-block channel BANDS: the global cv/ch are worst-block figures;
    # most blocks populate a much narrower sub-band (their own local
    # variation + taps). The kernel skips channels outside
    # [tlo, thi) / [0, shi) per block — typically a 2-4x FLOP cut
    def _band(r, lo_needed):
        rb = r.reshape(nbr, ROWS, nbc, LANE)
        lo = rb.min(axis=(1, 3)).reshape(-1)
        hi = rb.max(axis=(1, 3)).reshape(-1) + taps
        return (lo if lo_needed else None), hi

    tlo, thi = _band(ry, True)
    _, shi = _band(rx, False)
    bands = np.stack([tlo, thi, shi], axis=1).reshape(-1)
    return BandedRemap(
        wv=jnp.asarray(wv), wh=jnp.asarray(wh),
        ay=jnp.asarray(ay.reshape(-1), jnp.int32),
        ax=jnp.asarray(ax.reshape(-1), jnp.int32),
        bands=jnp.asarray(bands, jnp.int32),
        out_h=H, out_w=W)


def _kernel(ay_ref, ax_ref, bands_ref, wv_ref, wh_ref, s00, s01, s10, s11,
            out_ref, win_ref, rot_ref, acc_ref, *, CV, CH, RB, nbc):
    i = pl.program_id(1)
    j = pl.program_id(2)
    blk = i * nbc + j

    # assemble the (2RB x 512) source window from the 2x2 aligned mosaic;
    # uint8 sources convert here, AFTER the DMA — the HBM traffic of the
    # mosaic is then 1/4 of the f32 formulation (values are identical:
    # u8 -> f32 is exact; Mosaic needs the i32 hop for the cast)
    def _f32(x):
        if x.dtype == jnp.float32:
            return x
        return x.astype(jnp.int32).astype(jnp.float32)

    win_ref[:RB, :CB] = _f32(s00[0])
    win_ref[:RB, CB:] = _f32(s01[0])
    win_ref[RB:, :CB] = _f32(s10[0])
    win_ref[RB:, CB:] = _f32(s11[0])

    # ay is ROWS-aligned at build; RB is a multiple of ROWS, so r0 is
    # provably 8-aligned (pl.multiple_of carries the proof to Mosaic)
    r0 = pl.multiple_of(ay_ref[blk] - (ay_ref[blk] // RB) * RB, ROWS)
    c0 = ax_ref[blk] - (ax_ref[blk] // CB) * CB      # in [0, CB)
    al = pl.multiple_of((c0 // LANE) * LANE, LANE)   # 0 or 128
    off = c0 - al

    # hoist the lane alignment out of the channel loop: one roll of the
    # row span this block needs, staged once; per channel the loop is
    # then a static slice + FMA only
    span = ((CV - 1) // ROWS + 2) * ROWS
    rot_ref[:span] = pltpu.roll(
        win_ref[pl.ds(r0, span), pl.ds(al, 3 * LANE)],
        3 * LANE - off, axis=1)

    # per-block channel band: channels outside it carry all-zero weights
    # — skip their work entirely (a scalar branch per t, far cheaper
    # than CH wasted FMAs). Narrow horizontal bands take a half-unrolled
    # inner loop; only the worst blocks pay the full CH sweep.
    tlo = bands_ref[3 * blk]
    thi = bands_ref[3 * blk + 1]
    shi = bands_ref[3 * blk + 2]
    acc_ref[:] = jnp.zeros((ROWS, LANE), jnp.float32)
    CH2 = max(1, (CH + 1) // 2)
    for t in range(CV):
        in_band = (t >= tlo) & (t < thi)
        seg = rot_ref[t:t + ROWS]
        wv_t = wv_ref[t]

        @pl.when(in_band & (shi <= CH2))
        def _(seg=seg, wv_t=wv_t):
            inner = jnp.zeros((ROWS, LANE), jnp.float32)
            for s in range(CH2):
                inner = inner + wh_ref[s] * seg[:, s:s + LANE]
            acc_ref[:] = acc_ref[:] + wv_t * inner

        @pl.when(in_band & (shi > CH2))
        def _(seg=seg, wv_t=wv_t):
            inner = jnp.zeros((ROWS, LANE), jnp.float32)
            for s in range(CH):
                inner = inner + wh_ref[s] * seg[:, s:s + LANE]
            acc_ref[:] = acc_ref[:] + wv_t * inner

    out_ref[0] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def remap_banded(padded: jax.Array, bm: BandedRemap, *,
                 interpret: bool = False) -> jax.Array:
    """Apply a channelized remap to the PADDED source (B, Hp, Wp), f32
    or uint8 (edge padding done by the caller, as in ops.rectify.remap).
    uint8 sources keep the mosaic DMA at 1 byte/px (converted in VMEM);
    output is always f32 and bit-identical between the two dtypes."""
    B, Hp, Wp = padded.shape
    CV, H8, W128 = bm.wv.shape
    CH = bm.wh.shape[0]
    nbr, nbc = H8 // ROWS, W128 // LANE
    RB = -(-(CV + ROWS) // ROWS) * ROWS + ROWS
    if padded.dtype == jnp.uint8:
        # u8 tiles are (32, 128): the mosaic block's sublane dim must be
        # a multiple of 32
        RB = -(-RB // 32) * 32
    # top/left pre-pad matches build_banded's +ROWS/+LANE anchor shift;
    # trailing slack so the mosaic's +1 blocks and the 3-lane-block roll
    # window always exist
    Wload = -(-(Wp + LANE) // CB) * CB + 2 * CB
    Hload = -(-(Hp + ROWS) // RB) * RB + 2 * RB
    srcp = jnp.pad(padded, ((0, 0), (ROWS, Hload - Hp - ROWS),
                            (LANE, Wload - Wp - LANE)),
                   mode="edge")

    kern = functools.partial(_kernel, CV=CV, CH=CH, RB=RB, nbc=nbc)

    def mosaic(oy, ox):
        return pl.BlockSpec(
            (1, RB, CB),
            lambda b, i, j, ay, ax, bands, _oy=oy, _ox=ox: (
                b, ay[i * nbc + j] // RB + _oy, ax[i * nbc + j] // CB + _ox),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, nbr, nbc),
        in_specs=[
            pl.BlockSpec((CV, ROWS, LANE), lambda b, i, j, *sr:
                         (0, i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((CH, ROWS, LANE), lambda b, i, j, *sr:
                         (0, i, j), memory_space=pltpu.VMEM),
            mosaic(0, 0), mosaic(0, 1), mosaic(1, 0), mosaic(1, 1),
        ],
        out_specs=pl.BlockSpec((1, ROWS, LANE), lambda b, i, j, *sr:
                               (b, i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * RB, 2 * CB), jnp.float32),
                        pltpu.VMEM((((CV - 1) // ROWS + 2) * ROWS, 3 * LANE),
                                   jnp.float32),
                        pltpu.VMEM((ROWS, LANE), jnp.float32)],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H8, W128), jnp.float32),
        interpret=interpret,
    )(bm.ay, bm.ax, bm.bands, bm.wv, bm.wh, srcp, srcp, srcp, srcp)
    return out[:, :bm.out_h, :bm.out_w]

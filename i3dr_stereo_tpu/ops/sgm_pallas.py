"""Pallas TPU kernels for SGM path aggregation.

Same contract as :func:`i3dr_stereo_tpu.ops.sgm.sgm_aggregate` (the XLA
`lax.scan` reference — tests assert near-bit-equality), engineered for
the chip:

- **Horizontal kernel** — grid (batch, row-tiles, W-chunks) with the W
  dimension sequential and a persistent (rows, D) carry in VMEM scratch;
  row tiles are tall (up to 128), so each recurrence step is a (TH, D)
  VPU block. The reverse direction reuses the kernel with a reversed
  chunk index_map.
- **Vertical/diagonal kernel** — grid over (batch, rows) executed
  sequentially; the per-direction carries L_r(row-1, :, :) persist in
  VMEM scratch across grid steps. Diagonal paths are the same row scan
  with the carry rolled one column (`pltpu.roll` on the sublane axis) —
  no wavefront scheduling. Up to three directions (N, NW, NE) share one
  sweep, reading C once and writing one partial-sum volume.
- The disparity axis lives on the 128-lane minor dimension; the d+-1
  neighbour terms are lane rolls; min_d is a lane reduction.

**Memory-dtype engineering** (HBM bandwidth is the bound): the cost
volume may be uint8 (census hamming <= 80 for 9x9) with 255 as the
invalid sentinel, and the aggregated output int16 — 1/4 and 1/2 the
traffic of float32. Compute is always f32 in VMEM (values < 2^24 stay
exact integers), per-pass partial sums are clamped to CLAMP so the
int16 sum of all passes cannot overflow; real costs sit far below the
clamp, so only invalid entries saturate (and remain maximal, never
winning WTA).

Direction groups (same partition as the reference engine's four
"SGM <dir> Optimization" switches, ini/quick.param:144-147):

    horizontal: (0,1), (0,-1)            2 launches (fwd/rev index map)
    top-down:   (1,0), (1,1), (1,-1)     1 launch (1 carry per dir)
    bottom-up:  (-1,0), (-1,-1), (-1,1)  1 launch
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1.0e9
U8_SENTINEL = 255          # invalid-cost marker in uint8 volumes
CLAMP = 10000.0            # per-pass partial-sum clamp for int16 outputs

_HORIZ = ((0, 1), (0, -1))
_TOPDOWN = ((1, 0), (1, 1), (1, -1))
_BOTTOMUP = ((-1, 0), (-1, -1), (-1, 1))


def _load_cost(c, sentinel: bool):
    """Raw block -> f32 costs; uint8 sentinel 255 -> BIG.

    Narrow->f32 casts go through int32 (Mosaic's cast matrix has no
    direct u8/i16 <-> f32 paths)."""
    if c.dtype == jnp.float32:
        ci = None
        f = c
    else:
        ci = c.astype(jnp.int32)
        f = ci.astype(jnp.float32)
    if sentinel:
        # compare in int32 — Mosaic has no narrow-int vector compares
        key = ci if ci is not None else c.astype(jnp.int32)
        f = jnp.where(key == U8_SENTINEL, BIG, f)
    return f


def _store_sum(total, out_dtype):
    if out_dtype == jnp.float32:
        return total
    return jnp.minimum(total, CLAMP).astype(jnp.int32).astype(out_dtype)


def _step(prev, c, p1, p2, D):
    """One SGM recurrence step on (rows, D) blocks; D on lanes."""
    m = jnp.min(prev, axis=-1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1)
    # pltpu.roll takes non-negative shifts; -1 == size-1 circularly
    up = jnp.where(lane == 0, BIG, pltpu.roll(prev, 1, axis=prev.ndim - 1))
    dn = jnp.where(lane == D - 1, BIG,
                   pltpu.roll(prev, D - 1, axis=prev.ndim - 1))
    best = jnp.minimum(jnp.minimum(prev, m + p2),
                       jnp.minimum(up + p1, dn + p1))
    return c + best - m


# ---------------------------------------------------------------------------
# horizontal kernel
# ---------------------------------------------------------------------------

def _lr_kernel(pp_ref, c_ref, s_ref, carry_ref, s_buf, c_gbuf, *, WC, D,
               forward: bool, sentinel: bool, out_dtype):
    # pp_ref: (2,) SMEM — (P1, P2) as runtime scalars (live-reconfigurable)
    p1, p2 = pp_ref[0], pp_ref[1]
    chunk = pl.program_id(2)

    @pl.when(chunk == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    XG = 8  # column group: dynamic sublane access must be 8-aligned

    def body(i, carry):
        g = i if forward else WC // XG - 1 - i
        gx = pl.multiple_of(g * XG, XG)
        # stage the group through f32 scratch: per-k reads then come
        # from a ref (static index), avoiding narrow-dtype vector
        # reshapes Mosaic does not support
        c_gbuf[:] = _load_cost(c_ref[0, :, pl.ds(gx, XG), :], sentinel)
        ks = range(XG) if forward else range(XG - 1, -1, -1)
        for k in ks:
            c = c_gbuf[:, k, :]
            carry = _step(carry, c, p1, p2, D)
            s_buf[:, k, :] = (jnp.minimum(carry, CLAMP)
                              if out_dtype != jnp.float32 else carry)
        if out_dtype == jnp.float32:
            s_ref[0, :, pl.ds(gx, XG), :] = s_buf[:]
        else:
            s_ref[0, :, pl.ds(gx, XG), :] = (s_buf[:].astype(jnp.int32)
                                             .astype(out_dtype))
        return carry

    carry_ref[:] = jax.lax.fori_loop(0, WC // XG, body, carry_ref[:])


def _pick_tiles(H: int, W: int, D: int, itemsize: int,
                budget_bytes: int = 6 * 1024 * 1024) -> Tuple[int, int]:
    """Choose (TH, WC): tall row tiles, W chunks sized to the VMEM budget
    (C block + S block + f32 working set, double-buffered).

    Constraint: the last two block dims are (WC, D), so WC must be a
    multiple of 8 (or the full W); callers pre-pad W to a multiple of 8.
    """
    th = 128
    while th > 1 and H % th:
        th //= 2
    per_elem = 2 * itemsize + 8  # C + S blocks double-buffered + carry/f32
    wc = max(8, budget_bytes // (th * D * per_elem) // 8 * 8)
    wc = min(wc, W)
    while wc > 8 and W % wc:
        wc -= 8
    if W % wc:
        wc = W
    return th, wc


def _pp_arr(p1, p2) -> jax.Array:
    return jnp.stack([jnp.asarray(p1, jnp.float32),
                      jnp.asarray(p2, jnp.float32)])


@functools.partial(jax.jit, static_argnames=("forward", "sentinel",
                                             "out_dtype", "interpret"))
def _horizontal_pass(C, p1, p2, forward: bool, sentinel: bool = False,
                     out_dtype=jnp.float32, interpret: bool = False):
    B, H, W, D = C.shape
    th, wc = _pick_tiles(H, W, D, C.dtype.itemsize)
    kern = functools.partial(_lr_kernel, WC=wc, D=D,
                             forward=forward, sentinel=sentinel,
                             out_dtype=out_dtype)
    if forward:
        index_map = lambda b, i, j: (b, i, j, 0)
    else:
        index_map = lambda b, i, j: (b, i, W // wc - 1 - j, 0)
    spec = pl.BlockSpec((1, th, wc, D), index_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, H // th, W // wc),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(C.shape, out_dtype),
        scratch_shapes=[pltpu.VMEM((th, D), jnp.float32),
                        pltpu.VMEM((th, 8, D), jnp.float32),
                        pltpu.VMEM((th, 8, D), jnp.float32)],
        interpret=interpret,
    )(_pp_arr(p1, p2), C)


# ---------------------------------------------------------------------------
# vertical/diagonal kernel
# ---------------------------------------------------------------------------

def _vert_kernel(pp_ref, c_ref, s_ref, *carries, shifts, W, D,
                 sentinel: bool, out_dtype):
    p1, p2 = pp_ref[0], pp_ref[1]
    row = pl.program_id(1)

    @pl.when(row == 0)
    def _():
        for cr in carries:
            cr[:] = jnp.zeros_like(cr)

    c = _load_cost(c_ref[0, 0], sentinel)  # (W, D)
    total = None
    for cr, sh in zip(carries, shifts):
        prev = cr[:]
        if sh != 0:
            prev = pltpu.roll(prev, sh % W, axis=0)
            ridx = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
            edge = 0 if sh > 0 else W - 1
            # zero carry at the entering column => L = C there
            prev = jnp.where(ridx == edge, 0.0, prev)
        L = _step(prev, c, p1, p2, D)
        cr[:] = L
        total = L if total is None else total + L
    s_ref[0, 0] = _store_sum(total, out_dtype)


@functools.partial(jax.jit, static_argnames=("shifts", "reverse",
                                             "sentinel", "out_dtype", "interpret"))
def _vertical_pass(C, p1, p2, shifts: Tuple[int, ...], reverse: bool,
                   sentinel: bool = False, out_dtype=jnp.float32,
                   interpret: bool = False):
    B, H, W, D = C.shape
    kern = functools.partial(_vert_kernel, shifts=shifts, W=W,
                             D=D, sentinel=sentinel, out_dtype=out_dtype)
    if reverse:
        index_map = lambda b, i: (b, H - 1 - i, 0, 0)
    else:
        index_map = lambda b, i: (b, i, 0, 0)
    spec = pl.BlockSpec((1, 1, W, D), index_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, H),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(C.shape, out_dtype),
        scratch_shapes=[pltpu.VMEM((W, D), jnp.float32) for _ in shifts],
        interpret=interpret,
    )(_pp_arr(p1, p2), C)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _vmem_ok_vertical(W: int, D: int, n_carries: int, itemsize: int,
                      out_itemsize: int = 2) -> bool:
    """Carries (f32) + double-buffered C-in and S-out row blocks."""
    need = (n_carries * 4 + 2 * itemsize + 2 * out_itemsize) * W * D
    return need < 10 * 1024 * 1024


def _pen_key(pp):
    """Grouping key for per-direction penalties that works for python
    floats AND traced scalars (tracers define __eq__ symbolically, so
    they cannot be dict keys by value — group by identity instead;
    repeated-tuple penalties share objects, so grouping still fires)."""
    p1, p2 = pp
    if isinstance(p1, (int, float)) and isinstance(p2, (int, float)):
        return (float(p1), float(p2))
    return (id(p1), id(p2))


def sgm_aggregate_pallas(C: jax.Array, p1: float = 10.0, p2: float = 120.0,
                         directions: Sequence[Tuple[int, int]] = None,
                         per_direction_penalties=None,
                         out_dtype=None,
                         interpret: bool = False) -> jax.Array:
    """Drop-in Pallas replacement for ops.sgm.sgm_aggregate.

    C: (B, H, W, D) or (H, W, D) cost volume — float32, or uint8 with
    255 = invalid sentinel. Returns the summed path costs S
    (float32 by default; pass out_dtype=jnp.int16 for census-scale costs
    to halve output traffic — values are exact small integers).
    """
    from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_8

    if directions is None:
        directions = DIRECTIONS_8
    directions = tuple(directions)
    batched = C.ndim == 4
    Cb = C if batched else C[None]
    sentinel = Cb.dtype == jnp.uint8
    if not sentinel:
        Cb = Cb.astype(jnp.float32)
    if out_dtype is None:
        out_dtype = jnp.float32
    B, H, W, D = Cb.shape
    # Spatial padding to tile-friendly sizes with ZERO cost: a zero-cost
    # border column/row gives L == 0 there, so a scan entering the real
    # image from padding carries exactly the edge-start semantics of the
    # unpadded recurrence (min(0, p1, p2) - 0 == 0 => L = C). Disparity
    # padding uses the invalid value so padded lanes never win and the
    # d+-1 rolls see the same invalid as the explicit edge masks.
    padH = (H + 7) // 8 * 8
    padW = (W + 7) // 8 * 8
    padD = (D + 127) // 128 * 128
    if (padH, padW, padD) != (H, W, D):
        Cb = jnp.pad(Cb, ((0, 0), (0, padH - H), (0, padW - W), (0, 0)),
                     constant_values=0)
        if padD != D:
            Cb = jnp.pad(Cb, ((0, 0), (0, 0), (0, 0), (0, padD - D)),
                         constant_values=U8_SENTINEL if sentinel else BIG)

    pen = {d: (p1, p2) for d in directions}
    if per_direction_penalties is not None:
        pen = {d: per_direction_penalties[i] for i, d in enumerate(directions)}

    S = None

    def add(part):
        nonlocal S
        if S is None:
            S = part if out_dtype == jnp.float32 else part.astype(jnp.int32)
        else:
            S = S + (part if out_dtype == jnp.float32 else part.astype(jnp.int32))

    # horizontal group: one launch per direction (reverse via index_map)
    for d in _HORIZ:
        if d in directions:
            pp1, pp2 = pen[d]
            add(_horizontal_pass(Cb, pp1, pp2,
                                 forward=(d == (0, 1)), sentinel=sentinel,
                                 out_dtype=out_dtype, interpret=interpret))

    # vertical groups
    for family, reverse in ((_TOPDOWN, False), (_BOTTOMUP, True)):
        fam = [d for d in family if d in directions]
        if not fam:
            continue
        groups = {}
        for d in fam:
            groups.setdefault(_pen_key(pen[d]), []).append(d)
        for key, ds in groups.items():
            pp1, pp2 = pen[ds[0]]
            shifts = tuple(d[1] for d in ds)
            if _vmem_ok_vertical(W, padD, len(shifts), Cb.dtype.itemsize):
                add(_vertical_pass(Cb, pp1, pp2, shifts, reverse,
                                   sentinel=sentinel, out_dtype=out_dtype,
                                   interpret=interpret))
            else:
                for sh in shifts:
                    add(_vertical_pass(Cb, pp1, pp2, (sh,),
                                       reverse, sentinel=sentinel,
                                       out_dtype=out_dtype, interpret=interpret))

    if (padH, padW, padD) != (H, W, D):
        S = S[:, :H, :W, :D]
    return S if batched else S[0]

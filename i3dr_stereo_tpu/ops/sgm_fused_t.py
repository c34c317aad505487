"""Dense transposed-layout fused census SGM — the flagship TPU kernels.

The first-generation kernels (:mod:`i3dr_stereo_tpu.ops.sgm_pallas`,
:mod:`~.fused_cost_sgm`) keep the disparity axis on the 128-lane minor
dimension.  At the pyramid's residual window size (K = 32, the
"Number Of Disparities = 31" of the reference engine profile,
ini/quick.param:128) that leaves 3/4 of every vector register empty and
forces dynamic *lane* rotations for the cost windows — both measured as
the dominant cost at 2448x2048.

This module flips the layout:

- images/census words live **transposed** as ``(B, W, H)`` so the image
  rows sit on the 128-lane minor axis (always full: row tiles of 128),
- the disparity axis sits on **sublanes** (D = 32 -> exactly one uint8
  tile), where the d+-1 terms of the SGM recurrence are cheap static
  sublane rolls and ``min_d`` is a fast cross-sublane reduction,
- the cost window for a column is a *contiguous sublane slice* of the
  x-reversed right census plane (``cr[x-d] == cr_rev[Wp-1-x+d]``), and
  the left-pad is sized so every slice start is 8-aligned — no dynamic
  rotations at all,
- the horizontal sweep consumes two adjacent W-blocks of the reversed
  plane per grid step (copied once into a VMEM ring), producing the
  uint8 cost volume ``C`` and the forward path sum in one pass,
- vertical sweeps run on the ``(B, H, D, W)`` transpose of C (XLA moves
  the 160 MB volume in ~0.3 ms) with the carry laid out ``(D, W)`` —
  dense again, diagonal paths are static lane rolls,
- the final (bottom-up) sweep fuses the 4/8-direction sum **and the
  winner-take-all** (argmin + parabolic subpixel, the engine's
  "DSI Interpolator = Parabolic", ini/quick.param:81), so the summed
  volume is never materialized in HBM.

Semantics match :func:`i3dr_stereo_tpu.ops.sgm.sgm_aggregate` +
:func:`i3dr_stereo_tpu.ops.wta.wta_disparity` (tests assert it); padded
rows/columns carry zero cost, which makes the recurrence enter the real
image with a zero carry — exactly the unpadded edge condition.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1.0e9
CLAMP = 10000.0          # per-direction partial-sum clamp (int16 outputs)
U8_SENTINEL = 255
NODATA = -1.0e9          # invalid-pixel marker in the fused WTA output

_DOWN = ((1, 0), (1, 1), (1, -1))
_UP = ((-1, 0), (-1, -1), (-1, 1))


def _step_t(prev, c, p1, p2, D):
    """One SGM step on (D, N) blocks — D on sublanes."""
    m = jnp.min(prev, axis=0, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0)
    up = jnp.where(iota == 0, BIG, pltpu.roll(prev, 1, axis=0))
    dn = jnp.where(iota == D - 1, BIG, pltpu.roll(prev, D - 1, axis=0))
    best = jnp.minimum(jnp.minimum(prev, m + p2),
                       jnp.minimum(up + p1, dn + p1))
    return c + best - m


def _pick_wc(Wp: int, D: int) -> int:
    """W-chunk: >= D (window containment), multiple of 8, divides Wp."""
    assert Wp % 8 == 0, f"Wp {Wp} must be a multiple of 8"
    wc = max(128, ((D + 7) // 8) * 8)
    while Wp % wc:
        wc += 8
    return wc


def _prep_geometry(Wp: int, D: int, bpm: int, WC: int):
    """off' (multiple of WC) and left-pad so cost-window slice starts are
    8-aligned block offsets: cr[x - bpm - d] == crv[off' + Wp-1-x + d]."""
    import math

    offp = WC * max(0, math.ceil(bpm / WC))
    pad = offp - bpm
    length = offp + Wp + WC
    return offp, pad, length


# ---------------------------------------------------------------------------
# fused census cost + forward-horizontal sweep
# ---------------------------------------------------------------------------

def _fwd_kernel(pp_ref, *refs, NW, D, WC, TH, Wp, W_real, H_real, bpm):
    # pp_ref: (2,) SMEM — (p1, p2) as runtime scalars so live reconfigure
    # of the penalties never re-compiles the kernel
    p1, p2 = pp_ref[0], pp_ref[1]
    cl_refs = refs[:NW]
    crA = refs[NW:2 * NW]
    crB = refs[2 * NW:3 * NW]
    c_out, s_out = refs[3 * NW], refs[3 * NW + 1]
    carry_ref = refs[3 * NW + 2]
    win = refs[3 * NW + 3:3 * NW + 3 + NW]

    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    for w in range(NW):
        win[w][:WC] = crA[w][0]
        win[w][WC:] = crB[w][0]

    diota = jax.lax.broadcasted_iota(jnp.int32, (D, TH), 0)
    # lanes are image rows: rows past H_real carry zero cost
    liota = jax.lax.broadcasted_iota(jnp.int32, (D, TH), 1)
    row_ok = (i * TH + liota) < H_real

    def group(g, carry):
        a = WC - 8 - 8 * g
        grps = [win[w][pl.ds(a, D + 8), :] for w in range(NW)]
        clg = [cl_refs[w][0, pl.ds(8 * g, 8), :] for w in range(NW)]
        for k in range(8):
            xl = 8 * g + k
            x = j * WC + xl
            ham = jnp.zeros((D, TH), jnp.int32)
            for w in range(NW):
                seg = jax.lax.slice_in_dim(grps[w], 7 - k, 7 - k + D, axis=0)
                col = jax.lax.slice_in_dim(clg[w], k, k + 1, axis=0)
                ham = ham + jax.lax.population_count(
                    jnp.bitwise_xor(seg, col)).astype(jnp.int32)
            dmax = x - bpm              # source x-bpm-d >= 0
            dmin = dmax - (W_real - 1)  # source <= W_real-1
            ok = (diota <= dmax) & (diota >= dmin) & row_ok
            pad_col = x >= W_real       # zero cost => exact edge semantics
            zero = jnp.logical_not(row_ok) | pad_col
            hamf = ham.astype(jnp.float32)
            c = jnp.where(zero, 0.0, jnp.where(ok, hamf, BIG))
            cu8 = jnp.where(zero, 0, jnp.where(ok, jnp.minimum(ham, 254), 255))
            carry = _step_t(carry, c, p1, p2, D)
            c_out[0, xl] = cu8.astype(jnp.uint8)
            s_out[0, xl] = (jnp.minimum(carry, CLAMP)
                            .astype(jnp.int32).astype(jnp.int16))
        return carry

    carry_ref[:] = jax.lax.fori_loop(0, WC // 8, group, carry_ref[:])


@functools.partial(jax.jit, static_argnames=(
    "D", "bpm", "W_real", "H_real", "interpret"))
def fused_census_fwd_t(clw: jax.Array, crw: jax.Array, D: int,
                       p1, p2, *, bpm: int,
                       W_real: int, H_real: int,
                       interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Cost volume + forward-horizontal L in one pass (transposed layout).

    clw/crw: (NW, B, Wp, Hp) uint32 census word planes of the transposed
    (B, W, H) images; Wp/Hp pre-padded (Hp % 128 == 0). ``bpm`` is the
    window base (min_disparity + residual base): cost(x, d) pairs
    cr[x - (bpm + d)]. Returns (C uint8, S_fwd int16), both (B, Wp, D, Hp).
    """
    NW, B, Wp, Hp = clw.shape
    TH = 128
    assert Hp % TH == 0, f"Hp {Hp} must be a multiple of {TH}"
    assert D % 8 == 0, f"D {D} must be a multiple of 8"
    WC = _pick_wc(Wp, D)
    offp, pad, length = _prep_geometry(Wp, D, bpm, WC)
    assert bpm >= -WC, f"window base {bpm} below -{WC}"
    crv = jnp.flip(crw, axis=2)
    crv = jnp.pad(crv, ((0, 0), (0, 0), (pad, length - pad - Wp), (0, 0)))
    k_hi = (offp + Wp) // WC  # block above the chunk-j window

    kern = functools.partial(_fwd_kernel, NW=NW, D=D, WC=WC, TH=TH, Wp=Wp,
                             W_real=W_real, H_real=H_real, bpm=bpm)
    pp = jnp.stack([jnp.asarray(p1, jnp.float32),
                    jnp.asarray(p2, jnp.float32)])
    pp_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    cl_spec = pl.BlockSpec((1, WC, TH), lambda b, i, j: (b, j, i),
                           memory_space=pltpu.VMEM)
    crA_spec = pl.BlockSpec((1, WC, TH), lambda b, i, j: (b, k_hi - 1 - j, i),
                            memory_space=pltpu.VMEM)
    crB_spec = pl.BlockSpec((1, WC, TH), lambda b, i, j: (b, k_hi - j, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, WC, D, TH), lambda b, i, j: (b, j, 0, i),
                            memory_space=pltpu.VMEM)
    C, S = pl.pallas_call(
        kern,
        grid=(B, Hp // TH, Wp // WC),
        in_specs=[pp_spec] + [cl_spec] * NW + [crA_spec] * NW
        + [crB_spec] * NW,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((B, Wp, D, Hp), jnp.uint8),
                   jax.ShapeDtypeStruct((B, Wp, D, Hp), jnp.int16)],
        scratch_shapes=[pltpu.VMEM((D, TH), jnp.float32)]
        + [pltpu.VMEM((2 * WC, TH), jnp.uint32) for _ in range(NW)],
        interpret=interpret,
    )(pp, *clw, *crv, *crv)
    return C, S


# ---------------------------------------------------------------------------
# reverse-horizontal sweep, fused with the fwd+rev sum
# ---------------------------------------------------------------------------

def _rev_kernel(pp_ref, c_ref, sf_ref, out_ref, carry_ref, *, D, WC, TH):
    p1, p2 = pp_ref[0], pp_ref[1]
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    def group(gi, carry):
        g = WC // 8 - 1 - gi
        for k in range(7, -1, -1):
            xl = 8 * g + k
            ci = c_ref[0, xl].astype(jnp.int32)
            c = jnp.where(ci == U8_SENTINEL, BIG, ci.astype(jnp.float32))
            carry = _step_t(carry, c, p1, p2, D)
            total = (jnp.minimum(carry, CLAMP)
                     + sf_ref[0, xl].astype(jnp.int32).astype(jnp.float32))
            out_ref[0, xl] = total.astype(jnp.int32).astype(jnp.int16)
        return carry

    carry_ref[:] = jax.lax.fori_loop(0, WC // 8, group, carry_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def hsweep_rev_sum_t(C: jax.Array, S_fwd: jax.Array, p1, p2,
                     *, interpret: bool = False) -> jax.Array:
    """Reverse-horizontal L + S_fwd in one pass -> S_h int16 (B, Wp, D, Hp)."""
    B, Wp, D, Hp = C.shape
    TH = 128
    WC = _pick_wc(Wp, D)
    nj = Wp // WC
    kern = functools.partial(_rev_kernel, D=D, WC=WC, TH=TH)
    pp = jnp.stack([jnp.asarray(p1, jnp.float32),
                    jnp.asarray(p2, jnp.float32)])
    spec = pl.BlockSpec((1, WC, D, TH), lambda b, i, j: (b, nj - 1 - j, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, Hp // TH, nj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, Wp, D, Hp), jnp.int16),
        scratch_shapes=[pltpu.VMEM((D, TH), jnp.float32)],
        interpret=interpret,
    )(pp, C, S_fwd)


# ---------------------------------------------------------------------------
# vertical sweeps on the (B, Hp, D, Wp) transpose
# ---------------------------------------------------------------------------

def _shift_carry(prev, dx, Wp):
    """shifted[x] = prev[x - dx], entering column zeroed (ops.sgm edge)."""
    if dx == 0:
        return prev
    liota = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 1)
    rolled = pltpu.roll(prev, dx % Wp, axis=1)
    edge = 0 if dx > 0 else Wp - 1
    return jnp.where(liota == edge, 0.0, rolled)


def _vdown_kernel(pens_ref, c_ref, out_ref, *carries, shifts, D, Wp, RB):
    # pens_ref: (n_dirs, 2) SMEM — per-direction (P1, P2) runtime scalars
    blk = pl.program_id(1)

    @pl.when(blk == 0)
    def _():
        for cr in carries:
            cr[:] = jnp.zeros_like(cr)

    for r in range(RB):  # RB rows per grid step amortize dispatch + DMA
        ci = c_ref[0, r].astype(jnp.int32)
        c = jnp.where(ci == U8_SENTINEL, BIG, ci.astype(jnp.float32))
        total = None
        for di, (cr, sh) in enumerate(zip(carries, shifts)):
            p1, p2 = pens_ref[di, 0], pens_ref[di, 1]
            L = _step_t(_shift_carry(cr[:], sh, Wp), c, p1, p2, D)
            cr[:] = L
            part = jnp.minimum(L, CLAMP)
            total = part if total is None else total + part
        out_ref[0, r] = total.astype(jnp.int32).astype(jnp.int16)


def _pick_rb(Hp: int) -> int:
    """Rows per vertical-sweep grid step. RB=8 measured equal to RB=32
    at flagship shape (the sweeps are VPU-compute-bound, not
    dispatch-bound), so keep the smaller block."""
    rb = 8
    while Hp % rb:
        rb //= 2
    return max(rb, 1)


def _pens_arr(pens) -> jax.Array:
    """(n, 2) float32 penalty array from a sequence of (p1, p2) pairs
    (python floats or traced scalars)."""
    rows = [jnp.stack([jnp.asarray(p1, jnp.float32),
                       jnp.asarray(p2, jnp.float32)]) for p1, p2 in pens]
    return jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("shifts", "interpret"))
def vsweep_down_t(C_T: jax.Array, shifts: Tuple[int, ...],
                  pens,
                  *, interpret: bool = False) -> jax.Array:
    """Top-down sweep over (B, Hp, D, Wp); diagonals = lane shifts."""
    B, Hp, D, Wp = C_T.shape
    RB = _pick_rb(Hp)
    kern = functools.partial(_vdown_kernel, shifts=shifts,
                             D=D, Wp=Wp, RB=RB)
    spec = pl.BlockSpec((1, RB, D, Wp), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, Hp // RB),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(C_T.shape, jnp.int16),
        scratch_shapes=[pltpu.VMEM((D, Wp), jnp.float32) for _ in shifts],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(_pens_arr(pens), C_T)


def _vup_wta_kernel(pens_ref, c_ref, sh_ref, sd_ref, disp_ref, *scr,
                    shifts, D, Wp, RB, subpixel, uniq):
    carries, dscr = scr[:-1], scr[-1]
    # pens_ref: (n_dirs + 1, 2) SMEM — per-direction (P1, P2) plus a final
    # (uniqueness_ratio, 0) row, all runtime scalars (live-reconfigurable)
    ur = pens_ref[len(shifts), 0]
    blk = pl.program_id(1)

    @pl.when(blk == 0)
    def _():
        for cr in carries:
            cr[:] = jnp.zeros_like(cr)

    for r in range(RB - 1, -1, -1):  # bottom-up within the block
        ci = c_ref[0, r].astype(jnp.int32)
        c = jnp.where(ci == U8_SENTINEL, BIG, ci.astype(jnp.float32))
        cmin = jnp.min(ci, axis=0, keepdims=True)
        S = (sh_ref[0, r].astype(jnp.int32)
             + sd_ref[0, r].astype(jnp.int32)).astype(jnp.float32)
        for di, (cr, sh) in enumerate(zip(carries, shifts)):
            p1, p2 = pens_ref[di, 0], pens_ref[di, 1]
            L = _step_t(_shift_carry(cr[:], sh, Wp), c, p1, p2, D)
            cr[:] = L
            S = S + jnp.minimum(L, CLAMP)

        diota = jax.lax.broadcasted_iota(jnp.int32, (D, Wp), 0)
        # NOTE: a packed S*64+d single-reduction argmin is NOT valid
        # here — S is fractional (sh/sd are int16 but the up-direction
        # partials carry the engine profiles' fractional penalties,
        # quick.param's /1000-scaled P1/P2), so the index bits cannot
        # ride below the cost. Two reductions, exact for any S.
        m = jnp.min(S, axis=0, keepdims=True)                            # (1,Wp)
        db = jnp.min(jnp.where(S == m, diota, D), axis=0, keepdims=True)
        valid = (m < 9999.0) & (cmin < U8_SENTINEL)
        if uniq:
            # the margin VALUE is a runtime scalar (live-tunable with no
            # recompile); enabling/disabling the filter is structural —
            # the extra cross-sublane min costs ~2 ms/frame at 2448x2048,
            # so it is compiled out when the static config disables it
            far = jnp.abs(diota - db) > 1
            min_far = jnp.min(jnp.where(far, S, BIG), axis=0, keepdims=True)
            valid = valid & ((ur <= 0.0)
                             | (min_far * (100.0 - ur) >= m * 100.0))
        disp = db.astype(jnp.float32)
        if subpixel:
            onehot = diota == db
            Sm_roll = jnp.where(diota == 0, S, pltpu.roll(S, 1, axis=0))
            Sp_roll = jnp.where(diota == D - 1, S,
                                pltpu.roll(S, D - 1, axis=0))
            Sm = jnp.sum(jnp.where(onehot, Sm_roll, 0.0), axis=0,
                         keepdims=True)
            Sp = jnp.sum(jnp.where(onehot, Sp_roll, 0.0), axis=0,
                         keepdims=True)
            denom = Sm + Sp - 2.0 * m
            off = jnp.where(denom > 1e-9, (Sm - Sp) / (2.0 * denom), 0.0)
            off = jnp.clip(off, -0.5, 0.5)
            interior = (db > 0) & (db < D - 1)
            disp = disp + jnp.where(interior, off, 0.0)
        # stage rows in VMEM scratch; one full-tile block write at the
        # end (a per-row single-sublane HBM write is a read-modify-write
        # per (8,128) tile)
        dscr[pl.ds(r, 1)] = jnp.where(valid, disp, NODATA)
    disp_ref[0] = dscr[:]


@functools.partial(jax.jit, static_argnames=(
    "shifts", "subpixel", "uniqueness_enabled", "interpret"))
def vsweep_up_wta_t(C_T: jax.Array, S_hT: jax.Array, S_down: jax.Array,
                    shifts: Tuple[int, ...],
                    pens,
                    *, subpixel: bool = True, uniqueness_ratio=0.0,
                    uniqueness_enabled: bool = True,
                    interpret: bool = False) -> jax.Array:
    """Bottom-up sweep + full-sum WTA. Returns (B, Hp, Wp) float32
    residual disparities with NODATA at invalid pixels."""
    B, Hp, D, Wp = C_T.shape
    RB = _pick_rb(Hp)
    nb = Hp // RB
    kern = functools.partial(_vup_wta_kernel, shifts=shifts,
                             D=D, Wp=Wp, RB=RB, subpixel=subpixel,
                             uniq=uniqueness_enabled)
    pp = jnp.concatenate(
        [_pens_arr(pens),
         jnp.stack([jnp.asarray(uniqueness_ratio, jnp.float32),
                    jnp.float32(0.0)])[None]])
    spec = pl.BlockSpec((1, RB, D, Wp), lambda b, i: (b, nb - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    # 3D output, (RB, Wp) blocks: a (1, RB, 1, Wp) 4D output pads the
    # size-1 sublane dim to the 8-row tile — 8x write amplification
    # (~1 ms at flagship shape) for nothing
    disp_spec = pl.BlockSpec((1, RB, Wp), lambda b, i: (b, nb - 1 - i, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec],
        out_specs=disp_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((D, Wp), jnp.float32) for _ in shifts]
        + [pltpu.VMEM((RB, Wp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pp, C_T, S_hT, S_down)


# ---------------------------------------------------------------------------
# public entry: full 4/8-direction census SGM + WTA, transposed layout
# ---------------------------------------------------------------------------

def census_sgm_wta_t(clw: jax.Array, crw: jax.Array, D: int, *,
                     bpm: int, W_real: int, H_real: int,
                     pens=None, p1=10.0, p2=120.0,
                     directions: int = 4, subpixel: bool = True,
                     uniqueness_ratio=0.0,
                     uniqueness_enabled=None,
                     interpret: bool = False):
    """Full pipeline on transposed census words (NW, B, Wp, Hp).

    ``pens``: optional per-direction (P1, P2) in DIRECTIONS_4/8 order
    (the engine's per-direction penalties, I3DRSGM.cpp:307-358).
    Penalties and uniqueness_ratio may be python floats OR traced
    scalars — they reach the kernels as SMEM operands, so live tuning
    never re-compiles (cf. the reference's engine rebuild per setter,
    I3DRSGM.cpp:630-654).
    Returns ((B, Hp, Wp) disparity with NODATA marking invalid, C).
    Disparities are residual: absolute = bpm + value.
    """
    from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_4, DIRECTIONS_8

    dirs = DIRECTIONS_4 if directions == 4 else DIRECTIONS_8
    pen = {d: (p1, p2) for d in dirs}
    if pens is not None:
        pen = {d: (pens[i][0], pens[i][1]) for i, d in enumerate(dirs)}

    pf = pen[(0, 1)]
    C, S_fwd = fused_census_fwd_t(clw, crw, D, pf[0], pf[1], bpm=bpm,
                                  W_real=W_real, H_real=H_real,
                                  interpret=interpret)
    pr = pen[(0, -1)]
    S_h = hsweep_rev_sum_t(C, S_fwd, pr[0], pr[1], interpret=interpret)

    C_T = jnp.transpose(C, (0, 3, 2, 1))
    S_hT = jnp.transpose(S_h, (0, 3, 2, 1))

    down = [d for d in _DOWN if d in dirs]
    up = [d for d in _UP if d in dirs]
    S_down = vsweep_down_t(C_T, tuple(d[1] for d in down),
                           tuple(pen[d] for d in down), interpret=interpret)
    if uniqueness_enabled is None:
        # plain-float margin: gate statically on its sign; traced margin
        # with no explicit gate: must compile the filter in
        uniqueness_enabled = (not isinstance(uniqueness_ratio, (int, float))
                              or uniqueness_ratio > 0)
    disp = vsweep_up_wta_t(C_T, S_hT, S_down, tuple(d[1] for d in up),
                           tuple(pen[d] for d in up), subpixel=subpixel,
                           uniqueness_ratio=uniqueness_ratio,
                           uniqueness_enabled=bool(uniqueness_enabled),
                           interpret=interpret)
    return disp, C


def right_disparity_from_C_t(C: jax.Array, bpm: int, W_real: int):
    """True backmatching DSI: right-anchored WTA from the existing cost
    volume, no second match (the engine's "Compute Backmatching",
    ini/quick.param:121-122; cv's createRightMatcher trick).

    C: (B, Wp, D, Hp) uint8 costs where C[b, x, k, y] pairs left column x
    with right column x - (bpm + k) (255 = invalid sentinel). The
    right-anchored volume is the x-shifted reindex
    ``C_R[b, xr, k, y] = C[b, xr + bpm + k, k, y]``; WTA over k gives the
    right disparity. Returns (d_r, valid_r), both (B, Hp, Wp), d_r in the
    same (residual) units as the left disparity: absolute = value (bpm is
    already folded in).
    """
    B, Wp, D, Hp = C.shape
    best = jnp.full((B, Wp, Hp), 255, jnp.int32)
    bestk = jnp.zeros((B, Wp, Hp), jnp.int32)
    # left columns x >= W_real are PADDING with zero cost by the fwd
    # kernel's edge semantics — they must not compete in the argmin
    # (a pad lane would win with cost 0 and suppress a genuine
    # in-image match over the last ~D/2 right columns)
    xs = jnp.arange(Wp, dtype=jnp.int32)[None, :, None]
    if D <= 64:
        # unrolled static shifts, reduced as a LEXICOGRAPHIC min of
        # (cost << 8 | k): a pure jnp.minimum tree over 32 shifted
        # planes is one elementwise fusion for XLA even inside the big
        # fused pipeline program, where the two-accumulator
        # (best, bestk) where-chain was observed to schedule ~4x worse.
        # Ties resolve to the smallest k — identical first-minimum
        # semantics (k < 256 fits the low byte).
        packed = []
        for k in range(D):
            s = bpm + k
            plane = C[:, :, k, :].astype(jnp.int32)
            if s > 0:
                plane = jnp.pad(plane[:, s:, :], ((0, 0), (0, s), (0, 0)),
                                constant_values=255)
            elif s < 0:
                plane = jnp.pad(plane[:, :s, :], ((0, 0), (-s, 0), (0, 0)),
                                constant_values=255)
            plane = jnp.where(xs + s >= W_real, 255, plane)
            packed.append((plane << 8) | k)
        import functools as _ft

        enc = _ft.reduce(jnp.minimum, packed)
        best = enc >> 8
        bestk = jnp.where(best < 255, enc & 255, 0)
    else:
        # rolled loop keeps the HLO small for wide DSIs; the x-shift
        # becomes a dynamic slice of a once-padded volume
        lo, hi = max(0, -(bpm)), max(0, bpm + D - 1)
        Cp = jnp.pad(C, ((0, 0), (lo, hi), (0, 0), (0, 0)),
                     constant_values=255)

        def body(k, carry):
            best, bestk = carry
            plane = jax.lax.dynamic_index_in_dim(Cp, k, axis=2,
                                                 keepdims=False)
            plane = jax.lax.dynamic_slice_in_dim(plane, lo + bpm + k, Wp,
                                                 axis=1).astype(jnp.int32)
            plane = jnp.where(xs + bpm + k >= W_real, 255, plane)
            better = plane < best
            return (jnp.where(better, plane, best),
                    jnp.where(better, k, bestk))

        best, bestk = jax.lax.fori_loop(0, D, body, (best, bestk))
    # left column xr + bpm + k must be a real column
    in_img = (xs + bpm + bestk >= 0) & (xs + bpm + bestk < W_real)
    valid_r = (best < 255) & in_img
    d_r = (bpm + bestk).astype(jnp.float32)
    return (jnp.transpose(d_r, (0, 2, 1)),
            jnp.transpose(valid_r, (0, 2, 1)))

"""Fused census-cost + SGM kernel: no gather, no materialized input volume.

The matching cost C(y, x, d) = hamming(cl[y, x], cr[y, x - d]) looks like
a gather along x, which TPUs do badly. Observation: with the right
census image REVERSED along x (cr_rev[y, i] = cr[y, W-1-i]),

    cr[y, x - d] = cr_rev[y, (W - 1 - x) + d]

so for fixed (y, x) the whole disparity axis d = 0..D-1 is ONE
CONTIGUOUS SLICE of cr_rev starting at W-1-x — a vectorized VMEM read,
no gather. The forward-horizontal SGM kernel therefore computes the cost
tile on the fly while scanning x (cl rows + cr_rev rows live in VMEM),
emits the uint8 cost volume as a byproduct for the other path
directions, and aggregates its own L_r in the same pass. HBM traffic for
C becomes 1 write + 3 reads instead of gather-write + 4 reads.

A per-row-tile base offset (prefetched scalars) supports the pyramid's
predicted windows: slice start W-1-x+base+min_disp. Offsets are
constant within a row tile, so the scan carry never needs re-alignment
mid-row.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i3dr_stereo_tpu.ops.sgm_pallas import (
    BIG,
    CLAMP as CLAMP_F,
    U8_SENTINEL,
    _step,
    _store_sum,
)

PAD_LEFT = 64  # covers negative window bases down to -PAD_LEFT
LANE = 128     # TPU lane width: dynamic VMEM lane indexing must be
               # 128-aligned, so unaligned reads load an aligned window
               # and rotate it into place (pltpu.roll with dynamic shift)


def _load_unaligned(ref, b_idx, start, width):
    """Read ref[b_idx, :, start:start+width] with an arbitrary dynamic
    start: 128-aligned load of a 128-multiple window (tpu.dynamic_rotate
    requires lane-aligned shapes) + dynamic lane rotation. The ref's
    last dim must be padded so aligned windows always fit
    (<= round_up(width, 128) + 128 beyond the max start)."""
    aligned = pl.multiple_of((start // LANE) * LANE, LANE)
    total = ((width + LANE - 1) // LANE + 1) * LANE
    win = ref[b_idx, :, pl.ds(aligned, total)]
    off = start - aligned
    rolled = pltpu.roll(win, total - off, axis=1)
    return rolled[:, :width]


def _pick_wc(W: int, cap: int = 256) -> int:
    """Largest W-chunk <= cap dividing W and divisible by 8 (4D block
    sublane constraint); falls back to the full row."""
    best = None
    for wc in range(8, min(cap, W) + 1, 8):
        if W % wc == 0:
            best = wc
    return best if best is not None else W


def _fused_fwd_kernel(base_ref, pp_ref, *refs, W, WC, D, NW, min_disp,
                      out_dtype, padded_w):
    """refs = cl word refs (NW) + cr_rev word refs (NW) + c_out + s_out
    + carry/c_buf/s_buf scratch. Grid (B, H/TH, W/WC), W sequential.
    pp_ref: (2,) scalar-prefetch — (P1, P2) runtime scalars."""
    p1, p2 = pp_ref[0], pp_ref[1]
    cl_refs = refs[:NW]
    cr_refs = refs[NW:2 * NW]
    c_out, s_out = refs[2 * NW], refs[2 * NW + 1]
    carry_ref, c_buf, s_buf = refs[2 * NW + 2], refs[2 * NW + 3], refs[2 * NW + 4]

    chunk = pl.program_id(2)
    tile = pl.program_id(1)
    base = base_ref[tile]

    @pl.when(chunk == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    th = cl_refs[0].shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, D), 1)
    XG = 8  # columns per iteration: full sublane tiles for the stores,
            # and one unaligned load + rotation amortized over 8 columns

    def body(i, carry):
        x0 = chunk * WC + i * XG  # first global column of this group
        # reversed-row slice start decreases as x increases; one window
        # covers all XG columns, each column is a STATIC sub-slice
        s_hi = W - 1 - x0 + base + min_disp + PAD_LEFT  # start for x0
        # padding guarantees the window fits for any base in
        # [-PAD_LEFT, W); the floor only triggers in all-invalid groups
        s_lo = jnp.maximum(s_hi - (XG - 1), 0)
        segs = [_load_unaligned(cr_refs[wi], 0, s_lo, D + XG - 1)
                for wi in range(NW)]
        cxs = [_load_unaligned(cl_refs[wi], 0, x0, XG) for wi in range(NW)]
        for k in range(XG):  # static unroll: scratch writes use static k
            x = x0 + k
            off = XG - 1 - k  # segs[:, off : off+D] == slice starting s(x)
            ham = jnp.zeros((th, D), jnp.int32)
            for wi in range(NW):
                ham = ham + jax.lax.population_count(jnp.bitwise_xor(
                    cxs[wi][:, k:k + 1], segs[wi][:, off:off + D])
                ).astype(jnp.int32)
            dmax = x - base - min_disp      # source col >= 0
            dmin = dmax - (W - 1)           # source col <= W-1 (the
            # upper bound matters for negative bases / right-edge
            # columns, where the reversed plane's zero padding would
            # otherwise masquerade as a perfect match)
            valid = (lane <= dmax) & (lane >= dmin)
            c = jnp.where(valid, ham.astype(jnp.float32), BIG)
            c_buf[:, k, :] = jnp.where(valid, jnp.minimum(ham, 254)
                                       .astype(jnp.float32), 255.0)
            carry = _step(carry, c, p1, p2, D)
            s_buf[:, k, :] = (jnp.minimum(carry, CLAMP_F)
                              if out_dtype != jnp.float32 else carry)
        xw = pl.multiple_of(i * XG, XG)
        # scratch stays f32 (Mosaic lacks narrow-dtype 2D->3D reshapes);
        # narrow on the full-tile store
        # Mosaic lacks a direct f32->u8 cast; go through int32
        c_out[0, :, pl.ds(xw, XG), :] = (c_buf[:].astype(jnp.int32)
                                         .astype(jnp.uint8))
        s_out[0, :, pl.ds(xw, XG), :] = (s_buf[:].astype(jnp.int32)
                                         .astype(out_dtype)
                                         if out_dtype != jnp.float32
                                         else s_buf[:])
        return carry

    carry_ref[:] = jax.lax.fori_loop(0, WC // XG, body, carry_ref[:])


@functools.partial(jax.jit, static_argnames=("D", "min_disp",
                                             "out_dtype", "th", "interpret"))
def fused_census_horizontal(cl_words: jax.Array, cr_words: jax.Array,
                            base: jax.Array, D: int, p1, p2,
                            min_disp: int = 0, out_dtype=jnp.int16,
                            th: int = 8, interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """Build the cost volume and the forward-horizontal L_r in one pass.

    cl_words/cr_words: (NW, B, H, W) uint32 census word-planes (the right
    one un-reversed — reversal happens here). base: (H//th,) or
    (B, H//th) int32 window base per row tile (zeros => full range,
    disparity d is absolute d + min_disp). Returns
    (C uint8 (B,H,W,D), S_fwd (B,H,W,D) in out_dtype).
    """
    NW, B, H, W = cl_words.shape
    while H % th:
        th //= 2
    cr_rev = jnp.flip(cr_words, axis=-1)
    # right padding sized so the group window fits unclipped for any
    # row-tile base up to W (pyramid predictions can reach image width)
    cr_rev = jnp.pad(cr_rev, ((0, 0), (0, 0), (0, 0),
                              (PAD_LEFT, D + 3 * LANE + W)))
    padded_w = W + PAD_LEFT + D + 3 * LANE + W
    wl = (W + LANE - 1) // LANE * LANE + 2 * LANE  # aligned-read slack
    cl_words = jnp.pad(cl_words, ((0, 0), (0, 0), (0, 0), (0, wl - W)))

    wc = _pick_wc(W)

    kern = functools.partial(_fused_fwd_kernel, W=W, WC=wc,
                             D=D, NW=NW, min_disp=min_disp,
                             out_dtype=out_dtype, padded_w=padded_w)

    # NOTE index_map signatures: grid indices then scalar-prefetch refs.
    # 3D row-plane blocks must span the full W (the lane dim of a 3D
    # block cannot be chunked unless it is a multiple of 128, and image
    # widths rarely are) — rows are small, so full-width is cheap.
    cl_spec = pl.BlockSpec((1, th, wl), lambda b, i, j, *sr: (b, i, 0),
                           memory_space=pltpu.VMEM)
    cr_spec = pl.BlockSpec((1, th, padded_w), lambda b, i, j, *sr: (b, i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, th, wc, D), lambda b, i, j, *sr: (b, i, j, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // th, W // wc),
        in_specs=[cl_spec] * NW + [cr_spec] * NW,
        out_specs=[out_spec, out_spec],
        scratch_shapes=[pltpu.VMEM((th, D), jnp.float32),
                        pltpu.VMEM((th, 8, D), jnp.float32),
                        pltpu.VMEM((th, 8, D), jnp.float32)],
    )

    base = jnp.asarray(base, dtype=jnp.int32)
    if base.ndim == 2:
        base = base[0]  # same per-tile layout across the batch
    pp = jnp.stack([jnp.asarray(p1, jnp.float32),
                    jnp.asarray(p2, jnp.float32)])

    C, S = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, D), jnp.uint8),
                   jax.ShapeDtypeStruct((B, H, W, D), out_dtype)],
        interpret=interpret,
    )(base, pp, *cl_words, *cr_rev)
    return C, S


def census_word_planes(census: jax.Array) -> jax.Array:
    """(B, H, W, nw) packed census -> (nw, B, H, W) word planes."""
    return jnp.moveaxis(census, -1, 0)


# ---------------------------------------------------------------------------
# Birchfield–Tomasi variant (the SGBM-family cost), same no-gather trick
# ---------------------------------------------------------------------------

def _fused_bt_kernel(base_ref, pp_ref, l_ref, llo_ref, lhi_ref, r_ref, c_out,
                     s_out, carry_ref, c_buf, s_buf, *, W, WC, D, min_disp,
                     out_dtype, padded_w):
    """Pixelwise BT cost computed on the fly from the reversed right row.

    l/llo/lhi: left prefiltered row tiles (th, WC); r_ref: reversed right
    rows (th, padded_w) — right half-sample bounds are derived in-kernel
    from a D+2 slice (neighbours in the reversed row are the +-1 pixels
    of the source row).
    """
    p1, p2 = pp_ref[0], pp_ref[1]
    chunk = pl.program_id(2)
    tile = pl.program_id(1)
    base = base_ref[tile]

    @pl.when(chunk == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    th = l_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, D), 1)
    XG = 8

    def body(i, carry):
        x0 = chunk * WC + i * XG
        s_hi = W - 1 - x0 + base + min_disp + PAD_LEFT
        s_lo = jnp.maximum(s_hi - (XG - 1) - 1, 0)
        win = _load_unaligned(r_ref, 0, s_lo, D + XG + 1)  # covers all k
        lxw = _load_unaligned(l_ref, 0, x0, XG)
        llow = _load_unaligned(llo_ref, 0, x0, XG)
        lhiw = _load_unaligned(lhi_ref, 0, x0, XG)
        for k in range(XG):
            x = x0 + k
            off = XG - k  # win[:, off : off+D] starts at s(x); off-1/off+1 neighbours
            seg = win[:, off:off + D]
            nb_a = win[:, off - 1:off - 1 + D]
            nb_b = win[:, off + 1:off + 1 + D]
            half_a = 0.5 * (seg + nb_a)
            half_b = 0.5 * (seg + nb_b)
            rlo = jnp.minimum(jnp.minimum(half_a, half_b), seg)
            rhi = jnp.maximum(jnp.maximum(half_a, half_b), seg)
            lx = lxw[:, k:k + 1]
            llo = llow[:, k:k + 1]
            lhi = lhiw[:, k:k + 1]
            dl = jnp.maximum(jnp.maximum(lx - rhi, rlo - lx), 0.0)
            dr = jnp.maximum(jnp.maximum(seg - lhi, llo - seg), 0.0)
            # doubled-and-rounded cost units so half-sample values
            # survive the uint8 volume exactly (2x pixelwise BT <= 252)
            cost = jnp.round(2.0 * jnp.minimum(dl, dr))
            dmax = x - base - min_disp      # source col >= 0
            dmin = dmax - (W - 1)           # source col <= W-1 (edge-
            # replicated padding must not produce plausible BT costs
            # for out-of-image right pixels)
            valid = (lane <= dmax) & (lane >= dmin)
            c = jnp.where(valid, cost, BIG)
            c_buf[:, k, :] = jnp.where(valid, jnp.minimum(cost, 254.0), 255.0)
            carry = _step(carry, c, p1, p2, D)
            s_buf[:, k, :] = (jnp.minimum(carry, CLAMP_F)
                              if out_dtype != jnp.float32 else carry)
        xw = pl.multiple_of(i * XG, XG)
        # Mosaic lacks a direct f32->u8 cast; go through int32
        c_out[0, :, pl.ds(xw, XG), :] = (c_buf[:].astype(jnp.int32)
                                         .astype(jnp.uint8))
        s_out[0, :, pl.ds(xw, XG), :] = (s_buf[:].astype(jnp.int32)
                                         .astype(out_dtype)
                                         if out_dtype != jnp.float32
                                         else s_buf[:])
        return carry

    carry_ref[:] = jax.lax.fori_loop(0, WC // XG, body, carry_ref[:])


@functools.partial(jax.jit, static_argnames=("D", "min_disp",
                                             "out_dtype", "th", "interpret"))
def fused_bt_horizontal(left: jax.Array, right: jax.Array, base: jax.Array,
                        D: int, p1, p2, min_disp: int = 0,
                        out_dtype=jnp.int16, th: int = 8,
                        interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """BT-cost counterpart of fused_census_horizontal.

    left/right: (B, H, W) float32 prefiltered images (values in
    [0, 2*prefilter_cap] so pixelwise BT fits uint8).
    """
    B, H, W = left.shape
    while H % th:
        th //= 2
    # left half-sample bounds precomputed (3 cheap elementwise passes)
    ll = jnp.concatenate([left[..., :1], left[..., :-1]], axis=-1)
    lr_ = jnp.concatenate([left[..., 1:], left[..., -1:]], axis=-1)
    ha = 0.5 * (left + ll)
    hb = 0.5 * (left + lr_)
    llo = jnp.minimum(jnp.minimum(ha, hb), left)
    lhi = jnp.maximum(jnp.maximum(ha, hb), left)

    r_rev = jnp.flip(right, axis=-1)
    r_rev = jnp.pad(r_rev, ((0, 0), (0, 0), (PAD_LEFT, D + 2 + 3 * LANE + W)),
                    mode="edge")
    padded_w = W + PAD_LEFT + D + 2 + 3 * LANE + W
    wl = (W + LANE - 1) // LANE * LANE + 2 * LANE
    left = jnp.pad(left, ((0, 0), (0, 0), (0, wl - W)))
    llo = jnp.pad(llo, ((0, 0), (0, 0), (0, wl - W)))
    lhi = jnp.pad(lhi, ((0, 0), (0, 0), (0, wl - W)))

    wc = _pick_wc(W)

    kern = functools.partial(_fused_bt_kernel, W=W, WC=wc, D=D,
                             min_disp=min_disp, out_dtype=out_dtype,
                             padded_w=padded_w)
    l_spec = pl.BlockSpec((1, th, wl), lambda b, i, j, *sr: (b, i, 0),
                          memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((1, th, padded_w), lambda b, i, j, *sr: (b, i, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, th, wc, D), lambda b, i, j, *sr: (b, i, j, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H // th, W // wc),
        in_specs=[l_spec, l_spec, l_spec, r_spec],
        out_specs=[out_spec, out_spec],
        scratch_shapes=[pltpu.VMEM((th, D), jnp.float32),
                        pltpu.VMEM((th, 8, D), jnp.float32),
                        pltpu.VMEM((th, 8, D), jnp.float32)],
    )
    base = jnp.asarray(base, dtype=jnp.int32)
    if base.ndim == 2:
        base = base[0]
    pp = jnp.stack([jnp.asarray(p1, jnp.float32),
                    jnp.asarray(p2, jnp.float32)])
    C, S = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, D), jnp.uint8),
                   jax.ShapeDtypeStruct((B, H, W, D), out_dtype)],
        interpret=interpret,
    )(base, pp, left, llo, lhi, r_rev)
    return C, S


def fused_bt_sgm(left: jax.Array, right: jax.Array, D: int, *,
                 min_disp: int = 0, p1: float = 8.0, p2: float = 32.0,
                 directions=None, out_dtype=jnp.int16,
                 interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Full pixelwise-BT SGM (the fast SGBM path, blockSize=1 semantics).

    Returns (S, C). left/right are prefiltered (xsobel-clipped) images.
    Costs and S are in DOUBLED units (see kernel comment); p1/p2 are
    taken in normal cost units and doubled internally. WTA, parabolic
    subpixel and uniqueness are scale-invariant, so downstream code needs
    no change.
    """
    from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_8
    from i3dr_stereo_tpu.ops.sgm_pallas import (
        _BOTTOMUP,
        _TOPDOWN,
        _horizontal_pass,
        _vertical_pass,
        _vmem_ok_vertical,
    )

    if directions is None:
        directions = DIRECTIONS_8
    directions = tuple(directions)
    B, H, W = left.shape
    th = 8
    while H % th:
        th //= 2
    base_arr = jnp.zeros((H // th,), jnp.int32)
    assert (0, 1) in directions
    p1, p2 = 2.0 * p1, 2.0 * p2  # doubled cost units (see docstring)
    C, S_fwd = fused_bt_horizontal(left, right, base_arr, D, p1, p2,
                                   min_disp=min_disp, out_dtype=out_dtype,
                                   th=th, interpret=interpret)
    acc = S_fwd.astype(jnp.int32) if out_dtype != jnp.float32 else S_fwd

    def add(part):
        nonlocal acc
        acc = acc + (part.astype(jnp.int32) if out_dtype != jnp.float32 else part)

    if (0, -1) in directions:
        add(_horizontal_pass(C, p1, p2, forward=False, sentinel=True,
                             out_dtype=out_dtype, interpret=interpret))
    for family, reverse in ((_TOPDOWN, False), (_BOTTOMUP, True)):
        fam = [d for d in family if d in directions]
        if not fam:
            continue
        shifts = tuple(d[1] for d in fam)
        if _vmem_ok_vertical(W, D, len(shifts), 1):
            add(_vertical_pass(C, p1, p2, shifts, reverse, sentinel=True,
                               out_dtype=out_dtype, interpret=interpret))
        else:
            for sh in shifts:
                add(_vertical_pass(C, p1, p2, (sh,), reverse, sentinel=True,
                                   out_dtype=out_dtype, interpret=interpret))
    return acc, C


def fused_census_sgm(cl_census: jax.Array, cr_census: jax.Array, D: int,
                     *, base: int = 0, min_disp: int = 0,
                     p1: float = 10.0, p2: float = 120.0,
                     per_direction_penalties=None, directions=None,
                     out_dtype=jnp.int16, interpret: bool = False
                     ) -> Tuple[jax.Array, jax.Array]:
    """Full SGM aggregation with the fused cost build.

    cl_census/cr_census: (B, H, W, nw) packed census. Uniform window
    base (e.g. -K//2 for residual matching against a warped right view).
    Returns (S, C): summed path costs over `directions` (default 4:
    both horizontal + both vertical) and the uint8 cost volume.
    """
    from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_4
    from i3dr_stereo_tpu.ops.sgm_pallas import (
        _BOTTOMUP,
        _HORIZ,
        _TOPDOWN,
        _horizontal_pass,
        _pen_key,
        _vertical_pass,
        _vmem_ok_vertical,
    )

    if directions is None:
        directions = DIRECTIONS_4
    directions = tuple(directions)
    pen = {d: (p1, p2) for d in directions}
    if per_direction_penalties is not None:
        pen = {d: per_direction_penalties[i] for i, d in enumerate(directions)}

    clw = census_word_planes(cl_census)
    crw = census_word_planes(cr_census)
    NW, B, H, W = clw.shape
    th = 8
    while H % th:
        th //= 2
    base_arr = jnp.full((H // th,), base, jnp.int32)

    assert (0, 1) in directions, "fused path needs the W->E direction"
    pf1, pf2 = pen[(0, 1)]
    C, S_fwd = fused_census_horizontal(clw, crw, base_arr, D,
                                       pf1, pf2,
                                       min_disp=min_disp, out_dtype=out_dtype,
                                       th=th, interpret=interpret)
    acc = S_fwd.astype(jnp.int32) if out_dtype != jnp.float32 else S_fwd

    def add(part):
        nonlocal acc
        acc = acc + (part.astype(jnp.int32) if out_dtype != jnp.float32 else part)

    if (0, -1) in directions:
        pp1, pp2 = pen[(0, -1)]
        add(_horizontal_pass(C, pp1, pp2, forward=False,
                             sentinel=True, out_dtype=out_dtype,
                             interpret=interpret))
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
            if _vmem_ok_vertical(W, D, len(shifts), 1):
                add(_vertical_pass(C, pp1, pp2, shifts, reverse,
                                   sentinel=True, out_dtype=out_dtype,
                                   interpret=interpret))
            else:
                for sh in shifts:
                    add(_vertical_pass(C, pp1, pp2, (sh,),
                                       reverse, sentinel=True,
                                       out_dtype=out_dtype,
                                       interpret=interpret))
    return acc, C

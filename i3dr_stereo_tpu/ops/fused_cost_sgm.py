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
predicted windows: slice start W-1-x+base. Offsets are per row-tile
constant, so the scan carry never needs re-alignment mid-row.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from i3dr_stereo_tpu.ops.sgm_pallas import _step, _store_sum, BIG, U8_SENTINEL


def _fused_fwd_kernel(base_ref, *refs, p1, p2, W, WC, D, NW, min_disp,
                      out_dtype):
    """refs = cl_word refs (NW) + cr_rev_word refs (NW) + [c_out, s_out]
    + carry scratch. Grid (B, H/TH, W/WC), W sequential."""
    cl_refs = refs[:NW]
    cr_refs = refs[NW:2 * NW]
    c_out, s_out = refs[2 * NW], refs[2 * NW + 1]
    carry_ref = refs[2 * NW + 2]

    chunk = pl.program_id(2)
    tile = pl.program_id(1)
    base = base_ref[tile]  # per-row-tile window base disparity

    @pl.when(chunk == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    th = cl_refs[0].shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, D), 1)

    def body(i, carry):
        x = chunk * WC + i  # global column
        # slice start into reversed right census (padded by D zeros)
        s = W - 1 - x + base + min_disp
        ham = jnp.zeros((th, D), jnp.int32)
        for wi in range(NW):
            cx = cl_refs[wi][0, :, pl.ds(x - chunk * WC, 1)]       # (th, 1)
            seg = cr_refs[wi][0, :, pl.ds(s, D)]                    # (th, D)
            ham = ham + jax.lax.population_count(
                jnp.bitwise_xor(cx, seg)).astype(jnp.int32)
        # validity: right column x - (base + min_disp + d) must be >= 0
        # and < W  =>  d <= x - base - min_disp  and  d > x - base - W + ...
        dmax = x - base - min_disp
        valid = lane <= dmax
        c = jnp.where(valid, ham.astype(jnp.float32), BIG)
        c_out[0, :, pl.ds(i, 1), :] = jnp.where(
            valid, jnp.minimum(ham, 254).astype(jnp.uint8),
            jnp.uint8(U8_SENTINEL))[:, None, :]
        L = _step(carry, c, p1, p2, D)
        s_out[0, :, pl.ds(i, 1), :] = _store_sum(L, out_dtype)[:, None, :]
        return L

    carry_ref[:] = jax.lax.fori_loop(0, WC, body, carry_ref[:])


@functools.partial(jax.jit, static_argnames=("D", "p1", "p2", "min_disp",
                                             "out_dtype", "th", "interpret"))
def fused_census_horizontal(cl_words: jax.Array, cr_words: jax.Array,
                            base: jax.Array, D: int, p1: float, p2: float,
                            min_disp: int = 0, out_dtype=jnp.int16,
                            th: int = 8, interpret: bool = False
                            ) -> Tuple[jax.Array, jax.Array]:
    """Build the cost volume and the forward-horizontal L_r in one pass.

    cl_words/cr_words: (NW, B, H, W) uint32 census word-planes (right one
    NOT reversed — reversal happens here). base: (B, H//th) int32 window
    base offsets per row tile (zeros for full-range matching).
    Returns (C uint8 (B,H,W,D), S_fwd out_dtype (B,H,W,D)).
    """
    NW, B, H, W = cl_words.shape
    assert H % th == 0, (H, th)
    # reversed + D-padded right census planes
    cr_rev = jnp.flip(cr_words, axis=-1)
    cr_rev = jnp.pad(cr_rev, ((0, 0), (0, 0), (0, 0), (0, D)))

    wc = 256
    while W % wc:
        wc //= 2
        if wc < 8:
            wc = W
            break

    kern = functools.partial(_fused_fwd_kernel, p1=p1, p2=p2, W=W, WC=wc,
                             D=D, NW=NW, min_disp=min_disp,
                             out_dtype=out_dtype)

    cl_spec = pl.BlockSpec((1, th, W), lambda b, i, j, w=None: (b, i, 0),
                           memory_space=pltpu.VMEM)
    cr_spec = pl.BlockSpec((1, th, W + D), lambda b, i, j: (b, i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, th, wc, D), lambda b, i, j: (b, i, j, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // th, W // wc),
        in_specs=[cl_spec] * NW + [cr_spec] * NW,
        out_specs=[out_spec, out_spec],
        scratch_shapes=[pltpu.VMEM((th, D), jnp.float32)],
    )

    base_flat = base.reshape(-1) if base.ndim > 1 else base
    # scalar prefetch wants a flat per-(b,i) indexable array; we index by
    # program_id(1) only (per row tile), so fold batch in
    if base.ndim == 2:
        # kernel indexes base_ref[tile]; for B>1 rebuild per-b is complex —
        # restrict: same base layout for every b (true for our pyramid)
        base_flat = base[0]

    C, S = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, W, D), jnp.uint8),
                   jax.ShapeDtypeStruct((B, H, W, D), out_dtype)],
        interpret=interpret,
    )(base_flat.astype(jnp.int32), *cl_words, *cr_rev)
    return C, S


def census_word_planes(census: jax.Array) -> jax.Array:
    """(B, H, W, nw) packed census -> (nw, B, H, W) word planes."""
    return jnp.moveaxis(census, -1, 0)

"""Transposed-layout fused SGM kernels: parity vs the XLA reference.

The dense kernels (ops/sgm_fused_t.py) must reproduce
census_cost_volume + sgm_aggregate + wta_disparity exactly (the same
contract the reference's closed engine is held to via the SGBM oracle,
SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from i3dr_stereo_tpu.ops.census import census_cost_volume, census_transform
from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_4, DIRECTIONS_8, sgm_aggregate
from i3dr_stereo_tpu.ops.sgm_fused_t import (
    census_sgm_wta_t,
    fused_census_fwd_t,
    hsweep_rev_sum_t,
)
from i3dr_stereo_tpu.ops.wta import wta_disparity


def _pair(H=24, W=40, shift=3, seed=0, B=1):
    rng = np.random.default_rng(seed)
    L = rng.uniform(0, 255, (B, H, W)).astype(np.float32)
    R = np.roll(L, -shift, axis=2)
    return jnp.asarray(L), jnp.asarray(R)


def _transposed_words(Lj, Rj, Hp, Wp, cw=5, ch=5):
    H, W = Lj.shape[1], Lj.shape[2]
    lT = jnp.pad(jnp.transpose(Lj, (0, 2, 1)),
                 ((0, 0), (0, Wp - W), (0, Hp - H)), mode="edge")
    rT = jnp.pad(jnp.transpose(Rj, (0, 2, 1)),
                 ((0, 0), (0, Wp - W), (0, Hp - H)), mode="edge")
    # census window (h, w) swaps with the transpose
    clT = jnp.moveaxis(census_transform(lT, cw, ch), -1, 0)
    crT = jnp.moveaxis(census_transform(rT, cw, ch), -1, 0)
    return clT, crT


@pytest.mark.parametrize("bpm", [0, 2, -4])
def test_fwd_cost_and_sweep_match_reference(bpm):
    H, W, D = 24, 40, 8
    Lj, Rj = _pair(H, W)
    cl = census_transform(Lj, 5, 5)
    cr = census_transform(Rj, 5, 5)
    Cref, _ = census_cost_volume(cl, cr, bpm, D)

    clT, crT = _transposed_words(Lj, Rj, 128, 128)
    C, S = fused_census_fwd_t(clT, crT, D, 3.0, 20.0, bpm=bpm,
                              W_real=W, H_real=H, interpret=True)
    Cn = np.asarray(C)[:, :W, :, :H].transpose(0, 3, 1, 2)
    Crn = np.asarray(Cref)
    m = Crn < 1e8
    np.testing.assert_array_equal(Cn[m], Crn[m].astype(np.uint8))
    assert (Cn[~m] == 255).all()

    from i3dr_stereo_tpu.ops.sgm import _aggregate_one_direction
    Sref = np.asarray(_aggregate_one_direction(Cref, 0, 1, 3.0, 20.0))
    Sn = np.asarray(S)[:, :W, :, :H].transpose(0, 3, 1, 2).astype(np.float32)
    ok = Sref < 9000
    np.testing.assert_allclose(Sn[ok], Sref[ok], atol=0.5)


@pytest.mark.parametrize("directions", [4, 8])
def test_full_wta_matches_reference(directions):
    H, W, D, bpm = 24, 40, 8, 0
    Lj, Rj = _pair(H, W, seed=2)
    cl = census_transform(Lj, 5, 5)
    cr = census_transform(Rj, 5, 5)
    Cref, _ = census_cost_volume(cl, cr, bpm, D)
    dirs = DIRECTIONS_4 if directions == 4 else DIRECTIONS_8
    Sref = sgm_aggregate(Cref, 3.0, 20.0, dirs)
    dref, vref = map(np.asarray, wta_disparity(Sref, 0, uniqueness_ratio=0.0,
                                               subpixel=True))

    clT, crT = _transposed_words(Lj, Rj, 128, 128)
    disp, C = census_sgm_wta_t(clT, crT, D, bpm=bpm, W_real=W, H_real=H,
                               p1=3.0, p2=20.0, directions=directions,
                               interpret=True)
    d = np.asarray(disp)[:, :H, :W]
    v = d > -1e8
    np.testing.assert_array_equal(v, vref)
    both = v & vref
    np.testing.assert_allclose(d[both], dref[both], atol=5e-3)


def test_batch_and_per_direction_penalties():
    H, W, D = 16, 32, 8
    Lj, Rj = _pair(H, W, seed=5, B=2)
    cl = census_transform(Lj, 5, 5)
    cr = census_transform(Rj, 5, 5)
    Cref, _ = census_cost_volume(cl, cr, 0, D)
    pens = ((3.0, 20.0), (2.0, 15.0), (4.0, 25.0), (3.0, 18.0))
    Sref = sgm_aggregate(Cref, directions=DIRECTIONS_4,
                         per_direction_penalties=pens)
    dref, vref = map(np.asarray, wta_disparity(Sref, 0, subpixel=True))

    clT, crT = _transposed_words(Lj, Rj, 128, 128)
    disp, _ = census_sgm_wta_t(clT, crT, D, bpm=0, W_real=W, H_real=H,
                               pens=pens, directions=4, interpret=True)
    d = np.asarray(disp)[:, :H, :W]
    v = d > -1e8
    np.testing.assert_array_equal(v, vref)
    np.testing.assert_allclose(d[v], dref[v], atol=5e-3)


def test_full_wta_fractional_penalties():
    """WTA parity with FRACTIONAL penalties (the engine .param profiles'
    /1000-scaled P1/P2, config/profile.py) — regression guard for the
    round-5 packed-argmin bug, which was exact only for integer path
    sums and silently mis-indexed the winner once penalties carried
    fractions (slanted-scene density collapsed 0.61 -> 0.28)."""
    H, W, D, bpm = 24, 40, 8, 0
    Lj, Rj = _pair(H, W, seed=3)
    cl = census_transform(Lj, 5, 5)
    cr = census_transform(Rj, 5, 5)
    Cref, _ = census_cost_volume(cl, cr, bpm, D)
    Sref = sgm_aggregate(Cref, 0.6, 8.3, DIRECTIONS_4)
    dref, vref = map(np.asarray, wta_disparity(Sref, 0, uniqueness_ratio=0.0,
                                               subpixel=True))
    clT, crT = _transposed_words(Lj, Rj, 128, 128)
    disp, _ = census_sgm_wta_t(clT, crT, D, bpm=bpm, W_real=W, H_real=H,
                               p1=0.6, p2=8.3, directions=4,
                               interpret=True)
    d = np.asarray(disp)[:, :H, :W]
    v = d > -1e8
    np.testing.assert_array_equal(v, vref)
    both = v & vref
    # the kernels store horizontal path sums as int16 (memory-lean), so
    # fractional penalties truncate there and subpixel offsets differ at
    # the 0.1-px level from the all-f32 reference; the WINNING index must
    # still agree (an index bug shows up as >= 1 px errors en masse)
    diff = np.abs(d[both] - dref[both])
    assert (diff > 0.55).mean() < 0.005, (diff > 0.55).mean()
    assert np.median(diff) < 0.1

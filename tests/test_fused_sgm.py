"""Fused cost+SGM kernel: parity vs the gather + separate-kernel path."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
from i3dr_stereo_tpu.io.synthetic import layered_scene
from i3dr_stereo_tpu.ops.census import census_cost_volume, census_transform
from i3dr_stereo_tpu.ops.fused_cost_sgm import (
    census_word_planes,
    fused_census_horizontal,
    fused_census_sgm,
)
from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_4, sgm_aggregate
from i3dr_stereo_tpu.ops.sgm_pallas import _horizontal_pass


def _pair(H=16, W=40, shift=3, seed=0):
    rng = np.random.default_rng(seed)
    L = rng.uniform(0, 255, (1, H, W)).astype(np.float32)
    R = np.roll(L, -shift, axis=2)
    return jnp.asarray(L), jnp.asarray(R)


def test_fused_forward_matches_reference():
    L, R = _pair()
    D = 8
    cl = census_transform(L, 5, 5)
    cr = census_transform(R, 5, 5)
    Cref, _ = census_cost_volume(cl, cr, 0, D)
    Sref = np.asarray(_horizontal_pass(Cref, 3.0, 20.0, True, interpret=True))

    base = jnp.zeros((2,), jnp.int32)  # H=16, th=8 -> 2 tiles
    Cf, Sf = fused_census_horizontal(census_word_planes(cl),
                                     census_word_planes(cr),
                                     base, D, 3.0, 20.0, interpret=True)
    Cf = np.asarray(Cf)
    Cref_n = np.asarray(Cref)
    valid = Cref_n < 1e8
    np.testing.assert_array_equal(Cf[valid], Cref_n[valid].astype(np.uint8))
    assert (Cf[~valid] == 255).all()
    m = Sref < 1e8
    np.testing.assert_allclose(np.asarray(Sf)[m], Sref[m], atol=0.5)


def test_fused_full_aggregation_matches_reference():
    L, R = _pair(seed=2)
    D = 8
    cl = census_transform(L, 5, 5)
    cr = census_transform(R, 5, 5)
    Cref, _ = census_cost_volume(cl, cr, 0, D)
    Sref = np.asarray(sgm_aggregate(Cref, 3.0, 20.0, DIRECTIONS_4))

    S, C = fused_census_sgm(cl, cr, D, base=0, p1=3.0, p2=20.0,
                            directions=DIRECTIONS_4, interpret=True)
    m = Sref < 1e8
    np.testing.assert_allclose(np.asarray(S)[m], Sref[m], atol=0.5)


def test_fused_nonzero_base():
    """Window base shifts the disparity meaning: k == absolute d - base."""
    L, R = _pair(W=48, shift=6, seed=3)
    D = 8
    cl = census_transform(L, 5, 5)
    cr = census_transform(R, 5, 5)
    S, C = fused_census_sgm(cl, cr, D, base=4, p1=3.0, p2=20.0,
                            directions=DIRECTIONS_4, interpret=True)
    best = np.asarray(S).argmin(-1)
    inner = best[0, 4:-4, 16:-8]
    assert (inner == 2).mean() > 0.9  # absolute 6 == base 4 + k 2


def test_lean_pyramid_uses_fused_path():
    os.environ["I3DR_SGM_BACKEND"] = "pallas_interpret"
    try:
        from i3dr_stereo_tpu.matchers.pyramid import pyramid_sgm_match

        sc = layered_scene(96, 128, max_disp=20, seed=5)
        cfg = ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(
            disparity_range=32, speckle_size=50)
        res = pyramid_sgm_match(sc.left, sc.right, cfg)
        d = np.asarray(res.disparity)
        v = np.asarray(res.valid) & sc.valid
        err = np.abs(d - sc.disparity)[v]
        assert v.mean() > 0.5
        assert np.median(err) < 0.5
        assert (err < 1).mean() > 0.95
    finally:
        os.environ.pop("I3DR_SGM_BACKEND", None)


def test_lean_matches_gather_path_closely():
    """The warp+residual formulation should agree with the per-pixel
    gather formulation almost everywhere (same approximation class)."""
    from i3dr_stereo_tpu.matchers.pyramid import pyramid_sgm_match

    sc = layered_scene(96, 128, max_disp=20, seed=6)
    cfg = ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(
        disparity_range=32, speckle_size=0, median_filter=False)
    os.environ["I3DR_SGM_BACKEND"] = "xla"
    try:
        r_gather = pyramid_sgm_match(sc.left, sc.right, cfg)
    finally:
        os.environ["I3DR_SGM_BACKEND"] = "pallas_interpret"
    try:
        r_fused = pyramid_sgm_match(sc.left, sc.right, cfg)
    finally:
        os.environ.pop("I3DR_SGM_BACKEND", None)
    vg = np.asarray(r_gather.valid)
    vf = np.asarray(r_fused.valid)
    both = vg & vf
    dg = np.asarray(r_gather.disparity)[both]
    df = np.asarray(r_fused.disparity)[both]
    # 0.95, not 0.97: the exact forward-splat backmatch keeps borderline
    # occlusion-edge pixels the old fronto-parallel roundtrip used to
    # kill, so the compared population now includes the hard pixels
    # where the two window formulations legitimately diverge
    assert (np.abs(dg - df) < 1.0).mean() > 0.95


def test_lean_sgbm_bt_path():
    """Fused pixelwise-BT SGBM path (window_size=1) on the lean backend."""
    os.environ["I3DR_SGM_BACKEND"] = "pallas_interpret"
    try:
        from i3dr_stereo_tpu.matchers.registry import sgbm_match

        sc = layered_scene(96, 128, max_disp=20, seed=7)
        cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
            disparity_range=32, window_size=1, p1=8.0, p2=32.0,
            speckle_size=0, uniqueness_ratio=5.0)
        res = sgbm_match(jnp.asarray(sc.left)[None],
                         jnp.asarray(sc.right)[None], cfg)
        d = np.asarray(res.disparity)[0]
        v = np.asarray(res.valid)[0] & sc.valid
        err = np.abs(d - sc.disparity)[v]
        assert v.mean() > 0.5
        assert np.median(err) < 0.5
    finally:
        os.environ.pop("I3DR_SGM_BACKEND", None)

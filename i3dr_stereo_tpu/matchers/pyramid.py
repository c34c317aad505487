"""Coarse-to-fine pyramid SGM — the TPU re-design of the licensed
I3DRSGM/Phobos engine's schedule (ini/quick.param):

    6 pyramid levels, census 9x9 features, only ~31 disparities searched
    per level ("Number Of Disparities = 31"), each finer level predicted
    from the coarser result ("Predictor = Shift"), coarsest level offset
    by "Top Prediction Shift".

This schedule is why the reference engine is real-time at 2448x2048 with
a >500 px disparity range: the per-level search stays narrow, so the
cost volume is ~D/8 the size of a brute-force SGBM volume. Here each
level is a jitted census + 4-path SGM over a *per-pixel shifted* search
window:

    C_l(y, x, k) = hamming( cl(y, x), cr(y, x - (pred(y,x) + k - K/2)) )

with the prediction median-smoothed first so neighbouring pixels share
window alignment (the SGM recurrence then treats equal k as equal
disparity; exact at smooth predictions, off only across prediction
discontinuities — same approximation the shift-predictor engine makes).

Whole pyramid = one jit; every level's tensors stay on-chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from i3dr_stereo_tpu.config.params import MatcherConfig
from i3dr_stereo_tpu.config.profile import SGMProfile
from i3dr_stereo_tpu.matchers.base import MatchResult
from i3dr_stereo_tpu.ops.census import census_transform
from i3dr_stereo_tpu.ops.lr_check import lr_consistency
from i3dr_stereo_tpu.ops.median import median3x3, median3x3_masked
from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_4, DIRECTIONS_8
from i3dr_stereo_tpu.ops.sgm_dispatch import sgm_aggregate_auto as sgm_aggregate
from i3dr_stereo_tpu.ops.speckle import speckle_filter
from i3dr_stereo_tpu.ops.wls import wls_fill
from i3dr_stereo_tpu.ops.wta import wta_disparity

BIG = 1.0e9


def _downsample2(img: jax.Array) -> jax.Array:
    """2x2 area downsample of (B, H, W)."""
    B, H, W = img.shape
    H2, W2 = H // 2 * 2, W // 2 * 2
    x = img[:, :H2, :W2]
    return x.reshape(B, H2 // 2, 2, W2 // 2, 2).mean(axis=(2, 4))


def _upsample2_disp(d: jax.Array, H: int, W: int) -> jax.Array:
    """Upsample a disparity map to (H, W) and double its values."""
    up = 2.0 * jax.image.resize(d, d.shape[:-2] + (H, W), method="nearest")
    return up


def shifted_census_cost(cl: jax.Array, cr: jax.Array, offset: jax.Array,
                        K: int) -> tuple[jax.Array, jax.Array]:
    """Census hamming cost over a per-pixel disparity window.

    cl/cr: (B, H, W, nw) packed census. offset: (B, H, W) int32 — the
    window's base disparity (window spans offset .. offset+K-1).
    Returns (C: (B,H,W,K) f32, valid).
    """
    B, H, W, nw = cl.shape
    xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    k = jnp.arange(K, dtype=jnp.int32)
    src = xs[..., None] - (offset[..., None] + k)           # (B,H,W,K)
    valid = (src >= 0) & (src < W)
    src_c = jnp.clip(src, 0, W - 1)
    # gather right census rows at per-pixel columns
    crg = jnp.take_along_axis(cr[:, :, :, None, :], src_c[..., None], axis=2)
    # ^ broadcasts to (B,H,W,K,nw)
    x = jnp.bitwise_xor(cl[:, :, :, None, :], crg)
    ham = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)
    return jnp.where(valid, ham, BIG), valid


def pyramid_sgm_match(left, right, cfg: MatcherConfig,
                      profile: SGMProfile | None = None) -> MatchResult:
    """Full coarse-to-fine match. Uses cfg for geometry and the (optional)
    profile for per-level penalties/filters."""
    batched = left.ndim == 3
    l = (left if batched else left[None]).astype(jnp.float32)
    r = (right if batched else right[None]).astype(jnp.float32)
    B, H, W = l.shape

    K = 32  # per-level search width (profile "Number Of Disparities = 31", padded to 32 lanes)
    n_levels = int(cfg.max_pyramid_level)
    # keep the coarsest level at least ~24 px wide and s.t. the full range is covered
    max_by_size = max(1, min(H, W).bit_length() - 5)
    n_levels = max(1, min(n_levels, max_by_size))

    # image pyramids, fine -> coarse
    pyr_l, pyr_r = [l], [r]
    for _ in range(n_levels - 1):
        pyr_l.append(_downsample2(pyr_l[-1]))
        pyr_r.append(_downsample2(pyr_r[-1]))

    p1, p2 = float(cfg.p1), float(cfg.p2)
    dirs = DIRECTIONS_4 if cfg.num_directions == 4 else DIRECTIONS_8

    disp = None
    for li in range(n_levels - 1, -1, -1):
        ll, rr = pyr_l[li], pyr_r[li]
        Bh, Hh, Wh = ll.shape
        cl = census_transform(ll, cfg.census_height, cfg.census_width)
        cr = census_transform(rr, cfg.census_height, cfg.census_width)

        if disp is None:
            # coarsest: absolute window starting at the (scaled) min
            # disparity + top prediction shift analog
            base = int(round(cfg.min_disparity / (2 ** li)))
            offset = jnp.full((Bh, Hh, Wh), base, jnp.int32)
        else:
            pred = _upsample2_disp(disp, Hh, Wh)
            pred = median3x3(pred)  # align neighbouring windows
            offset = jnp.round(pred).astype(jnp.int32) - K // 2
            offset = jnp.clip(offset, -K // 2, Wh - 1)

        C, valid_cv = shifted_census_cost(cl, cr, offset, K)
        S = sgm_aggregate(C, p1, p2, dirs)
        dk, ok = wta_disparity(S, 0, uniqueness_ratio=0.0,
                               subpixel=(li == 0 and cfg.subpixel))
        disp = dk + offset.astype(jnp.float32)
        # carry a cheap validity forward only at the finest level
        if li == 0:
            valid = ok & (jnp.min(C, axis=-1) < BIG / 2)
            if cfg.backmatch_distance >= 0:
                # LR check needs an absolute-disparity volume: re-anchor S
                # to absolute disparities via the window offset is only
                # aligned per-pixel, so run the check on the final map by
                # re-matching reversed images is overkill; use the
                # window-local consistency instead: right-anchored WTA
                # within the same window.
                disp, valid = _window_lr_check(disp, valid, S, offset,
                                               float(cfg.backmatch_distance))
            if cfg.speckle_size > 0:
                valid = speckle_filter(disp, valid,
                                       max_size=cfg.speckle_size,
                                       max_diff=float(cfg.speckle_range))
            if cfg.median_filter:
                disp = median3x3_masked(disp, valid)
            if cfg.interp or cfg.interpolate_missing:
                disp, valid = wls_fill(disp, valid, ll)
        else:
            # between levels: median-clean the estimate; invalid pixels
            # inherit the local median (windows re-search anyway)
            disp = median3x3(jnp.where(ok, disp, median3x3(disp)))

    res = MatchResult(disparity=disp, valid=valid)
    if not batched:
        res = MatchResult(disparity=res.disparity[0], valid=res.valid[0])
    return res


def _window_lr_check(disp: jax.Array, valid: jax.Array, S: jax.Array,
                     offset: jax.Array, max_diff: float):
    """LR consistency inside the per-pixel window: re-anchor the
    aggregated costs to the right image, S_R(y, xr, k) = S_L(y, xr + d, k)
    where d = offset(xl)+k — i.e. for each right pixel find the best left
    column claiming it, within the windows that cover it.

    Exact re-anchoring needs a scatter; we use the standard gather
    approximation over candidate left columns xr + j for j in the union
    search range, checking |d_L(xr + j) - j| implicitly via the absolute
    map: right-best = argmin over j of S at (xr+j, j - offset) when in
    window. To stay O(K) we check consistency directly on the absolute
    disparity map: a pixel passes if some pixel x' = x - d(x) + d(x')
    round-trips within max_diff. This reduces to comparing d at x and at
    x - d(x) + d(x - d(x)) — the classic two-view round trip on a single
    map, which equals the full check whenever the right image's best
    match lies inside the windows (true away from occlusions).
    """
    B, H, W = disp.shape
    d_int = jnp.round(disp).astype(jnp.int32)
    xr = jnp.arange(W, dtype=jnp.int32)[None, None, :] - d_int
    in_img = (xr >= 0) & (xr < W)
    xr_c = jnp.clip(xr, 0, W - 1)
    # occupancy vote: right pixel xr claims the disparity of the left
    # pixel with minimal |round-trip error|; approximate by comparing to
    # the left map gathered back at x - d(x) + d(x - d(x)).
    d_at_xr = jnp.take_along_axis(disp, xr_c, axis=2)
    consistent = jnp.abs(d_at_xr - disp) <= max_diff
    return disp, valid & in_img & consistent

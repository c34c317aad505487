"""Belief-propagation stereo (reference backends 4 and 5).

Re-creates the behavior of cv::cuda::createStereoBeliefPropagation
(matcherOpenCVBPCuda.cpp:20) and cv::cuda::createStereoConstantSpaceBP
(matcherOpenCVCSBPCuda.cpp:20) as jitted min-sum loopy BP on the
4-connected grid:

- data cost: truncated absolute difference (cv BP default:
  weight * min(|L - R|, max_data_term)),
- message update via the linear truncated distance transform
  (forward/backward scan over the disparity axis + truncation at
  min + max_disc_term),
- hierarchical schedule: cost pyramid by 2x2 pooling, run iters per
  level coarse->fine, upsample messages (cv BP "levels"),
- constant-space variant: finer levels search only a window around the
  upsampled coarse disparity (the memory trick of CSBP, expressed as a
  per-pixel gather window).

All loops are static; messages live as one (4, B, H, W, D) array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from i3dr_stereo_tpu.config.params import MatcherConfig
from i3dr_stereo_tpu.matchers.base import MatchResult
from i3dr_stereo_tpu.ops.shift import gather_disparity_shifted
from i3dr_stereo_tpu.ops.speckle import speckle_filter
from i3dr_stereo_tpu.ops.wta import wta_disparity

BIG = 1.0e9

# cv::cuda::StereoBeliefPropagation defaults
DATA_WEIGHT = 0.07
MAX_DATA_TERM = 10.0
DISC_SINGLE_JUMP = 1.0
MAX_DISC_TERM = 1.7


def _distance_transform_d(h: jax.Array, jump: float, max_disc: float) -> jax.Array:
    """min_d' ( h(d') + min(jump * |d - d'|, max_disc) ) along last axis."""
    hm = jnp.moveaxis(h, -1, 0)  # (D, ...)

    def fwd(carry, x):
        m = jnp.minimum(x, carry + jump)
        return m, m

    init = jnp.full_like(hm[0], BIG)
    _, f = jax.lax.scan(fwd, init, hm)
    _, b = jax.lax.scan(fwd, init, f, reverse=True)
    out = jnp.moveaxis(b, 0, -1)
    cap = jnp.min(h, axis=-1, keepdims=True) + max_disc
    return jnp.minimum(out, cap)


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift spatial axes (-3, -2) of (..., H, W, D), zero-filled."""
    pad = [(0, 0)] * x.ndim
    idx = [slice(None)] * x.ndim
    ay, ax_ = x.ndim - 3, x.ndim - 2
    H, W = x.shape[ay], x.shape[ax_]
    pad[ay] = (max(dy, 0), max(-dy, 0))
    pad[ax_] = (max(dx, 0), max(-dx, 0))
    idx[ay] = slice(max(-dy, 0), max(-dy, 0) + H)
    idx[ax_] = slice(max(-dx, 0), max(-dx, 0) + W)
    return jnp.pad(x, pad)[tuple(idx)]


# message directions: index i holds messages flowing *towards* +dy/+dx
_DIRS = ((1, 0), (-1, 0), (0, 1), (0, -1))


def _bp_iterate(data: jax.Array, msgs: jax.Array, iters: int,
                jump: float, max_disc: float) -> jax.Array:
    """Synchronous min-sum BP updates. data: (B,H,W,D); msgs: (4,B,H,W,D)."""

    def body(_, m):
        # incoming message at p from direction i = m[i] shifted from neighbour
        inc = [_shift2d(m[i], dy, dx) for i, (dy, dx) in enumerate(_DIRS)]
        total = data + inc[0] + inc[1] + inc[2] + inc[3]
        new = []
        for i, (dy, dx) in enumerate(_DIRS):
            # message p -> p+(dy,dx): exclude what came from that neighbour,
            # i.e. the incoming message travelling opposite to direction i
            opp = i ^ 1  # (1,0)<->(-1,0), (0,1)<->(0,-1)
            h = total - inc[opp]
            msg = _distance_transform_d(h, jump, max_disc)
            msg = msg - jnp.mean(msg, axis=-1, keepdims=True)
            new.append(msg)
        return jnp.stack(new)

    return jax.lax.fori_loop(0, iters, body, msgs)


def _pool2(x: jax.Array) -> jax.Array:
    """2x2 sum-pool of (B,H,W,D) (cv BP's level construction)."""
    B, H, W, D = x.shape
    H2, W2 = H // 2 * 2, W // 2 * 2
    x = x[:, :H2, :W2]
    return (x.reshape(B, H2 // 2, 2, W2 // 2, 2, D).sum(axis=(2, 4)))


def _upsample_msgs(m: jax.Array, H: int, W: int) -> jax.Array:
    """Nearest-neighbour upsample of (4,B,h,w,D) messages to (H, W)."""
    reps = m.repeat(2, axis=2).repeat(2, axis=3)
    out = jnp.zeros(m.shape[:2] + (H, W) + m.shape[-1:], m.dtype)
    h = min(H, reps.shape[2])
    w = min(W, reps.shape[3])
    return out.at[:, :, :h, :w].set(reps[:, :, :h, :w])


def _pairwise_smoothness(dvals: jax.Array, jump: float, max_disc: float
                         ) -> jax.Array:
    """V(k, k') = min(jump * |d_k - d_k'|, max_disc) for per-pixel
    candidate disparity VALUES dvals (..., K)."""
    diff = jnp.abs(dvals[..., :, None] - dvals[..., None, :])
    return jnp.minimum(jump * diff, max_disc)


def _bp_iterate_planes(data: jax.Array, dvals: jax.Array, msgs: jax.Array,
                       iters: int, jump: float, max_disc: float) -> jax.Array:
    """Min-sum BP over per-pixel candidate planes (the constant-space
    representation): data/dvals (B,H,W,K); msgs (4,B,H,W,K).

    The distance-transform trick needs a shared disparity axis, so the
    message update is the explicit O(K^2) pairwise min — fine for the
    small nr_plane (cv CSBP default 4).
    """
    V = _pairwise_smoothness(dvals, jump, max_disc)  # (B,H,W,K,K)

    def body(_, m):
        inc = [_shift2d(m[i], dy, dx) for i, (dy, dx) in enumerate(_DIRS)]
        total = data + inc[0] + inc[1] + inc[2] + inc[3]
        new = []
        for i, (dy, dx) in enumerate(_DIRS):
            opp = i ^ 1
            h = total - inc[opp]                      # (B,H,W,K)
            # m'(k) = min_k' ( h(k') + V(k', k) ); note V computed with
            # the SENDER's dvals on both axes — receiver candidates
            # differ per pixel, approximated by the sender's (the
            # classic CSBP message approximation)
            msg = jnp.min(h[..., :, None] + V, axis=-2)
            msg = msg - jnp.mean(msg, axis=-1, keepdims=True)
            new.append(msg)
        return jnp.stack(new)

    return jax.lax.fori_loop(0, iters, body, msgs)


def _constant_space_match(l, r, cfg: MatcherConfig) -> tuple:
    """True CSBP: hierarchical, keeping only the best nr_plane candidate
    disparities per pixel below the coarsest level
    (cv::cuda::createStereoConstantSpaceBP semantics)."""
    B, H, W = l.shape
    D = cfg.disparity_range
    levels = max(1, min(cfg.bp_levels, 4))
    iters = max(1, cfg.bp_iters)
    K = max(2, min(cfg.csbp_planes, D))

    # image pyramid for data costs
    pyr = [(l, r)]
    for _ in range(levels - 1):
        if min(pyr[-1][0].shape[1], pyr[-1][0].shape[2]) < 16:
            break
        pyr.append((_pool2_img(pyr[-1][0]), _pool2_img(pyr[-1][1])))

    # coarsest: full disparity axis (scaled), standard BP
    lc, rc = pyr[-1]
    scale = 2 ** (len(pyr) - 1)
    Dc = max(K, D // scale)
    Rg, validc = gather_disparity_shifted(rc, 0, Dc)
    data = DATA_WEIGHT * jnp.minimum(jnp.abs(lc[..., None] - Rg), MAX_DATA_TERM)
    data = jnp.where(validc, data, DATA_WEIGHT * MAX_DATA_TERM)
    msgs = jnp.zeros((4,) + data.shape, jnp.float32)
    msgs = _bp_iterate(data, msgs, iters, DISC_SINGLE_JUMP, MAX_DISC_TERM)
    inc = [_shift2d(msgs[i], dy, dx) for i, (dy, dx) in enumerate(_DIRS)]
    belief = data + sum(inc)
    # select the best K candidate planes per pixel
    neg_topk, idx = jax.lax.top_k(-belief, K)
    dvals = idx.astype(jnp.float32)
    msgs = jnp.stack([jnp.take_along_axis(msgs[i], idx, axis=-1)
                      for i in range(4)])

    # refine down the pyramid on candidate planes
    for li in range(len(pyr) - 2, -1, -1):
        lf, rf = pyr[li]
        Bh, Hh, Wh = lf.shape
        dvals = 2.0 * _up2(dvals, Hh, Wh)
        msgs = jnp.stack([_up2(msgs[i], Hh, Wh) for i in range(4)])
        # data cost at candidate disparities: per-pixel gather
        xs = jnp.arange(Wh, dtype=jnp.int32)[None, None, :, None]
        src = xs - jnp.round(dvals).astype(jnp.int32)
        ok = (src >= 0) & (src < Wh)
        src_c = jnp.clip(src, 0, Wh - 1)
        Rg = jnp.take_along_axis(rf[..., None], src_c, axis=2)
        data = DATA_WEIGHT * jnp.minimum(jnp.abs(lf[..., None] - Rg),
                                         MAX_DATA_TERM)
        data = jnp.where(ok, data, DATA_WEIGHT * MAX_DATA_TERM)
        msgs = _bp_iterate_planes(data, dvals, msgs, iters,
                                  DISC_SINGLE_JUMP, MAX_DISC_TERM)

    inc = [_shift2d(msgs[i], dy, dx) for i, (dy, dx) in enumerate(_DIRS)]
    belief = data + sum(inc)
    kbest = jnp.argmin(belief, axis=-1)
    disp = jnp.take_along_axis(dvals, kbest[..., None], axis=-1)[..., 0]
    okb = jnp.take_along_axis(ok, kbest[..., None], axis=-1)[..., 0]
    return disp, okb


def _pool2_img(x: jax.Array) -> jax.Array:
    B, H, W = x.shape
    H2, W2 = H // 2 * 2, W // 2 * 2
    return x[:, :H2, :W2].reshape(B, H2 // 2, 2, W2 // 2, 2).mean(axis=(2, 4))


def _up2(x: jax.Array, H: int, W: int) -> jax.Array:
    """Nearest upsample (B, h, w, K) -> (B, H, W, K)."""
    r = x.repeat(2, axis=1).repeat(2, axis=2)
    out = jnp.zeros((x.shape[0], H, W, x.shape[-1]), x.dtype)
    h = min(H, r.shape[1])
    w = min(W, r.shape[2])
    out = out.at[:, :h, :w].set(r[:, :h, :w])
    if h < H:
        out = out.at[:, h:].set(out[:, h - 1:h])
    if w < W:
        out = out.at[:, :, w:].set(out[:, :, w - 1:w])
    return out


def belief_propagation_match(left, right, cfg: MatcherConfig, *,
                             constant_space: bool, st=None) -> MatchResult:
    # st: static gating shadow of cfg (see registry._postprocess); the BP
    # gates only read int fields which stay static, so st is accepted for
    # interface uniformity
    batched = left.ndim == 3
    l = left if batched else left[None]
    r = right if batched else right[None]
    l = l.astype(jnp.float32)
    r = r.astype(jnp.float32)
    B, H, W = l.shape
    D = cfg.disparity_range
    levels = max(1, min(cfg.bp_levels, 5))
    iters = max(1, cfg.bp_iters)

    if constant_space:
        disp, ok = _constant_space_match(l, r, cfg)
        if cfg.speckle_size > 0:
            ok = speckle_filter(disp, ok, max_size=cfg.speckle_size,
                                max_diff=jnp.maximum(cfg.speckle_range, 1.0))
        res = MatchResult(disparity=disp, valid=ok)
        if not batched:
            res = MatchResult(disparity=res.disparity[0], valid=res.valid[0])
        return res

    Rg, valid = gather_disparity_shifted(r, cfg.min_disparity, D)
    raw = jnp.abs(l[..., None] - Rg)
    data0 = DATA_WEIGHT * jnp.minimum(raw, MAX_DATA_TERM)
    data0 = jnp.where(valid, data0, DATA_WEIGHT * MAX_DATA_TERM)

    # build cost pyramid (sum-pool); keep list fine -> coarse
    pyr = [data0]
    for _ in range(levels - 1):
        if min(pyr[-1].shape[1], pyr[-1].shape[2]) < 8:
            break
        pyr.append(_pool2(pyr[-1]))

    msgs = jnp.zeros((4,) + pyr[-1].shape, jnp.float32)
    for li in range(len(pyr) - 1, -1, -1):
        data = pyr[li]
        if msgs.shape[2:4] != data.shape[1:3]:
            msgs = _upsample_msgs(msgs, data.shape[1], data.shape[2])
        msgs = _bp_iterate(data, msgs, iters, DISC_SINGLE_JUMP, MAX_DISC_TERM)

    inc = [_shift2d(msgs[i], dy, dx) for i, (dy, dx) in enumerate(_DIRS)]
    belief = data0 + inc[0] + inc[1] + inc[2] + inc[3]
    belief = jnp.where(valid, belief, BIG)

    disp, ok = wta_disparity(belief, cfg.min_disparity,
                             uniqueness_ratio=0.0, subpixel=cfg.subpixel)
    if constant_space and cfg.speckle_size > 0:
        ok = speckle_filter(disp, ok, max_size=cfg.speckle_size,
                            max_diff=jnp.maximum(cfg.speckle_range, 1.0))
    res = MatchResult(disparity=disp, valid=ok)
    if not batched:
        res = MatchResult(disparity=res.disparity[0], valid=res.valid[0])
    return res

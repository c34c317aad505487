"""Stage profile of the fused_t flagship path at 2448x2048 (diagnosis aid).

Times each component of matchers.pyramid._match_level_fused_t at level-0
shapes on the real chip. Run: python profile_t.py
"""
import json

import numpy as np

from bench import _enable_compile_cache, _synthetic_pair, _time_fn

_enable_compile_cache()

import jax
import jax.numpy as jnp

from i3dr_stereo_tpu.ops.block_gather import block_anchors, block_shift_gather
from i3dr_stereo_tpu.ops.census import census_transform
from i3dr_stereo_tpu.ops.median import median3x3, median3x3_masked
from i3dr_stereo_tpu.ops.sgm_fused_t import (fused_census_fwd_t,
                                             hsweep_rev_sum_t, vsweep_down_t,
                                             vsweep_up_wta_t)
from i3dr_stereo_tpu.ops.speckle import speckle_filter

H, W, D = 2048, 2448, 32
Hp, Wp = 2048, 2560
l, r = _synthetic_pair(H, W)
L = jax.device_put(l[None])
R = jax.device_put(r[None])
out = {}

pad2 = ((0, 0), (0, Hp - H), (0, Wp - W))
Lp = jnp.pad(L, pad2, mode="edge")
Rp = jnp.pad(R, pad2, mode="edge")

# 1. census on transposed image
f_cen = jax.jit(lambda x: jnp.moveaxis(
    census_transform(jnp.transpose(x, (0, 2, 1)), 9, 9), -1, 0))
out["censusT_9x9"] = _time_fn(f_cen, (Lp,), iters=3)
clT = f_cen(Lp)
crT = f_cen(Rp)

# 2. block-shift warp (pred-int warp of right image)
pred = jnp.full((1, Hp, Wp), 20, jnp.int32)
q = block_anchors(pred)


def warp(x):
    qq = block_anchors(pred)
    pe = jnp.clip(pred, jnp.repeat(jnp.repeat(qq, 8, 1), 128, 2) - D // 2,
                  jnp.repeat(jnp.repeat(qq, 8, 1), 128, 2) + D // 2)
    return block_shift_gather(x, pe, qq, D // 2)


out["block_shift_warp"] = _time_fn(jax.jit(warp), (Rp,), iters=3)

# 3. fused fwd
pf = (8.0, 64.0)
f_fwd = jax.jit(lambda a, b: fused_census_fwd_t(
    a, b, D, pf[0], pf[1], bpm=-D // 2, W_real=W, H_real=H))
out["fwd_t"] = _time_fn(lambda a, b: f_fwd(a, b)[0], (clT, crT), iters=3)
C, S_fwd = f_fwd(clT, crT)

# 4. rev sweep + sum
f_rev = jax.jit(lambda c, s: hsweep_rev_sum_t(c, s, pf[0], pf[1]))
out["rev_t"] = _time_fn(f_rev, (C, S_fwd), iters=3)
S_h = f_rev(C, S_fwd)

# 5. transposes
f_tc = jax.jit(lambda c: jnp.transpose(c, (0, 3, 2, 1)))
out["transpose_C_u8"] = _time_fn(f_tc, (C,), iters=3)
out["transpose_Sh_i16"] = _time_fn(f_tc, (S_h,), iters=3)
C_T = f_tc(C)
S_hT = f_tc(S_h)

# 6. vertical down (3 dirs for 8-dir case; flagship default 4 dir => 1 shift)
f_vd = jax.jit(lambda c: vsweep_down_t(c, (0,), ((8.0, 64.0),)))
out["vdown_t_1dir"] = _time_fn(f_vd, (C_T,), iters=3)
S_down = f_vd(C_T)

# 7. vertical up + WTA
f_vu = jax.jit(lambda c, sh, sd: vsweep_up_wta_t(
    c, sh, sd, (0,), ((8.0, 64.0),), subpixel=True))
out["vup_wta_t_1dir"] = _time_fn(f_vu, (C_T, S_hT, S_down), iters=3)
disp = f_vu(C_T, S_hT, S_down)[:, :H, :W]

# 8. backmatch blocked
dq = block_anchors(jnp.round(jnp.pad(disp, pad2, mode="edge")).astype(jnp.int32))


def backm(d):
    dp = jnp.pad(d, pad2, mode="edge")
    di = jnp.round(dp).astype(jnp.int32)
    return block_shift_gather(dp, di, dq, D + 1)


out["backmatch_blocked"] = _time_fn(jax.jit(backm), (disp,), iters=3)

# 9. speckle ds2
valid = disp > -1e8
f_spk = jax.jit(lambda d: speckle_filter(d, valid, max_size=100, max_diff=0.5,
                                         downsample=2))
out["speckle_ds2"] = _time_fn(f_spk, (disp,), iters=2)

# 10. medians
out["median3x3"] = _time_fn(jax.jit(median3x3), (disp,), iters=3)
f_mm = jax.jit(lambda d: median3x3_masked(d, valid))
out["median3x3_masked"] = _time_fn(f_mm, (disp,), iters=3)

for k, v in out.items():
    print(json.dumps({"stage": k, "ms": round(v * 1e3, 3)}), flush=True)
print(json.dumps({"stage": "TOTAL_listed", "ms": round(sum(out.values()) * 1e3, 3)}))

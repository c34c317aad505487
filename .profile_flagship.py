"""Profile the actual flagship path, component by component, on TPU."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench as B  # noqa: E402

B._enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from i3dr_stereo_tpu.ops.block_gather import block_anchors, block_shift_gather  # noqa: E402
from i3dr_stereo_tpu.ops.census import census_transform  # noqa: E402
from i3dr_stereo_tpu.ops.median import median3x3, median3x3_masked  # noqa: E402
from i3dr_stereo_tpu.ops.sgm_fused_t import census_sgm_wta_t  # noqa: E402
from i3dr_stereo_tpu.ops.speckle import speckle_filter  # noqa: E402

H, W = 2048, 2448
l, r = B._synthetic_pair(H, W)
L = jax.device_put(l[None])
R = jax.device_put(r[None])


def rec(name, v):
    print(json.dumps({"metric": name, "ms": round(v * 1e3, 3)}), flush=True)


from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm  # noqa: E402
from i3dr_stereo_tpu.matchers.registry import MATCHER_REGISTRY  # noqa: E402
cfg = ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(
    disparity_range=256, max_pyramid_level=4,
    speckle_size=100, speckle_downsample=2, median_filter=True)
impl = MATCHER_REGISTRY[cfg.algorithm]
fl = jax.jit(lambda a, b: impl(a, b, cfg).disparity)
rec("flagship_total", B._time_fn(fl, (L, R), iters=3))


def ceil_to(v, m):
    return (v + m - 1) // m * m


# per-level fused_t kernel time (K=32)
K8 = 32
pens = tuple((8.0, 64.0) for _ in range(4))
for lv in [0, 1, 2]:
    Hh, Wh = H >> lv, W >> lv
    ll = L[:, :Hh, :Wh]
    Hp, Wp = ceil_to(Hh, 128), ceil_to(Wh, 128)

    def level_fn(x, Hp=Hp, Wp=Wp, Hh=Hh, Wh=Wh, lv=lv):
        xp = jnp.pad(x, ((0, 0), (0, Hp - Hh), (0, Wp - Wh)), mode="edge")
        clT = jnp.moveaxis(
            census_transform(jnp.transpose(xp, (0, 2, 1)), 9, 9), -1, 0)
        d, _ = census_sgm_wta_t(clT, clT, K8, bpm=-16, W_real=Wh, H_real=Hh,
                                pens=pens, directions=4, subpixel=(lv == 0))
        return d
    rec(f"censusT_sgmT_wta_L{lv}", B._time_fn(jax.jit(level_fn), (ll,), iters=3))

# block gather at L0 (the warp)
pred = jnp.full((1, ceil_to(H, 128), ceil_to(W, 128)), 20, jnp.int32)
q = block_anchors(pred)
Rp = jnp.pad(R, ((0, 0), (0, ceil_to(H, 128) - H), (0, ceil_to(W, 128) - W)),
             mode="edge")
f_bg = jax.jit(lambda x: block_shift_gather(x, pred, q, 16))
rec("block_shift_gather_L0", B._time_fn(f_bg, (Rp,), iters=3))

disp0 = jnp.asarray(
    np.random.default_rng(0).uniform(0, 64, (1, H, W)).astype(np.float32))
f_spk = jax.jit(lambda d: speckle_filter(d, jnp.ones(d.shape, bool),
                                         max_size=100, max_diff=0.5,
                                         downsample=2))
rec("speckle_ds2", B._time_fn(f_spk, (disp0,), iters=2))
f_spk4 = jax.jit(lambda d: speckle_filter(d, jnp.ones(d.shape, bool),
                                          max_size=100, max_diff=0.5,
                                          downsample=4))
rec("speckle_ds4", B._time_fn(f_spk4, (disp0,), iters=2))

rec("median3x3_full", B._time_fn(jax.jit(median3x3), (disp0,), iters=3))
f_mm = jax.jit(lambda d: median3x3_masked(d, d > 20.0))
rec("median3x3_masked", B._time_fn(f_mm, (disp0,), iters=3))

C = jnp.zeros((1, ceil_to(W, 128), 32, ceil_to(H, 128)), jnp.uint8)
f_tr = jax.jit(lambda c: jnp.transpose(c, (0, 3, 2, 1)) + 1)
rec("transpose_C_u8", B._time_fn(f_tr, (C,), iters=3))

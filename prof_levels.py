"""Per-level increments + resize costs for the flagship pyramid."""
import json
from bench import _enable_compile_cache, _synthetic_pair, _time_fn
_enable_compile_cache()
import jax, jax.numpy as jnp
from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
from i3dr_stereo_tpu.matchers.registry import MATCHER_REGISTRY

H, W = 2048, 2448
l, r = _synthetic_pair(H, W)
L = jax.device_put(l[None]); R = jax.device_put(r[None])
base = ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(
    disparity_range=256, speckle_size=0, median_filter=True)
impl = MATCHER_REGISTRY[Algorithm.I3DRSGM]
for n in (1, 2, 3, 4):
    cfg = base.replace(max_pyramid_level=n)
    fn = jax.jit(lambda a, b, c=cfg: impl(a, b, c).disparity)
    dt = _time_fn(fn, (L, R), iters=3)
    print(json.dumps({"levels": n, "ms": round(dt*1e3, 2)}), flush=True)

# resize pieces at L0 scale
from i3dr_stereo_tpu.matchers.pyramid import _downsample2, _upsample2_disp
from i3dr_stereo_tpu.ops.median import median3x3
d1 = _downsample2(L)
f_up = jax.jit(lambda x: _upsample2_disp(x, H, W))
print(json.dumps({"stage": "upsample2_to_L0", "ms": round(_time_fn(f_up, (d1,), iters=3)*1e3, 3)}), flush=True)
f_dn = jax.jit(_downsample2)
print(json.dumps({"stage": "downsample2_L0", "ms": round(_time_fn(f_dn, (L,), iters=3)*1e3, 3)}), flush=True)
f_med = jax.jit(median3x3)
print(json.dumps({"stage": "median3x3_L0", "ms": round(_time_fn(f_med, (L,), iters=3)*1e3, 3)}), flush=True)

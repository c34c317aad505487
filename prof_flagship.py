"""Flagship timing split: full pyramid with/without speckle, per-depth.
Run: python prof_flagship.py
"""
import json

from bench import _enable_compile_cache, _synthetic_pair, _time_fn

_enable_compile_cache()

import jax

from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
from i3dr_stereo_tpu.matchers.registry import MATCHER_REGISTRY

H, W = 2048, 2448
l, r = _synthetic_pair(H, W)
L = jax.device_put(l[None])
R = jax.device_put(r[None])

base = ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(
    disparity_range=256, max_pyramid_level=4,
    speckle_size=100, speckle_downsample=2, median_filter=True)

variants = {
    "flagship": base,
    "no_speckle": base.replace(speckle_size=0),
    "no_speckle_no_backmatch": base.replace(speckle_size=0,
                                            backmatch_distance=-1.0),
    "no_speckle_no_median": base.replace(speckle_size=0, median_filter=False),
    "L0_only": base.replace(speckle_size=0, max_pyramid_level=1),
}

impl = MATCHER_REGISTRY[Algorithm.I3DRSGM]
for name, cfg in variants.items():
    fn = jax.jit(lambda a, b, c=cfg: impl(a, b, c).disparity)
    dt = _time_fn(fn, (L, R), iters=3)
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2),
                      "fps": round(1 / dt, 2)}), flush=True)

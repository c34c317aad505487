"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Flagship metric (BASELINE.md): SGM disparity frames/sec/chip at
2448x2048 with an effective 256-disparity search (pyramid census SGM —
the same coarse-to-fine trick the reference's licensed engine uses to
hit real time at this resolution). Baseline target: 30 FPS/chip.

Extra configs (BASELINE.json "configs") are runnable via
BENCH_CONFIG={flagship,sgbm_1280,bm_640,pipeline_batch,all}; the driver
default stays the flagship single line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 30.0


def _enable_compile_cache():
    """Persistent compilation cache: tunnel compiles take minutes, so
    warmed executables are reused across bench invocations."""
    try:
        import jax

        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


_enable_compile_cache()


def _synthetic_pair(h, w, max_disp=128, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, (h, w + max_disp)).astype(np.float32)
    # cheap band-limit so census/BT have gradients
    img = 0.25 * (np.roll(img, 1, 1) + np.roll(img, -1, 1)
                  + np.roll(img, 1, 0) + np.roll(img, -1, 0))
    left = img[:, max_disp:]
    right = img[:, : w]  # constant disparity = max_disp... keep simple: shift
    return left, np.roll(left, -max_disp // 4, axis=1)


def _time_fn(fn, args, iters=5, warmup=2):
    """Honest device timing on an async remote runtime.

    Two defenses, both required here:
    - K iterations are chained *inside one jit* via lax.scan (each
      iteration's input depends on the previous output), so the device
      must serialize K real executions per dispatch — plain repeated
      dispatch overlaps/elides identical executions;
    - completion is forced by fetching the scalar result to the host
      (block_until_ready alone acks the RPC, not execution), and the
      (large, variable) dispatch+fetch round-trip is cancelled by
      differencing a K-iteration call against a 2K-iteration call:
      per-iter = (t(2K) - t(K)) / K.
    """
    import jax
    import jax.numpy as jnp

    first, rest = args[0], args[1:]

    def _bump(x0, c):
        # chain the carry into the input without changing dtype semantics
        # (integer inputs: the cast rounds the tiny carry to 0, but the
        # data dependence on the previous iteration's output remains)
        if jnp.issubdtype(x0.dtype, jnp.floating):
            return x0 + c.astype(x0.dtype)
        return x0 + c.astype(jnp.int32).astype(x0.dtype)

    def make_loop(K):
        @jax.jit
        def loop(x0, *r):
            def body(c, _):
                out = fn(_bump(x0, c), *r)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return leaf.ravel()[0].astype(jnp.float32) * 1e-20, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c
        return loop

    K = max(iters, 2)
    loop1 = make_loop(K)
    loop2 = make_loop(2 * K)
    # compile + genuinely execute once each (fetch forces completion)
    float(loop1(first, *rest))
    float(loop2(first, *rest))

    def run(loop, bump):
        if not jnp.issubdtype(first.dtype, jnp.floating):
            bump = jnp.zeros((), first.dtype)  # dependence chain still fresh
        t0 = time.perf_counter()
        float(loop(first + bump, *rest))
        return time.perf_counter() - t0

    # interleave to average out round-trip drift
    t1 = min(run(loop1, 1e-3), run(loop1, 2e-3))
    t2 = min(run(loop2, 3e-3), run(loop2, 4e-3))
    return max((t2 - t1) / K, 1e-9)


def bench_flagship():
    """2448x2048, effective 256+ disparity coverage via 6-level pyramid."""
    import jax

    from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm

    H, W = 2048, 2448
    cfg = ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(
        disparity_range=256, max_pyramid_level=4,
        speckle_size=100, speckle_downsample=2, median_filter=True)
    from i3dr_stereo_tpu.matchers.registry import MATCHER_REGISTRY

    impl = MATCHER_REGISTRY[cfg.algorithm]
    fn = jax.jit(lambda l, r: impl(l, r, cfg).disparity)
    l, r = _synthetic_pair(H, W)
    l = jax.device_put(l[None])
    r = jax.device_put(r[None])
    dt = _time_fn(fn, (l, r))
    fps = 1.0 / dt
    return {
        "metric": "sgm_disparity_fps_2448x2048_256d_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }


def bench_sgbm_1280():
    import jax

    from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
    from i3dr_stereo_tpu.matchers.registry import MATCHER_REGISTRY

    H, W = 1024, 1280
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
        disparity_range=128, window_size=5, speckle_size=0, num_directions=8)
    impl = MATCHER_REGISTRY[cfg.algorithm]
    fn = jax.jit(lambda l, r: impl(l, r, cfg).disparity)
    l, r = _synthetic_pair(H, W)
    dt = _time_fn(fn, (jax.device_put(l[None]), jax.device_put(r[None])))
    return {"metric": "sgbm8_fps_1280x1024_128d", "value": round(1 / dt, 3),
            "unit": "frames/s", "vs_baseline": None}


def bench_bm_640():
    import jax

    from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
    from i3dr_stereo_tpu.matchers.registry import MATCHER_REGISTRY

    H, W = 480, 640
    cfg = ALGORITHM_DEFAULTS[Algorithm.BM].replace(disparity_range=64,
                                                   speckle_size=0)
    impl = MATCHER_REGISTRY[cfg.algorithm]
    fn = jax.jit(lambda l, r: impl(l, r, cfg).disparity)
    l, r = _synthetic_pair(H, W)
    dt = _time_fn(fn, (jax.device_put(l[None]), jax.device_put(r[None])),
                  iters=20, warmup=3)
    return {"metric": "bm_fps_640x480_64d", "value": round(1 / dt, 3),
            "unit": "frames/s", "vs_baseline": None}


def bench_pipeline_batch():
    """Fused rectify -> SGM -> depth on a batched 32-frame stream."""
    import jax

    from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm, PointCloudConfig
    from i3dr_stereo_tpu.core.camera import StereoRig
    from i3dr_stereo_tpu.pipeline.stereo_pipeline import StereoPipeline

    B, H, W = 32, 480, 640
    rig = StereoRig.synthetic(W, H, fx=500.0)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=64,
                                                     window_size=1, p1=8.0,
                                                     p2=32.0, speckle_size=0)
    pipe = StereoPipeline(rig=rig, config=cfg, compute_points=False,
                          cloud=PointCloudConfig(depth_max=100.0))
    l, r = _synthetic_pair(H, W)
    L = jax.device_put(np.broadcast_to(l, (B, H, W)).copy())
    R = jax.device_put(np.broadcast_to(r, (B, H, W)).copy())
    pipe.process(L, R)  # compile
    dt = _time_fn(pipe.process, (L, R), iters=3, warmup=1)
    return {"metric": "fused_pipeline_fps_640x480_64d_batch32",
            "value": round(B / dt, 3), "unit": "frames/s", "vs_baseline": None}


def bench_sgm_direct_2448():
    """BASELINE config 3 taken literally: direct (non-pyramid) census SGM
    over the full 256-disparity range at 2448x2048, uint8 costs + int16
    partial sums, 4 paths, LR-check + speckle fused."""
    import jax
    import jax.numpy as jnp

    from i3dr_stereo_tpu.ops.census import census_transform
    from i3dr_stereo_tpu.ops.fused_cost_sgm import fused_census_sgm
    from i3dr_stereo_tpu.ops.lr_check import lr_consistency
    from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_4
    from i3dr_stereo_tpu.ops.speckle import speckle_filter
    from i3dr_stereo_tpu.ops.wta import wta_disparity

    H, W, D = 2048, 2448, 256

    def fn(l, r):
        cl = census_transform(l, 9, 9)
        cr = census_transform(r, 9, 9)
        S, C = fused_census_sgm(cl, cr, D, base=0, p1=10.0, p2=120.0,
                                directions=DIRECTIONS_4, out_dtype=jnp.int16)
        disp, ok = wta_disparity(S, 0, uniqueness_ratio=10.0, subpixel=True)
        ok = ok & (jnp.min(C, axis=-1) < 255)
        disp, ok = lr_consistency(disp, ok, S.astype(jnp.float32), 0, 1.5)
        ok = speckle_filter(disp, ok, max_size=100, max_diff=0.5)
        return jnp.where(ok, disp, -10000.0)

    l, r = _synthetic_pair(H, W)
    jfn = __import__("jax").jit(fn)
    dt = _time_fn(jfn, (jax.device_put(l[None]), jax.device_put(r[None])),
                  iters=3)
    return {"metric": "sgm_direct_fps_2448x2048_256d", "value": round(1 / dt, 3),
            "unit": "frames/s", "vs_baseline": round(1 / dt / BASELINE_FPS, 3)}


def bench_stages():
    """Stage-level timing of the ACTUAL flagship components at full
    resolution (diagnosis aid; prints one line per stage)."""
    import jax
    import jax.numpy as jnp

    from i3dr_stereo_tpu.ops.census import census_transform
    from i3dr_stereo_tpu.ops.fused_cost_sgm import fused_census_sgm
    from i3dr_stereo_tpu.ops.median import median3x3
    from i3dr_stereo_tpu.ops.speckle import speckle_filter
    from i3dr_stereo_tpu.ops.wta import wta_disparity

    H, W, K = 2048, 2448, 32
    l, r = _synthetic_pair(H, W)
    L = jax.device_put(l[None])
    R = jax.device_put(r[None])
    out = {}

    f_census = jax.jit(lambda x: census_transform(x, 9, 9))
    out["census_9x9"] = _time_fn(f_census, (L,), iters=3)
    CL = f_census(L)
    CR = f_census(R)

    # the fused cost+SGM at level 0 (the heart of the flagship)
    def fsgm(x):
        cl = census_transform(x, 9, 9)
        S, C = fused_census_sgm(cl, CR, K, base=-K // 2, p1=8.0, p2=64.0,
                                directions=((0, 1), (0, -1), (1, 0), (-1, 0)),
                                out_dtype=jnp.int16)
        return S
    out["fused_sgm4_K32_L0"] = _time_fn(jax.jit(fsgm), (L,), iters=3)

    # warp gather (per-pixel image gather)
    pred = jnp.zeros((1, H, W), jnp.int32) + 20
    def warp(x):
        xs = jnp.arange(W, dtype=jnp.int32)[None, None, :]
        src = jnp.clip(xs - pred, 0, W - 1)
        return jnp.take_along_axis(x, src, axis=2)
    out["warp_gather"] = _time_fn(jax.jit(warp), (R,), iters=3)

    # round-trip backmatch gather
    disp0 = jnp.full((1, H, W), 20.0)
    def roundtrip(d):
        d_int = jnp.round(d).astype(jnp.int32)
        xr = jnp.arange(W, dtype=jnp.int32)[None, None, :] - d_int
        xr_c = jnp.clip(xr, 0, W - 1)
        return jnp.take_along_axis(d, xr_c, axis=2)
    out["backmatch_gather"] = _time_fn(jax.jit(roundtrip), (disp0,), iters=3)

    S0 = jax.jit(fsgm)(L)
    f_wta = jax.jit(lambda s: wta_disparity(s, 0, uniqueness_ratio=0.0,
                                            subpixel=True)[0])
    out["wta_K32"] = _time_fn(f_wta, (S0.astype(jnp.float32),), iters=3)

    disp = f_wta(S0.astype(jnp.float32))
    out["median3x3"] = _time_fn(jax.jit(median3x3), (disp,), iters=3)

    f_spk2 = jax.jit(lambda d: speckle_filter(d, jnp.ones(d.shape, bool),
                                              max_size=100, max_diff=0.5,
                                              downsample=2))
    out["speckle_ds2"] = _time_fn(f_spk2, (disp,), iters=2)

    # pyramid overhead: downsample chain + upsample predictions
    def pyr_overhead(x):
        from i3dr_stereo_tpu.matchers.pyramid import _downsample2, _upsample2_disp
        a = _downsample2(x)
        b = _downsample2(a)
        c = _downsample2(b)
        d = _upsample2_disp(c[..., ::1], b.shape[1], b.shape[2])
        e = _upsample2_disp(d, a.shape[1], a.shape[2])
        f = _upsample2_disp(e, x.shape[1], x.shape[2])
        return f
    out["pyramid_resizes"] = _time_fn(jax.jit(pyr_overhead), (L,), iters=3)

    for k, v in out.items():
        print(json.dumps({"metric": f"stage_{k}_ms", "value": round(v * 1e3, 3),
                          "unit": "ms", "vs_baseline": None}), flush=True)
    return {"metric": "stages_done", "value": 1, "unit": "", "vs_baseline": None}


BENCHES = {
    "flagship": bench_flagship,
    "sgbm_1280": bench_sgbm_1280,
    "bm_640": bench_bm_640,
    "pipeline_batch": bench_pipeline_batch,
    "sgm_direct_2448": bench_sgm_direct_2448,
    "stages": bench_stages,
}


def _run_safe(name, fn):
    try:
        return fn()
    except Exception as e:  # never leave the driver without a line
        return {"metric": name, "value": 0.0, "unit": "frames/s",
                "vs_baseline": 0.0, "error": repr(e)[:300]}


def main():
    which = os.environ.get("BENCH_CONFIG", "flagship")
    if which == "all":
        for name, fn in BENCHES.items():
            print(json.dumps(_run_safe(name, fn)), flush=True)
        return
    print(json.dumps(_run_safe(which, BENCHES[which])), flush=True)


if __name__ == "__main__":
    main()

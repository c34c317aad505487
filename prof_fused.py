"""Per-ms reconciliation of the FUSED full-res pipeline program.

Round-4 verdict weak #1: the fused ingest->rectify->pyramid-SGM->depth
program ran at 40.6 ms while the standalone per-stage sum was 26.4 ms,
with the gap unaccounted. This script attributes every ms by ablation:
the SAME StereoPipeline fused program is re-jitted with one stage
removed at a time (XLA dead-code-eliminates the disabled stage), and the
delta against the full program is that stage's marginal cost INSIDE the
fused program (including any relayouts it forces). Ablations are
cumulative-safe: each row is (full - variant), measured with the
scan-differencing timer (see bench._time_fn).

Run: python prof_fused.py   (on the TPU; ~10 min fresh compiles)
"""
import json

from bench import _enable_compile_cache, _time_fn

_enable_compile_cache()

import cv2  # noqa: E402
import jax  # noqa: E402
import numpy as np  # noqa: E402

from i3dr_stereo_tpu.config.params import PointCloudConfig  # noqa: E402
from i3dr_stereo_tpu.core.camera import CameraModel, StereoRig  # noqa: E402
from i3dr_stereo_tpu.io.synthetic import layered_scene  # noqa: E402
from i3dr_stereo_tpu.pipeline.stereo_pipeline import StereoPipeline  # noqa: E402

H, W = 2048, 2448


def _rig():
    K = np.array([[2400.0, 0, 1224.0], [0, 2400.0, 1024.0], [0, 0, 1]])
    D = np.array([-0.18, 0.06, 0.0008, -0.0006, 0.0])
    Pl = np.array([[2380.0, 0, 1220.0, 0], [0, 2380.0, 1022.0, 0],
                   [0, 0, 1, 0]])
    Pr = Pl.copy()
    Pr[0, 3] = -2380.0 * 0.3
    Rl = cv2.Rodrigues(np.array([0.004, -0.006, 0.002]))[0]
    Rr = cv2.Rodrigues(np.array([-0.003, 0.005, -0.002]))[0]
    return StereoRig(left=CameraModel(W, H, K, D, Rl, Pl),
                     right=CameraModel(W, H, K, D, Rr, Pr))


def _flagship_cfg():
    from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm

    return ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(
        disparity_range=256, max_pyramid_level=4,
        speckle_size=100, speckle_downsample=2, median_filter=True)


def time_pipe(pipe, L, R):
    pipe.process(L, R)  # compile
    step = next(iter(pipe._cache.values()))
    leaf = (lambda out: out.depth if out.depth is not None
            else out.disparity)
    return _time_fn(
        lambda l, r, dyn, lm, rm, q: leaf(step(l, r, dyn, lm, rm, q)),
        (L, R, pipe._dyn_values(), pipe._lmap, pipe._rmap, pipe._Q),
        iters=3, warmup=1)


def main():
    rig = _rig()
    cfg = _flagship_cfg()
    sc = layered_scene(H, W, max_disp=200, background_disp=16, layers=6,
                       seed=10)
    L = jax.device_put(sc.left.astype(np.uint8))
    R = jax.device_put(sc.right.astype(np.uint8))

    def pipe(cfg=cfg, **kw):
        kw.setdefault("rectify_inputs", True)
        kw.setdefault("compute_points", False)
        kw.setdefault("compute_depth", True)
        return StereoPipeline(rig=rig, config=cfg,
                              cloud=PointCloudConfig(depth_max=100.0), **kw)

    rows = {}
    full = pipe()
    rows["full"] = time_pipe(full, L, R)
    base_ms = rows["full"] * 1e3
    print(json.dumps({"variant": "full", "ms": round(base_ms, 2),
                      "fps": round(1e3 / base_ms, 2)}), flush=True)

    variants = {
        "no_rectify": dict(kw=dict(rectify_inputs=False)),
        "no_depth": dict(kw=dict(compute_depth=False)),
        "no_speckle": dict(cfg=cfg.replace(speckle_size=0)),
        "no_backmatch": dict(cfg=cfg.replace(backmatch_distance=-1.0)),
        "no_median": dict(cfg=cfg.replace(median_filter=False)),
        "no_subpixel": dict(cfg=cfg.replace(subpixel=False)),
        "no_uniqueness": dict(cfg=cfg.replace(uniqueness_ratio=0.0)),
        "L0_only": dict(cfg=cfg.replace(max_pyramid_level=1)),
        "levels_2": dict(cfg=cfg.replace(max_pyramid_level=2)),
        "levels_3": dict(cfg=cfg.replace(max_pyramid_level=3)),
    }
    import os

    only = os.environ.get("PROF_VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}
    for name, v in variants.items():
        p = pipe(cfg=v.get("cfg", cfg), **v.get("kw", {}))
        dt = time_pipe(p, L, R)
        rows[name] = dt
        print(json.dumps({
            "variant": name, "ms": round(dt * 1e3, 2),
            "fps": round(1 / dt, 2),
            "marginal_ms": round(base_ms - dt * 1e3, 2)}), flush=True)

    print(json.dumps({"summary": {k: round(v * 1e3, 2)
                                  for k, v in rows.items()}}), flush=True)


if __name__ == "__main__":
    main()

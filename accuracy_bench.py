"""Accuracy gates at the reference's own operating points -> ACCURACY_rN.json.

BASELINE.json measurement configs exercised at full scale (the CI oracle
tests run the same comparisons at reduced sizes):

1. SGBM vs cv2.StereoSGBM MODE_HH at 1280x1024, 128 disparities,
   subpixel on (BASELINE config 2 / subpix.param operating point;
   reference defaults launch/stereo_matcher.launch:37-38).
2. Pyramid I3DRSGM engine at 2448x2048, 256-disparity coverage, vs
   exact synthetic ground truth AND vs cv2.StereoSGBM on the same pair.

Gate: <0.25 px median (BASELINE.md). Run from /root/repo:
    python accuracy_bench.py [out.json]        # TPU if available
    JAX_PLATFORMS=cpu python accuracy_bench.py # CPU
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import cv2  # noqa: E402
import numpy as np  # noqa: E402

from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm  # noqa: E402
from i3dr_stereo_tpu.io.synthetic import layered_scene  # noqa: E402
from i3dr_stereo_tpu.matchers import create_matcher  # noqa: E402


def _cv_sgbm(left, right, *, min_disp=0, num_disp=128, block=5, p1=200,
             p2=400, uniq=10):
    m = cv2.StereoSGBM_create(
        minDisparity=min_disp, numDisparities=num_disp, blockSize=block,
        P1=p1, P2=p2, disp12MaxDiff=1, preFilterCap=31,
        uniquenessRatio=uniq, speckleWindowSize=0, speckleRange=0,
        mode=cv2.STEREO_SGBM_MODE_HH)
    d = m.compute(left.astype(np.uint8), right.astype(np.uint8))
    return d.astype(np.float32) / 16.0, d > (min_disp - 1) * 16


def sgbm_1280() -> dict:
    """BASELINE config 2: 1280x1024, 128 disparities, subpixel."""
    sc = layered_scene(1024, 1280, max_disp=120, background_disp=8,
                       layers=5, seed=21)
    cv_disp, cv_valid = _cv_sgbm(sc.left, sc.right)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
        disparity_range=128, window_size=5, p1=200.0, p2=400.0,
        uniqueness_ratio=10.0, disp12_max_diff=1.0, speckle_size=0,
        num_directions=8, subpixel=True)
    res = create_matcher(cfg).match(sc.left, sc.right)
    ours, ov = np.asarray(res.disparity), np.asarray(res.valid)
    both = cv_valid & ov & sc.valid
    med_vs_cv = float(np.median(np.abs(ours - cv_disp)[both]))
    med_vs_gt = float(np.median(np.abs(ours - sc.disparity)[both]))
    return {"config": "sgbm_1280x1024_128d_subpix",
            "density": round(float(both.mean()), 3),
            "median_px_vs_cv_sgbm": round(med_vs_cv, 4),
            "median_px_vs_gt": round(med_vs_gt, 4),
            "gate_lt": 0.25, "pass": med_vs_cv < 0.25}


def i3drsgm_2448() -> dict:
    """BASELINE config 3 accuracy side: pyramid engine at full res vs
    exact GT and vs cv2 SGBM on the same frame."""
    sc = layered_scene(2048, 2448, max_disp=200, background_disp=16,
                       layers=6, seed=1)
    cfg = ALGORITHM_DEFAULTS[Algorithm.I3DRSGM].replace(
        disparity_range=256, max_pyramid_level=4,
        speckle_size=100, speckle_downsample=2, median_filter=True)
    res = create_matcher(cfg).match(sc.left, sc.right)
    ours, ov = np.asarray(res.disparity), np.asarray(res.valid)
    sel = ov & sc.valid
    med_gt = float(np.median(np.abs(ours - sc.disparity)[sel]))

    cv_disp, cv_valid = _cv_sgbm(sc.left, sc.right, num_disp=256)
    both = sel & cv_valid
    med_cv = float(np.median(np.abs(ours - cv_disp)[both]))
    cv_gt = float(np.median(np.abs(cv_disp - sc.disparity)[both]))
    return {"config": "i3drsgm_pyramid_2448x2048_256d",
            "density": round(float(sel.mean()), 3),
            "median_px_vs_gt": round(med_gt, 4),
            "median_px_vs_cv_sgbm": round(med_cv, 4),
            "cv_sgbm_median_px_vs_gt": round(cv_gt, 4),
            "gate_lt": 0.25, "pass": med_gt < 0.25}


def main(out_path: str = "ACCURACY_r03.json") -> None:
    rows = [sgbm_1280(), i3drsgm_2448()]
    doc = {"gate": "<0.25 px median (BASELINE.md)",
           "all_pass": all(r["pass"] for r in rows), "rows": rows}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main(*sys.argv[1:2])

"""Accuracy oracle: our SGBM/BM backends vs OpenCV's, the reference's
actual matchers (matcherOpenCVSGBM.cpp / matcherOpenCVBlock.cpp).

BASELINE.md target: <0.25 px median disparity error vs reference SGBM at
matched parameters.
"""

import cv2
import numpy as np
import pytest

from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
from i3dr_stereo_tpu.io.synthetic import layered_scene, slanted_scene
from i3dr_stereo_tpu.matchers import create_matcher


def _cv_sgbm(left, right, *, min_disp=0, num_disp=32, block=5, p1=200, p2=400,
             uniq=10, mode=cv2.STEREO_SGBM_MODE_HH):
    m = cv2.StereoSGBM_create(
        minDisparity=min_disp, numDisparities=num_disp, blockSize=block,
        P1=p1, P2=p2, disp12MaxDiff=1, preFilterCap=31,
        uniquenessRatio=uniq, speckleWindowSize=0, speckleRange=0, mode=mode)
    d = m.compute(left.astype(np.uint8), right.astype(np.uint8))
    disp = d.astype(np.float32) / 16.0
    valid = d > (min_disp - 1) * 16
    return disp, valid


@pytest.mark.parametrize("scene_fn,seed", [(layered_scene, 11), (layered_scene, 12),
                                           (slanted_scene, 1)])
def test_sgbm_vs_opencv_median(scene_fn, seed):
    if scene_fn is layered_scene:
        sc = scene_fn(128, 160, max_disp=24, seed=seed)
    else:
        sc = scene_fn(128, 160, d_near=20.0, d_far=6.0, seed=seed)
    cv_disp, cv_valid = _cv_sgbm(sc.left, sc.right, num_disp=32, block=5,
                                 p1=200, p2=400, uniq=10)

    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
        disparity_range=32, window_size=5, p1=200.0, p2=400.0,
        uniqueness_ratio=10.0, disp12_max_diff=1.0, speckle_size=0,
        num_directions=8)
    res = create_matcher(cfg).match(sc.left, sc.right)
    our_disp = np.asarray(res.disparity)
    our_valid = np.asarray(res.valid)

    both = cv_valid & our_valid & sc.valid
    assert both.mean() > 0.5
    diff = np.abs(our_disp - cv_disp)[both]
    med = np.median(diff)
    assert med < 0.25, f"median |ours - SGBM| = {med:.3f} px"
    # and both should be close to ground truth
    assert np.median(np.abs(our_disp - sc.disparity)[both]) < 0.3


def test_bm_vs_opencv_blockmatcher():
    sc = layered_scene(128, 160, max_disp=24, seed=3)
    bm = cv2.StereoBM_create(numDisparities=32, blockSize=9)
    bm.setPreFilterCap(31)
    bm.setTextureThreshold(10)
    bm.setUniquenessRatio(15)
    bm.setSpeckleWindowSize(0)
    d = bm.compute(sc.left.astype(np.uint8), sc.right.astype(np.uint8))
    cv_disp = d.astype(np.float32) / 16.0
    cv_valid = d > -16

    cfg = ALGORITHM_DEFAULTS[Algorithm.BM].replace(
        disparity_range=32, window_size=9, uniqueness_ratio=15.0,
        texture_threshold=10.0, speckle_size=0)
    res = create_matcher(cfg).match(sc.left, sc.right)
    our_disp = np.asarray(res.disparity)
    our_valid = np.asarray(res.valid)

    both = cv_valid & our_valid & sc.valid
    assert both.mean() > 0.4
    med = np.median(np.abs(our_disp - cv_disp)[both])
    assert med < 0.5, f"median |ours - StereoBM| = {med:.3f} px"


def test_bm_normalized_response_prefilter_vs_opencv():
    """prefilter_type='normalized_response' consumes prefilter_size and
    tracks cv::StereoBM's PREFILTER_NORMALIZED_RESPONSE mode
    (matcherOpenCVBlock.cpp:86-108 exposes size+cap for this mode)."""
    sc = layered_scene(128, 160, max_disp=24, seed=6)
    bm = cv2.StereoBM_create(numDisparities=32, blockSize=9)
    bm.setPreFilterType(cv2.STEREO_BM_PREFILTER_NORMALIZED_RESPONSE)
    bm.setPreFilterSize(9)
    bm.setPreFilterCap(31)
    bm.setTextureThreshold(10)
    bm.setUniquenessRatio(15)
    bm.setSpeckleWindowSize(0)
    d = bm.compute(sc.left.astype(np.uint8), sc.right.astype(np.uint8))
    cv_disp = d.astype(np.float32) / 16.0
    cv_valid = d > -16

    cfg = ALGORITHM_DEFAULTS[Algorithm.BM].replace(
        disparity_range=32, window_size=9, uniqueness_ratio=15.0,
        texture_threshold=10.0, speckle_size=0,
        prefilter_type="normalized_response", prefilter_size=9)
    res = create_matcher(cfg).match(sc.left, sc.right)
    our_disp = np.asarray(res.disparity)
    our_valid = np.asarray(res.valid)
    both = cv_valid & our_valid & sc.valid
    assert both.mean() > 0.35
    med = np.median(np.abs(our_disp - cv_disp)[both])
    assert med < 0.5, f"median |ours - StereoBM(norm)| = {med:.3f} px"


def test_prefilter_type_rejected_loudly():
    import pytest

    with pytest.raises(ValueError, match="prefilter_type"):
        ALGORITHM_DEFAULTS[Algorithm.BM].replace(
            prefilter_type="bogus").sanitize()

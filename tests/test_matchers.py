import numpy as np
import pytest

from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
from i3dr_stereo_tpu.io.synthetic import layered_scene, slanted_scene
from i3dr_stereo_tpu.matchers import create_matcher, compute_disparity


def _accuracy(res, scene):
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid)
    sel = v & scene.valid
    err = np.abs(d - scene.disparity)[sel]
    return sel.mean(), np.median(err), (err < 1.0).mean()


@pytest.mark.parametrize("algo", list(Algorithm))
def test_all_backends_layered_scene(algo):
    sc = layered_scene(96, 128, max_disp=20, seed=algo.value)
    cfg = ALGORITHM_DEFAULTS[algo].replace(disparity_range=32, speckle_size=50)
    res = create_matcher(cfg).match(sc.left, sc.right)
    density, med, frac1 = _accuracy(res, sc)
    assert density > 0.5, f"{algo.name}: density {density}"
    assert med < 0.5, f"{algo.name}: median err {med}"
    assert frac1 > 0.9, f"{algo.name}: frac<1px {frac1}"


def test_subpixel_on_slanted_plane():
    sc = slanted_scene(96, 160, d_near=18.0, d_far=6.0)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
        disparity_range=32, speckle_size=0, uniqueness_ratio=5.0)
    res = create_matcher(cfg).match(sc.left, sc.right)
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid) & sc.valid
    err = np.abs(d - sc.disparity)[v]
    assert np.median(err) < 0.35  # subpixel-grade on a slanted plane
    # integer-only matching would give median ~0.25 on the *fractional*
    # part; check we actually produce non-integer disparities
    frac = np.abs(d[v] - np.round(d[v]))
    assert (frac > 0.05).mean() > 0.4


def test_batched_match():
    sc = layered_scene(64, 80, max_disp=12)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=16)
    L = np.stack([sc.left, sc.left])
    R = np.stack([sc.right, sc.right])
    res = create_matcher(cfg).match(L, R)
    assert res.disparity.shape == (2, 64, 80)
    np.testing.assert_allclose(np.asarray(res.disparity[0]),
                               np.asarray(res.disparity[1]))


def test_functional_entry_matches_class():
    sc = layered_scene(64, 80, max_disp=12)
    cfg = ALGORITHM_DEFAULTS[Algorithm.BM].replace(disparity_range=16)
    r1 = create_matcher(cfg).match(sc.left, sc.right)
    r2 = compute_disparity(sc.left, sc.right, cfg)
    np.testing.assert_allclose(np.asarray(r1.disparity), np.asarray(r2.disparity))


def test_fixed_point_encoding():
    sc = layered_scene(64, 80, max_disp=12)
    cfg = ALGORITHM_DEFAULTS[Algorithm.BM].replace(disparity_range=16)
    res = create_matcher(cfg).match(sc.left, sc.right)
    fp = np.asarray(res.fixed_point(16, cfg.min_disparity))
    assert fp.dtype == np.int16
    v = np.asarray(res.valid)
    d = np.asarray(res.disparity)
    np.testing.assert_allclose(fp[v], np.round(d[v] * 16))
    assert (fp[~v] == -16).all()  # (minDisparity-1)*16


def test_nodata_encodings():
    sc = layered_scene(64, 80, max_disp=12)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=16)
    res = create_matcher(cfg).match(sc.left, sc.right)
    v = np.asarray(res.valid)
    mz = np.asarray(res.with_missing_z())
    nd = np.asarray(res.with_nodata())
    assert (mz[~v] == 10000.0).all()
    assert (nd[~v] == -10000.0).all()


def test_backward_match():
    sc = layered_scene(64, 96, max_disp=12, background_disp=6)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
        disparity_range=16, speckle_size=0)
    m = create_matcher(cfg)
    res = m.backward_match(sc.left, sc.right)
    # right-anchored disparity of the background is the same constant
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid)
    inner = d[8:-8, 20:-20][v[8:-8, 20:-20]]
    assert np.median(np.abs(inner - 6.0) < 1.0) > 0.8


def test_downsample_scale():
    sc = layered_scene(96, 128, max_disp=16)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
        disparity_range=16, downsample_scale=0.5, speckle_size=0)
    res = create_matcher(cfg).match(sc.left, sc.right)
    assert res.disparity.shape == (96, 128)  # upsampled back
    density, med, frac1 = _accuracy(res, sc)
    assert med < 1.0  # half-res matching: coarser but sane
    assert density > 0.5


def test_live_reconfigure_no_shape_change():
    sc = layered_scene(64, 80, max_disp=12)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=16)
    m = create_matcher(cfg)
    m.match(sc.left, sc.right)
    m.update(p1=100.0, p2=800.0)  # value-only change
    res = m.match(sc.left, sc.right)
    assert res.disparity.shape == (64, 80)
    m.update(disparity_range=32)  # shape change -> recompile path
    res = m.match(sc.left, sc.right)
    assert res.disparity.shape == (64, 80)


def test_min_disparity_offset_search():
    sc = layered_scene(64, 96, max_disp=20, background_disp=12)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
        min_disparity=8, disparity_range=16, speckle_size=0)
    res = create_matcher(cfg).match(sc.left, sc.right)
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid) & sc.valid
    err = np.abs(d - sc.disparity)[v]
    assert np.median(err) < 0.5
    assert (d[np.asarray(res.valid)] >= 8).all()


def test_interp_backward_wls_path():
    """interp=True runs the reference's full interp chain: backward match
    derived from the aggregated volume + LR-confidence WLS filtering
    (matcherOpenCVBlock.cpp:22-33). Everything comes back valid, holes
    are filled from confident neighbours, confident pixels stay put.
    (cv2.ximgproc is absent from this environment, so the gate is
    behavioral rather than an oracle diff.)"""
    sc = layered_scene(96, 128, max_disp=20, seed=3)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=32,
                                                     speckle_size=50)
    base = create_matcher(cfg).match(sc.left, sc.right)
    res = create_matcher(cfg.replace(interp=True)).match(sc.left, sc.right)
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid)
    assert v.all()  # interp marks everything valid (cfg description)
    # global accuracy on ALL pixels (holes included) stays subpixel-good
    err_all = np.abs(d - sc.disparity)[sc.valid]
    assert np.median(err_all) < 0.5
    # pixels that were confidently matched before are anchored
    vb = np.asarray(base.valid) & sc.valid
    same = np.abs(d - np.asarray(base.disparity))[vb]
    assert np.median(same) < 0.1


def test_interp_bm_backend():
    sc = layered_scene(96, 128, max_disp=20, seed=4)
    cfg = ALGORITHM_DEFAULTS[Algorithm.BM].replace(disparity_range=32,
                                                   speckle_size=50,
                                                   interp=True)
    res = create_matcher(cfg).match(sc.left, sc.right)
    assert np.asarray(res.valid).all()
    err_all = np.abs(np.asarray(res.disparity) - sc.disparity)[sc.valid]
    assert np.median(err_all) < 0.75

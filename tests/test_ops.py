import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from i3dr_stereo_tpu.ops.census import census_cost_volume, census_transform
from i3dr_stereo_tpu.ops.cost import (
    bt_cost_volume,
    box_aggregate,
    sad_cost_volume,
    xsobel_prefilter,
)
from i3dr_stereo_tpu.ops.median import median3x3, median3x3_masked
from i3dr_stereo_tpu.ops.speckle import speckle_filter
from i3dr_stereo_tpu.ops.wta import wta_disparity


def rand_img(h, w, seed=0):
    return np.random.default_rng(seed).uniform(0, 255, (h, w)).astype(np.float32)


# ---------------------------------------------------------------- census ----

def test_census_self_cost_zero():
    img = rand_img(32, 40)
    c = census_transform(img[None], 5, 5)
    C, valid = census_cost_volume(c, c, 0, 8)
    C = np.asarray(C)[0]
    assert np.all(C[:, :, 0] == 0)          # d=0 self match
    # random texture: other d costly away from the replicated borders.
    # (census codes of local extrema — all-ones/all-zeros — legitimately
    # collide, so a small zero fraction is expected)
    assert (C[3:-3, 8:-3, 1:] > 0).mean() > 0.99


def test_census_known_shift():
    img = rand_img(32, 64, seed=1)
    right = np.roll(img, -7, axis=1)
    cl = census_transform(img[None], 7, 7)
    cr = census_transform(right[None], 7, 7)
    C, _ = census_cost_volume(cl, cr, 0, 16)
    best = np.asarray(jnp.argmin(C, -1))[0]
    inner = best[4:-4, 12:-12]
    assert (inner == 7).mean() > 0.95


def test_census_bit_count():
    img = rand_img(16, 16)
    c = np.asarray(census_transform(img[None], 9, 9))
    assert c.shape == (1, 16, 16, 3)  # 80 bits -> 3 words
    c5 = np.asarray(census_transform(img[None], 5, 5))
    assert c5.shape == (1, 16, 16, 1)  # 24 bits -> 1 word


# ---------------------------------------------------------------- costs -----

def test_xsobel_matches_reference_formula():
    img = rand_img(20, 20, 2)
    out = np.asarray(xsobel_prefilter(img[None], 31))[0]
    gx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, borderType=cv2.BORDER_REPLICATE)
    expected = np.clip(gx + 31, 0, 62)
    np.testing.assert_allclose(out[1:-1, 1:-1], expected[1:-1, 1:-1], atol=1e-3)


def test_sad_cost_known_shift():
    img = rand_img(24, 48, 4)
    right = np.roll(img, -3, axis=1)
    C, valid = sad_cost_volume(img[None], right[None], 0, 8)
    best = np.asarray(jnp.argmin(C, -1))[0]
    assert (best[:, 8:-8] == 3).mean() > 0.99
    v = np.asarray(valid)[0]
    assert not v[0, 2, 5]  # w=2, d=5 -> src -3 out of image
    assert v[0, 6, 5]


def test_bt_cost_subpixel_tolerance():
    # BT should be near zero for a half-pixel shifted edge, where plain AD is large
    x = np.linspace(0, 1, 32)
    rowL = np.sin(8 * x) * 100 + 100
    rowR = np.interp(x + 0.5 / 32, x, rowL)  # half-sample shift
    L = np.tile(rowL, (8, 1)).astype(np.float32)
    R = np.tile(rowR, (8, 1)).astype(np.float32)
    Cbt, _ = bt_cost_volume(L[None], R[None], 0, 2)
    Csad, _ = sad_cost_volume(L[None], R[None], 0, 2)
    assert np.asarray(Cbt)[0, 4, 16, 0] <= np.asarray(Csad)[0, 4, 16, 0] + 1e-5
    assert np.median(np.asarray(Cbt)[0, :, 2:-2, 0]) < 1.0


def test_box_aggregate_sums_window():
    C = jnp.ones((1, 10, 12, 4))
    valid = jnp.ones((1, 10, 12, 4), bool)
    S = np.asarray(box_aggregate(C, valid, 3))
    assert S[0, 5, 5, 0] == pytest.approx(9.0)


# ---------------------------------------------------------------- wta -------

def test_wta_basic_and_subpixel():
    D = 16
    S = np.full((1, 4, 4, D), 100.0, np.float32)
    S[..., 5] = 10.0
    S[..., 4] = 12.0
    S[..., 6] = 14.0
    disp, valid = wta_disparity(jnp.asarray(S), 0, uniqueness_ratio=0.0, subpixel=True)
    d = np.asarray(disp)[0, 0, 0]
    # parabola: offset = (12-14)/(2*(12+14-20)) = -2/12
    assert d == pytest.approx(5 - 2 / 12, abs=1e-5)
    assert np.asarray(valid).all()


def test_wta_min_disparity_offset():
    S = np.full((1, 2, 2, 8), 50.0, np.float32)
    S[..., 3] = 1.0
    disp, _ = wta_disparity(jnp.asarray(S), 10, uniqueness_ratio=0.0, subpixel=False)
    assert np.asarray(disp)[0, 0, 0] == 13.0


def test_wta_uniqueness_rejects_ambiguous():
    S = np.full((1, 1, 2, 16), 100.0, np.float32)
    S[0, 0, 0, 3] = 10.0
    S[0, 0, 0, 12] = 10.5   # near-tie far away -> reject
    S[0, 0, 1, 3] = 10.0    # unambiguous -> keep
    disp, valid = wta_disparity(jnp.asarray(S), 0, uniqueness_ratio=15.0, subpixel=False)
    v = np.asarray(valid)
    assert not v[0, 0, 0]
    assert v[0, 0, 1]


# ---------------------------------------------------------------- median ----

def test_median3x3_matches_numpy():
    img = rand_img(20, 24, 5)
    out = np.asarray(median3x3(jnp.asarray(img)))
    ref = cv2.medianBlur(img, 3)
    np.testing.assert_allclose(out[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-4)


def test_median_masked_ignores_invalid():
    img = np.ones((8, 8), np.float32)
    img[4, 4] = 100.0  # will be treated as invalid
    valid = np.ones((8, 8), bool)
    valid[4, 4] = False
    out = np.asarray(median3x3_masked(jnp.asarray(img), jnp.asarray(valid)))
    assert out[4, 3] == 1.0
    assert out[3, 4] == 1.0


# ---------------------------------------------------------------- speckle ---

def test_speckle_removes_small_blobs():
    disp = np.zeros((32, 32), np.float32)
    valid = np.ones((32, 32), bool)
    disp[:, :] = 10.0
    disp[5:8, 5:8] = 40.0     # 9-px speckle, disconnected by value
    keep = np.asarray(speckle_filter(jnp.asarray(disp), jnp.asarray(valid),
                                     max_size=20, max_diff=1.0))
    assert not keep[6, 6]
    assert keep[0, 0]
    assert keep[20, 20]


def test_speckle_keeps_large_regions():
    disp = np.zeros((40, 40), np.float32)
    valid = np.ones((40, 40), bool)
    disp[:, :20] = 5.0
    disp[:, 20:] = 30.0       # two big regions, both kept
    keep = np.asarray(speckle_filter(jnp.asarray(disp), jnp.asarray(valid),
                                     max_size=100, max_diff=1.0))
    assert keep.all()


def test_speckle_matches_opencv():
    rng = np.random.default_rng(7)
    disp = (rng.integers(0, 3, (48, 64)) * 20).astype(np.float32)
    disp = cv2.medianBlur(disp, 3)
    cvd = (disp * 16).astype(np.int16)
    cv2.filterSpeckles(cvd, -16, 30, 16)  # maxDiff=1px in x16 units
    cv_invalid = cvd == -16
    keep = np.asarray(speckle_filter(jnp.asarray(disp),
                                     jnp.ones(disp.shape, bool),
                                     max_size=30, max_diff=1.0))
    np.testing.assert_array_equal(~keep, cv_invalid)


def test_speckle_matches_opencv_randomized():
    rng = np.random.default_rng(42)
    for trial in range(3):
        H, W = 96, 128
        disp = (rng.integers(0, 4, (H, W)) * 15).astype(np.float32)
        disp = cv2.medianBlur(disp, 3)
        for _ in range(30):
            y, x = rng.integers(0, H - 4), rng.integers(0, W - 4)
            s = rng.integers(1, 4)
            disp[y:y + s, x:x + s] = rng.integers(0, 60)
        cvd = (disp * 16).astype(np.int16)
        cv2.filterSpeckles(cvd, -16, 25, 16)
        keep = np.asarray(speckle_filter(jnp.asarray(disp),
                                         jnp.ones(disp.shape, bool),
                                         max_size=25, max_diff=1.0))
        np.testing.assert_array_equal(~keep, cvd == -16)

import cv2
import numpy as np
import pytest

from i3dr_stereo_tpu.core.camera import CameraModel
from i3dr_stereo_tpu.ops.rectify import (
    inverse_rectify_map_xy,
    make_rectify_map,
    remap,
)


def _checker(h, w):
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (5, 5), 1.2)
    return img


def test_identity_map_is_identity():
    cam = CameraModel.ideal(64, 48, 100.0)
    img = _checker(48, 64)
    rmap = make_rectify_map(cam, interpolation="cubic")
    out = np.asarray(remap(img, rmap))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_pure_shift_map():
    cam = CameraModel.ideal(64, 48, 100.0)
    img = _checker(48, 64)
    mx, my = np.meshgrid(np.arange(64, dtype=np.float64),
                         np.arange(48, dtype=np.float64))
    rmap = make_rectify_map(cam, interpolation="linear", map_xy=(mx - 3.0, my))
    out = np.asarray(remap(img, rmap))
    np.testing.assert_allclose(out[:, 5:], img[:, 2:-3], atol=1e-3)


def test_subpixel_shift_linear():
    cam = CameraModel.ideal(64, 48, 100.0)
    img = _checker(48, 64)
    mx, my = np.meshgrid(np.arange(64, dtype=np.float64),
                         np.arange(48, dtype=np.float64))
    rmap = make_rectify_map(cam, interpolation="linear", map_xy=(mx - 0.5, my))
    out = np.asarray(remap(img, rmap))
    expected = 0.5 * (img[:, 1:-1] + img[:, :-2])
    np.testing.assert_allclose(out[:, 2:-1], expected[:, 1:], atol=1e-3)


def _distorted_cam():
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1]])
    D = np.array([-0.25, 0.08, 0.001, -0.001, 0.0])
    R = cv2.Rodrigues(np.array([0.002, -0.003, 0.001]))[0]
    P = np.array([[295.0, 0, 158.0, 0], [0, 295.0, 121.0, 0], [0, 0, 1, 0]])
    return CameraModel(320, 240, K, D, R, P)


def test_inverse_map_matches_opencv():
    cam = _distorted_cam()
    mx, my = inverse_rectify_map_xy(cam)
    cv_mx, cv_my = cv2.initUndistortRectifyMap(
        cam.K, cam.D, cam.R, cam.P, (320, 240), cv2.CV_32FC1)
    np.testing.assert_allclose(mx, cv_mx, atol=2e-3)
    np.testing.assert_allclose(my, cv_my, atol=2e-3)


def test_full_rectify_matches_opencv_remap():
    cam = _distorted_cam()
    img = _checker(240, 320)
    rmap = make_rectify_map(cam, interpolation="cubic")
    ours = np.asarray(remap(img, rmap))
    cv_mx, cv_my = cv2.initUndistortRectifyMap(
        cam.K, cam.D, cam.R, cam.P, (320, 240), cv2.CV_32FC1)
    theirs = cv2.remap(img, cv_mx, cv_my, cv2.INTER_CUBIC)
    # interior only: border handling differs (replicate vs constant)
    diff = np.abs(ours - theirs)[8:-8, 8:-8]
    assert np.median(diff) < 0.05
    assert diff.mean() < 0.2


def test_batched_remap():
    cam = CameraModel.ideal(32, 24, 50.0)
    imgs = np.stack([_checker(24, 32) for _ in range(3)])
    rmap = make_rectify_map(cam)
    out = np.asarray(remap(imgs, rmap))
    assert out.shape == (3, 24, 32)
    np.testing.assert_allclose(out, imgs, atol=1e-3)


def test_banded_pallas_matches_gather_path():
    """The gather-free banded Pallas remap (ops/rectify_pallas.py) is an
    exact algebraic regrouping of the gather formulation — identical
    output on a strongly distorted calibration (both interpolations,
    batched too). Both paths are genuinely executed: the backend is an
    explicit per-call argument dispatching to distinct compiled impls
    (the old env-var flip was invisible to a jitted remap's cache)."""
    cam = _distorted_cam()
    img = _checker(240, 320)
    for interp in ("cubic", "linear"):
        m = make_rectify_map(cam, interpolation=interp, banded=True)
        assert m.banded is not None   # real calibrations channelize
        out_b = np.asarray(remap(img, m, backend="banded_interpret"))
        out_b2 = np.asarray(remap(np.stack([img, img * 0.5]), m,
                                  backend="banded_interpret"))
        out_g = np.asarray(remap(img, m, backend="gather"))
        assert not np.shares_memory(out_b, out_g)
        np.testing.assert_allclose(out_b, out_g, atol=1e-3)
        np.testing.assert_allclose(out_b2[0], out_g, atol=1e-3)
        np.testing.assert_allclose(out_b2[1], 0.5 * out_g, atol=1e-3)


def test_remap_env_override_not_stale(monkeypatch):
    """Flipping I3DR_REMAP_BACKEND between calls takes effect (advisor
    round-4 high finding: the resolution used to live inside a jitted
    function, so later flips silently hit the first trace's cache).
    Gather vs banded_interpret produce equal values; the dispatcher is
    exercised by asserting each call goes through its own impl."""
    import i3dr_stereo_tpu.ops.rectify as R

    cam = _distorted_cam()
    img = _checker(240, 320)
    m = make_rectify_map(cam, interpolation="linear", banded=True)
    calls = []
    orig_b, orig_g = R._remap_banded_impl, R._remap_gather_impl
    monkeypatch.setattr(R, "_remap_banded_impl",
                        lambda *a, **k: calls.append("banded") or orig_b(*a, **k))
    monkeypatch.setattr(R, "_remap_gather_impl",
                        lambda *a, **k: calls.append("gather") or orig_g(*a, **k))
    monkeypatch.setenv("I3DR_REMAP_BACKEND", "banded_interpret")
    out_b = np.asarray(R.remap(img, m))
    monkeypatch.setenv("I3DR_REMAP_BACKEND", "gather")
    out_g = np.asarray(R.remap(img, m))
    assert calls == ["banded", "gather"]
    np.testing.assert_allclose(out_b, out_g, atol=1e-3)


def test_cpu_default_skips_banded_build():
    """On non-TPU backends the channelized form is never used — the
    default map build must not pay for it (advisor round-4 low)."""
    import jax

    if jax.default_backend() == "tpu":  # pragma: no cover
        import pytest

        pytest.skip("default backend builds banded on TPU by design")
    cam = _distorted_cam()
    m = make_rectify_map(cam, interpolation="cubic")
    assert m.banded is None


def test_banded_uint8_source_bit_identical():
    """uint8 sources ride the banded kernel's mosaic DMA as 1 byte/px
    and convert in VMEM — output must be IDENTICAL to feeding the same
    values as f32 (u8 -> f32 is exact)."""
    cam = _distorted_cam()
    img = np.clip(_checker(240, 320), 0, 255).astype(np.uint8)
    m = make_rectify_map(cam, interpolation="cubic", banded=True)
    out_u8 = np.asarray(remap(img, m, backend="banded_interpret"))
    out_f32 = np.asarray(remap(img.astype(np.float32), m,
                               backend="banded_interpret"))
    np.testing.assert_array_equal(out_u8, out_f32)
    out_g = np.asarray(remap(img, m, backend="gather"))
    np.testing.assert_allclose(out_u8, out_g, atol=1e-3)


def test_banded_build_rejects_wild_maps():
    """A non-smooth map (the generic-warp use of remap) must fall back
    to the gather path instead of mis-channelizing."""
    cam = CameraModel.ideal(160, 120, 100.0)
    rng = np.random.default_rng(0)
    mx = rng.uniform(0, 159, (120, 160))          # random scatter warp
    my = rng.uniform(0, 119, (120, 160))
    m = make_rectify_map(cam, interpolation="linear", map_xy=(mx, my))
    assert m.banded is None

"""On-hardware kernel parity: Pallas kernels vs their XLA references on
the REAL TPU at flagship-like shapes -> PARITY_TPU_rN.json.

CI runs every kernel in interpret mode on CPU (tests/); this artifact
guards interpret-vs-hardware drift (pltpu.roll semantics, Mosaic tiling,
narrow-dtype casts) at the shapes the flagship actually uses: D=32,
census 9x9, >= 512x640 crops. Run from /root/repo on the TPU:

    python tpu_parity.py [out.json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import _enable_compile_cache  # noqa: E402

_enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from i3dr_stereo_tpu.io.synthetic import layered_scene  # noqa: E402
from i3dr_stereo_tpu.ops.census import census_cost_volume, census_transform  # noqa: E402
from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_4, sgm_aggregate  # noqa: E402
from i3dr_stereo_tpu.ops.wta import wta_disparity  # noqa: E402

H, W, D = 512, 640, 32
CW = CH = 9


def _scene():
    sc = layered_scene(H, W, max_disp=24, background_disp=8, seed=13)
    return jnp.asarray(sc.left[None]), jnp.asarray(sc.right[None])


def check_fused_t() -> dict:
    """census_sgm_wta_t (hardware) vs census+sgm_aggregate+wta (XLA)."""
    from i3dr_stereo_tpu.ops.sgm_fused_t import census_sgm_wta_t

    Lj, Rj = _scene()
    cl = census_transform(Lj, CH, CW)
    cr = census_transform(Rj, CH, CW)
    Cref, _ = census_cost_volume(cl, cr, 0, D)
    Sref = sgm_aggregate(Cref, 8.0, 64.0, DIRECTIONS_4)
    dref, vref = map(np.asarray, wta_disparity(Sref, 0, uniqueness_ratio=0.0,
                                               subpixel=True))

    Hp = (H + 127) // 128 * 128
    Wp = (W + 127) // 128 * 128
    lT = jnp.pad(jnp.transpose(Lj, (0, 2, 1)),
                 ((0, 0), (0, Wp - W), (0, Hp - H)), mode="edge")
    rT = jnp.pad(jnp.transpose(Rj, (0, 2, 1)),
                 ((0, 0), (0, Wp - W), (0, Hp - H)), mode="edge")
    clT = jnp.moveaxis(census_transform(lT, CW, CH), -1, 0)
    crT = jnp.moveaxis(census_transform(rT, CW, CH), -1, 0)
    disp, C = census_sgm_wta_t(clT, crT, D, bpm=0, W_real=W, H_real=H,
                               p1=8.0, p2=64.0, directions=4, subpixel=True)
    d = np.asarray(disp)[:, :H, :W]
    v = d > -1e8
    mask_equal = bool((v == vref).all())
    both = v & vref
    max_diff = float(np.abs(d[both] - dref[both]).max()) if both.any() else 0.0
    return {"kernel": "census_sgm_wta_t", "shape": f"{H}x{W}xD{D}_census9x9",
            "valid_mask_equal": mask_equal,
            "max_disp_diff_px": round(max_diff, 5),
            "pass": mask_equal and max_diff < 1e-2}


def check_right_disparity() -> dict:
    """right_disparity_from_C_t (XLA op, but on the hardware layout) vs
    a numpy reindex of the same volume."""
    from i3dr_stereo_tpu.ops.sgm_fused_t import right_disparity_from_C_t

    rng = np.random.default_rng(3)
    B, Wp, Hp = 1, 256, 128
    bpm = -D // 2
    C = rng.integers(0, 250, (B, Wp, D, Hp)).astype(np.uint8)
    d_r, v_r = map(np.asarray, right_disparity_from_C_t(jnp.asarray(C),
                                                        bpm, Wp))
    # numpy reference
    best = np.full((B, Wp, Hp), 255, np.int32)
    bestk = np.zeros((B, Wp, Hp), np.int32)
    for k in range(D):
        s = bpm + k
        plane = np.full((B, Wp, Hp), 255, np.int32)
        if s >= 0:
            plane[:, :Wp - s] = C[:, s:, k, :]
        else:
            plane[:, -s:] = C[:, :s, k, :]
        better = plane < best
        best = np.where(better, plane, best)
        bestk = np.where(better, k, bestk)
    ref = (bpm + bestk).astype(np.float32).transpose(0, 2, 1)
    ok = bool((d_r[np.asarray(v_r)] == ref[np.asarray(v_r)]).all())
    return {"kernel": "right_disparity_from_C_t",
            "shape": f"{Wp}x{Hp}xD{D}", "pass": ok}


def check_speckle() -> dict:
    """speckle_filter_pallas (hardware) vs the XLA labelling path."""
    from i3dr_stereo_tpu.ops.speckle import speckle_filter

    rng = np.random.default_rng(5)
    d = (rng.integers(0, 4, (1, H, W)) * 3.0).astype(np.float32)
    v = rng.random((1, H, W)) > 0.12
    rows = []
    for S, md in ((25, 1.0), (100, 0.5)):
        kp = np.asarray(speckle_filter(jnp.asarray(d), jnp.asarray(v),
                                       max_size=S, max_diff=md,
                                       backend="pallas"))
        kx = np.asarray(speckle_filter(jnp.asarray(d), jnp.asarray(v),
                                       max_size=S, max_diff=md,
                                       backend="xla"))
        rows.append(bool((kp == kx).all()))
    return {"kernel": "speckle_filter_pallas", "shape": f"{H}x{W}",
            "cases": ["S25_md1.0", "S100_md0.5"],
            "bit_equal": rows, "pass": all(rows)}


def check_block_gather() -> dict:
    """block_shift_gather (hardware) vs the take_along_axis reference."""
    from i3dr_stereo_tpu.ops.block_gather import (block_anchors,
                                                  block_shift_gather,
                                                  gather_along_rows_reference)

    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.uniform(0, 255, (1, H, W)).astype(np.float32))
    base = rng.integers(0, 20, (1, H // 8, W // 128))
    idx = (np.repeat(np.repeat(base, 8, 1), 128, 2)
           + rng.integers(-8, 9, (1, H, W))).astype(np.int32)
    idx_j = jnp.asarray(idx)
    q = block_anchors(idx_j)
    out = np.asarray(block_shift_gather(src, idx_j, q, 16))
    ref = np.asarray(gather_along_rows_reference(src, idx_j))
    ok = bool((out == ref).all())
    return {"kernel": "block_shift_gather", "shape": f"{H}x{W}_r16",
            "pass": ok}


def check_fused_cost_sgm() -> dict:
    """fused_census_sgm (hardware) vs census_cost_volume+sgm_aggregate."""
    from i3dr_stereo_tpu.ops.fused_cost_sgm import fused_census_sgm

    Lj, Rj = _scene()
    cl = census_transform(Lj, CH, CW)
    cr = census_transform(Rj, CH, CW)
    Cref, _ = census_cost_volume(cl, cr, 0, D)
    Sref = np.asarray(sgm_aggregate(Cref, 8.0, 64.0, DIRECTIONS_4))

    S, C = fused_census_sgm(cl, cr, D, base=0, p1=8.0, p2=64.0,
                            directions=DIRECTIONS_4, out_dtype=jnp.int16)
    Sn = np.asarray(S).astype(np.float32)
    m = np.asarray(Cref) < 1e8
    msum = m.all(axis=-1, keepdims=True) & m  # rows fully in-range
    ok = bool((Sn[msum] == Sref[msum]).all())
    return {"kernel": "fused_census_sgm", "shape": f"{H}x{W}xD{D}",
            "pass": ok}


def check_banded_remap() -> dict:
    """Banded Pallas remap vs the gather formulation on hardware — an
    exact algebraic regrouping, so the gate is bit-level (<= 1e-3 for
    float re-association) on a strongly distorted full-res map."""
    import cv2

    from i3dr_stereo_tpu.core.camera import CameraModel
    from i3dr_stereo_tpu.ops.rectify import make_rectify_map, remap

    H, W = 1024, 1280
    K = np.array([[1200.0, 0, W / 2], [0, 1200.0, H / 2], [0, 0, 1]])
    D = np.array([-0.18, 0.06, 0.0008, -0.0006, 0.0])
    R = cv2.Rodrigues(np.array([0.004, -0.006, 0.002]))[0]
    P = np.array([[1190.0, 0, W / 2 - 2, 0], [0, 1190.0, H / 2 + 1, 0],
                  [0, 0, 1, 0]])
    m = make_rectify_map(CameraModel(W, H, K, D, R, P),
                         interpolation="cubic", banded=True)
    img = jax.device_put(np.random.default_rng(0)
                         .uniform(0, 255, (H, W)).astype(np.float32))
    # explicit per-call backends: each dispatches to its own compiled
    # impl (the old env-var flip around a jitted remap compared the
    # banded output against its own cache — a vacuous self-comparison)
    yb = remap(img, m, backend="banded")
    yg = remap(img, m, backend="gather")
    diff = float(jnp.abs(yb - yg).max())
    return {"kernel": "remap_banded", "shape": f"{W}x{H}_cubic_distorted",
            "max_abs_diff": round(diff, 6), "pass": diff <= 1e-3}


def main(out_path: str = "PARITY_TPU_r03.json") -> None:
    assert jax.default_backend() != "cpu", (
        "run on the TPU (this artifact exists to catch hardware drift)")
    rows = [check_fused_t(), check_right_disparity(), check_speckle(),
            check_block_gather(), check_fused_cost_sgm(),
            check_banded_remap()]
    doc = {"backend": jax.default_backend(),
           "all_pass": all(r["pass"] for r in rows), "rows": rows}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main(*sys.argv[1:2])

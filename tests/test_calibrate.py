"""Stereo calibration on synthetically-rendered chessboards."""

import numpy as np
import pytest

import cv2

from i3dr_stereo_tpu.io.calibrate import (
    ChessboardSpec,
    calibrate_stereo,
    find_corners,
    render_chessboard,
)


def _render_views(board, K, D, baseline, n=8, size=(640, 480), seed=0):
    rng = np.random.default_rng(seed)
    lefts, rights = [], []
    for i in range(n):
        rvec = np.array([rng.uniform(-0.25, 0.25),
                         rng.uniform(-0.25, 0.25),
                         rng.uniform(-0.4, 0.4)])
        tvec = np.array([rng.uniform(-0.06, 0.0),
                         rng.uniform(-0.05, 0.02),
                         rng.uniform(0.45, 0.75)])
        lefts.append(render_chessboard(board, K, D, rvec, tvec, size))
        tvec_r = tvec - np.array([baseline, 0, 0])
        rights.append(render_chessboard(board, K, D, rvec, tvec_r, size))
    return lefts, rights


def test_find_corners_on_rendered_board():
    board = ChessboardSpec(cols=7, rows=5, square_size=0.03)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    img = render_chessboard(board, K, np.zeros(5), np.array([0.1, -0.1, 0.05]),
                            np.array([-0.06, -0.05, 0.5]), (640, 480))
    corners = find_corners(img, board)
    assert corners is not None
    assert corners.shape == (35, 2)


def test_full_stereo_calibration_recovers_geometry():
    board = ChessboardSpec(cols=7, rows=5, square_size=0.03)
    fx_true, baseline_true = 600.0, 0.12
    K = np.array([[fx_true, 0, 320], [0, fx_true, 240], [0, 0, 1]])
    D = np.zeros(5)
    lefts, rights = _render_views(board, K, D, baseline_true, n=10)
    rig, diag = calibrate_stereo(lefts, rights, board)
    assert diag["views"] >= 5
    assert diag["rms_stereo"] < 1.5
    assert rig.left.fx == pytest.approx(fx_true, rel=0.05)
    assert rig.baseline == pytest.approx(baseline_true, rel=0.08)
    # rectified projections share fx and cy (row-aligned epipolar lines)
    assert rig.left.P[1, 2] == pytest.approx(rig.right.P[1, 2])

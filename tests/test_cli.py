import json
import os
import subprocess
import sys

import numpy as np
import pytest

import cv2

from i3dr_stereo_tpu.cli import main
from i3dr_stereo_tpu.io.synthetic import layered_scene


def test_cli_match(tmp_path, capsys):
    sc = layered_scene(96, 128, max_disp=16)
    lp = str(tmp_path / "L.png")
    rp = str(tmp_path / "R.png")
    cv2.imwrite(lp, sc.left.astype(np.uint8))
    cv2.imwrite(rp, sc.right.astype(np.uint8))
    out = str(tmp_path / "out")
    rc = main(["match", lp, rp, "-o", out, "--algorithm", "SGBM",
               "--disparity-range", "32", "--depth-max", "100"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert info["valid_fraction"] > 0.3
    assert os.path.exists(os.path.join(out, "disparity16.png"))
    assert os.path.exists(os.path.join(out, "points.ply"))
    d16 = cv2.imread(os.path.join(out, "disparity16.png"), cv2.IMREAD_UNCHANGED)
    assert d16.dtype == np.uint16
    med = np.median(d16[d16 > 0]) / 16.0
    assert abs(med - np.median(sc.disparity)) < 2.0


def test_cli_live(tmp_path, capsys):
    view = str(tmp_path / "view.png")
    rc = main(["live", "--frames", "2", "--width", "96", "--height", "80",
               "--algorithm", "BM", "--disparity-range", "16",
               "--save-view", view])
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip())
    assert info["processed"] == 2
    assert os.path.exists(view)


def test_cli_info(capsys):
    assert main(["info"]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["backend"] == "cpu"


def test_cli_live_gige_source(capsys):
    """`cli live --gige` drives the full stack from two (emulated) GigE
    cameras through the capture graph to disparity."""
    import numpy as np

    from i3dr_stereo_tpu.cli import main
    from i3dr_stereo_tpu.io.gige import GigECameraEmulator

    emul = GigECameraEmulator(serial="CL", enforce_control=True,
                              max_packet=1500)
    emur = GigECameraEmulator(serial="CR", enforce_control=True,
                              max_packet=1500)
    try:
        import threading

        H, W, shift = 48, 64, 4
        rng = np.random.default_rng(0)
        base = rng.uniform(40, 215, (H, W + shift))
        base = 0.25 * (np.roll(base, 1, 1) + np.roll(base, -1, 1)
                       + np.roll(base, 1, 0) + np.roll(base, -1, 0))
        left = base[:, :W].astype(np.uint8)
        right = base[:, shift:].astype(np.uint8)

        def feed():
            import time as _t

            _t.sleep(0.8)          # after bring-up programs SCDA/SCP
            for i in range(2):
                ts = int((i + 1) * 1e8)
                emul.send_frame(left, block_id=i + 1, timestamp_ns=ts)
                emur.send_frame(right, block_id=i + 1, timestamp_ns=ts)

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        rc = main(["live", "--width", str(W), "--height", str(H),
                   "--gige",
                   f"{emul.address[0]}:{emul.address[1]},"
                   f"{emur.address[0]}:{emur.address[1]}",
                   "--gige-backend", "python",
                   "--algorithm", "SGBM", "--disparity-range", "16"])
        t.join()
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["processed"] == 2
    finally:
        emul.close()
        emur.close()

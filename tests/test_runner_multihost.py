import os
import numpy as np
import pytest

from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm, PointCloudConfig
from i3dr_stereo_tpu.core.camera import StereoRig
from i3dr_stereo_tpu.dist.mesh import make_mesh
from i3dr_stereo_tpu.dist.multihost import global_frame_batch, measure_scaling
from i3dr_stereo_tpu.dist.sharded import make_sharded_matcher
from i3dr_stereo_tpu.io.synthetic import layered_scene
from i3dr_stereo_tpu.pipeline.pairing import Stamped
from i3dr_stereo_tpu.pipeline.runner import StreamRunner
from i3dr_stereo_tpu.pipeline.stereo_pipeline import StereoPipeline


def test_stream_runner_batches_and_sinks():
    rig = StereoRig.synthetic(96, 80, fx=100.0)
    cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(disparity_range=16,
                                                     speckle_size=0)
    pipe = StereoPipeline(rig=rig, config=cfg, rectify_inputs=False,
                          compute_points=False,
                          cloud=PointCloudConfig(depth_max=1000.0))
    runner = StreamRunner(pipe, batch_size=2)

    scenes = [layered_scene(80, 96, max_disp=12, seed=i) for i in range(5)]
    pairs = [(Stamped(i * 0.2, s.left, i), Stamped(i * 0.2, s.right, i))
             for i, s in enumerate(scenes)]
    sunk = []
    stats = runner.run(iter(pairs), lambda st, n, res: sunk.append((st, n, res)))
    assert stats.frames_in == 5
    assert stats.frames_out == 5
    assert stats.batches == 3  # 2 + 2 + padded 1
    # results numerically sane
    st, n, res = sunk[0]
    d = np.asarray(res.disparity)
    v = np.asarray(res.valid)[0] & scenes[0].valid
    assert np.median(np.abs(d[0] - scenes[0].disparity)[v]) < 0.5
    assert "dispatch" in runner.metrics.summary()["stages"]


def test_global_frame_batch_sharding(cpu_devices):
    mesh = make_mesh(4, 1)
    L = np.random.default_rng(0).uniform(0, 255, (8, 16, 24)).astype(np.float32)
    R = L.copy()
    gl, gr = global_frame_batch(mesh, L, R)
    assert gl.shape == (8, 16, 24)
    np.testing.assert_allclose(np.asarray(gl), L)
    # sharded over the data axis
    assert len(gl.sharding.device_set) == 4


def test_measure_scaling_runs(cpu_devices):
    cfg = ALGORITHM_DEFAULTS[Algorithm.BM].replace(disparity_range=16,
                                                   speckle_size=0)

    def factory(mesh):
        return make_sharded_matcher(cfg, mesh, halo=0)

    def make_batch(n):
        sc = layered_scene(32, 48, max_disp=8, background_disp=4)
        L = np.stack([sc.left] * (2 * n))
        R = np.stack([sc.right] * (2 * n))
        return L, R

    res = measure_scaling(factory, make_batch, [1, 2, 4], iters=2)
    assert set(res) == {1, 2, 4}
    for n, row in res.items():
        assert row["frames_per_s"] > 0


def test_two_process_global_frame_batch(tmp_path):
    """Launch 2 real processes through jax.distributed on CPU and drive
    the make_array_from_process_local_data branch of global_frame_batch
    (the path a single-process test can never reach)."""
    import socket
    import subprocess
    import sys

    # pick a free coordinator port
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    out = tmp_path / "mh.json"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen([sys.executable, worker, str(i), str(port),
                               str(out)], env=env,
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE)
             for i in range(2)]
    for p in procs:
        try:
            _, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]
    import json

    res = json.loads(out.read_text())
    assert res["ok"] and res["processes"] == 2 and res["global_devices"] == 8


def test_multihost_four_streams_tiled(tmp_path):
    """BASELINE config 5 miniature: 4 concurrent stereo streams x tiled
    batches over the REAL 2-process rig, per-stream throughput +
    accuracy + a cross-host collective per batch (the last BASELINE
    config that had no harness at any scale)."""
    import multihost_streams_bench as msb

    out = tmp_path / "streams.json"
    doc = msb.run(str(out), timeout=280.0)
    assert doc["ok"]
    assert doc["processes"] == 2 and doc["streams"] == 4
    assert len(doc["rows"]) == 4
    for row in doc["rows"]:
        assert row["tiles_per_s"] > 0
        assert row["median_px_vs_gt"] < 0.5
        assert row["collective_valid_px"] > 0

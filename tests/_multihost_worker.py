"""Worker for the 2-process multihost test (run by
tests/test_runner_multihost.py, one subprocess per simulated host).

Exercises the REAL multi-process branch of
dist/multihost.global_frame_batch — jax.make_array_from_process_local_data
over a mesh spanning both processes' devices — and a sharded compiled
step, then compares against the single-host reference on process 0.

Usage: python _multihost_worker.py <process_id> <port> <out_json>
"""

import json
import os
import sys

PID = int(sys.argv[1])
PORT = sys.argv[2]
OUT = sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                           num_processes=2, process_id=PID)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from i3dr_stereo_tpu.dist.mesh import make_mesh  # noqa: E402
from i3dr_stereo_tpu.dist.multihost import global_frame_batch  # noqa: E402


def main() -> None:
    assert jax.process_count() == 2, jax.process_count()
    n_local = len(jax.local_devices())
    B_local = n_local  # one frame per local device
    B = 2 * B_local
    H, W = 16, 24

    # deterministic global stream; each "host" holds its own half
    rng = np.random.default_rng(0)
    L = rng.uniform(0, 255, (B, H, W)).astype(np.float32)
    R = 2.0 * L + 1.0

    mesh = make_mesh(len(jax.devices()), 1)
    lb = L[PID * B_local:(PID + 1) * B_local]
    rb = R[PID * B_local:(PID + 1) * B_local]
    gl, gr = global_frame_batch(mesh, lb, rb)
    assert gl.shape == (B, H, W), gl.shape

    step = jax.jit(lambda a, b: (a + b).sum(axis=(1, 2)))
    vals = multihost_utils.process_allgather(step(gl, gr), tiled=True)

    if PID == 0:
        expected = (L + R).sum(axis=(1, 2))
        ok = bool(np.allclose(np.asarray(vals).reshape(-1), expected,
                              rtol=1e-5))
        with open(OUT, "w") as f:
            json.dump({"ok": ok, "processes": jax.process_count(),
                       "global_devices": len(jax.devices())}, f)


main()

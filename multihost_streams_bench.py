"""BASELINE config 5 in miniature -> MULTIHOST_STREAMS_rN.json.

"Multi-host: 4 stereo streams x 1000-tile batches, pod-slice throughput
+ collectives" (BASELINE.md config 5) exercised at CI scale on a REAL
2-process `jax.distributed` rig (4 virtual CPU devices per process, the
same code path a TPU pod slice runs): 4 concurrent stereo streams, each
batching one tile per global device, sharing the mesh round-robin, with
a cross-host valid-count all-reduce per batch. Per-stream throughput and
accuracy are recorded per row.

Run from /root/repo:
    python multihost_streams_bench.py [out.json]
"""

import json
import os
import socket
import subprocess
import sys


def run(out_path: str = "MULTIHOST_STREAMS_r04.json",
        timeout: float = 300.0) -> dict:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "tests", "_multihost_streams_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), out_path], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for i in range(2)]
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err.decode()[-2000:])
        if p.returncode != 0:
            raise RuntimeError(f"worker failed rc={p.returncode}: {errs[-1]}")
    with open(out_path) as f:
        doc = json.load(f)
    print(json.dumps(doc))
    return doc


if __name__ == "__main__":
    run(*sys.argv[1:2])

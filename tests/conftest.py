"""Test harness bootstrap.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4). The environment ships a
sitecustomize that force-registers the 'axon' TPU platform at interpreter
start — before any conftest code — so we re-exec pytest once with a
scrubbed environment (CPU platform, 8 fake devices, no axon site dir on
PYTHONPATH). The re-exec happens in pytest_configure with capture
suspended so the child's output reaches the terminal; jax must not be
imported at module level here (it would bind the TPU first).
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def pytest_configure(config):
    if os.environ.get("I3DR_TESTS_REEXEC") == "1":
        import jax

        assert jax.default_backend() == "cpu", jax.default_backend()
        return
    env = dict(os.environ)
    env["I3DR_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO  # drop /root/.axon_site (its sitecustomize grabs the TPU)
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    ret = subprocess.call([sys.executable, "-m", "pytest"] + sys.argv[1:], env=env)
    os._exit(ret)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    import jax

    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs

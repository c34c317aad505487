import io
import time

import numpy as np
import pytest

from i3dr_stereo_tpu.bridge.drivers import (
    ConnectRetry,
    SerialTriggerReader,
    ShmCameraPublisher,
    SyntheticRingDriver,
)
from i3dr_stereo_tpu.bridge.graph import Graph
from i3dr_stereo_tpu.native.shm import FrameRing
from i3dr_stereo_tpu.utils.device_memory import DeviceMem


def test_connect_retry_succeeds_after_failures():
    calls = []

    def connect():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("camera not ready")
        return "cam"

    r = ConnectRetry(interval=0.01, timeout=5.0)
    assert r.run(connect) == "cam"
    assert len(calls) == 3


def test_connect_retry_times_out():
    r = ConnectRetry(interval=0.01, timeout=0.05)
    with pytest.raises(TimeoutError):
        r.run(lambda: (_ for _ in ()).throw(RuntimeError("nope")))


def test_ring_driver_to_publisher():
    with FrameRing("i3dr_drv_ring", slots=16, frame_shape=(8, 8)) as ring:
        drv = SyntheticRingDriver(
            ring, lambda i: np.full((8, 8), i, np.uint8), fps=100.0)
        drv.start(n_frames=5)
        drv.stop()
        g = Graph()
        pub = ShmCameraPublisher(g, ring, "/stereo/left")
        got = []
        g.subscribe("/stereo/left/image_raw", lambda s, d: got.append((s, d)))
        n = pub.pump()
        assert n == 5
        assert got[3][1][0, 0] == 3


def test_laser_split_publisher():
    with FrameRing("i3dr_drv_ring2", slots=8, frame_shape=(4,)) as ring:
        g = Graph()
        pub = ShmCameraPublisher(g, ring, "/stereo/left", split_laser=True)
        routed = []
        g.subscribe("/stereo/left/image_raw_with_laser",
                    lambda s, d: routed.append("with"))
        g.subscribe("/stereo/left/image_raw_no_laser",
                    lambda s, d: routed.append("no"))
        g.publish("/phobos_nuclear_trigger", 0.0, True)
        ring.push(0.0, np.zeros(4, np.uint8))
        pub.pump()
        g.publish("/phobos_nuclear_trigger", 0.1, False)
        ring.push(0.1, np.zeros(4, np.uint8))
        pub.pump()
        assert routed == ["with", "no"]


def test_serial_trigger_parses_lines():
    events = []
    reader = SerialTriggerReader(lambda: None,
                                 lambda t, on: events.append(on))
    stream = [b"Laser:ON\n", b"garbage\n", b"Laser:OFF\n", b"Laser:ON\n"]
    n = reader.run_once(iter(stream))
    assert n == 3
    assert events == [True, False, True]


def test_device_mem_api():
    m = DeviceMem()
    s = m.summary()
    assert set(s) == {"device", "total", "used", "free"}
    assert m.get_mem_used() >= 0

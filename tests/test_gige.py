"""GigE Vision driver: GVCP control + GVSP streaming end-to-end against
the loopback emulator (the reference's L0 drivers wrap SDKs around this
same wire protocol; here it's spoken directly — io/gige.py)."""

import socket
import struct
import time

import numpy as np
import pytest

from i3dr_stereo_tpu.io.gige import (
    CCP_CONTROL,
    REG_ACQUISITION_START,
    REG_CCP,
    REG_EXPOSURE,
    REG_GAIN,
    REG_HEARTBEAT_TIMEOUT,
    REG_HEIGHT,
    REG_SCDA,
    REG_SCP,
    REG_SCPS,
    REG_WIDTH,
    GigECameraEmulator,
    GigECameraSource,
    GVCPClient,
    GVSPReceiver,
)


@pytest.fixture()
def emu():
    e = GigECameraEmulator(serial="CAM00042")
    yield e
    e.close()


def test_gvcp_discovery_and_registers(emu):
    c = GVCPClient(emu.address)
    ident = c.discover()
    assert ident["serial"] == "CAM00042"
    assert ident["manufacturer"] == "i3dr-emu"
    c.write_reg(REG_EXPOSURE, 12345)
    assert c.read_reg(REG_EXPOSURE) == 12345
    assert emu.regs[REG_EXPOSURE] == 12345
    c.close()


def test_gvsp_frame_reassembly(emu):
    rx = GVSPReceiver(("127.0.0.1", 0), timeout=0.5)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
    emu.send_frame(img, ("127.0.0.1", rx.port), block_id=7,
                   timestamp_ns=123_000_000, payload_size=500)
    frames = list(rx.frames())
    assert len(frames) == 1
    f = frames[0]
    np.testing.assert_array_equal(f.data, img)
    assert f.seq == 7
    assert f.stamp == pytest.approx(0.123)
    assert rx.stats["frames"] == 1 and rx.stats["dropped"] == 0
    rx.close()


def test_gvsp_drops_incomplete_frames(emu):
    """A frame with a lost payload packet is dropped whole; the next
    frame still arrives (drop-and-continue, generate_disparity.cpp:679)."""
    rx = GVSPReceiver(("127.0.0.1", 0), timeout=0.5)
    img = np.arange(48 * 64, dtype=np.uint8).reshape(48, 64) % 251
    emu.send_frame(img, ("127.0.0.1", rx.port), block_id=1,
                   payload_size=400, drop_packet=2)
    emu.send_frame(img, ("127.0.0.1", rx.port), block_id=2, payload_size=400)
    frames = list(rx.frames())
    assert len(frames) == 1 and frames[0].seq == 2
    assert rx.stats["dropped"] == 1
    rx.close()


def test_gige_camera_source_end_to_end(emu):
    src = GigECameraSource(emu.address, width=64, height=48, fps=5.0)
    assert src.identity["serial"] == "CAM00042"
    # geometry + acquisition were configured over GVCP
    assert emu.regs[REG_WIDTH] == 64 and emu.regs[REG_HEIGHT] == 48
    # property surface (tiscamera_ctrl analog)
    assert src.set_property("Gain", 7) and emu.regs[REG_GAIN] == 7
    assert not src.set_property("Bogus", 1)
    img = np.full((48, 64), 9, np.uint8)
    emu.send_frame(img, ("127.0.0.1", src.receiver.port), block_id=3)
    got = list(src.frames())
    assert len(got) == 1
    np.testing.assert_array_equal(got[0].data, img)
    src.close()


def test_gvsp_16bit_pixels(emu):
    rx = GVSPReceiver(("127.0.0.1", 0), timeout=0.5)
    img = (np.arange(32 * 40, dtype=np.uint16) * 17 % 4096).reshape(32, 40)
    emu.send_frame(img, ("127.0.0.1", rx.port), block_id=5, payload_size=333)
    frames = list(rx.frames())
    assert len(frames) == 1
    np.testing.assert_array_equal(frames[0].data, img)
    rx.close()


# --------------------------------------------------------------------------
# hardware-survivability paths: control channel, heartbeat, packet resend
# --------------------------------------------------------------------------


def test_bringup_programs_stream_channel():
    """Full GEV bring-up against a control-enforcing camera: CCP taken,
    SCPS negotiated (clamped to the device MTU), SCDA/SCP point at the
    receiver, and a frame sent to the PROGRAMMED destination (dest=None
    — the hardware path, no out-of-band port) arrives."""
    emu = GigECameraEmulator(serial="HW1", enforce_control=True,
                             max_packet=1500)
    try:
        src = GigECameraSource(emu.address, width=64, height=48,
                               packet_size=2996, timeout=0.3)
        assert emu.regs[REG_CCP] & CCP_CONTROL
        assert src.packet_size == 1500          # clamped by the device
        assert emu.regs[REG_SCP] == src.receiver.port
        assert emu.regs[REG_SCDA] == struct.unpack(
            ">I", socket.inet_aton("127.0.0.1"))[0]
        assert emu.regs[REG_WIDTH] == 64 and emu.regs[REG_HEIGHT] == 48
        assert emu.regs[REG_ACQUISITION_START] == 1
        img = np.arange(48 * 64, dtype=np.uint8).reshape(48, 64) % 250
        emu.send_frame(img, block_id=11)        # dest from SCDA/SCP
        got = list(src.frames())
        assert len(got) == 1
        np.testing.assert_array_equal(got[0].data, img)
        src.close()
        assert emu.regs[REG_CCP] == 0           # control released on close
    finally:
        emu.close()


def test_writereg_denied_without_control():
    emu = GigECameraEmulator(enforce_control=True)
    try:
        c = GVCPClient(emu.address, timeout=0.5)
        with pytest.raises(IOError, match="0x8006"):
            c.write_reg(REG_EXPOSURE, 100)
        c.write_reg(REG_CCP, CCP_CONTROL)       # take control...
        c.write_reg(REG_EXPOSURE, 100)          # ...now allowed
        assert emu.regs[REG_EXPOSURE] == 100
        c.close()
    finally:
        emu.close()


def test_heartbeat_keeps_session_alive():
    """The keepalive thread must hold the control channel open well past
    the heartbeat window (the ~3 s death the reference's SDKs hide)."""
    emu = GigECameraEmulator(enforce_control=True)
    try:
        src = GigECameraSource(emu.address, width=8, height=8,
                               heartbeat_ms=300, timeout=0.3)
        time.sleep(1.2)                          # 4x the window
        assert "heartbeat_expired" not in emu.events
        assert emu.regs[REG_ACQUISITION_START] == 1
        assert src.control_lost_events == 0
        src.close()
    finally:
        emu.close()


def test_heartbeat_expiry_kills_then_driver_recovers():
    """A silent controller loses the channel (camera stops streaming);
    the driver's keepalive then detects the loss and re-acquires."""
    emu = GigECameraEmulator(enforce_control=True)
    try:
        # silent controller: take control by hand, program a short
        # window, then say nothing
        c = GVCPClient(emu.address, timeout=0.5)
        c.write_reg(REG_CCP, CCP_CONTROL)
        c.write_reg(REG_HEARTBEAT_TIMEOUT, 200)
        deadline = time.monotonic() + 3.0
        while "heartbeat_expired" not in emu.events and \
                time.monotonic() < deadline:
            time.sleep(0.05)
        assert "heartbeat_expired" in emu.events
        assert emu.regs[REG_ACQUISITION_START] == 0
        c.close()

        # the real driver detects a control loss and recovers
        src = GigECameraSource(emu.address, width=8, height=8,
                               heartbeat_ms=400, timeout=0.3)
        # simulate a camera-side reset of the session
        with emu._lock:
            emu._controller = None
            emu.regs[REG_CCP] = 0
            emu.regs[REG_ACQUISITION_START] = 0
        deadline = time.monotonic() + 3.0
        while src.control_lost_events == 0 and time.monotonic() < deadline:
            time.sleep(0.05)
        assert src.control_lost_events >= 1
        deadline = time.monotonic() + 2.0
        while emu.regs[REG_ACQUISITION_START] != 1 and \
                time.monotonic() < deadline:
            time.sleep(0.05)
        assert emu.regs[REG_ACQUISITION_START] == 1   # stream restarted
        assert emu.regs[REG_CCP] & CCP_CONTROL
        src.close()
    finally:
        emu.close()


def test_packet_resend_recovers_lossy_stream():
    """2% injected loss (payloads, leaders AND trailers) with lossy
    resends too: every frame still completes via PACKETRESEND rounds —
    the survivability the verdict demanded (>99% complete at 1% loss)."""
    emu = GigECameraEmulator(enforce_control=True, loss_rate=0.02,
                             resend_lossy=True, seed=7)
    try:
        src = GigECameraSource(emu.address, width=64, height=48,
                               packet_size=264, timeout=0.2)
        n = 50
        rng = np.random.default_rng(1)
        imgs = [rng.integers(0, 255, (48, 64), np.uint8) for _ in range(n)]
        for i, img in enumerate(imgs):
            emu.send_frame(img, block_id=i + 1)
        got = {f.seq: f for f in src.frames()}
        st = src.receiver.stats
        assert st["resend_requests"] > 0 and st["recovered"] > 0
        assert len(got) >= int(0.99 * n)
        for i, img in enumerate(imgs):
            if i + 1 in got:
                np.testing.assert_array_equal(got[i + 1].data, img)
        src.close()
    finally:
        emu.close()


def test_reordered_stream_reassembles_without_resend():
    emu = GigECameraEmulator(enforce_control=True, reorder=True, seed=3)
    try:
        src = GigECameraSource(emu.address, width=40, height=32,
                               packet_size=200, timeout=0.3)
        img = (np.arange(32 * 40, dtype=np.uint8) % 240).reshape(32, 40)
        for i in range(5):
            emu.send_frame(img, block_id=i + 1)
        got = list(src.frames())
        assert len(got) == 5
        assert src.receiver.stats["resend_requests"] == 0
        src.close()
    finally:
        emu.close()


def test_stale_blocks_age_out():
    """A trailer-less block with no resend path cannot pin memory: it is
    evicted at block_ttl and counted dropped."""
    rx = GVSPReceiver(("127.0.0.1", 0), timeout=0.2, block_ttl=0.3)
    emu = GigECameraEmulator()
    try:
        img = np.zeros((16, 16), np.uint8)
        # drop the trailer (last pid = ceil(256/200)+1 = 3)
        emu.send_frame(img, ("127.0.0.1", rx.port), block_id=1,
                       payload_size=200, drop_packet=3)
        t0 = time.monotonic()
        frames = list(rx.frames())
        assert frames == []
        assert rx.stats["dropped"] == 1
        assert not rx._blocks
        assert time.monotonic() - t0 < 5.0
    finally:
        emu.close()
        rx.close()


# --------------------------------------------------------------------------
# native GVSP engine (native/gvsp_rx.cpp): same semantics, wire-rate CPU
# --------------------------------------------------------------------------


def _native_ok():
    try:
        from i3dr_stereo_tpu.native.gvsp import native_available

        return native_available()
    except Exception:
        return False


native = pytest.mark.skipif(not _native_ok(), reason="no g++ toolchain")


@native
def test_native_rx_roundtrip_and_16bit():
    """Bit-exact reassembly through the C++ hot loop, 8- and 16-bit."""
    emu = GigECameraEmulator(enforce_control=True, max_packet=1500)
    try:
        src = GigECameraSource(emu.address, width=64, height=48,
                               packet_size=1500, timeout=0.3,
                               backend="native")
        img = (np.arange(48 * 64, dtype=np.uint8) % 250).reshape(48, 64)
        for i in range(3):
            emu.send_frame(img + i, block_id=i + 1)
        got = list(src.frames())
        assert [f.seq for f in got] == [1, 2, 3]
        for i, f in enumerate(got):
            np.testing.assert_array_equal(f.data, img + i)
        src.close()
    finally:
        emu.close()
    emu = GigECameraEmulator(enforce_control=True, max_packet=1500)
    try:
        src = GigECameraSource(emu.address, width=40, height=32,
                               packet_size=360, timeout=0.3,
                               backend="native")
        img16 = (np.arange(32 * 40, dtype=np.uint16) * 17 % 4096
                 ).reshape(32, 40)
        emu.send_frame(img16, block_id=9)
        got = list(src.frames())
        assert len(got) == 1 and got[0].data.dtype == np.uint16
        np.testing.assert_array_equal(got[0].data, img16)
        src.close()
    finally:
        emu.close()


@native
def test_native_rx_lossy_recovers():
    """2% loss incl. leaders/trailers, lossy resends: the native engine's
    missing-run polling + Python GVCP resend closes every hole (same
    scenario as the Python receiver's gate above)."""
    emu = GigECameraEmulator(enforce_control=True, loss_rate=0.02,
                             resend_lossy=True, seed=7)
    try:
        src = GigECameraSource(emu.address, width=64, height=48,
                               packet_size=264, timeout=0.4,
                               backend="native")
        n = 50
        rng = np.random.default_rng(1)
        imgs = [rng.integers(0, 255, (48, 64), np.uint8) for _ in range(n)]
        for i, img in enumerate(imgs):
            emu.send_frame(img, block_id=i + 1)
            time.sleep(0.002)   # resend round-trips need service ticks
        got = {f.seq: f for f in src.frames()}
        st = src.receiver.stats
        assert st["resend_requests"] > 0 and st["recovered"] > 0
        assert len(got) >= int(0.95 * n), (len(got), st)
        for i, img in enumerate(imgs):
            if i + 1 in got:
                np.testing.assert_array_equal(got[i + 1].data, img)
        src.close()
    finally:
        emu.close()


@native
def test_native_rx_reordered_stream():
    emu = GigECameraEmulator(enforce_control=True, reorder=True, seed=3)
    try:
        src = GigECameraSource(emu.address, width=40, height=32,
                               packet_size=200, timeout=0.3,
                               backend="native")
        img = (np.arange(32 * 40, dtype=np.uint8) % 240).reshape(32, 40)
        for i in range(5):
            emu.send_frame(img, block_id=i + 1)
        got = list(src.frames())
        assert len(got) == 5
        for f in got:
            np.testing.assert_array_equal(f.data, img)
        src.close()
    finally:
        emu.close()


@native
def test_native_rx_stale_blocks_age_out():
    from i3dr_stereo_tpu.native.gvsp import NativeGVSPReceiver

    rx = NativeGVSPReceiver(timeout=0.2, max_frame_bytes=1 << 16)
    emu = GigECameraEmulator()
    try:
        img = np.zeros((16, 16), np.uint8)
        emu.send_frame(img, ("127.0.0.1", rx.port), block_id=1,
                       payload_size=200, drop_packet=3)   # no trailer
        t0 = time.monotonic()
        frames = list(rx.frames())
        assert frames == []
        st = rx.stats
        assert st["dropped"] >= 1 and st["pending"] == 0
        assert time.monotonic() - t0 < 5.0
    finally:
        emu.close()
        rx.close()


def test_gige_stereo_source_drives_capture_graph():
    """The full capture seam: two emulated GigE cameras -> bring-up ->
    paired GVSP streams -> GigEStereoSource.pairs() -> the capture
    graph -> fused pipeline -> disparity (the reference's two-camera
    stereo_capture.launch collapsed onto the protocol driver)."""
    from i3dr_stereo_tpu.bridge.launch import launch_stereo_camera, run_source
    from i3dr_stereo_tpu.config.params import ALGORITHM_DEFAULTS, Algorithm
    from i3dr_stereo_tpu.core.camera import StereoRig
    from i3dr_stereo_tpu.io.gige import GigEStereoSource

    H, W, shift = 48, 64, 4
    emul = GigECameraEmulator(serial="SL", enforce_control=True,
                              max_packet=1500)
    emur = GigECameraEmulator(serial="SR", enforce_control=True,
                              max_packet=1500)
    try:
        src = GigEStereoSource(emul.address, emur.address, width=W,
                               height=H, timeout=0.4)
        rng = np.random.default_rng(0)
        base = rng.uniform(40, 215, (H, W + shift))
        base = 0.25 * (np.roll(base, 1, 1) + np.roll(base, -1, 1)
                       + np.roll(base, 1, 0) + np.roll(base, -1, 0))
        left = base[:, :W].astype(np.uint8)
        right = base[:, shift:].astype(np.uint8)
        # a leading unpaired left frame: must be dropped, not block
        emul.send_frame(left, block_id=9, timestamp_ns=int(5e7))
        for i in range(3):
            ts = int((i + 1) * 1e8)                 # 0.1 s apart
            emul.send_frame(left, block_id=i + 1, timestamp_ns=ts)
            emur.send_frame(right, block_id=i + 1, timestamp_ns=ts + 1000)

        rig = StereoRig.synthetic(W, H, fx=100.0)
        cfg = ALGORITHM_DEFAULTS[Algorithm.SGBM].replace(
            disparity_range=16, speckle_size=0)
        lg = launch_stereo_camera(rig, stereo_algorithm=Algorithm.SGBM,
                                  source=src, rectify_inputs=False,
                                  config=cfg, warmup=False)
        got = []
        lg.graph.subscribe("/stereo/disparity",
                           lambda s, d: got.append((s, d)))
        n = run_source(lg)
        assert n == 3 and len(got) == 3
        assert src.dropped_unpaired >= 1
        d = got[0][1]["disparity"]
        v = np.asarray(got[0][1]["valid"])
        med = float(np.median(np.asarray(d)[v])) if v.any() else None
        assert med is not None and abs(med - shift) < 1.0, med
        src.close()
    finally:
        emul.close()
        emur.close()

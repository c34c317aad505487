"""GigE Vision driver: GVCP control + GVSP streaming end-to-end against
the loopback emulator (the reference's L0 drivers wrap SDKs around this
same wire protocol; here it's spoken directly — io/gige.py)."""

import numpy as np
import pytest

from i3dr_stereo_tpu.io.gige import (
    REG_EXPOSURE,
    REG_GAIN,
    REG_HEIGHT,
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

"""GigE Vision camera driver — no vendor SDK required.

The reference's L0 drivers wrap vendor SDKs (TIS GStreamer source,
tiscamera.py:67-84; Basler pylon_camera, stereo_capture.launch:45-84)
around cameras that all speak the same wire protocol: **GigE Vision**
over UDP (the reference even documents the GigE tuning it needs — jumbo
frames MTU 3000, README.md:67-85). This module implements that protocol
directly, so any GigE Vision camera works without an SDK:

- **GVCP** (control, UDP port 3956): DISCOVERY, READREG/WRITEREG with
  acks — used for bring-up, property control (exposure/gain via
  register addresses) and starting acquisition.
- **GVSP** (streaming): LEADER / PAYLOAD / TRAILER packets carrying one
  image block; packets are reassembled by (block_id, packet_id), frames
  with missing payload are dropped whole (the reference likewise drops
  bad frames and continues, generate_disparity.cpp:679-684).

Only the GEV 1.x subset needed to drive a camera is implemented; the
wire formats below cite the GigE Vision 1.2 specification layouts.
Tested against an in-process loopback emulator
(tests/test_gige.py) — the same mechanism a hardware bring-up would
use for validation.
"""

from __future__ import annotations

import dataclasses
import socket
import struct
import threading
import time
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from i3dr_stereo_tpu.pipeline.pairing import Stamped

GVCP_PORT = 3956
_GVCP_MAGIC = 0x42

# GVCP command ids (GigE Vision 1.2, Table "Command values")
DISCOVERY_CMD = 0x0002
DISCOVERY_ACK = 0x0003
READREG_CMD = 0x0080
READREG_ACK = 0x0081
WRITEREG_CMD = 0x0082
WRITEREG_ACK = 0x0083

# standard bootstrap register addresses (subset)
REG_ACQUISITION_START = 0x000130F4   # device-specific by XML; emulator honors
REG_WIDTH = 0x00030204
REG_HEIGHT = 0x00030224
REG_EXPOSURE = 0x00040004
REG_GAIN = 0x00040008

# GVSP packet formats (high byte of the packet_format/packet_id word)
_FMT_LEADER = 1
_FMT_TRAILER = 2
_FMT_PAYLOAD = 3


class GVCPClient:
    """Minimal GVCP control client (one camera)."""

    def __init__(self, address: Tuple[str, int], timeout: float = 1.0):
        self.address = address
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.settimeout(timeout)
        self._req_id = 0

    def _next_id(self) -> int:
        self._req_id = self._req_id % 0xFFFF + 1  # 0 is reserved
        return self._req_id

    def _cmd(self, command: int, payload: bytes) -> bytes:
        req = self._next_id()
        # GVCP CMD header: magic, flags(ack required), command, length, req_id
        hdr = struct.pack(">BBHHH", _GVCP_MAGIC, 0x01, command,
                          len(payload), req)
        self.sock.sendto(hdr + payload, self.address)
        data, _ = self.sock.recvfrom(2048)
        status, answer, length, ack_id = struct.unpack(">HHHH", data[:8])
        if status != 0 or ack_id != req:
            raise IOError(f"GVCP error status={status:#x} ack_id={ack_id}")
        return data[8:8 + length]

    def discover(self) -> Dict[str, str]:
        """DISCOVERY: returns identity strings from the ack payload."""
        body = self._cmd(DISCOVERY_CMD, b"")
        # ack payload: spec version(4) ... manufacturer@80..112,
        # model@112..144, serial@224..240 (zero-padded ASCII)
        def _s(a, b):
            return body[a:b].split(b"\0")[0].decode("ascii", "replace")
        return {"manufacturer": _s(80, 112), "model": _s(112, 144),
                "serial": _s(224, 240)}

    def read_reg(self, addr: int) -> int:
        body = self._cmd(READREG_CMD, struct.pack(">I", addr))
        return struct.unpack(">I", body[:4])[0]

    def write_reg(self, addr: int, value: int) -> None:
        self._cmd(WRITEREG_CMD, struct.pack(">II", addr, value))

    def close(self) -> None:
        self.sock.close()


@dataclasses.dataclass
class _Block:
    leader: Optional[dict] = None
    payload: Dict[int, bytes] = dataclasses.field(default_factory=dict)
    trailer_id: Optional[int] = None


class GVSPReceiver:
    """Reassembles GVSP image blocks from a UDP stream socket.

    Frames with any missing payload packet are dropped whole
    (drop-and-continue); ``stats`` counts both outcomes.
    """

    def __init__(self, bind: Tuple[str, int] = ("0.0.0.0", 0),
                 timeout: float = 1.0, recv_buf: int = 4 << 20):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        try:
            self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, recv_buf)
        except OSError:  # pragma: no cover - platform limits
            pass
        self.sock.bind(bind)
        self.sock.settimeout(timeout)
        self.port = self.sock.getsockname()[1]
        self.stats = {"frames": 0, "dropped": 0, "packets": 0}
        self._blocks: Dict[int, _Block] = {}

    def _parse(self, data: bytes):
        # GVSP GEV 1.x header: status(2), block_id(2), fmt+packet_id(4)
        status, block_id, word = struct.unpack(">HHI", data[:8])
        fmt = word >> 24
        packet_id = word & 0xFFFFFF
        return status, block_id, fmt, packet_id, data[8:]

    def frames(self) -> Iterator[Stamped]:
        """Yield complete frames as Stamped uint8/uint16 images."""
        while True:
            try:
                data, _ = self.sock.recvfrom(65536)
            except socket.timeout:
                return
            self.stats["packets"] += 1
            status, bid, fmt, pid, body = self._parse(data)
            blk = self._blocks.setdefault(bid, _Block())
            if fmt == _FMT_LEADER:
                # leader payload: reserved(2), payload_type(2),
                # timestamp(8), pixel_format(4), size_x(4), size_y(4),
                # offsets/padding(16)
                (_, ptype, ts, pixfmt, sx, sy) = struct.unpack(
                    ">HHQIII", body[:24])
                blk.leader = {"timestamp": ts, "pixel_format": pixfmt,
                              "width": sx, "height": sy}
            elif fmt == _FMT_PAYLOAD:
                blk.payload[pid] = body
            elif fmt == _FMT_TRAILER:
                blk.trailer_id = pid
                frame = self._assemble(bid, blk)
                del self._blocks[bid]
                if frame is not None:
                    self.stats["frames"] += 1
                    yield frame
                else:
                    self.stats["dropped"] += 1

    def _assemble(self, bid: int, blk: _Block) -> Optional[Stamped]:
        if blk.leader is None or blk.trailer_id is None:
            return None
        n_payload = blk.trailer_id - 1
        if set(blk.payload) != set(range(1, n_payload + 1)):
            return None  # missing packets: drop the whole frame
        raw = b"".join(blk.payload[i] for i in range(1, n_payload + 1))
        H, W = blk.leader["height"], blk.leader["width"]
        depth = blk.leader["pixel_format"] >> 16 & 0xFF  # bits per pixel
        dtype = np.uint16 if depth > 8 else np.uint8
        need = H * W * dtype().itemsize
        if len(raw) < need:
            return None
        img = np.frombuffer(raw[:need], dtype=dtype).reshape(H, W)
        # GEV timestamps are device ticks; expose seconds on a 1 GHz base
        return Stamped(blk.leader["timestamp"] / 1e9, img, seq=bid)

    def close(self) -> None:
        self.sock.close()


class GigECameraSource:
    """One GigE Vision camera as a :class:`~.sources.CameraSource`.

    Bring-up mirrors tiscamera_ctrl.py:39-53: control connect (with
    retry handled by ``bridge.drivers.ConnectRetry``), geometry +
    property writes over GVCP, acquisition start, then GVSP streaming.
    """

    PROPERTY_REGS = {"Exposure": REG_EXPOSURE, "Gain": REG_GAIN}

    def __init__(self, address: Tuple[str, int], *, width: int = 2448,
                 height: int = 2048, fps: float = 5.0,
                 stream_bind: Tuple[str, int] = ("0.0.0.0", 0),
                 timeout: float = 1.0):
        self.ctrl = GVCPClient(address, timeout=timeout)
        self.identity = self.ctrl.discover()
        self.width, self.height, self.fps = width, height, fps
        self.ctrl.write_reg(REG_WIDTH, width)
        self.ctrl.write_reg(REG_HEIGHT, height)
        self.receiver = GVSPReceiver(stream_bind, timeout=timeout)
        self.ctrl.write_reg(REG_ACQUISITION_START, 1)

    def set_property(self, name: str, value) -> bool:
        reg = self.PROPERTY_REGS.get(name)
        if reg is None:
            return False
        self.ctrl.write_reg(reg, int(value))
        return True

    def frames(self) -> Iterator[Stamped]:
        return self.receiver.frames()

    def close(self) -> None:
        self.ctrl.close()
        self.receiver.close()


# --------------------------------------------------------------------------
# loopback emulator (tests / bring-up without hardware)
# --------------------------------------------------------------------------


class GigECameraEmulator:
    """In-process GVCP responder + GVSP sender on loopback sockets.

    Emulates the protocol subset above so the driver can be validated
    end-to-end without hardware — the framework's analog of the
    reference's bag-replay bring-up path.
    """

    def __init__(self, serial: str = "EMU0001"):
        self.serial = serial
        self.regs: Dict[int, int] = {REG_WIDTH: 0, REG_HEIGHT: 0,
                                     REG_EXPOSURE: 6000, REG_GAIN: 0,
                                     REG_ACQUISITION_START: 0}
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(("127.0.0.1", 0))
        self.sock.settimeout(0.5)
        self.address = self.sock.getsockname()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                data, peer = self.sock.recvfrom(2048)
            except socket.timeout:
                continue
            magic, flags, cmd, length, req = struct.unpack(">BBHHH", data[:8])
            if magic != _GVCP_MAGIC:
                continue
            body = data[8:8 + length]
            if cmd == DISCOVERY_CMD:
                payload = bytearray(248)
                payload[80:80 + 8] = b"i3dr-emu"
                payload[112:112 + 7] = b"virtual"
                payload[224:224 + len(self.serial)] = self.serial.encode()
                ack = struct.pack(">HHHH", 0, DISCOVERY_ACK, len(payload), req)
                self.sock.sendto(ack + bytes(payload), peer)
            elif cmd == READREG_CMD:
                addr = struct.unpack(">I", body[:4])[0]
                val = self.regs.get(addr, 0)
                ack = struct.pack(">HHHH", 0, READREG_ACK, 4, req)
                self.sock.sendto(ack + struct.pack(">I", val), peer)
            elif cmd == WRITEREG_CMD:
                addr, val = struct.unpack(">II", body[:8])
                self.regs[addr] = val
                ack = struct.pack(">HHHH", 0, WRITEREG_ACK, 4, req)
                self.sock.sendto(ack + struct.pack(">I", 1), peer)

    def send_frame(self, img: np.ndarray, dest: Tuple[str, int],
                   block_id: int, *, timestamp_ns: int = 0,
                   payload_size: int = 1400,
                   drop_packet: Optional[int] = None) -> None:
        """Stream one image as LEADER + PAYLOADs + TRAILER to ``dest``."""
        H, W = img.shape
        depth = img.dtype.itemsize * 8
        pixfmt = depth << 16
        out = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

        def pkt(fmt, pid, body=b""):
            word = (fmt << 24) | (pid & 0xFFFFFF)
            return struct.pack(">HHI", 0, block_id & 0xFFFF, word) + body

        leader = struct.pack(">HHQIII", 0, 1, timestamp_ns, pixfmt, W, H)
        out.sendto(pkt(_FMT_LEADER, 0, leader + b"\0" * 16), dest)
        raw = img.tobytes()
        pid = 1
        for off in range(0, len(raw), payload_size):
            if pid != drop_packet:
                out.sendto(pkt(_FMT_PAYLOAD, pid, raw[off:off + payload_size]),
                           dest)
            pid += 1
        out.sendto(pkt(_FMT_TRAILER, pid), dest)
        out.close()

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self.sock.close()

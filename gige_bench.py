"""GigE reassembly throughput at the reference's REAL operating point.

Round-4 verdict weak #5: the GVSP driver was only ever exercised on
<=256x256 toy frames. The reference rig streams two 5 MP Basler cameras
at ~5 FPS each (launch/stereo_capture.launch:14-23, README.md:67-85):
2448x2048 uint8 = 5 MB/frame, SCPS 2996 => ~1680 packets/frame, i.e.
~17k packets/s/camera sustained. This bench runs TWO full protocol
stacks (GVCP bring-up + paced GVSP streaming at gigabit line rate +
Python reassembly) concurrently in-process and reports the sustained
reassembled frame rate, packet counts and reassembly CPU cost.

Senders pace packets at ~1 GigE wire rate (bursting a whole 5 MB frame
into a 4-8 MB kernel socket buffer would measure the buffer, not the
receiver). Pass --fps to change the per-camera target (default 5, the
reference's rate; try 10+ to find the Python ceiling).

Prints one JSON line: gige_reassembly_fps_2448x2048x2cam.
"""

from __future__ import annotations

import argparse
import json
import threading
import time

import numpy as np

from i3dr_stereo_tpu.io.gige import GigECameraEmulator, GigECameraSource

H, W = 2048, 2448
PACE_CHUNK = 48          # packets between pacing sleeps (~144 KB)
WIRE_BPS = 1e9 / 8       # 1 GigE payload bandwidth approx


def run_camera(serial: str, fps: float, duration_s: float, results: dict,
               loss_rate: float = 0.0, backend: str = "python"):
    emu = GigECameraEmulator(serial=serial, max_packet=2996,
                             enforce_control=True, loss_rate=loss_rate,
                             resend_cache_blocks=4)
    src = GigECameraSource(emu.address, width=W, height=H, fps=fps,
                           packet_size=2996, timeout=0.5,
                           on_timeout="stop", backend=backend)
    assert src.packet_size == 2996, src.packet_size

    frame = (np.random.default_rng(hash(serial) % 2**31)
             .integers(0, 255, (H, W), dtype=np.uint8))
    payload = src.packet_size - 8
    pkts_per_frame = -(-frame.nbytes // payload) + 2
    stop = threading.Event()
    sent = [0]

    def sender():
        period = 1.0 / fps
        t_next = time.perf_counter()
        bid = 1
        # paced send: chunk the frame into PACE_CHUNK-packet slices and
        # sleep between them so the instantaneous rate ~= gigabit wire
        chunk_sleep = PACE_CHUNK * payload / WIRE_BPS
        dest = emu.stream_dest()
        raw = frame.tobytes()
        import struct as _struct

        def pkt(fmt, pid, body=b""):
            word = (fmt << 24) | (pid & 0xFFFFFF)
            return _struct.pack(">HHI", 0, bid & 0xFFFF, word) + body

        while not stop.is_set():
            # leader (cached like send_frame's packets, so PACKETRESEND
            # has something to serve)
            leader = _struct.pack(">HHQIII", 0, 1, int(bid * 1e6),
                                  8 << 16, W, H)
            p0 = pkt(0x01, 0, leader + b"\0" * 16)
            emu._cache(bid & 0xFFFF, 0, p0)
            emu._send_raw(p0, dest, True)
            pid = 1
            n_since_pace = 0
            for off in range(0, len(raw), payload):
                p = pkt(0x03, pid, raw[off:off + payload])
                emu._cache(bid & 0xFFFF, pid, p)
                emu._send_raw(p, dest, True)
                pid += 1
                n_since_pace += 1
                if n_since_pace >= PACE_CHUNK:
                    n_since_pace = 0
                    time.sleep(chunk_sleep)
            pt = pkt(0x02, pid)
            emu._cache(bid & 0xFFFF, pid, pt)
            emu._send_raw(pt, dest, True)
            sent[0] += 1
            bid += 1
            t_next += period
            dt = t_next - time.perf_counter()
            if dt > 0:
                time.sleep(dt)

    st = threading.Thread(target=sender, daemon=True)

    got = [0]
    bad = [0]

    def receiver():
        for fr in src.frames():
            got[0] += 1
            if fr.data.shape != (H, W):
                bad[0] += 1
            if got[0] == 1:
                results[serial + "_first_ok"] = bool(
                    np.array_equal(fr.data, frame))

    rt = threading.Thread(target=receiver, daemon=True)
    t0 = time.perf_counter()
    st.start()
    rt.start()
    time.sleep(duration_s)
    stop.set()
    st.join(timeout=2)
    rt.join(timeout=3)
    wall = time.perf_counter() - t0
    results[serial] = {
        "frames": got[0], "sent": sent[0], "bad": bad[0],
        "fps": got[0] / wall,
        "packets": src.receiver.stats["packets"],
        "dropped_frames": src.receiver.stats["dropped"],
        "resend_requests": src.receiver.stats["resend_requests"],
        "recovered": src.receiver.stats["recovered"],
        "pkts_per_frame": pkts_per_frame,
    }
    src.close()
    emu.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", type=float, default=5.0)
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--loss", type=float, default=0.0)
    ap.add_argument("--backend", default="native",
                    choices=["python", "native", "auto"])
    args = ap.parse_args()

    results: dict = {}
    cams = ["CAML", "CAMR"]
    threads = [threading.Thread(target=run_camera,
                                args=(c, args.fps, args.duration, results,
                                      args.loss, args.backend))
               for c in cams]
    t_cpu0 = time.process_time()
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    cpu = time.process_time() - t_cpu0
    wall = time.perf_counter() - t0

    total_fps = sum(results[c]["fps"] for c in cams)
    total_frames = sum(results[c]["frames"] for c in cams)
    print(json.dumps({
        "metric": "gige_reassembly_fps_2448x2048x2cam",
        "value": round(total_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(total_fps / 10.0, 3),   # 2 cams x 5 FPS
        "target_fps_per_cam": args.fps,
        "loss_rate": args.loss,
        "backend": args.backend,
        "cpu_seconds_per_frame": round(cpu / max(total_frames, 1), 4),
        "process_cpu_util": round(cpu / wall, 2),
        "per_camera": {c: results[c] for c in cams},
        "payload_verified": all(results.get(c + "_first_ok", False)
                                for c in cams),
    }), flush=True)


if __name__ == "__main__":
    main()

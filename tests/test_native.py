"""Native shared-memory transport tests (cross-process included)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from i3dr_stereo_tpu.native.shm import FrameRing, build_native, pair_pop


def test_build_native():
    so = build_native()
    assert os.path.exists(so)


def test_ring_roundtrip():
    with FrameRing("i3dr_test_ring_a", slots=4, frame_shape=(8, 10)) as ring:
        img = np.arange(80, dtype=np.uint8).reshape(8, 10)
        assert ring.push(1.5, img, seq=7)
        assert len(ring) == 1
        stamp, seq, out = ring.pop()
        assert stamp == 1.5 and seq == 7
        np.testing.assert_array_equal(out, img)
        assert ring.pop() is None


def test_ring_full_and_order():
    with FrameRing("i3dr_test_ring_b", slots=2, frame_shape=(4,)) as ring:
        a = np.zeros(4, np.uint8)
        assert ring.push(0.0, a)
        assert ring.push(1.0, a)
        assert not ring.push(2.0, a)  # full
        s0, _, _ = ring.pop()
        s1, _, _ = ring.pop()
        assert (s0, s1) == (0.0, 1.0)


def test_pair_pop_drops_stale():
    with FrameRing("i3dr_test_ring_l", slots=8, frame_shape=(4,)) as L, \
         FrameRing("i3dr_test_ring_r", slots=8, frame_shape=(4,)) as R:
        a = np.zeros(4, np.uint8)
        L.push(0.00, a, 0)
        L.push(0.50, a, 1)
        R.push(0.49, a, 10)   # only matches the second left frame
        got = pair_pop(L, R, slop=0.05)
        assert got is not None
        stamp, seq, lb, rb = got
        assert seq == 1
        assert pair_pop(L, R, slop=0.05) is None


def test_cross_process_producer():
    """A separate producer process pushes; we consume — the actual
    deployment shape (driver process -> pipeline host)."""
    name = "i3dr_test_ring_xproc"
    with FrameRing(name, slots=16, frame_shape=(16, 16)) as ring:
        code = textwrap.dedent(f"""
            import numpy as np
            from i3dr_stereo_tpu.native.shm import FrameRing
            r = FrameRing({name!r}, frame_shape=(16, 16), create=False)
            for i in range(5):
                img = np.full((16, 16), i, np.uint8)
                assert r.push(i * 0.1, img, seq=i)
            r.close()
        """)
        env = dict(os.environ, PYTHONPATH=os.getcwd())
        subprocess.run([sys.executable, "-c", code], check=True, env=env,
                       capture_output=True)
        got = []
        while True:
            item = ring.pop()
            if item is None:
                break
            got.append(item)
        assert len(got) == 5
        for i, (stamp, seq, img) in enumerate(got):
            assert seq == i
            assert (img == i).all()

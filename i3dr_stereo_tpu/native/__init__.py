from i3dr_stereo_tpu.native.shm import FrameRing, pair_pop, build_native  # noqa: F401

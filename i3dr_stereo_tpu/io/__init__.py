from i3dr_stereo_tpu.io.synthetic import SyntheticScene, layered_scene, slanted_scene  # noqa: F401

from i3dr_stereo_tpu.core.camera import CameraModel, StereoRig, calc_q  # noqa: F401
from i3dr_stereo_tpu.core.frame import Frame, StereoFrame  # noqa: F401

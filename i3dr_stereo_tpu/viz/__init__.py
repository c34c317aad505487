from i3dr_stereo_tpu.viz.colormap import disparity_to_color, depth_to_color  # noqa: F401
from i3dr_stereo_tpu.viz.viewer import StereoViewer  # noqa: F401

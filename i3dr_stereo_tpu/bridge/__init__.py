from i3dr_stereo_tpu.bridge.graph import Graph, Node, Topic  # noqa: F401
from i3dr_stereo_tpu.bridge.nodes import (  # noqa: F401
    CameraControlNode,
    CropByDisparityNode,
    DisparityToDepthNode,
    GenerateDisparityNode,
    RectifyNode,
    TriggerNode,
    warmup_matchers,
)
from i3dr_stereo_tpu.bridge.launch import (  # noqa: F401
    launch_capture,
    launch_replay,
    launch_stereo_camera,
    launch_stereo_matcher,
    run_source,
)

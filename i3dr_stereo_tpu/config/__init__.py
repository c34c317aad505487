from i3dr_stereo_tpu.config.params import (  # noqa: F401
    Algorithm,
    MatcherConfig,
    PointCloudConfig,
    CameraSettings,
    ALGORITHM_DEFAULTS,
)
from i3dr_stereo_tpu.config.profile import (  # noqa: F401
    SGMProfile,
    PyramidLevelConfig,
    parse_param_ini,
    quick_profile,
    subpix_profile,
)

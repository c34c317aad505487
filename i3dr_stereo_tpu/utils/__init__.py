from i3dr_stereo_tpu.utils.metrics import Metrics, StageTimer, FPSMeter  # noqa: F401
from i3dr_stereo_tpu.utils.logging import get_logger  # noqa: F401

from i3dr_stereo_tpu.matchers.base import MatchResult, StereoMatcher, create_matcher  # noqa: F401
from i3dr_stereo_tpu.matchers.registry import MATCHER_REGISTRY, compute_disparity  # noqa: F401

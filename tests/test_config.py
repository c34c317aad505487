import dataclasses

from i3dr_stereo_tpu.config.params import (
    ALGORITHM_DEFAULTS,
    Algorithm,
    CameraSettings,
    MatcherConfig,
)
from i3dr_stereo_tpu.config.profile import (
    SGMProfile,
    from_ros_convention,
    parse_param_ini,
    quick_profile,
    subpix_profile,
)


def test_sanitize_fixups():
    # generate_disparity.cpp:759-775 semantics
    cfg = MatcherConfig(window_size=10, disparity_range=50).sanitize()
    assert cfg.window_size == 11
    assert cfg.disparity_range == 64
    cfg = MatcherConfig(algorithm=Algorithm.I3DRSGM, census_width=20).sanitize()
    assert cfg.census_width == 17


def test_enum_matches_reference_values():
    # cfg/i3DR_Disparity.cfg:11-19
    assert Algorithm.BM == 0
    assert Algorithm.SGBM == 1
    assert Algorithm.I3DRSGM == 2
    assert Algorithm.BM_GPU == 3
    assert Algorithm.BP_GPU == 4
    assert Algorithm.CSBP_GPU == 5
    assert set(ALGORITHM_DEFAULTS) == set(Algorithm)


def test_shape_key_distinguishes_shape_fields():
    a = MatcherConfig().sanitize()
    b = a.replace(disparity_range=128)
    c = a.replace(uniqueness_ratio=5.0)
    assert a.shape_key() != b.shape_key()
    assert a.shape_key() == c.shape_key()


def test_camera_settings_clamp():
    s = CameraSettings(brightness=99999, exposure=1, gain=-5).clamp()
    assert s.brightness == 4095 and s.exposure == 20 and s.gain == 0


INI_SNIPPET = """
[Parameter]
Pyramid Levels = 2
Top Prediction Shift = -5

[Pyramid 1]
Process This Pyramid = true
Number Of Disparities = 31
Feature Set Size X = 9
Feature Set Size Y = 7
SN Penalty 1 = 0.1
SN Penalty 2 = 0.8
WE Penalty 1 = 0.2
WE Penalty 2 = 0.9
Disparity Speckle Filter Max Difference = 0.5
Disparity Speckle Filter Max Region Size = 100
Maximum Backmatching Distance = 1.5
DSI Interpolator = Parabolic

[Pyramid 0]
Process This Pyramid = false
Number Of Disparities = 31

[Pyramid 0 Subpix]
Process This Pyramid = true
Disparity Step Size = 0.5
"""


def test_ini_parser_and_profile():
    secs = parse_param_ini(INI_SNIPPET)
    assert secs["Parameter"]["Pyramid Levels"] == "2"
    prof = SGMProfile.from_sections("test", secs)
    # coarse -> fine ordering, subpix pass captured
    assert [(lv.level, lv.subpix_pass) for lv in prof.levels] == [
        (1, False), (0, False), (0, True)]
    lv1 = prof.levels[0]
    assert lv1.census_h == 7
    assert lv1.p1 == (0.1, 0.1, 0.1, 0.2)
    assert lv1.p2 == (0.8, 0.8, 0.8, 0.9)
    assert lv1.prediction_shift == -5.0
    assert not prof.levels[1].enabled
    assert prof.levels[2].enabled and prof.levels[2].subpix_pass


def test_profile_level_enable_semantics():
    prof = quick_profile()
    p = prof.with_levels_enabled(2, 4)
    mains = [lv for lv in p.levels if not lv.subpix_pass]
    for lv in mains:
        assert lv.enabled == (2 <= lv.level <= 4)


def test_builtin_profiles():
    q = quick_profile()
    s = subpix_profile()
    assert len([l for l in q.levels if not l.subpix_pass]) == 6
    assert any(l.subpix_pass for l in s.levels)
    assert q.levels[0].prediction_shift == -5.0
    assert s.levels[0].prediction_shift == 8.0


def test_ros_unit_conventions():
    # I3DRSGM.cpp:294-330, 491-508, 249-287, 390-403
    out = from_ros_convention(p1=100.0, p2=800.0, disparity_range=528,
                              speckle_range=5.0, min_disparity=400.0)
    assert out["p1"] == 0.1
    assert out["p2"] == 0.8
    assert out["num_disparities"] == 53  # 528/10 = 52 -> forced odd
    assert out["speckle_max_diff"] == 0.5
    assert out["prediction_shift"] == 20.0
    sub = from_ros_convention(p1=100.0, subpix=True)
    assert sub["p1"] == 0.01

"""Pallas SGM kernels vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from i3dr_stereo_tpu.ops.sgm import (
    DIRECTIONS_4,
    DIRECTIONS_5,
    DIRECTIONS_8,
    sgm_aggregate,
)
from i3dr_stereo_tpu.ops.sgm_pallas import sgm_aggregate_pallas


def _vol(shape, seed=0, scale=50.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, scale, shape).astype(np.float32)


@pytest.mark.parametrize("dirs", [DIRECTIONS_8, DIRECTIONS_4, DIRECTIONS_5])
def test_pallas_matches_xla(dirs):
    C = jnp.asarray(_vol((2, 8, 10, 6)))
    ref = np.asarray(sgm_aggregate(C, 3.0, 20.0, dirs))
    ours = np.asarray(sgm_aggregate_pallas(C, 3.0, 20.0, dirs, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_pallas_lane_padding():
    # D=130 forces padding to 256 lanes; padded entries must not leak
    C = jnp.asarray(_vol((1, 6, 7, 130), seed=1))
    ref = np.asarray(sgm_aggregate(C, 3.0, 20.0, DIRECTIONS_4))
    ours = np.asarray(sgm_aggregate_pallas(C, 3.0, 20.0, DIRECTIONS_4,
                                           interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_pallas_per_direction_penalties():
    C = jnp.asarray(_vol((1, 5, 6, 4), seed=2))
    pens = ((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0))
    ref = np.asarray(sgm_aggregate(C, directions=DIRECTIONS_4,
                                   per_direction_penalties=pens))
    ours = np.asarray(sgm_aggregate_pallas(C, directions=DIRECTIONS_4,
                                           per_direction_penalties=pens,
                                           interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_pallas_big_cost_invalid_entries():
    C = _vol((1, 4, 6, 4), seed=3)
    C[:, :, :2, 1:] = 1.0e9
    ref = np.asarray(sgm_aggregate(jnp.asarray(C), 1.0, 5.0, DIRECTIONS_4))
    ours = np.asarray(sgm_aggregate_pallas(jnp.asarray(C), 1.0, 5.0,
                                           DIRECTIONS_4, interpret=True))
    # BIG-level entries stay BIG-level in both
    assert ((ours > 5e8) == (ref > 5e8)).all()
    sel = ref < 5e8
    np.testing.assert_allclose(ours[sel], ref[sel], atol=1e-3)


def test_pallas_unbatched_input():
    C = jnp.asarray(_vol((6, 8, 4), seed=4))
    ref = np.asarray(sgm_aggregate(C, 2.0, 15.0, DIRECTIONS_4))
    ours = np.asarray(sgm_aggregate_pallas(C, 2.0, 15.0, DIRECTIONS_4,
                                           interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_pallas_uint8_cost_int16_out():
    """uint8 census-scale costs with 255 sentinel, int16 partial sums."""
    import jax.numpy as jnp2

    rng = np.random.default_rng(7)
    C8 = rng.integers(0, 80, (1, 10, 12, 6)).astype(np.uint8)
    C8[:, :, :2, 3:] = 255  # invalid entries
    Cf = np.where(C8 == 255, 1.0e9, C8.astype(np.float32))
    ref = np.asarray(sgm_aggregate(jnp.asarray(Cf), 3.0, 20.0, DIRECTIONS_4))
    ours = np.asarray(sgm_aggregate_pallas(jnp.asarray(C8), 3.0, 20.0,
                                           DIRECTIONS_4,
                                           out_dtype=jnp2.int16,
                                           interpret=True))
    assert ours.dtype == np.int32  # partials int16, accumulated in int32
    real = Cf < 1e8
    # everywhere all-direction-valid, the int sums must match exactly
    valid_all = ref < 1e8
    np.testing.assert_allclose(ours[valid_all], ref[valid_all], atol=0.5)
    # sentinel entries saturate high
    assert (ours[~valid_all] >= 10000).all()

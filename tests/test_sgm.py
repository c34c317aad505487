import numpy as np
import jax.numpy as jnp
import pytest

from i3dr_stereo_tpu.ops.sgm import (
    DIRECTIONS_4,
    DIRECTIONS_8,
    _aggregate_one_direction,
    sgm_aggregate,
)

BIG = 1.0e9


def numpy_sgm_one_direction(C, dy, dx, p1, p2):
    """Brute-force scalar SGM reference (the L_r recurrence, literally)."""
    B, H, W, D = C.shape
    L = np.zeros_like(C)
    ys = range(H) if dy >= 0 else range(H - 1, -1, -1)
    xs = range(W) if dx >= 0 else range(W - 1, -1, -1)
    for b in range(B):
        for y in ys:
            for x in xs:
                py, px = y - dy, x - dx
                if 0 <= py < H and 0 <= px < W:
                    prev = L[b, py, px]
                    m = prev.min()
                    for d in range(D):
                        cands = [prev[d], m + p2]
                        if d > 0:
                            cands.append(prev[d - 1] + p1)
                        if d < D - 1:
                            cands.append(prev[d + 1] + p1)
                        L[b, y, x, d] = C[b, y, x, d] + min(cands) - m
                else:
                    L[b, y, x] = C[b, y, x]
    return L


@pytest.mark.parametrize("dy,dx", DIRECTIONS_8)
def test_one_direction_matches_bruteforce(dy, dx):
    rng = np.random.default_rng(abs(dy) * 3 + dx + 5)
    C = rng.uniform(0, 50, (1, 7, 9, 6)).astype(np.float32)
    ours = np.asarray(_aggregate_one_direction(jnp.asarray(C), dy, dx, 3.0, 20.0))
    ref = numpy_sgm_one_direction(C, dy, dx, 3.0, 20.0)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_aggregate_sums_directions():
    rng = np.random.default_rng(0)
    C = rng.uniform(0, 50, (1, 6, 8, 5)).astype(np.float32)
    S = np.asarray(sgm_aggregate(jnp.asarray(C), 3.0, 20.0, DIRECTIONS_4))
    ref = sum(numpy_sgm_one_direction(C, dy, dx, 3.0, 20.0)
              for dy, dx in DIRECTIONS_4)
    np.testing.assert_allclose(S, ref, atol=1e-2)


def test_per_direction_penalties():
    rng = np.random.default_rng(1)
    C = rng.uniform(0, 50, (1, 5, 6, 4)).astype(np.float32)
    pens = ((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0))
    S = np.asarray(sgm_aggregate(jnp.asarray(C), directions=DIRECTIONS_4,
                                 per_direction_penalties=pens))
    ref = sum(numpy_sgm_one_direction(C, dy, dx, p1, p2)
              for (dy, dx), (p1, p2) in zip(DIRECTIONS_4, pens))
    np.testing.assert_allclose(S, ref, atol=1e-2)


def test_smoothing_effect():
    """With huge P1/P2 the aggregated minimum flattens to one disparity."""
    rng = np.random.default_rng(2)
    H, W, D = 16, 24, 8
    C = rng.uniform(0, 5, (1, H, W, D)).astype(np.float32)
    C[..., 3] -= 2.0  # weak global preference for d=3
    S = np.asarray(sgm_aggregate(jnp.asarray(C), 50.0, 500.0, DIRECTIONS_8))
    best = S.argmin(-1)
    assert (best == 3).mean() > 0.95


def test_big_cost_stays_big():
    """Invalid (BIG) entries must never become attractive."""
    C = np.full((1, 4, 6, 4), 10.0, np.float32)
    C[:, :, :2, 1:] = BIG  # left columns mostly invalid
    S = np.asarray(sgm_aggregate(jnp.asarray(C), 1.0, 5.0, DIRECTIONS_4))
    assert (S[:, :, :2, 1:] > BIG / 2).all()
    assert (S[:, :, 3:, :] < BIG / 2).all()

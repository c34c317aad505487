"""Backend dispatch for SGM aggregation.

- On TPU: the Pallas kernels — "pallas_t" selects the dense
  transposed-layout generation (ops.sgm_fused_t) in the pyramid engine;
  volume-level aggregation uses ops.sgm_pallas either way.
- On CPU/other (tests, dry runs): the XLA lax.scan reference (ops.sgm).
- Override with I3DR_SGM_BACKEND=
  {auto,xla,pallas,pallas_interpret,pallas_t,pallas_t_interpret}.

Both implement the identical contract; tests assert equality.
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax

from i3dr_stereo_tpu.ops.sgm import DIRECTIONS_8, sgm_aggregate
from i3dr_stereo_tpu.ops.sgm_pallas import sgm_aggregate_pallas


def _backend() -> str:
    b = os.environ.get("I3DR_SGM_BACKEND", "auto")
    if b != "auto":
        return b
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return "xla"
    return "pallas_t" if platform == "tpu" else "xla"


def sgm_aggregate_auto(C, p1: float = 10.0, p2: float = 120.0,
                       directions: Sequence[Tuple[int, int]] = DIRECTIONS_8,
                       per_direction_penalties=None, out_dtype=None):
    b = _backend()
    if b in ("pallas", "pallas_t"):
        return sgm_aggregate_pallas(C, p1, p2, tuple(directions),
                                    per_direction_penalties,
                                    out_dtype=out_dtype)
    if b in ("pallas_interpret", "pallas_t_interpret"):
        return sgm_aggregate_pallas(C, p1, p2, tuple(directions),
                                    per_direction_penalties,
                                    out_dtype=out_dtype, interpret=True)
    if C.dtype == "uint8":
        import jax.numpy as jnp

        from i3dr_stereo_tpu.ops.sgm_pallas import U8_SENTINEL

        C = jnp.where(C == U8_SENTINEL, 1.0e9, C.astype(jnp.float32))
    return sgm_aggregate(C, p1, p2, tuple(directions),
                         per_direction_penalties=per_direction_penalties
                         if per_direction_penalties is None
                         else tuple(per_direction_penalties))

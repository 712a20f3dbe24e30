"""Device mesh construction.

The reference is strictly single-GPU (SURVEY.md §2.4); multi-chip
parallelism here is the TPU-native capability extension mandated by
BASELINE.json: tensor parallelism over ICI and data parallelism
(continuous batching) over the remaining axis, expressed as a
jax.sharding.Mesh consumed by shard_map/pjit.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(tp: int | None = None, dp: int | None = None,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: tp = all devices, dp = 1.

    On multi-host slices the dp axis should map to DCN (outer) and tp to
    ICI (inner); jax device order already enumerates hosts outermost, so
    reshaping (dp, tp) preserves that.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))

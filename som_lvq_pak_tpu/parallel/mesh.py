"""Device-mesh construction for the (data, model) sharding layout.

The framework's two scaling axes (SURVEY.md §2.6):
  data  — training vectors: the batch is sharded across chips (DP); the
          reference's analogue was streaming via LOADMODE_BUFFER.
  model — the codebook: rows are sharded across chips (TP); the global
          1-NN winner is resolved with a gather+min over the model axis
          (the reference's linear scan had no analogue — new design).

The reference package is single-threaded C with no distribution at all;
this module is new TPU-first design, not a port.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh.

    With only n_devices given, factor it as (small data axis, wide model
    axis): the codebook shards want maximal ICI bandwidth for the winner
    gather, while data parallelism only needs a psum of update
    accumulators per step.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if data is None or model is None:
        data, model = _factor(n_devices)
    if data * model != n_devices:
        raise ValueError(f"mesh {data}x{model} != {n_devices} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def _factor(n: int) -> Tuple[int, int]:
    """(data, model) with model the larger power-of-2-ish factor."""
    data = 1
    model = n
    # prefer a 2-way or 4-way data axis when it divides evenly
    for d in (4, 2):
        if n % d == 0 and n // d >= d:
            data, model = d, n // d
            break
    return data, model

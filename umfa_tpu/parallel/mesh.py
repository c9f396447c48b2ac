"""Mesh construction helpers.

Axis convention (the scaling-book recipe: pick a mesh, annotate shardings,
let XLA insert collectives):

  * "dp"   — data parallel (batch);
  * "sp"   — sequence parallel (ring attention KV rotation rides this axis);
  * "tp"   — tensor parallel (attention heads / MLP shards over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    sp: int = 1,
    tp: int = 1,
    *,
    devices: Optional[Sequence] = None,
    axis_names: Sequence[str] = ("dp", "sp", "tp"),
) -> Mesh:
    """Build a Mesh of shape (dp, sp, tp) from available devices.

    If any of dp/sp/tp is -1 it absorbs the remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    sizes = [dp, sp, tp]
    known = int(np.prod([s for s in sizes if s != -1]))
    for i, s in enumerate(sizes):
        if s == -1:
            sizes[i] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {sizes} needs {total} devices, have {len(devices)}")
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, axis_names=tuple(axis_names))

"""Device mesh helpers.

The reference scales with a pthread pool over scanlines on one node
(RooT_linux.cpp:547-630); here the scale axis is a jax.sharding.Mesh over
the flat ray dimension — each chip owns a contiguous ray block, the scene
SoA is replicated, and frame assembly is a device->host gather
(SURVEY.md §2.7, §5.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

RAY_AXIS = "rays"


def ray_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (RAY_AXIS,))


def pad_to(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult

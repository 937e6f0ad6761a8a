"""Device mesh construction for multi-chip runs.

The reference's only parallelism is single-node OpenMP
(/root/reference/src/pairwise.cpp:202); this framework scales over a
``jax.sharding.Mesh``.  Axis convention:

- ``"shards"``: the color/hash-range data-parallel axis — color blocks are
  distributed over it and partial Gram matrices merged with ``psum`` over
  ICI.  This is the primary scaling axis (one axis suffices while NxN fits
  per-chip; N-dimension tiling rides on top for 100K-sample runs).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None, axis: str = SHARD_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))

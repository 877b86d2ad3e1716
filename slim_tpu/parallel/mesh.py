"""Device-mesh helpers.

The reference's only parallel axis is an OpenMP loop over item columns
(estimate.c:371-403).  The TPU-native layout uses a 2-D mesh:

* ``dp``  -- user-row sharding for the Gram matmul (partial Grams are
  psum-reduced over this axis: the collective replaces the reference's
  shared-memory access to the full matrix);
* ``mp``  -- item-column sharding for the solves.  Solves are
  embarrassingly parallel, so after the Gram psum the column work is
  sharded over the *flattened* (dp, mp) grid: every device solves a
  distinct block of columns, none idles as a pure replica.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh
import numpy as np


def default_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Pick (dp, mp) with dp as close to sqrt as divides n_devices."""
    dp = int(np.floor(np.sqrt(n_devices)))
    while dp > 1 and n_devices % dp:
        dp -= 1
    return dp, n_devices // dp


def make_mesh(n_devices: int | None = None, shape: tuple[int, int] | None = None,
              axis_names=("dp", "mp")) -> Mesh:
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    if n > len(devs):
        raise ValueError(f"requested {n} devices, have {len(devs)}")
    if shape is None:
        shape = default_mesh_shape(n)
    dp, mp = shape
    assert dp * mp == n, f"mesh shape {shape} != {n} devices"
    grid = np.asarray(devs[:n]).reshape(dp, mp)
    return Mesh(grid, axis_names)

"""Device mesh construction.

The decode problem has two natural parallel axes (SURVEY.md section 2.6):

* ``gop``  — GOPs are closed (I-frame led, predictors reset per slice), so
  they are embarrassingly data-parallel units; the GOP key map provides
  random access.  This is the DP axis.
* ``rows`` — within one frame, slice rows are independent after parse; the
  only cross-shard coupling is P-frame motion reads across the boundary,
  handled by halo exchange (``ppermute``) or reference all-gather.  This is
  the SP axis.

Multi-host layouts put ``gop`` across hosts (DCN-distributable work
manifest) and ``rows`` across the chips of one host (ICI collectives).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def build_mesh(axis_sizes: dict[str, int],
               devices=None) -> Mesh:
    """Build a named mesh, e.g. ``build_mesh({'gop': 2, 'rows': 4})``."""
    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    grid = np.array(devices[:n]).reshape(sizes)
    return Mesh(grid, names)

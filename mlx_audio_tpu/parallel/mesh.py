"""Device-mesh management (the §5.8 `mesh.py` layer from SURVEY.md).

One mesh per process; axes ("dp", "tp") by default. Multi-host serving
replicas ride DCN on the "dp" axis; TP collectives stay on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

_MESH: Optional[Mesh] = None


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Create (and remember) a mesh.

    shape: e.g. (2, 4) for 2-way DP x 4-way TP. Default: all devices on the
    last axis (pure TP) if shape is None.
    """
    global _MESH
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    assert int(np.prod(shape)) == n, (shape, n)
    mesh_devices = np.asarray(devices).reshape(shape)
    _MESH = Mesh(mesh_devices, tuple(axis_names))
    return _MESH


def get_mesh() -> Mesh:
    global _MESH
    if _MESH is None:
        make_mesh()
    return _MESH

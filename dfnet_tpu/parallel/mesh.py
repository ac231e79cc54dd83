"""Device mesh + sharding helpers.

The reference's only multi-device construct is single-process
torch.nn.DataParallel scattering the point batch across local GPUs
(reference: /root/reference/script/models/nerfw.py:399-400). The
TPU-native replacement is SPMD: a 1-D `jax.sharding.Mesh` over the
'data' axis; ray batches (stage 1/3) and image batches (stage 2) are
sharded along their leading axis, params are replicated, and XLA
inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/ray) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(x: np.ndarray, m: int, axis: int = 0):
    """Pad axis 0 up to a multiple of m (for even sharding). Returns
    (padded, original_length)."""
    n = x.shape[axis]
    pad = -n % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, mode="edge"), n

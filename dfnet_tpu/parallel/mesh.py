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
    """1-D mesh over the first n_devices local devices.

    Raises (loudly) when fewer devices exist than requested — a silent
    1-device fallback would let a "multichip" run test nothing."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"make_mesh: requested {n} devices but only {len(devs)} are "
            f"available on platform '{devs[0].platform}'. For a virtual "
            f"multi-device CPU mesh set jax_platforms=cpu and "
            f"jax_num_cpu_devices={n} before jax initializes.")
    return Mesh(np.array(devs[:n]), (axis,))


def mesh_from_config(cfg) -> Optional[Mesh]:
    """Build the data-parallel mesh the CLIs hand to trainers/renderers:
    cfg.mesh_shape devices (all local devices if mesh_shape is 0/'all');
    None (single-device execution, no sharding constraints) when
    mesh_shape is unset or resolves to one device."""
    shape = getattr(cfg, "mesh_shape", None)
    if shape is None:
        return None
    n = len(jax.devices()) if int(shape) <= 0 else int(shape)
    if n <= 1:
        return None
    return make_mesh(n)


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

"""Device / mesh selection.

TPU-native replacement for the reference's CUDA->MPS->CPU preference
(src/pd_fusion/utils/torch_utils.py:4-12): prefer TPU, then GPU, then CPU,
and expose helpers for building a 1-D data-parallel `jax.sharding.Mesh`
over all local devices.
"""
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_default_device():
    """Return the preferred jax device: tpu > gpu > cpu."""
    devices = jax.devices()
    for kind in ("tpu", "gpu"):
        matches = [d for d in devices if d.platform == kind]
        if matches:
            return matches[0]
    return devices[0]


def get_platform() -> str:
    return get_default_device().platform


def make_data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over local devices for batch sharding (pjit/shard_map)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

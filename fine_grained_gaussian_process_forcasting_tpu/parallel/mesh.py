"""Device mesh construction and standard shardings.

The reference is single-device (SURVEY.md section 2.6); this module adds
the TPU-native capability: a (data, model) ``jax.sharding.Mesh`` with the
batch dim sharded over 'data' and (optionally) attention-head/FFN dims over
'model'.  All collectives are emitted by XLA from sharding constraints —
there is no hand-rolled communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 2-D ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_model < 1:
        raise ValueError(f"n_model must be >= 1, got {n_model}")
    if n_data is None:
        n_data = len(devices) // n_model
    needed = n_data * n_model
    if needed < 1:
        raise ValueError(
            f"mesh needs at least 1 device: n_data={n_data} n_model={n_model}"
        )
    if len(devices) < needed:
        raise ValueError(
            f"make_mesh(n_data={n_data}, n_model={n_model}) needs "
            f"{needed} devices but only {len(devices)} are available "
            f"({[d.platform for d in devices]}). For a virtual multi-device "
            "run, start the process with JAX_PLATFORMS=cpu "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={needed}."
        )
    arr = np.array(devices[:needed]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch dim over 'data', replicate everything else."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

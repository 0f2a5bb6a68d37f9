"""Device mesh + sharding helpers — the NCCL/DDP replacement.

The reference scales with torch DDP over NCCL (quant_train.py:190-223,
320-360); here the same data-parallel axis is a jax.sharding.Mesh with the
batch sharded over 'data' and parameters replicated, GSPMD inserting the
gradient all-reduces.  The quantized models are small (≤25 MB frozen), so
replication is the right default; the classifier head can optionally be
tensor-sharded over a 'model' axis for wide-output variants.

Works identically on a real multi-chip slice and on the virtual
8-device CPU mesh used by tests (xla_force_host_platform_device_count).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=('data', 'model'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate_state(mesh: Mesh, state: Any) -> Any:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), state)


def fc_tensor_sharding(mesh: Mesh) -> NamedSharding:
    """Tensor-parallel sharding for the classifier kernel (F, O): split the
    output-class axis over 'model'."""
    return NamedSharding(mesh, P(None, 'model'))

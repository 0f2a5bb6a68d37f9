"""Multi-host initialization and cross-host utilities.

The reference's multi-process story is mp.spawn + torch.distributed NCCL
(quant_train.py:190-223); the TPU-native equivalent is one process per host
with jax.distributed.initialize, after which every jit sees the global
device set and GSPMD handles collectives over ICI/DCN.  This module wraps
the boilerplate plus the host-sharded array construction the data pipeline
needs.

On a single host everything degrades to no-ops, so the same training/serving
binaries run unchanged from 1 chip to a full slice.
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX if requested via args or environment.

    Environment protocol (set by the launcher on every host):
      HAWQ_COORDINATOR=host0:port  HAWQ_NUM_PROCESSES=N  HAWQ_PROCESS_ID=i
    No-op when unset (single host) or when already initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        'HAWQ_COORDINATOR')
    if coordinator_address is None:
        return
    if num_processes is None:
        num_processes = int(os.environ['HAWQ_NUM_PROCESSES'])
    if process_id is None:
        process_id = int(os.environ['HAWQ_PROCESS_ID'])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch_from_host_shards(mesh, host_batch: Mapping[str, np.ndarray]
                                  ) -> Mapping[str, jax.Array]:
    """Assemble a globally-sharded batch from each host's local shard.

    Each host's loader yields 1/process_count of the global batch
    (ImageFolderLoader process_index/process_count); this forms the global
    jax.Array without materializing it anywhere.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P('data'))
    out = {}
    for k, v in host_batch.items():
        global_shape = (v.shape[0] * jax.process_count(), *v.shape[1:])
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return out


def psum_metrics(metrics: Mapping[str, jax.Array],
                 count: float = 1.0) -> Mapping[str, float]:
    """Weighted average of scalar metrics across processes (eval
    aggregation).

    ``count`` is this host's sample weight — the number of examples behind
    its metric means.  An unweighted mean of host means mis-weights uneven
    final eval batches (host A evaluating 1000 samples and host B 8 would
    count equally); passing per-host counts gives the true global mean
    Σ count·metric / Σ count.  Uses a tiny jitted reduction over the global
    device set; single-host it is the identity.
    """
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devices = np.array(jax.devices())
    mesh = Mesh(devices, ('d',))
    sharding = NamedSharding(mesh, P('d'))

    c = float(count)
    vals = np.array([[float(v) * c for v in metrics.values()] + [c]],
                    np.float32)
    local = np.repeat(vals, len(jax.local_devices()), axis=0)
    arr = jax.make_array_from_process_local_data(
        sharding, local, (len(devices), len(metrics) + 1))
    # per-device rows repeat each host's weighted row; the repeat factor
    # cancels in the ratio (assuming equal local device counts per host)
    total = jax.jit(lambda a: jnp.sum(a, axis=0),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    out = np.asarray(total)
    denom = max(float(out[-1]), 1e-12)
    return {k: float(out[i]) / denom for i, k in enumerate(metrics)}

"""Real 2-process jax.distributed test of the multi-host utilities.

The reference's multi-host path is mp.spawn + torch.distributed NCCL
(quant_train.py:190-223); ours is jax.distributed.initialize + GSPMD
(hawq_tpu/parallel/distributed.py).  This spawns two actual OS processes
with a local coordinator and drives, cross-process:

  * distributed.initialize (env protocol)
  * global_batch_from_host_shards — each process contributes a distinct
    host shard; both must see the same global array through a jitted sum
  * psum_metrics — per-process scalars must average across processes

Marked slow: two fresh JAX processes + a distributed handshake.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')

from hawq_tpu.parallel import distributed

distributed.initialize()   # env protocol: HAWQ_COORDINATOR etc.
assert jax.process_count() == 2, jax.process_count()
pid = jax.process_index()

from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
devices = np.array(jax.devices())
assert devices.size == 2
mesh = Mesh(devices, ('data',))

# --- global_batch_from_host_shards: distinct shard per process ---
local = {'x': np.full((3, 4), pid, np.float32),
         'y': np.arange(3, dtype=np.int32) + 10 * pid}
batch = distributed.global_batch_from_host_shards(mesh, local)
assert batch['x'].shape == (6, 4), batch['x'].shape
assert batch['y'].shape == (6,)

# the jitted global sum sees both processes' data: sum(x) = 3*4*(0+1) = 12
total = jax.jit(lambda a: a.sum(),
                out_shardings=NamedSharding(mesh, P()))(batch['x'])
np.testing.assert_allclose(np.asarray(total), 12.0)

# --- psum_metrics: mean of per-process scalars ---
m = distributed.psum_metrics({'top1': np.float32(0.25 + 0.5 * pid),
                              'loss': np.float32(2.0 * (pid + 1))})
np.testing.assert_allclose(m['top1'], 0.5, rtol=1e-6)
np.testing.assert_allclose(m['loss'], 3.0, rtol=1e-6)
print(f'proc {pid} OK', flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   HAWQ_COORDINATOR=f'127.0.0.1:{port}',
                   HAWQ_NUM_PROCESSES='2',
                   HAWQ_PROCESS_ID=str(pid),
                   JAX_PLATFORMS='',
                   PYTHONPATH=repo)
        env.pop('XLA_FLAGS', None)     # 1 device per process
        procs.append(subprocess.Popen(
            [sys.executable, '-c', _WORKER], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f'worker hung:\n{out[-2000:]}')
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'proc {pid} failed:\n{out[-3000:]}'
        assert f'proc {pid} OK' in out

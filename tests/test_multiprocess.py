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

# --- psum_metrics: mean of per-process scalars (equal weights) ---
m = distributed.psum_metrics({'top1': np.float32(0.25 + 0.5 * pid),
                              'loss': np.float32(2.0 * (pid + 1))})
np.testing.assert_allclose(m['top1'], 0.5, rtol=1e-6)
np.testing.assert_allclose(m['loss'], 3.0, rtol=1e-6)

# --- weighted: uneven per-host eval tails (3 samples at 1.0, 1 at 0.0) ---
m = distributed.psum_metrics({'top1': np.float32(1.0 - pid)},
                             count=3 - 2 * pid)
np.testing.assert_allclose(m['top1'], 0.75, rtol=1e-6)
print(f'proc {pid} OK', flush=True)
"""

_SERVING_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', '/tmp/hawq_tpu_xla_cache')

from hawq_tpu.parallel import distributed
distributed.initialize()
assert jax.process_count() == 2
pid = jax.process_index()

from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
from hawq_tpu.inference.engine import build_resnet_engine
from hawq_tpu.parallel.serving import ServingEngine

cfg = get_bit_config('tiny50', 'uniform8')
fm = synthetic_frozen_resnet('tiny50', cfg, num_classes=16, seed=5)
engine = build_resnet_engine(fm)

GLOBAL_B = 8
images = np.random.RandomState(0).rand(GLOBAL_B, 32, 32, 3).astype(np.float32)

# expected logits: the same engine run single-device on the full batch
# (integer arithmetic makes the sharded run bit-identical)
expected = np.asarray(engine(images))

serving = ServingEngine(engine, batch_size=GLOBAL_B, image_shape=(32, 32, 3))
assert serving.host_batch == GLOBAL_B // 2
b = serving.batcher(max_delay_ms=100.0, depth=2)
shard = images[pid * 4:(pid + 1) * 4]
slots = [b.submit(shard[i]) for i in range(4)]
got = np.stack([s.get(timeout=180) for s in slots])
b.close()
np.testing.assert_array_equal(got, expected[pid * 4:(pid + 1) * 4])
print(f'serving proc {pid} OK', flush=True)
"""


def _run_two_process(worker_src: str, ok_marker: str):
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
            [sys.executable, '-c', worker_src], env=env, cwd=repo,
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
        assert ok_marker.format(pid=pid) in out


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    _run_two_process(_WORKER, 'proc {pid} OK')


@pytest.mark.slow
def test_two_process_serving(tmp_path):
    """Continuous batching across 2 OS processes: each host's DynamicBatcher
    feeds its shard of the global batch through the mesh-sharded engine;
    per-request logits are bit-identical to a single-process run."""
    _run_two_process(_SERVING_WORKER, 'serving proc {pid} OK')

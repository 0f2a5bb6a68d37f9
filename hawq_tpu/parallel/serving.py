"""Multi-chip serving: continuous batching of image streams over a mesh.

New functionality with no reference counterpart (SURVEY.md §2.3, §7): the
reference benchmarks single-GPU batch-8 latency (tvm_benchmark/
test_resnet_inference_time.py); production serving needs request streams
load-balanced across chips.  Design:

  * the compiled integer engine runs under one jit over a
    jax.sharding.Mesh — batch axis sharded over 'data', weights replicated
    (frozen models are ≤25 MB), GSPMD placing the per-chip compute;
  * a host-side DynamicBatcher aggregates individual requests into fixed
    device batches (static shapes for XLA), dispatching as soon as a batch
    fills or ``max_delay_ms`` expires — continuous batching for a
    non-autoregressive model;
  * dispatch is async (JAX enqueues); the batcher keeps up to ``depth``
    batches in flight so host→device transfer, device compute, and
    device→host logit fetch overlap — the logit all-gather (device→host of
    the sharded output) of batch i overlaps the conv compute of batch i+1;
  * multi-host: every host runs the same binary with
    jax.distributed.initialize; its batcher feeds the host-local shard of
    the global batch (jax.make_array_from_process_local_data).

ServingEngine also provides a synchronous throughput harness used by the
scaling benchmark (benchmarks/serving_bench.py).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from hawq_tpu.parallel import mesh as pmesh


class DynamicBatcher:
    """Aggregate single-image requests into fixed-size device batches."""

    def __init__(self, infer_fn: Callable, batch_size: int,
                 image_shape: Tuple[int, int, int],
                 max_delay_ms: float = 5.0, depth: int = 2,
                 image_dtype=np.float32,
                 host_transform: Optional[Callable] = None,
                 to_device: Optional[Callable] = None,
                 fetch: Optional[Callable] = None):
        self.infer_fn = infer_fn
        self.host_transform = host_transform   # e.g. preproc+quantize+fold
        # multi-host hooks (ServingEngine wires them): to_device assembles
        # the host-local batch into the globally-sharded array, fetch pulls
        # back only this host's logit rows
        self.to_device = to_device if to_device is not None else jnp.asarray
        self.fetch = fetch if fetch is not None else np.asarray
        self.batch_size = batch_size
        self.image_shape = image_shape
        self.image_dtype = image_dtype
        self.max_delay_s = max_delay_ms / 1e3
        self.depth = depth
        self._requests: 'queue.Queue[Tuple[np.ndarray, object]]' = queue.Queue()
        self._inflight: 'queue.Queue' = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._collector = threading.Thread(target=self._collect_loop,
                                           daemon=True)
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True)
        self._collector.start()
        self._completer.start()

    def submit(self, image: np.ndarray) -> 'queue.Queue':
        """Submit one image; returns a single-slot queue yielding the logits."""
        slot: 'queue.Queue' = queue.Queue(maxsize=1)
        self._requests.put((image, slot))
        return slot

    def _collect_loop(self):
        while not self._stop.is_set():
            batch: List[np.ndarray] = []
            slots: List[object] = []
            deadline = None
            while len(batch) < self.batch_size:
                timeout = None if deadline is None else \
                    max(deadline - time.perf_counter(), 0.0)
                try:
                    img, slot = self._requests.get(timeout=timeout or 0.05)
                except queue.Empty:
                    if batch and deadline is not None and \
                            time.perf_counter() >= deadline:
                        break
                    if self._stop.is_set():
                        return
                    continue
                batch.append(img)
                slots.append(slot)
                if deadline is None:
                    deadline = time.perf_counter() + self.max_delay_s
            if not batch:
                continue
            n_real = len(batch)
            while len(batch) < self.batch_size:          # pad to static shape
                batch.append(np.zeros(self.image_shape, self.image_dtype))
            arr = np.stack(batch)
            if self.host_transform is not None:
                # production data plane: preprocess/quantize/fold on host
                # (csrc/hawq_preproc.cpp) while the device runs batch i-1
                arr = self.host_transform(arr)
            x = self.to_device(arr)
            out = self.infer_fn(x)                        # async dispatch
            self._inflight.put((out, slots, n_real))

    def _complete_loop(self):
        while not self._stop.is_set():
            try:
                out, slots, n_real = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            logits = self.fetch(out)                      # sync: fetch logits
            for i, slot in enumerate(slots[:n_real]):
                slot.put(logits[i])

    def close(self):
        self._stop.set()
        self._collector.join(timeout=1.0)
        self._completer.join(timeout=1.0)


class ServingEngine:
    """Mesh-sharded wrapper around a compiled integer engine."""

    def __init__(self, engine_fn: Callable, n_devices: Optional[int] = None,
                 batch_size: int = 64,
                 image_shape: Tuple[int, int, int] = (224, 224, 3),
                 image_dtype=np.float32,
                 host_transform: Optional[Callable] = None):
        self.host_transform = host_transform
        devices = jax.devices()[:n_devices] if n_devices else jax.devices()
        self.mesh = pmesh.make_mesh(n_data=len(devices), n_model=1,
                                    devices=devices)
        self.batch_size = batch_size                       # global batch
        # each host's batcher/loader fills 1/process_count of the global
        # batch (quant_train.py:330-331's per-GPU split, host-granular)
        assert batch_size % jax.process_count() == 0, \
            (batch_size, jax.process_count())
        self.host_batch = batch_size // jax.process_count()
        self.image_shape = image_shape
        self.image_dtype = image_dtype
        self._sharding = pmesh.batch_sharding(self.mesh)

        def sharded_infer(x):
            x = jax.lax.with_sharding_constraint(
                x, jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec('data')))
            return engine_fn(x)

        self.infer = jax.jit(sharded_infer,
                             in_shardings=self._sharding,
                             out_shardings=self._sharding)

    # -- multi-host data plane ------------------------------------------
    def to_device(self, arr: np.ndarray):
        """Host-local batch → globally-'data'-sharded jax.Array.

        Public entry point for callers that assemble their own batches
        (the dryrun does); the batcher uses the same path internally."""
        if jax.process_count() == 1:
            return jnp.asarray(arr)
        global_shape = (arr.shape[0] * jax.process_count(), *arr.shape[1:])
        return jax.make_array_from_process_local_data(
            self._sharding, arr, global_shape)

    _to_device = to_device

    def _fetch_local(self, out) -> np.ndarray:
        """This host's rows of the 'data'-sharded logits (they correspond
        1:1, in order, to the rows this host's batcher submitted)."""
        if jax.process_count() == 1:
            return np.asarray(out)
        shards = sorted(out.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    def batcher(self, max_delay_ms: float = 5.0, depth: int = 2
                ) -> DynamicBatcher:
        """Continuous batcher for this host's request stream.

        Multi-host caveat: a dispatch is a *collective* — every host's
        batcher must dispatch the same number of batches (the jit over the
        global mesh blocks until all hosts contribute their shard).  Hosts
        under a shared load balancer tick in lockstep by construction; a
        host with no traffic must submit padding to keep the tick going.
        """
        return DynamicBatcher(self.infer, self.host_batch, self.image_shape,
                              max_delay_ms, depth, self.image_dtype,
                              host_transform=self.host_transform,
                              to_device=self._to_device,
                              fetch=self._fetch_local)

    def throughput(self, n_batches: int = 16) -> float:
        """images/sec, measured with the in-jit loop chain (bench.py)."""
        from bench import time_per_iter
        del n_batches  # adaptive iteration count
        rng = np.random.RandomState(0)
        if np.issubdtype(np.dtype(self.image_dtype), np.integer):
            host = rng.randint(0, 256, (self.host_batch, *self.image_shape)
                               ).astype(self.image_dtype)
        else:
            host = rng.rand(self.host_batch, *self.image_shape).astype(
                self.image_dtype)
        if self.host_transform is not None:
            host = self.host_transform(host)
        x = self._to_device(np.asarray(host))
        if jax.process_count() == 1:
            x = jax.device_put(x, self._sharding)
        t = time_per_iter(self.infer, x)
        return self.batch_size / t

"""Serving-path tests: dynamic batcher correctness and mesh-sharded engine
execution on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
from hawq_tpu.inference.engine import build_resnet_engine
from hawq_tpu.parallel.serving import ServingEngine, DynamicBatcher
from hawq_tpu.parallel import mesh as pmesh


@pytest.fixture(scope='module')
def tiny_engine():
    cfg = get_bit_config('tiny18', 'uniform8')
    fm = synthetic_frozen_resnet('tiny18', cfg, num_classes=16)
    return build_resnet_engine(fm)


class TestDynamicBatcher:
    def test_all_requests_served_correctly(self, tiny_engine):
        rng = np.random.RandomState(0)
        images = rng.rand(10, 32, 32, 3).astype(np.float32)
        direct = np.asarray(tiny_engine(jnp.asarray(images)))

        batcher = DynamicBatcher(tiny_engine, batch_size=4,
                                 image_shape=(32, 32, 3), max_delay_ms=20)
        try:
            slots = [batcher.submit(images[i]) for i in range(10)]
            results = [s.get(timeout=60) for s in slots]
        finally:
            batcher.close()
        # 10 requests over batch-4 boundaries (incl. a padded final batch)
        for i, r in enumerate(results):
            np.testing.assert_allclose(r, direct[i], rtol=1e-5, atol=1e-5)


def test_batcher_host_transform_folded_engine():
    """host_transform in the batcher runs the production input fold per
    batch: requests submit raw images, the engine sees folded input, and
    every request's logits are bit-identical to the direct folded run."""
    from hawq_tpu.inference.fold import fold4_images

    cfg = get_bit_config('tiny18', 'uniform8')
    fm = synthetic_frozen_resnet('tiny18', cfg, num_classes=16)
    eng_f = build_resnet_engine(fm, input_mode='folded_float32')

    rng = np.random.RandomState(2)
    images = rng.rand(6, 32, 32, 3).astype(np.float32)
    direct = np.asarray(eng_f(jnp.asarray(fold4_images(images))))

    batcher = DynamicBatcher(eng_f, batch_size=4, image_shape=(32, 32, 3),
                             max_delay_ms=20, host_transform=fold4_images)
    try:
        slots = [batcher.submit(images[i]) for i in range(6)]
        results = [s.get(timeout=60) for s in slots]
    finally:
        batcher.close()
    for i, r in enumerate(results):
        np.testing.assert_array_equal(r, direct[i])


class TestShardedEngine:
    def test_multi_device_matches_single(self, tiny_engine):
        assert len(jax.devices()) == 8, 'conftest must force 8 CPU devices'
        serving = ServingEngine(tiny_engine, batch_size=8,
                                image_shape=(32, 32, 3))
        rng = np.random.RandomState(1)
        x = rng.rand(8, 32, 32, 3).astype(np.float32)
        sharded_out = np.asarray(serving.infer(jnp.asarray(x)))
        direct = np.asarray(tiny_engine(jnp.asarray(x)))
        np.testing.assert_array_equal(sharded_out, direct)

    def test_mesh_shapes(self):
        mesh = pmesh.make_mesh()
        assert mesh.shape['data'] == 8
        mesh2 = pmesh.make_mesh(n_data=4, n_model=2)
        assert mesh2.shape == {'data': 4, 'model': 2}


class _FakeAsyncDevice:
    """Deterministic async-device model: one serial compute unit plus an
    independent transfer channel, so pipelining is measurable without TPU.

    infer() returns immediately (async dispatch); the result's np.asarray
    (the logit fetch) waits for the compute slot, then pays a transfer
    delay.  A pipelined client overlaps batch i's transfer with batch i+1's
    compute; a naive dispatch→fetch loop pays compute+transfer per batch.
    """

    def __init__(self, compute_s=0.03, transfer_s=0.02):
        import threading
        self.compute_s = compute_s
        self.transfer_s = transfer_s
        self.device_free = 0.0
        self.lock = threading.Lock()

    def infer(self, x):
        import time
        dev = self
        n = np.asarray(x).shape[0]
        with dev.lock:
            start = max(time.perf_counter(), dev.device_free)
            ready_at = start + dev.compute_s
            dev.device_free = ready_at

        class _Result:
            def __array__(self, dtype=None, copy=None):
                now = time.perf_counter()
                if now < ready_at:
                    time.sleep(ready_at - now)
                time.sleep(dev.transfer_s)      # D2H transfer channel
                out = np.zeros((n, 8), np.float32)
                return out if dtype is None else out.astype(dtype)

        return _Result()


def test_batcher_overlaps_fetch_with_compute():
    """depth>1 continuous batching hides the logit-fetch time behind the
    next batch's compute: total ≈ N·compute, vs N·(compute+transfer) for a
    naive dispatch→fetch loop — the overlap claim in parallel/serving.py,
    demonstrated on a deterministic fake device."""
    import time
    from hawq_tpu.parallel.serving import DynamicBatcher

    n_batches, bs = 8, 4
    imgs = [np.zeros((8, 8, 3), np.float32) for _ in range(n_batches * bs)]

    # naive serial client
    dev = _FakeAsyncDevice()
    t0 = time.perf_counter()
    for i in range(n_batches):
        out = dev.infer(np.zeros((bs, 8, 8, 3), np.float32))
        np.asarray(out)
    t_naive = time.perf_counter() - t0

    # pipelined batcher, depth 3
    dev = _FakeAsyncDevice()
    b = DynamicBatcher(dev.infer, batch_size=bs, image_shape=(8, 8, 3),
                       max_delay_ms=1.0, depth=3)
    try:
        t0 = time.perf_counter()
        slots = [b.submit(im) for im in imgs]
        for s in slots:
            s.get(timeout=10.0)
        t_piped = time.perf_counter() - t0
    finally:
        b.close()

    # naive ≈ N·(compute+transfer) = 0.40s; pipelined ≈ N·compute + transfer
    # ≈ 0.26s.  Allow generous slack for the 2-CPU box.
    assert t_piped < 0.85 * t_naive, (t_piped, t_naive)

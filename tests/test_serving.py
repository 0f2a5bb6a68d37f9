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

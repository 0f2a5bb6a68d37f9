"""ResNet34/152 architecture tables: the full graph builders trace end to
end (shape-level, no XLA compile) for QAT model, synthetic freeze, and
integer engine.  The reference's graph builders carry size tables for
18/34/50/101/152/200/269 (quantized_resnet_v1.py:473-616); wiring correctness at
depth is covered by the tiny-arch parity tests (same code paths).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
from hawq_tpu.inference.engine import build_resnet_engine


@pytest.mark.parametrize('arch,scheme', [('resnet34', 'uniform8'),
                                         ('resnet152', 'uniform4'),
                                         ('resnet200', 'uniform8'),
                                         ('resnet269', 'uniform4')])
def test_engine_traces(arch, scheme):
    cfg = get_bit_config(arch, scheme)
    fm = synthetic_frozen_resnet(arch, cfg, num_classes=1000)
    eng = build_resnet_engine(fm)
    out = jax.eval_shape(eng, jax.ShapeDtypeStruct((8, 224, 224, 3),
                                                   jnp.float32))
    assert out.shape == (8, 1000)


@pytest.mark.parametrize('arch,scheme,hw', [
    ('resnet56_cifar', 'uniform8', 32),
    ('resnet110_cifar', 'uniform4', 32),
    ('resnet164_cifar', 'uniform8', 32)])
def test_cifar_engine_traces(arch, scheme, hw):
    cfg = get_bit_config(arch, scheme)
    fm = synthetic_frozen_resnet(arch, cfg, num_classes=10)
    eng = build_resnet_engine(fm)
    out = jax.eval_shape(eng, jax.ShapeDtypeStruct((8, hw, hw, 3),
                                                   jnp.float32))
    assert out.shape == (8, 10)


@pytest.mark.parametrize('arch', ['resnet34', 'resnet152', 'resnet269'])
def test_qat_model_traces(arch):
    from hawq_tpu.models.resnet import QResNet
    cfg = get_bit_config(arch, 'uniform8')
    model = QResNet(arch=arch, cfg=cfg, num_classes=1000)
    x = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    v = jax.eval_shape(
        lambda k, xi: model.init(k, xi, folded=True, update_stats=True),
        jax.random.PRNGKey(0), x)
    # 269 = 3·(3+30+48+8) + 2 (quantized_resnet_v1.py:536-537)
    n_units = {'resnet34': 16, 'resnet152': 50, 'resnet269': 89}[arch]
    got = sum(1 for k in v['params'] if k.startswith('stage'))
    assert got == n_units, (got, n_units)

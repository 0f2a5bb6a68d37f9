"""Pre-activation ResNet v2: QAT ↔ integer-engine bit-exact parity.

The reference ships v2 only as a synthetic-weight deployment graph
(/root/reference/tvm_benchmark/mixed_precision_models/quantized_resnet_v2.py)
with no training side; here the full loop (QAT graph → freeze → engine) is
exercised and must be integer-exact end-to-end, including the v2-specific
standalone integer batch-norm nodes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.models.resnet_v2 import QResNetV2
from hawq_tpu.inference.engine_v2 import (freeze_resnet_v2,
                                          build_resnet_v2_engine)

_cache = {}


def _calibrated(arch, scheme='uniform8'):
    key = (arch, scheme)
    if key in _cache:
        return _cache[key]
    cfg = get_bit_config(arch, scheme)
    model = QResNetV2(arch=arch, cfg=cfg, num_classes=10)
    rng = np.random.RandomState(0)
    x = jnp.array(rng.randn(2, 32, 32, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    @jax.jit
    def calib(v, x):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**v, **mut}

    for _ in range(3):
        v = calib(v, x)
    _cache[key] = (model, cfg, v, x)
    return _cache[key]


@pytest.mark.parametrize('arch,scheme', [('tiny18v2', 'uniform8'),
                                         ('tiny50v2', 'uniform8'),
                                         ('tiny50v2', 'uniform4')])
def test_v2_qat_engine_parity(arch, scheme):
    model, cfg, v, x = _calibrated(arch, scheme)
    qat = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, folded=True, update_stats=False))(v, x))
    fm = freeze_resnet_v2(jax.tree.map(np.asarray, v), arch, cfg, 10)
    eng = np.asarray(build_resnet_v2_engine(fm)(x))

    out_scale = (fm['quant_output.weight_scale'].astype(np.float64)
                 * np.float64(fm.act_scale('quant_act_output')))
    qi, ei = np.round(qat / out_scale), np.round(eng / out_scale)
    mism = int(np.sum(qi != ei))
    assert mism == 0, f'{mism}/{qi.size} integer logits differ'


def test_v2_per_unit_featuremaps_exact():
    model, cfg, v, x = _calibrated('tiny50v2')
    _, state = model.apply(v, x, folded=True, update_stats=False,
                           mutable=['intermediates'])
    inter = state['intermediates']
    fm = freeze_resnet_v2(jax.tree.map(np.asarray, v), 'tiny50v2', cfg, 10)

    for s, u in [(1, 1), (2, 1), (2, 2)]:
        p = f'stage{s}.unit{u}'
        # residual-stream node (unclamped sum, int32 container)
        eng = np.asarray(build_resnet_v2_engine(
            fm, capture=f'{p}.quant_act_int32')(x))
        qat_q = np.asarray(
            inter[f'stage{s}_unit{u}']['quant_act_int32']['q_int'][0])
        np.testing.assert_array_equal(qat_q, eng.astype(np.float64),
                                      err_msg=f'{p} residual stream')
        # the unit's integer-BN output (the v2-specific node)
        eng_pre = np.asarray(build_resnet_v2_engine(
            fm, capture=f'{p}.pre')(x))
        qat_pre = np.asarray(
            inter[f'stage{s}_unit{u}']['quant_bn']['q_int'][0])
        np.testing.assert_array_equal(qat_pre, eng_pre.astype(np.float64),
                                      err_msg=f'{p} qbn output')


def test_v2_unfolded_trains():
    """Unfolded (float-BN) mode runs and produces finite gradients."""
    from hawq_tpu.train.train import TrainState, make_train_step, \
        sgd_with_step_decay
    cfg = get_bit_config('tiny18v2', 'uniform8')
    model = QResNetV2(arch='tiny18v2', cfg=cfg, num_classes=10)
    rng = np.random.RandomState(1)
    x = jnp.array(rng.randn(2, 32, 32, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=False, update_stats=True)
    state = TrainState.create(v, sgd_with_step_decay(1e-3))
    step = make_train_step(model, folded=False)
    batch = {'image': x, 'label': jnp.array([1, 2])}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))

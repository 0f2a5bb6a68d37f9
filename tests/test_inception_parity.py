"""InceptionV3 QAT ↔ integer-engine bit-exact parity (width-divided variant).

Covers the machinery unique to inception: branch-local input requants, the
dual 1×3/3×1 sub-concat, avg/max-pool branches, and the multi-branch concat
requantization to a shared unit scale.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import BitConfig, QuantSettings
from hawq_tpu.models.inceptionv3 import QInceptionV3
from hawq_tpu.inference.engine_inception import (freeze_inceptionv3,
                                                 build_inceptionv3_engine)

WIDTH_DIV = 16


@pytest.mark.slow
def test_inception_qat_engine_parity():
    cfg = BitConfig(name='incept_tiny_u8', table={}, settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=WIDTH_DIV)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 96, 96, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    @jax.jit
    def calib(v, x):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**v, **mut}

    for _ in range(2):
        v = calib(v, x)
    qat = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, folded=True, update_stats=False))(v, x))

    fm = freeze_inceptionv3(jax.tree.map(np.asarray, v), cfg, num_classes=8,
                            width_div=WIDTH_DIV)
    eng = np.asarray(build_inceptionv3_engine(fm, width_div=WIDTH_DIV)(x))

    out_scale = (fm['output.q_fc.weight_scale'].astype(np.float64)
                 * np.float64(fm.act_scale('features.q_concat_activ')))
    qat_int = np.round(qat / out_scale)
    eng_int = np.round(eng / out_scale)
    mismatches = int(np.sum(qat_int != eng_int))
    assert mismatches == 0, (
        f'{mismatches}/{qat_int.size} integer logits differ; '
        f'max |Δ| = {np.max(np.abs(qat / out_scale - eng / out_scale))}')


@pytest.mark.slow
def test_inception_per_unit_golden_featuremaps():
    """Engine capture at unit concat-requant nodes == QAT sown integers,
    exactly (golden-featuremap mechanism for the inception family)."""
    cfg = BitConfig(name='incept_tiny_u8', table={}, settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=WIDTH_DIV)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 96, 96, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    @jax.jit
    def calib(v, x):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**v, **mut}

    for _ in range(2):
        v = calib(v, x)
    _, state = model.apply(v, x, folded=True, update_stats=False,
                           mutable=['intermediates'])
    inter = state['intermediates']
    fm = freeze_inceptionv3(jax.tree.map(np.asarray, v), cfg, num_classes=8,
                            width_div=WIDTH_DIV)

    for i, j in [(1, 1), (2, 1)]:   # an A unit and the reduction-A unit
        node = f'features.stage{i}.unit{j}.q_rescaling_activ'
        eng = np.asarray(build_inceptionv3_engine(
            fm, width_div=WIDTH_DIV, capture=node)(x))
        qat = np.asarray(inter[f'stage{i}_unit{j}']['q_rescaling_activ']
                         ['q_int'][0])
        np.testing.assert_array_equal(qat, eng.astype(np.float64),
                                      err_msg=node)


def test_head_dropout_active_only_with_rng():
    """QuantDropout in the head (q_inceptionv3.py:727): drops (and rescales
    by 1/(1-p)) only when a 'dropout' rng is supplied — the QAT train step's
    mode — and is the exact identity for eval/calibration/engine calls."""
    cfg = BitConfig(name='incept_tiny_u8', table={}, settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=WIDTH_DIV,
                         dropout_rate=0.5)
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(2, 96, 96, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    eval1 = model.apply(v, x, folded=True, update_stats=False)
    eval2 = model.apply(v, x, folded=True, update_stats=False)
    np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))

    tr1, _ = model.apply(v, x, folded=True, update_stats=True,
                         mutable=['quant_stats', 'batch_stats'],
                         rngs={'dropout': jax.random.PRNGKey(1)})
    tr2, _ = model.apply(v, x, folded=True, update_stats=True,
                         mutable=['quant_stats', 'batch_stats'],
                         rngs={'dropout': jax.random.PRNGKey(2)})
    assert not np.array_equal(np.asarray(tr1), np.asarray(tr2)), \
        'different dropout keys must give different logits'
    assert not np.array_equal(np.asarray(tr1), np.asarray(eval1)), \
        'train-mode dropout must differ from the deterministic path'


@pytest.mark.slow
def test_qat_train_step_with_dropout():
    """One jitted QAT train step through make_train_step on the inception
    head: the step supplies the per-step dropout rng; loss finite and
    params move."""
    import optax
    from hawq_tpu.train.train import TrainState, make_train_step

    cfg = BitConfig(name='incept_tiny_u8', table={}, settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=WIDTH_DIV,
                         dropout_rate=0.5)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(2, 96, 96, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)
    state = TrainState.create(v, optax.sgd(1e-2))
    step = make_train_step(model, folded=True, rng_seed=3)
    batch = {'image': x, 'label': jnp.asarray(np.array([1, 4]))}
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics['loss']))
    moved = jax.tree.map(lambda a, b: not np.array_equal(a, b),
                         state.params, new_state.params)
    assert any(jax.tree.leaves(moved)), 'params did not update'


def test_inception_int16_wide_container_parity():
    """wide_dtype=int16 (round 5: int16 containers for the 16-bit
    activation nodes — the b≥32 production route) is bit-identical to the
    int32 build, under the published uniform8 table (which actually has
    16-bit q_activ/q_rescaling nodes, unlike the all-8 defaults)."""
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_inception
    cfg = get_bit_config('inceptionv3', 'uniform8')
    fm = synthetic_frozen_inception(cfg, width_div=WIDTH_DIV, num_classes=8)
    x = jnp.asarray(np.random.RandomState(1)
                    .rand(1, 96, 96, 3).astype(np.float32) * 2 - 1)
    a = np.asarray(build_inceptionv3_engine(fm, width_div=WIDTH_DIV)(x))
    b = np.asarray(build_inceptionv3_engine(fm, width_div=WIDTH_DIV,
                                            wide_dtype=jnp.int16)(x))
    np.testing.assert_array_equal(a, b)

"""Transcribed mobilenetv2 / inceptionv3 uniform tables: loading, key
coverage vs the frozen-model namespace, and QAT↔engine parity at the real
(mixed 4/8/16-bit) assignments.

The tables are the published uniform8/uniform4 configs from the reference
registry (/root/reference/bit_config.py:3091-4204), transcribed by
tools/transcribe_reference_configs.py into configs/data/*.json.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import (get_bit_config, BitConfig,
                                         QuantSettings)


def test_uniform_tables_load():
    for arch, nkeys in (('mobilenetv2', 129), ('inceptionv3', 257)):
        for scheme in ('uniform8', 'uniform4'):
            cfg = get_bit_config(arch, scheme)
            assert len(cfg.table) == nkeys, (arch, scheme)
    c4 = get_bit_config('mobilenetv2', 'uniform4')
    assert c4.table['init_block'] == 8                    # first layer stays 8
    assert c4.table['quant_act_int32'] == 16              # residual precision
    assert c4.table['features.stage2.unit1.conv1'] == 4
    i4 = get_bit_config('inceptionv3', 'uniform4')
    assert i4.table['features.q_init_block.q_conv1.q_convbn'] == 8
    assert i4.table['features.stage1.unit1.q_rescaling_activ'] == 16
    assert i4.act_mode('features.stage1.unit1.branches.branch1.q_input_act') \
        == 'asymmetric'


def test_unknown_config_raises():
    with pytest.raises(KeyError):
        get_bit_config('mobilenetv2', 'latency_0.5')


def _frozen_key_namespace(fm):
    out = set()
    for k in fm.tensors:
        for suf in ('.weight_int', '.act_scale'):
            if k.endswith(suf):
                out.add(k[:-len(suf)])
    return out


def test_mobilenet_table_covers_model_namespace():
    """Every key the tiny model freezes exists in the published table (the
    tiny variant is a stage-prefix of the full model, so its keys are a
    subset)."""
    from hawq_tpu.models.mobilenetv2 import (QMobileNetV2, TINY_MNV2_STAGES,
                                             TINY_MNV2_INIT_CH,
                                             TINY_MNV2_FINAL_CH)
    from hawq_tpu.inference.freeze import freeze_mobilenetv2
    cfg = BitConfig(name='t', table={}, settings=QuantSettings())
    m = QMobileNetV2(cfg=cfg, num_classes=8, stages=TINY_MNV2_STAGES,
                     init_ch=TINY_MNV2_INIT_CH, final_ch=TINY_MNV2_FINAL_CH)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
               folded=True, update_stats=True)
    fm = freeze_mobilenetv2(jax.tree.map(np.asarray, v), cfg,
                            TINY_MNV2_STAGES, 8)
    table = set(get_bit_config('mobilenetv2', 'uniform4').table)
    missing = _frozen_key_namespace(fm) - table
    assert not missing, sorted(missing)


@pytest.mark.slow
def test_inception_table_covers_model_namespace():
    """Full-size key equality: the transcribed table and the width-divided
    frozen model use exactly the same 257-key namespace (width only scales
    channels, never names)."""
    from hawq_tpu.models.inceptionv3 import QInceptionV3
    from hawq_tpu.inference.engine_inception import freeze_inceptionv3
    cfg = BitConfig(name='t', table={}, settings=QuantSettings())
    m = QInceptionV3(cfg=cfg, num_classes=8, width_div=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
               folded=True, update_stats=True)
    fm = freeze_inceptionv3(jax.tree.map(np.asarray, v), cfg, 8,
                            width_div=16)
    ours = _frozen_key_namespace(fm)
    table = set(get_bit_config('inceptionv3', 'uniform4').table)
    assert ours == table, (sorted(ours - table), sorted(table - ours))


@pytest.mark.slow
def test_mobilenet_uniform4_qat_engine_parity():
    """Bit-exact logits at the real mixed 4/8/16 assignment (asymmetric
    4-bit activations + 16-bit residual nodes through the tiny graph)."""
    from hawq_tpu.models.mobilenetv2 import (QMobileNetV2, TINY_MNV2_STAGES,
                                             TINY_MNV2_INIT_CH,
                                             TINY_MNV2_FINAL_CH)
    from hawq_tpu.inference.freeze import freeze_mobilenetv2
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    cfg = get_bit_config('mobilenetv2', 'uniform4')
    model = QMobileNetV2(cfg=cfg, num_classes=8, stages=TINY_MNV2_STAGES,
                         init_ch=TINY_MNV2_INIT_CH,
                         final_ch=TINY_MNV2_FINAL_CH)
    x = jnp.asarray(np.random.RandomState(7)
                    .randn(2, 32, 32, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    @jax.jit
    def calib(v, x):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**v, **mut}

    for _ in range(3):
        v = calib(v, x)
    qat = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, folded=True,
                                 update_stats=False))(v, x))
    fm = freeze_mobilenetv2(jax.tree.map(np.asarray, v), cfg,
                            TINY_MNV2_STAGES, num_classes=8)
    eng = np.asarray(build_mobilenetv2_engine(fm, TINY_MNV2_STAGES)(x))
    out_scale = (fm['output.weight_scale'].astype(np.float64)
                 * np.float64(fm.act_scale('quant_act_output')))
    mismatches = int(np.sum(np.round(qat / out_scale)
                            != np.round(eng / out_scale)))
    assert mismatches == 0, f'{mismatches} integer logits differ'

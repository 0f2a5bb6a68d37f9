"""Pallas-routed MobileNetV2 / InceptionV3 engines stay bit-exact.

The routing tables (inference/routing.py + autotune.py) let the non-resnet
engines run their 1×1 convs through the fused Pallas kernels — the analog of
the reference's per-layer AutoTVM schedule choice (/root/reference/
tvm_benchmark/test_resnet_inference_time.py:189-217).  These tests force
pallas on the routable sites and assert the logits equal the all-XLA
engine's bit for bit (interpret mode; compiled equivalence runs on TPU via
benchmarks/kernel_check.py).  Site enumeration itself is checked fast
(no pallas) against the frozen tensors.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from hawq_tpu.configs.bit_config import BitConfig, QuantSettings
from hawq_tpu.inference import routing as rt


def _calibrated_mobilenet(table=None, seed=3):
    from hawq_tpu.models.mobilenetv2 import (QMobileNetV2, TINY_MNV2_STAGES,
                                             TINY_MNV2_INIT_CH,
                                             TINY_MNV2_FINAL_CH)
    from hawq_tpu.inference.freeze import freeze_mobilenetv2
    cfg = BitConfig(name='tiny_mnv2_rt', table=table or {},
                    settings=QuantSettings())
    model = QMobileNetV2(cfg=cfg, num_classes=8, stages=TINY_MNV2_STAGES,
                         init_ch=TINY_MNV2_INIT_CH,
                         final_ch=TINY_MNV2_FINAL_CH)
    x = jnp.asarray(np.random.RandomState(seed)
                    .randn(2, 32, 32, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    @jax.jit
    def calib(v, x):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**v, **mut}

    for _ in range(3):
        v = calib(v, x)
    fm = freeze_mobilenetv2(jax.tree.map(np.asarray, v), cfg,
                            TINY_MNV2_STAGES, num_classes=8)
    return fm, TINY_MNV2_STAGES, x


def test_mobilenet_site_enumeration_matches_frozen_tensors():
    from hawq_tpu.models.mobilenetv2 import (TINY_MNV2_STAGES,
                                             TINY_MNV2_INIT_CH,
                                             TINY_MNV2_FINAL_CH)
    fm, stages, _ = _calibrated_mobilenet()
    sites = rt.mobilenet_conv1x1_sites(TINY_MNV2_STAGES, TINY_MNV2_INIT_CH,
                                       TINY_MNV2_FINAL_CH, image_size=32)
    assert len(sites) == 2 * sum(len(s) for s in stages) + 1
    assert len({k for k, *_ in sites}) == len(sites)
    for key, spatial, cin, cout, epi in sites:
        w = np.asarray(fm[key + '.weight_int'])
        assert w.shape == (1, 1, cin, cout), (key, w.shape, cin, cout)
        assert epi == 'acc'


def test_inception_site_enumeration_matches_frozen_shapes():
    """Full-size site table: every key resolves to a 1×1 conv of the stated
    channels in the QAT module tree (built, not initialized — cheap)."""
    cfg = BitConfig(name='incept_rt', table={}, settings=QuantSettings())
    sites = rt.inception_conv1x1_sites(cfg)
    assert len({k for k, *_ in sites}) == len(sites)
    assert ('features.q_init_block.q_conv4.q_convbn', 73, 64, 80,
            'requant') in sites
    # stage spatials: 35 / 17 / 8 (+ reduction-unit heads at the previous
    # stage's resolution)
    for key, spatial, cin, cout, epi in sites:
        assert spatial in (73, 35, 17, 8), (key, spatial)
        assert epi == 'requant'
        assert cin > 0 and cout > 0


def test_mobilenet_bf16_conv_mode_parity():
    """conv_mode='f32' (certified-exact bf16 MXU convs, engine.py notes)
    produces bit-identical logits to the int8 engine — and the tiny model's
    convs all pass the 2²⁴ accumulator certificate, so the bf16 path is
    actually exercised."""
    from hawq_tpu.inference.engine import f32_exact_ok, act_amax
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    fm, stages, x = _calibrated_mobilenet()
    for k in fm.tensors:
        if k.endswith('.weight_int') and 'output' not in k:
            key = k[:-len('.weight_int')]
            assert f32_exact_ok(fm[k], fm[key + '.bias_int'],
                                 act_amax(8, True)), key
    ref = np.asarray(build_mobilenetv2_engine(fm, stages)(x))
    bf = np.asarray(
        build_mobilenetv2_engine(fm, stages, conv_mode='f32')(x))
    np.testing.assert_array_equal(ref, bf)
    # folded input × bf16 × int16 residual (the production combination)
    from hawq_tpu.inference import fold
    xf = jnp.asarray(fold.fold4_images_3x3s2(np.asarray(x), 1))
    bf_f = np.asarray(build_mobilenetv2_engine(
        fm, stages, conv_mode='f32', input_mode='folded_float32',
        input_hw=(32, 32), residual_dtype=jnp.int16)(xf))
    np.testing.assert_array_equal(ref, bf_f)


def test_mobilenet_round5_engine_modes_parity():
    """Round-5 engine options stay bit-identical to the int8 build:
    conv_mode='bf16' (bf16 containers, dense-only certificate — grouped
    convs excluded since v5e accumulates bf16 grouped convs in bf16,
    mnv2_variants notes) and dw_mode='shifted' (nine shifted int32 VPU
    MACs)."""
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    fm, stages, x = _calibrated_mobilenet()
    ref = np.asarray(build_mobilenetv2_engine(fm, stages)(x))
    for kw in (dict(conv_mode='bf16', residual_dtype=jnp.int16),
               dict(dw_mode='shifted'),
               dict(dw_mode='shifted', residual_dtype=jnp.int16),
               dict(init_mode='bf16cert'),
               dict(init_mode='bf16cert', residual_dtype=jnp.int16)):
        out = np.asarray(build_mobilenetv2_engine(fm, stages, **kw)(x))
        np.testing.assert_array_equal(ref, out, err_msg=str(kw))


@pytest.mark.slow
def test_mobilenet_routed_parity_int8():
    fm, stages, x = _calibrated_mobilenet()
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    from hawq_tpu.models.mobilenetv2 import (TINY_MNV2_INIT_CH,
                                             TINY_MNV2_FINAL_CH)
    sites = rt.mobilenet_conv1x1_sites(stages, TINY_MNV2_INIT_CH,
                                       TINY_MNV2_FINAL_CH, image_size=32)
    routing = {key: 'pallas8' for key, *_ in sites}
    ref = np.asarray(build_mobilenetv2_engine(fm, stages)(x))
    with pltpu.force_tpu_interpret_mode():
        routed = np.asarray(
            build_mobilenetv2_engine(fm, stages, routing=routing)(x))
    np.testing.assert_array_equal(ref, routed)


@pytest.mark.slow
def test_mobilenet_routed_parity_int4w():
    """4-bit weights on the 1×1 sites, nibble-packed pallas4w routing."""
    from hawq_tpu.models.mobilenetv2 import (TINY_MNV2_STAGES,
                                             TINY_MNV2_INIT_CH,
                                             TINY_MNV2_FINAL_CH)
    sites = rt.mobilenet_conv1x1_sites(TINY_MNV2_STAGES, TINY_MNV2_INIT_CH,
                                       TINY_MNV2_FINAL_CH, image_size=32)
    table = {key: 4 for key, *_ in sites}
    fm, stages, x = _calibrated_mobilenet(table=table)
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    routing = {key: 'pallas4w' for key, *_ in sites}
    ref = np.asarray(build_mobilenetv2_engine(fm, stages)(x))
    with pltpu.force_tpu_interpret_mode():
        routed = np.asarray(
            build_mobilenetv2_engine(fm, stages, routing=routing)(x))
    np.testing.assert_array_equal(ref, routed)


def _calibrated_tiny_inception(wd=16):
    from hawq_tpu.models.inceptionv3 import QInceptionV3
    from hawq_tpu.inference.engine_inception import freeze_inceptionv3
    cfg = BitConfig(name='incept_tiny_rt', table={},
                    settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=wd)
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
    fm = freeze_inceptionv3(jax.tree.map(np.asarray, v), cfg, num_classes=8,
                            width_div=wd)
    return fm, x


def test_inception_bf16_conv_mode_parity():
    """conv_mode='f32'/'bf16' on the inception engine: bit-identical
    logits (the bf16 route keeps >8-bit nodes in wide int containers)."""
    from hawq_tpu.inference.engine_inception import build_inceptionv3_engine
    fm, x = _calibrated_tiny_inception()
    ref = np.asarray(build_inceptionv3_engine(fm, width_div=16)(x))
    for cm in ('f32', 'bf16'):
        got = np.asarray(build_inceptionv3_engine(fm, width_div=16,
                                                  conv_mode=cm)(x))
        np.testing.assert_array_equal(ref, got, err_msg=cm)
    got16 = np.asarray(build_inceptionv3_engine(
        fm, width_div=16, conv_mode='bf16', wide_dtype=jnp.int16)(x))
    np.testing.assert_array_equal(ref, got16)
    for im in ('f32cert', 'bf16cert'):      # sectioned init modes
        got_s = np.asarray(build_inceptionv3_engine(
            fm, width_div=16, init_mode=im)(x))
        np.testing.assert_array_equal(ref, got_s, err_msg=im)
    from hawq_tpu.inference import fold
    xf = jnp.asarray(fold.fold4_images_3x3s2(np.asarray(x), 0))
    for cm in ('f32', 'bf16'):
        got_f = np.asarray(build_inceptionv3_engine(
            fm, width_div=16, conv_mode=cm, input_mode='folded_float32',
            input_hw=(96, 96))(xf))
        np.testing.assert_array_equal(ref, got_f, err_msg=cm)


@pytest.mark.slow
def test_inception_routed_parity_int8():
    """Route the width-divided inception's stage-1 1×1 heads through the
    fully fused conv→relu→requant kernel; logits stay bit-exact.  (A subset
    of sites bounds interpret-mode compile time on this 2-CPU box; every
    kernel shape class is still covered.)"""
    from hawq_tpu.models.inceptionv3 import QInceptionV3
    from hawq_tpu.inference.engine_inception import (freeze_inceptionv3,
                                                     build_inceptionv3_engine)
    wd = 16
    cfg = BitConfig(name='incept_tiny_rt', table={},
                    settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=wd)
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
    fm = freeze_inceptionv3(jax.tree.map(np.asarray, v), cfg, num_classes=8,
                            width_div=wd)
    sites = rt.inception_conv1x1_sites(cfg, image_size=96, width_div=wd)
    picks = [k for k, *_ in sites
             if k.startswith('features.stage1.unit1')
             or k == 'features.q_init_block.q_conv4'][:6]
    assert picks, 'site enumeration found no stage-1 1×1 convs'
    routing = {k: 'pallas8' for k in picks}
    ref = np.asarray(build_inceptionv3_engine(fm, width_div=wd)(x))
    with pltpu.force_tpu_interpret_mode():
        routed = np.asarray(build_inceptionv3_engine(
            fm, width_div=wd, routing=routing)(x))
    np.testing.assert_array_equal(ref, routed)

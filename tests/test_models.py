"""Forward-pass tests for the MobileNetV2 and InceptionV3 quant graphs.

Uses reduced-size variants (same wiring: no-expansion first unit, depthwise
convs, residual vs non-residual bottlenecks; inception's multi-branch concat
requant) to fit the 2-CPU compile budget.  Full-size graphs run on TPU via
the benchmarks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import BitConfig, QuantSettings


class TestQMobileNetV2:
    @pytest.fixture(scope='class')
    def model_and_vars(self):
        from hawq_tpu.models.mobilenetv2 import (QMobileNetV2,
                                                 TINY_MNV2_STAGES,
                                                 TINY_MNV2_INIT_CH,
                                                 TINY_MNV2_FINAL_CH)
        cfg = BitConfig(name='tiny_mnv2_u8', table={},
                        settings=QuantSettings())
        model = QMobileNetV2(cfg=cfg, num_classes=8, stages=TINY_MNV2_STAGES,
                             init_ch=TINY_MNV2_INIT_CH,
                             final_ch=TINY_MNV2_FINAL_CH)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(2, 32, 32, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, folded=True,
                       update_stats=True)
        return model, v, x

    def test_forward_shapes(self, model_and_vars):
        model, v, x = model_and_vars
        logits, _ = model.apply(v, x, folded=True, update_stats=True,
                                mutable=['quant_stats', 'batch_stats'])
        assert logits.shape == (2, 8)
        assert np.isfinite(np.asarray(logits)).all()

    def test_residual_units_exist(self, model_and_vars):
        model, v, x = model_and_vars
        # stage2 unit2 is shape-preserving → residual path with
        # quant_act_int32 taking the identity
        assert 'stage2_unit2' in v['params']
        assert 'quant_act_int32' in v['quant_stats']['stage2_unit2']

    def test_gradients_flow(self, model_and_vars):
        model, v, x = model_and_vars

        def loss(params):
            out, _ = model.apply(
                {**v, 'params': params}, x, folded=True, update_stats=True,
                mutable=['quant_stats', 'batch_stats'])
            return jnp.sum(out ** 2)

        g = jax.grad(loss)(v['params'])
        total = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree.leaves(g))
        assert total > 0


class TestMobileNetV2EngineParity:
    def test_qat_engine_parity(self):
        from hawq_tpu.models.mobilenetv2 import (QMobileNetV2,
                                                 TINY_MNV2_STAGES,
                                                 TINY_MNV2_INIT_CH,
                                                 TINY_MNV2_FINAL_CH)
        from hawq_tpu.inference.freeze import freeze_mobilenetv2
        from hawq_tpu.inference.engine_mobilenet import \
            build_mobilenetv2_engine

        cfg = BitConfig(name='tiny_mnv2_u8', table={},
                        settings=QuantSettings())
        model = QMobileNetV2(cfg=cfg, num_classes=8,
                             stages=TINY_MNV2_STAGES,
                             init_ch=TINY_MNV2_INIT_CH,
                             final_ch=TINY_MNV2_FINAL_CH)
        x = jnp.asarray(np.random.RandomState(3)
                        .randn(2, 32, 32, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, folded=True,
                       update_stats=True)

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
        qat_int = np.round(qat / out_scale)
        eng_int = np.round(eng / out_scale)
        mismatches = int(np.sum(qat_int != eng_int))
        assert mismatches == 0, (
            f'{mismatches}/{qat_int.size} integer logits differ; '
            f'max |Δ| = {np.max(np.abs(qat / out_scale - eng / out_scale))}')


class TestQInceptionSubgraphs:
    """Inception units compile slowly at full size; test the distinctive
    machinery — the multi-branch concat requant — on one A-unit."""

    def test_inception_a_unit(self):
        from hawq_tpu.models.inceptionv3 import _unit_a
        cfg = BitConfig(name='incept_u8', table={}, settings=QuantSettings())
        unit = _unit_a(cfg, 'features.stage1.unit1', 256, 'unit')
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(1, 8, 8, 64).astype(np.float32) * 0.1)
        in_sf = jnp.float32(0.01)
        x_int = jnp.round(x / in_sf).clip(-127, 127) * in_sf
        v = unit.init(jax.random.PRNGKey(0), x_int, in_sf, folded=True,
                      update_stats=True)
        (y, sf), _ = unit.apply(v, x_int, in_sf, folded=True,
                                update_stats=True,
                                mutable=['quant_stats', 'batch_stats'])
        assert y.shape == (1, 8, 8, 256)    # 64+64+96+32 concat
        # output is int·scale with a single shared scale
        ints = np.asarray(y / sf)
        np.testing.assert_allclose(ints, np.round(ints), atol=1e-3)

    def test_conv_seq_3x3_branch_dual_concat(self):
        from hawq_tpu.models.inceptionv3 import _ConvSeq3x3Branch
        cfg = BitConfig(name='incept_u8', table={}, settings=QuantSettings())
        br = _ConvSeq3x3Branch(cfg=cfg, prefix='p', out_channels=(32,),
                               kernels=(1,), strides=(1,), paddings=(0,),
                               name='br')
        x = jnp.asarray(np.random.RandomState(1)
                        .randn(1, 6, 6, 16).astype(np.float32) * 0.1)
        in_sf = jnp.float32(0.01)
        v = br.init(jax.random.PRNGKey(0), x, in_sf, folded=True,
                    update_stats=True)
        (y, sf), _ = br.apply(v, x, in_sf, folded=True, update_stats=True,
                              mutable=['quant_stats', 'batch_stats'])
        assert y.shape[-1] == 64            # 1×3 and 3×1 concat


class TestMobileNetV2FeaturemapParity:
    def test_per_unit_golden_featuremaps(self):
        """Engine capture (debug-unit) integers == QAT sown QuantAct ints,
        exactly — the golden-featuremap mechanism extended beyond ResNet
        (reference hawq_utils_resnet50.py:374-424 is resnet-only)."""
        from hawq_tpu.models.mobilenetv2 import (QMobileNetV2,
                                                 TINY_MNV2_STAGES,
                                                 TINY_MNV2_INIT_CH,
                                                 TINY_MNV2_FINAL_CH)
        from hawq_tpu.inference.freeze import freeze_mobilenetv2
        from hawq_tpu.inference.engine_mobilenet import \
            build_mobilenetv2_engine

        cfg = BitConfig(name='tiny_mnv2_u8', table={},
                        settings=QuantSettings())
        model = QMobileNetV2(cfg=cfg, num_classes=8, stages=TINY_MNV2_STAGES,
                             init_ch=TINY_MNV2_INIT_CH,
                             final_ch=TINY_MNV2_FINAL_CH)
        x = jnp.asarray(np.random.RandomState(3)
                        .randn(2, 32, 32, 3).astype(np.float32))
        v = model.init(jax.random.PRNGKey(0), x, folded=True,
                       update_stats=True)
        for _ in range(3):
            _, mut = model.apply(v, x, folded=True, update_stats=True,
                                 mutable=['quant_stats', 'batch_stats'])
            v = {**v, **mut}
        _, state = model.apply(v, x, folded=True, update_stats=False,
                               mutable=['intermediates'])
        inter = state['intermediates']
        fm = freeze_mobilenetv2(jax.tree.map(np.asarray, v), cfg,
                                TINY_MNV2_STAGES, num_classes=8)

        cases = [  # (capture node, module, sown act) incl. a residual unit
            ('features.stage1.unit1.conv1', 'stage1_unit1', 'quant_act1'),
            ('features.stage2.unit1.conv2', 'stage2_unit1', 'quant_act2'),
            ('features.stage2.unit2.quant_act_int32', 'stage2_unit2',
             'quant_act_int32'),
            ('features.stage1.unit1.quant_act_int32', 'stage1_unit1',
             'quant_act_int32'),
        ]
        for node, mod, act in cases:
            eng = np.asarray(build_mobilenetv2_engine(
                fm, TINY_MNV2_STAGES, capture=node)(x))
            qat = np.asarray(inter[mod][act]['q_int'][0])
            np.testing.assert_array_equal(qat, eng.astype(np.float64),
                                          err_msg=node)


class TestFloatBaselines:
    """fp32 baseline models: topology parity with the published float models
    (speedup denominators for the family benchmarks).  Param counts pin the
    topology: MobileNetV2 3.50M, InceptionV3 23.8M (pytorchcv model zoo)."""

    @pytest.mark.parametrize('model_cls,hw,want_params', [
        ('FloatMobileNetV2', 224, 3_505_960),
        ('FloatInceptionV3', 299, 23_834_568),
    ])
    def test_param_count_and_shape(self, model_cls, hw, want_params):
        if model_cls == 'FloatMobileNetV2':
            from hawq_tpu.models.mobilenetv2 import FloatMobileNetV2 as M
        else:
            from hawq_tpu.models.inceptionv3 import FloatInceptionV3 as M
        model = M()
        x = jax.ShapeDtypeStruct((2, hw, hw, 3), jnp.float32)
        v = jax.eval_shape(lambda k, xi: model.init(k, xi),
                           jax.random.PRNGKey(0), x)
        got = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v['params']))
        assert got == want_params, (got, want_params)
        out = jax.eval_shape(lambda vv, xi: model.apply(vv, xi), v, x)
        assert out.shape == (2, 1000)

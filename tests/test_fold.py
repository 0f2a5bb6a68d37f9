"""Bit-exactness of the 4×4 block-fold init-conv rewrite (inference/fold.py).

The folded 2×2/s1 conv + depth-to-space must reproduce the direct
7×7/stride-2/pad-3 int8 convolution's int32 accumulators exactly (same
products, reassociated integer sums).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.inference import fold


def _direct_conv(x8, w, stride=2, pad=3):
    dn = jax.lax.conv_dimension_numbers(x8.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(
        x8, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn, preferred_element_type=jnp.int32)


@pytest.mark.parametrize('h,w', [(24, 24), (32, 48)])
def test_fold4_conv_exact(h, w):
    rng = np.random.RandomState(0)
    x = rng.randint(-128, 128, (2, h, w, 3)).astype(np.int8)
    k = rng.randint(-128, 128, (7, 7, 3, 8)).astype(np.int8)

    ref = np.asarray(_direct_conv(jnp.asarray(x), jnp.asarray(k)))

    xf = fold.fold4_images(x)
    kf = fold.fold4_kernel(k)
    assert xf.shape == (2, (h + 8) // 4, (w + 8) // 4, 48)
    assert kf.shape == (3, 3, 48, 32)

    acc4 = np.asarray(_direct_conv(jnp.asarray(xf), jnp.asarray(kf),
                                   stride=1, pad=0))
    acc4 = acc4[:, :h // 4, :w // 4]
    got = fold.depth_to_space_2x2(acc4)
    np.testing.assert_array_equal(got, ref)


def test_fold4_device_fold_matches_host():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 24, 24, 3).astype(np.float32)
    a = fold.fold4_images(x)
    b = np.asarray(jax.jit(fold.fold4_images_jnp)(jnp.asarray(x)))
    np.testing.assert_array_equal(a, b)


def test_fold4_zero_pad_quantizes_to_zero():
    # the folded border zeros must quantize to integer 0, matching the
    # device-side zero padding of the direct conv (engine input quant:
    # clip(floor(x / s + 0.5)))
    s = 0.0123
    assert int(np.floor(0.0 / s + 0.5)) == 0


def test_folded_engine_bit_exact():
    """The folded_float32 engine must produce bit-identical logits to the
    standard float32 engine (the fold is a pure reassociation)."""
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.models.resnet import QResNet
    from hawq_tpu.inference.freeze import freeze_resnet
    from hawq_tpu.inference.engine import build_resnet_engine

    cfg = get_bit_config('tiny50', 'uniform8')
    model = QResNet(arch='tiny50', cfg=cfg, num_classes=10)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 32, 32, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)
    for _ in range(2):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        v = {**v, **mut}
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg, 10)

    ref = np.asarray(build_resnet_engine(
        fm, residual_dtype=jnp.int16)(x))
    eng_f = build_resnet_engine(fm, residual_dtype=jnp.int16,
                                input_mode='folded_float32')
    from hawq_tpu.inference import fold
    xf = jnp.asarray(fold.fold4_images(np.asarray(x)))
    got = np.asarray(eng_f(xf))
    np.testing.assert_array_equal(got, ref)


def test_native_fold4_matches_numpy():
    """The production C++ fold (csrc/hawq_preproc.cpp fold4) is
    byte-identical to the numpy reference for f32 and int8 pixels."""
    import pytest
    from hawq_tpu.utils import preproc
    from hawq_tpu.inference import fold
    if not preproc.native_available():
        pytest.skip('no native library')
    rng = np.random.RandomState(0)
    xf = rng.randn(2, 32, 36, 3).astype(np.float32)
    xi = rng.randint(-128, 128, (2, 32, 36, 3)).astype(np.int8)
    for x in (xf, xi):
        np.testing.assert_array_equal(preproc.fold4_images(x),
                                      fold.fold4_images(x))


def test_native_fold4_3x3s2_matches_numpy():
    """The generalized C++ fold (fold4_general) matches the numpy
    3×3/s2 fold for both pad geometries (inception p0=0, mobilenet p0=1)
    and both pixel dtypes."""
    import pytest
    from hawq_tpu.utils import preproc
    from hawq_tpu.inference import fold
    if not preproc.native_available():
        pytest.skip('no native library')
    assert hasattr(preproc._load(), 'fold4_general'), \
        'stale hawq_preproc.so: fold4_general missing (make -C csrc)'
    rng = np.random.RandomState(1)
    xf = rng.randn(2, 35, 43, 3).astype(np.float32)
    xu = rng.randint(0, 256, (2, 35, 43, 3)).astype(np.uint8)
    for x in (xf, xu):
        for p0 in (0, 1):
            np.testing.assert_array_equal(
                preproc.fold4_images_3x3s2(x, p0),
                fold.fold4_images_3x3s2(x, p0))


def test_mobilenet_folded_init_bit_exact():
    """folded_float32 input mode (host 4×4 fold of the 3×3/s2 init conv)
    produces bit-identical logits to the direct engine."""
    import jax
    from hawq_tpu.configs.bit_config import BitConfig, QuantSettings
    from hawq_tpu.models.mobilenetv2 import (
        QMobileNetV2, TINY_MNV2_STAGES, TINY_MNV2_INIT_CH, TINY_MNV2_FINAL_CH)
    from hawq_tpu.inference.freeze import freeze_mobilenetv2
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine

    cfg = BitConfig(name='tiny_mnv2_u8', table={}, settings=QuantSettings())
    model = QMobileNetV2(cfg=cfg, num_classes=8, stages=TINY_MNV2_STAGES,
                         init_ch=TINY_MNV2_INIT_CH,
                         final_ch=TINY_MNV2_FINAL_CH)
    x = jnp.asarray(np.random.RandomState(3)
                    .randn(2, 32, 32, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    @jax.jit
    def calib(v, x):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**v, **mut}

    for _ in range(2):
        v = calib(v, x)
    fm = freeze_mobilenetv2(jax.tree.map(np.asarray, v), cfg,
                            TINY_MNV2_STAGES, num_classes=8)

    direct = np.asarray(build_mobilenetv2_engine(fm, TINY_MNV2_STAGES)(x))
    xf = jnp.asarray(fold.fold4_images_3x3s2(np.asarray(x), 1))
    eng_f = build_mobilenetv2_engine(fm, TINY_MNV2_STAGES,
                                     input_mode='folded_float32',
                                     input_hw=(32, 32))
    np.testing.assert_array_equal(np.asarray(eng_f(xf)), direct)


@pytest.mark.slow
def test_inception_folded_init_bit_exact():
    import jax
    from hawq_tpu.configs.bit_config import BitConfig, QuantSettings
    from hawq_tpu.models.inceptionv3 import QInceptionV3
    from hawq_tpu.inference.engine_inception import (freeze_inceptionv3,
                                                     build_inceptionv3_engine)

    width_div = 16
    cfg = BitConfig(name='it_u8', table={}, settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=width_div)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 96, 96, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)
    _, mut = model.apply(v, x, folded=True, update_stats=True,
                         mutable=['quant_stats', 'batch_stats'])
    v = {**v, **mut}
    fm = freeze_inceptionv3(jax.tree.map(np.asarray, v), cfg, num_classes=8,
                            width_div=width_div)

    direct = np.asarray(
        build_inceptionv3_engine(fm, width_div=width_div)(x))
    xf = jnp.asarray(fold.fold4_images_3x3s2(np.asarray(x), 0))
    eng_f = build_inceptionv3_engine(fm, width_div=width_div,
                                     input_mode='folded_float32',
                                     input_hw=(96, 96))
    np.testing.assert_array_equal(np.asarray(eng_f(xf)), direct)


def test_maxpool_folded_layout_bit_exact():
    """maxpool_3x3s2p1_folded == depth_to_space_2x2 + reduce_window pool,
    on int16 and float32, including negative values (no relu assumption)."""
    import jax
    import jax.numpy as jnp
    from hawq_tpu.inference.fold import (depth_to_space_2x2,
                                         maxpool_3x3s2p1_folded)
    from hawq_tpu.inference.engine import _maxpool_int

    rng = np.random.RandomState(0)
    for dtype in (np.int16, np.float32):
        xf = rng.randint(-2 ** 14, 2 ** 14, (2, 7, 9, 4 * 5)).astype(dtype)
        want = np.asarray(_maxpool_int(
            jnp.asarray(depth_to_space_2x2(xf)), (3, 3), (2, 2),
            ((1, 1), (1, 1))))
        got = np.asarray(jax.jit(maxpool_3x3s2p1_folded)(jnp.asarray(xf)))
        assert got.shape == want.shape == (2, 7, 9, 5)
        np.testing.assert_array_equal(got, want, err_msg=str(dtype))

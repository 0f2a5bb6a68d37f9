"""QAT-graph ↔ integer-engine bit-exact parity.

The framework's central correctness property, promoted from the reference's
golden-featuremap debug_unit mechanism (/root/reference/tvm_benchmark/
test_resnet_inference.py:128-181, "100% matched!"): the frozen QAT forward
(value space, int·scale floats) and the integer engine (int8/int32 arrays)
must produce identical integer logits.

Calibrated models are module-scoped (built once per arch/scheme pair) to
keep the 2-CPU test box within budget.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.models.resnet import QResNet
from hawq_tpu.inference.freeze import freeze_resnet, model_size_bytes
from hawq_tpu.inference.engine import build_resnet_engine

_CASES = [('tiny18', 'uniform8'), ('tiny18', 'uniform4'),
          ('tiny50', 'uniform8'), ('tiny50', 'uniform4'),
          # CIFAR form: 3×3/s1 init, no maxpool, 3 stages
          # (quantized_resnet_v1.py:334-348, 504-513)
          ('resnet20_cifar', 'uniform8')]
_cache = {}


def _calibrated_model(arch, scheme, num_classes=10, size=32, batch=2, seed=0):
    key = (arch, scheme)
    if key in _cache:
        return _cache[key]
    cfg = get_bit_config(arch, scheme)
    model = QResNet(arch=arch, cfg=cfg, num_classes=num_classes)
    rng = np.random.RandomState(seed)
    x = jnp.array(rng.randn(batch, size, size, 3).astype(np.float32))
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


@pytest.mark.parametrize('arch,scheme', _CASES)
def test_qat_engine_parity(arch, scheme):
    model, cfg, v, x = _calibrated_model(arch, scheme)
    qat_logits = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, folded=True, update_stats=False))(v, x))

    fm = freeze_resnet(jax.tree.map(np.asarray, v), arch, cfg, num_classes=10)
    eng_logits = np.asarray(build_resnet_engine(fm, s2d_init=False)(x))

    out_scale = (fm['quant_output.weight_scale'].astype(np.float64)
                 * np.float64(fm.act_scale('quant_act_output')))
    qat_int = np.round(qat_logits / out_scale)
    eng_int = np.round(eng_logits / out_scale)
    mismatches = int(np.sum(qat_int != eng_int))
    assert mismatches == 0, (
        f'{mismatches}/{qat_int.size} integer logits differ; '
        f'max |Δ| = {np.max(np.abs(qat_logits / out_scale - eng_logits / out_scale))}')


def test_s2d_init_is_bit_exact():
    """The space-to-depth init-conv rewrite is a pure reordering."""
    model, cfg, v, x = _calibrated_model('tiny50', 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg, 10)
    ref = np.asarray(build_resnet_engine(fm, s2d_init=False)(x))
    s2d = np.asarray(build_resnet_engine(fm, s2d_init=True)(x))
    np.testing.assert_array_equal(ref, s2d)


@pytest.mark.parametrize('scheme', ['uniform8', 'uniform4'])
def test_f32_conv_mode_bit_exact(scheme):
    """conv_mode='f32' (certified-exact f32 route, engine.py notes) is
    bit-identical — including with the int16 residual carrier, folded
    input, and uint8 input combinations."""
    model, cfg, v, x = _calibrated_model('tiny50', scheme)
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg, 10)
    ref = np.asarray(build_resnet_engine(fm)(x))
    f32 = np.asarray(build_resnet_engine(fm, conv_mode='f32')(x))
    np.testing.assert_array_equal(ref, f32)
    f32i16 = np.asarray(build_resnet_engine(fm, conv_mode='f32',
                                            residual_dtype=jnp.int16)(x))
    np.testing.assert_array_equal(ref, f32i16)
    # sectioned bf16 init (init conv only; rest of the graph int8)
    ib = np.asarray(build_resnet_engine(fm, init_mode='bf16cert',
                                        residual_dtype=jnp.int16)(x))
    np.testing.assert_array_equal(ref, ib)


def test_int16_residual_matches_when_in_range():
    """int16 residual carry only clamps values beyond 2^15-1; on a calibrated
    tiny model logits match int32 exactly."""
    model, cfg, v, x = _calibrated_model('tiny18', 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny18', cfg, 10)
    ref = np.asarray(build_resnet_engine(fm)(x))
    i16 = np.asarray(build_resnet_engine(fm, residual_dtype=jnp.int16)(x))
    np.testing.assert_array_equal(ref, i16)


def test_model_size_w4_half_of_w8():
    _, cfg8, v, _ = _calibrated_model('tiny50', 'uniform8')
    fm8 = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg8, 10)
    cfg4 = get_bit_config('tiny50', 'uniform4')
    fm4 = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg4, 10)
    s8, s4 = model_size_bytes(fm8), model_size_bytes(fm4)
    # tiny models carry proportionally large per-channel scale/bias overhead;
    # real resnet18 lands at 11.1 MB → 5.8 MB (README.md:47,49)
    assert s4 < 0.85 * s8


def test_engine_jits_once_and_is_pure():
    model, cfg, v, x = _calibrated_model('tiny18', 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny18', cfg, 10)
    engine = build_resnet_engine(fm)
    a = np.asarray(engine(x))
    b = np.asarray(engine(x))
    np.testing.assert_array_equal(a, b)


def test_uint8_input_mode_bit_exact():
    """uint8 serving input (per-channel 256-entry LUT built with the exact
    f32 preprocessing ops) yields **bit-identical** logits to feeding
    host-normalized f32 of the same pixels — no tolerance."""
    from hawq_tpu.inference.engine import IMAGENET_MEAN, IMAGENET_STD
    model, cfg, v, _ = _calibrated_model('tiny18', 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny18', cfg, 10)

    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    # the canonical host preprocessing (same f32 op order as csrc/preproc):
    f32 = ((u8.astype(np.float32) / np.float32(255.0))
           - IMAGENET_MEAN.astype(np.float32)) / IMAGENET_STD.astype(np.float32)

    eng_f32 = build_resnet_engine(fm)
    eng_u8 = build_resnet_engine(fm, input_mode='uint8')
    a = np.asarray(eng_f32(jnp.asarray(f32)))
    b = np.asarray(eng_u8(jnp.asarray(u8)))
    np.testing.assert_array_equal(a, b)


def test_percentile_calibration():
    """act_percentile clips outliers out of the calibration range."""
    from hawq_tpu.configs.bit_config import BitConfig, QuantSettings
    cfg = BitConfig(name='tiny18_pct', table={},
                    settings=QuantSettings(act_percentile=99.0))
    model = QResNet(arch='tiny18', cfg=cfg, num_classes=10)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    x[0, 0, 0, 0] = 1000.0          # outlier
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x), folded=True,
                   update_stats=True)
    _, mut = model.apply(v, jnp.asarray(x), folded=True, update_stats=True,
                         mutable=['quant_stats', 'batch_stats'])
    x_max = float(mut['quant_stats']['quant_input']['x_max'])
    assert x_max < 100.0            # percentile ignored the outlier


def test_per_unit_golden_featuremaps():
    """Per-unit integer featuremap parity: the engine's capture (debug-unit)
    tensors must bit-match the QAT graph's sown QuantAct integers — the
    reference's golden-featuremap mechanism (hawq_utils_resnet50.py:374-424
    + test_resnet_inference.py --debug-unit) as a proper test."""
    model, cfg, v, x = _calibrated_model('tiny50', 'uniform8')
    _, state = model.apply(v, x, folded=True, update_stats=False,
                           mutable=['intermediates'])
    inter = state['intermediates']
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg, 10)

    for s, u in [(1, 1), (2, 1), (2, 2)]:
        node = f'stage{s}.unit{u}.quant_act_int32'
        eng = np.asarray(build_resnet_engine(fm, capture=node)(x))
        # QAT sow: pre-ReLU integer values of the residual requant-add;
        # the engine's capture is post-ReLU.  The QAT graph threads the
        # exact int32 accumulators into the residual requant (no f32 value
        # recovery), so parity is **exact** — the reference's "100% matched"
        # bar (test_resnet_inference.py:128-181).
        qat_q = np.asarray(
            inter[f'stage{s}_unit{u}']['quant_act_int32']['q_int'][0])
        qat_post_relu = np.maximum(qat_q, 0.0)
        np.testing.assert_array_equal(
            qat_post_relu, eng.astype(np.float64),
            err_msg=f'{node}: per-unit featuremap parity broken')


def test_jit_eager_forward_identical():
    """The jitted QAT forward is bit-identical to eager execution.

    resnet20_cifar is the canary: at ~0.27M weights the probability of a
    borderline rounding somewhere in the graph is ~1, so any XLA algebraic
    rewrite of the scale arithmetic (rsqrt, reciprocal-multiply, mul/div
    reassociation — see quant/ops.py exact()) shows up here as a logits
    mismatch.  The tiny-arch parity tests alone cannot catch this class."""
    model, cfg, v, x = _calibrated_model('resnet20_cifar', 'uniform8')
    eager = np.asarray(model.apply(v, x, folded=True, update_stats=False))
    jit = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, folded=True, update_stats=False))(v, x))
    np.testing.assert_array_equal(eager, jit)


def test_fused_unit_input_bit_identical():
    """The residual-add/next-unit-input fusion (engine.py, batch-gated on
    TPU for perf) must be a pure dataflow change: fused and unfused builds
    produce identical logits and identical captured unit inputs."""
    from hawq_tpu.inference.freeze import freeze_resnet
    from hawq_tpu.inference.engine import build_resnet_engine

    model, cfg, v, x = _calibrated_model('tiny50', 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg, 10)
    for dtype in (jnp.int32, jnp.int16):
        a = np.asarray(build_resnet_engine(
            fm, residual_dtype=dtype, fuse_unit_input=True)(x))
        b = np.asarray(build_resnet_engine(
            fm, residual_dtype=dtype, fuse_unit_input=False)(x))
        np.testing.assert_array_equal(a, b, err_msg=str(dtype))
    node = 'stage2.unit2.input'
    ca = np.asarray(build_resnet_engine(fm, capture=node,
                                        fuse_unit_input=True)(x))
    cb = np.asarray(build_resnet_engine(fm, capture=node,
                                        fuse_unit_input=False)(x))
    np.testing.assert_array_equal(ca, cb)

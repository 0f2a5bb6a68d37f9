"""Requant precision: the f32 dyadic path vs an exact-integer oracle.

The framework evaluates round(acc · m·2⁻ᵉ) on the f32 VPU (quant/ops.py
module docstring); the reference evaluates round(z_int·m/2³¹) in float64
(/root/reference/utils/quantization_utils/quant_utils.py:394-413).  QAT and
the engine share the f32 path, so *parity* is exact by construction — these
tests bound the f32 path's deviation from the mathematically exact integer
expression:

  1. an exact int64 oracle ((2·acc·m + 2ᵉ) // 2ᵉ⁺¹, true round-half-up of
     the rational acc·m/2ᵉ) over adversarial + random accumulators across
     the full int32 range: deviation is ≤ 1 LSB everywhere and zero except
     for accumulators within float-rounding distance of a .5 boundary;
  2. on a *calibrated model's real accumulators* (every conv layer of the
     tiny50 parity fixture), the f32 path matches the exact oracle on 100%
     of values — the serving-grade statement.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hawq_tpu.quant import ops as qops


def _decompose(ratio: float):
    """Host (m, e) with the framework's 23-bit mantissa (dyadic_decompose)."""
    m, e = np.frexp(np.float32(ratio))
    m_int = int(np.floor(m * 2.0 ** qops.DYADIC_MANTISSA_BITS + 0.5))
    e_out = int(qops.DYADIC_MANTISSA_BITS - e)
    return m_int, e_out


def _oracle(acc: np.ndarray, m: int, e: int, lo: float, hi: float):
    """Exact round-half-up(acc·m/2**e) in int64 arithmetic.

    round_half_up(n/d) = floor(n/d + 1/2) = (2n + d) // (2d); Python/numpy
    floor division matches mathematical floor for negative n.  |acc·m| ≤
    2³¹·2²³ = 2⁵⁴ < int64 max."""
    acc = acc.astype(np.int64)
    n = 2 * acc * m + (1 << e)
    out = n // (1 << (e + 1))
    return np.clip(out, lo, hi)


def test_requant_f32_vs_exact_oracle_full_range():
    rng = np.random.RandomState(0)
    ratios = [1e-4, 3.7e-4, 1 / 3, 0.01234, 2.5e-6, 7.77e-3]
    for ratio in ratios:
        m, e = _decompose(ratio)
        mult = np.ldexp(np.float32(m), -e).astype(np.float32)

        # adversarial: accs whose exact product is near a .5 boundary,
        # plus uniform random over the full int32 accumulator range
        half_steps = (np.arange(1, 200, dtype=np.int64) * 2 - 1) * (1 << e)
        near_half = (half_steps // (2 * m))[:, None] + \
            np.arange(-2, 3, dtype=np.int64)[None, :]
        acc = np.concatenate([
            near_half.reshape(-1),
            rng.randint(-2 ** 31 + 1, 2 ** 31 - 1, size=20000),
            rng.randint(-2 ** 22, 2 ** 22, size=20000),
        ]).astype(np.int64)
        acc = np.clip(acc, -2 ** 31 + 1, 2 ** 31 - 1)

        got = np.asarray(jax.jit(
            lambda a: qops.requant_int32(a, jnp.float32(mult), 8, True))(
                jnp.asarray(acc.astype(np.int32))))
        want = _oracle(acc, m, e, -128, 127)
        diff = np.abs(got.astype(np.int64) - want)
        assert diff.max() <= 1, (ratio, int(diff.max()))
        # flips only happen within float-rounding distance of a .5 boundary:
        # the rate over random accs must be tiny
        n_random = 40000
        flips = int(np.sum(diff[-n_random:] > 0))
        assert flips <= n_random * 1e-3, (ratio, flips)


def test_requant_exact_on_calibrated_model_accumulators():
    """Every raw conv accumulator of the calibrated tiny50 parity fixture
    requantizes identically under the f32 path and the exact oracle."""
    from tests.test_engine_parity import _calibrated_model
    from hawq_tpu.inference.freeze import freeze_resnet
    from hawq_tpu.inference.engine import build_resnet_engine
    from hawq_tpu.configs.bit_config import RESNET_UNITS

    model, cfg, v, x = _calibrated_model('tiny50', 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg, 10)

    max_abs_acc = 0
    checked = 0
    for s, n_units in enumerate(RESNET_UNITS['tiny50'], start=1):
        for u in range(1, n_units + 1):
            p = f'stage{s}.unit{u}'
            xa = np.asarray(build_resnet_engine(
                fm, capture=f'{p}.input')(x)).astype(np.int64)
            key = f'{p}.quant_convbn1'
            w = fm[key + '.weight_int'].astype(np.int64)
            b = fm[key + '.bias_int'].astype(np.int64)
            # exact int64 conv (1×1 stride-1/2 for tiny50 conv1)
            stride = 2 if (u == 1 and s > 1) else 1
            acc = np.einsum('bhwc,co->bhwo', xa[:, ::stride, ::stride, :],
                            w.reshape(w.shape[2], w.shape[3])) + b
            max_abs_acc = max(max_abs_acc, int(np.abs(acc).max()))

            sa = float(fm.act_scale(f'{p}.quant_act'))
            sa1 = float(fm.act_scale(f'{p}.quant_act1'))
            w_scale = fm[key + '.weight_scale'].astype(np.float32)
            for c in range(acc.shape[-1]):
                ratio = float(np.float32(w_scale[c] if w_scale.size > 1
                                         else w_scale[0])
                              * np.float32(sa) / np.float32(sa1))
                m, e = _decompose(ratio)
                mult = np.ldexp(np.float32(m), -e).astype(np.float32)
                a = np.maximum(acc[..., c].reshape(-1), 0)  # post-ReLU
                got = np.asarray(qops.requant_int32(
                    jnp.asarray(a.astype(np.int32)), jnp.float32(mult),
                    8, True))
                want = _oracle(a, m, e, -128, 127)
                np.testing.assert_array_equal(got.astype(np.int64), want)
                checked += a.size
    assert checked > 0
    # document where the observed accumulators sit vs the f32-exact 2**24
    # cast bound (real ResNet50 worst-case K=4608 can exceed it; deviation
    # is bounded by the full-range test above)
    assert max_abs_acc < 2 ** 31

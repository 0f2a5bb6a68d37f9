"""Layer-level tests: integer conv exactness, QuantAct statistics/requant
threading, conv+BN folding, linear head — parity targets in
/root/reference/utils/quantization_utils/quant_modules.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.nn import layers as L
from hawq_tpu.quant import ops as qops


class TestIntConv:
    def test_matches_numpy_int32(self):
        rng = np.random.RandomState(0)
        x = rng.randint(-128, 128, size=(2, 8, 8, 4)).astype(np.float32)
        w = rng.randint(-8, 8, size=(3, 3, 4, 5)).astype(np.float32)
        y = L.int_conv2d(jnp.array(x), jnp.array(w), jnp.zeros((5,)),
                         (1, 1), ((1, 1), (1, 1)), 1)
        # independent int reference via float64 conv on small tensor
        xi, wi = x.astype(np.int64), w.astype(np.int64)
        ref = np.zeros((2, 8, 8, 5), np.int64)
        xp = np.pad(xi, ((0, 0), (1, 1), (1, 1), (0, 0)))
        for b in range(2):
            for i in range(8):
                for j in range(8):
                    patch = xp[b, i:i + 3, j:j + 3, :]
                    ref[b, i, j] = np.tensordot(patch, wi, axes=3)
        np.testing.assert_array_equal(np.asarray(y, np.int64), ref)

    def test_gradient_flows(self):
        x = jnp.ones((1, 4, 4, 2))
        w = jnp.ones((3, 3, 2, 3))
        gx, gw = jax.grad(
            lambda x, w: jnp.sum(L.int_conv2d(x, w, jnp.zeros((3,)),
                                              (1, 1), 'SAME', 1)),
            argnums=(0, 1))(x, w)
        assert float(jnp.sum(jnp.abs(gx))) > 0
        assert float(jnp.sum(jnp.abs(gw))) > 0

    def test_int_matmul_exact(self):
        rng = np.random.RandomState(1)
        a = rng.randint(-128, 128, (16, 32)).astype(np.float32)
        b = rng.randint(-128, 128, (32, 8)).astype(np.float32)
        y = L.int_matmul(jnp.array(a), jnp.array(b), jnp.zeros((8,)))
        np.testing.assert_array_equal(
            np.asarray(y, np.int64),
            a.astype(np.int64) @ b.astype(np.int64))


class TestQuantAct:
    def _init_apply(self, mod, *args, **kwargs):
        variables = mod.init(jax.random.PRNGKey(0), *args, **kwargs)
        return variables

    def test_stats_ema_update(self):
        mod = L.QuantAct(bits=8, momentum=0.9)
        x1 = jnp.array([[-1.0, 2.0]])
        v = mod.init(jax.random.PRNGKey(0), x1, update_stats=True)
        (y, s), mut = mod.apply(v, x1, update_stats=True,
                                mutable=['quant_stats'])
        # first update initializes to batch min/max
        assert mut['quant_stats']['x_min'] == pytest.approx(-1.0)
        assert mut['quant_stats']['x_max'] == pytest.approx(2.0)
        v2 = {'quant_stats': mut['quant_stats']}
        x2 = jnp.array([[-3.0, 1.0]])
        (_, _), mut2 = mod.apply(v2, x2, update_stats=True,
                                 mutable=['quant_stats'])
        assert mut2['quant_stats']['x_min'] == pytest.approx(-1.0 * 0.9 + -3.0 * 0.1)
        assert mut2['quant_stats']['x_max'] == pytest.approx(2.0 * 0.9 + 1.0 * 0.1)

    def test_frozen_stats_not_updated(self):
        mod = L.QuantAct(bits=8)
        x = jnp.array([[-1.0, 2.0]])
        v = mod.init(jax.random.PRNGKey(0), x, update_stats=True)
        (y, s), mut = mod.apply(v, x, update_stats=True, mutable=['quant_stats'])
        out, mut2 = mod.apply({'quant_stats': mut['quant_stats']}, x * 100,
                              update_stats=False, mutable=['quant_stats'])
        assert mut2['quant_stats']['x_min'] == mut['quant_stats']['x_min']

    def test_output_is_int_times_scale(self):
        mod = L.QuantAct(bits=8)
        x = jnp.array([[-0.9, 0.3, 1.7]])
        v = mod.init(jax.random.PRNGKey(0), x, update_stats=True)
        (y, s), _ = mod.apply(v, x, update_stats=True, mutable=['quant_stats'])
        ints = np.asarray(y) / np.asarray(s)
        np.testing.assert_allclose(ints, np.round(ints), atol=1e-4)
        # fake quant error bounded by scale/2
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   atol=float(s) / 2 + 1e-6)

    def test_requant_case_matches_direct(self):
        """Dyadic requant of an int32 accumulator lands within one LSB of
        direct quantization of the same value."""
        mod = L.QuantAct(bits=8)
        acc_scale = jnp.float32(1e-3)
        acc_int = jnp.array([[1000.0, -4000.0, 12345.0]])
        x = acc_int * acc_scale
        v = mod.init(jax.random.PRNGKey(0), x, update_stats=True)
        (y, s), _ = mod.apply(v, x, pre_act_scale=acc_scale,
                              update_stats=True, mutable=['quant_stats'])
        ints = np.asarray(y / s)
        direct = np.round(np.asarray(x) / np.asarray(s))
        np.testing.assert_allclose(ints, direct, atol=1.0)

    def test_asymmetric_post_relu(self):
        mod = L.QuantAct(bits=4, quant_mode='asymmetric')
        x = jnp.array([[0.0, 0.5, 3.0]])
        v = mod.init(jax.random.PRNGKey(0), x, update_stats=True)
        (y, s), _ = mod.apply(v, x, update_stats=True, mutable=['quant_stats'])
        ints = np.asarray(y / s)
        assert ints.min() >= 0 and ints.max() <= 15


class TestQuantConvBn:
    def test_folded_output_int_times_scale(self):
        mod = L.QuantConvBn(features=8, kernel_size=(3, 3), weight_bit=8)
        rng = np.random.RandomState(0)
        x_int = rng.randint(-127, 128, (2, 6, 6, 4)).astype(np.float32)
        in_scale = jnp.float32(0.01)
        x = jnp.array(x_int) * in_scale
        v = mod.init(jax.random.PRNGKey(0), x, in_scale, folded=True)
        (y, w_scale, acc), _ = mod.apply(v, x, in_scale, folded=True,
                                         mutable=['batch_stats'])
        # output = acc_int * (w_scale * in_scale): dividing recovers integers
        ints = np.asarray(y) / (np.asarray(w_scale) * float(in_scale))
        np.testing.assert_allclose(ints, np.round(ints), atol=1e-2)

    def test_unfolded_updates_bn_stats(self):
        mod = L.QuantConvBn(features=8, kernel_size=(3, 3), bn_momentum=0.9)
        rng = np.random.RandomState(0)
        x = jnp.array(rng.randn(4, 6, 6, 4).astype(np.float32))
        in_scale = jnp.float32(0.05)
        v = mod.init(jax.random.PRNGKey(0), x, in_scale, folded=False,
                     update_stats=True)
        (_, _, _), mut = mod.apply(v, x, in_scale, folded=False,
                                   update_stats=True, mutable=['batch_stats'])
        assert float(jnp.sum(jnp.abs(mut['batch_stats']['mean']))) > 0

    def test_folding_consistency(self):
        """After BN stats converge, folded and unfolded paths agree to
        quantization error."""
        mod = L.QuantConvBn(features=4, kernel_size=(1, 1), weight_bit=8)
        rng = np.random.RandomState(3)
        x = jnp.array(rng.randn(64, 4, 4, 3).astype(np.float32))
        in_scale = jnp.float32(0.02)
        x = qops.round_half_up(x / in_scale).clip(-127, 127) * in_scale
        v = mod.init(jax.random.PRNGKey(0), x, in_scale, folded=False,
                     update_stats=True)

        @jax.jit
        def step(v):
            (yu, _, _), mut = mod.apply(v, x, in_scale, folded=False,
                                        update_stats=True,
                                        mutable=['batch_stats'])
            return yu, {**v, 'batch_stats': mut['batch_stats']}

        # drive running stats toward batch stats
        for _ in range(60):
            yu, v = step(v)
        (yf, _, _), _ = mod.apply(v, x, in_scale, folded=True,
                                  mutable=['batch_stats'])
        corr = np.corrcoef(np.asarray(yu).ravel(), np.asarray(yf).ravel())[0, 1]
        assert corr > 0.99


class TestQuantLinear:
    def test_output_scale_correct(self):
        mod = L.QuantLinear(features=10)
        rng = np.random.RandomState(0)
        x_int = rng.randint(-127, 128, (4, 16)).astype(np.float32)
        in_scale = jnp.float32(0.01)
        x = jnp.array(x_int) * in_scale
        v = mod.init(jax.random.PRNGKey(0), x, in_scale)
        y = mod.apply(v, x, in_scale)
        # compare with float linear on fake-quant weights
        k = np.asarray(v['params']['kernel'])
        b = np.asarray(v['params']['bias'])
        ref = np.asarray(x) @ k + b
        np.testing.assert_allclose(np.asarray(y), ref, atol=0.05, rtol=0.05)


class TestPools:
    def test_avg_pool_integer_division(self):
        scale = jnp.float32(0.5)
        # ints such that the window average is fractional: int division truncs
        x_int = jnp.array([[1.0, 2.0], [2.0, 2.0]]).reshape(1, 2, 2, 1)
        x = x_int * scale
        y, s = L.quant_avg_pool(x, scale, (2, 2))
        # mean = 7/4 = 1.75 → trunc → 1 → ·scale = 0.5
        assert float(y[0, 0, 0, 0]) == pytest.approx(0.5)

    def test_max_pool_passthrough(self):
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        y, s = L.quant_max_pool(x, jnp.float32(0.1), (2, 2), (2, 2), 'VALID')
        assert float(y[0, 0, 0, 0]) == 5.0
        assert float(s) == pytest.approx(0.1)


class TestDetachedRanges:
    """Range statistics are buffers in the reference (x.data.min()
    quant_modules.py:235, w.data.detach() :95, scaled_weight.data :453):
    no gradient may flow from the scales back into the min/max
    reductions.  The leak cost 42% of the b64 train step before round 3
    (benchmarks/train_breakdown_b64.json)."""

    def test_quant_act_grad_is_pure_ste(self):
        # case (a) input quantization: out = quantize(x)*scale with STE
        # backward g/scale, so d sum(out) / dx == 1 for in-range x.  A
        # differentiable range would add an argmin/argmax term of order
        # (1-momentum)*|x| at the extremes — far above float roundoff.
        mod = L.QuantAct(bits=8, momentum=0.9)
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(4, 33).astype(np.float32))
        v = mod.init(jax.random.PRNGKey(0), x, update_stats=True)

        def f(xx):
            (y, s), _ = mod.apply(v, xx, update_stats=True,
                                  mutable=['quant_stats'])
            return jnp.sum(y)

        g = np.asarray(jax.grad(f)(x))
        np.testing.assert_allclose(g, np.ones_like(g), rtol=0, atol=1e-5)

    def test_convbn_weight_scale_detached(self):
        # folded QuantConvBn: gradient w.r.t. the kernel flows only via
        # the STE quantize path (g * bias_scale / weight_scale ... chain),
        # never via the weight range.  With a leaky range, the argmax
        # weight element would pick up an extra O(sum(acc*g)) term.
        mod = L.QuantConvBn(features=3, kernel_size=(1, 1))
        x = jnp.asarray(np.random.RandomState(1)
                        .randn(2, 4, 4, 3).astype(np.float32))
        v = mod.init(jax.random.PRNGKey(0), x, jnp.float32(0.05),
                     folded=True)

        def f(params):
            out, _, _ = mod.apply({**v, 'params': params}, x,
                                  jnp.float32(0.05), folded=True)
            return jnp.sum(out)

        g = jax.grad(f)(v['params'])
        gk = np.asarray(g['kernel'])
        # pure STE: d out / d kernel == ones-conv backprop (x summed over
        # batch/pixels per input channel), identical for every output
        # channel regardless of that channel's weight range
        expect = np.asarray(jnp.sum(x, axis=(0, 1, 2)))
        np.testing.assert_allclose(gk[0, 0], expect[:, None] *
                                   np.ones((1, 3), np.float32),
                                   rtol=2e-5)

"""Golden tests for the quant core against tiny numpy references.

Mirrors the numerics of /root/reference/utils/quantization_utils/
quant_utils.py (scale computation, STE quantizers, dyadic decomposition,
fixed-point requant) — validated here against independent numpy
reimplementations, not against jax re-evaluations of the same code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.quant import ops as qops


def np_symmetric_scale(bits, lo, hi):
    n = 2 ** (bits - 1) - 1
    return np.maximum(np.maximum(np.abs(lo), np.abs(hi)), 1e-8) / n


class TestScales:
    def test_symmetric_scalar(self):
        s = qops.symmetric_quant_scale(8, jnp.float32(-0.7), jnp.float32(1.3))
        assert np.allclose(s, 1.3 / 127)

    def test_symmetric_per_channel(self):
        lo = jnp.array([-1.0, -0.25, 0.0])
        hi = jnp.array([0.5, 0.75, 0.0])
        s = qops.symmetric_quant_scale(4, lo, hi)
        expect = np_symmetric_scale(4, np.array(lo), np.array(hi))
        np.testing.assert_allclose(np.asarray(s), expect, rtol=1e-7)
        assert s[2] == pytest.approx(1e-8 / 7)  # zero range clamps to eps

    def test_asymmetric(self):
        s = qops.asymmetric_quant_scale(4, jnp.float32(0.0), jnp.float32(6.0))
        assert np.allclose(s, 6.0 / 15)


class TestQuantizers:
    def test_symmetric_values_and_clip(self):
        x = jnp.array([-3.0, -1.27, 0.0, 0.633, 1.27, 99.0])
        q = qops.quantize_symmetric(x, jnp.float32(0.01), 8)
        np.testing.assert_array_equal(
            np.asarray(q), [-128.0, -127.0, 0.0, 63.0, 127.0, 127.0])

    def test_round_half_up(self):
        x = jnp.array([0.5, 1.5, -0.5, -1.5, 2.49])
        q = qops.quantize_symmetric(x, jnp.float32(1.0), 8)
        # half-up: 0.5→1, 1.5→2, -0.5→0, -1.5→-1
        np.testing.assert_array_equal(np.asarray(q), [1.0, 2.0, 0.0, -1.0, 2.0])

    def test_asymmetric_range(self):
        x = jnp.array([-1.0, 0.0, 7.4, 99.0])
        q = qops.quantize_asymmetric(x, jnp.float32(1.0), 4)
        np.testing.assert_array_equal(np.asarray(q), [0.0, 0.0, 7.0, 15.0])

    def test_ste_gradient_is_inverse_scale(self):
        scale = jnp.float32(0.1)
        g = jax.grad(lambda x: jnp.sum(qops.quantize_symmetric(x, scale, 8)))(
            jnp.array([0.33, -0.21]))
        np.testing.assert_allclose(np.asarray(g), [10.0, 10.0], rtol=1e-6)

    def test_fake_quant_gradient_identity(self):
        # d/dx (quantize(x)·s) == 1 under STE
        scale = jnp.float32(0.037)
        g = jax.grad(
            lambda x: jnp.sum(qops.quantize_symmetric(x, scale, 8) * scale))(
                jnp.array([0.3, -0.8]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 1.0], rtol=1e-6)


class TestDyadic:
    def test_decompose_reconstructs(self):
        ratios = jnp.array([0.37, 1.0, 0.001, 123.456, 0.9999])
        m, e = qops.dyadic_decompose(ratios)
        recon = np.asarray(m) * 2.0 ** (-np.asarray(e, np.float64))
        np.testing.assert_allclose(recon, np.asarray(ratios), rtol=2e-7)
        # mantissas are integers in [2^22, 2^23]
        m_np = np.asarray(m)
        assert np.all(m_np == np.round(m_np))
        assert np.all((m_np >= 2 ** 22) & (m_np <= 2 ** 23))

    def test_multiplier_exact_float32(self):
        ratios = jnp.array([0.37, 0.000123, 7.7])
        mult = qops.dyadic_multiplier(ratios)
        m, e = qops.dyadic_decompose(ratios)
        exact = np.asarray(m, np.float64) * 2.0 ** (-np.asarray(e, np.float64))
        # the float32 multiplier IS the exact dyadic rational
        np.testing.assert_array_equal(np.asarray(mult, np.float64), exact)

    def test_requant_matches_integer_reference(self):
        # numpy int64 reference: round_half_up(z_int * m / 2**e)
        rng = np.random.RandomState(0)
        z_int = rng.randint(-2 ** 20, 2 ** 20, size=(64,)).astype(np.float32)
        acc_scale = np.float32(3.1e-4)
        out_scale = np.float32(0.05)
        z = jnp.array(z_int) * acc_scale
        got = qops.dyadic_requant(z, jnp.float32(acc_scale),
                                  jnp.float32(out_scale), 8, True)

        m, e = qops.dyadic_decompose(jnp.float32(acc_scale / out_scale))
        m, e = int(np.asarray(m)), int(np.asarray(e))
        prod = z_int.astype(np.int64) * m
        ref = np.floor(prod / 2.0 ** e + 0.5)
        ref = np.clip(ref, -128, 127)
        np.testing.assert_array_equal(np.asarray(got), ref)

    def test_requant_residual_matches_reference(self):
        rng = np.random.RandomState(1)
        main_int = rng.randint(-2 ** 18, 2 ** 18, size=(32,)).astype(np.float32)
        id_int = rng.randint(-2 ** 10, 2 ** 10, size=(32,)).astype(np.float32)
        s_main, s_id, s_out = np.float32(2.7e-4), np.float32(0.021), np.float32(0.033)
        z = jnp.array(main_int) * s_main + jnp.array(id_int) * s_id
        got = qops.dyadic_requant_residual(
            z, jnp.float32(s_main), jnp.array(id_int) * s_id,
            jnp.float32(s_id), jnp.float32(s_out))

        def ref_requant(ints, ratio):
            m, e = qops.dyadic_decompose(jnp.float32(ratio))
            m, e = int(np.asarray(m)), int(np.asarray(e))
            return np.floor(ints.astype(np.int64) * m / 2.0 ** e + 0.5)

        ref = ref_requant(main_int, s_main / s_out) + ref_requant(id_int, s_id / s_out)
        np.testing.assert_array_equal(np.asarray(got), ref)

    def test_requant_grad_is_inverse_out_scale(self):
        z = jnp.array([1.0, 2.0])
        g = jax.grad(lambda z: jnp.sum(qops.dyadic_requant(
            z, jnp.float32(0.1), jnp.float32(0.5), 8, True)))(z)
        np.testing.assert_allclose(np.asarray(g), [2.0, 2.0])

    def test_training_vs_engine_parity(self):
        """dyadic_requant (QAT) ≡ requant_int32 (engine) bit-for-bit."""
        rng = np.random.RandomState(2)
        acc = rng.randint(-2 ** 22, 2 ** 22, size=(128,)).astype(np.int32)
        acc_scale, out_scale = np.float32(1.7e-4), np.float32(0.013)
        qat = qops.dyadic_requant(jnp.array(acc, jnp.float32) * acc_scale,
                                  jnp.float32(acc_scale),
                                  jnp.float32(out_scale), 8, True)
        mult = qops.dyadic_multiplier(jnp.float32(acc_scale / out_scale))
        eng = qops.requant_int32(jnp.array(acc), mult, 8, True)
        np.testing.assert_array_equal(np.asarray(qat, np.int32), np.asarray(eng))


class TestAvgPoolTrunc:
    def test_trunc_eps(self):
        x = jnp.array([1.9999999, 2.0000001, 48.0 / 49.0, -0.5])
        y = qops.ste_floor_eps(x)
        np.testing.assert_array_equal(np.asarray(y), [2.0, 2.0, 0.0, -0.0])

    def test_grad_passthrough(self):
        g = jax.grad(lambda x: jnp.sum(qops.ste_floor_eps(x)))(jnp.array([1.3]))
        np.testing.assert_array_equal(np.asarray(g), [1.0])


class TestPercentile:
    def test_bounds(self):
        x = jnp.arange(1000, dtype=jnp.float32)
        lo, hi = qops.percentile_bounds(x, 1.0, 99.0)
        assert 5 < float(lo) < 15
        assert 985 < float(hi) < 995

    def test_zero_lower(self):
        x = jnp.arange(100, dtype=jnp.float32) - 50
        lo, hi = qops.percentile_bounds(x, 0.0, 99.0)
        assert float(lo) == 0.0


class TestXlaRewriteImmunity:
    """XLA's algebraic simplifier rewrites f32 arithmetic under jit
    (a/sqrt(b) → a·rsqrt(b), x/const → x·(1/const), mul/div reassociation),
    each off by 1 ulp on a large input fraction — enough to flip borderline
    round-half-up decisions and silently break QAT↔engine bit-exactness at
    real-model scale.  quant/ops pins every quantization-critical value with
    optimization_barrier (exact / exact_div / bn_inv_factor); these tests
    pin the pins."""

    def test_bn_inv_factor_jit_matches_eager(self):
        rng = np.random.RandomState(1)
        g = jnp.asarray(rng.rand(4096).astype(np.float32) * 2 - 1)
        v = jnp.asarray(rng.rand(4096).astype(np.float32) + 0.01)
        f = lambda g, v: qops.bn_inv_factor(g, v, 1e-5)
        np.testing.assert_array_equal(np.asarray(f(g, v)),
                                      np.asarray(jax.jit(f)(g, v)))

    def test_exact_div_by_constant_jit_matches_eager(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(8192).astype(np.float32))
        for denom in (127, 15, 0.0127):
            f = lambda x, d=denom: qops.exact_div(x, d)
            np.testing.assert_array_equal(np.asarray(f(x)),
                                          np.asarray(jax.jit(f)(x)))

    def test_scale_chain_jit_matches_eager(self):
        """The full scale chain (bn fold → weight scale → bias scale →
        dyadic ratio → requant) is jit/eager-identical."""
        rng = np.random.RandomState(3)
        k = jnp.asarray(rng.randn(3, 3, 16, 16).astype(np.float32))
        g = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
        var = jnp.asarray(rng.rand(16).astype(np.float32) + 0.01)
        s_a = jnp.float32(0.0317)
        s_o = jnp.float32(0.0219)
        z = jnp.asarray(rng.randint(-2**20, 2**20, (2, 8, 8, 16))
                        .astype(np.float32))

        def chain(k, g, var, s_a, s_o, z):
            bf = qops.bn_inv_factor(g, var, 1e-5)
            sw = qops.exact(k * bf)
            wf = sw.reshape(-1, 16)
            ws = qops.symmetric_quant_scale(8, jnp.min(wf, 0),
                                            jnp.max(wf, 0))
            w_int = qops.quantize_symmetric(sw, ws, 8)
            bs = qops.exact(ws * s_a)
            return w_int, qops.requant_core_ste(z, bs, s_o, None, True)

        eag = chain(k, g, var, s_a, s_o, z)
        jit = jax.jit(chain)(k, g, var, s_a, s_o, z)
        for a, b in zip(eag, jit):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

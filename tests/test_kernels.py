"""Pallas kernel exact-equality tests vs the jnp reference semantics.

Interpret-mode kernel runs compile very slowly on this 2-CPU box, so they
are marked `slow` (excluded by default; run with `-m slow`).  The same
checks execute compiled on real hardware via benchmarks/kernel_check.py.
The pack/unpack and padding helpers are always tested.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from hawq_tpu.kernels import matmul as km


def _rand_case(m=128, k=256, n=128, w_bits=8, seed=0):
    rng = np.random.RandomState(seed)
    nmax = 2 ** (w_bits - 1) - 1
    x = rng.randint(-128, 128, (m, k)).astype(np.int8)
    w = rng.randint(-nmax - 1, nmax + 1, (k, n)).astype(np.int8)
    bias = rng.randint(-2 ** 14, 2 ** 14, (n,)).astype(np.int32)
    mult = (0.0005 * (0.5 + rng.rand(n))).astype(np.float32)
    return x, w, bias, mult


@pytest.mark.slow
class TestInt8Matmul:
    def test_exact_vs_reference(self):
        x, w, bias, mult = _rand_case()
        with pltpu.force_tpu_interpret_mode():
            got = km.int8_matmul_requant(jnp.array(x), jnp.array(w),
                                         jnp.array(bias), jnp.array(mult),
                                         block_m=64, block_n=128)
        ref = km.reference_matmul_requant(jnp.array(x), jnp.array(w),
                                          jnp.array(bias), jnp.array(mult))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_grid_tiling(self):
        x, w, bias, mult = _rand_case(m=256, k=128, n=256, seed=1)
        with pltpu.force_tpu_interpret_mode():
            got = km.int8_matmul_requant(jnp.array(x), jnp.array(w),
                                         jnp.array(bias), jnp.array(mult),
                                         block_m=128, block_n=128)
        ref = km.reference_matmul_requant(jnp.array(x), jnp.array(w),
                                          jnp.array(bias), jnp.array(mult))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_unsigned_4bit_output(self):
        x, w, bias, mult = _rand_case(seed=2)
        with pltpu.force_tpu_interpret_mode():
            got = km.int8_matmul_requant(jnp.array(x), jnp.array(w),
                                         jnp.array(bias), jnp.array(mult),
                                         out_bits=4, signed=False,
                                         block_m=64, block_n=128)
        g = np.asarray(got)
        assert g.min() >= 0 and g.max() <= 15


class TestPackInt4:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        w = rng.randint(-8, 8, (64, 32)).astype(np.int8)
        np.testing.assert_array_equal(km.unpack_int4(km.pack_int4(w)), w)

    @pytest.mark.slow
    def test_int4w_matmul_exact(self):
        x, w, bias, mult = _rand_case(m=64, k=128, n=128, w_bits=4, seed=3)
        packed = km.pack_int4(w)
        with pltpu.force_tpu_interpret_mode():
            got = km.int4w_matmul_requant(jnp.array(x), jnp.array(packed),
                                          jnp.array(bias), jnp.array(mult),
                                          block_m=64, block_n=128)
        ref = km.reference_matmul_requant(jnp.array(x), jnp.array(w),
                                          jnp.array(bias), jnp.array(mult))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_packed_is_half_size(self):
        w = np.zeros((128, 64), np.int8)
        assert km.pack_int4(w).nbytes == w.nbytes // 2


class TestPadding:
    def test_pad_to(self):
        x = jnp.ones((100, 200), jnp.int8)
        y = km.pad_to(x, 32, 128)
        assert y.shape == (128, 256)


@pytest.mark.slow
class TestKBlocked:
    def test_kblocked_exact(self):
        x, w, bias, mult = _rand_case(m=128, k=512, n=128, seed=5)
        with pltpu.force_tpu_interpret_mode():
            got = km.int8_matmul_requant_kblocked(
                jnp.array(x), jnp.array(w), jnp.array(bias), jnp.array(mult),
                block_m=64, block_n=128, block_k=128)
        ref = km.reference_matmul_requant(jnp.array(x), jnp.array(w),
                                          jnp.array(bias), jnp.array(mult))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.slow
class TestConvKernels:
    """Pallas conv kernels (kernels/conv.py): exact equality vs the XLA
    conv oracle in interpret mode, incl. packed-int4 weights and the
    space-to-depth stride-2 rewrite."""

    def _case(self, B=1, H=8, C=128, N=128, seed=0):
        from hawq_tpu.kernels import conv as kc
        rng = np.random.RandomState(seed)
        x = rng.randint(-128, 128, (B, H, H, C)).astype(np.int8)
        w = rng.randint(-8, 8, (3, 3, C, N)).astype(np.int8)
        bias = rng.randint(-2 ** 12, 2 ** 12, (N,)).astype(np.int32)
        mult = (0.0005 * (0.5 + rng.rand(N))).astype(np.float32)
        return kc, x, w, bias, mult

    def test_int8_conv_exact(self):
        kc, x, w, bias, mult = self._case()
        B, H = x.shape[0], x.shape[1]
        ref = kc.reference_conv_requant(jnp.array(x), jnp.array(w),
                                        jnp.array(bias), jnp.array(mult),
                                        stride=1, pad=1, relu=True)
        xp = kc.prepare_conv_input(jnp.array(x), (1, 1))
        wf = kc.flatten_conv_kernel(w)
        with pltpu.force_tpu_interpret_mode():
            got = kc.int8_conv_requant(xp, jnp.array(wf), jnp.array(bias),
                                       jnp.array(mult), taps=(3, 3),
                                       out_hw=(H, H), cin=x.shape[-1],
                                       relu=True, block_n=128)
        np.testing.assert_array_equal(
            np.asarray(got).reshape(ref.shape), np.asarray(ref))

    def test_int4w_conv_exact(self):
        kc, x, w, bias, mult = self._case(seed=1)
        B, H = x.shape[0], x.shape[1]
        ref = kc.reference_conv_requant(jnp.array(x), jnp.array(w),
                                        jnp.array(bias), jnp.array(mult),
                                        stride=1, pad=1)
        xp = kc.prepare_conv_input(jnp.array(x), (1, 1))
        wp = kc.pack_int4_conv(kc.flatten_conv_kernel(w), 9)
        with pltpu.force_tpu_interpret_mode():
            got = kc.int4w_conv_requant(xp, jnp.array(wp), jnp.array(bias),
                                        jnp.array(mult), taps=(3, 3),
                                        out_hw=(H, H), cin=x.shape[-1],
                                        block_n=128)
        np.testing.assert_array_equal(
            np.asarray(got).reshape(ref.shape), np.asarray(ref))

    def test_s2d_stride2_exact(self):
        kc, x, w, bias, mult = self._case(seed=2)
        ref = kc.reference_conv_requant(jnp.array(x), jnp.array(w),
                                        jnp.array(bias), jnp.array(mult),
                                        stride=2, pad=1, relu=True)
        x2 = kc.s2d_input(jnp.array(x), 1)
        w2 = kc.s2d_kernel(w)
        oh, ow = kc.s2d_output_hw(x.shape[1], x.shape[2], 3, 3, 1)
        xp = kc.prepare_conv_input(x2, (0, 0))
        wf = kc.flatten_conv_kernel(w2)
        with pltpu.force_tpu_interpret_mode():
            got = kc.int8_conv_requant(xp, jnp.array(wf), jnp.array(bias),
                                       jnp.array(mult), taps=w2.shape[:2],
                                       out_hw=(oh, ow), cin=4 * x.shape[-1],
                                       relu=True, block_n=128)
        np.testing.assert_array_equal(
            np.asarray(got).reshape(ref.shape), np.asarray(ref))


@pytest.mark.slow
def test_pallas_routed_engine_matches_xla_engine():
    """Full engine with pallas conv routing (wide50: MXU-aligned channels,
    3×3 + 1×1 + strided convs routed) vs the plain XLA build — identical
    logits, for both uniform8 and uniform4 (packed int4 weights)."""
    import jax.numpy as jnp2
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    from hawq_tpu.inference.engine import build_resnet_engine

    rng = np.random.RandomState(0)
    x = jnp2.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    for scheme in ('uniform8', 'uniform4'):
        cfg = get_bit_config('wide50', scheme)
        fm = synthetic_frozen_resnet('wide50', cfg, num_classes=16)
        ref = np.asarray(build_resnet_engine(fm)(x))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(build_resnet_engine(fm, use_pallas=True)(x))
        np.testing.assert_array_equal(got, ref, err_msg=scheme)


def test_folded_maxpool_kernel_bit_exact():
    """kernels/pool.maxpool_folded == fold.maxpool_3x3s2p1_folded on every
    engine-reachable dtype (int16/int32 residual carriers, f32 engines),
    odd and tile-unaligned shapes included.  Small shapes, so this one
    interpret-mode kernel is cheap enough for the default suite."""
    from hawq_tpu.inference.fold import maxpool_3x3s2p1_folded
    from hawq_tpu.kernels.pool import maxpool_folded

    rng = np.random.RandomState(0)
    for dt in (np.int16, np.int32, np.float32):
        for shape in ((2, 7, 9, 20), (1, 8, 8, 256)):
            xf = rng.randint(-2 ** 14, 2 ** 14, shape).astype(dt)
            want = np.asarray(jax.jit(maxpool_3x3s2p1_folded)(jnp.asarray(xf)))
            got = np.asarray(maxpool_folded(jnp.asarray(xf), interpret=True))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f'{dt} {shape}')


@pytest.mark.slow
class TestMinMax1Pass:
    """kernels/reduce.py one-pass range reduction == jnp.min/jnp.max."""

    def test_exact_and_tail_handling(self):
        from hawq_tpu.kernels.reduce import minmax_1pass
        rng = np.random.RandomState(3)
        for shape in [(2, 56, 56, 128),        # whole blocks
                      (131072 + 777,),         # blocks + ragged tail
                      (777,)]:                 # tail only (jnp fallback)
            x = jnp.asarray(rng.randn(*shape).astype(np.float32))
            with pltpu.force_tpu_interpret_mode():
                mn, mx = minmax_1pass(x)
            assert float(mn) == float(jnp.min(x)), shape
            assert float(mx) == float(jnp.max(x)), shape

    def test_fused_minmax_dispatch_cpu(self):
        # CPU backend keeps the jnp path (no pallas) and stays exact
        from hawq_tpu.quant.ops import fused_minmax
        x = jnp.asarray(np.random.RandomState(4)
                        .randn(4, 64, 64, 64).astype(np.float32))
        mn, mx = jax.jit(fused_minmax)(x)
        assert float(mn) == float(jnp.min(x))
        assert float(mx) == float(jnp.max(x))

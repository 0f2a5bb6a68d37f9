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

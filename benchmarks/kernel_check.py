"""Run the Pallas kernels compiled on the real TPU: exact-equality vs the jnp
reference semantics + roofline timing.

Usage: python benchmarks/kernel_check.py  (needs the TPU device)

This is the hardware half of tests/test_kernels.py (whose interpret-mode
variants are too slow for the 2-CPU test box) — the analog of the
reference's kernel validation against conv2d_nhwc_python
(/root/reference/tvm_benchmark/hawq_utils_resnet50.py:44-108).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from hawq_tpu.kernels import matmul as km
    from bench import time_per_iter

    rng = np.random.RandomState(0)
    failures = 0

    def check(name, got, ref):
        nonlocal failures
        got, ref = np.asarray(got), np.asarray(ref)
        n_bad = int(np.sum(got != ref))
        status = 'OK' if n_bad == 0 else f'FAIL ({n_bad}/{got.size} differ)'
        print(f'{name:45s} {status}', flush=True)
        failures += n_bad > 0

    # -- int8 matmul + requant, several shapes --------------------------------
    for (m, k, n) in [(256, 512, 256), (512, 2048, 1024), (64, 128, 128)]:
        x = rng.randint(-128, 128, (m, k)).astype(np.int8)
        w = rng.randint(-128, 128, (k, n)).astype(np.int8)
        bias = rng.randint(-2 ** 14, 2 ** 14, (n,)).astype(np.int32)
        mult = (0.0005 * (0.5 + rng.rand(n))).astype(np.float32)
        got = km.int8_matmul_requant(jnp.array(x), jnp.array(w),
                                     jnp.array(bias), jnp.array(mult),
                                     block_m=min(m, 256), block_n=min(n, 256))
        ref = km.reference_matmul_requant(jnp.array(x), jnp.array(w),
                                          jnp.array(bias), jnp.array(mult))
        check(f'int8_matmul_requant {m}x{k}x{n}', got, ref)

    # -- unsigned 4-bit output -----------------------------------------------
    got = km.int8_matmul_requant(jnp.array(x), jnp.array(w), jnp.array(bias),
                                 jnp.array(mult), out_bits=4, signed=False,
                                 block_m=64, block_n=128)
    ref = km.reference_matmul_requant(jnp.array(x), jnp.array(w),
                                      jnp.array(bias), jnp.array(mult),
                                      out_bits=4, signed=False)
    check('int8_matmul_requant uint4 out', got, ref)

    # -- packed int4 weights --------------------------------------------------
    for (m, k, n) in [(256, 512, 256), (512, 2048, 1024)]:
        x = rng.randint(-128, 128, (m, k)).astype(np.int8)
        w4 = rng.randint(-8, 8, (k, n)).astype(np.int8)
        bias = rng.randint(-2 ** 12, 2 ** 12, (n,)).astype(np.int32)
        mult = (0.0005 * (0.5 + rng.rand(n))).astype(np.float32)
        packed = km.pack_int4(w4)
        got = km.int4w_matmul_requant(jnp.array(x), jnp.array(packed),
                                      jnp.array(bias), jnp.array(mult),
                                      block_m=min(m, 256), block_n=min(n, 256))
        ref = km.reference_matmul_requant(jnp.array(x), jnp.array(w4),
                                          jnp.array(bias), jnp.array(mult))
        check(f'int4w_matmul_requant {m}x{k}x{n}', got, ref)

    # -- folded-layout max-pool kernel ---------------------------------------
    from hawq_tpu.kernels import pool as kp
    from hawq_tpu.inference import fold as fo
    import jax
    for b, dt in [(8, np.int16), (4, np.float32)]:
        xf = rng.randint(-2 ** 14, 2 ** 14, (b, 56, 56, 256)).astype(dt)
        got = kp.maxpool_folded(jnp.array(xf))
        ref = jax.jit(fo.maxpool_3x3s2p1_folded)(jnp.array(xf))
        check(f'maxpool_folded b{b} {np.dtype(dt).name}', got, ref)

    # -- roofline timing ------------------------------------------------------
    m, k, n = 2048, 2048, 2048
    x = jnp.array(rng.randint(-128, 128, (m, k)).astype(np.int8))
    w = jnp.array(rng.randint(-128, 128, (k, n)).astype(np.int8))
    w4p = jnp.array(km.pack_int4(np.asarray(
        rng.randint(-8, 8, (k, n)).astype(np.int8))))
    bias = jnp.array(rng.randint(-100, 100, (n,)).astype(np.int32))
    mult = jnp.array((0.0005 * (0.5 + rng.rand(n))).astype(np.float32))

    t8 = time_per_iter(lambda x: km.int8_matmul_requant(x, w, bias, mult), x)
    t4 = time_per_iter(lambda x: km.int4w_matmul_requant(x, w4p, bias, mult), x)
    tf32 = time_per_iter(
        lambda x: (x.astype(jnp.float32) @ w.astype(jnp.float32)), x)
    flops = 2 * m * k * n
    print(f'int8 fused matmul : {t8*1e6:8.1f} us  {flops/t8/1e12:7.1f} TOP/s')
    print(f'int4w fused matmul: {t4*1e6:8.1f} us  {flops/t4/1e12:7.1f} TOP/s')
    print(f'f32 plain matmul  : {tf32*1e6:8.1f} us  {flops/tf32/1e12:7.1f} TFLOP/s')

    # one-pass minmax reduction (kernels/reduce.py — kept as the measured
    # alternative to the roofline-rate jnp two-pass; exactness must hold)
    from hawq_tpu.kernels.reduce import minmax_1pass
    # 205 MB — large enough that the loop cannot keep it on-chip (the
    # 103 MB variant measured 3 TB/s apparent: cache-resident, meaningless)
    xr = jnp.array(rng.randn(64, 56, 56, 256).astype(np.float32))
    mn, mx = jax.jit(minmax_1pass)(xr)
    check('minmax_1pass vs jnp.min/jnp.max',
          jnp.stack([mn, mx]), jnp.stack([jnp.min(xr), jnp.max(xr)]))
    t1 = time_per_iter(jax.jit(lambda x: sum(minmax_1pass(x))), xr)
    t2 = time_per_iter(jax.jit(lambda x: jnp.min(x) + jnp.max(x)), xr)
    print(f'minmax 1-pass     : {t1*1e6:8.1f} us  (two-pass jnp '
          f'{t2*1e6:8.1f} us — jnp is production, docs/perf_tpu.md)')

    print('ALL OK' if failures == 0 else f'{failures} kernel checks FAILED')
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())

"""Pallas conv kernels on the real TPU: exactness + latency vs XLA.

Run (one TPU process at a time!):
    timeout 590 python benchmarks/conv_check.py [--batch 8]

For each ResNet50 3×3 conv shape, checks bit-exactness of the pallas int8 /
packed-int4 kernels against the XLA int8 conv oracle, then times all three
with the in-jit loop-chaining methodology (bench.time_per_iter).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--block-n', type=int, default=256)
    ap.add_argument('--stride2', action='store_true',
                    help='also check/time the s2d stride-2 path')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from hawq_tpu.kernels import conv as kc
    from bench import time_per_iter

    print('devices:', jax.devices())
    B = args.batch
    shapes = [  # (name, H, C, N) — resnet50 3×3 convs per stage.
        # stage1 (C=64) is excluded: lane slices at dx·64 are tile-unaligned
        # and Mosaic compilation degenerates — the routing table sends
        # C<128 convs to XLA.
        ('stage4_3x3', 7, 512, 512),
        ('stage3_3x3', 14, 256, 256),
        ('stage2_3x3', 28, 128, 128),
    ]
    rng = np.random.RandomState(0)
    results = {}
    for name, H, C, N in shapes:
        x = rng.randint(-128, 128, (B, H, H, C)).astype(np.int8)
        w = rng.randint(-8, 8, (3, 3, C, N)).astype(np.int8)
        bias = rng.randint(-2 ** 12, 2 ** 12, (N,)).astype(np.int32)
        mult = (0.0005 * (0.5 + rng.rand(N))).astype(np.float32)
        xj = jnp.asarray(x)
        bn = min(args.block_n, N)

        ref_fn = jax.jit(lambda xi: kc.reference_conv_requant(
            xi, jnp.asarray(w), jnp.asarray(bias), jnp.asarray(mult),
            stride=1, pad=1, relu=True))

        wf = jnp.asarray(kc.flatten_conv_kernel(w))
        wp4 = jnp.asarray(kc.pack_int4_conv(kc.flatten_conv_kernel(w), 9))
        bj, mj = jnp.asarray(bias), jnp.asarray(mult)

        def p8_fn(xi):
            xp = kc.prepare_conv_input(xi, (1, 1))
            y = kc.int8_conv_requant(xp, wf, bj, mj, taps=(3, 3),
                                     out_hw=(H, H), cin=C, relu=True,
                                     block_n=bn)
            return y.reshape(B, H, H, N)

        def p4_fn(xi):
            xp = kc.prepare_conv_input(xi, (1, 1))
            y = kc.int4w_conv_requant(xp, wp4, bj, mj, taps=(3, 3),
                                      out_hw=(H, H), cin=C, relu=True,
                                      block_n=bn)
            return y.reshape(B, H, H, N)

        ref = np.asarray(ref_fn(xj))
        try:
            got8 = np.asarray(jax.jit(p8_fn)(xj))
            ok8 = np.array_equal(got8, ref)
        except Exception as e:
            print(f'{name}: pallas int8 FAILED to compile/run: {e}')
            ok8 = None
        try:
            got4 = np.asarray(jax.jit(p4_fn)(xj))
            ok4 = np.array_equal(got4, ref)
        except Exception as e:
            print(f'{name}: pallas int4w FAILED to compile/run: {e}')
            ok4 = None
        print(f'{name}: exact int8={ok8} int4w={ok4}')

        t_ref = time_per_iter(ref_fn, xj) * 1e3
        t8 = time_per_iter(jax.jit(p8_fn), xj) * 1e3 if ok8 else float('nan')
        t4 = time_per_iter(jax.jit(p4_fn), xj) * 1e3 if ok4 else float('nan')
        macs = B * H * H * 9 * C * N
        print(f'{name}: xla {t_ref:.4f} ms | pallas8 {t8:.4f} ms | '
              f'pallas4w {t4:.4f} ms | xla eff {2 * macs / t_ref / 1e9:.1f}'
              f' TOP/s')
        results[name] = {'xla_ms': t_ref, 'pallas8_ms': t8, 'pallas4_ms': t4,
                         'exact8': ok8, 'exact4': ok4}

    if args.stride2:
        # stage-opening stride-2 3×3 (resnet50b/18 style), e.g. 28→14 at 256ch
        for name, H, C, N in [('s2_3x3_256', 28, 256, 256),
                              ('s2_3x3_512', 14, 512, 512)]:
            x = rng.randint(-128, 128, (B, H, H, C)).astype(np.int8)
            w = rng.randint(-8, 8, (3, 3, C, N)).astype(np.int8)
            bias = rng.randint(-2 ** 12, 2 ** 12, (N,)).astype(np.int32)
            mult = (0.0005 * (0.5 + rng.rand(N))).astype(np.float32)
            xj = jnp.asarray(x)
            oh, ow = kc.s2d_output_hw(H, H, 3, 3, 1)
            _, w2 = kc.s2d_conv_transform(xj, w, 1)
            wf2 = jnp.asarray(kc.flatten_conv_kernel(w2))
            bj, mj = jnp.asarray(bias), jnp.asarray(mult)

            def s2_fn(xi):
                x2, _ = kc.s2d_conv_transform(xi, w, 1)
                xp = kc.prepare_conv_input(x2, (0, 0))
                y = kc.int8_conv_requant(xp, wf2, bj, mj, taps=w2.shape[:2],
                                         out_hw=(oh, ow), cin=4 * C,
                                         relu=True, block_n=min(args.block_n, N))
                return y.reshape(B, oh, ow, N)

            ref_fn = jax.jit(lambda xi: kc.reference_conv_requant(
                xi, jnp.asarray(w), jnp.asarray(bias), jnp.asarray(mult),
                stride=2, pad=1, relu=True))
            ref = np.asarray(ref_fn(xj))
            got = np.asarray(jax.jit(s2_fn)(xj))
            ok = np.array_equal(got, ref)
            t_ref = time_per_iter(ref_fn, xj) * 1e3
            t_s2 = time_per_iter(jax.jit(s2_fn), xj) * 1e3
            print(f'{name}: exact={ok} xla {t_ref:.4f} ms | '
                  f'pallas-s2d {t_s2:.4f} ms')
            results[name] = {'xla_ms': t_ref, 'pallas_s2d_ms': t_s2,
                             'exact': ok}

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       f'conv_check_b{B}.json')
    with open(out, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', out)


if __name__ == '__main__':
    main()

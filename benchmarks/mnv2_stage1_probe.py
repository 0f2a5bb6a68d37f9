"""Decompose MobileNetV2's early-stage cost on TPU (round-5 investigation).

The per-stage profile (benchmarks/family_bench notes) shows init+stage1+
stage2 carry ~85% of the mnv2 integer engine's runtime at batch 8, and the
certified-f32 route loses MORE time there — while the plain float model
runs the same shapes ~4× faster inside FloatMobileNetV2.  This probe times
the isolated building blocks at the stage-1 shapes (112², C=32) in every
dtype/fusion variant to localize the gap:

    timeout 590 python -u benchmarks/mnv2_stage1_probe.py

Writes benchmarks/mnv2_stage1_probe.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter

    B, H, C = 8, 112, 32
    rng = np.random.RandomState(0)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'mnv2_stage1_probe.json')
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))

    def record(name, fn, x):
        if name in results:
            print(f'{name}: cached', flush=True)
            return
        t = time_per_iter(fn, x)
        results[name] = round(t * 1e3, 4)
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f'{name}: {t*1e3:.4f} ms', flush=True)

    def conv(x, w, groups=1, strides=(1, 1), padding='VALID', pet=None):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn,
            feature_group_count=groups,
            preferred_element_type=pet or x.dtype if x.dtype != jnp.int8
            else jnp.int32)

    w1_f = rng.randn(1, 1, C, C).astype(np.float32)
    w1_i = rng.randint(-127, 128, (1, 1, C, C)).astype(np.int8)
    wd_f = rng.randn(3, 3, 1, C).astype(np.float32)
    wd_i = rng.randint(-127, 128, (3, 3, 1, C)).astype(np.int8)
    x_f = jnp.asarray(rng.rand(B, H, H, C).astype(np.float32))
    x_b = x_f.astype(jnp.bfloat16)
    x_i = jnp.asarray(rng.randint(-127, 128, (B, H, H, C)).astype(np.int8))
    mult = np.float32(0.0003)

    # 1) bare 1x1 convs, each dtype
    record('conv1x1_f32', lambda x: conv(x, w1_f), x_f)
    record('conv1x1_bf16', lambda x: conv(x, w1_f.astype(jnp.bfloat16),
                                          pet=jnp.float32), x_b)
    record('conv1x1_i8', lambda x: conv(x, w1_i, pet=jnp.int32), x_i)

    # 2) bare depthwise 3x3, each dtype
    pad = ((1, 1), (1, 1))
    record('dw3x3_f32', lambda x: conv(x, wd_f, groups=C, padding=pad), x_f)
    record('dw3x3_bf16', lambda x: conv(x, wd_f.astype(jnp.bfloat16),
                                        groups=C, padding=pad,
                                        pet=jnp.float32), x_b)
    record('dw3x3_i8', lambda x: conv(x, wd_i, groups=C, padding=pad,
                                      pet=jnp.int32), x_i)

    # 3) conv + relu6-clip + requant epilogue (engine op sequence)
    hi = rng.randint(1000, 20000, (C,)).astype(np.int32)

    def rq(acc, out_dtype):
        out = jnp.floor(acc.astype(jnp.float32) * mult + 0.5)
        return jnp.clip(out, -128, 127).astype(out_dtype)

    record('conv1x1_f32_rq_f32',
           lambda x: rq(jnp.clip(conv(x, w1_f), 0, hi.astype(np.float32)),
                        jnp.float32), x_f)
    record('conv1x1_i8_rq_i8',
           lambda x: rq(jnp.clip(conv(x, w1_i, pet=jnp.int32), 0, hi),
                        jnp.int8), x_i)
    record('dw3x3_i8_rq_i8',
           lambda x: rq(jnp.clip(conv(x, wd_i, groups=C, padding=pad,
                                      pet=jnp.int32), 0, hi), jnp.int8), x_i)

    # 4) full unit chains (requant-in + conv1+rq + dw+rq + conv3 + rq),
    #    one dtype end-to-end
    w3_f = rng.randn(1, 1, C, 16).astype(np.float32)
    w3_i = rng.randint(-127, 128, (1, 1, C, 16)).astype(np.int8)

    def unit_f32(x):
        xa = rq(x, jnp.float32)
        h = rq(jnp.clip(conv(xa, w1_f), 0, hi.astype(np.float32)),
               jnp.float32)
        h = rq(jnp.clip(conv(h, wd_f, groups=C, padding=pad), 0,
                        hi.astype(np.float32)), jnp.float32)
        return rq(conv(h, w3_f), jnp.float32)

    def unit_i8(x):
        xa = rq(x, jnp.int8)
        h = rq(jnp.clip(conv(xa, w1_i, pet=jnp.int32), 0, hi), jnp.int8)
        h = rq(jnp.clip(conv(h, wd_i, groups=C, padding=pad,
                             pet=jnp.int32), 0, hi), jnp.int8)
        return rq(conv(h, w3_i, pet=jnp.int32), jnp.float32)

    record('unit_f32_chain', unit_f32, x_f.astype(jnp.int32)
           .astype(jnp.float32))
    record('unit_i8_chain', unit_i8, x_f)

    # 5) float-model-style unit (BN-as-scale-bias fused, no requants)
    g = rng.rand(C).astype(np.float32)
    b = rng.rand(C).astype(np.float32)

    def unit_float_model(x):
        h = jnp.clip(conv(x, w1_f) * g + b, 0, 6.0)
        h = jnp.clip(conv(h, wd_f, groups=C, padding=pad) * g + b, 0, 6.0)
        return conv(h, w3_f) * g[:16] + b[:16]

    record('unit_float_model', unit_float_model, x_f)

    # 6) the stage-2 shape in both dtypes (56², mid=144, in=24 -> the
    #    f32-mode blowup region)
    B2, H2, Ci, M = 8, 56, 24, 144
    w1b_f = rng.randn(1, 1, Ci, M).astype(np.float32)
    w1b_i = rng.randint(-127, 128, (1, 1, Ci, M)).astype(np.int8)
    x2_f = jnp.asarray(rng.rand(B2, H2, H2, Ci).astype(np.float32))
    x2_i = jnp.asarray(rng.randint(-127, 128, (B2, H2, H2, Ci))
                       .astype(np.int8))
    record('s2_expand_f32', lambda x: conv(x, w1b_f), x2_f)
    record('s2_expand_i8', lambda x: conv(x, w1b_i, pet=jnp.int32), x2_i)

    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == '__main__':
    if '--probe2' not in sys.argv and '--probe3' not in sys.argv:
        main()


def probe2():
    """Round-5 follow-up: per-channel requant constants, carrier dtypes, and
    the init block — the remaining deltas between the isolated chain
    (0.12-0.20 ms) and the same unit in-engine (0.58-0.77 ms)."""
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter

    B, H, C = 8, 112, 32
    rng = np.random.RandomState(0)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'mnv2_stage1_probe.json')
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))

    def record(name, fn, x):
        if name in results:
            print(f'{name}: cached', flush=True)
            return
        t = time_per_iter(fn, x)
        results[name] = round(t * 1e3, 4)
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f'{name}: {t*1e3:.4f} ms', flush=True)

    def conv(x, w, groups=1, strides=(1, 1), padding='VALID', pet=None):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn,
            feature_group_count=groups,
            preferred_element_type=pet or x.dtype if x.dtype != jnp.int8
            else jnp.int32)

    w1_i = rng.randint(-127, 128, (1, 1, C, C)).astype(np.int8)
    wd_i = rng.randint(-127, 128, (3, 3, 1, C)).astype(np.int8)
    w3_i = rng.randint(-127, 128, (1, 1, C, 16)).astype(np.int8)
    x_f = jnp.asarray(rng.rand(B, H, H, C).astype(np.float32))
    hi = rng.randint(1000, 20000, (C,)).astype(np.int32)
    mult_s = np.float32(0.0003)
    mult_c = (0.0003 * (0.5 + rng.rand(C))).astype(np.float32)
    mult_16 = (0.0003 * (0.5 + rng.rand(16))).astype(np.float32)
    pad = ((1, 1), (1, 1))

    def rq(acc, mult, out_dtype):
        out = jnp.floor(acc.astype(jnp.float32) * mult + 0.5)
        return jnp.clip(out, -128, 127).astype(out_dtype)

    # A) the same i8 chain as unit_i8_chain but with PER-CHANNEL requant
    #    multipliers (the engine's actual constants)
    def unit_i8_pc(x):
        xa = rq(x, mult_c, jnp.int8)
        h = rq(jnp.clip(conv(xa, w1_i, pet=jnp.int32), 0, hi), mult_c,
               jnp.int8)
        h = rq(jnp.clip(conv(h, wd_i, groups=C, padding=pad,
                             pet=jnp.int32), 0, hi), mult_c, jnp.int8)
        return rq(conv(h, w3_i, pet=jnp.int32), mult_16, jnp.float32)

    record('unit_i8_chain_perchan', unit_i8_pc, x_f)

    # B) int32 carriers in/out (the engine's residual container default)
    x_i32 = jnp.asarray(rng.randint(-30000, 30000, (B, H, H, C))
                        .astype(np.int32))

    def unit_i8_c32(x):
        xa = rq(x, mult_c, jnp.int8)
        h = rq(jnp.clip(conv(xa, w1_i, pet=jnp.int32), 0, hi), mult_c,
               jnp.int8)
        h = rq(jnp.clip(conv(h, wd_i, groups=C, padding=pad,
                             pet=jnp.int32), 0, hi), mult_c, jnp.int8)
        acc = conv(h, w3_i, pet=jnp.int32)
        out = jnp.floor(acc.astype(jnp.float32) * mult_16 + 0.5)
        return jnp.clip(out, -2 ** 15, 2 ** 15 - 1).astype(jnp.int32)

    record('unit_i8_chain_carrier32', unit_i8_c32, x_i32)

    # C) init block, engine formulation: f32 image -> quantize -> int8
    #    C=3 conv 3x3/s2 -> relu6 -> per-channel requant -> int8
    w0_i = rng.randint(-127, 128, (3, 3, 3, C)).astype(np.int8)
    img = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))

    def init_i8(im):
        x8 = jnp.clip(jnp.floor(im / np.float32(0.01) + 0.5),
                      -128, 127).astype(jnp.int8)
        acc = conv(x8, w0_i, strides=(2, 2), padding=pad, pet=jnp.int32)
        return rq(jnp.clip(acc, 0, hi), mult_c, jnp.int32)

    record('init_i8_quantized_ondevice', init_i8, img)

    def init_f32(im):
        x8 = jnp.clip(jnp.floor(im / np.float32(0.01) + 0.5), -128, 127)
        acc = conv(x8, np.asarray(w0_i, np.float32), strides=(2, 2),
                   padding=pad, pet=jnp.float32)
        return rq(jnp.clip(acc, 0, hi.astype(np.float32)), mult_c,
                  jnp.int32)

    record('init_f32cert', init_f32, img)

    print(json.dumps({k: results[k] for k in sorted(results)}, indent=1))


def probe3():
    """The isolated-vs-in-engine 3x inflation: a minimal two-block program
    (engine-exact init + stage1.unit1 ops) with and without the input
    exact_div optimization_barrier, against the engine's measured 0.905 ms
    cumulative at the same point."""
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.quant import ops as qops

    B, C = 8, 32
    rng = np.random.RandomState(0)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'mnv2_stage1_probe.json')
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}

    def record(name, fn, x):
        if name in results:
            print(f'{name}: cached', flush=True)
            return
        t = time_per_iter(fn, x)
        results[name] = round(t * 1e3, 4)
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f'{name}: {t*1e3:.4f} ms', flush=True)

    def conv(x, w, groups=1, strides=(1, 1), padding='VALID', pet=None):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn,
            feature_group_count=groups, preferred_element_type=pet)

    w0 = rng.randint(-127, 128, (3, 3, 3, C)).astype(np.int8)
    w1 = rng.randint(-127, 128, (1, 1, C, C)).astype(np.int8)
    wd = rng.randint(-127, 128, (3, 3, 1, C)).astype(np.int8)
    w3 = rng.randint(-127, 128, (1, 1, C, 16)).astype(np.int8)
    hi = rng.randint(1000, 20000, (C,)).astype(np.int32)
    mult_c = (0.0003 * (0.5 + rng.rand(C))).astype(np.float32)
    m16 = (0.0003 * (0.5 + rng.rand(16))).astype(np.float32)
    img = jnp.asarray(rng.rand(B, 224, 224, 3).astype(np.float32))
    pad = ((1, 1), (1, 1))

    def rq(acc, mult, out_dtype):
        out = jnp.floor(acc.astype(jnp.float32) * mult + 0.5)
        return jnp.clip(out, -128, 127).astype(out_dtype)

    def two_block(im, quantize):
        x8 = jnp.clip(quantize(im), -128, 127).astype(jnp.int8)
        acc = conv(x8, w0, strides=(2, 2), padding=pad, pet=jnp.int32)
        x = rq(jnp.clip(acc, 0, hi), mult_c, jnp.int32)     # init, carrier32
        xa = rq(x, mult_c, jnp.int8)
        h = rq(jnp.clip(conv(xa, w1, pet=jnp.int32), 0, hi), mult_c,
               jnp.int8)
        h = rq(jnp.clip(conv(h, wd, groups=C, padding=pad,
                             pet=jnp.int32), 0, hi), mult_c, jnp.int8)
        return rq(conv(h, w3, pet=jnp.int32), m16, jnp.int32)

    record('two_block_barrier',
           lambda im: two_block(im, lambda v: qops.round_half_up(
               qops.exact_div(v, np.float32(0.01)))), img)
    record('two_block_plain',
           lambda im: two_block(im, lambda v: jnp.floor(
               v / np.float32(0.01) + 0.5)), img)

    print(json.dumps({k: results[k] for k in sorted(results)
                      if k.startswith('two_block')}, indent=1))


if __name__ == '__main__':
    if '--probe2' in sys.argv:
        probe2()
    elif '--probe3' in sys.argv:
        probe3()

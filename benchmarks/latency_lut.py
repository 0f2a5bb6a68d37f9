"""Measure the per-layer latency LUT that drives the ILP latency mode.

The reference hard-codes T4-measured per-layer int4/int8 latencies
(/root/reference/ILP.ipynb cell 4, latency_int4/latency_int8); here they are
measured on the actual TPU.  Per layer:

  int8 = best of {XLA int8 conv, Pallas int8 conv/matmul kernel}
  int4 = best of {Pallas packed-int4 conv/matmul kernel, the int8 best}
         (int4 weights run fine through the int8 path, so a deployment
          never pays more for int4 than for int8 — the clamp is the
          kernel router's actual behavior, not a reporting fudge)

3×3 convs go through hawq_tpu.kernels.conv (stride 2 via the space-to-depth
rewrite), 1×1 convs through hawq_tpu.kernels.matmul, mirroring exactly what
build_resnet_engine(..., use_pallas=True) can route.

Writes benchmarks/latency_lut_<arch>.json: {layer_key: [lat4_ms, lat8_ms]}.
Consumed by hawq_tpu.sensitivity.ilp.resnet_layer_costs(latency_lut=...).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mobilenetv2_conv_shapes(input_size: int = 224):
    """(key, H_in, stride, kh, kw, cin_per_group, cout, groups) for every
    MobileNetV2 conv — the BOPS/size accounting walker for the family
    sweep (q_mobilenetv2.py:225-263 topology)."""
    from hawq_tpu.models.mobilenetv2 import (MOBILENETV2_STAGES,
                                             MOBILENETV2_INIT_CH,
                                             MOBILENETV2_FINAL_CH)
    out = [('init_block', input_size, 2, 3, 3, 3, MOBILENETV2_INIT_CH, 1)]
    spatial = input_size // 2
    in_ch = MOBILENETV2_INIT_CH
    for i, stage in enumerate(MOBILENETV2_STAGES, start=1):
        for j, out_ch in enumerate(stage, start=1):
            p = f'features.stage{i}.unit{j}'
            stride = 2 if (j == 1 and i != 1) else 1
            mid = in_ch * 6 if (i != 1 or j != 1) else in_ch
            out.append((f'{p}.conv1', spatial, 1, 1, 1, in_ch, mid, 1))
            out.append((f'{p}.conv2', spatial, stride, 3, 3, 1, mid, mid))
            spatial //= stride
            out.append((f'{p}.conv3', spatial, 1, 1, 1, mid, out_ch, 1))
            in_ch = out_ch
    out.append(('features.final_block', spatial, 1, 1, 1, in_ch,
                MOBILENETV2_FINAL_CH, 1))
    out.append(('output', 1, 1, 1, 1, MOBILENETV2_FINAL_CH, 1000, 1))
    return out


def conv_shapes(arch: str, input_size: int = 224, batch: int = 64):
    """(key, H_in, stride, kh, kw, cin, cout) for every stage conv."""
    from hawq_tpu.configs.bit_config import (RESNET_UNITS,
                                             RESNET_CONVS_PER_UNIT)
    from hawq_tpu.models.resnet import _STAGE_CHANNELS, _INIT_FEATURES
    bottleneck = RESNET_CONVS_PER_UNIT[arch] == 3
    mids, outs = _STAGE_CHANNELS[arch]
    conv1_stride = arch == 'resnet50'
    spatial = input_size // 4
    in_ch = _INIT_FEATURES.get(arch, 64)
    out = []
    for s, n_units in enumerate(RESNET_UNITS[arch], start=1):
        if s > 1:
            spatial //= 2
        for u in range(1, n_units + 1):
            p = f'stage{s}.unit{u}'
            stride = 2 if (u == 1 and s > 1) else 1
            out_ch = outs[s - 1]
            h_in = spatial * stride
            if u == 1 and (in_ch != out_ch or stride != 1):
                out.append((f'{p}.quant_identity_convbn', h_in, stride,
                            1, 1, in_ch, out_ch))
            if bottleneck:
                mid = mids[s - 1]
                s1 = stride if conv1_stride else 1
                s2 = 1 if conv1_stride else stride
                out.append((f'{p}.quant_convbn1', h_in, s1, 1, 1, in_ch, mid))
                out.append((f'{p}.quant_convbn2', h_in // s1, s2, 3, 3,
                            mid, mid))
                out.append((f'{p}.quant_convbn3', spatial, 1, 1, 1,
                            mid, out_ch))
            else:
                out.append((f'{p}.quant_convbn1', h_in, stride, 3, 3,
                            in_ch, out_ch))
                out.append((f'{p}.quant_convbn2', spatial, 1, 3, 3,
                            out_ch, out_ch))
            in_ch = out_ch
    return out


def main(arch='resnet50', batch=64):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from bench import time_per_iter
    from hawq_tpu.kernels import matmul as km
    from hawq_tpu.kernels import conv as kc

    rng = np.random.RandomState(0)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            f'latency_lut_{arch}.json')
    lut = {}
    if os.path.exists(out_path):        # resume a partial run
        with open(out_path) as f:
            lut = json.load(f)
    shape_cache = {}   # many layers share shapes — measure each shape once
    for (key, h, stride, kh, kw, cin, cout) in conv_shapes(arch, batch=batch):
        if key in lut:
            shape_cache[(h, stride, kh, kw, cin, cout)] = lut[key]
            continue
        sig = (h, stride, kh, kw, cin, cout)
        if sig in shape_cache:
            lut[key] = shape_cache[sig]
            continue
        x8 = jnp.asarray(rng.randint(-128, 128, (batch, h, h, cin))
                         .astype(np.int8))
        w8 = jnp.asarray(rng.randint(-128, 128, (kh, kw, cin, cout))
                         .astype(np.int8))
        dn = lax.conv_dimension_numbers(x8.shape, w8.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))

        def conv8(x, w=w8, s=stride, dn=dn):
            return lax.conv_general_dilated(
                x, w, (s, s), 'SAME', dimension_numbers=dn,
                preferred_element_type=jnp.int32)

        t8 = time_per_iter(conv8, x8)
        t4 = t8
        aligned = cin % 128 == 0 and cout % 128 == 0
        bias = jnp.asarray(np.zeros(cout, np.int32))
        mult = jnp.asarray(np.full(cout, 1e-4, np.float32))

        if kh == 1 and aligned:
            # 1×1 → fused pallas matmuls (stride-2 1×1s are plain slices)
            xs = x8[:, ::stride, ::stride, :]
            m = xs.shape[0] * xs.shape[1] * xs.shape[2]
            xm = km.pad_to(xs.reshape(m, cin), 256, 1)
            w4 = rng.randint(-8, 8, (cin, cout)).astype(np.int8)
            packed = jnp.asarray(km.pack_int4(w4))
            w2d = jnp.asarray(rng.randint(-128, 128, (cin, cout))
                              .astype(np.int8))

            def mm8(xm, w=w2d, bias=bias, mult=mult):
                return km.int8_matmul_requant(xm, w, bias, mult)

            def mm4(xm, packed=packed, bias=bias, mult=mult):
                return km.int4w_matmul_requant(xm, packed, bias, mult)

            t8 = min(t8, time_per_iter(mm8, xm))
            t4 = min(time_per_iter(mm4, xm), t8)
        elif kh == 3 and aligned:
            # 3×3 → pallas conv kernels (stride 2 via space-to-depth)
            wc = rng.randint(-8, 8, (3, 3, cin, cout)).astype(np.int8)
            if stride == 2:
                w_s2d = kc.s2d_kernel(wc)
                taps = (w_s2d.shape[0], w_s2d.shape[1])
                cin_k = 4 * cin
                oh = kc.s2d_output_hw(h, h, 3, 3, 1)[0]
                wf = kc.flatten_conv_kernel(w_s2d)

                def prep(xi):
                    return kc.prepare_conv_input(kc.s2d_input(xi, 1), (0, 0))
            else:
                taps, cin_k, oh = (3, 3), cin, h
                wf = kc.flatten_conv_kernel(wc)

                def prep(xi):
                    return kc.prepare_conv_input(xi, (1, 1))

            wfj = jnp.asarray(wf)
            wp4 = jnp.asarray(kc.pack_int4_conv(wf, taps[0] * taps[1]))

            def pc8(xi, w=wfj, b=bias, mlt=mult):
                xp = prep(xi)
                return kc.int8_conv_requant(xp, w, b, mlt, taps=taps,
                                            out_hw=(oh, oh), cin=cin_k)

            def pc4(xi, w=wp4, b=bias, mlt=mult):
                xp = prep(xi)
                return kc.int4w_conv_requant(xp, w, b, mlt, taps=taps,
                                             out_hw=(oh, oh), cin=cin_k)

            try:
                t8 = min(t8, time_per_iter(jax.jit(pc8), x8))
                t4 = min(time_per_iter(jax.jit(pc4), x8), t8)
            except Exception as e:      # unroutable shape → int8 path
                print(f'  pallas conv failed for {key}: '
                      f'{type(e).__name__}', flush=True)
                t4 = t8
        lut[key] = [t4 * 1e3, t8 * 1e3]
        shape_cache[sig] = lut[key]
        print(f'{key:45s} int4 {t4*1e6:8.1f}us  int8 {t8*1e6:8.1f}us',
              flush=True)
        with open(out_path, 'w') as f:     # incremental: resumable run
            json.dump(lut, f, indent=1)

    with open(out_path, 'w') as f:
        json.dump(lut, f, indent=1)
    print('wrote', out_path)


if __name__ == '__main__':
    arch = sys.argv[1] if len(sys.argv) > 1 else 'resnet50'
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(arch, batch)

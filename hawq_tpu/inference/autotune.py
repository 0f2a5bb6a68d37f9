"""Per-layer kernel routing autotuner — the AutoTVM-schedule analog.

The reference picks CUDA schedules per conv via AutoTVM sweeps cached in
tuning_logs/*.log (/root/reference/tvm_benchmark/test_resnet_inference_time
.py:189-217).  Here the choice per conv layer (1×1 matmul-shaped via
kernels/matmul.py, 3×3 via kernels/conv.py) is between three backends:

  'xla'      — XLA's native int8 convolution (best at shallow/wide layers)
  'pallas8'  — fused Pallas int8 conv/matmul + requant epilogue
  'pallas4w' — the same streaming nibble-packed int4 weights
               (only for 4-bit layers; wins where weight bytes dominate —
               measured 1.5× over XLA at K=2048 shapes on v5e)

``autotune_routing`` measures each routable layer on the real device and
returns {layer_key: backend}; tables serialize to JSON (the tuning_logs
analog) and feed ``build_resnet_engine(..., routing=table)``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping, Optional

import numpy as np

from hawq_tpu.inference.freeze import FrozenModel


def routable_convs(fm: FrozenModel, batch: int, image_size: int = 224):
    """(key, h_in, stride, kh, cin, cout, weight_bits) for every
    pallas-routable conv (1×1 matmul-shaped or 3×3 conv-kernel-shaped,
    both requiring 128-lane-aligned channels — the same predicate as
    engine.pallas_routable)."""
    from benchmarks.latency_lut import conv_shapes
    out = []
    for (key, h, stride, kh, kw, cin, cout) in conv_shapes(
            fm.arch, input_size=image_size, batch=batch):
        if kh in (1, 3) and cin % 128 == 0 and cout % 128 == 0 and \
                key + '.weight_int' in fm.tensors:
            out.append((key, h, stride, kh, cin, cout,
                        fm.cfg.weight_bits(key)))
    return out


def autotune_routing(fm: FrozenModel, batch: int = 64,
                     image_size: int = 224,
                     verbose: bool = True,
                     checkpoint_path: Optional[str] = None) -> Dict[str, str]:
    """Measure each routable layer with each candidate backend on the
    current default device; return the fastest choice per layer.

    With ``checkpoint_path``, the table is written after every layer and a
    pre-existing file resumes the sweep (remote-compile sweeps can exceed
    one run's time budget)."""
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.kernels import matmul as km
    from hawq_tpu.kernels import conv as kc

    rng = np.random.RandomState(0)
    table: Dict[str, str] = {}
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        table = load_routing(checkpoint_path)
    for key, h, stride, kh, cin, cout, bits in routable_convs(
            fm, batch, image_size):
        if key in table:
            continue
        bias = np.asarray(fm[key + '.bias_int'])
        mult = np.full(cout, 1e-4, np.float32)
        bj, mj = jnp.asarray(bias), jnp.asarray(mult)

        if kh == 1:
            h_out = h // stride
            m = batch * h_out * h_out
            x = jnp.asarray(rng.randint(-128, 128, (m, cin))
                            .astype(np.int8))
            w2d = np.asarray(fm[key + '.weight_int']).reshape(cin, cout)
            xp = km.pad_to(x, 256, 1)

            def xla_fn(x, w=jnp.asarray(w2d), b=bias, mlt=mult):
                acc = jax.lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) + b
                out = jnp.floor(acc.astype(jnp.float32) * mlt + 0.5)
                return jnp.clip(out, -128, 127).astype(jnp.int8)

            candidates = {
                'xla': (jax.jit(xla_fn), x),
                'pallas8': (lambda xp, w=jnp.asarray(w2d), b=bj, mlt=mj:
                            km.int8_matmul_requant(xp, w, b, mlt), xp)}
            if bits == 4:
                packed = jnp.asarray(km.pack_int4(w2d))
                candidates['pallas4w'] = (
                    lambda xp, w=packed, b=bj, mlt=mj:
                    km.int4w_matmul_requant(xp, w, b, mlt), xp)
        else:
            # 3×3 conv: XLA conv vs the pallas conv kernels (stride 2 via
            # the space-to-depth rewrite — identical integer products)
            x4 = jnp.asarray(rng.randint(-128, 128, (batch, h, h, cin))
                             .astype(np.int8))
            w = np.asarray(fm[key + '.weight_int'])
            dn = jax.lax.conv_dimension_numbers(
                x4.shape, w.shape, ('NHWC', 'HWIO', 'NHWC'))

            def xla_fn(xi, w=jnp.asarray(w), b=bias, mlt=mult, s=stride,
                       dn=dn):
                acc = jax.lax.conv_general_dilated(
                    xi, w, (s, s), 'SAME', dimension_numbers=dn,
                    preferred_element_type=jnp.int32) + b
                out = jnp.floor(acc.astype(jnp.float32) * mlt + 0.5)
                return jnp.clip(out, -128, 127).astype(jnp.int8)

            if stride == 2:
                wk = kc.s2d_kernel(w)
                cin_k = 4 * cin
                oh = kc.s2d_output_hw(h, h, 3, 3, 1)[0]

                def prep(xi):
                    return kc.prepare_conv_input(kc.s2d_input(xi, 1),
                                                 (0, 0))
            else:
                wk, cin_k, oh = w, cin, h

                def prep(xi):
                    return kc.prepare_conv_input(xi, (1, 1))

            taps = (wk.shape[0], wk.shape[1])
            wf = kc.flatten_conv_kernel(wk)

            def pc8(xi, w=jnp.asarray(wf), b=bj, mlt=mj, taps=taps,
                    oh=oh, cin_k=cin_k, prep=prep):
                return kc.int8_conv_requant(prep(xi), w, b, mlt, taps=taps,
                                            out_hw=(oh, oh), cin=cin_k)

            candidates = {'xla': (jax.jit(xla_fn), x4),
                          'pallas8': (jax.jit(pc8), x4)}
            if bits == 4:
                wp4 = jnp.asarray(kc.pack_int4_conv(wf, taps[0] * taps[1]))

                def pc4(xi, w=wp4, b=bj, mlt=mj, taps=taps, oh=oh,
                        cin_k=cin_k, prep=prep):
                    return kc.int4w_conv_requant(prep(xi), w, b, mlt,
                                                 taps=taps, out_hw=(oh, oh),
                                                 cin=cin_k)

                candidates['pallas4w'] = (jax.jit(pc4), x4)

        times = {}
        for name, (fn, arg) in candidates.items():
            try:
                times[name] = time_per_iter(fn, arg)
            except Exception:
                times[name] = float('inf')
        best = min(times, key=times.get)
        table[key] = best
        if checkpoint_path is not None:
            save_routing(checkpoint_path, table)
        if verbose:
            desc = '  '.join(f'{n} {t*1e6:7.1f}us' for n, t in times.items())
            print(f'{key:45s} -> {best:8s} [{desc}]', flush=True)
    return table


def autotune_routing_1x1(sites, weight_bits, batch: int = 8,
                         verbose: bool = True,
                         checkpoint_path: Optional[str] = None
                         ) -> Dict[str, str]:
    """Routing sweep over 1×1-conv site tables (MobileNetV2 / InceptionV3).

    ``sites`` is (key, spatial, cin, cout, epilogue) from
    inference/routing.py's enumerators; ``weight_bits`` maps key → bits.
    Unlike ``autotune_routing`` (resnet: 128-aligned channels, direct
    kernels), each candidate here is timed through the exact
    ``Routed1x1`` wrapper the engine will call — including the M/K/N
    zero-padding — so the table reflects end-to-end per-site cost.
    epilogue 'requant' times the fully fused kernel; 'acc' times the raw
    accumulator kernel (the engine keeps its XLA epilogue either way)."""
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.inference.routing import Routed1x1

    rng = np.random.RandomState(0)
    table: Dict[str, str] = {}
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        table = load_routing(checkpoint_path)
    for key, spatial, cin, cout, epi in sites:
        if key in table:
            continue
        bits = weight_bits(key)
        qmax = 2 ** (bits - 1) - 1
        w = rng.randint(-qmax - 1, qmax + 1, (1, 1, cin, cout)
                        ).astype(np.int8)
        bias = rng.randint(-2 ** 15, 2 ** 15, (cout,)).astype(np.int32)
        mult = np.full(cout, 1e-4, np.float32)
        x = jnp.asarray(rng.randint(-128, 128, (batch, spatial, spatial,
                                                cin)).astype(np.int8))

        def xla_fn(xi, wj=jnp.asarray(w), b=jnp.asarray(bias),
                   mlt=jnp.asarray(mult), epi=epi):
            dn = jax.lax.conv_dimension_numbers(
                xi.shape, wj.shape, ('NHWC', 'HWIO', 'NHWC'))
            acc = jax.lax.conv_general_dilated(
                xi, wj, (1, 1), 'VALID', dimension_numbers=dn,
                preferred_element_type=jnp.int32) + b
            if epi == 'acc':
                return acc
            out = jnp.floor(jnp.maximum(acc, 0).astype(jnp.float32)
                            * mlt + 0.5)
            return jnp.clip(out, -128, 127).astype(jnp.int8)

        candidates = {'xla': jax.jit(xla_fn)}

        def routed_fn(r):
            if epi == 'acc':
                return jax.jit(lambda xi, r=r: r.acc(xi))
            return jax.jit(lambda xi, r=r: r.requant(
                xi, mult, out_bits=8, signed=True, relu=True))

        candidates['pallas8'] = routed_fn(Routed1x1(w, bias, int4=False))
        if bits == 4:
            candidates['pallas4w'] = routed_fn(Routed1x1(w, bias, int4=True))

        times = {}
        for name, fn in candidates.items():
            try:
                times[name] = time_per_iter(fn, x)
            except Exception:
                times[name] = float('inf')
        best = min(times, key=times.get)
        table[key] = best
        if checkpoint_path is not None:
            save_routing(checkpoint_path, table)
        if verbose:
            desc = '  '.join(f'{n} {t*1e6:7.1f}us' for n, t in times.items())
            print(f'{key:45s} -> {best:8s} [{desc}]', flush=True)
    return table


def save_routing(path: str, table: Mapping[str, str]) -> None:
    with open(path, 'w') as f:
        json.dump(dict(table), f, indent=1, sort_keys=True)


def load_routing(path: str) -> Dict[str, str]:
    with open(path) as f:
        return json.load(f)


def main():
    """Regenerate a routing table on the current device.

    Run from the repo root (one TPU process at a time):
        timeout 590 python -m hawq_tpu.inference.autotune \
            --arch resnet50 --scheme uniform4 --batch 8
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', default='resnet50')
    ap.add_argument('--scheme', default='uniform4')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    from hawq_tpu.configs.bit_config import get_bit_config

    cfg = get_bit_config(args.arch, args.scheme)
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), 'benchmarks',
        f'routing_{args.arch}_{args.scheme}_b{args.batch}.json')
    if args.arch in ('mobilenetv2', 'inceptionv3'):
        from hawq_tpu.inference import routing as rt
        if args.arch == 'mobilenetv2':
            sites = rt.mobilenet_conv1x1_sites()
        else:
            sites = rt.inception_conv1x1_sites(cfg)
        table = autotune_routing_1x1(sites, cfg.weight_bits,
                                     batch=args.batch, checkpoint_path=out)
    else:
        from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
        fm = synthetic_frozen_resnet(args.arch, cfg)
        table = autotune_routing(fm, batch=args.batch, checkpoint_path=out)
    save_routing(out, table)
    print('wrote', out)


if __name__ == '__main__':
    main()

"""Per-layer kernel routing autotuner — the AutoTVM-schedule analog.

The reference picks CUDA schedules per conv via AutoTVM sweeps cached in
tuning_logs/*.log (/root/reference/tvm_benchmark/test_resnet_inference_time
.py:189-217).  Here the choice per 1×1 conv layer is between three backends:

  'xla'      — XLA's native int8 convolution (best at shallow/wide layers)
  'pallas8'  — fused Pallas int8 matmul + requant epilogue
  'pallas4w' — fused Pallas matmul streaming nibble-packed int4 weights
               (only for 4-bit layers; wins where weight bytes dominate —
               measured 1.5× over XLA at K=2048 shapes on v5e)

``autotune_routing`` measures each routable layer on the real device and
returns {layer_key: backend}; tables serialize to JSON (the tuning_logs
analog) and feed ``build_resnet_engine(..., routing=table)``.
"""

from __future__ import annotations

import json
from typing import Dict, Mapping, Optional

import numpy as np

from hawq_tpu.inference.freeze import FrozenModel


def routable_convs(fm: FrozenModel, batch: int, image_size: int = 224):
    """(key, M, cin, cout, weight_bits) for every pallas-routable 1×1 conv."""
    from benchmarks.latency_lut import conv_shapes
    out = []
    for (key, h, stride, kh, kw, cin, cout) in conv_shapes(
            fm.arch, input_size=image_size, batch=batch):
        if kh == 1 and kw == 1 and cin % 128 == 0 and cout % 128 == 0 and \
                key + '.weight_int' in fm.tensors:
            h_out = h // stride
            out.append((key, batch * h_out * h_out, cin, cout,
                        fm.cfg.weight_bits(key)))
    return out


def autotune_routing(fm: FrozenModel, batch: int = 64,
                     image_size: int = 224,
                     verbose: bool = True) -> Dict[str, str]:
    """Measure each routable layer with each candidate backend on the
    current default device; return the fastest choice per layer."""
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.kernels import matmul as km

    rng = np.random.RandomState(0)
    table: Dict[str, str] = {}
    for key, m, cin, cout, bits in routable_convs(fm, batch, image_size):
        x = jnp.asarray(rng.randint(-128, 128, (m, cin)).astype(np.int8))
        w2d = np.asarray(fm[key + '.weight_int']).reshape(cin, cout)
        bias = np.asarray(fm[key + '.bias_int'])
        mult = np.full(cout, 1e-4, np.float32)
        xp = km.pad_to(x, 256, 1)

        def xla_fn(x, w=jnp.asarray(w2d), b=bias, mlt=mult):
            acc = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32) + b
            out = jnp.floor(acc.astype(jnp.float32) * mlt + 0.5)
            return jnp.clip(out, -128, 127).astype(jnp.int8)

        candidates = {'xla': (jax.jit(xla_fn), x),
                      'pallas8': (lambda xp, w=jnp.asarray(w2d),
                                  b=jnp.asarray(bias), mlt=jnp.asarray(mult):
                                  km.int8_matmul_requant(xp, w, b, mlt), xp)}
        if bits == 4:
            packed = jnp.asarray(km.pack_int4(w2d))
            candidates['pallas4w'] = (
                lambda xp, w=packed, b=jnp.asarray(bias),
                mlt=jnp.asarray(mult):
                km.int4w_matmul_requant(xp, w, b, mlt), xp)

        times = {}
        for name, (fn, arg) in candidates.items():
            try:
                times[name] = time_per_iter(fn, arg)
            except Exception:
                times[name] = float('inf')
        best = min(times, key=times.get)
        table[key] = best
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

"""Full mixed-precision config sweep — the run_resnet_inference_time.sh analog.

Builds the integer engine for every published scheme of an arch
(uniform8/4 + the {modelsize,bops,latency} × {0.25,0.5,0.75} ILP grids,
/root/reference/run_resnet_inference_time.sh:1-40 sweeps the same 18 mixed
configs), with synthetic weights (the reference's create_workload analog),
and records into ONE json per arch/batch:

  - measured latency (in-jit loop-chained, bench.time_per_iter)
  - deployed model size with true bit-packing (inference.freeze)
  - BOPS at the config's bit assignment
  - logits_match_baseline: the production build (int16 residual + s2d init)
    is bit-compared against the plain XLA-int32 reference build

Run (TPU, one process at a time):
    timeout 590 python -u benchmarks/config_sweep.py --arch resnet50 --batch 8
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMES = (['uniform8', 'uniform4'] +
           [f'{m}_{f}' for m in ('modelsize', 'bops', 'latency')
            for f in (0.25, 0.5, 0.75)])
# the reference publishes 4 mobilenetv2_w1 configs (bit_config.py:3330-4053)
MNV2_SCHEMES = ['uniform8', 'uniform4', 'bops_0.5', 'modelsize_0.5']


def config_bops(arch: str, cfg, input_size: int = 224) -> float:
    """BOPS = Σ macs·w_bits·a_bits over the conv/fc layers (README.md:41-57
    accounting: activations follow the consuming conv's weight bits)."""
    from benchmarks.latency_lut import conv_shapes, mobilenetv2_conv_shapes
    total = 0.0
    if arch == 'mobilenetv2':
        for (key, h, stride, kh, kw, cin_g, cout, groups) in \
                mobilenetv2_conv_shapes(input_size):
            out_sp = max(h // stride, 1)
            macs = kh * kw * cin_g * cout * out_sp * out_sp
            wb = cfg.weight_bits(key)
            total += macs * wb * wb
        return total
    for (key, h, stride, kh, kw, cin, cout) in conv_shapes(
            arch, input_size=input_size, batch=1):
        out_sp = h // stride
        macs = kh * kw * cin * cout * out_sp * out_sp
        wb = cfg.weight_bits(key)
        total += macs * wb * wb
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', default='resnet50')
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--schemes', default=None,
                    help='comma list; default = all 11')
    ap.add_argument('--input-mode', default='folded_float32',
                    choices=['float32', 'folded_float32'],
                    help='production default folds 4x4 pixel blocks on the '
                         'host (inference/fold.py) — the headline input '
                         'path; float32 reproduces the round-2 sweep')
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.engine import build_resnet_engine
    from hawq_tpu.inference.freeze import model_size_bytes
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet

    mnv2 = args.arch == 'mobilenetv2'
    schemes = (args.schemes.split(',') if args.schemes
               else MNV2_SCHEMES if mnv2 else SCHEMES)
    rng = np.random.RandomState(0)
    raw = rng.rand(args.batch, 224, 224, 3).astype(np.float32)
    x = jnp.asarray(raw)
    folded = args.input_mode == 'folded_float32' and not mnv2
    if folded:
        from hawq_tpu.inference.fold import fold4_images
        x_prod = jnp.asarray(fold4_images(raw))
    else:
        x_prod = x

    suffix = '_folded' if folded else ''
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f'config_sweep_{args.arch}_b{args.batch}{suffix}.json')
    results = {}
    if os.path.exists(out_path):        # resumable across TPU sessions
        results = json.load(open(out_path))

    for scheme in schemes:
        if scheme in results:
            print(f'{scheme}: cached')
            continue
        cfg = get_bit_config(args.arch, scheme)
        if mnv2:
            from hawq_tpu.inference.synthetic import \
                synthetic_frozen_mobilenet
            from hawq_tpu.inference.engine_mobilenet import \
                build_mobilenetv2_engine
            from hawq_tpu.models.mobilenetv2 import MOBILENETV2_STAGES
            fm = synthetic_frozen_mobilenet(cfg)
            baseline = build_mobilenetv2_engine(fm, MOBILENETV2_STAGES)
            # production mnv2 build (raw NHWC input; the 3×3/s2 fold
            # measured negative for this family)
            prod = build_mobilenetv2_engine(fm, MOBILENETV2_STAGES,
                                            residual_dtype=jnp.int16)
        else:
            fm = synthetic_frozen_resnet(args.arch, cfg)
            baseline = build_resnet_engine(fm)                  # plain XLA
            # production config per benchmarks/engine_variants.py on v5e:
            # int16 residual carry, XLA convs, host-folded input (the
            # headline path — docs/perf_tpu.md), no s2d init (slower)
            prod = build_resnet_engine(
                fm, residual_dtype=jnp.int16,
                input_mode='folded_float32' if folded else 'float32')
        a = np.asarray(baseline(x))
        b = np.asarray(prod(x_prod))
        match = bool(np.array_equal(a, b))
        t = time_per_iter(prod, x_prod)
        entry = {
            'latency_ms': t * 1e3,
            'images_per_s': args.batch / t,
            'model_size_mb': model_size_bytes(fm) / 1e6,
            'bops_g': config_bops(args.arch, cfg) / 1e9,
            'logits_match_baseline': match,
        }
        results[scheme] = entry
        print(f'{scheme}: {entry}', flush=True)
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
    print('wrote', out_path)


if __name__ == '__main__':
    main()

"""MobileNetV2 engine-variant A/B: close the integer-vs-float gap (round 5).

Measures every exactness-preserving engine configuration end-to-end at the
given batch and verifies each produces bit-identical logits to the plain
int8 build.  Variants target the measured hot spots (benchmarks/
mnv2_stage1_probe.json + per-stage profile): the int8 grouped-conv
(depthwise) lowering and the dtype-retiling boundaries at 112².

Run (TPU, one process at a time):
    timeout 590 python -u benchmarks/mnv2_variants.py --batch 8

Writes benchmarks/mnv2_variants_b{N}.json (resumable across sessions).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_mobilenet
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    from hawq_tpu.models.mobilenetv2 import MOBILENETV2_STAGES

    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--scheme', default='uniform8')
    args = ap.parse_args()
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f'mnv2_variants_b{args.batch}.json')
    results = {}
    if os.path.exists(out_path):
        results = json.load(open(out_path))

    cfg = get_bit_config('mobilenetv2', args.scheme)
    fm = synthetic_frozen_mobilenet(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, 224, 224, 3).astype(np.float32))

    base = build_mobilenetv2_engine(fm, MOBILENETV2_STAGES)
    ref_logits = np.asarray(base(x))

    VARIANTS = {
        'int8': {},
        'int8_res16': dict(residual_dtype=jnp.int16),
        # dw_mode='bf16' is TPU-blocked since the b8 run found bf16
        # grouped convs accumulate in bf16 there (engine guard); its b8
        # rows remain in the artifact as the measurement record.
        'int8_dw_shifted': dict(dw_mode='shifted'),
        'int8_res16_dw_shifted': dict(residual_dtype=jnp.int16,
                                      dw_mode='shifted'),
        'f32': dict(conv_mode='f32'),
        'bf16_res16': dict(conv_mode='bf16', residual_dtype=jnp.int16),
        'bf16_res32': dict(conv_mode='bf16'),
        # round-5 late add: init conv only through the certified bf16
        # route (the resnet engine's headline lever — skips the C=3 int8
        # lane-pad materialization), rest of the graph per conv_mode
        'int8_initbf16': dict(init_mode='bf16cert'),
        'int8_res16_initbf16': dict(init_mode='bf16cert',
                                    residual_dtype=jnp.int16),
    }
    for name, kw in VARIANTS.items():
        key = f'{args.scheme}_{name}'
        if key in results:
            print(f'{key}: cached', flush=True)
            continue
        eng = build_mobilenetv2_engine(fm, MOBILENETV2_STAGES, **kw)
        logits = np.asarray(eng(x))
        exact = bool(np.array_equal(logits, ref_logits))
        t = time_per_iter(eng, x)
        results[key] = {'ms_per_batch': round(t * 1e3, 3),
                        'images_per_sec': round(args.batch / t, 1),
                        'bit_exact_vs_int8': exact}
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f'{key}: {results[key]}', flush=True)

    print(json.dumps(results, indent=1, sort_keys=True))
    print('wrote', out_path)


if __name__ == '__main__':
    main()

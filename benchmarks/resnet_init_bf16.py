"""ResNet init-conv bf16 section A/B on the real TPU.

The b≥32 production route quantizes the raw C=3-minor image on device and
pays the int8 lane-pad materialization floor (docs/perf_tpu.md round-2
notes; the host fold dodges it at b≤16 but loses at b64).
``init_mode='bf16cert'`` runs only the init conv through the certified
bf16 route — no int8 materialization of the C=3 input, half the conv's
operand traffic — leaving the rest of the graph on the production int8
path.  This measures it against the production configs at both batches.

Run (TPU): timeout 590 python -u benchmarks/resnet_init_bf16.py --batch 64
Writes benchmarks/resnet_init_bf16.json (resumable).
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
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    from hawq_tpu.inference.engine import build_resnet_engine
    from hawq_tpu.inference.fold import fold4_images

    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--scheme', default='uniform8')
    args = ap.parse_args()
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'resnet_init_bf16.json')
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}

    from hawq_tpu.inference.engine import IMAGENET_MEAN, IMAGENET_STD
    cfg = get_bit_config('resnet50', args.scheme)
    fm = synthetic_frozen_resnet('resnet50', cfg)
    rng = np.random.RandomState(0)
    xu = rng.randint(0, 256, (args.batch, 224, 224, 3)).astype(np.uint8)
    # host preprocessing in the engine's exact f32 op order (engine.py
    # uint8 notes: IEEE div/sub are deterministic → paths bit-identical)
    x = ((xu.astype(np.float32) / np.float32(255.0) - IMAGENET_MEAN)
         / IMAGENET_STD).astype(np.float32)
    xf = jnp.asarray(fold4_images(x))
    xj, xuj = jnp.asarray(x), jnp.asarray(xu)

    base = build_resnet_engine(fm, residual_dtype=jnp.int16)
    ref = np.asarray(base(xj))

    variants = {
        # b>=32 production: uint8-direct input
        'uint8': (dict(residual_dtype=jnp.int16, input_mode='uint8'), xuj),
        'uint8_initbf16': (dict(residual_dtype=jnp.int16,
                                input_mode='uint8',
                                init_mode='bf16cert'), xuj),
        # raw f32 input (the auto route's b>=32 pick)
        'f32': (dict(residual_dtype=jnp.int16), xj),
        'f32_initbf16': (dict(residual_dtype=jnp.int16,
                              init_mode='bf16cert'), xj),
        # b<=16 production: host-folded input
        'folded': (dict(residual_dtype=jnp.int16,
                        input_mode='folded_float32'), xf),
        'folded_initbf16': (dict(residual_dtype=jnp.int16,
                                 input_mode='folded_float32',
                                 init_mode='bf16cert'), xf),
    }
    for name, (kw, xin) in variants.items():
        key = f'{args.scheme}_b{args.batch}_{name}'
        if key in results:
            print(f'{key}: cached', flush=True)
            continue
        eng = build_resnet_engine(fm, **kw)
        exact = bool(np.array_equal(np.asarray(eng(xin)), ref))
        t = time_per_iter(eng, xin)
        results[key] = {'ms_per_batch': round(t * 1e3, 3),
                        'images_per_sec': round(args.batch / t, 1),
                        'bit_exact': exact}
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f'{key}: {results[key]}', flush=True)
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == '__main__':
    main()

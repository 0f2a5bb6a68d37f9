"""InceptionV3 int16 wide-container A/B (round 5).

The engine's largest tensors are the 16-bit activation nodes (45 of the
q_activ nodes + every unit's q_rescaling_activ carrier).  ``wide_dtype=
jnp.int16`` halves their HBM traffic bit-exactly (all published >8-bit
nodes are symmetric, so values fit ±32767) — the inception analog of the
resnet engine's residual_dtype=int16 production choice.

Run (TPU): timeout 590 python -u benchmarks/inception_wide16.py --batch 64
Writes benchmarks/inception_wide16.json (resumable).
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
    from hawq_tpu.inference.synthetic import synthetic_frozen_inception
    from hawq_tpu.inference.engine_inception import build_inceptionv3_engine
    from hawq_tpu.inference import fold

    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--scheme', default='uniform8')
    args = ap.parse_args()
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'inception_wide16.json')
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}

    cfg = get_bit_config('inceptionv3', args.scheme)
    fm = synthetic_frozen_inception(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, 299, 299, 3).astype(np.float32))
    xf = jnp.asarray(fold.fold4_images_3x3s2(np.asarray(x), 0))

    base = build_inceptionv3_engine(fm)
    ref = np.asarray(base(x))

    variants = {
        'int8_w32': (dict(), x),
        'int8_w16': (dict(wide_dtype=jnp.int16), x),
        'folded_w16': (dict(wide_dtype=jnp.int16,
                            input_mode='folded_float32'), xf),
        # sectioned certified-f32 init (the b64 top line, 40% of runtime)
        'initf32_w32': (dict(init_mode='f32cert'), x),
        'initf32_w16': (dict(init_mode='f32cert',
                             wide_dtype=jnp.int16), x),
        'folded_initf32_w16': (dict(init_mode='f32cert',
                                    wide_dtype=jnp.int16,
                                    input_mode='folded_float32'), xf),
        # certified bf16 containers (round 5): half the f32 route's operand
        # traffic on the ≤8-bit nodes; >8-bit nodes stay wide-int
        'bf16_w32': (dict(conv_mode='bf16'), x),
        'bf16_w16': (dict(conv_mode='bf16', wide_dtype=jnp.int16), x),
        'folded_bf16_w16': (dict(conv_mode='bf16', wide_dtype=jnp.int16,
                                 input_mode='folded_float32'), xf),
        'folded_bf16_w32': (dict(conv_mode='bf16',
                                 input_mode='folded_float32'), xf),
        # the f32-route baseline at this batch, for the bf16 A/B
        'f32_route': (dict(conv_mode='f32'), x),
        'folded_f32_route': (dict(conv_mode='f32',
                                  input_mode='folded_float32'), xf),
        # sectioned bf16 init (init block in bf16 containers, int8 stages)
        'initbf16_w16': (dict(init_mode='bf16cert',
                              wide_dtype=jnp.int16), x),
        'folded_initbf16_w16': (dict(init_mode='bf16cert',
                                     wide_dtype=jnp.int16,
                                     input_mode='folded_float32'), xf),
    }
    for name, (kw, xin) in variants.items():
        key = f'{args.scheme}_b{args.batch}_{name}'
        if key in results:
            print(f'{key}: cached', flush=True)
            continue
        eng = build_inceptionv3_engine(fm, **kw)
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

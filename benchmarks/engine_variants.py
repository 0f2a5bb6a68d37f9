"""Compare engine build variants on the real TPU: XLA vs Pallas routing,
int32 vs int16 residual carry, W8A8 vs W4A4 — and verify variants agree.

The perf-tuning harness for the engine (the analog of the reference's
AutoTVM schedule sweeps, test_resnet_inference_time.py + tuning_logs/).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    from hawq_tpu.inference.engine import build_resnet_engine

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=64)
    args = ap.parse_args()

    B = args.batch
    x = jnp.asarray(np.random.RandomState(0).rand(B, 224, 224, 3)
                    .astype(np.float32))

    for scheme in ('uniform8', 'uniform4'):
        cfg = get_bit_config('resnet50', scheme)
        fm = synthetic_frozen_resnet('resnet50', cfg)
        variants = {
            'xla_int32res': dict(),
            'xla_int16res': dict(residual_dtype=jnp.int16),
            'xla_i16_s2d': dict(residual_dtype=jnp.int16, s2d_init=True),
            'pallas_int32res': dict(use_pallas=True),
            'pallas_int16res': dict(use_pallas=True,
                                    residual_dtype=jnp.int16),
        }
        base_logits = None
        for name, kw in variants.items():
            try:
                eng = build_resnet_engine(fm, **kw)
                logits = np.asarray(eng(x))
                if base_logits is None:
                    base_logits = logits
                    agree = 'ref'
                else:
                    n_bad = int(np.sum(
                        logits.argmax(-1) != base_logits.argmax(-1)))
                    agree = f'argmax diff {n_bad}/{B}'
                t = time_per_iter(eng, x)
                print(f'{scheme:9s} {name:16s} {t*1e3:7.3f} ms/batch '
                      f'({B/t:8.0f} img/s)  [{agree}]', flush=True)
            except Exception as e:
                print(f'{scheme:9s} {name:16s} ERROR {type(e).__name__}: '
                      f'{str(e)[:200]}', flush=True)


if __name__ == '__main__':
    main()

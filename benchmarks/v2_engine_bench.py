"""Pre-activation (v2) resnet engine latency on TPU.

The reference ships its v2 graph only as a synthetic-weight latency
workload (tvm_benchmark/mixed_precision_models/quantized_resnet_v2.py via
create_workload, init.py:143-180) — this measures the TPU engine on the
same terms, alongside the v1 engine of the same depth so the
pre-activation reordering's cost is visible (v2 has no published float
baseline of its own; the v1 rows share weights-shape/FLOPs).

Run (TPU): timeout 590 python -u benchmarks/v2_engine_bench.py --batch 8
Writes benchmarks/v2_engine_bench.json (resumable).
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
    from hawq_tpu.inference.synthetic import (synthetic_frozen_resnet,
                                              synthetic_frozen_resnet_v2)
    from hawq_tpu.inference.engine import build_resnet_engine
    from hawq_tpu.inference.engine_v2 import build_resnet_v2_engine
    from hawq_tpu.inference.freeze import model_size_bytes

    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--arch', default='resnet50')
    args = ap.parse_args()
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'v2_engine_bench.json')
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, 224, 224, 3).astype(np.float32))

    def record(name, fn, fm):
        if name in results:
            print(f'{name}: cached', flush=True)
            return
        t = time_per_iter(fn, x)
        results[name] = {
            'ms_per_batch': round(t * 1e3, 3),
            'images_per_sec': round(args.batch / t, 1),
            'deployed_mb': round(model_size_bytes(fm) / 2 ** 20, 2),
        }
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f'{name}: {results[name]}', flush=True)

    for scheme in ('uniform8', 'uniform4'):
        cfg2 = get_bit_config(f'{args.arch}v2', scheme)
        fm2 = synthetic_frozen_resnet_v2(f'{args.arch}v2', cfg2)
        record(f'{args.arch}v2_{scheme}_b{args.batch}',
               build_resnet_v2_engine(fm2), fm2)
        cfg1 = get_bit_config(args.arch, scheme)
        fm1 = synthetic_frozen_resnet(args.arch, cfg1)
        record(f'{args.arch}_{scheme}_b{args.batch}',
               build_resnet_engine(fm1), fm1)
    print(json.dumps(results, indent=1, sort_keys=True))


if __name__ == '__main__':
    main()

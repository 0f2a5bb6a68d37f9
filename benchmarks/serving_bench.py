"""Serving throughput + scaling benchmark.

Reports images/sec for the integer ResNet50 engine at:
  * 1 device (direct jit)
  * all visible devices (mesh-sharded batch via ServingEngine)
  * the dynamic batcher path (request-level continuous batching)

On the single-chip build box the mesh rows exercise the virtual CPU mesh
(functional check); on a real slice the same script reports the
scaling curve (the ≥90% linear-scaling target of BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_requests: int = 256, out: str = None):
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    from hawq_tpu.inference.engine import build_resnet_engine
    from hawq_tpu.parallel.serving import ServingEngine

    cfg = get_bit_config('resnet50', 'uniform8')
    fm = synthetic_frozen_resnet('resnet50', cfg)
    # uint8 serving input: 4x less host->device traffic, normalization
    # folded into the on-device input quantization
    engine = build_resnet_engine(fm, residual_dtype=jnp.int16,
                                 input_mode='uint8')
    batch = 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (batch, 224, 224, 3), dtype=np.uint8))

    results = {}

    # 1 device, direct
    t = time_per_iter(engine, x)
    results['one_device_img_per_sec'] = batch / t
    print(f'1-device direct     : {batch/t:10.0f} img/s', flush=True)

    # all devices, sharded
    n_dev = len(jax.devices())
    if n_dev > 1:
        serving = ServingEngine(engine, batch_size=batch * n_dev,
                                image_dtype=np.uint8)
        tput = serving.throughput()
        results['mesh_devices'] = n_dev
        results['mesh_img_per_sec'] = tput
        results['scaling_efficiency'] = tput / (
            results['one_device_img_per_sec'] * n_dev)
        print(f'{n_dev}-device sharded  : {tput:10.0f} img/s '
              f'(efficiency {results["scaling_efficiency"]:.2f})', flush=True)

    # dynamic batcher (request-level, includes host overhead), swept over
    # pipeline depth — depth>1 throughput exceeding depth=1 is the direct
    # evidence that logit fetch overlaps the next batch's compute
    serving1 = ServingEngine(engine, n_devices=1, batch_size=batch,
                             image_dtype=np.uint8)
    images = rng.randint(0, 256, (n_requests, 224, 224, 3), dtype=np.uint8)
    for depth in (1, 2, 4):
        batcher = serving1.batcher(max_delay_ms=10, depth=depth)
        try:
            # warm up: compile the sharded engine + fill the pipeline once
            for s in [batcher.submit(images[i]) for i in range(batch)]:
                s.get(timeout=300)
            t0 = time.perf_counter()
            slots = [batcher.submit(images[i]) for i in range(n_requests)]
            for s in slots:
                s.get(timeout=300)
            dt = time.perf_counter() - t0
            results[f'batcher_depth{depth}_img_per_sec'] = n_requests / dt
            print(f'dynamic batcher d={depth} : {n_requests/dt:10.0f} img/s '
                  f'({n_requests} requests)', flush=True)
        finally:
            batcher.close()
    results['overlap_gain'] = (results['batcher_depth4_img_per_sec']
                               / results['batcher_depth1_img_per_sec'])

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))
    if out:
        with open(out, 'w') as f:
            json.dump({k: round(v, 2) for k, v in results.items()}, f,
                      indent=1)


if __name__ == '__main__':
    main(out=(sys.argv[sys.argv.index('--out') + 1]
              if '--out' in sys.argv else None))

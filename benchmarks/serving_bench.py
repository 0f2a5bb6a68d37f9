"""Serving benchmark — component-separated and hardware-portable (round 5).

The round-4 artifact conflated host→device relay cost (an artifact of this
box's remote-device tunnel) with batcher overhead; this version reports each
component separately so the numbers stay interpretable on real hardware:

  * engine-side throughput (in-jit chained timing, device only) at the
    peak-throughput batch (16, per the measured latency curve) and at the
    serving batch (64)
  * transfer cost: host→device put of one uint8 batch, measured alone
    (tunnel-dominated here — labelled as such)
  * batcher overhead: the DynamicBatcher machinery driven by a trivial
    device fn — µs/request of pure host-side submit/collect/slot work
  * end-to-end request path: throughput + p50/p99 request latency at
    pipeline depths 1/2/4 (depth>1 beating depth=1 evidences
    fetch/compute overlap)
  * multi-device scaling rows when >1 device is visible

Run (TPU, one process at a time):
    timeout 590 python -u benchmarks/serving_bench.py --out \
        benchmarks/serving_bench_b64.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    from hawq_tpu.inference.engine import build_resnet_engine
    from hawq_tpu.parallel.serving import ServingEngine

    ap = argparse.ArgumentParser()
    ap.add_argument('--n-requests', type=int, default=256)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    cfg = get_bit_config('resnet50', 'uniform8')
    fm = synthetic_frozen_resnet('resnet50', cfg)
    # uint8 serving input: 4x less host->device traffic, normalization
    # folded into the on-device input quantization
    engine = build_resnet_engine(fm, residual_dtype=jnp.int16,
                                 input_mode='uint8',
                                 init_mode='bf16cert')
    rng = np.random.RandomState(0)
    results = {'device': str(jax.devices()[0])}

    # --- engine-side throughput (device only, transfer cancelled) -------
    # b64 takes the production uint8-direct route; b16 takes ITS production
    # route — host-folded input (wins at b<=16, docs/perf_tpu.md) — so the
    # b16 row is the recorded peak-throughput serving headline.
    from hawq_tpu.inference.fold import fold4_images
    engine16 = build_resnet_engine(fm, residual_dtype=jnp.int16,
                                   input_mode='folded_float32',
                                   init_mode='bf16cert')
    x16 = jnp.asarray(fold4_images(
        rng.rand(16, 224, 224, 3).astype(np.float32)))
    t = time_per_iter(engine16, x16)
    results['engine_b16_ms'] = t * 1e3
    results['engine_b16_img_per_sec'] = 16 / t
    print(f'engine b16 folded : {16/t:10.0f} img/s ({t*1e3:.3f} ms)',
          flush=True)
    xb = jnp.asarray(rng.randint(0, 256, (64, 224, 224, 3),
                                 dtype=np.uint8))
    t = time_per_iter(engine, xb)
    results['engine_b64_ms'] = t * 1e3
    results['engine_b64_img_per_sec'] = 64 / t
    print(f'engine b64 uint8  : {64/t:10.0f} img/s ({t*1e3:.3f} ms)',
          flush=True)

    # --- transfer cost: host->device put of one uint8 batch -------------
    # (On this box the device is behind a remote tunnel, so this number is
    # relay latency, not PCIe/DMA — the split exists precisely so the
    # end-to-end rows below can be read net of it.)
    host64 = rng.randint(0, 256, (64, 224, 224, 3), dtype=np.uint8)
    jax.block_until_ready(jax.device_put(host64))        # warm path
    n_put = 8
    t0 = time.perf_counter()
    for _ in range(n_put):
        jax.device_put(host64).block_until_ready()
    results['transfer_b64_ms'] = (time.perf_counter() - t0) / n_put * 1e3
    print(f"transfer b64      : {results['transfer_b64_ms']:.2f} ms "
          '(tunnel-dominated on this box)', flush=True)

    # --- batcher overhead: PURE host-side machinery ---------------------
    # infer/to_device/fetch stubbed to host no-ops, so this measures only
    # the queue/stack/pad/slot work per request — zero device interaction.
    from hawq_tpu.parallel.serving import DynamicBatcher
    logits64 = np.zeros((64, 1000), np.float32)
    nb = DynamicBatcher(lambda x: logits64, 64, (224, 224, 3),
                        max_delay_ms=2, depth=2, image_dtype=np.uint8,
                        to_device=lambda a: a, fetch=lambda o: o)
    try:
        reqs = [host64[i % 64] for i in range(512)]
        for s in [nb.submit(r) for r in reqs[:64]]:
            s.get(timeout=60)
        t0 = time.perf_counter()
        slots = [nb.submit(r) for r in reqs]
        for s in slots:
            s.get(timeout=60)
        dt = time.perf_counter() - t0
    finally:
        nb.close()
    results['batcher_overhead_us_per_request'] = dt / len(reqs) * 1e6
    print(f"batcher overhead  : "
          f"{results['batcher_overhead_us_per_request']:.1f} µs/request "
          '(host machinery only)', flush=True)

    # --- end-to-end request path: throughput + latency percentiles ------
    serving1 = ServingEngine(engine, n_devices=1, batch_size=64,
                             image_dtype=np.uint8)
    n_req = args.n_requests
    images = rng.randint(0, 256, (n_req, 224, 224, 3), dtype=np.uint8)
    for depth in (1, 2, 4):
        batcher = serving1.batcher(max_delay_ms=10, depth=depth)
        try:
            for s in [batcher.submit(images[i]) for i in range(64)]:
                s.get(timeout=300)
            lat = np.zeros(n_req)
            t0 = time.perf_counter()
            subs = [(i, time.perf_counter(), batcher.submit(images[i]))
                    for i in range(n_req)]
            for i, ts, s in subs:
                s.get(timeout=300)
                lat[i] = time.perf_counter() - ts
            dt = time.perf_counter() - t0
            results[f'request_depth{depth}_img_per_sec'] = n_req / dt
            results[f'request_depth{depth}_p50_ms'] = (
                float(np.percentile(lat, 50)) * 1e3)
            results[f'request_depth{depth}_p99_ms'] = (
                float(np.percentile(lat, 99)) * 1e3)
            print(f'request path d={depth} : {n_req/dt:10.0f} img/s  '
                  f'p50 {np.percentile(lat, 50)*1e3:.1f} ms  '
                  f'p99 {np.percentile(lat, 99)*1e3:.1f} ms', flush=True)
        finally:
            batcher.close()
    results['overlap_gain'] = (results['request_depth4_img_per_sec']
                               / results['request_depth1_img_per_sec'])

    # --- multi-device scaling (virtual mesh on the build box) -----------
    n_dev = len(jax.devices())
    if n_dev > 1:
        serving = ServingEngine(engine, batch_size=64 * n_dev,
                                image_dtype=np.uint8)
        tput = serving.throughput()
        results['mesh_devices'] = n_dev
        results['mesh_img_per_sec'] = tput
        results['scaling_efficiency'] = tput / (
            results['engine_b64_img_per_sec'] * n_dev)
        print(f'{n_dev}-device sharded : {tput:10.0f} img/s', flush=True)

    out = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in results.items()}
    print(json.dumps(out))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print('wrote', args.out)


if __name__ == '__main__':
    main()

"""Headline benchmark: integer ResNet50 inference throughput vs fp32 baseline.

Prints ONE JSON line:
  {"metric": "resnet50_w8a8_speedup_vs_fp32", "value": N, "unit": "x",
   "vs_baseline": N / 3.1}

The reference's headline (BASELINE.md): ResNet50 W8A8 is 3.1× over fp32 on a
T4 at batch 8 (TVM int8 tensor-core kernels).  Here both sides run on one
TPU chip: the fp32 JAX FloatResNet50 vs the integer engine (int8 MXU convs +
dyadic requant epilogues).  vs_baseline = our speedup / the reference's 3.1×.

Extra context keys (images/sec absolute, W4A4 speedup when the packed-int4
path lands) go into the same JSON object.
"""

import json
import time

import numpy as np


def _time_fn(fn, args, warmup=5, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    from hawq_tpu.inference.engine import build_resnet_engine
    from hawq_tpu.models.resnet import FloatResNet

    batch = 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 224, 224, 3).astype(np.float32))

    # fp32 baseline
    fmodel = FloatResNet(arch='resnet50')
    fvars = jax.jit(fmodel.init)(jax.random.PRNGKey(0), x)
    f32_fn = jax.jit(lambda v, x: fmodel.apply(v, x))
    t_f32 = _time_fn(f32_fn, (fvars, x))

    # integer engine W8A8
    cfg = get_bit_config('resnet50', 'uniform8')
    fm = synthetic_frozen_resnet('resnet50', cfg)
    engine = build_resnet_engine(fm)
    t_int8 = _time_fn(engine, (x,))

    speedup = t_f32 / t_int8
    result = {
        'metric': 'resnet50_w8a8_speedup_vs_fp32',
        'value': round(speedup, 3),
        'unit': 'x',
        'vs_baseline': round(speedup / 3.1, 3),
        'fp32_images_per_sec': round(batch / t_f32, 1),
        'int8_images_per_sec': round(batch / t_int8, 1),
        'batch': batch,
        'device': str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == '__main__':
    main()

"""Where the QAT train step's time goes — fwd / range-stats / bwd / update.

The reference has no training-perf story at all; train_bench.py gives the
headline (979 img/s at resnet50 b64).  This breaks the step into
cumulative phases, each timed with the in-jit chaining methodology:

  fwd_eval    quantized forward, frozen ranges (update_stats=False)
  fwd_stats   + range EMA / BN batch-stats updates (the QAT bookkeeping)
  grad        + backward through the STE custom_vjps (value_and_grad)
  full        + SGD update (the production train step)

Phase costs are the successive differences.  Run per phase pair to fit
the 10-min process budget over the remote-compile tunnel:

  python benchmarks/train_breakdown.py --phases fwd_eval,fwd_stats
  python benchmarks/train_breakdown.py --phases grad,full \
      --merge benchmarks/train_breakdown_b64.json
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--arch', default='resnet50')
    p.add_argument('--scheme', default='uniform8')
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--image-size', type=int, default=224)
    p.add_argument('--phases', default='fwd_eval,fwd_stats,grad,full')
    p.add_argument('--merge', default=None,
                   help='merge results into this JSON artifact')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.models.resnet import QResNet
    from hawq_tpu.train.train import (TrainState, make_train_step,
                                      sgd_with_step_decay)
    from benchmarks.train_bench import time_train_step

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(args.batch, args.image_size, args.image_size, 3)
                    .astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 1000, args.batch))
    cfg = get_bit_config(args.arch, args.scheme)
    model = QResNet(arch=args.arch, cfg=cfg, num_classes=1000)
    v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x, folded=True,
                                   update_stats=True))()

    def live_sum(t):
        return jnp.sum(t.astype(jnp.float32))

    results = {'arch': args.arch, 'scheme': args.scheme, 'batch': args.batch,
               'device': str(jax.devices()[0])}
    phases = args.phases.split(',')

    if 'fwd_eval' in phases:
        def fwd_eval(img):
            return model.apply(v, img, folded=True, update_stats=False)
        t = time_per_iter(fwd_eval, x)
        results['fwd_eval_ms'] = round(t * 1e3, 3)
        print('fwd_eval', results['fwd_eval_ms'], 'ms', flush=True)

    if 'fwd_stats' in phases:
        def fwd_stats(img):
            logits, mut = model.apply(
                v, img, folded=True, update_stats=True,
                mutable=['quant_stats', 'batch_stats'])
            # keep every updated statistic live (EMA mins/maxes, BN stats)
            return (live_sum(logits)
                    + sum(live_sum(l) for l in jax.tree.leaves(mut)))
        t = time_per_iter(fwd_stats, x)
        results['fwd_stats_ms'] = round(t * 1e3, 3)
        print('fwd_stats', results['fwd_stats_ms'], 'ms', flush=True)

    if 'grad' in phases:
        from hawq_tpu.train.train import cross_entropy

        def grad_fn(img):
            def loss_fn(params):
                logits, mut = model.apply(
                    {'params': params, 'quant_stats': v['quant_stats'],
                     'batch_stats': v['batch_stats']},
                    img, folded=True, update_stats=True,
                    mutable=['quant_stats', 'batch_stats'])
                return cross_entropy(logits, labels), mut
            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(v['params'])
            return (loss + sum(live_sum(l) for l in jax.tree.leaves(grads))
                    + sum(live_sum(l) for l in jax.tree.leaves(mut)))
        t = time_per_iter(grad_fn, x)
        results['grad_ms'] = round(t * 1e3, 3)
        print('grad', results['grad_ms'], 'ms', flush=True)

    if 'full' in phases:
        state = TrainState.create(v, sgd_with_step_decay(1e-3))
        step = make_train_step(model, folded=True)
        t = time_train_step(step, state,
                            {'image': x, 'label': labels})
        results['full_ms'] = round(t * 1e3, 3)
        print('full', results['full_ms'], 'ms', flush=True)

    if args.merge:
        if os.path.exists(args.merge):
            with open(args.merge) as f:
                prev = json.load(f)
            prev.update(results)
            results = prev
        with open(args.merge, 'w') as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()

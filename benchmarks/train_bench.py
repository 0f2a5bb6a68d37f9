"""QAT training throughput on one TPU chip — images/sec, int8-fwd vs fp32.

The reference never benchmarks training (its perf story is inference-only,
tvm_benchmark/test_resnet_inference_time.py); this measures the rebuilt
train step — quantized forward on the int8 MXU via custom_vjp
(nn/layers.py), straight-through backward in bf16/f32 — against the same
model trained in plain fp32, per chip.

Timing: N steps chained inside one jitted lax.fori_loop carrying the real
TrainState (the bench.py methodology: cancels the tunnel round-trip and
async-dispatch ack; the carried state is the data dependency).

  python benchmarks/train_bench.py [--arch resnet50] [--batch 64]
      [--image-size 224] [--out benchmarks/train_bench_b64.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_train_step(step_fn, state, batch, max_iters=256):
    """Seconds per train step, fixed overheads cancelled.

    Chains n steps in-jit with the TrainState as the loop carry; per-step
    time = (t(n) − t(1)) / (n − 1)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def looped(state, n):
        def body(_, st):
            st, _ = step_fn(st, batch)
            return st
        st = jax.lax.fori_loop(0, n, body, state)
        # returning a parameter element (not just .step) keeps the whole
        # fwd+bwd+update chain live — .step alone is constant-foldable
        leaf = jax.tree.leaves(st.params)[0]
        return jnp.sum(leaf.astype(jnp.float32)) + st.step

    np.asarray(looped(state, 1))            # compile + warm
    t0 = time.perf_counter()
    np.asarray(looped(state, 1))
    t1 = time.perf_counter() - t0

    n = 8
    while True:
        t0 = time.perf_counter()
        np.asarray(looped(state, n))
        tn = time.perf_counter() - t0
        if tn > max(3 * t1, t1 + 1.0) or n >= max_iters:
            break
        n *= 4
    return max(tn - t1, 1e-9) / (n - 1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--arch', default='resnet50',
                   help='resnet*, mobilenetv2, or inceptionv3')
    p.add_argument('--batch', type=int, default=64)
    p.add_argument('--image-size', type=int, default=None)
    p.add_argument('--out', default=None)
    p.add_argument('--schemes', default='uniform8,uniform4',
                   help='comma list; fewer schemes = fewer fresh compiles '
                        '(no persistent compile cache over the TPU tunnel)')
    p.add_argument('--residual-store-dtype', default=None,
                   help="'bfloat16': store conv backward residuals in bf16 "
                        "(value-exact for integer activations; halves the "
                        "fwd->bwd HBM traffic — train/train.py)")
    p.add_argument('--skip-fp32', action='store_true',
                   help='skip the fp32 baseline (A/B probes)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.train.train import (TrainState, make_train_step,
                                      sgd_with_step_decay)

    if args.arch == 'mobilenetv2':
        from hawq_tpu.models.mobilenetv2 import (QMobileNetV2,
                                                 FloatMobileNetV2)
        make_qmodel = lambda cfg: QMobileNetV2(cfg=cfg, num_classes=1000)
        fmodel = FloatMobileNetV2()
        default_hw = 224
    elif args.arch == 'inceptionv3':
        from hawq_tpu.models.inceptionv3 import (QInceptionV3,
                                                 FloatInceptionV3)
        make_qmodel = lambda cfg: QInceptionV3(cfg=cfg, num_classes=1000)
        fmodel = FloatInceptionV3()
        default_hw = 299
    else:
        from hawq_tpu.models.resnet import QResNet, FloatResNet
        make_qmodel = lambda cfg: QResNet(arch=args.arch, cfg=cfg,
                                          num_classes=1000)
        fmodel = FloatResNet(arch=args.arch)
        default_hw = 224
    if args.image_size is None:
        args.image_size = default_hw

    rng = np.random.RandomState(0)
    batch = {
        'image': jnp.asarray(rng.rand(args.batch, args.image_size,
                                      args.image_size, 3)
                             .astype(np.float32)),
        'label': jnp.asarray(rng.randint(0, 1000, args.batch)),
    }
    tx = sgd_with_step_decay(1e-3)

    def measure(model, **apply_kw):
        v = jax.jit(lambda: model.init(jax.random.PRNGKey(0),
                                       batch['image'], **apply_kw))()
        state = TrainState.create(v, tx)
        step = make_train_step(
            model, folded=apply_kw.get('folded', True),
            residual_store_dtype=args.residual_store_dtype)
        return time_train_step(step, state, batch)

    results = {'batch': args.batch, 'image_size': args.image_size,
               'device': str(jax.devices()[0])}

    # QAT step (folded BN, int8 MXU forward) per requested scheme
    for scheme in args.schemes.split(','):
        cfg = get_bit_config(args.arch, scheme)
        model = make_qmodel(cfg)
        t = measure(model, folded=True, update_stats=True)
        results[f'qat_{scheme}_ms_per_step'] = round(t * 1e3, 3)
        results[f'qat_{scheme}_images_per_sec'] = round(args.batch / t, 1)

    if args.skip_fp32:
        _emit(results, args.out)
        return

    # fp32 baseline train step on the float twin
    import optax

    def float_step(state, batch):
        def loss_fn(params):
            # train=True: BN batch stats update, like the QAT step (a
            # baseline with frozen BN would flatter the QAT speedup)
            logits, mut = fmodel.apply(
                {'params': params, 'batch_stats': state.batch_stats},
                batch['image'], train=True, mutable=['batch_stats'])
            one_hot = jax.nn.one_hot(batch['label'], logits.shape[-1])
            loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * one_hot,
                                     -1))
            return loss, mut

        with jax.default_matmul_precision('float32'):
            (loss, mut), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state,
                             batch_stats=mut['batch_stats']), {'loss': loss}

    fv = jax.jit(lambda: fmodel.init(jax.random.PRNGKey(0),
                                     batch['image']))()
    fstate = TrainState.create({'params': fv['params'], 'quant_stats': {},
                                'batch_stats': fv.get('batch_stats', {})},
                               tx)
    t_f32 = time_train_step(float_step, fstate, batch)
    results['fp32_ms_per_step'] = round(t_f32 * 1e3, 3)
    results['fp32_images_per_sec'] = round(args.batch / t_f32, 1)
    results['qat_vs_fp32'] = round(
        t_f32 / (results['qat_uniform8_ms_per_step'] / 1e3), 3)
    _emit(results, args.out)


def _emit(results, out_path):
    print(json.dumps(results))
    if out_path:
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()

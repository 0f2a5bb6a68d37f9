"""End-to-end mixed-precision config generation — the ILP.ipynb replacement.

Pipeline (SURVEY.md §7 stage 6):
  1. build the QAT model and (optionally) load trained float weights;
  2. estimate per-layer Hessian traces with Hutchinson probes on a
     calibration batch (the component the reference only ships as pasted
     constants, /root/reference/ILP.ipynb cell 4);
  3. compute per-layer ΔW² at 4/8 bits from the actual weights;
  4. solve the ILP under a model-size / BOPS / latency budget
     (latency mode consumes benchmarks/latency_lut_<arch>.json, measured on
     the real device by benchmarks/latency_lut.py);
  5. emit the BitConfig JSON next to the published ones.

Usage:
  python examples/generate_mixed_config.py --arch resnet50 --mode bops \
      --fraction 0.5 [--checkpoint model_best.npz] [--out path.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('--arch', default='resnet50')
    p.add_argument('--mode', default='bops',
                   choices=['model_size', 'bops', 'latency'])
    p.add_argument('--fraction', type=float, default=0.5)
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--image-size', type=int, default=224)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--num-classes', type=int, default=1000)
    p.add_argument('--probes', type=int, default=4)
    p.add_argument('--cpu', action='store_true')
    p.add_argument('--published-traces', action='store_true',
                   help="use the reference's published Hutchinson trace / "
                        "ΔW² / params / BOPS arrays (ILP.ipynb cell 4 "
                        "inputs, configs/data/ilp_inputs_<arch>.json) "
                        "instead of estimating traces — the exact notebook "
                        "recipe with the measured TPU latency LUT swapped "
                        "in for the T4 one")
    p.add_argument('--out', default=None)
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.sensitivity.hessian import (hutchinson_layer_traces,
                                              conv_layer_traces)
    from hawq_tpu.sensitivity.ilp import (resnet_layer_costs, allocate_bits,
                                          allocation_to_bit_config,
                                          mobilenet_layer_costs,
                                          mobilenet_allocation_to_bit_config)
    from hawq_tpu.train.train import cross_entropy
    from hawq_tpu.utils import checkpoint as ckpt

    cfg8 = get_bit_config(args.arch, 'uniform8')
    if args.arch == 'mobilenetv2':
        from hawq_tpu.models.mobilenetv2 import QMobileNetV2
        model = QMobileNetV2(cfg=cfg8, num_classes=args.num_classes)
    else:
        from hawq_tpu.models.resnet import QResNet
        model = QResNet(arch=args.arch, cfg=cfg8,
                        num_classes=args.num_classes)
    lut = None
    if args.mode == 'latency':
        lut_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), 'benchmarks',
            f'latency_lut_{args.arch}.json')
        with open(lut_path) as f:
            lut = {k: tuple(v) for k, v in json.load(f).items()}

    if args.published_traces:
        # ILP.ipynb's own inputs; only the latency columns are replaced by
        # the measured TPU LUT (the notebook's T4 LUT analog)
        if args.checkpoint:
            p.error('--published-traces uses the reference trace arrays; '
                    '--checkpoint has no effect — drop one of the two')
        import dataclasses
        from hawq_tpu.sensitivity.ilp import published_ilp_inputs
        costs = published_ilp_inputs(args.arch)   # resnet18/50 only
        if lut is not None:
            # A missing LUT key must not silently make a layer free in the
            # latency constraint (it would skew the whole allocation).
            missing = [c.key for c in costs if c.key not in lut]
            if missing:
                raise KeyError(
                    f'latency LUT {lut_path} is missing layer(s) '
                    f'{missing} — re-measure with benchmarks/latency_lut.py')
            costs = [dataclasses.replace(
                c, latency4=lut[c.key][0], latency8=lut[c.key][1])
                for c in costs]
    else:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(args.batch, args.image_size,
                                 args.image_size, 3).astype(np.float32))
        y = jnp.asarray(rng.randint(0, args.num_classes, (args.batch,)))

        variables = model.init(jax.random.PRNGKey(0), x, folded=True,
                               update_stats=True)
        if args.checkpoint:
            loaded, _ = ckpt.load_train_checkpoint(args.checkpoint)
            variables = loaded

        def loss_fn(params):
            logits = model.apply({**variables, 'params': params}, x,
                                 folded=True, update_stats=False)
            return cross_entropy(logits, y)

        print('estimating Hessian traces...', flush=True)
        traces = conv_layer_traces(hutchinson_layer_traces(
            loss_fn, variables['params'], n_probes=args.probes))

        if args.arch == 'mobilenetv2':
            costs = mobilenet_layer_costs(variables['params'], traces,
                                          input_size=args.image_size,
                                          latency_lut=lut)
        else:
            costs = resnet_layer_costs(args.arch, variables['params'],
                                       traces, input_size=args.image_size,
                                       latency_lut=lut)
    print(f'{len(costs)} quantizable layers; solving {args.mode} '
          f'@ {args.fraction}...', flush=True)
    alloc = allocate_bits(costs, args.mode, args.fraction)
    if args.arch == 'mobilenetv2':
        bit_cfg = mobilenet_allocation_to_bit_config(
            alloc, f'{args.mode}_{args.fraction}_generated')
    else:
        bit_cfg = allocation_to_bit_config(
            args.arch, alloc, f'{args.mode}_{args.fraction}_generated')

    n4 = sum(1 for v in alloc.bits.values() if v == 4)
    print(f'allocation: {n4}/{len(alloc.bits)} layers at 4 bit; '
          f'resource {alloc.resource_used:.3g} / {alloc.resource_limit:.3g}; '
          f'objective {alloc.objective:.4g}')

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f'{args.arch}_{args.mode}_{args.fraction}_generated.json')
    with open(out, 'w') as f:
        f.write(bit_cfg.to_json())
    print('wrote', out)


if __name__ == '__main__':
    main()

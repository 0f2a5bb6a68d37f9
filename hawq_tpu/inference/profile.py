"""Per-stage/per-node engine profiling — the debug_runtime analog.

The reference gets per-operator timing from TVM's debug_runtime
(/root/reference/tvm_benchmark/test_resnet_inference_time.py:244-250).
Here the engine's ``capture`` (graph truncation) mode provides the same
information: timing the engine truncated at successive nodes yields
cumulative and per-segment device times, measured with the transfer-honest
loop method (bench.time_per_iter).

Also exposes ``engine_flops_and_bytes`` for roofline context.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hawq_tpu.configs.bit_config import RESNET_UNITS
from hawq_tpu.inference.freeze import FrozenModel


def default_capture_points(fm: FrozenModel) -> List[str]:
    """Per-stage truncation points for any supported engine family."""
    if fm.arch == 'mobilenetv2':
        from hawq_tpu.models.mobilenetv2 import MOBILENETV2_STAGES
        points = ['init']
        for i, stage in enumerate(MOBILENETV2_STAGES, start=1):
            points.append(
                f'features.stage{i}.unit{len(stage)}.quant_act_int32')
        return points + ['final', 'fc_input']
    if fm.arch == 'inceptionv3':
        from hawq_tpu.models.inceptionv3 import INCEPTION_CHANNELS
        points = ['init']
        for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
            points.append(
                f'features.stage{i}.unit{len(stage)}.q_rescaling_activ')
        return points + ['fc_input']
    base = fm.arch[:-2] if fm.arch.endswith('v2') else fm.arch
    points = ['init']
    for s, n_units in enumerate(RESNET_UNITS[base], start=1):
        points.append(f'stage{s}.unit{n_units}.quant_act_int32')
    points.append('fc_output' if not fm.arch.endswith('v2') else 'fc_input')
    return points


def _engine_builder(fm: FrozenModel):
    """Capture-capable engine builder for the model family."""
    if fm.arch == 'mobilenetv2':
        from hawq_tpu.models.mobilenetv2 import MOBILENETV2_STAGES
        from hawq_tpu.inference.engine_mobilenet import \
            build_mobilenetv2_engine
        return lambda fm_, **kw: build_mobilenetv2_engine(
            fm_, MOBILENETV2_STAGES, **kw)
    if fm.arch == 'inceptionv3':
        from hawq_tpu.inference.engine_inception import \
            build_inceptionv3_engine
        return build_inceptionv3_engine
    if fm.arch.endswith('v2'):
        from hawq_tpu.inference.engine_v2 import build_resnet_v2_engine
        return build_resnet_v2_engine
    from hawq_tpu.inference.engine import build_resnet_engine
    return build_resnet_engine


def profile_engine(fm: FrozenModel, x, points: Optional[Sequence[str]] = None,
                   verbose: bool = True, **engine_kwargs
                   ) -> List[Tuple[str, float, float]]:
    """[(node, cumulative_s, segment_s)] for successive truncation points."""
    from bench import time_per_iter
    build = _engine_builder(fm)

    points = list(points or default_capture_points(fm))
    out = []
    prev = 0.0
    for pt in points:
        eng = build(fm, capture=pt, **engine_kwargs)
        t = time_per_iter(eng, x)
        out.append((pt, t, t - prev))
        if verbose:
            print(f'{pt:40s} cum {t*1e3:8.3f} ms   seg {(t-prev)*1e3:8.3f} ms',
                  flush=True)
        prev = t
    return out


def engine_flops_and_bytes(fm: FrozenModel, batch: int,
                           image_size: int = 224) -> Dict[str, float]:
    """Integer-op count and minimum HBM bytes for the frozen model."""
    from benchmarks.latency_lut import conv_shapes
    total_macs = 0
    weight_bytes = 0
    for (key, h, stride, kh, kw, cin, cout) in conv_shapes(
            fm.arch, input_size=image_size, batch=batch):
        out_sp = h // stride
        total_macs += batch * out_sp * out_sp * kh * kw * cin * cout
        bits = fm.cfg.weight_bits(key)
        weight_bytes += kh * kw * cin * cout * bits // 8
    return {'int_ops': 2.0 * total_macs,
            'weight_bytes': float(weight_bytes)}


def main():
    """Per-stage engine profile on the current device.

    Run from the repo root (one TPU process at a time):
        timeout 590 python -m hawq_tpu.inference.profile \
            --arch resnet50 --scheme uniform8 --batch 64
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument('--arch', default='resnet50')
    ap.add_argument('--scheme', default='uniform8')
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--points', default=None,
                    help='comma list of capture points (default per-stage)')
    ap.add_argument('--input-mode', default='float32')
    ap.add_argument('--conv-mode', default=None,
                    help="engine conv_mode override (e.g. 'f32' for the "
                         'certified-exact float route, mnv2/inception)')
    ap.add_argument('--trace', default=None, metavar='DIR',
                    help='also capture a jax.profiler trace of the full '
                         'engine to DIR (the TVM debug_runtime dump analog; '
                         'view with tensorboard/xprof)')
    ap.add_argument('--trace-iters', type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from hawq_tpu.configs.bit_config import get_bit_config

    cfg = get_bit_config(args.arch, args.scheme)
    rng = np.random.RandomState(0)
    kwargs = {}
    if args.arch == 'mobilenetv2':
        from hawq_tpu.inference.synthetic import synthetic_frozen_mobilenet
        fm = synthetic_frozen_mobilenet(cfg)
        x = rng.rand(args.batch, 224, 224, 3).astype(np.float32)
    elif args.arch == 'inceptionv3':
        from hawq_tpu.inference.synthetic import synthetic_frozen_inception
        fm = synthetic_frozen_inception(cfg)
        x = rng.rand(args.batch, 299, 299, 3).astype(np.float32)
    else:
        from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
        fm = synthetic_frozen_resnet(args.arch, cfg)
        x = rng.rand(args.batch, 224, 224, 3).astype(np.float32)
        if args.input_mode.startswith('folded'):
            from hawq_tpu.inference.fold import fold4_images
            x = fold4_images(x)
        kwargs = dict(residual_dtype=jnp.int16, input_mode=args.input_mode)
    x = jnp.asarray(x)
    if args.conv_mode:
        kwargs['conv_mode'] = args.conv_mode
    points = args.points.split(',') if args.points else None
    profile_engine(fm, x, points=points, **kwargs)

    if args.trace:
        eng = _engine_builder(fm)(fm, **kwargs)
        np.asarray(eng(x))                      # compile + warm
        try:
            with jax.profiler.trace(args.trace):
                for _ in range(args.trace_iters):
                    np.asarray(eng(x))
            print(f'trace written to {args.trace}', flush=True)
        except Exception as e:                  # remote-tunnel backends may
            print(f'trace capture unavailable: {e}', flush=True)  # not trace


if __name__ == '__main__':
    main()

"""Unified deployment CLI — load a frozen integer artifact and drive it.

The single-tool analog of the reference's three tvm_benchmark drivers
(/root/reference/tvm_benchmark/test_resnet_inference.py:28-201 classify +
--debug-unit golden parity, test_resnet_inference_time.py:256-271 latency,
test_resnet_accuracy_imagenet.py:78-166 accuracy sweep) plus its export
step, over any model family:

  python -m hawq_tpu.deploy --frozen run/quantized_checkpoint.npz \
      [--classify img.npy] [--time] [--batch 8] \
      [--capture stage1.unit1.quant_act_int32 --save-capture out.npy] \
      [--compare golden.npy] [--export-onnx model.onnx] [--routing t.json]

With no --frozen, --arch/--scheme builds a synthetic-weight model (the
reference's create_workload latency mode, init.py:143-180).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from hawq_tpu.inference.freeze import FrozenModel


def build_engine_for(fm: FrozenModel, **kw):
    """Arch-dispatching engine builder (any FrozenModel → jitted fn).

    Accepted kwargs are forwarded to the family builder; ones a family
    doesn't support (e.g. input_mode outside resnet v1) must be left unset.
    """
    arch = fm.arch
    if arch == 'mobilenetv2':
        from hawq_tpu.inference.engine_mobilenet import (
            build_mobilenetv2_engine, stages_from_frozen)
        return build_mobilenetv2_engine(fm, stages_from_frozen(fm), **kw)
    if arch == 'inceptionv3':
        from hawq_tpu.inference.engine_inception import (
            build_inceptionv3_engine, width_div_from_frozen)
        return build_inceptionv3_engine(
            fm, width_div=width_div_from_frozen(fm), **kw)
    if arch.endswith('v2'):
        from hawq_tpu.inference.engine_v2 import build_resnet_v2_engine
        return build_resnet_v2_engine(fm, **kw)
    from hawq_tpu.inference.engine import build_resnet_engine
    return build_resnet_engine(fm, **kw)


def production_route(fm: FrozenModel, batch: int):
    """(input_mode, conv_mode): the measured-best bit-exact route per
    family and batch (docs/perf_tpu.md round-5 family table +
    input_mode_b64.json / residual_fusion_b8_b64.json):

      * resnet v1 with a 7×7 init: host fold4 wins at b≤16, raw float32 at
        b≥32 (uint8 is fastest at b64 but changes the input contract, so
        'auto' never selects it);
      * inceptionv3: host fold4_3x3s2 at b≤16 (with certified bf16
        activation containers at b≤8 — 1.505 ms/b8, 16% over the f32-cert
        route; plain int8 wins by b16), raw float32 + int8 at b≥32 (the
        fold loses at b64; main() adds int16 wide containers and the
        bf16-sectioned init there → 10.58 ms/b64) —
        benchmarks/inception_wide16.json;
      * mobilenetv2: raw float32 input; bf16 activation containers
        (conv_mode='bf16', dense-conv certificate) at b≥16 — 21% faster
        than int8 at b64, tie at b8 (mnv2_variants_b{8,16,64}.json);
      * pre-activation v2: plain int8 over raw float32.
    """
    if fm.arch == 'inceptionv3':
        if batch <= 8:
            return ('folded_float32', 'bf16')
        if batch <= 16:
            return ('folded_float32', 'int8')
        return ('float32', 'int8')
    if fm.arch == 'mobilenetv2':
        return ('float32', 'bf16' if batch >= 16 else 'int8')
    if fm.arch.endswith('v2'):
        return ('float32', 'int8')
    init_key = ('quant_init_convbn' if 'quant_init_convbn.weight_int'
                in fm.tensors else 'quant_init_block_convbn')
    w = fm.tensors.get(init_key + '.weight_int')
    foldable = w is not None and w.shape[:2] == (7, 7)
    return ('folded_float32' if (batch <= 16 and foldable) else 'float32',
            'int8')


def default_image_size(fm: FrozenModel) -> int:
    from hawq_tpu.configs.bit_config import RESNET_CIFAR_ARCHS
    if fm.arch == 'inceptionv3':
        return 299
    return 32 if fm.arch in RESNET_CIFAR_ARCHS else 224


def _load_frozen_or_synthetic(args) -> FrozenModel:
    from hawq_tpu.configs.bit_config import get_bit_config
    if getattr(args, 'import_reference', None):
        # the reference's quantized_checkpoint.pth.tar hand-off artifact
        from hawq_tpu.utils.checkpoint import load_reference_quantized
        return load_reference_quantized(
            args.import_reference, args.arch,
            get_bit_config(args.arch, args.scheme))
    if args.frozen:
        from hawq_tpu.utils.checkpoint import load_frozen
        return load_frozen(args.frozen)
    from hawq_tpu.configs.bit_config import RESNET_UNITS
    if args.arch in ('mobilenetv2', 'mobilenetv2_w1'):
        from hawq_tpu.inference.synthetic import synthetic_frozen_mobilenet
        return synthetic_frozen_mobilenet(
            get_bit_config(args.arch, args.scheme))
    if args.arch == 'inceptionv3':
        from hawq_tpu.inference.synthetic import synthetic_frozen_inception
        return synthetic_frozen_inception(
            get_bit_config(args.arch, args.scheme))
    if args.arch.endswith('v2') and args.arch[:-2] in RESNET_UNITS:
        # pre-activation resnet v2 ('mobilenetv2' is dispatched above)
        from hawq_tpu.inference.synthetic import synthetic_frozen_resnet_v2
        return synthetic_frozen_resnet_v2(
            args.arch, get_bit_config(args.arch, args.scheme))
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    return synthetic_frozen_resnet(args.arch,
                                   get_bit_config(args.arch, args.scheme))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description='hawq-tpu deployment driver')
    p.add_argument('--frozen', help='quantized_checkpoint.npz path')
    p.add_argument('--import-reference',
                   help="reference quantized_checkpoint.pth.tar to import "
                        "(five-slice artifact of the published HAWQ-V3 "
                        "model zoo; needs --arch/--scheme for the bit "
                        "config)")
    p.add_argument('--requant-mode', default='native',
                   choices=['native', 'reference'],
                   help="'reference': replay with the reference's 31-bit/"
                        "f64 dyadic rounding (imported checkpoints; CPU, "
                        "enables jax x64; resnet v1 engines only)")
    p.add_argument('--arch', default='resnet50',
                   help='synthetic-weight arch when no --frozen')
    p.add_argument('--scheme', default='uniform8')
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--image-size', type=int, default=None)
    p.add_argument('--classify', help='npy of (H,W,3) f32 or (B,H,W,3)')
    p.add_argument('--topk', type=int, default=5)
    p.add_argument('--time', action='store_true',
                   help='report ms/batch + images/sec (in-jit loop timing)')
    p.add_argument('--capture',
                   help='truncate at this node, emit its integer tensor')
    p.add_argument('--save-capture', help='npy path for --capture output')
    p.add_argument('--compare',
                   help='golden npy; exact integer comparison against the '
                        'capture (the reference --debug-unit flow)')
    p.add_argument('--export-onnx', help='write the QONNX ONNX file here')
    p.add_argument('--export-reference',
                   help='write the model as a reference-format '
                        'quantized_checkpoint.pth.tar (the inverse of '
                        '--import-reference; lossless round-trip)')
    p.add_argument('--routing', help='autotune routing table JSON')
    p.add_argument('--accuracy',
                   help='val ImageFolder dir: run the integer engine over '
                        'the dataset and report top-1/top-5 (the '
                        'test_resnet_accuracy_imagenet.py flow)')
    p.add_argument('--max-batches', type=int, default=None)
    p.add_argument('--print-freq', type=int, default=10)
    p.add_argument('--dump-hlo',
                   help='write the compiled engine program text here (the '
                        'generated-kernel dump of the reference, '
                        'test_resnet_inference_time.py:82-89, 240-242)')
    p.add_argument('--input-mode', default='auto',
                   choices=['auto', 'float32', 'folded_float32', 'uint8'],
                   help='engine input path; folded_* folds on host '
                        'automatically (resnet: fold4, inception: '
                        'fold4_3x3s2).  auto (default) picks the measured '
                        'per-family per-batch production route '
                        '(docs/perf_tpu.md round-5 table)')
    p.add_argument('--conv-mode', default='auto',
                   choices=['auto', 'int8', 'f32', 'bf16'],
                   help="f32: certified-exact f32 conv route — convs whose "
                        "accumulator is provably < 2^24 thread integer-valued "
                        "f32 (bit-identical; the measured b<=16 winner for "
                        "inceptionv3).  auto picks per family/batch")
    args = p.parse_args(argv)

    import os
    import jax
    # honor JAX_PLATFORMS even where a sitecustomize force-registers a
    # device plugin (the config API wins over plugin registration)
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    import jax.numpy as jnp
    fm = _load_frozen_or_synthetic(args)
    size = args.image_size or default_image_size(fm)
    if args.input_mode == 'auto' or args.conv_mode == 'auto':
        auto_im, auto_cm = production_route(fm, args.batch)
        if args.requant_mode != 'native':   # replay mode: plain int8 route
            auto_im, auto_cm = 'float32', 'int8'
        if args.input_mode == 'auto':
            args.input_mode = auto_im
        if args.conv_mode == 'auto':
            args.conv_mode = auto_cm
    from hawq_tpu.inference.freeze import model_size_bytes
    print(f'arch={fm.arch} scheme={fm.cfg.name} classes={fm.num_classes} '
          f'tensors={len(fm.tensors)} image_size={size} '
          f'deployed_size={model_size_bytes(fm) / 1e6:.2f}MB')

    if args.export_onnx:
        from hawq_tpu.export.qonnx import export_qonnx
        export_qonnx(fm, args.export_onnx, image_size=size)
        print(f'exported ONNX → {args.export_onnx}')

    if args.export_reference:
        from hawq_tpu.utils.checkpoint import save_reference_quantized
        save_reference_quantized(args.export_reference, fm)
        print(f'exported reference-format checkpoint → '
              f'{args.export_reference}')

    kw = {}
    if args.requant_mode != 'native':
        if fm.arch != 'mobilenetv2' and fm.arch.endswith('v2'):
            sys.stderr.write("--requant-mode reference is not supported for "
                             "the pre-activation v2 engine\n")
            return 2
        import jax as _jax
        # the replay evaluates float64 (TPUs have no f64) — pin the CPU
        # backend as well; the env-var spelling is overridden by
        # sitecustomize on some hosts, the config API is not
        _jax.config.update('jax_platforms', 'cpu')
        _jax.config.update('jax_enable_x64', True)
        kw['requant_mode'] = args.requant_mode
    if args.conv_mode != 'int8':
        if fm.arch != 'mobilenetv2' and fm.arch.endswith('v2'):
            sys.stderr.write(f'--conv-mode {args.conv_mode} is not '
                             f'supported for the pre-activation v2 engine\n')
            return 2
        if (args.conv_mode == 'bf16'
                and fm.arch not in ('mobilenetv2', 'inceptionv3')):
            sys.stderr.write('--conv-mode bf16 is a mobilenetv2/inceptionv3 '
                             'engine mode (resnet engines take int8/f32)\n')
            return 2
        kw['conv_mode'] = args.conv_mode
    if args.routing:
        with open(args.routing) as f:
            kw['routing'] = {k: v for k, v in json.load(f).items()
                             if not k.startswith('_')}
    if args.capture:
        kw['capture'] = args.capture
    if (fm.arch == 'inceptionv3' and args.batch >= 32
            and args.requant_mode == 'native'):
        # int16 wide containers for the 16-bit activation nodes (+3.5% at
        # b64) + the bf16-sectioned init block (a further +3.4%: the init
        # is ~40% of the b64 runtime and bandwidth-bound, the stages stay
        # on the int8 MXU) — benchmarks/inception_wide16.json, bit-exact
        kw['wide_dtype'] = jnp.int16
        if args.conv_mode == 'int8':
            kw['init_mode'] = 'bf16cert'
    if (fm.arch != 'inceptionv3'
            and (fm.arch == 'mobilenetv2' or not fm.arch.endswith('v2'))
            and args.conv_mode == 'int8'
            and args.requant_mode == 'native'):
        # resnet v1 + mobilenetv2 production: init conv through the
        # certified bf16 route (bit-exact; wins at every batch/input mode —
        # benchmarks/resnet_init_bf16.json: b8 folded 0.556→0.549, b64
        # uint8 5.108→5.066, b64 f32 5.118→4.947;
        # benchmarks/mnv2_variants_b8.json: 1.283→1.198)
        kw['init_mode'] = 'bf16cert'

    if args.classify:
        x = np.load(args.classify).astype(np.float32)
        if x.ndim == 3:
            x = x[None]
    else:
        x = np.random.RandomState(0).rand(
            args.batch, size, size, 3).astype(np.float32)

    # input-mode plumbing: the host applies the matching fold
    fold_fn = None
    if args.input_mode != 'float32':
        if fm.arch == 'mobilenetv2' or fm.arch.endswith('v2'):
            sys.stderr.write(f'--input-mode {args.input_mode} is not '
                             f'supported for {fm.arch}\n')
            return 2
        kw['input_mode'] = args.input_mode
        if args.input_mode == 'folded_float32':
            # native (threaded C++) fold when built, numpy fallback
            from hawq_tpu.utils import preproc
            if fm.arch == 'inceptionv3':
                kw['input_hw'] = (size, size)
                fold_fn = lambda a: preproc.fold4_images_3x3s2(a, 0)
            else:
                fold_fn = preproc.fold4_images
        elif args.input_mode == 'uint8':
            if fm.arch == 'inceptionv3':
                sys.stderr.write('uint8 mode is resnet-only\n')
                return 2
            x = np.clip(x * 255.0, 0, 255).astype(np.uint8)
    if fold_fn is not None:
        x = fold_fn(x)

    engine = build_engine_for(fm, **kw)

    if args.dump_hlo:
        lowered = engine.lower(jnp.asarray(x))
        try:
            text = lowered.compile().as_text()    # optimized HLO
        except Exception:                          # backend w/o text dumps
            text = lowered.as_text()               # StableHLO fallback
        with open(args.dump_hlo, 'w') as f:
            f.write(text)
        print(f'dumped compiled program ({len(text)} chars) → '
              f'{args.dump_hlo}')

    if args.accuracy:
        # deployment-side accuracy: the integer engine over a val folder
        # (reference prints running meters every 10 batches,
        # test_resnet_accuracy_imagenet.py:131-135)
        if args.input_mode == 'uint8':
            sys.stderr.write('--accuracy feeds normalized f32 batches; '
                             'use float32 or folded_float32\n')
            return 2
        from hawq_tpu.train.data import ImageFolderLoader
        # keep the tail batch (one extra engine compile) — accuracy must
        # cover the whole val set, as the reference driver does
        loader = ImageFolderLoader(args.accuracy, args.batch, train=False,
                                   image_size=size, drop_remainder=False)
        top1 = top5 = seen = 0
        for i, batch in enumerate(loader.epoch(0)):
            if args.max_batches and i >= args.max_batches:
                break
            img = batch['image']
            if fold_fn is not None:
                img = fold_fn(np.asarray(img))
            logits = np.asarray(engine(jnp.asarray(img)))
            lbl = np.asarray(batch['label'])
            pred = np.argsort(logits, axis=-1)[:, ::-1]
            top1 += int((pred[:, 0] == lbl).sum())
            top5 += int((pred[:, :5] == lbl[:, None]).sum())
            seen += len(lbl)
            if (i + 1) % args.print_freq == 0:
                print(f'[{i + 1}] top1 {top1 / seen:.4f} '
                      f'top5 {top5 / seen:.4f} ({seen} images)')
        print(json.dumps({'top1': round(top1 / max(seen, 1), 4),
                          'top5': round(top5 / max(seen, 1), 4),
                          'images': seen}))
        return 0

    out = np.asarray(engine(jnp.asarray(x)))

    if args.capture:
        print(f'capture {args.capture}: shape={out.shape} dtype={out.dtype} '
              f'range=[{out.min()}, {out.max()}]')
        if args.save_capture:
            np.save(args.save_capture, out)
            print(f'saved → {args.save_capture}')
        if args.compare:
            golden = np.load(args.compare)
            mism = int(np.sum(golden.astype(np.int64)
                              != out.astype(np.int64)))
            print(f'{"100% matched!" if mism == 0 else str(mism) + " MISMATCHES"}'
                  f' ({out.size} values)')
            return 0 if mism == 0 else 1
    else:
        top = np.argsort(out, axis=-1)[:, ::-1][:, :args.topk]
        for i, row in enumerate(top):
            print(f'image {i}: top-{args.topk} classes {row.tolist()}')

    if args.time:
        import os
        try:
            from bench import time_per_iter
        except ImportError:        # repo root not on sys.path
            sys.path.insert(0, os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
            from bench import time_per_iter
        t = time_per_iter(engine, jnp.asarray(x))
        print(json.dumps({'ms_per_batch': round(t * 1e3, 3),
                          'images_per_sec': round(len(x) / t, 1),
                          'batch': len(x)}))
    return 0


if __name__ == '__main__':
    sys.exit(main())

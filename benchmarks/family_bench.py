"""MobileNetV2 / InceptionV3 integer-engine latency benchmark (batch 8).

Extends the measured-artifact coverage beyond ResNet (the reference only
benches resnets, /root/reference/run_resnet_inference_time.sh; its
mobilenet/inception ship as graphs without timing artifacts) — one JSON per
run with per-scheme latency, throughput, deployed size, and the measured
routing table's effect (XLA vs autotuned pallas routing).

Run (TPU, one process at a time):
    timeout 590 python -u benchmarks/family_bench.py --batch 8
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def deployed_bytes(fm) -> int:
    """True bit-packed parameter bytes (int4 weights count 0.5 B each)."""
    total = 0
    for k, v in fm.tensors.items():
        if k.endswith('.weight_int'):
            key = k[:-len('.weight_int')]
            bits = fm.cfg.weight_bits(key)
            total += int(np.prod(np.shape(v))) * bits // 8
        elif k.endswith('.bias_int'):
            total += int(np.prod(np.shape(v))) * 4
        elif k.endswith('_scale'):
            total += int(np.prod(np.shape(v))) * 4
    return total


def main():
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.autotune import load_routing
    from hawq_tpu.inference.synthetic import (synthetic_frozen_mobilenet,
                                              synthetic_frozen_inception)
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    from hawq_tpu.inference.engine_inception import build_inceptionv3_engine
    from hawq_tpu.models.mobilenetv2 import MOBILENETV2_STAGES

    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()
    bench_dir = os.path.dirname(os.path.abspath(__file__))
    out_path = args.out or os.path.join(
        bench_dir, f'family_bench_b{args.batch}.json')

    rng = np.random.RandomState(0)
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    def record(name, fn, x, fm=None, extra=None):
        if name in results:
            print(f'{name}: cached', flush=True)
            return
        t = time_per_iter(fn, x)
        results[name] = {
            'ms_per_batch': round(t * 1e3, 3),
            'images_per_sec': round(args.batch / t, 1),
        }
        if fm is not None:
            results[name]['deployed_mb'] = round(
                deployed_bytes(fm) / 2 ** 20, 2)
        if extra:
            results[name].update(extra)
        with open(out_path, 'w') as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f'{name}: {results[name]}', flush=True)

    # --- fp32 baselines (the speedup denominators; the reference's family
    # tables quote speedups vs the float model, model_zoo.md:50-56).
    # Methodology matches bench.py's resnet baseline: BOTH denominators are
    # recorded — bf16-default MXU passes (what a JAX user gets today) and
    # forced-f32 precision (what a torch fp32 model computes) — and the
    # fp32 rows get the same host-fold input option the integer rows get
    # (inception folds; mobilenetv2 does not fold on either side — the
    # 3×3/s2 C=32-out fold measured negative for its integer engine too).
    import jax
    from hawq_tpu.inference import fold
    from hawq_tpu.models.mobilenetv2 import FloatMobileNetV2
    from hawq_tpu.models.inceptionv3 import FloatInceptionV3

    def record_float(name, model, x):
        if name not in results or f'{name}_f32prec' not in results:
            variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
            record(name, lambda xx, v=variables, m=model: m.apply(v, xx), x)

            def f32prec(xx, v=variables, m=model):
                with jax.default_matmul_precision('float32'):
                    return m.apply(v, xx)
            record(f'{name}_f32prec', f32prec, x)
        else:
            print(f'{name}(+_f32prec): cached', flush=True)

    x224 = jnp.asarray(rng.rand(args.batch, 224, 224, 3).astype(np.float32))
    x299 = jnp.asarray(rng.rand(args.batch, 299, 299, 3).astype(np.float32))
    record_float('mobilenetv2_fp32', FloatMobileNetV2(), x224)
    record_float('inceptionv3_fp32', FloatInceptionV3(), x299)
    x299f = jnp.asarray(fold.fold4_images_3x3s2(np.asarray(x299), 0))
    record_float('inceptionv3_fp32_folded',
                 FloatInceptionV3(folded_input=True), x299f)

    for scheme in ('uniform8', 'uniform4'):
        # --- MobileNetV2, 224x224
        cfg = get_bit_config('mobilenetv2', scheme)
        fm = synthetic_frozen_mobilenet(cfg)
        x = jnp.asarray(rng.rand(args.batch, 224, 224, 3)
                        .astype(np.float32))
        eng = build_mobilenetv2_engine(fm, MOBILENETV2_STAGES)
        record(f'mobilenetv2_{scheme}', eng, x, fm)
        # certified bf16-exact conv route + int16 residual containers
        # (bit-identical logits — tests/test_routing.py)
        eng_bf = build_mobilenetv2_engine(fm, MOBILENETV2_STAGES,
                                          conv_mode='f32',
                                          residual_dtype=jnp.int16)
        record(f'mobilenetv2_{scheme}_f32', eng_bf, x, fm)
        # round-5 late add: int8 graph + certified-bf16 init conv (the b8
        # winner — skips the C=3 int8 lane-pad, mnv2_variants_b8.json)
        eng_ib = build_mobilenetv2_engine(fm, MOBILENETV2_STAGES,
                                          init_mode='bf16cert')
        record(f'mobilenetv2_{scheme}_initbf16', eng_ib, x, fm)
        rpath = os.path.join(bench_dir,
                             f'routing_mobilenetv2_{scheme}_b{args.batch}'
                             '.json')
        if os.path.exists(rpath):
            routing = load_routing(rpath)
            if any(v != 'xla' for v in routing.values()):
                eng_r = build_mobilenetv2_engine(fm, MOBILENETV2_STAGES,
                                                 routing=routing)
                record(f'mobilenetv2_{scheme}_routed', eng_r, x, fm)

        # --- InceptionV3, 299x299
        cfg = get_bit_config('inceptionv3', scheme)
        fm = synthetic_frozen_inception(cfg)
        xi = jnp.asarray(rng.rand(args.batch, 299, 299, 3)
                         .astype(np.float32))
        eng = build_inceptionv3_engine(fm)
        record(f'inceptionv3_{scheme}', eng, xi, fm)
        # production input path: host 4×4 fold of the 3×3/s2 C=3 q_conv1
        # (bit-exact 2×2/s1 rewrite; measured 30% faster end-to-end —
        # the analogous fold LOSES on mobilenetv2's 32-wide init conv,
        # 7.1× MAC overhead at k=3, so that family stays direct)
        from hawq_tpu.inference import fold
        xif = jnp.asarray(fold.fold4_images_3x3s2(np.asarray(xi), 0))
        eng_f = build_inceptionv3_engine(fm, input_mode='folded_float32',
                                         input_hw=(299, 299))
        record(f'inceptionv3_{scheme}_folded', eng_f, xif, fm)
        eng_fb = build_inceptionv3_engine(fm, input_mode='folded_float32',
                                          input_hw=(299, 299),
                                          conv_mode='f32')
        record(f'inceptionv3_{scheme}_folded_f32', eng_fb, xif, fm)
        # certified bf16 containers (round 5: the measured b8 winner —
        # half the f32 route's operand traffic, same 2^24 certificate)
        eng_fb16 = build_inceptionv3_engine(fm, input_mode='folded_float32',
                                            input_hw=(299, 299),
                                            conv_mode='bf16')
        record(f'inceptionv3_{scheme}_folded_bf16', eng_fb16, xif, fm)
        # unfolded bf16 + int16-wide (the b>=32 candidate: the fold loses
        # there, and 4-bit ranges certify nearly every conv)
        eng_b16w = build_inceptionv3_engine(fm, conv_mode='bf16',
                                            wide_dtype=jnp.int16)
        record(f'inceptionv3_{scheme}_bf16_w16', eng_b16w, xi, fm)
        rpath = os.path.join(bench_dir,
                             f'routing_inceptionv3_{scheme}_b{args.batch}'
                             '.json')
        if os.path.exists(rpath):
            routing = load_routing(rpath)
            if any(v != 'xla' for v in routing.values()):
                eng_r = build_inceptionv3_engine(fm, routing=routing)
                record(f'inceptionv3_{scheme}_routed', eng_r, xi, fm)

    # annotate integer rows with speedups vs every recorded denominator
    # (bf16-default, forced-f32-precision, and — where it exists — the
    # host-folded float baseline, the like-for-like comparison for the
    # folded integer rows)
    for name, row in results.items():
        if '_fp32' in name:
            continue
        family = name.split('_')[0]
        for suffix, col in (('_fp32', 'speedup_vs_fp32'),
                            ('_fp32_f32prec', 'speedup_vs_fp32_f32prec'),
                            ('_fp32_folded', 'speedup_vs_fp32_folded')):
            base = results.get(f'{family}{suffix}')
            if base:
                row[col] = round(
                    base['ms_per_batch'] / row['ms_per_batch'], 2)
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=1, sort_keys=True)

    print(json.dumps(results, indent=1, sort_keys=True))
    print('wrote', out_path)


if __name__ == '__main__':
    main()

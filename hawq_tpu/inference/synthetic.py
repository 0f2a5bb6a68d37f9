"""Synthetic frozen models for latency benchmarks and compile checks.

The analog of the reference's random-parameter workloads + synthetic QConfigs
(/root/reference/tvm_benchmark/mixed_precision_models/init.py:118-180 and
test_resnet_inference_time.py:112-137): build a FrozenModel with random
integer weights and plausible scales so the engine can be compiled and timed
without any trained checkpoint.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hawq_tpu.configs.bit_config import (BitConfig, RESNET_UNITS,
                                         RESNET_CONVS_PER_UNIT,
                                         RESNET_CIFAR_ARCHS)
from hawq_tpu.inference.freeze import FrozenModel
from hawq_tpu.models.resnet import _STAGE_CHANNELS, _INIT_FEATURES



def _gauss_weight_ints(rng, n: int, shape) -> np.ndarray:
    """Gaussian integer weights, the realistic synthetic distribution.

    Per-channel symmetric quantization maps the channel max to ±n, so real
    quantized-weight integers are ~N(0, (n/3.5)²) clipped — E|w| ≈ 0.23·n,
    not the n/2 of a uniform draw.  The reference's synthetic initializer is
    also gaussian (QuantizeInitializer, mixed_precision_models/init.py:118-
    141: np.random.normal(0, 4) for int8).  Weight-magnitude sums feed the
    certified-f32 route's 2²⁴ accumulator bound (inference/engine.py), so
    benchmark weights must match real checkpoints' statistics.
    """
    w = np.round(rng.normal(0.0, n / 3.5, shape))
    return np.clip(w, -n, n).astype(np.int8)

def synthetic_frozen_resnet(arch: str, cfg: BitConfig,
                            num_classes: int = 1000,
                            seed: int = 0) -> FrozenModel:
    rng = np.random.RandomState(seed)
    tensors: Dict[str, np.ndarray] = {}
    bottleneck = RESNET_CONVS_PER_UNIT[arch] == 3
    mids, outs = _STAGE_CHANNELS[arch]

    def act(key: str):
        tensors[key + '.act_scale'] = np.float32(
            0.05 * (1.0 + 0.1 * rng.rand()))

    def conv(key: str, kh, kw, cin, cout):
        bits = cfg.weight_bits(key)
        n = 2 ** (bits - 1) - 1
        tensors[key + '.weight_int'] = _gauss_weight_ints(
            rng, n, (kh, kw, cin, cout))
        tensors[key + '.bias_int'] = rng.randint(
            -2 ** 16, 2 ** 16, (cout,)).astype(np.int32)
        tensors[key + '.weight_scale'] = (
            0.002 * (0.5 + rng.rand(cout))).astype(np.float32)

    act('quant_input')
    init_feats = _INIT_FEATURES.get(arch, 64)
    init_key = 'quant_init_convbn' if bottleneck else 'quant_init_block_convbn'
    init_k = 3 if arch in RESNET_CIFAR_ARCHS else 7
    conv(init_key, init_k, init_k, 3, init_feats)
    act('quant_act_int32')

    in_ch = init_feats
    for s, n_units in enumerate(RESNET_UNITS[arch], start=1):
        for u in range(1, n_units + 1):
            p = f'stage{s}.unit{u}'
            stride = 2 if (u == 1 and s > 1) else 1
            out_ch = outs[s - 1]
            resize = (u == 1) and (in_ch != out_ch or stride != 1)
            act(f'{p}.quant_act')
            if resize:
                conv(f'{p}.quant_identity_convbn', 1, 1, in_ch, out_ch)
            if bottleneck:
                mid = mids[s - 1]
                conv(f'{p}.quant_convbn1', 1, 1, in_ch, mid)
                act(f'{p}.quant_act1')
                conv(f'{p}.quant_convbn2', 3, 3, mid, mid)
                act(f'{p}.quant_act2')
                conv(f'{p}.quant_convbn3', 1, 1, mid, out_ch)
            else:
                conv(f'{p}.quant_convbn1', 3, 3, in_ch, out_ch)
                act(f'{p}.quant_act1')
                conv(f'{p}.quant_convbn2', 3, 3, out_ch, out_ch)
            act(f'{p}.quant_act_int32')
            in_ch = out_ch

    act('quant_act_output')
    bits = cfg.weight_bits('quant_output')
    n = 2 ** (bits - 1) - 1
    tensors['quant_output.weight_int'] = _gauss_weight_ints(
        rng, n, (in_ch, num_classes))
    tensors['quant_output.bias_int'] = rng.randint(
        -2 ** 16, 2 ** 16, (num_classes,)).astype(np.int32)
    tensors['quant_output.weight_scale'] = (
        0.002 * (0.5 + rng.rand(num_classes))).astype(np.float32)

    return FrozenModel(arch=arch, cfg=cfg, tensors=tensors,
                       num_classes=num_classes)


def synthetic_frozen_resnet_v2(arch: str, cfg: BitConfig,
                               num_classes: int = 1000,
                               seed: int = 0) -> FrozenModel:
    """Random-integer FrozenModel in freeze_resnet_v2's namespace.

    The reference ships its v2 graph *only* in synthetic-weight latency form
    (quantized_resnet_v2.py via create_workload, init.py:143-180) — this is
    that workload for the TPU engine.  ``arch`` is e.g. 'resnet50v2'.
    """
    base = arch[:-2]
    g = _TensorGen(cfg, seed)
    bottleneck = RESNET_CONVS_PER_UNIT[base] == 3
    mids, outs = _STAGE_CHANNELS[base]
    init_feats = _INIT_FEATURES.get(base, 64)

    g.act('quant_input')
    g.conv('quant_init_conv', 7, 7, 3, init_feats)
    g.act('quant_act_int32')

    in_ch = init_feats
    for s, n_units in enumerate(RESNET_UNITS[base], start=1):
        for u in range(1, n_units + 1):
            p = f'stage{s}.unit{u}'
            stride = 2 if (u == 1 and s > 1) else 1
            out_ch = outs[s - 1]
            # standalone integer BN on the residual stream (bn1,
            # quantized_resnet_v2.py:24-36)
            g.tensors[f'{p}.quant_bn.bn_factor'] = (
                0.5 + g.rng.rand(in_ch)).astype(np.float32)
            g.tensors[f'{p}.quant_bn.bn_bias'] = (
                g.rng.randn(in_ch) * 0.1).astype(np.float32)
            g.act(f'{p}.quant_act')
            if (in_ch != out_ch) or stride != 1:
                g.conv(f'{p}.quant_identity_conv', 1, 1, in_ch, out_ch)
            if bottleneck:
                mid = mids[s - 1]
                g.conv(f'{p}.quant_conv1', 1, 1, in_ch, mid)
                g.act(f'{p}.quant_act1')
                g.conv(f'{p}.quant_conv2', 3, 3, mid, mid)
                g.act(f'{p}.quant_act2')
                g.conv(f'{p}.quant_conv3', 1, 1, mid, out_ch)
            else:
                g.conv(f'{p}.quant_conv1', 3, 3, in_ch, out_ch)
                g.act(f'{p}.quant_act1')
                g.conv(f'{p}.quant_conv2', 3, 3, out_ch, out_ch)
            g.act(f'{p}.quant_act_int32')
            in_ch = out_ch

    g.act('quant_act_output')
    g.dense('quant_output', in_ch, num_classes)
    return FrozenModel(arch=arch, cfg=cfg, tensors=g.tensors,
                       num_classes=num_classes)


class _TensorGen:
    """Shared random tensor emitters for the synthetic freezers."""

    def __init__(self, cfg: BitConfig, seed: int):
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.tensors: Dict[str, np.ndarray] = {}

    def act(self, key: str):
        self.tensors[key + '.act_scale'] = np.float32(
            0.05 * (1.0 + 0.1 * self.rng.rand()))

    def conv(self, key: str, kh, kw, cin, cout):
        n = 2 ** (self.cfg.weight_bits(key) - 1) - 1
        self.tensors[key + '.weight_int'] = _gauss_weight_ints(
            self.rng, n, (kh, kw, cin, cout))
        self.tensors[key + '.bias_int'] = self.rng.randint(
            -2 ** 16, 2 ** 16, (cout,)).astype(np.int32)
        self.tensors[key + '.weight_scale'] = (
            0.002 * (0.5 + self.rng.rand(cout))).astype(np.float32)

    def dense(self, key: str, cin, cout, as_1x1=False):
        n = 2 ** (self.cfg.weight_bits(key) - 1) - 1
        shape = (1, 1, cin, cout) if as_1x1 else (cin, cout)
        self.tensors[key + '.weight_int'] = _gauss_weight_ints(
            self.rng, n, shape)
        self.tensors[key + '.bias_int'] = self.rng.randint(
            -2 ** 16, 2 ** 16, (cout,)).astype(np.int32)
        self.tensors[key + '.weight_scale'] = (
            0.002 * (0.5 + self.rng.rand(cout))).astype(np.float32)


def synthetic_frozen_mobilenet(cfg: BitConfig, num_classes: int = 1000,
                               seed: int = 0, stages=None, init_ch=None,
                               final_ch=None) -> FrozenModel:
    """Random-integer FrozenModel matching freeze_mobilenetv2's namespace."""
    from hawq_tpu.models.mobilenetv2 import (MOBILENETV2_STAGES,
                                             MOBILENETV2_INIT_CH,
                                             MOBILENETV2_FINAL_CH)
    stages = MOBILENETV2_STAGES if stages is None else stages
    init_ch = MOBILENETV2_INIT_CH if init_ch is None else init_ch
    final_ch = MOBILENETV2_FINAL_CH if final_ch is None else final_ch
    g = _TensorGen(cfg, seed)
    g.act('quant_input')
    g.conv('init_block', 3, 3, 3, init_ch)
    g.act('quant_act_int32')
    in_ch = init_ch
    for i, stage in enumerate(stages, start=1):
        for j, out_ch in enumerate(stage, start=1):
            p = f'features.stage{i}.unit{j}'
            mid = in_ch * (1 if (i == 1 and j == 1) else 6)
            g.act(f'{p}.quant_act')
            g.conv(f'{p}.conv1', 1, 1, in_ch, mid)
            g.act(f'{p}.quant_act1')
            g.conv(f'{p}.conv2', 3, 3, 1, mid)         # depthwise HWIO
            g.act(f'{p}.quant_act2')
            g.conv(f'{p}.conv3', 1, 1, mid, out_ch)
            g.act(f'{p}.quant_act_int32')
            in_ch = out_ch
    g.act('quant_act_before_final_block')
    g.conv('features.final_block', 1, 1, in_ch, final_ch)
    g.act('quant_act_int32_final')
    g.act('quant_act_output')
    g.dense('output', final_ch, num_classes, as_1x1=True)
    return FrozenModel(arch='mobilenetv2', cfg=cfg, tensors=g.tensors,
                       num_classes=num_classes)


def synthetic_frozen_inception(cfg: BitConfig, num_classes: int = 1000,
                               width_div: int = 1,
                               seed: int = 0) -> FrozenModel:
    """Random-integer FrozenModel matching freeze_inceptionv3's namespace.

    Walks the same build_unit branch specifications the model / freezer /
    engine share, so shapes stay in one place."""
    from hawq_tpu.models.inceptionv3 import (
        INCEPTION_CHANNELS, build_unit, _Conv1x1Branch, _ConvSeqBranch,
        _MaxPoolBranch, _AvgPoolBranch, _ConvSeq3x3Branch, _cdiv, _ksize)
    d = (lambda c: _cdiv(c, width_div)) if width_div > 1 else (lambda c: c)
    g = _TensorGen(cfg, seed)

    def incept_conv(prefix, kh, kw, cin, cout):
        g.conv(f'{prefix}.q_convbn', kh, kw, cin, cout)
        g.act(f'{prefix}.q_activ')

    ip = 'features.q_init_block'
    g.act(f'{ip}.q_input_activ')
    init_chs = [d(c) for c in (32, 32, 64, 80, 192)]
    init_k = [(3, 3), (3, 3), (3, 3), (1, 1), (3, 3)]
    cin = 3
    for c, (ch, (kh, kw)) in enumerate(zip(init_chs, init_k), start=1):
        incept_conv(f'{ip}.q_conv{c}', kh, kw, cin, ch)
        cin = ch

    in_ch = init_chs[-1]
    b_idx = 0
    for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
        for j, out_ch in enumerate(stage, start=1):
            unit = build_unit(cfg, i, j, out_ch, b_idx, width_div=width_div)
            if i == 2 and j != 1:
                b_idx += 1
            p = unit.prefix
            unit_out = 0
            for name, ctor, kwargs in unit.branch_defs:
                bp = f'{p}.branches.{name}'
                g.act(f'{bp}.q_input_act')
                if ctor is _Conv1x1Branch:
                    incept_conv(f'{bp}.q_conv', 1, 1, in_ch,
                                kwargs['features'])
                    unit_out += kwargs['features']
                elif ctor is _ConvSeqBranch:
                    c_in = in_ch
                    for c, (oc, kz) in enumerate(
                            zip(kwargs['out_channels'], kwargs['kernels']),
                            start=1):
                        kh, kw = _ksize(kz)
                        incept_conv(f'{bp}.q_conv_list.q_conv{c}', kh, kw,
                                    c_in, oc)
                        c_in = oc
                    unit_out += c_in
                elif ctor is _MaxPoolBranch:
                    unit_out += in_ch
                elif ctor is _AvgPoolBranch:
                    g.act(f'{bp}.q_pool_act')
                    incept_conv(f'{bp}.q_conv', 1, 1, in_ch,
                                kwargs['features'])
                    unit_out += kwargs['features']
                elif ctor is _ConvSeq3x3Branch:
                    c_in = in_ch
                    for c, (oc, kz) in enumerate(
                            zip(kwargs['out_channels'], kwargs['kernels']),
                            start=1):
                        kh, kw = _ksize(kz)
                        incept_conv(f'{bp}.q_conv_list.q_conv{c}', kh, kw,
                                    c_in, oc)
                        c_in = oc
                    incept_conv(f'{bp}.q_conv1x3', 1, 3, c_in, c_in)
                    incept_conv(f'{bp}.q_conv3x1', 3, 1, c_in, c_in)
                    g.act(f'{bp}.q_rescaling_activ')
                    unit_out += 2 * c_in
            g.act(f'{p}.q_rescaling_activ')
            in_ch = unit_out

    g.act('features.q_concat_activ')
    g.dense('output.q_fc', in_ch, num_classes)
    return FrozenModel(arch='inceptionv3', cfg=cfg, tensors=g.tensors,
                       num_classes=num_classes)

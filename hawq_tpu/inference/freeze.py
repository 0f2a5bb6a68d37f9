"""Freeze a trained QAT model into a deployable integer checkpoint.

The TPU-native analog of the reference's two-step hand-off:
  1. ``validate()`` dumping the five integer/scale state-dict slices
     (convbn_scaling_factor, fc_scaling_factor, weight_integer, bias_integer,
     act_scaling_factor) — /root/reference/quant_train.py:665-670;
  2. the checkpoint → TVM converter wiring per-layer QConfigs with
     from_scale chaining — /root/reference/tvm_benchmark/
     hawq_utils_resnet50.py:205-312.

Here both collapse into one artifact: a flat dict of numpy arrays
(layer-key → weight_int int8 / bias_int int32 / weight_scale f32[C] /
act_scale f32[]) plus the BitConfig.  The engine (inference/engine.py)
consumes it directly; utils/checkpoint.py serializes it.

All integer/scale computations replicate the folded QAT path
(hawq_tpu/nn/layers.py QuantConvBn folded branch) in **float32 numpy with the
same op order as the jnp graph** — IEEE f32 elementwise ops are deterministic
and identical between numpy and XLA, so the frozen integers and scales are
bit-for-bit the ones the training graph uses.  (Float64 here would be wrong:
double rounding flips round-half-up decisions relative to the f32 QAT graph.)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional

import numpy as np

from hawq_tpu.configs.bit_config import (BitConfig, RESNET_UNITS,
                                         RESNET_CONVS_PER_UNIT)

BN_EPS = 1e-5


@dataclasses.dataclass
class FrozenModel:
    """Deployable integer checkpoint."""
    arch: str
    cfg: BitConfig
    tensors: Dict[str, np.ndarray]      # '<key>.weight_int' etc.
    num_classes: int = 1000

    def __getitem__(self, k: str) -> np.ndarray:
        return self.tensors[k]

    def act_scale(self, key: str) -> np.float32:
        return np.float32(self.tensors[key + '.act_scale'])


def _sym_scale(bits: int, lo, hi):
    """float32 mirror of qops.symmetric_quant_scale (same op order)."""
    n = 2 ** (bits - 1) - 1
    bound = np.maximum(np.abs(lo), np.abs(hi)).astype(np.float32)
    return (np.maximum(bound, np.float32(1e-8)) / n).astype(np.float32)


def _round_half_up(x):
    return np.floor(x + np.float32(0.5))


def _quant_int(x, scale, bits: int, out_dtype):
    """float32 mirror of qops.quantize_symmetric: clip(round(x/scale))."""
    n = 2 ** (bits - 1) - 1
    q = _round_half_up(x.astype(np.float32) / scale)
    q = np.clip(q, np.float32(-n - 1), np.float32(n))
    return q.astype(np.int64).astype(out_dtype)


def _act_scale_from_stats(stats: Mapping, bits: int, mode: str) -> np.float32:
    x_min = np.float32(stats['x_min'])
    x_max = np.float32(stats['x_max'])
    if mode == 'asymmetric':
        n = 2 ** bits - 1
        return np.float32(
            np.maximum(x_max - x_min, np.float32(1e-8)) / np.float32(n))
    n = 2 ** (bits - 1) - 1
    bound = np.maximum(np.abs(x_min), np.abs(x_max))
    return np.float32(np.maximum(bound, np.float32(1e-8)) / np.float32(n))


def _freeze_convbn(params: Mapping, bstats: Mapping, weight_bit: int,
                   bias_bit: int, in_act_scale: np.float32,
                   per_channel: bool) -> Dict[str, np.ndarray]:
    """Fold BN and quantize — float32 mirror of the QuantConvBn folded branch
    (nn/layers.py), parity target quant_modules.py:441-494."""
    kernel = np.asarray(params['kernel'], np.float32)        # HWIO
    gamma = np.asarray(params['gamma'], np.float32)
    beta = np.asarray(params['beta'], np.float32)
    mean = np.asarray(bstats['mean'], np.float32)
    var = np.asarray(bstats['var'], np.float32)

    running_std = np.sqrt(var + np.float32(BN_EPS))
    bn_factor = gamma / running_std
    w = kernel * bn_factor                     # broadcast over Cout (last)
    b = (np.float32(0.0) - mean) * bn_factor + beta

    w_flat = w.reshape(-1, w.shape[-1])
    if per_channel:
        lo, hi = w_flat.min(axis=0), w_flat.max(axis=0)
    else:
        lo, hi = w_flat.min(), w_flat.max()
    w_scale = _sym_scale(weight_bit, lo, hi)

    w_int = _quant_int(w, w_scale, weight_bit, np.int8)
    bias_scale = (w_scale * np.float32(in_act_scale)).astype(np.float32)
    b_int = _quant_int(b, bias_scale, bias_bit, np.int32)
    return {'weight_int': w_int, 'bias_int': b_int,
            'weight_scale': np.atleast_1d(w_scale)}


def _freeze_linear(params: Mapping, weight_bit: int, bias_bit: int,
                   in_act_scale: np.float32,
                   per_channel: bool) -> Dict[str, np.ndarray]:
    kernel = np.asarray(params['kernel'], np.float32)        # (F, O)
    bias = np.asarray(params['bias'], np.float32)
    if per_channel:
        lo, hi = kernel.min(axis=0), kernel.max(axis=0)
    else:
        lo, hi = kernel.min(), kernel.max()
    w_scale = _sym_scale(weight_bit, lo, hi)
    w_int = _quant_int(kernel, w_scale, weight_bit, np.int8)
    bias_scale = (w_scale * np.float32(in_act_scale)).astype(np.float32)
    b_int = _quant_int(bias, bias_scale, bias_bit, np.int32)
    return {'weight_int': w_int, 'bias_int': b_int,
            'weight_scale': np.atleast_1d(w_scale)}


def freeze_resnet(variables: Mapping, arch: str, cfg: BitConfig,
                  num_classes: int = 1000) -> FrozenModel:
    """Convert QResNet QAT variables → FrozenModel.

    variables: flax dict with 'params', 'batch_stats', 'quant_stats'
    (the quant_stats must have been calibrated — see train/calibrate).
    """
    params = variables['params']
    bstats = variables.get('batch_stats', {})
    qstats = variables['quant_stats']
    st = cfg.settings
    tensors: Dict[str, np.ndarray] = {}

    def act(key: str, module_path) -> np.float32:
        node = qstats
        for part in module_path:
            node = node[part]
        s = _act_scale_from_stats(node, cfg.act_bits(key), cfg.act_mode(key))
        tensors[key + '.act_scale'] = np.float32(s)
        return s

    def convbn(key: str, module_path, in_scale: np.float32):
        p, b = params, bstats
        for part in module_path:
            p = p[part]
            b = b[part]
        out = _freeze_convbn(p, b, cfg.weight_bits(key), st.bias_bit,
                             in_scale, st.per_channel)
        for k, v in out.items():
            tensors[f'{key}.{k}'] = v

    in_scale = act('quant_input', ('quant_input',))

    bottleneck = RESNET_CONVS_PER_UNIT[arch] == 3
    init_key = 'quant_init_convbn' if bottleneck else 'quant_init_block_convbn'
    convbn(init_key, (init_key,), in_scale)
    act('quant_act_int32', ('quant_act_int32',))

    for s, n_units in enumerate(RESNET_UNITS[arch], start=1):
        for u in range(1, n_units + 1):
            p = f'stage{s}.unit{u}'
            mod = f'stage{s}_unit{u}'
            a = act(f'{p}.quant_act', (mod, 'quant_act'))
            if f'{p}.quant_identity_convbn' in cfg or \
                    'quant_identity_convbn' in params.get(mod, {}):
                convbn(f'{p}.quant_identity_convbn',
                       (mod, 'quant_identity_convbn'), a)
            convbn(f'{p}.quant_convbn1', (mod, 'quant_convbn1'), a)
            a1 = act(f'{p}.quant_act1', (mod, 'quant_act1'))
            convbn(f'{p}.quant_convbn2', (mod, 'quant_convbn2'), a1)
            if bottleneck:
                a2 = act(f'{p}.quant_act2', (mod, 'quant_act2'))
                convbn(f'{p}.quant_convbn3', (mod, 'quant_convbn3'), a2)
            act(f'{p}.quant_act_int32', (mod, 'quant_act_int32'))

    out_sc = act('quant_act_output', ('quant_act_output',))
    lin = _freeze_linear(params['quant_output'], cfg.weight_bits('quant_output'),
                         st.bias_bit, out_sc, st.per_channel)
    for k, v in lin.items():
        tensors[f'quant_output.{k}'] = v

    return FrozenModel(arch=arch, cfg=cfg, tensors=tensors,
                       num_classes=num_classes)


def freeze_mobilenetv2(variables: Mapping, cfg: BitConfig,
                       stages, num_classes: int = 1000) -> FrozenModel:
    """Convert QMobileNetV2 QAT variables → FrozenModel.

    ``stages`` is the channel structure used to build the model
    (hawq_tpu/models/mobilenetv2.py MOBILENETV2_STAGES or the tiny variant).
    """
    params = variables['params']
    bstats = variables.get('batch_stats', {})
    qstats = variables['quant_stats']
    st = cfg.settings
    tensors: Dict[str, np.ndarray] = {}

    def act(key: str, module_path) -> np.float32:
        node = qstats
        for part in module_path:
            node = node[part]
        s = _act_scale_from_stats(node, cfg.act_bits(key), cfg.act_mode(key))
        tensors[key + '.act_scale'] = np.float32(s)
        return s

    def convbn(key: str, module_path, in_scale: np.float32):
        p, b = params, bstats
        for part in module_path:
            p = p[part]
            b = b[part]
        out = _freeze_convbn(p, b, cfg.weight_bits(key), st.bias_bit,
                             in_scale, st.per_channel)
        for k, v in out.items():
            tensors[f'{key}.{k}'] = v

    in_scale = act('quant_input', ('quant_input',))
    convbn('init_block', ('init_block',), in_scale)
    act('quant_act_int32', ('quant_act_int32',))

    for i, stage in enumerate(stages, start=1):
        for j, _ in enumerate(stage, start=1):
            p = f'features.stage{i}.unit{j}'
            mod = f'stage{i}_unit{j}'
            a = act(f'{p}.quant_act', (mod, 'quant_act'))
            convbn(f'{p}.conv1', (mod, 'conv1'), a)
            a1 = act(f'{p}.quant_act1', (mod, 'quant_act1'))
            convbn(f'{p}.conv2', (mod, 'conv2'), a1)
            a2 = act(f'{p}.quant_act2', (mod, 'quant_act2'))
            convbn(f'{p}.conv3', (mod, 'conv3'), a2)
            act(f'{p}.quant_act_int32', (mod, 'quant_act_int32'))

    a = act('quant_act_before_final_block', ('quant_act_before_final_block',))
    convbn('features.final_block', ('final_block',), a)
    act('quant_act_int32_final', ('quant_act_int32_final',))
    out_sc = act('quant_act_output', ('quant_act_output',))

    # output head: bare QuantConv2d 1×1 with bias (q_mobilenetv2.py:176-178)
    kernel = np.asarray(params['output']['kernel'], np.float32)  # (1,1,C,O)
    bias = np.asarray(params['output']['bias'], np.float32)
    w_flat = kernel.reshape(-1, kernel.shape[-1])
    if st.per_channel:
        lo, hi = w_flat.min(axis=0), w_flat.max(axis=0)
    else:
        lo, hi = w_flat.min(), w_flat.max()
    w_scale = _sym_scale(cfg.weight_bits('output'), lo, hi)
    tensors['output.weight_int'] = _quant_int(
        kernel, w_scale, cfg.weight_bits('output'), np.int8)
    bias_scale = (w_scale * np.float32(out_sc)).astype(np.float32)
    tensors['output.bias_int'] = _quant_int(bias, bias_scale, st.bias_bit,
                                            np.int32)
    tensors['output.weight_scale'] = np.atleast_1d(w_scale)

    return FrozenModel(arch='mobilenetv2', cfg=cfg, tensors=tensors,
                       num_classes=num_classes)


def model_size_bytes(fm: FrozenModel) -> int:
    """Deployed model size with true bit-packing (int4 weights count 4 bits),
    the number reported in the reference's Tables I/II (README.md:41-57)."""
    total_bits = 0
    for key, t in fm.tensors.items():
        if key.endswith('.weight_int'):
            layer = key[:-len('.weight_int')]
            bits = fm.cfg.weight_bits(layer)
            total_bits += t.size * bits
        elif key.endswith('.bias_int'):
            total_bits += t.size * 32
        elif key.endswith(('.weight_scale', '.act_scale')):
            total_bits += t.size * 32
    return total_bits // 8

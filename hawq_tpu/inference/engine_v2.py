"""Freezer + integer engine for pre-activation ResNet v2.

Deployment parity target: /root/reference/tvm_benchmark/
mixed_precision_models/quantized_resnet_v2.py (the graph the reference only
ships with synthetic weights and a float head — here the full integer path
is bit-exact against the QAT graph, tests/test_resnet_v2.py).

The unit's integer batch-norm is the canonical QuantBnAct semantics
(nn/layers.py): per-channel dyadic requant of the residual stream plus an
integer offset, relu-clamped — the engine evaluates the identical float32
expressions.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hawq_tpu.configs.bit_config import (BitConfig, RESNET_UNITS,
                                         RESNET_CONVS_PER_UNIT)
from hawq_tpu.inference.freeze import (FrozenModel, _act_scale_from_stats,
                                       _freeze_linear, _quant_int,
                                       _sym_scale)
from hawq_tpu.inference.engine import (_Plan, _conv_i8, _maxpool_int,
                                       _np_dyadic_multiplier, _requant)
from hawq_tpu.models.resnet import _STAGE_CHANNELS, _INIT_FEATURES
from hawq_tpu.quant import ops as qops

BN_EPS = 1e-5


def _freeze_conv(params, weight_bit, bias_bit, in_scale, per_channel,
                 use_bias=True):
    """float32 mirror of QuantConv2d (nn/layers.py) — same op order."""
    kernel = np.asarray(params['kernel'], np.float32)       # HWIO
    w_flat = kernel.reshape(-1, kernel.shape[-1])
    if per_channel:
        lo, hi = w_flat.min(axis=0), w_flat.max(axis=0)
    else:
        lo, hi = w_flat.min(), w_flat.max()
    w_scale = _sym_scale(weight_bit, lo, hi)
    w_int = _quant_int(kernel, w_scale, weight_bit, np.int8)
    bias_scale = (w_scale * np.float32(in_scale)).astype(np.float32)
    if use_bias:
        b_int = _quant_int(np.asarray(params['bias'], np.float32),
                           bias_scale, bias_bit, np.int32)
    else:
        b_int = np.zeros((kernel.shape[-1],), np.int32)
    return {'weight_int': w_int, 'bias_int': b_int,
            'weight_scale': np.atleast_1d(w_scale)}


def freeze_resnet_v2(variables, arch: str, cfg: BitConfig,
                     num_classes: int = 1000) -> FrozenModel:
    base = arch[:-2]
    params = variables['params']
    bstats = variables.get('batch_stats', {})
    qstats = variables['quant_stats']
    st = cfg.settings
    tensors: Dict[str, np.ndarray] = {}

    def act(key, module_path):
        node = qstats
        for part in module_path:
            node = node[part]
        s = _act_scale_from_stats(node, cfg.act_bits(key), cfg.act_mode(key))
        tensors[key + '.act_scale'] = np.float32(s)
        return s

    def conv(key, module_path, in_scale, use_bias=True):
        p = params
        for part in module_path:
            p = p[part]
        out = _freeze_conv(p, cfg.weight_bits(key), st.bias_bit, in_scale,
                           st.per_channel, use_bias)
        for k, v in out.items():
            tensors[f'{key}.{k}'] = v

    in_scale = act('quant_input', ('quant_input',))
    conv('quant_init_conv', ('quant_init_conv',), in_scale)
    act('quant_act_int32', ('quant_act_int32',))

    bottleneck = RESNET_CONVS_PER_UNIT[base] == 3
    for s, n_units in enumerate(RESNET_UNITS[base], start=1):
        for u in range(1, n_units + 1):
            p = f'stage{s}.unit{u}'
            mod = f'stage{s}_unit{u}'
            # qbn1: per-channel affine, f32 with the QuantBnAct op order
            bp = params[mod]['quant_bn']
            bs = bstats[mod]['quant_bn']
            gamma = np.asarray(bp['gamma'], np.float32)
            beta = np.asarray(bp['beta'], np.float32)
            mean = np.asarray(bs['mean'], np.float32)
            var = np.asarray(bs['var'], np.float32)
            bn_factor = gamma / np.sqrt(var + np.float32(BN_EPS))
            tensors[f'{p}.quant_bn.bn_factor'] = bn_factor
            tensors[f'{p}.quant_bn.bn_bias'] = (
                beta - mean * bn_factor).astype(np.float32)
            a = act(f'{p}.quant_act', (mod, 'quant_bn'))

            if f'quant_identity_conv' in params[mod]:
                conv(f'{p}.quant_identity_conv', (mod, 'quant_identity_conv'),
                     a, use_bias=False)
            conv(f'{p}.quant_conv1', (mod, 'quant_conv1'), a)
            a1 = act(f'{p}.quant_act1', (mod, 'quant_act1'))
            conv(f'{p}.quant_conv2', (mod, 'quant_conv2'), a1)
            if bottleneck:
                a2 = act(f'{p}.quant_act2', (mod, 'quant_act2'))
                conv(f'{p}.quant_conv3', (mod, 'quant_conv3'), a2)
            act(f'{p}.quant_act_int32', (mod, 'quant_act_int32'))

    out_sc = act('quant_act_output', ('quant_act_output',))
    lin = _freeze_linear(params['quant_output'],
                         cfg.weight_bits('quant_output'), st.bias_bit,
                         out_sc, st.per_channel)
    for k, v in lin.items():
        tensors[f'quant_output.{k}'] = v
    return FrozenModel(arch=arch, cfg=cfg, tensors=tensors,
                       num_classes=num_classes)


def build_resnet_v2_engine(fm: FrozenModel, capture: Optional[str] = None):
    """Compile a frozen QResNetV2 into fn(images f32 NHWC) → logits f32."""
    arch, cfg = fm.arch, fm.cfg
    base = arch[:-2]
    bottleneck = RESNET_CONVS_PER_UNIT[base] == 3
    plan = _Plan(fm)
    s_in = fm.act_scale('quant_input')

    def act_info(key):
        return (float(fm.act_scale(key)), cfg.act_bits(key),
                cfg.act_mode(key) == 'symmetric')

    captured = {}

    def emit(name, value):
        if capture is not None and name == capture:
            captured['value'] = value

    def forward(images: jnp.ndarray) -> jnp.ndarray:
        x8 = jnp.clip(qops.round_half_up(qops.exact_div(images, s_in)),
                      -128, 127
                      ).astype(jnp.int8)
        emit('input', x8)

        w8, b32 = plan.conv('quant_init_conv')
        acc = _conv_i8(x8, w8, (2, 2), ((3, 3), (3, 3))) + b32
        acc = jnp.maximum(acc, 0)
        acc = _maxpool_int(acc, (3, 3), (2, 2), ((1, 1), (1, 1)))
        s_init = (fm['quant_init_conv.weight_scale'].astype(np.float32)
                  * np.float32(s_in))
        s16, b16, sg16 = act_info('quant_act_int32')
        mult = plan.requant_mult('init_rq', s_init, s16)
        x = _requant(acc, mult, b16, sg16, jnp.int32)
        prev_scale = np.float32(s16)
        emit('init', x)

        for si, n_units in enumerate(RESNET_UNITS[base], start=1):
            for u in range(1, n_units + 1):
                p = f'stage{si}.unit{u}'
                stride = 2 if (u == 1 and si > 1) else 1
                resize = f'{p}.quant_identity_conv.weight_int' in fm.tensors

                # qbn1 + relu + requant: per-channel dyadic + integer offset
                sa, ba, sga = act_info(f'{p}.quant_act')
                bn_a = (np.float32(prev_scale)
                        * fm[f'{p}.quant_bn.bn_factor']).astype(np.float32)
                mult = plan.requant_mult(f'{p}.bn', bn_a, sa)
                b1 = np.floor(fm[f'{p}.quant_bn.bn_bias']
                              / np.float32(sa) + np.float32(0.5))
                lo, hi = qops.requant_clip_bounds(ba, sga)
                pre = qops.round_half_up(x.astype(jnp.float32) * mult) + b1
                pre = jnp.maximum(pre, 0.0)
                pre = jnp.clip(pre, lo, hi).astype(jnp.int8)
                emit(f'{p}.pre', pre)

                if resize:
                    wsc, bsc = plan.conv(f'{p}.quant_identity_conv')
                    id_acc = _conv_i8(pre, wsc, (stride, stride),
                                      'VALID') + bsc
                    id_scale = (fm[f'{p}.quant_identity_conv.weight_scale']
                                .astype(np.float32) * np.float32(sa))
                else:
                    id_acc = x
                    id_scale = prev_scale

                key1 = f'{p}.quant_conv1'
                w8, b32 = plan.conv(key1)
                pad1 = 'VALID' if bottleneck else ((1, 1), (1, 1))
                acc = _conv_i8(pre, w8, (stride, stride), pad1) + b32
                acc = jnp.maximum(acc, 0)
                acc_scale = (fm[key1 + '.weight_scale'].astype(np.float32)
                             * np.float32(sa))
                sa1, ba1, sg1 = act_info(f'{p}.quant_act1')
                mult = plan.requant_mult(f'{p}.a1', acc_scale, sa1)
                h = _requant(acc, mult, ba1, sg1)
                emit(f'{p}.conv1', h)

                key2 = f'{p}.quant_conv2'
                w8, b32 = plan.conv(key2)
                acc = _conv_i8(h, w8, (1, 1), ((1, 1), (1, 1))) + b32
                acc_scale = (fm[key2 + '.weight_scale'].astype(np.float32)
                             * np.float32(sa1))
                if bottleneck:
                    acc = jnp.maximum(acc, 0)
                    sa2, ba2, sg2 = act_info(f'{p}.quant_act2')
                    mult = plan.requant_mult(f'{p}.a2', acc_scale, sa2)
                    h = _requant(acc, mult, ba2, sg2)
                    key3 = f'{p}.quant_conv3'
                    w8, b32 = plan.conv(key3)
                    acc = _conv_i8(h, w8, (1, 1), 'VALID') + b32
                    acc_scale = (fm[key3 + '.weight_scale'].astype(np.float32)
                                 * np.float32(sa2))

                s_out, _, _ = act_info(f'{p}.quant_act_int32')
                m_main = plan.requant_mult(f'{p}.res_m', acc_scale, s_out)
                m_id = plan.requant_mult(f'{p}.res_i', id_scale, s_out)
                x = qops.requant_add_int32(acc, m_main, id_acc, m_id)
                prev_scale = np.float32(s_out)
                emit(f'{p}.quant_act_int32', x)

        # head: relu → integer avg pool → requant → fc
        x = jnp.maximum(x, 0)
        hw = x.shape[1] * x.shape[2]
        pooled = jnp.sum(x, axis=(1, 2), dtype=jnp.int32)
        pooled = jnp.trunc(qops.exact_div(pooled.astype(jnp.float32), hw)
                           + 0.01)
        s_fc, b_fc, sg_fc = act_info('quant_act_output')
        # head quantizer is a *direct* re-quantization of the pooled values
        # (QuantAct case (a)): round(value / s_fc) with value = ints·prev
        f8 = jnp.clip(qops.round_half_up(
            pooled * np.float32(prev_scale) / np.float32(s_fc)),
            *qops.requant_clip_bounds(b_fc, sg_fc)).astype(jnp.int8)
        emit('fc_input', f8)

        w8 = np.asarray(fm['quant_output.weight_int'])
        b32 = np.asarray(fm['quant_output.bias_int'])
        acc = jax.lax.dot_general(f8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32) + b32
        out_scale = (fm['quant_output.weight_scale'].astype(np.float32)
                     * np.float32(s_fc))
        return acc.astype(jnp.float32) * out_scale

    if capture is None:
        return jax.jit(forward)

    def forward_captured(images):
        forward(images)
        return captured['value']

    return jax.jit(forward_captured)

"""Quantized MobileNetV2 (NHWC, flax.linen).

Parity target: Q_MobileNetV2 / Q_LinearBottleneck
(/root/reference/utils/models/q_mobilenetv2.py).  Inverted-residual units:
optional 1×1 expansion conv → 3×3 depthwise conv → 1×1 linear projection,
ReLU6 activations, residual add (requantized with dual dyadic scales) only
when shape-preserving.  The output head is a bare 1×1 QuantConv2d on the
pooled feature map (q_mobilenetv2.py:176-178).

Config keys follow the reference bit_config naming
('features.stage{S}.unit{U}.conv{1,2,3}' etc., bit_config.py mobilenetv2
entries) so the published mixed configs apply unchanged.

ReLU6 in integer semantics: relu6 acts on the value tensor int·scale, so the
integer-side equivalent is clip(acc, 0, round(6/scale)) — the engine uses
exactly that; here in the QAT graph the float clip is applied to the value
before requantization, which the dyadic requant converts to the same
integers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from hawq_tpu.configs.bit_config import BitConfig, uniform_config
from hawq_tpu.nn import layers as L
from hawq_tpu.models.resnet import _qact, _qconvbn

# channels per stage for width_scale 1.0 (q_mobilenetv2.py:225-238)
MOBILENETV2_STAGES = ([16], [24, 24], [32, 32, 32],
                      [64, 64, 64, 64, 96, 96, 96], [160, 160, 160, 320])
MOBILENETV2_INIT_CH = 32
MOBILENETV2_FINAL_CH = 1280

# tiny variant for CPU tests: same wiring (no-expansion first unit,
# depthwise convs, residual + non-residual units)
TINY_MNV2_STAGES = ([8], [12, 12])
TINY_MNV2_INIT_CH = 8
TINY_MNV2_FINAL_CH = 32


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


def relu6_int(acc, acc_scale):
    """Integer-side ReLU6: clip(acc, 0, round_half_up(6/acc_scale)).

    The engine computes the identical bound in float32 numpy
    (inference/engine_mobilenet.py), so the clamped integers agree exactly;
    the value-side relu6 followed by scale recovery rounds to the same
    integers (6/s rounds half-up either way)."""
    if acc is None:
        return None
    hi = jnp.floor(6.0 / acc_scale + 0.5)
    return jnp.clip(acc, 0.0, hi)


class QLinearBottleneck(nn.Module):
    """Inverted-residual unit (Q_LinearBottleneck, q_mobilenetv2.py:12-92)."""
    cfg: BitConfig
    prefix: str          # 'features.stage1.unit1'
    in_ch: int
    out_ch: int
    stride: int
    expansion: bool

    @nn.compact
    def __call__(self, x, in_scale, *, folded: bool = True,
                 update_stats: bool = False):
        cfg, p = self.cfg, self.prefix
        residual = (self.in_ch == self.out_ch) and (self.stride == 1)
        mid = self.in_ch * 6 if self.expansion else self.in_ch

        identity = x if residual else None

        xq, act_scale = _qact(cfg, f'{p}.quant_act', 'quant_act')(
            x, in_scale, update_stats=update_stats)

        h, w_scale, acc = _qconvbn(cfg, f'{p}.conv1', 'conv1', mid, (1, 1),
                                   (1, 1), 'VALID')(
                                       xq, act_scale, folded=folded,
                                       update_stats=update_stats)
        h = relu6(h)
        acc = relu6_int(acc, w_scale * act_scale)
        h, a_scale = _qact(cfg, f'{p}.quant_act1', 'quant_act1')(
            h, act_scale, w_scale, x_int=acc, update_stats=update_stats)

        # depthwise 3×3
        h, w_scale, acc = L.QuantConvBn(
            features=mid, kernel_size=(3, 3),
            strides=(self.stride, self.stride), padding=((1, 1), (1, 1)),
            groups=mid, weight_bit=cfg.weight_bits(f'{p}.conv2'),
            bias_bit=cfg.settings.bias_bit,
            per_channel=cfg.settings.per_channel, name='conv2')(
                h, a_scale, folded=folded, update_stats=update_stats)
        h = relu6(h)
        acc = relu6_int(acc, w_scale * a_scale)
        h, a_scale = _qact(cfg, f'{p}.quant_act2', 'quant_act2')(
            h, a_scale, w_scale, x_int=acc, update_stats=update_stats)

        # linear 1×1 projection — no activation
        h, w_scale, acc = _qconvbn(cfg, f'{p}.conv3', 'conv3', self.out_ch,
                                   (1, 1), (1, 1), 'VALID')(
                                       h, a_scale, folded=folded,
                                       update_stats=update_stats)

        if residual:
            h = h + identity
            hq, out_scale = _qact(cfg, f'{p}.quant_act_int32',
                                  'quant_act_int32')(
                h, a_scale, w_scale, identity, in_scale, None,
                x_int=acc, update_stats=update_stats)
        else:
            hq, out_scale = _qact(cfg, f'{p}.quant_act_int32',
                                  'quant_act_int32')(
                h, a_scale, w_scale, x_int=acc, update_stats=update_stats)
        return hq, out_scale


class QMobileNetV2(nn.Module):
    """Quantized MobileNetV2 (q_mobilenetv2.py:94-211)."""
    cfg: Optional[BitConfig] = None
    num_classes: int = 1000
    stages: Tuple = MOBILENETV2_STAGES
    init_ch: int = MOBILENETV2_INIT_CH
    final_ch: int = MOBILENETV2_FINAL_CH

    @nn.compact
    def __call__(self, x, *, folded: bool = True, update_stats: bool = False):
        cfg = self.cfg if self.cfg is not None else \
            BitConfig(name='mobilenetv2_uniform8', table={})

        x, act_scale = _qact(cfg, 'quant_input', 'quant_input')(
            x, update_stats=update_stats)

        x, w_scale, acc = _qconvbn(cfg, 'init_block', 'init_block',
                                   self.init_ch, (3, 3), (2, 2),
                                   ((1, 1), (1, 1)))(
                                       x, act_scale, folded=folded,
                                       update_stats=update_stats)
        x = relu6(x)
        acc = relu6_int(acc, w_scale * act_scale)
        x, act_scale = _qact(cfg, 'quant_act_int32', 'quant_act_int32')(
            x, act_scale, w_scale, x_int=acc, update_stats=update_stats)

        in_ch = self.init_ch
        for i, stage in enumerate(self.stages, start=1):
            for j, out_ch in enumerate(stage, start=1):
                stride = 2 if (j == 1 and i != 1) else 1
                expansion = (i != 1) or (j != 1)
                x, act_scale = QLinearBottleneck(
                    cfg=cfg, prefix=f'features.stage{i}.unit{j}',
                    in_ch=in_ch, out_ch=out_ch, stride=stride,
                    expansion=expansion, name=f'stage{i}_unit{j}')(
                        x, act_scale, folded=folded,
                        update_stats=update_stats)
                in_ch = out_ch

        x, act_scale = _qact(cfg, 'quant_act_before_final_block',
                             'quant_act_before_final_block')(
            x, act_scale, update_stats=update_stats)
        x, w_scale, acc = _qconvbn(cfg, 'features.final_block', 'final_block',
                                   self.final_ch, (1, 1), (1, 1), 'VALID')(
                                       x, act_scale, folded=folded,
                                       update_stats=update_stats)
        x = relu6(x)
        acc = relu6_int(acc, w_scale * act_scale)
        x, act_scale = _qact(cfg, 'quant_act_int32_final',
                             'quant_act_int32_final')(
            x, act_scale, w_scale, x_int=acc, update_stats=update_stats)

        x, act_scale = L.quant_avg_pool(
            x, act_scale, (x.shape[1], x.shape[2]))
        x, act_scale = _qact(cfg, 'quant_act_output', 'quant_act_output')(
            x, act_scale, update_stats=update_stats)

        x, _, _ = L.QuantConv2d(features=self.num_classes, kernel_size=(1, 1),
                                padding='VALID',
                                weight_bit=cfg.weight_bits('output'),
                                bias_bit=cfg.settings.bias_bit,
                                per_channel=cfg.settings.per_channel,
                                name='output')(x, act_scale)
        return x.reshape(x.shape[0], -1)


class FloatMobileNetV2(nn.Module):
    """fp32 baseline with identical topology (speedup denominator for the
    family benchmarks; the reference's speedups are likewise quoted against
    the float model, model_zoo.md:50-56)."""
    num_classes: int = 1000
    stages: Tuple = MOBILENETV2_STAGES
    init_ch: int = MOBILENETV2_INIT_CH
    final_ch: int = MOBILENETV2_FINAL_CH

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        def convbn(h, feats, kernel, strides, padding, name, groups=1):
            h = nn.Conv(feats, kernel, strides=strides, padding=padding,
                        feature_group_count=groups, use_bias=False,
                        name=name + '_conv')(h)
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-5, name=name + '_bn')(h)

        x = relu6(convbn(x, self.init_ch, (3, 3), (2, 2), ((1, 1), (1, 1)),
                         'init'))
        in_ch = self.init_ch
        for i, stage in enumerate(self.stages, start=1):
            for j, out_ch in enumerate(stage, start=1):
                stride = 2 if (j == 1 and i != 1) else 1
                expansion = (i != 1) or (j != 1)
                mid = in_ch * 6 if expansion else in_ch
                name = f'stage{i}_unit{j}'
                residual = (in_ch == out_ch) and (stride == 1)
                h = relu6(convbn(x, mid, (1, 1), (1, 1), 'VALID',
                                 name + '_c1'))
                h = relu6(convbn(h, mid, (3, 3), (stride, stride),
                                 ((1, 1), (1, 1)), name + '_c2', groups=mid))
                h = convbn(h, out_ch, (1, 1), (1, 1), 'VALID', name + '_c3')
                x = x + h if residual else h
                in_ch = out_ch
        x = relu6(convbn(x, self.final_ch, (1, 1), (1, 1), 'VALID', 'final'))
        x = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = nn.Conv(self.num_classes, (1, 1), padding='VALID',
                    name='output')(x)
        return x.reshape(x.shape[0], -1)

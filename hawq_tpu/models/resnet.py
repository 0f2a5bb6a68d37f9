"""Quantized ResNet-18/50/50b/101 (NHWC, flax.linen).

Topology parity target: Q_ResNet18/50/101 + Q_ResBlockBn/Q_ResUnitBn
(/root/reference/utils/models/q_resnet.py) wrapping pytorchcv float models.
The residual wiring is the part that matters for integer exactness:

  * every unit opens with a QuantAct that requantizes the incoming residual
    sum (16-bit precision) down to the unit's activation bits;
  * when the identity needs resizing, the 1×1 identity conv consumes the
    *quantized* unit input and the residual add requantizes main and identity
    branches with their own (act, weight) scale pairs (q_resnet.py:231-260);
  * when it doesn't, the identity is the *raw* unit input carrying the
    previous unit's output scale (q_resnet.py:237-239, 253-256);
  * the closing quant_act_int32 performs the dual-dyadic requant-add and the
    unit ends with ReLU.

Config keys follow the reference naming (stage{S}.unit{U}.quant_convbn1 …)
so the published ILP mixed-precision tables apply unchanged; linen module
names replace '.' with '_'.

Padding is explicit (torch-style symmetric) rather than XLA 'SAME' so that
imported torchvision/pytorchcv weights reproduce exactly at stride 2.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from hawq_tpu.configs.bit_config import (BitConfig, RESNET_UNITS,
                                         RESNET_CONVS_PER_UNIT,
                                         RESNET_CIFAR_ARCHS)
from hawq_tpu.nn import layers as L

# (mid_channels_stage1.., out_channels_stage1..) per arch
_STAGE_CHANNELS = {
    'resnet18': (None, (64, 128, 256, 512)),
    'resnet34': (None, (64, 128, 256, 512)),
    'resnet50': ((64, 128, 256, 512), (256, 512, 1024, 2048)),
    'resnet50b': ((64, 128, 256, 512), (256, 512, 1024, 2048)),
    'resnet101': ((64, 128, 256, 512), (256, 512, 1024, 2048)),
    'resnet152': ((64, 128, 256, 512), (256, 512, 1024, 2048)),
    'resnet200': ((64, 128, 256, 512), (256, 512, 1024, 2048)),
    'resnet269': ((64, 128, 256, 512), (256, 512, 1024, 2048)),
    'tiny18': (None, (16, 32)),
    'tiny50': ((8, 16), (32, 64)),
    'wide50': ((128, 128), (256, 256)),
    # CIFAR filter lists (quantized_resnet_v1.py:504-513):
    # basic [16, 16, 32, 64]; bottleneck (n≥164) [16, 64, 128, 256]
    'resnet20_cifar': (None, (16, 32, 64)),
    'resnet56_cifar': (None, (16, 32, 64)),
    'resnet110_cifar': (None, (16, 32, 64)),
    'resnet164_cifar': ((16, 32, 64), (64, 128, 256)),
}
_INIT_FEATURES = {'tiny18': 16, 'tiny50': 16, 'wide50': 64,
                  'resnet20_cifar': 16, 'resnet56_cifar': 16,
                  'resnet110_cifar': 16, 'resnet164_cifar': 16}


def _qact(cfg: BitConfig, key: str, name: str) -> L.QuantAct:
    return L.QuantAct(bits=cfg.act_bits(key), quant_mode=cfg.act_mode(key),
                      momentum=cfg.settings.act_range_momentum,
                      percentile=cfg.settings.act_percentile,
                      fixed_point=cfg.settings.fixed_point_quantization,
                      name=name)


def _qconvbn(cfg: BitConfig, key: str, name: str, features: int,
             kernel: Tuple[int, int], strides: Tuple[int, int],
             padding: Any) -> L.QuantConvBn:
    return L.QuantConvBn(features=features, kernel_size=kernel,
                         strides=strides, padding=padding,
                         weight_bit=cfg.weight_bits(key),
                         bias_bit=cfg.settings.bias_bit,
                         per_channel=cfg.settings.per_channel,
                         weight_percentile=cfg.settings.weight_percentile,
                         name=name)


class QResUnit(nn.Module):
    """Bottleneck unit (Q_ResUnitBn, q_resnet.py:199-260)."""
    cfg: BitConfig
    prefix: str            # e.g. 'stage1.unit1'
    mid: int
    out: int
    stride: int
    resize: bool
    conv1_stride: bool = False   # True = resnet50 v1 (stride on 1×1)

    @nn.compact
    def __call__(self, x, in_scale, *, folded: bool = True,
                 update_stats: bool = False):
        cfg, p = self.cfg, self.prefix
        s1 = (self.stride, self.stride) if self.conv1_stride else (1, 1)
        s2 = (1, 1) if self.conv1_stride else (self.stride, self.stride)

        quant_act = _qact(cfg, f'{p}.quant_act', 'quant_act')
        if self.resize:
            xq, act_scale = quant_act(x, in_scale, update_stats=update_stats)
            identity, id_w_scale, id_acc = _qconvbn(
                cfg, f'{p}.quant_identity_convbn', 'quant_identity_convbn',
                self.out, (1, 1), (self.stride, self.stride), 'VALID')(
                    xq, act_scale, folded=folded, update_stats=update_stats)
            id_act_scale = act_scale
        else:
            identity = x
            id_act_scale = in_scale
            id_w_scale = None
            id_acc = None
            xq, act_scale = quant_act(x, in_scale, update_stats=update_stats)

        h, w_scale, acc = _qconvbn(cfg, f'{p}.quant_convbn1', 'quant_convbn1',
                                   self.mid, (1, 1), s1, 'VALID')(
                                       xq, act_scale, folded=folded,
                                       update_stats=update_stats)
        h = nn.relu(h)
        acc = None if acc is None else nn.relu(acc)
        h, a_scale = _qact(cfg, f'{p}.quant_act1', 'quant_act1')(
            h, act_scale, w_scale, x_int=acc, update_stats=update_stats)

        h, w_scale, acc = _qconvbn(cfg, f'{p}.quant_convbn2', 'quant_convbn2',
                                   self.mid, (3, 3), s2, ((1, 1), (1, 1)))(
                                       h, a_scale, folded=folded,
                                       update_stats=update_stats)
        h = nn.relu(h)
        acc = None if acc is None else nn.relu(acc)
        h, a_scale = _qact(cfg, f'{p}.quant_act2', 'quant_act2')(
            h, a_scale, w_scale, x_int=acc, update_stats=update_stats)

        h, w_scale, acc = _qconvbn(cfg, f'{p}.quant_convbn3', 'quant_convbn3',
                                   self.out, (1, 1), (1, 1), 'VALID')(
                                       h, a_scale, folded=folded,
                                       update_stats=update_stats)

        h = h + identity
        hq, out_scale = _qact(cfg, f'{p}.quant_act_int32', 'quant_act_int32')(
            h, a_scale, w_scale, identity, id_act_scale, id_w_scale,
            x_int=acc, identity_int=id_acc, update_stats=update_stats)
        return nn.relu(hq), out_scale


class QResBlock(nn.Module):
    """Basic (two-conv) unit (Q_ResBlockBn, q_resnet.py:263-316)."""
    cfg: BitConfig
    prefix: str
    out: int
    stride: int
    resize: bool

    @nn.compact
    def __call__(self, x, in_scale, *, folded: bool = True,
                 update_stats: bool = False):
        cfg, p = self.cfg, self.prefix

        quant_act = _qact(cfg, f'{p}.quant_act', 'quant_act')
        if self.resize:
            xq, act_scale = quant_act(x, in_scale, update_stats=update_stats)
            identity, id_w_scale, id_acc = _qconvbn(
                cfg, f'{p}.quant_identity_convbn', 'quant_identity_convbn',
                self.out, (1, 1), (self.stride, self.stride), 'VALID')(
                    xq, act_scale, folded=folded, update_stats=update_stats)
            id_act_scale = act_scale
        else:
            identity = x
            id_act_scale = in_scale
            id_w_scale = None
            id_acc = None
            xq, act_scale = quant_act(x, in_scale, update_stats=update_stats)

        h, w_scale, acc = _qconvbn(cfg, f'{p}.quant_convbn1', 'quant_convbn1',
                                   self.out, (3, 3),
                                   (self.stride, self.stride),
                                   ((1, 1), (1, 1)))(
                                       xq, act_scale, folded=folded,
                                       update_stats=update_stats)
        h = nn.relu(h)
        acc = None if acc is None else nn.relu(acc)
        h, a_scale = _qact(cfg, f'{p}.quant_act1', 'quant_act1')(
            h, act_scale, w_scale, x_int=acc, update_stats=update_stats)

        h, w_scale, acc = _qconvbn(cfg, f'{p}.quant_convbn2', 'quant_convbn2',
                                   self.out, (3, 3), (1, 1), ((1, 1), (1, 1)))(
                                       h, a_scale, folded=folded,
                                       update_stats=update_stats)

        h = h + identity
        hq, out_scale = _qact(cfg, f'{p}.quant_act_int32', 'quant_act_int32')(
            h, a_scale, w_scale, identity, id_act_scale, id_w_scale,
            x_int=acc, identity_int=id_acc, update_stats=update_stats)
        return nn.relu(hq), out_scale


class QResNet(nn.Module):
    """Quantized ResNet family (q_resnet.py:16-196)."""
    arch: str = 'resnet50'
    cfg: Optional[BitConfig] = None
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, *, folded: bool = True, update_stats: bool = False):
        from hawq_tpu.configs.bit_config import uniform_config
        cfg = self.cfg if self.cfg is not None else uniform_config(self.arch, 8)
        units = RESNET_UNITS[self.arch]
        bottleneck = RESNET_CONVS_PER_UNIT[self.arch] == 3
        mids, outs = _STAGE_CHANNELS[self.arch]
        conv1_stride = self.arch == 'resnet50'  # v1: stride on the 1×1

        x, act_scale = _qact(cfg, 'quant_input', 'quant_input')(
            x, update_stats=update_stats)

        init_feats = _INIT_FEATURES.get(self.arch, 64)
        init_key = ('quant_init_convbn' if bottleneck
                    else 'quant_init_block_convbn')
        cifar = self.arch in RESNET_CIFAR_ARCHS
        # CIFAR init: 3×3/s1/pad1, no maxpool (quantized_resnet_v1.py:334-348)
        init_k, init_s, init_p = (((3, 3), (1, 1), ((1, 1), (1, 1))) if cifar
                                  else ((7, 7), (2, 2), ((3, 3), (3, 3))))
        x, w_scale, acc = _qconvbn(cfg, init_key, init_key.replace('.', '_'),
                                   init_feats, init_k, init_s, init_p)(
                                       x, act_scale, folded=folded,
                                       update_stats=update_stats)
        if not cifar:
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
            # max-pool commutes with the (monotone) requant: pool the exact
            # integer accumulator alongside the value
            if acc is not None:
                acc = nn.max_pool(acc, (3, 3), strides=(2, 2),
                                  padding=((1, 1), (1, 1)))
        x, act_scale = _qact(cfg, 'quant_act_int32', 'quant_act_int32')(
            x, act_scale, w_scale, x_int=acc, update_stats=update_stats)
        x = nn.relu(x)

        in_ch = init_feats
        for s, n_units in enumerate(units, start=1):
            for u in range(1, n_units + 1):
                stride = 2 if (u == 1 and s > 1) else 1
                out_ch = outs[s - 1]
                resize = (u == 1) and (in_ch != out_ch or stride != 1)
                prefix = f'stage{s}.unit{u}'
                name = f'stage{s}_unit{u}'
                if bottleneck:
                    x, act_scale = QResUnit(
                        cfg=cfg, prefix=prefix, mid=mids[s - 1], out=out_ch,
                        stride=stride, resize=resize,
                        conv1_stride=conv1_stride, name=name)(
                            x, act_scale, folded=folded,
                            update_stats=update_stats)
                else:
                    x, act_scale = QResBlock(
                        cfg=cfg, prefix=prefix, out=out_ch, stride=stride,
                        resize=resize, name=name)(
                            x, act_scale, folded=folded,
                            update_stats=update_stats)
                in_ch = out_ch

        x, act_scale = L.quant_global_avg_pool(x, act_scale)
        x, act_scale = _qact(cfg, 'quant_act_output', 'quant_act_output')(
            x, update_stats=update_stats)
        x = L.QuantLinear(features=self.num_classes,
                          weight_bit=cfg.weight_bits('quant_output'),
                          bias_bit=cfg.settings.bias_bit,
                          per_channel=cfg.settings.per_channel,
                          name='quant_output')(x, act_scale)
        return x


class FloatResNet(nn.Module):
    """fp32 baseline with identical topology (for speedup benchmarks and as
    the float-weight donor for QAT init)."""
    arch: str = 'resnet50'
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        units = RESNET_UNITS[self.arch]
        bottleneck = RESNET_CONVS_PER_UNIT[self.arch] == 3
        mids, outs = _STAGE_CHANNELS[self.arch]
        conv1_stride = self.arch == 'resnet50'

        def convbn(h, feats, kernel, strides, padding, name):
            h = nn.Conv(feats, kernel, strides=strides, padding=padding,
                        use_bias=False, name=name + '_conv')(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-5, name=name + '_bn')(h)
            return h

        init_feats = _INIT_FEATURES.get(self.arch, 64)
        if self.arch in RESNET_CIFAR_ARCHS:
            x = nn.relu(convbn(x, init_feats, (3, 3), (1, 1),
                               ((1, 1), (1, 1)), 'init'))
        else:
            x = convbn(x, init_feats, (7, 7), (2, 2), ((3, 3), (3, 3)),
                       'init')
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))

        in_ch = init_feats
        for s, n_units in enumerate(units, start=1):
            for u in range(1, n_units + 1):
                stride = 2 if (u == 1 and s > 1) else 1
                out_ch = outs[s - 1]
                resize = (u == 1) and (in_ch != out_ch or stride != 1)
                name = f'stage{s}_unit{u}'
                identity = x
                if resize:
                    identity = convbn(x, out_ch, (1, 1), (stride, stride),
                                      'VALID', name + '_id')
                if bottleneck:
                    s1 = (stride, stride) if conv1_stride else (1, 1)
                    s2 = (1, 1) if conv1_stride else (stride, stride)
                    h = nn.relu(convbn(x, mids[s - 1], (1, 1), s1, 'VALID',
                                       name + '_c1'))
                    h = nn.relu(convbn(h, mids[s - 1], (3, 3), s2,
                                       ((1, 1), (1, 1)), name + '_c2'))
                    h = convbn(h, out_ch, (1, 1), (1, 1), 'VALID',
                               name + '_c3')
                else:
                    h = nn.relu(convbn(x, out_ch, (3, 3), (stride, stride),
                                       ((1, 1), (1, 1)), name + '_c1'))
                    h = convbn(h, out_ch, (3, 3), (1, 1), ((1, 1), (1, 1)),
                               name + '_c2')
                x = nn.relu(h + identity)
                in_ch = out_ch

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, name='output')(x)
        return x

"""Quantized pre-activation ResNet v2 (NHWC, flax.linen).

Topology parity target: the reference's v2 deployment graph
(/root/reference/tvm_benchmark/mixed_precision_models/quantized_resnet_v2.py
:6-345): per unit one explicit integer batch-norm on the residual stream
(qbn1 — it feeds both the shortcut and the conv path, so it cannot fold into
a conv) → relu → requant → conv1 (stride, with bias) → relu → requant →
conv2 (→ relu → requant → conv3 for bottlenecks); shortcut is the raw
residual stream, or requant → 1×1 strided conv when dims change; the unit
ends in the dual-dyadic requant-add.  Head: relu → integer global avg-pool
→ requant → linear.  Init block: conv0 7×7/s2 (+relu+maxpool), no BN
(quantized_resnet_v2.py:302-315).

The reference ships v2 only as a synthetic-weight latency graph (no training
side, float fc head); here the full QAT graph, freezer and integer engine
exist and are bit-exact against each other (tests/test_resnet_v2.py).

Config keys: quant_input, quant_init_conv, stage{S}.unit{U}.{quant_act,
quant_conv1..3, quant_act1..2, quant_identity_conv, quant_act_sc,
quant_act_int32}, quant_act_output, quant_output.
"""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from hawq_tpu.configs.bit_config import (BitConfig, RESNET_UNITS,
                                         RESNET_CONVS_PER_UNIT,
                                         uniform_config)
from hawq_tpu.models.resnet import _qact, _STAGE_CHANNELS, _INIT_FEATURES
from hawq_tpu.nn import layers as L

# v2 archs reuse the base arch unit tables under a 'v2' suffix
def base_arch(arch: str) -> str:
    assert arch.endswith('v2'), arch
    return arch[:-2]


def _qconv(cfg: BitConfig, key: str, name: str, features: int, kernel,
           strides, padding, use_bias: bool = True) -> L.QuantConv2d:
    return L.QuantConv2d(features=features, kernel_size=kernel,
                         strides=strides, padding=padding,
                         weight_bit=cfg.weight_bits(key),
                         bias_bit=cfg.settings.bias_bit,
                         per_channel=cfg.settings.per_channel,
                         use_bias=use_bias, name=name)


class QResUnitV2(nn.Module):
    """Pre-activation unit (residual_unit, quantized_resnet_v2.py:6-257)."""
    cfg: BitConfig
    prefix: str
    in_ch: int
    mid: int
    out: int
    stride: int
    bottleneck: bool

    @nn.compact
    def __call__(self, x, in_scale, *, x_int=None, folded: bool = True,
                 update_stats: bool = False):
        cfg, p = self.cfg, self.prefix
        resize = (self.in_ch != self.out) or (self.stride != 1)

        # qbn1 + relu + requant to the unit's activation bits
        pre, a_sf = L.QuantBnAct(
            features=self.in_ch, bits=cfg.act_bits(f'{p}.quant_act'),
            quant_mode=cfg.act_mode(f'{p}.quant_act'),
            momentum=cfg.settings.act_range_momentum, relu=True,
            name='quant_bn')(x, in_scale, x_int=x_int, folded=folded,
                             update_stats=update_stats)

        if resize:
            # shortcut: 1×1 strided conv on the *pre-activated* input
            identity, id_w_scale, id_acc = _qconv(
                cfg, f'{p}.quant_identity_conv', 'quant_identity_conv',
                self.out, (1, 1), (self.stride, self.stride), 'VALID',
                use_bias=False)(pre, a_sf)
            id_scale = a_sf
        else:
            identity = x
            id_scale = in_scale
            id_w_scale = None
            id_acc = x_int

        s1 = (self.stride, self.stride)
        h, w_scale, acc = _qconv(cfg, f'{p}.quant_conv1', 'quant_conv1',
                                 self.mid, (1, 1) if self.bottleneck
                                 else (3, 3), s1,
                                 'VALID' if self.bottleneck
                                 else ((1, 1), (1, 1)))(pre, a_sf)
        h = nn.relu(h)
        acc = None if acc is None else nn.relu(acc)
        h, a1 = _qact(cfg, f'{p}.quant_act1', 'quant_act1')(
            h, a_sf, w_scale, x_int=acc, update_stats=update_stats)

        h, w_scale, acc = _qconv(cfg, f'{p}.quant_conv2', 'quant_conv2',
                                 self.mid if self.bottleneck else self.out,
                                 (3, 3), (1, 1), ((1, 1), (1, 1)))(h, a1)
        if self.bottleneck:
            h = nn.relu(h)
            acc = None if acc is None else nn.relu(acc)
            h, a2 = _qact(cfg, f'{p}.quant_act2', 'quant_act2')(
                h, a1, w_scale, x_int=acc, update_stats=update_stats)
            h, w_scale, acc = _qconv(cfg, f'{p}.quant_conv3', 'quant_conv3',
                                     self.out, (1, 1), (1, 1), 'VALID')(h, a2)
            a_last = a2
        else:
            a_last = a1

        # dual-scale residual requant-add (qnn.add, quantized_resnet_v2.py
        # :154-162) — no trailing relu in pre-activation nets
        h_sum = h + identity
        hq, out_scale = _qact(cfg, f'{p}.quant_act_int32', 'quant_act_int32')(
            h_sum, a_last, w_scale, identity, id_scale, id_w_scale,
            x_int=acc, identity_int=id_acc, update_stats=update_stats)
        return hq, out_scale


class QResNetV2(nn.Module):
    """Pre-activation quantized ResNet (qnn_resnet, quantized_resnet_v2.py
    :255-345)."""
    arch: str = 'resnet50v2'
    cfg: Optional[BitConfig] = None
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, *, folded: bool = True, update_stats: bool = False):
        base = base_arch(self.arch)
        cfg = self.cfg if self.cfg is not None else uniform_config(base, 8)
        units = RESNET_UNITS[base]
        bottleneck = RESNET_CONVS_PER_UNIT[base] == 3
        mids, outs = _STAGE_CHANNELS[base]

        x, act_scale = _qact(cfg, 'quant_input', 'quant_input')(
            x, update_stats=update_stats)

        init_feats = _INIT_FEATURES.get(base, 64)
        x, w_scale, acc = _qconv(cfg, 'quant_init_conv', 'quant_init_conv',
                                 init_feats, (7, 7), (2, 2),
                                 ((3, 3), (3, 3)))(x, act_scale)
        x = nn.relu(x)
        acc = None if acc is None else nn.relu(acc)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if acc is not None:
            acc = nn.max_pool(acc, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))
        # carry the conv0 accumulator at 16-bit precision into unit 1's BN
        x, act_scale = _qact(cfg, 'quant_act_int32', 'quant_act_int32')(
            x, act_scale, w_scale, x_int=acc, update_stats=update_stats)
        x_int = None

        in_ch = init_feats
        for s, n_units in enumerate(units, start=1):
            for u in range(1, n_units + 1):
                stride = 2 if (u == 1 and s > 1) else 1
                out_ch = outs[s - 1]
                x, act_scale = QResUnitV2(
                    cfg=cfg, prefix=f'stage{s}.unit{u}', in_ch=in_ch,
                    mid=(mids[s - 1] if bottleneck else out_ch), out=out_ch,
                    stride=stride, bottleneck=bottleneck,
                    name=f'stage{s}_unit{u}')(
                        x, act_scale, x_int=x_int, folded=folded,
                        update_stats=update_stats)
                x_int = None
                in_ch = out_ch

        x = nn.relu(x)
        x, act_scale = L.quant_global_avg_pool(x, act_scale)
        x, act_scale = _qact(cfg, 'quant_act_output', 'quant_act_output')(
            x, update_stats=update_stats)
        x = L.QuantLinear(features=self.num_classes,
                          weight_bit=cfg.weight_bits('quant_output'),
                          bias_bit=cfg.settings.bias_bit,
                          per_channel=cfg.settings.per_channel,
                          name='quant_output')(x, act_scale)
        return x

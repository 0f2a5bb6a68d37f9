"""Quantized InceptionV3 (NHWC, flax.linen).

Parity target: Q_InceptionV3 (/root/reference/utils/models/q_inceptionv3.py).
The distinctive machinery is multi-branch concatenation requantization: each
branch carries its own activation scale; the concatenated tensor is
requantized per channel slice to one shared scale by the unit's rescaling
QuantAct (q_inceptionv3.py:84-120 Q_Concurrent + quant_modules.py:275-286),
which here is the ``branch_scales``/``branch_channels`` case of
hawq_tpu.nn.layers.QuantAct (channel-last slices).

Config keys mirror the reference bit_config naming exactly
('features.stage1.unit1.branches.branch2.q_conv_list.q_conv1.q_convbn', …)
so the published inceptionv3 uniform4/8 tables apply unchanged.

Input 299×299; init block of 5 convs + 2 maxpools; stages of A/B/C inception
units with Reduction-A/B between; 8×8 integer avg-pool head + linear
classifier.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from hawq_tpu.configs.bit_config import BitConfig
from hawq_tpu.nn import layers as L
from hawq_tpu.models.resnet import _qact, _qconvbn

INCEPTION_CHANNELS = ((256, 288, 288), (768, 768, 768, 768, 768),
                      (1280, 2048, 2048))
INCEPTION_B_MID = (128, 160, 160, 192)
INCEPTION_INIT_CH = 192


def _cdiv(c: int, w: int) -> int:
    return max(c // w, 4)


def _pad(p) -> tuple:
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


def _ksize(k) -> Tuple[int, int]:
    return (k, k) if isinstance(k, int) else tuple(k)


class _InceptConv(nn.Module):
    """conv+bn → relu → requant (Q_InceptConv, q_inceptionv3.py:16-57)."""
    cfg: BitConfig
    prefix: str
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, a_sf, *, folded=True, update_stats=False):
        h, w_sf, acc = _qconvbn(self.cfg, f'{self.prefix}.q_convbn',
                                'q_convbn', self.features,
                                _ksize(self.kernel),
                                (self.stride, self.stride),
                                _pad(self.padding))(
                                    x, a_sf, folded=folded,
                                    update_stats=update_stats)
        h = nn.relu(h)
        acc = None if acc is None else nn.relu(acc)
        return _qact(self.cfg, f'{self.prefix}.q_activ', 'q_activ')(
            h, a_sf, w_sf, x_int=acc, update_stats=update_stats)


class _ConvSeqBranch(nn.Module):
    """input requant + chain of _InceptConv (q_inceptionv3.py:209-257)."""
    cfg: BitConfig
    prefix: str
    out_channels: Sequence[int]
    kernels: Sequence
    strides: Sequence[int]
    paddings: Sequence

    @nn.compact
    def __call__(self, x, in_sf, *, folded=True, update_stats=False):
        h, a_sf = _qact(self.cfg, f'{self.prefix}.q_input_act',
                        'q_input_act')(x, in_sf, update_stats=update_stats)
        for i, (c, k, s, p) in enumerate(zip(self.out_channels, self.kernels,
                                             self.strides, self.paddings),
                                         start=1):
            h, a_sf = _InceptConv(cfg=self.cfg,
                                  prefix=f'{self.prefix}.q_conv_list.q_conv{i}',
                                  features=c, kernel=k, stride=s, padding=p,
                                  name=f'q_conv{i}')(
                                      h, a_sf, folded=folded,
                                      update_stats=update_stats)
        return h, a_sf


class _Conv1x1Branch(nn.Module):
    cfg: BitConfig
    prefix: str
    features: int

    @nn.compact
    def __call__(self, x, in_sf, *, folded=True, update_stats=False):
        h, a_sf = _qact(self.cfg, f'{self.prefix}.q_input_act',
                        'q_input_act')(x, in_sf, update_stats=update_stats)
        return _InceptConv(cfg=self.cfg, prefix=f'{self.prefix}.q_conv',
                           features=self.features, kernel=1, name='q_conv')(
                               h, a_sf, folded=folded,
                               update_stats=update_stats)


class _MaxPoolBranch(nn.Module):
    cfg: BitConfig
    prefix: str

    @nn.compact
    def __call__(self, x, in_sf, *, folded=True, update_stats=False):
        h, a_sf = _qact(self.cfg, f'{self.prefix}.q_input_act',
                        'q_input_act')(x, in_sf, update_stats=update_stats)
        h, a_sf = L.quant_max_pool(h, a_sf, (3, 3), (2, 2), 'VALID')
        return h, a_sf


class _AvgPoolBranch(nn.Module):
    """3×3 integer avg pool + 1×1 conv (q_inceptionv3.py:141-176)."""
    cfg: BitConfig
    prefix: str
    features: int

    @nn.compact
    def __call__(self, x, in_sf, *, folded=True, update_stats=False):
        h, a_sf = _qact(self.cfg, f'{self.prefix}.q_input_act',
                        'q_input_act')(x, in_sf, update_stats=update_stats)
        h, a_sf = L.quant_avg_pool(h, a_sf, (3, 3), (1, 1), ((1, 1), (1, 1)))
        h, a_sf = _qact(self.cfg, f'{self.prefix}.q_pool_act', 'q_pool_act')(
            h, a_sf, update_stats=update_stats)
        return _InceptConv(cfg=self.cfg, prefix=f'{self.prefix}.q_conv',
                           features=self.features, kernel=1, name='q_conv')(
                               h, a_sf, folded=folded,
                               update_stats=update_stats)


class _ConvSeq3x3Branch(nn.Module):
    """conv chain then parallel 1×3 / 3×1 convs concatenated with per-branch
    requant (q_inceptionv3.py:260-324)."""
    cfg: BitConfig
    prefix: str
    out_channels: Sequence[int]
    kernels: Sequence
    strides: Sequence[int]
    paddings: Sequence

    @nn.compact
    def __call__(self, x, in_sf, *, folded=True, update_stats=False):
        h, a_sf = _qact(self.cfg, f'{self.prefix}.q_input_act',
                        'q_input_act')(x, in_sf, update_stats=update_stats)
        for i, (c, k, s, p) in enumerate(zip(self.out_channels, self.kernels,
                                             self.strides, self.paddings),
                                         start=1):
            h, a_sf = _InceptConv(cfg=self.cfg,
                                  prefix=f'{self.prefix}.q_conv_list.q_conv{i}',
                                  features=c, kernel=k, stride=s, padding=p,
                                  name=f'q_conv{i}')(
                                      h, a_sf, folded=folded,
                                      update_stats=update_stats)
        ch = h.shape[-1]
        y1, sf1 = _InceptConv(cfg=self.cfg, prefix=f'{self.prefix}.q_conv1x3',
                              features=ch, kernel=(1, 3), padding=(0, 1),
                              name='q_conv1x3')(
                                  h, a_sf, folded=folded,
                                  update_stats=update_stats)
        y2, sf2 = _InceptConv(cfg=self.cfg, prefix=f'{self.prefix}.q_conv3x1',
                              features=ch, kernel=(3, 1), padding=(1, 0),
                              name='q_conv3x1')(
                                  h, a_sf, folded=folded,
                                  update_stats=update_stats)
        cat = jnp.concatenate([y1, y2], axis=-1)
        return _qact(self.cfg, f'{self.prefix}.q_rescaling_activ',
                     'q_rescaling_activ')(
            cat, branch_scales=[sf1, sf2],
            branch_channels=[y1.shape[-1], y2.shape[-1]],
            pre_act_scale=sf1, update_stats=update_stats)


class _InceptionUnit(nn.Module):
    """Generic concat unit: run branches, concatenate, rescale
    (Q_Concurrent + q_rescaling_activ)."""
    cfg: BitConfig
    prefix: str
    branch_defs: Tuple       # tuple of (name, module_ctor_args) built below

    @nn.compact
    def __call__(self, x, in_sf, *, folded=True, update_stats=False):
        outs, sfs, chans = [], [], []
        for name, ctor, kwargs in self.branch_defs:
            mod = ctor(cfg=self.cfg,
                       prefix=f'{self.prefix}.branches.{name}',
                       name=name, **kwargs)
            y, sf = mod(x, in_sf, folded=folded, update_stats=update_stats)
            outs.append(y)
            sfs.append(sf)
            chans.append(y.shape[-1])
        cat = jnp.concatenate(outs, axis=-1)
        return _qact(self.cfg, f'{self.prefix}.q_rescaling_activ',
                     'q_rescaling_activ')(
            cat, branch_scales=sfs, branch_channels=chans,
            pre_act_scale=sfs[0], update_stats=update_stats)


def _unit_a(cfg, prefix, out_channels, name, w=1):
    pool_ch = _cdiv(out_channels - 224, w) if w > 1 else out_channels - 224
    d = lambda c: _cdiv(c, w)
    return _InceptionUnit(cfg=cfg, prefix=prefix, name=name, branch_defs=(
        ('branch1', _Conv1x1Branch, dict(features=d(64))),
        ('branch2', _ConvSeqBranch, dict(out_channels=(d(48), d(64)),
                                         kernels=(1, 5), strides=(1, 1),
                                         paddings=(0, 2))),
        ('branch3', _ConvSeqBranch, dict(out_channels=(d(64), d(96), d(96)),
                                         kernels=(1, 3, 3),
                                         strides=(1, 1, 1),
                                         paddings=(0, 1, 1))),
        ('branch4', _AvgPoolBranch, dict(features=pool_ch)),
    ))


def _unit_reduction_a(cfg, prefix, name, w=1):
    d = lambda c: _cdiv(c, w)
    return _InceptionUnit(cfg=cfg, prefix=prefix, name=name, branch_defs=(
        ('branch1', _ConvSeqBranch, dict(out_channels=(d(384),), kernels=(3,),
                                         strides=(2,), paddings=(0,))),
        ('branch2', _ConvSeqBranch, dict(out_channels=(d(64), d(96), d(96)),
                                         kernels=(1, 3, 3),
                                         strides=(1, 1, 2),
                                         paddings=(0, 1, 0))),
        ('branch3', _MaxPoolBranch, dict()),
    ))


def _unit_b(cfg, prefix, mid, name, w=1):
    d = lambda c: _cdiv(c, w)
    mid = d(mid)
    return _InceptionUnit(cfg=cfg, prefix=prefix, name=name, branch_defs=(
        ('branch1', _Conv1x1Branch, dict(features=d(192))),
        ('branch2', _ConvSeqBranch, dict(out_channels=(mid, mid, d(192)),
                                         kernels=(1, (1, 7), (7, 1)),
                                         strides=(1, 1, 1),
                                         paddings=(0, (0, 3), (3, 0)))),
        ('branch3', _ConvSeqBranch, dict(
            out_channels=(mid, mid, mid, mid, d(192)),
            kernels=(1, (7, 1), (1, 7), (7, 1), (1, 7)),
            strides=(1, 1, 1, 1, 1),
            paddings=(0, (3, 0), (0, 3), (3, 0), (0, 3)))),
        ('branch4', _AvgPoolBranch, dict(features=d(192))),
    ))


def _unit_reduction_b(cfg, prefix, name, w=1):
    d = lambda c: _cdiv(c, w)
    return _InceptionUnit(cfg=cfg, prefix=prefix, name=name, branch_defs=(
        ('branch1', _ConvSeqBranch, dict(out_channels=(d(192), d(320)),
                                         kernels=(1, 3), strides=(1, 2),
                                         paddings=(0, 0))),
        ('branch2', _ConvSeqBranch, dict(
            out_channels=(d(192), d(192), d(192), d(192)),
            kernels=(1, (1, 7), (7, 1), 3),
            strides=(1, 1, 1, 2),
            paddings=(0, (0, 3), (3, 0), 0))),
        ('branch3', _MaxPoolBranch, dict()),
    ))


def _unit_c(cfg, prefix, name, w=1):
    d = lambda c: _cdiv(c, w)
    return _InceptionUnit(cfg=cfg, prefix=prefix, name=name, branch_defs=(
        ('branch1', _Conv1x1Branch, dict(features=d(320))),
        ('branch2', _ConvSeq3x3Branch, dict(out_channels=(d(384),),
                                            kernels=(1,), strides=(1,),
                                            paddings=(0,))),
        ('branch3', _ConvSeq3x3Branch, dict(out_channels=(d(448), d(384)),
                                            kernels=(1, 3), strides=(1, 1),
                                            paddings=(0, 1))),
        ('branch4', _AvgPoolBranch, dict(features=d(192))),
    ))


def build_unit(cfg, i, j, out_ch, b_mid_idx, name=None, width_div=1):
    """Construct the unit module for stage i, unit j — shared by the model,
    the freezer, and the engine so graph structure stays in one place."""
    prefix = f'features.stage{i}.unit{j}'
    name = name or f'stage{i}_unit{j}'
    if j == 1 and i != 1:
        return (_unit_reduction_a(cfg, prefix, name, width_div) if i == 2
                else _unit_reduction_b(cfg, prefix, name, width_div))
    if i == 1:
        return _unit_a(cfg, prefix, out_ch, name, width_div)
    if i == 2:
        return _unit_b(cfg, prefix, INCEPTION_B_MID[b_mid_idx], name,
                       width_div)
    return _unit_c(cfg, prefix, name, width_div)


class QInceptionV3(nn.Module):
    """Quantized InceptionV3 (q_inceptionv3.py:652-786), 299×299 input.

    ``width_div`` scales all channel counts down (same wiring) for the
    CPU-budget test variant."""
    cfg: Optional[BitConfig] = None
    num_classes: int = 1000
    width_div: int = 1
    dropout_rate: float = 0.5       # reference head default (q_inceptionv3.py:681)

    @nn.compact
    def __call__(self, x, *, folded: bool = True, update_stats: bool = False):
        cfg = self.cfg if self.cfg is not None else \
            BitConfig(name='inceptionv3_uniform8', table={})
        ip = 'features.q_init_block'

        x, a_sf = _qact(cfg, f'{ip}.q_input_activ', 'q_input_activ')(
            x, update_stats=update_stats)
        init_chs = tuple(_cdiv(c, self.width_div) if self.width_div > 1
                         else c for c in (32, 32, 64, 80, 192))
        for i, (c, k, s, p) in enumerate(
                zip(init_chs, (3, 3, 3, 1, 3),
                    (2, 1, 1, 1, 1), (0, 0, 1, 0, 0)), start=1):
            x, a_sf = _InceptConv(cfg=cfg, prefix=f'{ip}.q_conv{i}',
                                  features=c, kernel=k, stride=s, padding=p,
                                  name=f'q_conv{i}')(
                                      x, a_sf, folded=folded,
                                      update_stats=update_stats)
            if i in (3, 5):
                x, a_sf = L.quant_max_pool(x, a_sf, (3, 3), (2, 2), 'VALID')

        for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
            b_idx = 0
            for j, out_ch in enumerate(stage, start=1):
                unit = build_unit(cfg, i, j, out_ch, b_idx,
                                  width_div=self.width_div)
                if i == 2 and not (j == 1 and i != 1):
                    b_idx += 1
                x, a_sf = unit(x, a_sf, folded=folded,
                               update_stats=update_stats)

        x, a_sf = L.quant_avg_pool(x, a_sf, (x.shape[1], x.shape[2]))
        x, a_sf = _qact(cfg, 'features.q_concat_activ', 'q_concat_activ')(
            x, a_sf, update_stats=update_stats)
        x = x.reshape(x.shape[0], -1)
        # head dropout (q_inceptionv3.py:727): scale passthrough, active only
        # when the caller supplies a 'dropout' rng (the QAT train step)
        x, a_sf = L.QuantDropout(rate=self.dropout_rate,
                                 name='q_dropout')(x, a_sf)
        x = L.QuantLinear(features=self.num_classes,
                          weight_bit=cfg.weight_bits('output.q_fc'),
                          bias_bit=cfg.settings.bias_bit,
                          per_channel=cfg.settings.per_channel,
                          name='q_fc')(x, a_sf)
        return x


class FloatInceptionV3(nn.Module):
    """fp32 baseline with identical topology (speedup denominator for the
    family benchmarks; mirrors the quantized builders' channel tables so
    MAC counts match exactly)."""
    num_classes: int = 1000
    width_div: int = 1
    # folded_input: the float twin of the engines' 'folded_float32' input
    # mode — the host pre-folds 4×4 pixel blocks (inference/fold.py
    # fold4_images_3x3s2(x, 0)) and init_c1 runs as its 2×2/stride-1
    # rewrite + depth-to-space.  Keeps the fp32 speedup denominator
    # symmetric with the integer rows' input handling (same host fold,
    # same on-device geometry).
    folded_input: bool = False
    input_hw: Tuple[int, int] = (299, 299)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        d = lambda c: _cdiv(c, self.width_div) if self.width_div > 1 else c

        def convbn(h, feats, kernel, stride, padding, name):
            h = nn.Conv(feats, _ksize(kernel), strides=(stride, stride),
                        padding=_pad(padding), use_bias=False,
                        name=name + '_conv')(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-5, name=name + '_bn')(h)
            return nn.relu(h)

        def conv_seq(h, prefix, out_channels, kernels, strides, paddings):
            for i, (c, k, s, p) in enumerate(zip(out_channels, kernels,
                                                 strides, paddings), start=1):
                h = convbn(h, c, k, s, p, f'{prefix}_c{i}')
            return h

        def avg_branch(h, prefix, feats):
            h = nn.avg_pool(h, (3, 3), strides=(1, 1),
                            padding=((1, 1), (1, 1)))
            return convbn(h, feats, 1, 1, 0, prefix)

        # init block: 5 convs + 2 maxpools (q_inceptionv3.py:652-700)
        for i, (c, k, s, p) in enumerate(
                zip((32, 32, 64, 80, 192), (3, 3, 3, 1, 3),
                    (2, 1, 1, 1, 1), (0, 0, 1, 0, 0)), start=1):
            if i == 1 and self.folded_input:
                from hawq_tpu.inference.fold import (fold4_3x3s2_geometry,
                                                     depth_to_space_2x2)
                oh = fold4_3x3s2_geometry(self.input_hw[0], 0)[0]
                ow = fold4_3x3s2_geometry(self.input_hw[1], 0)[0]
                # 2×2/s1 conv over the folded (…, 48) grid, 4 stride-2
                # origins in channels, then depth-to-space + tail slice
                x = convbn(x, 4 * d(c), 2, 1, 0, f'init_c{i}')
                x = depth_to_space_2x2(x)[:, :oh, :ow, :]
            else:
                x = convbn(x, d(c), k, s, p, f'init_c{i}')
            if i in (3, 5):
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')

        b_idx = 0
        for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
            for j, out_ch in enumerate(stage, start=1):
                pre = f's{i}u{j}'
                if j == 1 and i == 2:        # Reduction-A
                    x = jnp.concatenate([
                        conv_seq(x, pre + 'b1', (d(384),), (3,), (2,), (0,)),
                        conv_seq(x, pre + 'b2', (d(64), d(96), d(96)),
                                 (1, 3, 3), (1, 1, 2), (0, 1, 0)),
                        nn.max_pool(x, (3, 3), strides=(2, 2),
                                    padding='VALID')], axis=-1)
                elif j == 1 and i == 3:      # Reduction-B
                    x = jnp.concatenate([
                        conv_seq(x, pre + 'b1', (d(192), d(320)), (1, 3),
                                 (1, 2), (0, 0)),
                        conv_seq(x, pre + 'b2',
                                 (d(192), d(192), d(192), d(192)),
                                 (1, (1, 7), (7, 1), 3), (1, 1, 1, 2),
                                 (0, (0, 3), (3, 0), 0)),
                        nn.max_pool(x, (3, 3), strides=(2, 2),
                                    padding='VALID')], axis=-1)
                elif i == 1:                 # unit A
                    x = jnp.concatenate([
                        convbn(x, d(64), 1, 1, 0, pre + 'b1'),
                        conv_seq(x, pre + 'b2', (d(48), d(64)), (1, 5),
                                 (1, 1), (0, 2)),
                        conv_seq(x, pre + 'b3', (d(64), d(96), d(96)),
                                 (1, 3, 3), (1, 1, 1), (0, 1, 1)),
                        avg_branch(x, pre + 'b4', d(out_ch - 224)),
                    ], axis=-1)
                elif i == 2:                 # unit B
                    mid = d(INCEPTION_B_MID[b_idx])
                    b_idx += 1
                    x = jnp.concatenate([
                        convbn(x, d(192), 1, 1, 0, pre + 'b1'),
                        conv_seq(x, pre + 'b2', (mid, mid, d(192)),
                                 (1, (1, 7), (7, 1)), (1, 1, 1),
                                 (0, (0, 3), (3, 0))),
                        conv_seq(x, pre + 'b3', (mid, mid, mid, mid, d(192)),
                                 (1, (7, 1), (1, 7), (7, 1), (1, 7)),
                                 (1, 1, 1, 1, 1),
                                 (0, (3, 0), (0, 3), (3, 0), (0, 3))),
                        avg_branch(x, pre + 'b4', d(192))], axis=-1)
                else:                        # unit C
                    h2 = convbn(x, d(384), 1, 1, 0, pre + 'b2c1')
                    b2 = jnp.concatenate([
                        convbn(h2, h2.shape[-1], (1, 3), 1, (0, 1),
                               pre + 'b2h'),
                        convbn(h2, h2.shape[-1], (3, 1), 1, (1, 0),
                               pre + 'b2v')], axis=-1)
                    h3 = conv_seq(x, pre + 'b3', (d(448), d(384)), (1, 3),
                                  (1, 1), (0, 1))
                    b3 = jnp.concatenate([
                        convbn(h3, h3.shape[-1], (1, 3), 1, (0, 1),
                               pre + 'b3h'),
                        convbn(h3, h3.shape[-1], (3, 1), 1, (1, 0),
                               pre + 'b3v')], axis=-1)
                    x = jnp.concatenate([
                        convbn(x, d(320), 1, 1, 0, pre + 'b1'), b2, b3,
                        avg_branch(x, pre + 'b4', d(192))], axis=-1)

        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, name='output')(x)
        return x

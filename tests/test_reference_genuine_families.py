"""Zero-tolerance genuine-reference chains for MobileNetV2 and InceptionV3.

Round-4 anchored the resnet family bit-identically through the full
artifact chain (genuine modules → five-slice ``quantized_checkpoint.pth.tar``
→ importer → ``requant_mode='reference'`` engine); the mnv2/inception
anchors ran model-vs-model with a flip tolerance.  This module closes that
gap: the SAME chain, built from the genuine ``Q_MobileNetV2`` /
``Q_InceptionV3`` classes (/root/reference/utils/models/), replayed by the
family engines in reference mode — **bit-identical** integers and logits.

MobileNetV2 checkpoint-format note: the reference's own dump recipe
(quant_train.py:665-670) loses the QuantConv2d output head — its
``conv_scaling_factor`` buffer (quant_modules.py:661) is not collected, and
its ``bias_integer`` is assigned in forward without being registered
(quant_modules.py:719-720), so it never reaches state_dict.  The test dumps
with the extended filter (sixth slice + a pre-registered head-bias buffer);
``import_reference_quantized`` accepts it and documents the omission
(utils/checkpoint.py _REF_CONV_SLICE).
"""

import importlib
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.utils import checkpoint as ckpt

torch = pytest.importorskip('torch')

# reuses the package-shim import of /root/reference (+ .cuda() no-op patch)
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import test_reference_genuine as trg      # noqa: E402

QM = trg.QM


def _apply_family_bit_config(model, cfg):
    """quant_train.py:264-301 attr surgery for a (possibly tiny) family
    model: every module whose name appears in the published table gets the
    table's bits; tiny variants hit a subset of the table."""
    n_hit = 0
    for name, m in model.named_modules():
        if name not in cfg.table:
            continue
        n_hit += 1
        if isinstance(m, QM.QuantAct):
            bits = cfg.act_bits(name)
            m.activation_bit = bits
            m.quant_mode = 'asymmetric' if bits == 4 else 'symmetric'
        else:
            m.quant_mode = 'symmetric'
            m.weight_bit = cfg.weight_bits(name)
            m.per_channel = cfg.settings.per_channel
            m.bias_bit = cfg.settings.bias_bit
            m.quantize_bias = True
    assert n_hit > 0, 'surgery hit nothing — key naming drifted'


def _dump_six_slices(model, path):
    """The reference's validate() dump (quant_train.py:665-670 substring
    filters, DDP 'module.' prefix) extended with the 'conv_scaling_factor'
    slice the recipe omits."""
    sd = model.state_dict()
    state = {
        s: {'module.' + k: v.clone() for k, v in sd.items() if s in k}
        for s in ('convbn_scaling_factor', 'fc_scaling_factor',
                  'weight_integer', 'bias_integer', 'act_scaling_factor',
                  'conv_scaling_factor')
    }
    torch.save(state, path)
    return state


# ---------------------------------------------------------------------------
# MobileNetV2
# ---------------------------------------------------------------------------

def _genuine_tiny_mnv2(seed):
    """Genuine Q_MobileNetV2 (q_mobilenetv2.py:93-211) at tiny channel lists:
    init → [8] → [12, 12] (residual + strided + non-expansion units) →
    final 1×1 → avg pool → QuantConv2d head."""
    trg._import_reference()
    QMn = importlib.import_module('refutils.models.q_mobilenetv2')
    rng = np.random.RandomState(seed)
    stages, init_ch, final_ch, ncls = ([8], [12, 12]), 8, 32, 10

    def cb(ci, co, k, s, p, groups=1):
        conv = torch.nn.Conv2d(ci, co, k, s, p, groups=groups, bias=False)
        bn = torch.nn.BatchNorm2d(co)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(
                (rng.randn(*conv.weight.shape) * 0.3).astype(np.float32)))
            bn.weight.copy_(torch.from_numpy(
                (0.5 + rng.rand(co)).astype(np.float32)))
            bn.bias.copy_(torch.from_numpy(
                (rng.randn(co) * 0.1).astype(np.float32)))
        return types.SimpleNamespace(conv=conv, bn=bn)

    def funit(ci, co, stride, expansion):
        mid = ci * 6 if expansion else ci
        return types.SimpleNamespace(conv1=cb(ci, mid, 1, 1, 0),
                                     conv2=cb(mid, mid, 3, stride, 1,
                                              groups=mid),
                                     conv3=cb(mid, co, 1, 1, 0))

    out_head = torch.nn.Conv2d(final_ch, ncls, 1, bias=True)
    with torch.no_grad():
        out_head.weight.copy_(torch.from_numpy(
            (rng.randn(ncls, final_ch, 1, 1) * 0.2).astype(np.float32)))
        out_head.bias.copy_(torch.from_numpy(
            (rng.randn(ncls) * 0.05).astype(np.float32)))
    fmodel = types.SimpleNamespace(
        features=types.SimpleNamespace(
            init_block=cb(3, init_ch, 3, 2, 1),
            stage1=types.SimpleNamespace(unit1=funit(init_ch, 8, 1, False)),
            stage2=types.SimpleNamespace(unit1=funit(8, 12, 2, True),
                                         unit2=funit(12, 12, 1, True)),
            final_block=cb(12, final_ch, 1, 1, 0),
            final_pool=torch.nn.AvgPool2d(kernel_size=8)),
        output=out_head)
    gm = QMn.Q_MobileNetV2(fmodel, channels=[[8], [12, 12]],
                           init_block_channels=init_ch,
                           final_block_channels=final_ch,
                           remove_exp_conv=False, num_classes=ncls)
    return gm, stages, ncls


@pytest.mark.slow
@pytest.mark.parametrize('scheme', ['uniform8', 'uniform4'])
def test_genuine_mnv2_chain_bit_identical(scheme, tmp_path):
    """Genuine Q_MobileNetV2 → extended six-slice checkpoint → importer →
    requant_mode='reference' engine: bit-identical per-unit integers and
    bit-identical float logits."""
    from hawq_tpu.inference.engine_mobilenet import (build_mobilenetv2_engine,
                                                     stages_from_frozen)
    torch.manual_seed(0)
    gm, stages, ncls = _genuine_tiny_mnv2(seed=18)
    cfg = get_bit_config('mobilenetv2', scheme)
    _apply_family_bit_config(gm, cfg)

    # register the head bias buffer BEFORE any forward so the forward's
    # assignment lands in state_dict (see module docstring)
    gm.output.register_buffer('bias_integer',
                              torch.zeros(ncls, dtype=torch.float32))

    rng = np.random.RandomState(7)
    cal = torch.from_numpy(
        (rng.rand(4, 3, 32, 32).astype(np.float32)) * 2.0 - 1.0)
    with torch.no_grad():
        for i in range(cal.shape[0]):
            gm(cal[i:i + 1] * (1.0 + 0.1 * i))
    QM.freeze_model(gm)
    with torch.no_grad():
        gm(cal[:1])

    path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    _dump_six_slices(gm, path)
    fm = ckpt.load_reference_quantized(path, 'mobilenetv2', cfg)
    assert fm.num_classes == ncls
    stages_rt = stages_from_frozen(fm)
    assert stages_rt == ((8,), (12, 12)), stages_rt

    # frozen torch forward with per-unit integer captures
    test_nchw = torch.from_numpy(
        (rng.rand(2, 3, 32, 32).astype(np.float32)) * 2.0 - 1.0)
    grabbed = {}

    def hook(name):
        def fn(_m, _inp, outp):
            val, scale = outp
            grabbed[name] = torch.round(val / scale.view(-1)
                                        ).detach().numpy()
        return fn

    units = ['features.stage1.unit1', 'features.stage2.unit1',
             'features.stage2.unit2']
    handles = [gm.get_submodule(u).register_forward_hook(hook(u))
               for u in units]
    handles.append(
        gm.quant_act_output.register_forward_hook(hook('fc_input')))
    with torch.no_grad():
        t_logits = gm(test_nchw).numpy()
    for h in handles:
        h.remove()

    images = jnp.asarray(np.transpose(test_nchw.numpy(), (0, 2, 3, 1)))
    with jax.enable_x64():
        for u in units + ['fc_input']:
            node = u if u == 'fc_input' else f'{u}.quant_act_int32'
            eng = build_mobilenetv2_engine(fm, stages_rt, capture=node,
                                           requant_mode='reference')
            got = np.asarray(eng(images)).astype(np.int64)
            want = grabbed[u].astype(np.int64)
            if want.ndim == 4:
                want = np.transpose(want, (0, 2, 3, 1))
            got = got.reshape(want.shape)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f'{scheme}:{u}')
        eng = build_mobilenetv2_engine(fm, stages_rt,
                                       requant_mode='reference')
        j_logits = np.asarray(eng(images))
    # The head itself is compared in the integer domain: the genuine
    # QuantConv2d recovers x_int by an UNROUNDED float division
    # (quant_modules.py:727 ``x_int = x / pre_act_scaling_factor``), so its
    # float conv accumulates ~1-ulp recovery noise the pure-integer head
    # doesn't have — not integer-observable (< 3e-7 relative on logits).
    out_scale_vec = (fm['output.weight_scale']
                     * np.float32(fm.act_scale('quant_act_output')))
    np.testing.assert_array_equal(
        np.round(j_logits / out_scale_vec.reshape(1, -1)),
        np.round(t_logits / out_scale_vec.reshape(1, -1)),
        err_msg=f'{scheme}:integer logits')
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-6,
                               err_msg=f'{scheme}:float logits')


# ---------------------------------------------------------------------------
# InceptionV3
# ---------------------------------------------------------------------------

def _cbt(rng, ci, co, k, s, p, wscale=0.2):
    """float ConvBlock namespace with tuple-capable kernel/stride/pad."""
    conv = torch.nn.Conv2d(ci, co, k, s, p, bias=False)
    bn = torch.nn.BatchNorm2d(co)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            (rng.randn(*conv.weight.shape) * wscale).astype(np.float32)))
        bn.weight.copy_(torch.from_numpy(
            (0.5 + rng.rand(co)).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(
            (rng.randn(co) * 0.1).astype(np.float32)))
    return types.SimpleNamespace(conv=conv, bn=bn)


def _genuine_full_inception(seed, ncls):
    """Genuine Q_InceptionV3 at the FULL published channel tables
    (q_inceptionv3.py:760-770: channels, init 192, b_mid [128,160,160,192]),
    with the float-model namespace generated from the same branch specs the
    repo's model/freezer/engine share (models/inceptionv3.py build_unit)."""
    trg._import_reference()
    QIn = importlib.import_module('refutils.models.q_inceptionv3')
    from hawq_tpu.models.inceptionv3 import (
        INCEPTION_CHANNELS, build_unit, _Conv1x1Branch, _ConvSeqBranch,
        _MaxPoolBranch, _AvgPoolBranch, _ConvSeq3x3Branch, _ksize)
    from hawq_tpu.configs.bit_config import BitConfig

    rng = np.random.RandomState(seed)
    cfg0 = BitConfig(name='walk', table={})

    def tpad(p):                    # torch-style padding (int or (py, px))
        return p if isinstance(p, int) else tuple(p)

    def branch_ns(ctor, kwargs, cin):
        if ctor in (_Conv1x1Branch, _AvgPoolBranch):
            return types.SimpleNamespace(
                conv=_cbt(rng, cin, kwargs['features'], 1, 1, 0))
        if ctor is _MaxPoolBranch:
            return types.SimpleNamespace()
        convs, c = {}, cin
        for n, (co, k, s, p) in enumerate(zip(
                kwargs['out_channels'], kwargs['kernels'],
                kwargs['strides'], kwargs['paddings']), start=1):
            convs[f'conv{n}'] = _cbt(rng, c, co, _ksize(k), s, tpad(p))
            c = co
        ns = types.SimpleNamespace(
            conv_list=types.SimpleNamespace(**convs))
        if ctor is _ConvSeq3x3Branch:
            ns.conv1x3 = _cbt(rng, c, c, (1, 3), 1, (0, 1))
            ns.conv3x1 = _cbt(rng, c, c, (3, 1), 1, (1, 0))
        return ns

    stages_ns = {}
    b_idx = 0
    for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
        units_ns = {}
        for j, out_ch in enumerate(stage, start=1):
            unit = build_unit(cfg0, i, j, out_ch, b_idx)
            if i == 2 and j != 1:
                b_idx += 1
            cin = (192 if (i, j) == (1, 1)
                   else (INCEPTION_CHANNELS[i - 1][j - 2] if j > 1
                         else INCEPTION_CHANNELS[i - 2][-1]))
            units_ns[f'unit{j}'] = types.SimpleNamespace(
                branches=types.SimpleNamespace(**{
                    nm: branch_ns(ctor, kw, cin)
                    for nm, ctor, kw in unit.branch_defs}))
        stages_ns[f'stage{i}'] = types.SimpleNamespace(**units_ns)

    fc = torch.nn.Linear(2048, ncls)
    with torch.no_grad():
        fc.weight.copy_(torch.from_numpy(
            (rng.randn(ncls, 2048) * 0.05).astype(np.float32)))
        fc.bias.copy_(torch.from_numpy(
            (rng.randn(ncls) * 0.02).astype(np.float32)))
    fmodel = types.SimpleNamespace(
        features=types.SimpleNamespace(
            init_block=types.SimpleNamespace(
                conv1=_cbt(rng, 3, 32, 3, 2, 0, 0.15),
                conv2=_cbt(rng, 32, 32, 3, 1, 0, 0.15),
                conv3=_cbt(rng, 32, 64, 3, 1, 1, 0.15),
                conv4=_cbt(rng, 64, 80, 1, 1, 0, 0.15),
                conv5=_cbt(rng, 80, 192, 3, 1, 0, 0.15)),
            **stages_ns),
        output=types.SimpleNamespace(fc=fc))
    gm = QIn.Q_InceptionV3(
        channels=[list(s) for s in INCEPTION_CHANNELS],
        init_block_channels=192, b_mid_channels=[128, 160, 160, 192],
        model=fmodel, num_classes=ncls)
    return gm


@pytest.mark.slow
def test_genuine_inception_chain_bit_identical(tmp_path):
    """Genuine full-channel Q_InceptionV3 → the reference's OWN five-slice
    dump (complete for this family — all scales live in QuantAct /
    QuantBnConv2d / QuantLinear buffers) → importer → reference-mode engine:
    bit-identical logits.

    Spatial size 203 (not 299) keeps the torch/CPU-XLA runtime tractable;
    the genuine head pool is re-parameterized to the resulting 5×5 grid
    (kernel size only — no numerics change; the engine pools the full grid
    either way)."""
    from hawq_tpu.inference.engine_inception import build_inceptionv3_engine
    torch.manual_seed(0)
    ncls = 12
    gm = _genuine_full_inception(seed=23, ncls=ncls)
    cfg = get_bit_config('inceptionv3', 'uniform8')
    _apply_family_bit_config(gm, cfg)
    gm.features.q_final_pool = QM.QuantAveragePool2d(kernel_size=5, stride=1)

    rng = np.random.RandomState(9)
    with torch.no_grad():
        for i in range(2):
            cal = torch.from_numpy(
                (rng.rand(1, 3, 203, 203).astype(np.float32)) * 2.0 - 1.0)
            gm(cal * (1.0 + 0.1 * i))
    QM.freeze_model(gm)
    gm.eval()          # validate() runs eval'd — the head QuantDropout
    with torch.no_grad():  # must be inert (quant_train.py:630)
        cal1 = torch.from_numpy(
            (rng.rand(1, 3, 203, 203).astype(np.float32)) * 2.0 - 1.0)
        gm(cal1)

    # the reference's literal five-slice recipe — complete for inception
    sd = gm.state_dict()
    state = {
        s: {'module.' + k: v.clone() for k, v in sd.items() if s in k}
        for s in ('convbn_scaling_factor', 'fc_scaling_factor',
                  'weight_integer', 'bias_integer', 'act_scaling_factor')
    }
    path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    torch.save(state, path)
    fm = ckpt.load_reference_quantized(path, 'inceptionv3', cfg)
    assert fm.num_classes == ncls

    test_nchw = torch.from_numpy(
        (rng.rand(1, 3, 203, 203).astype(np.float32)) * 2.0 - 1.0)
    with torch.no_grad():
        t_logits = gm(test_nchw).numpy()

    images = jnp.asarray(np.transpose(test_nchw.numpy(), (0, 2, 3, 1)))
    with jax.enable_x64():
        eng = build_inceptionv3_engine(fm, requant_mode='reference')
        j_logits = np.asarray(eng(images))
    np.testing.assert_array_equal(j_logits, t_logits)

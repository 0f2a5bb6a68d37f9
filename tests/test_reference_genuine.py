"""Differential validation against the GENUINE reference code.

The other parity tests (test_reference_import.py) validate the oracle against
a torch *transliteration* written here; this module removes that last
unverified link by importing the reference's own modules from
``/root/reference`` (torch 2.13 CPU is installed; the reference code is
treated strictly as a numerical oracle) and asserting:

  * :mod:`hawq_tpu.quant.reference_oracle` == the genuine ``batch_frexp`` /
    ``fixedpoint_fn`` (quant_utils.py:188-213, 344-460) on randomized
    scales/accumulators including engineered round-half-way ties;
  * the repo's percentile calibration == the genuine
    ``get_percentile_min_max`` (round-index order statistics,
    quant_utils.py:40-70) and the genuine per-channel kthvalue weight
    percentile (ceil-index, quant_modules.py:459-467);
  * a full residual-unit chain built from the reference's own ``QuantAct`` +
    ``QuantBnConv2d`` + ``QuantLinear`` + ``Q_ResBlockBn``/``Q_ResUnitBn``
    (quant_modules.py:133-494, q_resnet.py:199-316), calibrated, ``fix()``ed
    via the genuine ``freeze_model``, dumped as the reference's five-slice
    ``quantized_checkpoint.pth.tar`` (quant_train.py:665-670), imported with
    ``load_reference_quantized``, and replayed by the engine in
    ``requant_mode='reference'`` — bit-identical integers at every unit.

The reference hard-codes ``.cuda()`` placement (quant_utils.py:212, 251,
299); this box has no GPU, so ``torch.Tensor.cuda`` / ``torch.tensor``'s
``.cuda`` are patched to identity — a device-placement no-op that does not
touch any numerics.
"""

import importlib
import math
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hawq_tpu.configs.bit_config import (get_bit_config, RESNET_UNITS,
                                         RESNET_CONVS_PER_UNIT)
from hawq_tpu.inference.engine import build_resnet_engine
from hawq_tpu.models.resnet import _STAGE_CHANNELS, _INIT_FEATURES
from hawq_tpu.quant import ops as qops
from hawq_tpu.quant import reference_oracle as ro
from hawq_tpu.utils import checkpoint as ckpt

torch = pytest.importorskip('torch')

# CPU no-op for the reference's hard-coded .cuda() placement calls.
torch.Tensor.cuda = lambda self, *a, **k: self

_REF_UTILS = '/root/reference/utils'


def _import_reference():
    """sys.path-free package-shim import of the genuine reference modules.

    Returns (quant_utils, quant_modules, q_resnet).  pytorchcv (absent here)
    is stubbed — q_resnet.py imports it but never uses the symbols in the
    classes we instantiate.
    """
    if 'refutils.models.q_resnet' in sys.modules:
        return (sys.modules['refutils.quantization_utils.quant_utils'],
                sys.modules['refutils.quantization_utils.quant_modules'],
                sys.modules['refutils.models.q_resnet'])
    for name in ('pytorchcv', 'pytorchcv.models', 'pytorchcv.models.common',
                 'pytorchcv.models.shufflenetv2'):
        sys.modules.setdefault(name, types.ModuleType(name))
    for sym in ('ConvBlock',):
        setattr(sys.modules['pytorchcv.models.common'], sym, type(sym, (), {}))
    for sym in ('ShuffleUnit', 'ShuffleInitBlock'):
        setattr(sys.modules['pytorchcv.models.shufflenetv2'], sym,
                type(sym, (), {}))
    root = types.ModuleType('refutils')
    root.__path__ = [_REF_UTILS]
    sys.modules['refutils'] = root
    qu = importlib.import_module('refutils.quantization_utils.quant_utils')
    qm = importlib.import_module('refutils.quantization_utils.quant_modules')
    qr = importlib.import_module('refutils.models.q_resnet')
    return qu, qm, qr


QU, QM, QR = _import_reference()


# ---------------------------------------------------------------------------
# 1. dyadic requant primitives vs the genuine functions
# ---------------------------------------------------------------------------

def test_genuine_batch_frexp_matches_oracle():
    rng = np.random.RandomState(0)
    scales = np.concatenate([
        10.0 ** rng.uniform(-6, 2, 256),
        # engineered: exact powers of two, the 2^-32 half-up tie, and the
        # largest-mantissa edge
        [0.75, 0.5, 1.0, 2.0, 0.5 + 2.0 ** -32, 1.0 - 2.0 ** -24],
    ]).astype(np.float64)
    m, e = ro.frexp31(scales)
    tm, te = QU.batch_frexp(torch.from_numpy(scales))
    np.testing.assert_array_equal(m, tm.numpy().astype(np.float64))
    np.testing.assert_array_equal(e, te.numpy())


def _genuine_case0(z_nchw, bits, mode, s_out, s_act, s_w):
    """Drive the genuine fixedpoint_fn (case 0) exactly as QuantAct does
    (quant_modules.py:291-293)."""
    return QU.fixedpoint_fn.apply(
        z_nchw, bits, mode, torch.tensor([float(s_out)]), 0,
        torch.tensor([float(s_act)]), torch.as_tensor(s_w))


def test_genuine_fixedpoint_case0_matches_oracle():
    rng = np.random.RandomState(1)
    for bits, mode in ((8, 'symmetric'), (4, 'asymmetric'), (16, 'symmetric')):
        c = 8
        z_int = rng.randint(-2 ** 20, 2 ** 20, (2, 5, 5, c)).astype(np.float64)
        s_act = np.float32(0.037)
        s_w = (0.001 * (0.5 + rng.rand(c))).astype(np.float32)
        s_out = np.float32(0.05)
        acc = s_w * s_act                       # f32 product, as the plan has
        got = ro.requant_ref(z_int, acc, s_out, bits, mode == 'symmetric')
        z = torch.from_numpy(
            np.transpose(z_int * acc.astype(np.float64), (0, 3, 1, 2))).float()
        want = _genuine_case0(z, bits, mode, s_out, s_act,
                              torch.from_numpy(s_w))
        np.testing.assert_array_equal(
            got, np.transpose(want.numpy(), (0, 2, 3, 1)).astype(np.float64))


def test_genuine_fixedpoint_case0_halfway_ties():
    """scale ratio exactly 3/4 ⇒ z_int ≡ 2 (mod 4) lands on .5 exactly —
    the rounding mode of the z·m/2^e round must match (half-even)."""
    z_int = np.array([[[[2.0, 6.0, -2.0, -6.0, 10.0, 4.0, 8.0, 3.0]]]])
    got = ro.requant_ref(z_int, np.float32(0.75), np.float32(1.0), 8, True)
    z = torch.from_numpy(np.transpose(z_int * 0.75, (0, 3, 1, 2))).float()
    want = _genuine_case0(z, 8, 'symmetric', 1.0, 0.75,
                          torch.ones(8))
    np.testing.assert_array_equal(
        got, np.transpose(want.numpy(), (0, 2, 3, 1)).astype(np.float64))


def test_genuine_fixedpoint_case1_matches_oracle():
    rng = np.random.RandomState(2)
    c = 8
    main = rng.randint(-2 ** 18, 2 ** 18, (2, 4, 4, c)).astype(np.float64)
    ident = rng.randint(-2 ** 12, 2 ** 12, (2, 4, 4, c)).astype(np.float64)
    s_act, s_out = np.float32(0.021), np.float32(0.013)
    s_w = (0.002 * (0.5 + rng.rand(c))).astype(np.float32)
    id_act = np.float32(0.0042)
    acc = s_w * s_act
    got = ro.requant_add_ref(main, acc, ident, id_act, s_out)
    z_np = main * acc.astype(np.float64) + ident * np.float64(id_act)
    id_np = ident * np.float64(id_act)
    want = QU.fixedpoint_fn.apply(
        torch.from_numpy(np.transpose(z_np, (0, 3, 1, 2))).float(),
        16, 'symmetric', torch.tensor([float(s_out)]), 1,
        torch.tensor([float(s_act)]), torch.from_numpy(s_w),
        torch.from_numpy(np.transpose(id_np, (0, 3, 1, 2))).float(),
        torch.tensor([float(id_act)]), torch.tensor([1.0]))
    np.testing.assert_array_equal(
        got, np.transpose(want.numpy(), (0, 2, 3, 1)).astype(np.float64))


def test_genuine_symmetric_scale_matches_repo():
    rng = np.random.RandomState(3)
    mins = (-rng.rand(16)).astype(np.float32)
    maxs = rng.rand(16).astype(np.float32)
    for bits in (4, 8):
        want = QU.symmetric_linear_quantization_params(
            bits, torch.from_numpy(mins), torch.from_numpy(maxs),
            per_channel=True)
        got = qops.symmetric_quant_scale(bits, jnp.asarray(mins),
                                         jnp.asarray(maxs))
        np.testing.assert_array_equal(np.asarray(got), want.numpy())


# ---------------------------------------------------------------------------
# 2. percentile calibration vs the genuine order statistics
# ---------------------------------------------------------------------------

def test_percentile_bounds_match_genuine_get_percentile_min_max():
    rng = np.random.RandomState(4)
    for n in (1000, 1003, 257):        # non-round lengths stress the index
        x = rng.randn(n).astype(np.float32)
        for pct in (99.9, 99.0, 95.0, 99.99):
            tlo, thi = QU.get_percentile_min_max(
                torch.from_numpy(x), 100.0 - pct, pct, output_tensor=True)
            jlo, jhi = qops.percentile_bounds(jnp.asarray(x),
                                              100.0 - pct, pct)
            assert float(jlo) == float(tlo), (n, pct)
            assert float(jhi) == float(thi), (n, pct)
        # the asymmetric path pins the lower percentile to 0
        tlo, thi = QU.get_percentile_min_max(
            torch.from_numpy(x), 0, 99.7, output_tensor=True)
        jlo, jhi = qops.percentile_bounds(jnp.asarray(x), 0.0, 99.7)
        assert float(jlo) == float(tlo) == 0.0 * float(thi)
        assert float(jhi) == float(thi)


def test_weight_percentile_per_channel_matches_genuine_kthvalue():
    """quant_modules.py:459-467 ceil-index kthvalue, both bounds un-negated."""
    rng = np.random.RandomState(5)
    w = rng.randn(16, 45).astype(np.float32)      # torch view: (Cout, L)
    for pct in (99.9, 95.0, 90.0):
        ln = w.shape[1]
        lower_index = math.ceil(ln * (100.0 - pct) * 0.01)
        upper_index = math.ceil(ln * pct * 0.01)
        tmin = torch.kthvalue(torch.from_numpy(w), k=lower_index, dim=1).values
        tmax = torch.kthvalue(torch.from_numpy(w), k=upper_index, dim=1).values
        jmin, jmax = qops.weight_percentile_bounds_per_channel(
            jnp.asarray(w.T), pct)                # repo layout: (L, Cout)
        np.testing.assert_array_equal(np.asarray(jmin), tmin.numpy())
        np.testing.assert_array_equal(np.asarray(jmax), tmax.numpy())


# ---------------------------------------------------------------------------
# 3. full chain: genuine reference modules -> five-slice checkpoint ->
#    imported engine replay, bit-for-bit
# ---------------------------------------------------------------------------

def _convbn(cin, cout, k, stride, pad, rng, wscale=0.2):
    conv = torch.nn.Conv2d(cin, cout, k, stride, pad, bias=False)
    bn = torch.nn.BatchNorm2d(cout)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(
            (rng.randn(*conv.weight.shape) * wscale).astype(np.float32)))
        bn.weight.copy_(torch.from_numpy(
            (0.5 + rng.rand(cout)).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(
            (rng.randn(cout) * 0.1).astype(np.float32)))
    return types.SimpleNamespace(conv=conv, bn=bn)


def _float_unit(cin, cmid, cout, stride, bottleneck, rng):
    """pytorchcv-shaped float unit for the genuine set_param()
    (q_resnet.py:206-227 reads .body.convN.{conv,bn} / .identity_conv).
    The tiny50 geometry is v1.5-style: stride on the 3×3 conv2."""
    body = types.SimpleNamespace()
    if bottleneck:
        body.conv1 = _convbn(cin, cmid, 1, 1, 0, rng)
        body.conv2 = _convbn(cmid, cmid, 3, stride, 1, rng)
        body.conv3 = _convbn(cmid, cout, 1, 1, 0, rng)
    else:
        body.conv1 = _convbn(cin, cout, 3, stride, 1, rng)
        body.conv2 = _convbn(cout, cout, 3, 1, 1, rng)
    resize = (cin != cout) or stride != 1
    unit = types.SimpleNamespace(body=body, resize_identity=resize)
    if resize:
        unit.identity_conv = _convbn(cin, cout, 1, stride, 0, rng)
    return unit


class _GenuineTinyResNet(torch.nn.Module):
    """The reference's Q_ResNet wiring (q_resnet.py:16-135) built from the
    GENUINE quant modules and unit classes, at tiny dims.  Module names match
    the reference exactly (incl. the dotted setattr registration,
    q_resnet.py:43) so the five-slice state dict is importable."""

    def __init__(self, arch, ncls, seed):
        super().__init__()
        rng = np.random.RandomState(seed)
        units = RESNET_UNITS[arch]
        bottleneck = RESNET_CONVS_PER_UNIT[arch] == 3
        init_f = _INIT_FEATURES[arch]
        mid, out = _STAGE_CHANNELS[arch]
        self._bottleneck = bottleneck
        self._init_name = ('quant_init_convbn' if bottleneck
                           else 'quant_init_block_convbn')

        self.quant_input = QM.QuantAct()
        qc = QM.QuantBnConv2d()
        blk = _convbn(3, init_f, 7, 2, 3, rng)
        qc.set_param(blk.conv, blk.bn)
        setattr(self, self._init_name, qc)
        self.quant_act_int32 = QM.QuantAct()
        self.pool = torch.nn.MaxPool2d(3, 2, 1)
        self.act = torch.nn.ReLU()

        cin = init_f
        self._units = []
        for s, n_units in enumerate(units, start=1):
            for u in range(1, n_units + 1):
                stride = 2 if (u == 1 and s > 1) else 1
                cout = out[s - 1]
                cmid = mid[s - 1] if bottleneck else None
                funit = _float_unit(cin, cmid, cout, stride, bottleneck, rng)
                qunit = QR.Q_ResUnitBn() if bottleneck else QR.Q_ResBlockBn()
                qunit.set_param(funit)
                name = f'stage{s}.unit{u}'
                setattr(self, name, qunit)
                self._units.append(name)
                cin = cout

        self.final_pool = QM.QuantAveragePool2d(kernel_size=4, stride=1)
        self.quant_act_output = QM.QuantAct()
        lin = torch.nn.Linear(cin, ncls)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(
                (rng.randn(ncls, cin) * 0.1).astype(np.float32)))
            lin.bias.copy_(torch.from_numpy(
                (rng.randn(ncls) * 0.05).astype(np.float32)))
        self.quant_output = QM.QuantLinear()
        self.quant_output.set_param(lin)

    def forward(self, x):
        # q_resnet.py:114-135 logic, verbatim
        x, act_sf = self.quant_input(x)
        x, w_sf = getattr(self, self._init_name)(x, act_sf)
        x = self.pool(x)
        x, act_sf = self.quant_act_int32(x, act_sf, w_sf)
        x = self.act(x)
        for name in self._units:
            x, act_sf = getattr(self, name)(x, act_sf)
        x = self.final_pool(x, act_sf)
        x, act_sf = self.quant_act_output(x, act_sf)
        x = x.view(x.size(0), -1)
        return self.quant_output(x, act_sf)


def _apply_bit_config(model, cfg):
    """The trainer's attr surgery (quant_train.py:264-301) driven by the
    repo's BitConfig (same key naming by construction)."""
    n_hit = 0
    for name, m in model.named_modules():
        if name not in cfg.table:
            continue
        n_hit += 1
        if isinstance(m, QM.QuantAct):
            bits = cfg.act_bits(name)
            m.activation_bit = bits
            m.quant_mode = 'asymmetric' if bits == 4 else 'symmetric'
            m.act_range_momentum = cfg.settings.act_range_momentum
            m.act_percentile = cfg.settings.act_percentile
        else:
            m.quant_mode = 'symmetric'
            m.weight_bit = cfg.weight_bits(name)
            m.per_channel = cfg.settings.per_channel
            m.bias_bit = cfg.settings.bias_bit
            m.quantize_bias = True
            m.weight_percentile = cfg.settings.weight_percentile
    assert n_hit == len(cfg.table), 'surgery missed modules'


def _calibrate_freeze_dump(model, images_nchw):
    """Calibrate ranges, freeze via the genuine freeze_model, run once
    frozen to populate integer buffers, dump the five-slice checkpoint dict
    (quant_train.py:665-670 filter semantics, DDP 'module.' prefix)."""
    with torch.no_grad():
        for i in range(images_nchw.shape[0]):
            model(images_nchw[i:i + 1] * (1.0 + 0.1 * i))
    QM.freeze_model(model)
    with torch.no_grad():
        model(images_nchw[:1])
    sd = model.state_dict()
    return {
        s: {'module.' + k: v.clone() for k, v in sd.items() if s in k}
        for s in ('convbn_scaling_factor', 'fc_scaling_factor',
                  'weight_integer', 'bias_integer', 'act_scaling_factor')
    }


def _torch_unit_ints(model, images_nchw):
    """Frozen torch forward capturing per-unit integer featuremaps (NHWC)."""
    grabbed = {}

    def _hook(name):
        def fn(_m, _inp, outp):
            val, scale = outp
            grabbed[name] = torch.round(
                val / scale.view(-1)).detach().numpy()
        return fn

    handles = [getattr(model, n).register_forward_hook(_hook(n))
               for n in model._units]
    handles.append(model.final_pool.register_forward_hook(_hook('avg_pool')))
    handles.append(
        model.quant_act_output.register_forward_hook(_hook('fc_input')))
    with torch.no_grad():
        logits = model(images_nchw).numpy()
    for h in handles:
        h.remove()
    nodes = {'logits': logits}
    for name in model._units:
        nodes[name + '.quant_act_int32'] = np.transpose(
            grabbed[name], (0, 2, 3, 1))
    nodes['avg_pool'] = np.transpose(
        grabbed['avg_pool'], (0, 2, 3, 1)).reshape(len(logits), -1)
    nodes['fc_input'] = np.transpose(
        grabbed['fc_input'], (0, 2, 3, 1)).reshape(len(logits), -1)
    return nodes


@pytest.mark.slow
@pytest.mark.parametrize('arch,scheme', [('tiny18', 'uniform8'),
                                         ('tiny18', 'uniform4'),
                                         ('tiny50', 'uniform8')])
def test_genuine_chain_matches_reference_mode_engine(arch, scheme, tmp_path):
    """Genuine reference modules → quantized_checkpoint.pth.tar → importer →
    requant_mode='reference' engine: bit-identical integers at every unit
    output, the pool, the fc input, and the final float logits."""
    torch.manual_seed(0)
    cfg = get_bit_config(arch, scheme)
    model = _GenuineTinyResNet(arch, ncls := 16, seed=11)
    _apply_bit_config(model, cfg)

    rng = np.random.RandomState(7)
    cal = torch.from_numpy(
        (rng.rand(4, 3, 32, 32).astype(np.float32)) * 2.0 - 1.0)
    state = _calibrate_freeze_dump(model, cal)
    path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    torch.save(state, path)

    fm = ckpt.load_reference_quantized(path, arch, cfg)
    assert fm.num_classes == ncls

    test_nchw = torch.from_numpy(
        (rng.rand(2, 3, 32, 32).astype(np.float32)) * 2.0 - 1.0)
    want = _torch_unit_ints(model, test_nchw)
    images = jnp.asarray(np.transpose(test_nchw.numpy(), (0, 2, 3, 1)))

    with jax.enable_x64():
        for node in (list(n + '.quant_act_int32' for n in model._units)
                     + ['avg_pool', 'fc_input']):
            eng = build_resnet_engine(fm, capture=node,
                                      requant_mode='reference')
            got = np.asarray(eng(images)).astype(np.int64)
            got = got.reshape(want[node].shape)
            np.testing.assert_array_equal(
                got, want[node].astype(np.int64),
                err_msg=f'{arch}/{scheme}:{node}')
        logits = np.asarray(
            build_resnet_engine(fm, requant_mode='reference')(images))
    np.testing.assert_array_equal(logits, want['logits'],
                                  err_msg=f'{arch}/{scheme}:logits')


# ---------------------------------------------------------------------------
# 4. remaining genuine-module cases: multi-branch concat requant (the
#    InceptionV3 path) and the bare QuantConv2d (the MobileNetV2 head)
# ---------------------------------------------------------------------------

def test_genuine_quantact_multibranch_matches_oracle():
    """QuantAct's multi-branch case (quant_modules.py:275-286): per-channel-
    slice fixedpoint requant with per-branch scales and weight-scale ratio 1
    — the semantics the inception engine's branch-concat requant implements
    via reference_oracle."""
    rng = np.random.RandomState(6)
    chans = [8, 16, 8]
    scales = [np.float32(s) for s in (0.011, 0.023, 0.0047)]
    ints = [rng.randint(-2 ** 14, 2 ** 14, (2, c, 5, 5)).astype(np.float64)
            for c in chans]
    x = torch.from_numpy(np.concatenate(
        [i * np.float64(s) for i, s in zip(ints, scales)], axis=1)).float()

    qa = QM.QuantAct(activation_bit=8, quant_mode='symmetric')
    with torch.no_grad():
        qa.x_min += -1.9
        qa.x_max += 2.3
    qa.fix()
    out, s_out = qa((x, [torch.tensor([float(s)]) for s in scales], chans))
    got = torch.round(out / s_out.view(-1)).numpy()

    s_np = np.float32(s_out.item())
    start = 0
    for i, (c, s) in enumerate(zip(chans, scales)):
        want = ro.requant_ref(np.transpose(ints[i], (0, 2, 3, 1)),
                              s * np.float32(1.0), s_np, 8, True)
        np.testing.assert_array_equal(
            np.transpose(got[:, start:start + c], (0, 2, 3, 1)),
            want, err_msg=f'branch {i}')
        start += c


def test_genuine_bare_quantconv2d_matches_repo_layer():
    """The bare QuantConv2d (quant_modules.py:605-736, the MobileNetV2 1×1
    output head) against the repo's nn.QuantConv2d with identical weights:
    same integer accumulators, same weight scales."""
    import jax
    import jax.numpy as jnp
    from hawq_tpu.nn.layers import QuantConv2d as RepoConv

    rng = np.random.RandomState(8)
    cin, cout = 6, 12
    w = (rng.randn(cout, cin, 1, 1) * 0.3).astype(np.float32)
    b = (rng.randn(cout) * 0.1).astype(np.float32)
    s_in = np.float32(0.021)
    x_int = rng.randint(-128, 128, (2, cin, 4, 4)).astype(np.float32)
    x = torch.from_numpy(x_int * s_in)

    conv = torch.nn.Conv2d(cin, cout, 1, bias=True)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
    qc = QM.QuantConv2d(weight_bit=8, bias_bit=32, per_channel=True,
                        quant_mode='symmetric')
    qc.set_param(conv)
    qc.fix()
    t_out, t_wscale = qc(x, torch.tensor([float(s_in)]))
    bias_scale = t_wscale.numpy().astype(np.float64) * np.float64(s_in)
    t_acc = np.round(np.transpose(t_out.detach().numpy(), (0, 2, 3, 1))
                     / bias_scale.reshape(1, 1, 1, -1))

    layer = RepoConv(features=cout, kernel_size=(1, 1), weight_bit=8,
                     bias_bit=32, per_channel=True, use_bias=True)
    params = {'params': {'kernel': jnp.asarray(
        np.transpose(w, (2, 3, 1, 0))), 'bias': jnp.asarray(b)}}
    j_out, j_wscale, j_acc = layer.apply(
        params, jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1))),
        jnp.float32(s_in))

    np.testing.assert_array_equal(np.asarray(j_wscale), t_wscale.numpy())
    np.testing.assert_array_equal(np.asarray(j_acc), t_acc)


def _assert_unit_match(j_int, t_int, out_scale, t_scale, label='',
                       max_abs=1, max_rate=0.005):
    """Unit-anchor criterion for genuine(31-bit dyadic) vs repo-QAT(23-bit
    dyadic) comparisons: scales exactly equal, integers equal except
    borderline-rounding flips at a tiny rate.  The two dyadic grids are
    *documented* distinct numerics (docs/reference_import.md); their
    exact-rounding equivalence is anchored separately through the
    reference-mode engine chain above.  ``max_abs`` is +-1 for a single
    requant at the output; units whose output sits behind further convs
    pass a larger bound (one upstream +-1 flip amplifies through a conv
    before the next requant renormalizes it).  Any wiring/topology error
    (wrong padding, branch order, scale threading) diverges on most
    elements and fails the rate bound."""
    assert float(out_scale) == float(t_scale), label
    diff = j_int - t_int
    assert np.abs(diff).max() <= max_abs, (label, 'non-borderline divergence')
    rate = float((diff != 0).mean())
    assert rate < max_rate, (label, f'borderline flip rate {rate}')


def test_genuine_linear_bottleneck_matches_repo_unit():
    """The MobileNetV2 inverted-residual unit: the GENUINE Q_LinearBottleneck
    (q_mobilenetv2.py:12-92 — ReLU6, depthwise 3×3, int32-scale residual
    identity) vs the repo's QLinearBottleneck with identical weights, BN
    statistics, and calibrated ranges: same output scale, same integers.
    Covers all three unit forms (residual, strided downsample, no
    expansion)."""
    _import_reference()
    QMn = importlib.import_module('refutils.models.q_mobilenetv2')
    from hawq_tpu.configs.bit_config import BitConfig
    from hawq_tpu.models.mobilenetv2 import QLinearBottleneck

    for case in ('residual', 'downsample', 'no_expansion'):
        residual = case == 'residual'
        expansion = case != 'no_expansion'
        cin = 8
        cout = 8 if residual else 12
        stride = 2 if case == 'downsample' else 1
        mid = cin * 6 if expansion else cin
        rng = np.random.RandomState(10)

        def mk(cin_, cout_, k, s, p, groups=1):
            conv = torch.nn.Conv2d(cin_, cout_, k, s, p, groups=groups,
                                   bias=False)
            bn = torch.nn.BatchNorm2d(cout_)
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(
                    (rng.randn(*conv.weight.shape) * 0.3)
                    .astype(np.float32)))
                bn.weight.copy_(torch.from_numpy(
                    (0.5 + rng.rand(cout_)).astype(np.float32)))
                bn.bias.copy_(torch.from_numpy(
                    (rng.randn(cout_) * 0.1).astype(np.float32)))
            return types.SimpleNamespace(conv=conv, bn=bn)

        funit = types.SimpleNamespace(
            conv1=mk(cin, mid, 1, 1, 0),
            conv2=mk(mid, mid, 3, stride, 1, groups=mid),
            conv3=mk(mid, cout, 1, 1, 0))
        unit = QMn.Q_LinearBottleneck(funit, in_channels=cin,
                                      out_channels=cout, stride=stride,
                                      expansion=expansion,
                                      remove_exp_conv=False)
        for name, m in unit.named_modules():
            if isinstance(m, QM.QuantAct):
                m.activation_bit = 16 if name == 'quant_act_int32' else 8
                m.quant_mode = 'symmetric'
            elif isinstance(m, QM.QuantBnConv2d):
                m.weight_bit = 8
                m.per_channel = True
                m.bias_bit = 32
                m.quantize_bias = True
                m.quant_mode = 'symmetric'

        s_in = np.float32(0.02)
        x_int = rng.randint(-128, 128, (2, cin, 8, 8)).astype(np.float32)
        xt = torch.from_numpy(x_int * s_in)
        with torch.no_grad():
            for i in range(3):
                unit(xt * (1.0 + 0.1 * i), torch.tensor([float(s_in)]))
        QM.freeze_model(unit)
        with torch.no_grad():
            t_out, t_scale = unit(xt, torch.tensor([float(s_in)]))
        t_int = np.transpose(
            torch.round(t_out / t_scale.view(-1)).numpy(), (0, 2, 3, 1))

        p = 'features.stage1.unit1'
        cfg = BitConfig(name='unit_anchor', table={
            f'{p}.quant_act': 8, f'{p}.conv1': 8, f'{p}.quant_act1': 8,
            f'{p}.conv2': 8, f'{p}.quant_act2': 8, f'{p}.conv3': 8,
            f'{p}.quant_act_int32': 16})
        layer = QLinearBottleneck(cfg=cfg, prefix=p, in_ch=cin,
                                  out_ch=cout, stride=stride,
                                  expansion=expansion)
        xj = jnp.asarray(np.transpose(x_int * s_in, (0, 2, 3, 1)))
        v = jax.tree.map(np.array, jax.device_get(layer.init(
            jax.random.PRNGKey(0), xj, jnp.float32(s_in),
            folded=True, update_stats=False)))

        for name, g in (('conv1', funit.conv1), ('conv2', funit.conv2),
                        ('conv3', funit.conv3)):
            v['params'][name]['kernel'] = np.transpose(
                g.conv.weight.detach().numpy(), (2, 3, 1, 0))
            v['params'][name]['gamma'] = g.bn.weight.detach().numpy()
            v['params'][name]['beta'] = g.bn.bias.detach().numpy()
            v['batch_stats'][name]['mean'] = g.bn.running_mean.numpy()
            v['batch_stats'][name]['var'] = g.bn.running_var.numpy()
        for name, tmod in (('quant_act', unit.quant_act),
                           ('quant_act1', unit.quant_act1),
                           ('quant_act2', unit.quant_act2),
                           ('quant_act_int32', unit.quant_act_int32)):
            v['quant_stats'][name]['x_min'] = np.float32(tmod.x_min.item())
            v['quant_stats'][name]['x_max'] = np.float32(tmod.x_max.item())

        out, out_scale = layer.apply(v, xj, jnp.float32(s_in),
                                     folded=True, update_stats=False)
        j_int = np.round(np.asarray(out) / float(out_scale))
        _assert_unit_match(j_int, t_int.astype(np.float64), out_scale,
                           t_scale, case)


def test_genuine_inception_a_unit_matches_repo_unit():
    """The InceptionV3 A-unit: genuine Q_InceptionAUnit (q_inceptionv3.py —
    four branches through Q_Concurrent, per-branch scales, multi-branch
    concat requant in q_rescaling_activ) vs the repo's _unit_a with
    identical weights/BN/ranges: same output scale, same integers."""
    _import_reference()
    QIn = importlib.import_module('refutils.models.q_inceptionv3')
    from hawq_tpu.configs.bit_config import BitConfig
    from hawq_tpu.models.inceptionv3 import _unit_a

    rng = np.random.RandomState(12)
    cin = 32
    b1 = types.SimpleNamespace(conv=_convbn(cin, 64, 1, 1, 0, rng))
    b2 = types.SimpleNamespace(conv_list=types.SimpleNamespace(
        conv1=_convbn(cin, 48, 1, 1, 0, rng),
        conv2=_convbn(48, 64, 5, 1, 2, rng)))
    b3 = types.SimpleNamespace(conv_list=types.SimpleNamespace(
        conv1=_convbn(cin, 64, 1, 1, 0, rng),
        conv2=_convbn(64, 96, 3, 1, 1, rng),
        conv3=_convbn(96, 96, 3, 1, 1, rng)))
    b4 = types.SimpleNamespace(conv=_convbn(cin, 16, 1, 1, 0, rng))
    model_ns = types.SimpleNamespace(branches=types.SimpleNamespace(
        branch1=b1, branch2=b2, branch3=b3, branch4=b4))
    unit = QIn.Q_InceptionAUnit(model_ns, in_channels=cin, out_channels=240)

    for name, m in unit.named_modules():
        if isinstance(m, QM.QuantAct):
            m.activation_bit = 8
            m.quant_mode = 'symmetric'
        elif isinstance(m, QM.QuantBnConv2d):
            m.weight_bit = 8
            m.per_channel = True
            m.bias_bit = 32
            m.quantize_bias = True
            m.quant_mode = 'symmetric'

    s_in = np.float32(0.03)
    x_int = rng.randint(-128, 128, (2, cin, 8, 8)).astype(np.float32)
    xt = torch.from_numpy(x_int * s_in)
    with torch.no_grad():
        for i in range(3):
            unit((xt * (1.0 + 0.1 * i), torch.tensor([float(s_in)])))
    QM.freeze_model(unit)
    with torch.no_grad():
        t_out, t_scale = unit((xt, torch.tensor([float(s_in)])))
    t_int = np.transpose(
        torch.round(t_out / t_scale.view(-1)).numpy(), (0, 2, 3, 1))

    cfg = BitConfig(name='a_unit_anchor', table={})     # all-8 defaults
    layer = _unit_a(cfg, 'features.stage1.unit1', 240, 'unit1')
    xj = jnp.asarray(np.transpose(x_int * s_in, (0, 2, 3, 1)))
    v = jax.tree.map(np.array, jax.device_get(layer.init(
        jax.random.PRNGKey(0), xj, jnp.float32(s_in),
        folded=True, update_stats=False)))

    def flax_path(genuine_name):
        return (genuine_name.replace('branches.', '')
                .replace('q_conv_list.', '').split('.'))

    def node(tree, path):
        for part in path[:-1]:
            tree = tree[part]
        return tree, path[-1]

    for name, m in unit.named_modules():
        if isinstance(m, QM.QuantBnConv2d):
            path = flax_path(name)
            parent, leaf = node(v['params'], path)
            parent[leaf]['kernel'] = np.transpose(
                m.conv.weight.detach().numpy(), (2, 3, 1, 0))
            parent[leaf]['gamma'] = m.bn.weight.detach().numpy()
            parent[leaf]['beta'] = m.bn.bias.detach().numpy()
            bparent, bleaf = node(v['batch_stats'], path)
            bparent[bleaf]['mean'] = m.bn.running_mean.numpy()
            bparent[bleaf]['var'] = m.bn.running_var.numpy()
        elif isinstance(m, QM.QuantAct):
            qparent, qleaf = node(v['quant_stats'], flax_path(name))
            qparent[qleaf]['x_min'] = np.float32(m.x_min.item())
            qparent[qleaf]['x_max'] = np.float32(m.x_max.item())

    out, out_scale = layer.apply(v, xj, jnp.float32(s_in),
                                 folded=True, update_stats=False)
    j_int = np.round(np.asarray(out) / float(out_scale))
    _assert_unit_match(j_int, t_int.astype(np.float64), out_scale, t_scale,
                       'a_unit')


def _anchor_inception_unit(unit, layer, cin, hw, seed):
    """Shared flow for genuine-vs-repo inception unit anchors: 8-bit surgery
    → calibrate → freeze → inject weights/BN/ranges into the repo layer by
    name mapping → bit-identical outputs.  (The A-unit test above inlines
    the same flow as the readable reference.)"""
    rng = np.random.RandomState(seed)
    for name, m in unit.named_modules():
        if isinstance(m, QM.QuantAct):
            m.activation_bit = 8
            m.quant_mode = 'symmetric'
        elif isinstance(m, QM.QuantBnConv2d):
            m.weight_bit = 8
            m.per_channel = True
            m.bias_bit = 32
            m.quantize_bias = True
            m.quant_mode = 'symmetric'

    s_in = np.float32(0.03)
    x_int = rng.randint(-128, 128, (2, cin, hw, hw)).astype(np.float32)
    xt = torch.from_numpy(x_int * s_in)
    with torch.no_grad():
        for i in range(3):
            unit((xt * (1.0 + 0.1 * i), torch.tensor([float(s_in)])))
    QM.freeze_model(unit)
    with torch.no_grad():
        t_out, t_scale = unit((xt, torch.tensor([float(s_in)])))
    t_int = np.transpose(
        torch.round(t_out / t_scale.view(-1)).numpy(), (0, 2, 3, 1))

    xj = jnp.asarray(np.transpose(x_int * s_in, (0, 2, 3, 1)))
    v = jax.tree.map(np.array, jax.device_get(layer.init(
        jax.random.PRNGKey(0), xj, jnp.float32(s_in),
        folded=True, update_stats=False)))

    def flax_path(genuine_name):
        return (genuine_name.replace('branches.', '')
                .replace('q_conv_list.', '').split('.'))

    def node(tree, path):
        for part in path[:-1]:
            tree = tree[part]
        return tree, path[-1]

    for name, m in unit.named_modules():
        if isinstance(m, QM.QuantBnConv2d):
            parent, leaf = node(v['params'], flax_path(name))
            parent[leaf]['kernel'] = np.transpose(
                m.conv.weight.detach().numpy(), (2, 3, 1, 0))
            parent[leaf]['gamma'] = m.bn.weight.detach().numpy()
            parent[leaf]['beta'] = m.bn.bias.detach().numpy()
            bparent, bleaf = node(v['batch_stats'], flax_path(name))
            bparent[bleaf]['mean'] = m.bn.running_mean.numpy()
            bparent[bleaf]['var'] = m.bn.running_var.numpy()
        elif isinstance(m, QM.QuantAct):
            qparent, qleaf = node(v['quant_stats'], flax_path(name))
            qparent[qleaf]['x_min'] = np.float32(m.x_min.item())
            qparent[qleaf]['x_max'] = np.float32(m.x_max.item())

    out, out_scale = layer.apply(v, xj, jnp.float32(s_in),
                                 folded=True, update_stats=False)
    # deep-chain units: a borderline flip upstream amplifies through the
    # following conv before its requant renormalizes — allow a few counts
    _assert_unit_match(np.round(np.asarray(out) / float(out_scale)),
                       t_int.astype(np.float64), out_scale, t_scale,
                       max_abs=4, max_rate=0.01)


@pytest.mark.slow
def test_genuine_reduction_a_unit_matches_repo_unit():
    """Genuine Q_ReductionAUnit (strided branches + the max-pool branch
    through Q_Concurrent) vs the repo's _unit_reduction_a: bit-identical."""
    _import_reference()
    QIn = importlib.import_module('refutils.models.q_inceptionv3')
    from hawq_tpu.configs.bit_config import BitConfig
    from hawq_tpu.models.inceptionv3 import _unit_reduction_a

    rng = np.random.RandomState(13)
    cin = 288                                  # hardcoded by the genuine unit
    b1 = types.SimpleNamespace(conv_list=types.SimpleNamespace(
        conv1=_convbn(cin, 384, 3, 2, 0, rng)))
    b2 = types.SimpleNamespace(conv_list=types.SimpleNamespace(
        conv1=_convbn(cin, 64, 1, 1, 0, rng),
        conv2=_convbn(64, 96, 3, 1, 1, rng),
        conv3=_convbn(96, 96, 3, 2, 0, rng)))
    model_ns = types.SimpleNamespace(branches=types.SimpleNamespace(
        branch1=b1, branch2=b2))
    unit = QIn.Q_ReductionAUnit(model_ns, in_channels=cin, out_channels=768)
    layer = _unit_reduction_a(BitConfig(name='red_a_anchor', table={}),
                              'features.stage2.unit1', 'unit1')
    _anchor_inception_unit(unit, layer, cin, hw=9, seed=13)


@pytest.mark.slow
def test_genuine_inception_c_unit_matches_repo_unit():
    """Genuine Q_InceptionCUnit — the Q_ConvSeq3x3Branch split (parallel
    1×3 / 3×1 convs concatenated with per-branch scales and a nested
    rescaling QuantAct) — vs the repo's _unit_c: bit-identical."""
    _import_reference()
    QIn = importlib.import_module('refutils.models.q_inceptionv3')
    from hawq_tpu.configs.bit_config import BitConfig
    from hawq_tpu.models.inceptionv3 import _unit_c

    rng = np.random.RandomState(14)
    cin = 64
    b1 = types.SimpleNamespace(conv=_convbn(cin, 320, 1, 1, 0, rng))
    b2 = types.SimpleNamespace(
        conv_list=types.SimpleNamespace(conv1=_convbn(cin, 384, 1, 1, 0, rng)),
        conv1x3=_convbn(384, 384, (1, 3), 1, (0, 1), rng),
        conv3x1=_convbn(384, 384, (3, 1), 1, (1, 0), rng))
    b3 = types.SimpleNamespace(
        conv_list=types.SimpleNamespace(
            conv1=_convbn(cin, 448, 1, 1, 0, rng),
            conv2=_convbn(448, 384, 3, 1, 1, rng)),
        conv1x3=_convbn(384, 384, (1, 3), 1, (0, 1), rng),
        conv3x1=_convbn(384, 384, (3, 1), 1, (1, 0), rng))
    b4 = types.SimpleNamespace(conv=_convbn(cin, 192, 1, 1, 0, rng))
    model_ns = types.SimpleNamespace(branches=types.SimpleNamespace(
        branch1=b1, branch2=b2, branch3=b3, branch4=b4))
    unit = QIn.Q_InceptionCUnit(model_ns, in_channels=cin, out_channels=2048)
    layer = _unit_c(BitConfig(name='c_unit_anchor', table={}),
                    'features.stage3.unit2', 'unit2')
    _anchor_inception_unit(unit, layer, cin, hw=8, seed=14)


@pytest.mark.slow
def test_genuine_inception_b_unit_matches_repo_unit():
    """Genuine Q_InceptionBUnit (1×7/7×1 factorized-conv branches) vs the
    repo's _unit_b: same scale, borderline-flip-bounded integers."""
    _import_reference()
    QIn = importlib.import_module('refutils.models.q_inceptionv3')
    from hawq_tpu.configs.bit_config import BitConfig
    from hawq_tpu.models.inceptionv3 import _unit_b

    rng = np.random.RandomState(15)
    cin, mid = 768, 128                 # hardcoded in=out=768 in the genuine
    b1 = types.SimpleNamespace(conv=_convbn(cin, 192, 1, 1, 0, rng))
    b2 = types.SimpleNamespace(conv_list=types.SimpleNamespace(
        conv1=_convbn(cin, mid, 1, 1, 0, rng),
        conv2=_convbn(mid, mid, (1, 7), 1, (0, 3), rng),
        conv3=_convbn(mid, 192, (7, 1), 1, (3, 0), rng)))
    b3 = types.SimpleNamespace(conv_list=types.SimpleNamespace(
        conv1=_convbn(cin, mid, 1, 1, 0, rng),
        conv2=_convbn(mid, mid, (7, 1), 1, (3, 0), rng),
        conv3=_convbn(mid, mid, (1, 7), 1, (0, 3), rng),
        conv4=_convbn(mid, mid, (7, 1), 1, (3, 0), rng),
        conv5=_convbn(mid, 192, (1, 7), 1, (0, 3), rng)))
    b4 = types.SimpleNamespace(conv=_convbn(cin, 192, 1, 1, 0, rng))
    model_ns = types.SimpleNamespace(branches=types.SimpleNamespace(
        branch1=b1, branch2=b2, branch3=b3, branch4=b4))
    unit = QIn.Q_InceptionBUnit(model_ns, in_channels=cin, out_channels=768,
                                mid_channels=mid)
    layer = _unit_b(BitConfig(name='b_unit_anchor', table={}),
                    'features.stage2.unit2', mid, 'unit2')
    _anchor_inception_unit(unit, layer, cin, hw=8, seed=15)


@pytest.mark.slow
def test_genuine_reduction_b_unit_matches_repo_unit():
    """Genuine Q_ReductionBUnit (factorized 7-convs then strided 3×3s + the
    max-pool branch) vs the repo's _unit_reduction_b."""
    _import_reference()
    QIn = importlib.import_module('refutils.models.q_inceptionv3')
    from hawq_tpu.configs.bit_config import BitConfig
    from hawq_tpu.models.inceptionv3 import _unit_reduction_b

    rng = np.random.RandomState(16)
    cin = 768                           # hardcoded by the genuine unit
    b1 = types.SimpleNamespace(conv_list=types.SimpleNamespace(
        conv1=_convbn(cin, 192, 1, 1, 0, rng),
        conv2=_convbn(192, 320, 3, 2, 0, rng)))
    b2 = types.SimpleNamespace(conv_list=types.SimpleNamespace(
        conv1=_convbn(cin, 192, 1, 1, 0, rng),
        conv2=_convbn(192, 192, (1, 7), 1, (0, 3), rng),
        conv3=_convbn(192, 192, (7, 1), 1, (3, 0), rng),
        conv4=_convbn(192, 192, 3, 2, 0, rng)))
    model_ns = types.SimpleNamespace(branches=types.SimpleNamespace(
        branch1=b1, branch2=b2))
    unit = QIn.Q_ReductionBUnit(model_ns, in_channels=cin,
                                out_channels=1280)
    layer = _unit_reduction_b(BitConfig(name='red_b_anchor', table={}),
                              'features.stage3.unit1', 'unit1')
    _anchor_inception_unit(unit, layer, cin, hw=9, seed=16)


@pytest.mark.slow
def test_genuine_incept_init_block_matches_repo():
    """Genuine Q_InceptInitBlock (5-conv chain + 2 maxpools + the model's
    input quantizer, q_inceptionv3.py:575-650) vs the repo's init section
    (QInceptionV3 lines 321-334, replicated here as a standalone probe with
    the same module names)."""
    _import_reference()
    QIn = importlib.import_module('refutils.models.q_inceptionv3')
    from flax import linen as fnn
    from hawq_tpu.configs.bit_config import BitConfig
    from hawq_tpu.models.inceptionv3 import _InceptConv, _qact
    from hawq_tpu.nn import layers as L

    rng = np.random.RandomState(17)
    model_ns = types.SimpleNamespace(
        conv1=_convbn(3, 32, 3, 2, 0, rng),
        conv2=_convbn(32, 32, 3, 1, 0, rng),
        conv3=_convbn(32, 64, 3, 1, 1, rng),
        conv4=_convbn(64, 80, 1, 1, 0, rng),
        conv5=_convbn(80, 192, 3, 1, 0, rng))
    unit = QIn.Q_InceptInitBlock(model_ns, in_channels=3, out_channels=192)
    for name, m in unit.named_modules():
        if isinstance(m, QM.QuantAct):
            m.activation_bit = 8
            m.quant_mode = 'symmetric'
        elif isinstance(m, QM.QuantBnConv2d):
            m.weight_bit = 8
            m.per_channel = True
            m.bias_bit = 32
            m.quantize_bias = True
            m.quant_mode = 'symmetric'

    x_np = (rng.rand(2, 3, 75, 75).astype(np.float32)) * 2.0 - 1.0
    xt = torch.from_numpy(x_np)
    with torch.no_grad():
        for i in range(3):
            unit(xt * (1.0 + 0.1 * i))
    QM.freeze_model(unit)
    with torch.no_grad():
        t_out, t_scale = unit(xt)
    t_int = np.transpose(
        torch.round(t_out / t_scale.view(-1)).numpy(), (0, 2, 3, 1))

    cfg = BitConfig(name='init_anchor', table={})

    class Probe(fnn.Module):
        @fnn.compact
        def __call__(self, x, *, folded=True, update_stats=False):
            ip = 'features.q_init_block'
            x, a_sf = _qact(cfg, f'{ip}.q_input_activ', 'q_input_activ')(
                x, update_stats=update_stats)
            for i, (c, k, s, p) in enumerate(
                    zip((32, 32, 64, 80, 192), (3, 3, 3, 1, 3),
                        (2, 1, 1, 1, 1), (0, 0, 1, 0, 0)), start=1):
                x, a_sf = _InceptConv(cfg=cfg, prefix=f'{ip}.q_conv{i}',
                                      features=c, kernel=k, stride=s,
                                      padding=p, name=f'q_conv{i}')(
                                          x, a_sf, folded=folded,
                                          update_stats=update_stats)
                if i in (3, 5):
                    x, a_sf = L.quant_max_pool(x, a_sf, (3, 3), (2, 2),
                                               'VALID')
            return x, a_sf

    layer = Probe()
    xj = jnp.asarray(np.transpose(x_np, (0, 2, 3, 1)))
    v = jax.tree.map(np.array, jax.device_get(layer.init(
        jax.random.PRNGKey(0), xj, folded=True, update_stats=False)))

    def flax_path(n):
        return n.split('.')

    def node(tree, path):
        for part in path[:-1]:
            tree = tree[part]
        return tree, path[-1]

    for name, m in unit.named_modules():
        if isinstance(m, QM.QuantBnConv2d):
            parent, leaf = node(v['params'], flax_path(name))
            parent[leaf]['kernel'] = np.transpose(
                m.conv.weight.detach().numpy(), (2, 3, 1, 0))
            parent[leaf]['gamma'] = m.bn.weight.detach().numpy()
            parent[leaf]['beta'] = m.bn.bias.detach().numpy()
            bparent, bleaf = node(v['batch_stats'], flax_path(name))
            bparent[bleaf]['mean'] = m.bn.running_mean.numpy()
            bparent[bleaf]['var'] = m.bn.running_var.numpy()
        elif isinstance(m, QM.QuantAct):
            qparent, qleaf = node(v['quant_stats'], flax_path(name))
            qparent[qleaf]['x_min'] = np.float32(m.x_min.item())
            qparent[qleaf]['x_max'] = np.float32(m.x_max.item())

    out, out_scale = layer.apply(v, xj, folded=True, update_stats=False)
    _assert_unit_match(np.round(np.asarray(out) / float(out_scale)),
                       t_int.astype(np.float64), out_scale, t_scale,
                       'init_block', max_abs=4, max_rate=0.01)


@pytest.mark.slow
def test_genuine_full_mobilenetv2_matches_repo_model():
    """FULL-model anchor for family #2: the genuine Q_MobileNetV2
    (q_mobilenetv2.py:93-211) at tiny channel lists vs the repo's
    QMobileNetV2 with identical weights/BN/ranges — init block, three
    inverted-residual units (incl. the residual and strided forms), final
    block, integer global avg-pool, and the QuantConv2d 1×1 head."""
    _import_reference()
    QMn = importlib.import_module('refutils.models.q_mobilenetv2')
    from hawq_tpu.configs.bit_config import BitConfig
    from hawq_tpu.models.mobilenetv2 import QMobileNetV2

    rng = np.random.RandomState(18)
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
    for name, m in gm.named_modules():
        if isinstance(m, QM.QuantAct):
            m.activation_bit = 8
            m.quant_mode = 'symmetric'
        elif isinstance(m, (QM.QuantBnConv2d, QM.QuantConv2d)):
            m.weight_bit = 8
            m.per_channel = True
            m.bias_bit = 32
            m.quantize_bias = True
            m.quant_mode = 'symmetric'

    x_np = (rng.rand(2, 3, 32, 32).astype(np.float32)) * 2.0 - 1.0
    xt = torch.from_numpy(x_np)
    with torch.no_grad():
        for i in range(3):
            gm(xt * (1.0 + 0.1 * i))
    QM.freeze_model(gm)
    with torch.no_grad():
        t_logits = gm(xt).numpy()
    out_scale_vec = (gm.output.conv_scaling_factor.numpy()
                     * np.float32(gm.quant_act_output
                                  .act_scaling_factor.item()))
    t_int = np.round(t_logits / out_scale_vec.reshape(1, -1))

    cfg = BitConfig(name='mnv2_full_anchor', table={})
    rm = QMobileNetV2(cfg=cfg, num_classes=ncls, stages=stages,
                      init_ch=init_ch, final_ch=final_ch)
    xj = jnp.asarray(np.transpose(x_np, (0, 2, 3, 1)))
    v = jax.tree.map(np.array, jax.device_get(rm.init(
        jax.random.PRNGKey(0), xj, folded=True, update_stats=False)))

    def flax_path(n):
        parts = n.split('.')
        if parts[0] == 'features':
            if parts[1].startswith('stage'):
                return [f'{parts[1]}_{parts[2]}'] + parts[3:]
            return parts[1:]                       # features.final_block
        return parts

    def node(tree, path):
        for part in path[:-1]:
            tree = tree[part]
        return tree, path[-1]

    for name, m in gm.named_modules():
        if not isinstance(m, (QM.QuantBnConv2d, QM.QuantConv2d, QM.QuantAct)):
            continue
        path = flax_path(name)
        if isinstance(m, QM.QuantBnConv2d):
            parent, leaf = node(v['params'], path)
            parent[leaf]['kernel'] = np.transpose(
                m.conv.weight.detach().numpy(), (2, 3, 1, 0))
            parent[leaf]['gamma'] = m.bn.weight.detach().numpy()
            parent[leaf]['beta'] = m.bn.bias.detach().numpy()
            bparent, bleaf = node(v['batch_stats'], path)
            bparent[bleaf]['mean'] = m.bn.running_mean.numpy()
            bparent[bleaf]['var'] = m.bn.running_var.numpy()
        elif isinstance(m, QM.QuantConv2d):
            parent, leaf = node(v['params'], path)
            parent[leaf]['kernel'] = np.transpose(
                m.weight.detach().numpy(), (2, 3, 1, 0))
            parent[leaf]['bias'] = m.bias.detach().numpy()
        elif isinstance(m, QM.QuantAct):
            qparent, qleaf = node(v['quant_stats'], path)
            qparent[qleaf]['x_min'] = np.float32(m.x_min.item())
            qparent[qleaf]['x_max'] = np.float32(m.x_max.item())

    j_logits = np.asarray(rm.apply(v, xj, folded=True, update_stats=False))
    j_int = np.round(j_logits / out_scale_vec.reshape(1, -1))
    _assert_unit_match(j_int, t_int, 1.0, 1.0, 'mnv2_full',
                       max_abs=4, max_rate=0.01)

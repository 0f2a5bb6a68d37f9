"""Reference quantized-checkpoint import + reference-exact replay mode.

Closes the loop with the reference's published artifacts: a
``quantized_checkpoint.pth.tar`` (the five state-dict slices dumped by
/root/reference/quant_train.py:665-670) imports into a FrozenModel
(utils/checkpoint.import_reference_quantized, mirroring the converter
hawq_utils_resnet50.py:426-501) and replays through the engine with the
reference's own 31-bit/float64 dyadic rounding
(build_resnet_engine(requant_mode='reference')).

The oracles here are deliberately independent implementations:
  * a *torch* transliteration of batch_frexp / fixedpoint_fn
    (quant_utils.py:188-213, 390-456) checks hawq_tpu.quant.reference_oracle
    site-by-site on random accumulators;
  * a *numpy* integer graph walk (exact int64 convs + reference_oracle
    requants) checks the jitted reference-mode engine node-by-node and
    end-to-end, bit-for-bit, through residual units — the promise that an
    imported model-zoo checkpoint reproduces the reference's TVM logits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hawq_tpu.configs.bit_config import (get_bit_config, RESNET_UNITS,
                                         RESNET_CONVS_PER_UNIT)
from hawq_tpu.inference.engine import build_resnet_engine
from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
from hawq_tpu.models.resnet import _STAGE_CHANNELS, _INIT_FEATURES
from hawq_tpu.quant import reference_oracle as ro
from hawq_tpu.utils import checkpoint as ckpt

torch = pytest.importorskip('torch')

ARCH = 'tiny50'
NCLS = 16


# ---------------------------------------------------------------------------
# FrozenModel -> reference five-slice state dict (the inverse of the importer,
# used to fabricate reference-format checkpoints without the reference code)
# ---------------------------------------------------------------------------

def to_reference_state(fm):
    """FrozenModel → the reference's quantized_checkpoint dict.

    Slice assignment follows the genuine module classes: QuantLinear heads
    (resnet quant_output, inception output.q_fc) → fc_scaling_factor; the
    MobileNetV2 QuantConv2d head ('output') → the conv_scaling_factor
    slice of the *extended* dump (the reference's own recipe omits it,
    utils/checkpoint.py _REF_CONV_SLICE); everything else →
    convbn_scaling_factor."""
    state = {s: {} for s in ('convbn_scaling_factor', 'fc_scaling_factor',
                             'conv_scaling_factor', 'weight_integer',
                             'bias_integer', 'act_scaling_factor')}
    for key, t in fm.tensors.items():
        base, kind = key.rsplit('.', 1)
        mkey = 'module.' + base
        if kind == 'weight_int':
            w = np.asarray(t, np.float32)
            if w.ndim == 4:
                w = np.transpose(w, (3, 2, 0, 1))      # HWIO -> OIHW
            else:
                w = np.transpose(w, (1, 0))            # (F,O) -> (O,F)
            state['weight_integer'][mkey + '.weight_integer'] = \
                torch.from_numpy(w.copy())
        elif kind == 'bias_int':
            state['bias_integer'][mkey + '.bias_integer'] = \
                torch.from_numpy(np.asarray(t, np.float32).copy())
        elif kind == 'weight_scale':
            slc = ('fc_scaling_factor'
                   if base in ('quant_output', 'output.q_fc')
                   else 'conv_scaling_factor' if base == 'output'
                   else 'convbn_scaling_factor')
            state[slc][mkey + '.' + slc] = torch.from_numpy(
                np.asarray(t, np.float32).reshape(-1).copy())
        elif kind == 'act_scale':
            state['act_scaling_factor'][mkey + '.act_scaling_factor'] = \
                torch.full((1,), float(t), dtype=torch.float32)
    return state


@pytest.fixture(scope='module')
def frozen():
    return synthetic_frozen_resnet(ARCH, get_bit_config(ARCH, 'uniform8'),
                                   num_classes=NCLS, seed=7)


@pytest.mark.parametrize('arch', ['tiny50', 'tiny18'])
def test_roundtrip_through_reference_format(arch, tmp_path):
    """FrozenModel -> pth.tar five-slice dict -> importer == identity
    (bottleneck and basic-block families)."""
    src = synthetic_frozen_resnet(arch, get_bit_config(arch, 'uniform8'),
                                  num_classes=NCLS, seed=7)
    state = to_reference_state(src)
    path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    torch.save(state, path)
    fm2 = ckpt.load_reference_quantized(path, arch,
                                        get_bit_config(arch, 'uniform8'))
    assert fm2.num_classes == NCLS
    assert set(fm2.tensors) == set(src.tensors)
    for k, v in src.tensors.items():
        got = fm2.tensors[k]
        assert np.asarray(got).dtype == np.asarray(v).dtype, k
        np.testing.assert_array_equal(np.asarray(got), np.asarray(v), err_msg=k)


def test_import_rejects_incomplete_and_nonint(frozen):
    state = to_reference_state(frozen)
    broken = {s: dict(v) for s, v in state.items()}
    k = next(iter(broken['act_scaling_factor']))
    del broken['act_scaling_factor'][k]
    with pytest.raises(ValueError, match='missing'):
        ckpt.import_reference_quantized(broken, ARCH,
                                        get_bit_config(ARCH, 'uniform8'))
    broken = {s: dict(v) for s, v in state.items()}
    k = next(iter(broken['weight_integer']))
    broken['weight_integer'][k] = broken['weight_integer'][k] + 0.25
    with pytest.raises(ValueError, match='non-integer'):
        ckpt.import_reference_quantized(broken, ARCH,
                                        get_bit_config(ARCH, 'uniform8'))


# ---------------------------------------------------------------------------
# oracle vs torch transliteration of the reference functions
# ---------------------------------------------------------------------------

def _torch_batch_frexp(inputs):
    """Transliteration of quant_utils.py:188-213 (cpu)."""
    import decimal
    from decimal import Decimal
    shape = inputs.size()
    m, e = np.frexp(inputs.reshape(-1).numpy())
    m = np.array([int(Decimal(mi * (2 ** 31)).quantize(
        Decimal('1'), rounding=decimal.ROUND_HALF_UP)) for mi in m])
    return (torch.from_numpy(m).view(shape),
            torch.from_numpy(31. - e).view(shape))


def _torch_fixedpoint_case0(z, bits, signed, z_scale, pre_act, pre_w):
    """Transliteration of fixedpoint_fn case 0 (quant_utils.py:390-413),
    channel-last broadcasting (z NHWC, per-channel scales over C)."""
    n = 2 ** (bits - 1) - 1 if signed else 2 ** bits - 1
    z_int = torch.round(z / pre_act / pre_w)
    _a = pre_act.double() * pre_w.double()
    _b = _a.float().double()
    _c = z_scale.float().double()
    new_scale = _b / _c
    m, e = _torch_batch_frexp(new_scale)
    out = z_int.double() * m.double()
    out = torch.round(out / (2.0 ** e))
    lo = float(-n - 1) if signed else 0.0
    return torch.clamp(out.float(), lo, float(n))


def _torch_fixedpoint_case1(z, identity, z_scale, pre_act, pre_w,
                            id_act, id_w):
    """Transliteration of fixedpoint_fn case 1 (quant_utils.py:415-456)."""
    wx_int = torch.round(identity / id_act / id_w)
    _b = (id_act.double() * id_w.double()).float().double()
    _c = z_scale.float().double()
    m1, e1 = _torch_batch_frexp(_b / _c)
    out1 = torch.round(wx_int.double() * m1.double() / (2.0 ** e1))
    wy_int = torch.round((z - identity) / pre_act / pre_w)
    _b = (pre_act.double() * pre_w.double()).float().double()
    m2, e2 = _torch_batch_frexp(_b / _c)
    out2 = torch.round(wy_int.double() * m2.double() / (2.0 ** e2))
    return (out1 + out2).float()


def test_frexp31_matches_reference_decimal():
    rng = np.random.RandomState(0)
    scales = np.concatenate([
        10.0 ** rng.uniform(-6, 2, 64),
        [0.75, 0.5, 1.0, 0.5 + 2.0 ** -32]]).astype(np.float64)
    m, e = ro.frexp31(scales)
    tm, te = _torch_batch_frexp(torch.from_numpy(scales))
    np.testing.assert_array_equal(m, tm.numpy().astype(np.float64))
    np.testing.assert_array_equal(e, te.numpy())
    # exact half-up tie: mantissa 0.5 + 2^-32 -> m*2^31 = 2^30 + 0.5,
    # which Decimal ROUND_HALF_UP takes to 2^30 + 1 (np.rint would give 2^30)
    tie = np.float64(0.5) + np.float64(2.0) ** -32
    m1, e1 = ro.frexp31(np.array([tie]))
    assert m1[0] == 2 ** 30 + 1 and e1[0] == 31.0


def test_requant_ref_matches_torch_case0():
    rng = np.random.RandomState(1)
    for bits, signed in ((8, True), (4, False), (16, True)):
        c = 8
        z_int = rng.randint(-2 ** 20, 2 ** 20, (2, 5, 5, c)).astype(np.float64)
        s_act = np.float32(0.037)
        s_w = (0.001 * (0.5 + rng.rand(c))).astype(np.float32)
        s_out = np.float32(0.05)
        acc_scale = s_w * s_act                          # f32 product (plan)
        got = ro.requant_ref(z_int, acc_scale, s_out, bits, signed)
        z_val = torch.from_numpy(z_int * acc_scale.astype(np.float64))
        want = _torch_fixedpoint_case0(
            z_val.float(), bits, signed, torch.tensor(float(s_out)),
            torch.tensor(float(s_act)), torch.from_numpy(s_w))
        np.testing.assert_array_equal(got, want.numpy().astype(np.float64))


def test_requant_add_ref_matches_torch_case1():
    rng = np.random.RandomState(2)
    c = 8
    main = rng.randint(-2 ** 18, 2 ** 18, (2, 4, 4, c)).astype(np.float64)
    ident = rng.randint(-2 ** 12, 2 ** 12, (2, 4, 4, c)).astype(np.float64)
    s_act, s_out = np.float32(0.021), np.float32(0.013)
    s_w = (0.002 * (0.5 + rng.rand(c))).astype(np.float32)
    id_act = np.float32(0.0042)
    acc_scale = s_w * s_act
    got = ro.requant_add_ref(main, acc_scale, ident, id_act, s_out)
    z = torch.from_numpy(main * acc_scale.astype(np.float64)
                         + ident * np.float64(id_act)).float()
    identity = torch.from_numpy(ident * np.float64(id_act)).float()
    want = _torch_fixedpoint_case1(
        z, identity, torch.tensor(float(s_out)),
        torch.tensor(float(s_act)), torch.from_numpy(s_w),
        torch.tensor(float(id_act)), torch.tensor(1.0))
    np.testing.assert_array_equal(got, want.numpy().astype(np.float64))


# ---------------------------------------------------------------------------
# end-to-end: reference-mode engine == numpy integer graph walk, bit-for-bit
# ---------------------------------------------------------------------------

def _conv_np(x, w, stride, pad):
    """Exact int64 NHWC/HWIO convolution (im2col)."""
    if pad != ((0, 0), (0, 0)):
        x = np.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    kh, kw, cin, cout = w.shape
    b, h, wd, _ = x.shape
    oh = (h - kh) // stride + 1
    ow = (wd - kw) // stride + 1
    cols = np.empty((b, oh, ow, kh * kw * cin), np.int64)
    for i in range(kh):
        for j in range(kw):
            cols[..., (i * kw + j) * cin:(i * kw + j + 1) * cin] = \
                x[:, i:i + oh * stride:stride, j:j + ow * stride:stride, :]
    return cols @ w.reshape(-1, cout).astype(np.int64)


def _maxpool_np(x, k, s, pad):
    x = np.pad(x, ((0, 0), pad[0], pad[1], (0, 0)),
               constant_values=np.iinfo(np.int64).min)
    b, h, w, c = x.shape
    oh, ow = (h - k) // s + 1, (w - k) // s + 1
    out = np.full((b, oh, ow, c), np.iinfo(np.int64).min, np.int64)
    for i in range(k):
        for j in range(k):
            np.maximum(out, x[:, i:i + oh * s:s, j:j + ow * s:s, :], out)
    return out


def _np_reference_forward(fm, images):
    """numpy replay of the engine's int8 route with reference_oracle
    requants — node names match the engine's capture names."""
    cfg, arch = fm.cfg, fm.arch
    nodes = {}
    bottleneck = RESNET_CONVS_PER_UNIT[arch] == 3
    conv1_stride = arch == 'resnet50'
    init_key = ('quant_init_convbn' if bottleneck
                else 'quant_init_block_convbn')

    def act_info(key):
        return (fm.act_scale(key), cfg.act_bits(key),
                cfg.act_mode(key) == 'symmetric')

    def wbs(key):
        return (fm[key + '.weight_int'].astype(np.int64),
                fm[key + '.bias_int'].astype(np.int64),
                fm[key + '.weight_scale'].astype(np.float32))

    from hawq_tpu.configs.bit_config import RESNET_CIFAR_ARCHS
    cifar = arch in RESNET_CIFAR_ARCHS

    s_in = fm.act_scale('quant_input')
    x8 = np.clip(np.floor(images.astype(np.float32) / np.float32(s_in)
                          + np.float32(0.5)), -128, 127).astype(np.int64)
    nodes['input'] = x8

    w, b, ws = wbs(init_key)
    if cifar:       # 3×3/s1/pad1 init, no maxpool (quantized_resnet_v1.py:334)
        acc = _conv_np(x8, w, 1, ((1, 1), (1, 1))) + b
    else:
        acc = _conv_np(x8, w, 2, ((3, 3), (3, 3))) + b
    s16, b16, sg16 = act_info('quant_act_int32')
    x = ro.requant_ref(acc, ws * np.float32(s_in), s16, b16, sg16)
    x = np.maximum(x, 0).astype(np.int64)
    if not cifar:
        x = _maxpool_np(x, 3, 2, ((1, 1), (1, 1)))
    nodes['init'] = x
    prev_scale = np.float32(s16)

    for si, n_units in enumerate(RESNET_UNITS[arch], start=1):
        for u in range(1, n_units + 1):
            p = f'stage{si}.unit{u}'
            stride = 2 if (u == 1 and si > 1) else 1
            has_id = f'{p}.quant_identity_convbn.weight_int' in fm.tensors
            sa, ba, sg_a = act_info(f'{p}.quant_act')
            xa = ro.requant_ref(x, prev_scale, sa, ba, sg_a).astype(np.int64)
            nodes[f'{p}.input'] = xa

            if has_id:
                wi, bi, wsi = wbs(f'{p}.quant_identity_convbn')
                id_acc = _conv_np(xa, wi, stride, ((0, 0), (0, 0))) + bi
                id_scale = wsi * np.float32(sa)
            else:
                id_acc, id_scale = x, prev_scale

            s1 = stride if (bottleneck and conv1_stride) else \
                (1 if bottleneck else stride)
            s2 = 1 if (bottleneck and conv1_stride) else \
                (stride if bottleneck else 1)
            pad1 = ((0, 0), (0, 0)) if bottleneck else ((1, 1), (1, 1))

            w, b, ws = wbs(f'{p}.quant_convbn1')
            acc = _conv_np(xa, w, s1, pad1) + b
            acc = np.maximum(acc, 0)
            sa1, ba1, sg1 = act_info(f'{p}.quant_act1')
            h = ro.requant_ref(acc, ws * np.float32(sa), sa1, ba1,
                               sg1).astype(np.int64)
            nodes[f'{p}.conv1'] = h
            a_scale = None

            if bottleneck:
                w, b, ws2 = wbs(f'{p}.quant_convbn2')
                acc = np.maximum(_conv_np(h, w, s2, ((1, 1), (1, 1))) + b, 0)
                sa2, ba2, sg2 = act_info(f'{p}.quant_act2')
                h = ro.requant_ref(acc, ws2 * np.float32(sa1), sa2, ba2,
                                   sg2).astype(np.int64)
                nodes[f'{p}.conv2'] = h
                w, b, ws3 = wbs(f'{p}.quant_convbn3')
                acc = _conv_np(h, w, 1, ((0, 0), (0, 0))) + b
                a_scale = ws3 * np.float32(sa2)
            else:
                w, b, ws2 = wbs(f'{p}.quant_convbn2')
                acc = _conv_np(h, w, s2, ((1, 1), (1, 1))) + b
                a_scale = ws2 * np.float32(sa1)

            s_out, _, _ = act_info(f'{p}.quant_act_int32')
            x = ro.requant_add_ref(acc, a_scale, id_acc, id_scale, s_out)
            x = np.maximum(x, 0).astype(np.int64)
            prev_scale = np.float32(s_out)
            nodes[f'{p}.quant_act_int32'] = x

    hw = x.shape[1] * x.shape[2]
    pooled = x.sum(axis=(1, 2))
    pooled = np.trunc(pooled.astype(np.float32) / np.float32(hw)
                      + np.float32(0.01))
    nodes['avg_pool'] = pooled
    s_fc, b_fc, sg_fc = act_info('quant_act_output')
    f8 = ro.requant_ref(pooled, prev_scale, s_fc, b_fc,
                        sg_fc).astype(np.int64)
    nodes['fc_input'] = f8
    wq = fm['quant_output.weight_int'].astype(np.int64)
    acc = f8 @ wq + fm['quant_output.bias_int'].astype(np.int64)
    out_scale = (fm['quant_output.weight_scale'].astype(np.float32)
                 * np.float32(s_fc))
    nodes['fc_output'] = acc.astype(np.float32) * out_scale
    return nodes


@pytest.mark.parametrize('scheme', ['uniform8', 'uniform4'])
def test_reference_mode_engine_matches_numpy_oracle(scheme):
    """The jitted reference-replay engine is bit-for-bit the numpy oracle at
    every captured node — through residual units, pool, and head."""
    fm = synthetic_frozen_resnet(ARCH, get_bit_config(ARCH, scheme),
                                 num_classes=NCLS, seed=11)
    rng = np.random.RandomState(3)
    images = rng.rand(2, 32, 32, 3).astype(np.float32) * 2.0 - 1.0
    want = _np_reference_forward(fm, images)

    check = ['input', 'init', 'avg_pool', 'fc_input']
    for si, n_units in enumerate(RESNET_UNITS[ARCH], start=1):
        for u in range(1, n_units + 1):
            check += [f'stage{si}.unit{u}.input',
                      f'stage{si}.unit{u}.quant_act_int32']
    with jax.enable_x64():
        for node in check:
            eng = build_resnet_engine(fm, capture=node,
                                      requant_mode='reference')
            got = np.asarray(eng(jnp.asarray(images))).astype(np.int64)
            np.testing.assert_array_equal(
                got, want[node].astype(np.int64),
                err_msg=f'{scheme}:{node}')
        logits = np.asarray(
            build_resnet_engine(fm, requant_mode='reference')(
                jnp.asarray(images)))
    np.testing.assert_array_equal(logits, want['fc_output'])


def test_reference_vs_native_mode_divergence_bounded(frozen):
    """Native (23-bit f32) vs reference (31-bit f64) replay of the same
    imported checkpoint: logits agree to float tolerance and predictions
    match — the argued bound for serving imported checkpoints natively."""
    images = np.random.RandomState(4).rand(4, 32, 32, 3).astype(np.float32)
    native = np.asarray(build_resnet_engine(frozen)(jnp.asarray(images)))
    with jax.enable_x64():
        ref = np.asarray(build_resnet_engine(
            frozen, requant_mode='reference')(jnp.asarray(images)))
    denom = np.maximum(np.abs(ref).max(), 1e-6)
    assert np.abs(native - ref).max() / denom < 0.05
    # predictions must agree except on genuine near-ties of the reference
    for i in range(len(images)):
        if int(native[i].argmax()) != int(ref[i].argmax()):
            top2 = np.sort(ref[i])[-2:]
            assert (top2[1] - top2[0]) / denom < 0.05, \
                f'prediction flipped on a non-tie at sample {i}'


def test_reference_mode_requires_x64(frozen):
    with pytest.raises(RuntimeError, match='x64'):
        eng = build_resnet_engine(frozen, requant_mode='reference')
        eng(jnp.zeros((1, 32, 32, 3), jnp.float32))


@pytest.mark.slow
def test_reference_mode_matches_oracle_at_canary_scale():
    """Reference-exact replay at resnet20_cifar scale — the borderline-
    rounding canary arch (~0.27M weights; see test_engine_parity's jit/eager
    canary): the jitted f64 replay engine must equal the numpy oracle on
    every logit, end to end, where borderline dyadic roundings are
    statistically guaranteed to occur."""
    arch = 'resnet20_cifar'
    fm = synthetic_frozen_resnet(arch, get_bit_config(arch, 'uniform8'),
                                 num_classes=10, seed=23)
    images = (np.random.RandomState(5).rand(2, 32, 32, 3)
              .astype(np.float32)) * 2.0 - 1.0
    want = _np_reference_forward(fm, images)
    with jax.enable_x64():
        logits = np.asarray(build_resnet_engine(
            fm, requant_mode='reference')(jnp.asarray(images)))
    np.testing.assert_array_equal(logits, want['fc_output'])


@pytest.mark.parametrize('family', ['resnet', 'mobilenetv2', 'inceptionv3'])
def test_library_exporter_roundtrip_all_families(family, tmp_path):
    """utils.checkpoint.save_reference_quantized → load_reference_quantized
    == identity for every deployment family (the bidirectional bridge: a
    model trained here can be handed to reference-format tooling and read
    back losslessly)."""
    from hawq_tpu.utils.checkpoint import (save_reference_quantized,
                                           load_reference_quantized)
    if family == 'resnet':
        fm = synthetic_frozen_resnet('tiny50',
                                     get_bit_config('tiny50', 'uniform8'),
                                     num_classes=8, seed=11)
    elif family == 'mobilenetv2':
        from hawq_tpu.inference.synthetic import synthetic_frozen_mobilenet
        fm = synthetic_frozen_mobilenet(
            get_bit_config('mobilenetv2', 'uniform8'), seed=11)
    else:
        from hawq_tpu.inference.synthetic import synthetic_frozen_inception
        fm = synthetic_frozen_inception(
            get_bit_config('inceptionv3', 'uniform8'), seed=11)
    arch = fm.arch
    path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    save_reference_quantized(path, fm)
    fm2 = load_reference_quantized(path, arch, fm.cfg)
    assert fm2.num_classes == fm.num_classes
    assert set(fm2.tensors) == set(fm.tensors)
    for k, v in fm.tensors.items():
        np.testing.assert_array_equal(np.asarray(v), fm2.tensors[k],
                                      err_msg=f'{family}:{k}')

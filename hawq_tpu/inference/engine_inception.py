"""Freeze + integer inference engine for quantized InceptionV3.

The deployment analog of the reference's quantized_inception.py Relay graph
(/root/reference/tvm_benchmark/mixed_precision_models/quantized_inception.py
:47-437), built directly from the same branch specifications the QAT model
uses (hawq_tpu/models/inceptionv3.py build_unit), so graph structure lives
in exactly one place.

The multi-branch concat requant: each branch produces an integer tensor at
its own scale; the engine requantizes every branch output to the unit's
shared scale with its own dyadic multiplier *before* concatenation —
numerically identical to the training graph's per-channel-slice requant of
the concatenated tensor (QuantAct branch case, nn/layers.py).

``conv_mode='f32'`` — the certified-exact f32 route (engine.py notes):
convs whose worst-case accumulator is provably < 2²⁴ run as plain f32
convolutions over integer-valued f32 tensors (XLA lowers them to exact
bf16 MXU passes) and the engine threads f32 end to end; uncertified
layers cast to the integer MXU path locally.  Bit-identical logits
(tests/test_routing.py).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hawq_tpu.configs.bit_config import BitConfig
from hawq_tpu.inference.freeze import (FrozenModel, _freeze_convbn,
                                       _act_scale_from_stats)
from hawq_tpu.inference.engine import (_Plan, _conv_i8, _conv_f32,
                                       _conv_bf16, _requant, _maxpool_int,
                                       act_amax, f32_exact_ok)
from hawq_tpu.models.inceptionv3 import (
    INCEPTION_CHANNELS, build_unit, _Conv1x1Branch, _ConvSeqBranch,
    _MaxPoolBranch, _AvgPoolBranch, _ConvSeq3x3Branch, _cdiv, _ksize, _pad)
from hawq_tpu.quant import ops as qops


def _units(cfg: BitConfig, width_div: int):
    b_idx = 0
    for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
        for j, out_ch in enumerate(stage, start=1):
            unit = build_unit(cfg, i, j, out_ch, b_idx, width_div=width_div)
            if i == 2 and j != 1:
                b_idx += 1
            yield i, j, unit


# ---------------------------------------------------------------------------
# freeze
# ---------------------------------------------------------------------------

def freeze_inceptionv3(variables: Mapping, cfg: BitConfig,
                       num_classes: int = 1000,
                       width_div: int = 1) -> FrozenModel:
    params = variables['params']
    bstats = variables.get('batch_stats', {})
    qstats = variables['quant_stats']
    st = cfg.settings
    tensors: Dict[str, np.ndarray] = {}

    def act(key: str, path) -> np.float32:
        node = qstats
        for part in path:
            node = node[part]
        s = _act_scale_from_stats(node, cfg.act_bits(key), cfg.act_mode(key))
        tensors[key + '.act_scale'] = np.float32(s)
        return s

    def convbn(key: str, path, in_scale: np.float32):
        p, b = params, bstats
        for part in path:
            p = p[part]
            b = b[part]
        out = _freeze_convbn(p, b, cfg.weight_bits(key), st.bias_bit,
                             in_scale, st.per_channel)
        for k, v in out.items():
            tensors[f'{key}.{k}'] = v

    def incept_conv(key_prefix: str, path, in_scale: np.float32):
        """conv+bn then its requant activ; returns the activ scale."""
        convbn(f'{key_prefix}.q_convbn', (*path, 'q_convbn'), in_scale)
        return act(f'{key_prefix}.q_activ', (*path, 'q_activ'))

    ip = 'features.q_init_block'
    s = act(f'{ip}.q_input_activ', ('q_input_activ',))
    for c in range(1, 6):
        s = incept_conv(f'{ip}.q_conv{c}', (f'q_conv{c}',), s)

    for i, j, unit in _units(cfg, width_div):
        p = unit.prefix
        mod = f'stage{i}_unit{j}'
        in_scale = s
        for name, ctor, kwargs in unit.branch_defs:
            bp = f'{p}.branches.{name}'
            path = (mod, name)
            a = act(f'{bp}.q_input_act', (*path, 'q_input_act'))
            if ctor is _Conv1x1Branch:
                incept_conv(f'{bp}.q_conv', (*path, 'q_conv'), a)
            elif ctor is _ConvSeqBranch:
                for c in range(1, len(kwargs['out_channels']) + 1):
                    a = incept_conv(f'{bp}.q_conv_list.q_conv{c}',
                                    (*path, f'q_conv{c}'), a)
            elif ctor is _MaxPoolBranch:
                pass
            elif ctor is _AvgPoolBranch:
                a = act(f'{bp}.q_pool_act', (*path, 'q_pool_act'))
                incept_conv(f'{bp}.q_conv', (*path, 'q_conv'), a)
            elif ctor is _ConvSeq3x3Branch:
                for c in range(1, len(kwargs['out_channels']) + 1):
                    a = incept_conv(f'{bp}.q_conv_list.q_conv{c}',
                                    (*path, f'q_conv{c}'), a)
                incept_conv(f'{bp}.q_conv1x3', (*path, 'q_conv1x3'), a)
                incept_conv(f'{bp}.q_conv3x1', (*path, 'q_conv3x1'), a)
                act(f'{bp}.q_rescaling_activ', (*path, 'q_rescaling_activ'))
        s = act(f'{p}.q_rescaling_activ', (mod, 'q_rescaling_activ'))

    out_sc = act('features.q_concat_activ', ('q_concat_activ',))
    from hawq_tpu.inference.freeze import _freeze_linear
    lin = _freeze_linear(params['q_fc'], cfg.weight_bits('output.q_fc'),
                         st.bias_bit, out_sc, st.per_channel)
    for k, v in lin.items():
        tensors[f'output.q_fc.{k}'] = v

    return FrozenModel(arch='inceptionv3', cfg=cfg, tensors=tensors,
                       num_classes=num_classes)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

def width_div_from_frozen(fm: FrozenModel) -> int:
    """Recover width_div from the init convs' output channels (32/64/192 at
    full width, models/inceptionv3.py:322-323) so consumers can rebuild the
    engine from the artifact alone."""
    probes = {'q_conv1': 32, 'q_conv3': 64, 'q_conv5': 192}
    got = {c: int(fm[f'features.q_init_block.{c}.q_convbn.weight_int']
                  .shape[-1]) for c in probes}
    if got == probes:
        return 1
    # floor division (max(c//w, 4)) makes neighbouring widths collide on
    # small channels; the final concat width (unit C: 320 + 4·384 + 192,
    # models/inceptionv3.py inception_c_unit) disambiguates.
    fc_in = int(fm['output.q_fc.weight_int'].shape[0])
    for w in range(2, 513):
        if (all(_cdiv(full, w) == got[c] for c, full in probes.items())
                and _cdiv(320, w) + 4 * _cdiv(384, w)
                + _cdiv(192, w) == fc_in):
            return w
    raise ValueError(f'cannot infer width_div from channels {got}')


def build_inceptionv3_engine(fm: FrozenModel, width_div: int = 1,
                             capture: Optional[str] = None,
                             routing: Optional[Dict[str, str]] = None,
                             input_mode: str = 'float32',
                             input_hw: Sequence = (299, 299),
                             conv_mode: str = 'int8',
                             wide_dtype=jnp.int32,
                             init_mode: str = 'int8',
                             requant_mode: str = 'native'):
    """``capture`` truncates at a named node and returns its integer tensor
    (debug-unit mode): 'input', 'init', '<unit>.q_rescaling_activ',
    'fc_input'.

    ``routing`` maps 1×1-conv keys to 'xla'|'pallas8'|'pallas4w' (the
    autotune table): pallas-routed 1×1 stride-1 convs run the fully fused
    conv→relu→requant Pallas kernel (kernels/matmul.py via
    inference/routing.py) and stay bit-exact.

    ``input_mode='folded_float32'``: images arrive host-folded
    (fold.fold4_images_3x3s2(x, 0) — (B, fh, fw, 48)); the 3×3/s2 C=3
    q_conv1 runs as its bit-exact 2×2/s1 rewrite (docs/perf_tpu.md).
    ``input_hw`` is the original image size (sets the post-fold slice).

    ``conv_mode='f32'``: the certified-exact f32 route (module docstring);
    activations/branch tensors thread integer-valued f32, convs failing
    the 2²⁴ certificate cast to the integer path locally.

    ``conv_mode='bf16'``: same certificate, bf16 activation containers for
    the ≤8-bit nodes (≤8-bit integers are bf16-exact; engine.py
    _conv_bf16) at half the f32 route's operand HBM traffic; the >8-bit
    nodes stay in ``wide_dtype`` integer containers (16-bit values are NOT
    bf16-exact), and convs they feed take the int32 MXU path exactly as in
    the int8 route.  All inception convs are dense, so the v5e
    grouped-conv bf16-accumulation hazard (engine_mobilenet) cannot arise.

    ``init_mode='f32cert'``: thread ONLY the init block (5 convs + 2
    maxpools, 40% of the b64 runtime) through the certified-f32 route and
    cast back to the integer containers at the stage-1 boundary — captures
    the init-block float win without the whole-graph f32 carrier cost that
    makes conv_mode='f32' lose at b≥16.  ``'bf16cert'``: the same section
    in bf16 containers (half the section's carrier traffic; >8-bit nodes
    stay wide-int).

    ``wide_dtype``: container for the 9–16-bit activation nodes (the
    q_rescaling/16-bit q_activ carriers — the engine's largest tensors).
    ``jnp.int16`` halves their HBM traffic; values are clamped to the
    16-bit requant range so the narrowing is exact (the resnet engine's
    residual_dtype=int16 production choice, applied to this family).

    ``requant_mode='reference'``: replay an imported reference checkpoint
    with the reference's own 31-bit/f64 fixedpoint numerics — including the
    multi-branch concat requant (QuantAct branch case,
    quant_modules.py:275-286), whose per-branch (m, e) pairs come from the
    same decompose_ref constants.  CPU + x64 only; plain int8 route."""
    from hawq_tpu.inference.routing import make_router
    assert conv_mode in ('int8', 'f32', 'bf16'), conv_mode
    assert init_mode in ('int8', 'f32cert', 'bf16cert'), init_mode
    assert requant_mode in ('native', 'reference'), requant_mode
    if requant_mode == 'reference':
        assert (conv_mode == 'int8' and routing is None
                and input_mode == 'float32' and init_mode == 'int8'
                and wide_dtype == jnp.int32), \
            "requant_mode='reference' supports only the plain int8 route"
    cfg = fm.cfg
    # build-time section state: the certified container dtype while tracing
    # the init block under init_mode='f32cert'/'bf16cert' (python control
    # flow — the graph is traced once), None outside the section
    _sect = {'dt': None}
    _SECT_DT = {'f32cert': jnp.float32, 'bf16cert': jnp.bfloat16}
    if wide_dtype == jnp.int16:
        # asymmetric >8-bit ranges ([0, 2^b-1]) would overflow int16; all
        # published configs keep >8-bit nodes symmetric (fits ±32767)
        bad = [k for k in cfg.table
               if cfg.act_bits(k) and cfg.act_bits(k) > 8
               and cfg.act_mode(k) != 'symmetric']
        assert not bad, f'int16 wide container unsafe for {bad[:3]}'
    plan = _Plan(fm, requant_mode)
    route = make_router(fm, routing)
    use_f32 = conv_mode == 'f32'
    use_cert = conv_mode in ('f32', 'bf16')
    cert_conv = _conv_bf16 if conv_mode == 'bf16' else _conv_f32

    folded = input_mode == 'folded_float32'
    if folded:
        from hawq_tpu.inference import fold as _fold
        w_raw = np.asarray(
            fm['features.q_init_block.q_conv1.q_convbn.weight_int'])
        assert w_raw.shape[:2] == (3, 3)
        w_fold = _fold.fold4_kernel_3x3s2(w_raw)
        oh, fh, _ = _fold.fold4_3x3s2_geometry(input_hw[0], 0)  # pad 0, s2
        ow, fw, _ = _fold.fold4_3x3s2_geometry(input_hw[1], 0)

    def _t4(a):
        a = np.asarray(a)
        return np.tile(a, 4) if a.size > 1 else a

    captured = {}

    def emit(name, value):
        if capture is not None and name == capture:
            if jnp.issubdtype(value.dtype, jnp.floating):
                value = value.astype(jnp.int32)    # f32 mode: exact ints
            captured['value'] = value

    # Init-conv route decided at build time; when f32-certified the
    # quantized input stays integer-valued f32 (no lane-padded int8
    # materialization of the C=3 image — engine.py certified-f32 notes).
    _w1_key = 'features.q_init_block.q_conv1.q_convbn'
    _w1 = np.asarray(fm[_w1_key + '.weight_int'])
    _b1 = np.asarray(fm[_w1_key + '.bias_int'])
    if folded:
        init_f32 = ((use_cert or init_mode in _SECT_DT)
                    and f32_exact_ok(w_fold, _t4(_b1), 128.0))
    else:
        init_f32 = ((use_cert or init_mode in _SECT_DT)
                    and f32_exact_ok(_w1, _b1, 128.0))
    init_conv = cert_conv if use_cert else (
        _conv_bf16 if init_mode == 'bf16cert' else _conv_f32)

    def act_info(key):
        return (float(fm.act_scale(key)), cfg.act_bits(key),
                cfg.act_mode(key) == 'symmetric')

    def container(bits):
        if use_f32:
            return jnp.float32
        if _sect['dt'] is not None:             # sectioned init mode
            if _sect['dt'] == jnp.bfloat16 and bits > 8:
                return wide_dtype               # 16-bit not bf16-exact
            return _sect['dt']
        if use_cert and bits <= 8:              # conv_mode='bf16'
            return jnp.bfloat16
        return jnp.int8 if bits <= 8 else wide_dtype

    def requant_to(x_int, from_scale, key, name):
        """→ (tensor, its scale, its max integer magnitude)."""
        s, b, sg = act_info(key)
        mult = plan.requant_mult(name, from_scale, s)
        return (_requant(x_int, mult, b, sg, container(b)),
                np.float32(s), act_amax(b, sg))

    def to_int(h, amax):
        """Cast an integer-valued f32 tensor to the integer MXU input
        container (int8 when the values fit, else int32)."""
        if not jnp.issubdtype(h.dtype, jnp.floating):
            return h
        return h.astype(jnp.int8 if amax <= 128 else jnp.int32)

    def incept_conv(h, a_scale, amax, key_prefix, stride, padding):
        acc_scale = (fm[f'{key_prefix}.q_convbn.weight_scale']
                     .astype(np.float32) * np.float32(a_scale))
        s, b, sg = act_info(f'{key_prefix}.q_activ')
        w8, b32 = plan.conv(f'{key_prefix}.q_convbn')
        if ((use_cert or _sect['dt'] is not None)
                and f32_exact_ok(w8, b32, amax)):
            cc = cert_conv if use_cert else (
                _conv_bf16 if _sect['dt'] == jnp.bfloat16 else _conv_f32)
            acc = cc(h, w8, (stride, stride), _pad(padding)) + b32
            acc = jnp.maximum(acc, 0)
            return requant_to(acc, acc_scale, f'{key_prefix}.q_activ',
                              f'{key_prefix}.rq')
        h = to_int(h, amax)
        r = (route(f'{key_prefix}.q_convbn')
             if stride == 1 and padding == 0 and b <= 8
             and h.dtype == jnp.int8 else None)
        if r is not None:
            # fully fused conv → relu → dyadic requant (bit-exact: requant
            # is monotone with requant(0) == 0, see inference/routing.py)
            mult = plan.requant_mult(f'{key_prefix}.rq', acc_scale, s)
            out = r.requant(h, mult, out_bits=b, signed=sg, relu=True)
            if use_f32:
                out = out.astype(jnp.float32)
            return out, np.float32(s), act_amax(b, sg)
        acc = _conv_i8(h, w8, (stride, stride), _pad(padding)) + b32
        acc = jnp.maximum(acc, 0)           # relu before requant (monotone)
        return requant_to(acc, acc_scale, f'{key_prefix}.q_activ',
                          f'{key_prefix}.rq')

    def int_avgpool_3x3(x_int):
        if jnp.issubdtype(x_int.dtype, jnp.floating):
            # bf16 containers sum in f32 (9·255 needs 12 significand bits)
            summed = jax.lax.reduce_window(
                x_int.astype(jnp.float32), jnp.float32(0), jax.lax.add,
                (1, 3, 3, 1), (1, 1, 1, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)))
            return jnp.trunc(qops.exact_div(summed, 9.0) + 0.01)
        summed = jax.lax.reduce_window(
            x_int.astype(jnp.int32), jnp.int32(0), jax.lax.add,
            (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jnp.trunc(qops.exact_div(summed.astype(jnp.float32), 9.0)
                         + 0.01).astype(jnp.int32)

    def forward(images: jnp.ndarray) -> jnp.ndarray:
        _sect['dt'] = None if use_cert else _SECT_DT.get(init_mode)
        ip = 'features.q_init_block'
        s_in, b_in, _ = act_info(f'{ip}.q_input_activ')
        n = 2 ** (b_in - 1) - 1
        x = jnp.clip(qops.round_half_up(qops.exact_div(images, s_in)),
                     -n - 1, n)
        if not init_f32:
            x = x.astype(jnp.int8)
        emit('input', x.astype(jnp.int8))
        s = np.float32(s_in)
        am = float(n + 1)
        strides = {1: 2, 2: 1, 3: 1, 4: 1, 5: 1}
        pads = {1: 0, 2: 0, 3: 1, 4: 0, 5: 0}
        for c in range(1, 6):
            key = f'{ip}.q_conv{c}'
            if folded and c == 1:
                # 2×2/s1 folded rewrite of the 3×3/s2 C=3 conv; relu +
                # requant in folded layout, then depth-to-space + slice
                from hawq_tpu.inference import fold as _fold
                assert x.shape[1:3] == (fh, fw), (
                    f'folded input {x.shape[1:3]} does not match input_hw='
                    f'{tuple(input_hw)} (expect {(fh, fw)} folded rows)')
                if init_f32:
                    acc = init_conv(x, w_fold, (1, 1), 'VALID') + _t4(_b1)
                else:
                    acc = _conv_i8(x, w_fold, (1, 1), 'VALID') + _t4(_b1)
                acc = jnp.maximum(acc, 0)
                acc_scale = (fm[f'{key}.q_convbn.weight_scale']
                             .astype(np.float32) * np.float32(s))
                sq, bq, sg = act_info(f'{key}.q_activ')
                mult = plan.requant_mult(f'{key}.rq_f', _t4(acc_scale), sq)
                xq = _requant(acc, mult, bq, sg, container(bq))
                x = _fold.depth_to_space_2x2(xq)[:, :oh, :ow, :]
                s, am = np.float32(sq), act_amax(bq, sg)
            elif c == 1 and init_f32:
                # float-threaded input into the certified init conv
                acc = init_conv(x, _w1, (strides[c], strides[c]),
                                _pad(pads[c])) + _b1
                acc = jnp.maximum(acc, 0)
                acc_scale = (fm[f'{key}.q_convbn.weight_scale']
                             .astype(np.float32) * np.float32(s))
                x, s, am = requant_to(acc, acc_scale, f'{key}.q_activ',
                                      f'{key}.rq')
            else:
                x, s, am = incept_conv(x, s, am, key, strides[c], pads[c])
            if c in (3, 5):
                x = _maxpool_int(x, (3, 3), (2, 2), ((0, 0), (0, 0)))
        if _sect['dt'] is not None:
            # end of the sectioned init: back to integer containers
            # (exact: the float tensor holds the q_conv5 requant's integers)
            _sect['dt'] = None
            x = x.astype(container(act_info(f'{ip}.q_conv5.q_activ')[1]))
        emit('init', x)

        for i, j, unit in _units(cfg, width_div):
            p = unit.prefix
            outs, scales = [], []
            for name, ctor, kwargs in unit.branch_defs:
                bp = f'{p}.branches.{name}'
                h, a, ham = requant_to(x, s, f'{bp}.q_input_act',
                                       f'{bp}.in')
                if ctor is _Conv1x1Branch:
                    h, a, ham = incept_conv(h, a, ham, f'{bp}.q_conv', 1, 0)
                elif ctor is _ConvSeqBranch:
                    for c, (st_, pd) in enumerate(
                            zip(kwargs['strides'],
                                kwargs['paddings']), start=1):
                        h, a, ham = incept_conv(
                            h, a, ham, f'{bp}.q_conv_list.q_conv{c}',
                            st_, pd)
                elif ctor is _MaxPoolBranch:
                    h = _maxpool_int(h, (3, 3), (2, 2), ((0, 0), (0, 0)))
                elif ctor is _AvgPoolBranch:
                    h = int_avgpool_3x3(h)
                    h, a, ham = requant_to(h, a, f'{bp}.q_pool_act',
                                           f'{bp}.pool')
                    h, a, ham = incept_conv(h, a, ham, f'{bp}.q_conv', 1, 0)
                elif ctor is _ConvSeq3x3Branch:
                    for c, (st_, pd) in enumerate(
                            zip(kwargs['strides'],
                                kwargs['paddings']), start=1):
                        h, a, ham = incept_conv(
                            h, a, ham, f'{bp}.q_conv_list.q_conv{c}',
                            st_, pd)
                    y1, a1, am1 = incept_conv(h, a, ham, f'{bp}.q_conv1x3',
                                              1, (0, 1))
                    y2, a2, _ = incept_conv(h, a, ham, f'{bp}.q_conv3x1',
                                            1, (1, 0))
                    r1, ssub, _ = requant_to(y1, a1,
                                             f'{bp}.q_rescaling_activ',
                                             f'{bp}.rs1')
                    r2, _, _ = requant_to(y2, a2, f'{bp}.q_rescaling_activ',
                                          f'{bp}.rs2')
                    h = jnp.concatenate([r1.astype(r2.dtype), r2], axis=-1)
                    a = ssub
                outs.append(h)
                scales.append(a)

            # concat requant: each branch to the unit's shared scale
            cat_dt = container(act_info(f'{p}.q_rescaling_activ')[1])
            pieces, s_unit = [], None
            for bi, (h, a) in enumerate(zip(outs, scales)):
                r, s_unit, _ = requant_to(h, a, f'{p}.q_rescaling_activ',
                                          f'{p}.cat{bi}')
                pieces.append(r if use_f32 else r.astype(cat_dt))
            x = jnp.concatenate(pieces, axis=-1)
            s = s_unit
            emit(f'{p}.q_rescaling_activ', x)

        # head: integer global avg pool → requant → dense
        hw = x.shape[1] * x.shape[2]
        pooled = jnp.sum(
            x, axis=(1, 2),
            dtype=jnp.float32 if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.int32)
        pooled = jnp.trunc(qops.exact_div(pooled.astype(jnp.float32), hw)
                           + 0.01)
        if not use_f32:
            pooled = pooled.astype(jnp.int32)
        f8, s_fc, fam = requant_to(pooled, s, 'features.q_concat_activ',
                                   'fc_in')
        f8 = to_int(f8, fam)
        emit('fc_input', f8)
        w8 = np.asarray(fm['output.q_fc.weight_int'])
        b32 = np.asarray(fm['output.q_fc.bias_int'])
        acc = jax.lax.dot_general(f8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32) + b32
        out_scale = (fm['output.q_fc.weight_scale'].astype(np.float32)
                     * s_fc)
        return acc.astype(jnp.float32) * out_scale

    if capture is None:
        return jax.jit(forward)

    def forward_captured(images):
        forward(images)
        return captured['value']

    return jax.jit(forward_captured)

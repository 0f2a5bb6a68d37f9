"""Integer inference engine for quantized MobileNetV2.

Same design as the ResNet engine (inference/engine.py): the FrozenModel from
freeze_mobilenetv2 closes over one jitted XLA program of int8 depthwise /
pointwise MXU convolutions with dyadic requant epilogues.  The reference
only ships MobileNetV2 as a *float* TVM graph (tvm_benchmark/
mixed_precision_models/mobilenet_v2.py); this engine completes the integer
deployment path the reference lacks.

ReLU6 in the integer domain: relu6 acts on value = acc · acc_scale, so the
accumulator clamp is [0, round_half_up(6 / acc_scale)] per channel — exact
against the QAT graph's float relu6-then-requant (see
hawq_tpu/models/mobilenetv2.py docstring).

``conv_mode='f32'``/``'bf16'`` — the certified-exact float routes
(engine.py notes): every conv whose worst-case accumulator is provably
< 2²⁴ runs over integer-valued f32/bf16 tensors with f32 accumulation;
uncertified layers cast to int8 locally, so correctness never depends on
the certificate.  Logits are bit-identical across conv modes
(tests/test_routing.py).  **Production default is plain int8**: the
round-5 end-to-end A/B (benchmarks/mnv2_variants_b{8,16,64}.json) measured
every alternative slower — per-unit wins from early probes did not survive
XLA's whole-graph scheduling (docs/perf_tpu.md, round-5 MobileNetV2
bound).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hawq_tpu.inference.freeze import FrozenModel
from hawq_tpu.inference.engine import (_Plan, _conv_i8, _conv_f32,
                                       _conv_bf16, _requant, _requant_add,
                                       act_amax, f32_exact_ok)
from hawq_tpu.quant import ops as qops


def _dw_shifted(x8: jnp.ndarray, w8: np.ndarray, stride: int) -> jnp.ndarray:
    """Depthwise 3×3 (pad 1) as nine shifted elementwise int32 MACs.

    XLA's grouped int8 convolution lowers poorly on TPU at depthwise
    shapes (measured: the fused dw+requant is ~14× the bare conv,
    benchmarks/mnv2_stage1_probe.json); the explicit formulation is one
    VPU pass over nine shifted slices — identical int32 sums, same
    zero padding."""
    h, w = x8.shape[1], x8.shape[2]
    oh = (h + 2 - 3) // stride + 1
    ow = (w + 2 - 3) // stride + 1
    xp = jnp.pad(x8.astype(jnp.int32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = np.asarray(w8, np.int32).reshape(3, 3, -1)   # (3, 3, C)
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy:dy + stride * (oh - 1) + 1:stride,
                    dx:dx + stride * (ow - 1) + 1:stride, :]
            term = sl * taps[dy, dx]
            acc = term if acc is None else acc + term
    return acc


def _relu6_clip(acc: jnp.ndarray, acc_scale: np.ndarray) -> jnp.ndarray:
    """Integer-domain ReLU6: clamp acc to [0, round(6/acc_scale)].

    float32 with the same op order as the QAT graph's relu6_int
    (models/mobilenetv2.py) so the bound is computed identically.  Safe on
    an f32 accumulator too: bounds above 2²⁴ (where f32 rounds the int32
    bound) can never clamp a certified-exact accumulator (< 2²⁴)."""
    hi = np.floor(np.float32(6.0) / np.asarray(acc_scale, np.float32)
                  + np.float32(0.5))
    hi = np.minimum(hi, np.float32(2 ** 31 - 1)).astype(np.int64
                                                        ).astype(np.int32)
    return jnp.clip(acc, 0, hi)


def stages_from_frozen(fm: FrozenModel):
    """Recover the stage channel structure from a FrozenModel's tensors
    (the per-unit conv3 output channel counts) — lets consumers rebuild
    the engine from the artifact alone."""
    units = {}
    for k, v in fm.tensors.items():
        if k.startswith('features.stage') and k.endswith('.conv3.weight_int'):
            head = k.split('.')[1:3]               # ['stageI', 'unitJ']
            i, j = int(head[0][5:]), int(head[1][4:])
            units[(i, j)] = int(v.shape[-1])
    stages = []
    for i in sorted({i for i, _ in units}):
        stages.append([units[(i, j)]
                       for j in sorted(j for i2, j in units if i2 == i)])
    return tuple(tuple(s) for s in stages)


def build_mobilenetv2_engine(fm: FrozenModel, stages: Sequence,
                             residual_dtype=jnp.int32,
                             capture: Optional[str] = None,
                             routing: Optional[dict] = None,
                             input_mode: str = 'float32',
                             input_hw: Sequence = (224, 224),
                             conv_mode: str = 'int8',
                             init_mode: str = 'int8',
                             dw_mode: Optional[str] = None,
                             requant_mode: str = 'native'):
    """Compile a frozen QMobileNetV2 into fn(images f32 NHWC) → logits.

    ``capture`` truncates the graph at a named node and returns its raw
    integer tensor (the debug-unit golden-featuremap mechanism, as in the
    ResNet engine): 'input', 'init', '<unit>.conv1', '<unit>.conv2',
    '<unit>.quant_act_int32', 'final', 'fc_input'.

    ``routing`` maps 1×1-conv keys to 'xla'|'pallas8'|'pallas4w' (the
    autotune table, inference/autotune.py): pallas-routed convs run the
    fused kernels from kernels/matmul.py via the `*_acc` variants — the
    ReLU6/residual epilogues stay XLA (see inference/routing.py) — and
    remain bit-exact.

    ``input_mode='folded_float32'``: images arrive host-folded
    (inference/fold.py fold4_images_3x3s2(x, 1) — (B, fh, fw, 48)) and the
    3×3/s2 C=3 init conv runs as its bit-exact 2×2/s1 rewrite, avoiding
    the ~42× C-minor read penalty (docs/perf_tpu.md).  ``input_hw`` is the
    original image size (sets the post-fold slice).

    ``conv_mode='f32'``: the certified-exact f32 route (module docstring).
    ``conv_mode='bf16'``: same certificate, bf16 activation containers
    (≤8-bit integers are bf16-exact) with f32 accumulation — half the
    operand traffic of 'f32'; residual carriers stay ``residual_dtype``
    (16-bit residual values are NOT bf16-exact).

    ``init_mode='bf16cert'``: run ONLY the C=3 init conv through the
    certified bf16 route (skips the int8 lane-pad materialization of the
    C-minor image; the resnet engine's round-5 lever) while the rest of
    the graph keeps ``conv_mode``.

    ``dw_mode`` (int8 engine only): route the depthwise convs off XLA's
    int8 grouped-conv lowering — 'shifted' runs them as nine shifted int32
    VPU MACs (_dw_shifted; bit-identical, measured slower end-to-end on
    v5e: benchmarks/mnv2_variants_b8.json).  'bf16' (explicit-bf16 grouped
    conv) is NOT bit-exact on real TPUs — XLA lowers bf16 *grouped* convs
    with bf16 accumulation, unlike the dense f32-certified route — it is
    kept only for the CPU-backend measurement record; the engine rejects
    it on TPU devices.

    ``requant_mode='reference'``: replay an imported reference checkpoint
    with the reference's own 31-bit/f64 fixedpoint numerics (engine.py
    notes; CPU + x64 only — plain int8 route)."""
    from hawq_tpu.inference.routing import make_router
    assert conv_mode in ('int8', 'f32', 'bf16'), conv_mode
    assert init_mode in ('int8', 'bf16cert'), init_mode
    assert dw_mode in (None, 'bf16', 'shifted'), dw_mode
    if dw_mode == 'bf16':
        # measured NOT bit-exact on v5e (bf16 grouped convs accumulate in
        # bf16 there, unlike dense convs) — permit only off-TPU
        assert jax.devices()[0].platform not in ('tpu', 'axon'), \
            "dw_mode='bf16' is not exact on TPU (bf16 grouped-conv " \
            'accumulation) — use dw_mode=None or conv_mode defaults'
    assert requant_mode in ('native', 'reference'), requant_mode
    if requant_mode == 'reference':
        assert (conv_mode == 'int8' and init_mode == 'int8'
                and dw_mode is None and routing is None
                and residual_dtype == jnp.int32
                and input_mode == 'float32'), \
            "requant_mode='reference' supports only the plain int8 route"
    cfg = fm.cfg
    plan = _Plan(fm, requant_mode)
    route = make_router(fm, routing)
    use_f32 = conv_mode == 'f32'
    use_cert = conv_mode in ('f32', 'bf16')
    cert_conv = _conv_bf16 if conv_mode == 'bf16' else _conv_f32
    # activation containers / residual carriers in f32 mode stay f32 —
    # integer-valued, so every narrowing below is exact
    act_dt = {'f32': jnp.float32, 'bf16': jnp.bfloat16,
              'int8': jnp.int8}[conv_mode]
    res_dt = jnp.float32 if use_f32 else residual_dtype
    fin_dt = jnp.float32 if use_cert else jnp.int32

    folded = input_mode == 'folded_float32'
    if folded:
        from hawq_tpu.inference import fold as _fold
        w_raw = np.asarray(fm['init_block.weight_int'])
        assert w_raw.shape[:2] == (3, 3), 'fold requires the 3×3/s2 init'
        w_fold = _fold.fold4_kernel_3x3s2(w_raw)
        oh, fh, _ = _fold.fold4_3x3s2_geometry(input_hw[0], 1)
        ow, fw, _ = _fold.fold4_3x3s2_geometry(input_hw[1], 1)

    def _t4(a):
        a = np.asarray(a)
        return np.tile(a, 4) if a.size > 1 else a

    def conv_acc(x, key, amax, strides=(1, 1), padding='VALID', groups=1):
        """conv + int32 bias: certified-f32, pallas-routed, or XLA int8.

        ``amax`` is the largest input-integer magnitude (the producing
        requant's clip bound) — it certifies the f32 route per layer."""
        w8, b32 = plan.conv(key)
        # Grouped (depthwise) convs are excluded from the bf16-container
        # certificate: on v5e XLA accumulates bf16 *grouped* convs in bf16
        # (measured inexact — mnv2_variants notes); the f32-dtype route
        # stays certified (XLA's dense/grouped f32 convs accumulate f32).
        cert_here = (use_cert and f32_exact_ok(w8, b32, amax)
                     and (groups == 1 or conv_mode == 'f32'))
        if cert_here:
            return cert_conv(x, w8, strides, padding, groups) + b32
        if dw_mode is not None and groups > 1 and f32_exact_ok(w8, b32,
                                                              amax):
            # depthwise certifies essentially always (K=9: bound
            # 9·127·amax + |bias| ≪ 2²⁴) — route off the slow int8
            # grouped-conv lowering, bit-identically
            if dw_mode == 'bf16':
                return _conv_bf16(x, w8, strides, padding, groups) + b32
            x8 = x if x.dtype == jnp.int8 else x.astype(jnp.int8)
            return _dw_shifted(x8, w8, strides[0]) + b32
        x8 = x if x.dtype == jnp.int8 else x.astype(jnp.int8)
        if strides == (1, 1) and groups == 1 and w8.shape[0] == 1:
            r = route(key)
            if r is not None:
                return r.acc(x8)
        return _conv_i8(x8, w8, strides, padding, groups=groups) + b32

    s_in = fm.act_scale('quant_input')

    # Init-conv route decided at build time.  When it's f32-certified the
    # quantized input stays an integer-valued f32 tensor: materializing the
    # (B, H, W, 3) int8 tensor costs a 42× lane-padded round-trip (C=3 →
    # 128 lanes at int8's (32, 128) tiling) that the f32 conv never needs.
    w8_init, b32_init = plan.conv('init_block')
    if folded:
        init_f32 = ((use_cert or init_mode == 'bf16cert')
                    and f32_exact_ok(w_fold, _t4(b32_init), 128.0))
    else:
        init_f32 = ((use_cert or init_mode == 'bf16cert')
                    and f32_exact_ok(w8_init, b32_init, 128.0))
    init_cert_conv = cert_conv if use_cert else _conv_bf16

    def act_info(key):
        return (float(fm.act_scale(key)), cfg.act_bits(key),
                cfg.act_mode(key) == 'symmetric')

    def relu6(acc, acc_scale, w_scale, a_scale):
        """Integer-domain ReLU6 clamp; in reference-replay mode the bound
        reproduces the genuine graph exactly: the clamped float 6.0 maps to
        z_int = torch.round(6.0 / s_act / s_w) — two sequential f32
        divisions, round-half-even (fixedpoint_fn, quant_utils.py:392) —
        instead of the native round-half-up over the fused product."""
        if requant_mode == 'reference':
            hi = np.rint(np.float32(6.0) / np.float32(a_scale)
                         / np.asarray(w_scale, np.float32))
            hi = np.minimum(hi, np.float32(2 ** 31 - 1)
                            ).astype(np.int64).astype(np.int32)
            return jnp.clip(acc, 0, hi)
        return _relu6_clip(acc, acc_scale)

    captured = {}

    def emit(name, value):
        if capture is not None and name == capture:
            if jnp.issubdtype(value.dtype, jnp.floating):
                value = value.astype(jnp.int32)    # f32 mode: exact ints
            captured['value'] = value

    def forward(images: jnp.ndarray) -> jnp.ndarray:
        x8 = jnp.clip(qops.round_half_up(qops.exact_div(images, s_in)),
                      -128, 127)
        if not init_f32:
            x8 = x8.astype(jnp.int8)
        emit('input', x8.astype(jnp.int8))

        # init block: conv 3×3/s2 → relu6 → requant (16-bit node)
        acc_scale = (fm['init_block.weight_scale'].astype(np.float32)
                     * np.float32(s_in))
        s16, b16, sg16 = act_info('quant_act_int32')
        if folded:
            # 2×2/s1 folded rewrite; relu6 + requant in folded layout
            # (per-channel vectors tiled over the 4 stride-2 origins),
            # depth-to-space on the narrow dtype, slice odd tails
            from hawq_tpu.inference import fold as _fold
            assert x8.shape[1:3] == (fh, fw), (
                f'folded input {x8.shape[1:3]} does not match input_hw='
                f'{tuple(input_hw)} (expect {(fh, fw)} folded rows)')
            if init_f32:
                acc = init_cert_conv(x8, w_fold, (1, 1),
                                     'VALID') + _t4(b32_init)
            else:
                acc = _conv_i8(x8, w_fold, (1, 1), 'VALID') + _t4(b32_init)
            acc = relu6(acc, _t4(acc_scale),
                        _t4(fm['init_block.weight_scale']), s_in)
            mult = plan.requant_mult('init_rq_f', _t4(acc_scale), s16)
            xq = _requant(acc, mult, b16, sg16, res_dt)
            x = _fold.depth_to_space_2x2(xq)[:, :oh, :ow, :]
        else:
            if init_f32:
                acc = init_cert_conv(x8, w8_init, (2, 2), ((1, 1), (1, 1))
                                     ) + b32_init
            else:
                acc = _conv_i8(x8, w8_init, (2, 2), ((1, 1), (1, 1))
                               ) + b32_init
            acc = relu6(acc, acc_scale, fm['init_block.weight_scale'], s_in)
            mult = plan.requant_mult('init_rq', acc_scale, s16)
            x = _requant(acc, mult, b16, sg16, res_dt)
        prev_scale = np.float32(s16)
        emit('init', x)

        in_ch = w8_init.shape[-1]
        for i, stage in enumerate(stages, start=1):
            for j, out_ch in enumerate(stage, start=1):
                p = f'features.stage{i}.unit{j}'
                stride = 2 if (j == 1 and i != 1) else 1
                residual = (in_ch == out_ch) and (stride == 1)

                sa, ba, sga = act_info(f'{p}.quant_act')
                mult = plan.requant_mult(f'{p}.in', prev_scale, sa)
                xa = _requant(x, mult, ba, sga, act_dt)

                # expansion 1×1 → relu6 → requant
                acc = conv_acc(xa, f'{p}.conv1', act_amax(ba, sga))
                acc_scale = (fm[f'{p}.conv1.weight_scale'].astype(np.float32)
                             * np.float32(sa))
                acc = relu6(acc, acc_scale, fm[f'{p}.conv1.weight_scale'], sa)
                sa1, ba1, sg1 = act_info(f'{p}.quant_act1')
                mult = plan.requant_mult(f'{p}.a1', acc_scale, sa1)
                h = _requant(acc, mult, ba1, sg1, act_dt)
                emit(f'{p}.conv1', h)

                # depthwise 3×3 → relu6 → requant
                w8, _ = plan.conv(f'{p}.conv2')
                mid = w8.shape[-1]
                # HWIO depthwise kernel: (3, 3, 1, mid), groups = mid
                acc = conv_acc(h, f'{p}.conv2', act_amax(ba1, sg1),
                               strides=(stride, stride),
                               padding=((1, 1), (1, 1)), groups=mid)
                acc_scale = (fm[f'{p}.conv2.weight_scale'].astype(np.float32)
                             * np.float32(sa1))
                acc = relu6(acc, acc_scale, fm[f'{p}.conv2.weight_scale'], sa1)
                sa2, ba2, sg2 = act_info(f'{p}.quant_act2')
                mult = plan.requant_mult(f'{p}.a2', acc_scale, sa2)
                h = _requant(acc, mult, ba2, sg2, act_dt)
                emit(f'{p}.conv2', h)

                # linear projection 1×1 (no activation)
                acc = conv_acc(h, f'{p}.conv3', act_amax(ba2, sg2))
                acc_scale = (fm[f'{p}.conv3.weight_scale'].astype(np.float32)
                             * np.float32(sa2))

                s_out, b_out, sg_out = act_info(f'{p}.quant_act_int32')
                m_main = plan.requant_mult(f'{p}.res_main', acc_scale, s_out)
                if residual:
                    m_id = plan.requant_mult(f'{p}.res_id', prev_scale, s_out)
                    # wide container first: narrowing an out-of-range sum is
                    # implementation-defined, so clamp before the cast
                    x = _requant_add(
                        acc, m_main, x, m_id,
                        out_dtype=jnp.float32 if use_f32 else jnp.int32)
                    if residual_dtype != jnp.int32:
                        info = jnp.iinfo(residual_dtype)
                        x = jnp.clip(x, info.min, info.max)
                    x = x.astype(res_dt)
                else:
                    x = _requant(acc, m_main, b_out, sg_out, res_dt)
                prev_scale = np.float32(s_out)
                in_ch = out_ch
                emit(f'{p}.quant_act_int32', x)

        # final 1×1 block → relu6 → requant
        sa, ba, sga = act_info('quant_act_before_final_block')
        mult = plan.requant_mult('final_in', prev_scale, sa)
        xa = _requant(x, mult, ba, sga, act_dt)
        acc = conv_acc(xa, 'features.final_block', act_amax(ba, sga))
        acc_scale = (fm['features.final_block.weight_scale']
                     .astype(np.float32) * np.float32(sa))
        acc = relu6(acc, acc_scale, fm['features.final_block.weight_scale'],
                    sa)
        sf, bf, sgf = act_info('quant_act_int32_final')
        mult = plan.requant_mult('final_rq', acc_scale, sf)
        x = _requant(acc, mult, bf, sgf, fin_dt)
        emit('final', x)

        # integer global average pool (trunc) + output requant
        hw = x.shape[1] * x.shape[2]
        pooled = jnp.sum(x, axis=(1, 2), dtype=fin_dt)
        pooled = jnp.trunc(qops.exact_div(pooled.astype(jnp.float32), hw)
                           + 0.01)
        if not use_f32:
            pooled = pooled.astype(jnp.int32)
        so, bo, sgo = act_info('quant_act_output')
        mult = plan.requant_mult('out_rq', np.float32(sf), so)
        f8 = _requant(pooled, mult, bo, sgo)       # int8 either way (tiny)
        emit('fc_input', f8)

        # 1×1 conv head on the pooled vector = dense
        w8 = np.asarray(fm['output.weight_int'])        # (1,1,C,O)
        b32 = np.asarray(fm['output.bias_int'])
        w2d = w8.reshape(w8.shape[2], w8.shape[3])
        acc = jax.lax.dot_general(f8, w2d, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32) + b32
        out_scale = (fm['output.weight_scale'].astype(np.float32)
                     * np.float32(so))
        return acc.astype(jnp.float32) * out_scale

    if capture is None:
        return jax.jit(forward)

    def forward_captured(images):
        forward(images)
        return captured['value']

    return jax.jit(forward_captured)

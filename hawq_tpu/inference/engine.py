"""Integer-only inference engine: FrozenModel → one jitted XLA program.

The TPU-native analog of the reference's deployment stack
(/root/reference/tvm_benchmark/mixed_precision_models/quantized_resnet_v1.py
:50-263 Relay graph builder + relay.build + graph_runtime): instead of an
interpreted op graph, the frozen checkpoint is closed over by a pure JAX
function — int8 activations, int8×int8→int32 MXU convolutions, dyadic
requantization epilogues, int32 residual adds — and compiled by XLA into a
single fused program.  All dyadic multipliers are precomputed host-side at
build time (the analog of load_qconfig's scale wiring,
hawq_utils_resnet50.py:205-312) and baked in as constants.

The arithmetic here is bit-for-bit the frozen/folded QAT graph: both call
the same requant semantics (hawq_tpu/quant/ops.py requant_int32 ≡
dyadic_requant) — the per-unit parity test of the reference's debug_unit
mechanism (test_resnet_inference.py:128-181) is tests/test_engine_parity.py.

``debug_unit`` support: pass ``capture=<node name>`` to truncate the graph at
a named node and return its raw integer tensor, mirroring the reference's
--debug-unit golden-featuremap tests (quantized_resnet_v1.py:401-417).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hawq_tpu.configs.bit_config import (RESNET_UNITS, RESNET_CONVS_PER_UNIT,
                                         RESNET_CIFAR_ARCHS)
from hawq_tpu.inference.freeze import FrozenModel
from hawq_tpu.quant import ops as qops


def _np_dyadic_multiplier(ratio: np.ndarray) -> np.ndarray:
    """Host-side mirror of qops.dyadic_multiplier (identical IEEE f32 math)."""
    ratio = np.asarray(ratio, np.float32)
    m, e = np.frexp(ratio)
    m_int = np.floor(m * (2.0 ** qops.DYADIC_MANTISSA_BITS) + 0.5)
    e_out = qops.DYADIC_MANTISSA_BITS - e
    return np.ldexp(m_int.astype(np.float32), -e_out).astype(np.float32)


class _Plan:
    """Precomputed constants for the jitted program.

    All values are **numpy** arrays: XLA embeds them as constants at each
    trace.  (Creating jnp arrays lazily inside a traced function leaks
    tracers into later traces — found by the serving tests.)"""

    def __init__(self, fm: FrozenModel, requant_mode: str = 'native'):
        self.fm = fm
        self.requant_mode = requant_mode
        self.w: Dict[str, np.ndarray] = {}
        self.b: Dict[str, np.ndarray] = {}
        self.mult: Dict[str, np.ndarray] = {}
        self.meta: Dict[str, Tuple] = {}

    def conv(self, key: str):
        if key not in self.w:
            self.w[key] = np.asarray(self.fm[key + '.weight_int'])
            self.b[key] = np.asarray(self.fm[key + '.bias_int'])
        return self.w[key], self.b[key]

    def requant_mult(self, name: str, acc_scale: np.ndarray,
                     out_scale: np.float32):
        """acc_scale may be per-channel (weight scale × act scale).

        native mode: one exact-f32 23-bit dyadic multiplier (the canonical
        framework numerics).  reference mode: the reference's 31-bit
        (m, 2⁻ᵉ) float64 pair (quant/reference_oracle.py), returned as a
        tuple — downstream requants dispatch on tuple-ness.
        """
        if name not in self.mult:
            if self.requant_mode == 'reference':
                from hawq_tpu.quant import reference_oracle as ro
                self.mult[name] = ro.decompose_ref(acc_scale, out_scale)
            else:
                ratio = (np.asarray(acc_scale, np.float32)
                         / np.float32(out_scale)).astype(np.float32)
                self.mult[name] = _np_dyadic_multiplier(ratio)
        return self.mult[name]


def _conv_i8(x8: jnp.ndarray, w8: jnp.ndarray, strides, padding,
             groups: int = 1) -> jnp.ndarray:
    dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(
        x8, w8, strides, padding, dimension_numbers=dn,
        feature_group_count=groups, preferred_element_type=jnp.int32)


def _requant(acc: jnp.ndarray, mult, bits: int, signed: bool,
             out_dtype=jnp.int8) -> jnp.ndarray:
    if isinstance(mult, tuple):            # reference replay mode: (m, 2⁻ᵉ)
        return qops.requant_int32_ref(acc, mult[0], mult[1], bits, signed,
                                      out_dtype)
    return qops.requant_int32(acc, mult, bits, signed, out_dtype)


def _requant_add(acc: jnp.ndarray, mult_main, identity: jnp.ndarray,
                 mult_id, out_dtype) -> jnp.ndarray:
    if isinstance(mult_main, tuple):
        return qops.requant_add_int32_ref(acc, mult_main[0], mult_main[1],
                                          identity, mult_id[0], mult_id[1],
                                          out_dtype)
    return qops.requant_add_int32(acc, mult_main, identity, mult_id,
                                  out_dtype)


# ---------------------------------------------------------------------------
# certified-exact f32 convolution route
#
# int8 integers are exactly representable in bfloat16 (8 significand bits,
# |v| <= 256); the MXU multiplies bf16 pairs into an exact float32 product
# (<= 14 significand bits) and accumulates in float32, where every integer
# partial sum below 2**24 is exact.  XLA lowers float32 convolutions to
# those bf16 MXU passes, so whenever the worst-case accumulator magnitude
# of an integer conv — computed host-side from the frozen integer weights —
# stays under 2**24, running it as a plain f32 conv over integer-valued f32
# tensors is bit-identical to the int8×int8→int32 conv.
#
# Why f32 *dtype* and not explicit bf16: measured on v5e, the win is not
# the MXU rate (these layers are small) but eliminating dtype churn — each
# int8/bf16/f32 conversion between ops is a physical retiling copy ((32,
# 128) / (16, 128) / (8, 128) tilings), and a MobileNetV2 unit built from
# int8 or bf16 convs costs 4× its all-f32 equivalent (0.81 ms vs 0.20 ms
# for init+stage1 at batch 8) purely in layout transitions.  An engine in
# this mode threads integer-valued f32 end to end: requants stay f32
# (floor/clip), residual carriers stay f32, and only uncertified layers
# locally cast to int8 for the int32 MXU path.  The reference's analog
# lever is picking a CUDA schedule per layer via AutoTVM
# (test_resnet_inference_time.py:189-217); here the choice is made by
# dtype and XLA does the scheduling.
# ---------------------------------------------------------------------------

ACC_EXACT_F32_BOUND = 2.0 ** 24

# Largest batch at which the residual-add → next-unit-input requant fusion is
# applied by default (measured crossover on v5e: wins at b1–b16, loses at
# b32/b64 — benchmarks/residual_fusion_b8_b64.json).
FUSE_UNIT_INPUT_MAX_BATCH = 16


def conv_acc_bound(w_int: np.ndarray, bias_int: np.ndarray,
                   amax: float) -> float:
    """Worst-case |conv accumulator + bias| over output channels.

    ``w_int`` is the HWIO integer kernel, ``amax`` the largest possible
    input-integer magnitude (from the producing requant's clip bounds).
    |acc_c| <= sum_k |w_kc| * amax, and every partial sum obeys the same
    bound, so bound <= 2**24 certifies f32-exact accumulation."""
    w = np.abs(np.asarray(w_int, np.float64))
    per_out = w.sum(axis=(0, 1, 2)) * float(amax)
    return float((per_out + np.abs(np.asarray(bias_int, np.float64)
                                   ).reshape(-1)).max())


def act_amax(bits: int, signed: bool) -> float:
    lo, hi = qops.requant_clip_bounds(bits, signed)
    return max(abs(lo), abs(hi))


def f32_exact_ok(w_int: np.ndarray, bias_int: np.ndarray,
                 amax: float) -> bool:
    # amax <= 256: the input integers must survive the bf16 MXU pass
    # exactly (8 significand bits) — rules out 16-bit residual inputs.
    return (amax <= 256
            and conv_acc_bound(w_int, bias_int, amax) <= ACC_EXACT_F32_BOUND)


def _conv_f32(x: jnp.ndarray, w8: np.ndarray, strides, padding,
              groups: int = 1) -> jnp.ndarray:
    """The certified-exact f32 conv: returns integer-valued float32 acc."""
    wf = np.asarray(w8, np.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, wf.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), wf, strides, padding,
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=jnp.float32)


def _conv_bf16(x: jnp.ndarray, w8: np.ndarray, strides, padding,
               groups: int = 1) -> jnp.ndarray:
    """Certified-exact bf16-storage conv: integer-valued bf16 operands
    (int8 weights and ≤8-bit activations are exact in bf16), f32
    accumulation — bit-identical to the int32 conv under the same 2²⁴
    certificate as the f32 route, at half the operand HBM traffic.

    v5e hazard (measured, round 5): only *dense* bf16 convs accumulate in
    f32 there — grouped/depthwise ones accumulate in bf16 and are NOT
    exact.  Callers must keep grouped convs off this route on TPU
    (engine_mobilenet rejects dw_mode='bf16')."""
    wf = np.asarray(w8, np.float32).astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, wf.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), wf, strides, padding,
        dimension_numbers=dn, feature_group_count=groups,
        preferred_element_type=jnp.float32)


def _s2d_input(x8: jnp.ndarray) -> jnp.ndarray:
    """7×7/s2 init space-to-depth: pad 3 + 2×2 fold (kernels/conv.py
    s2d_input — one shared definition keeps the rewrite bit-exact)."""
    from hawq_tpu.kernels.conv import s2d_input
    return s2d_input(x8, 3)


def _s2d_kernel(w: np.ndarray) -> np.ndarray:
    """(7, 7, C, O) stride-2 kernel → (4, 4, 4C, O) stride-1 over the s2d
    input (kernels/conv.py s2d_kernel, same (cy, cx, c) channel order)."""
    from hawq_tpu.kernels.conv import s2d_kernel
    return s2d_kernel(w)


def _maxpool_int(x: jnp.ndarray, window, strides, padding) -> jnp.ndarray:
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = jnp.asarray(-jnp.inf, x.dtype)      # f32-threaded engines
    else:
        init = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x, init, jax.lax.max, (1, *window, 1), (1, *strides, 1),
        ((0, 0), *padding, (0, 0)))


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def build_resnet_engine(fm: FrozenModel, capture: Optional[str] = None,
                        use_pallas: bool = False,
                        routing: Optional[Dict[str, str]] = None,
                        residual_dtype=jnp.int32,
                        s2d_init: bool = False,
                        input_mode: str = 'float32',
                        input_mean: np.ndarray = IMAGENET_MEAN,
                        input_std: np.ndarray = IMAGENET_STD,
                        conv_mode: str = 'int8',
                        init_mode: str = 'int8',
                        requant_mode: str = 'native',
                        fuse_unit_input: Optional[bool] = None,
                        pool_kernel: Optional[bool] = None):
    """Compile a FrozenModel into ``fn(images_f32_nhwc) -> logits_f32``.

    With ``capture``, the returned fn instead emits the raw integer tensor at
    that node ('<prefix>.quant_act_int32', 'avg_pool', 'fc_input', ...), the
    debug_unit mechanism for golden-featuremap parity tests.

    ``input_mode``:
      'float32'         raw (B, H, W, 3) f32 images, quantized on device
      'uint8'           raw (B, H, W, 3) u8 pixels, per-channel LUT on device
      'folded_float32'  (B, (H+8)/4, (W+8)/4, 48) f32 — the host pre-applies
                        inference.fold.fold4_images (a free permutation in
                        the loader), and the 7×7/s2 init conv runs as the
                        bit-exact folded 3×3/s1 rewrite — 8× faster than any
                        on-device handling of the C=3-minor image (measured:
                        benchmarks/init_conv_b8.json, docs/perf_tpu.md)
      'folded_int8'     same, but the host also quantized (csrc/preproc
                        bit-exact mirror) — the production serving transfer

    With ``use_pallas``, MXU-aligned 1×1 convolutions route through the fused
    Pallas matmul kernels (hawq_tpu/kernels/matmul.py): the requant epilogue
    runs in VMEM and 4-bit weight layers stream nibble-packed weights from
    HBM (half the weight traffic).  Numerics are identical either way — the
    kernels implement the same canonical dyadic arithmetic.

    ``conv_mode='f32'``: the certified-exact f32 route (module notes above):
    convs whose worst-case accumulator is provably < 2²⁴ (from the frozen
    integer weights) run as plain f32 convs over integer-valued f32 tensors
    and the engine threads f32 end to end; uncertified layers cast to int8
    locally (pallas routing still applies to them).  Bit-identical logits.
    W4A4 weights (±7) certify every layer; at W8A8 the wide stage3/4 convs
    typically fall back — exactly the layers where the int8 MXU (2× bf16
    peak) wins anyway.

    ``init_mode='bf16cert'``: run ONLY the init conv through the certified
    bf16 route (engine_inception's sectioned-init lever applied here) —
    the quantized input skips the int8 materialization of the C=3-minor
    image and the conv's bf16 operands halve its read traffic; the requant
    emits the normal integer carrier, so the rest of the graph is
    unchanged.  Falls back to int8 when the certificate fails.

    ``requant_mode='reference'``: replay an **imported reference checkpoint**
    (utils/checkpoint.import_reference_quantized) with the reference's own
    requant numerics — 31-bit Decimal-rounded dyadic mantissas evaluated in
    float64 (quant_utils.py:188-213, 344-460) instead of the framework's
    23-bit f32 grid.  Requires jax x64 (CPU validation path; TPUs have no
    f64 — serve imported checkpoints in native mode, whose divergence is
    bounded to borderline-rounding flips, see docs/reference_import.md).
    """
    assert conv_mode in ('int8', 'f32'), conv_mode
    assert init_mode in ('int8', 'bf16cert'), init_mode
    assert requant_mode in ('native', 'reference'), requant_mode
    if requant_mode == 'reference':
        # the replay path evaluates the reference's float64 fixedpoint_fn
        # semantics (quant/reference_oracle.py); it is a validation mode for
        # imported reference checkpoints — keep the graph on the plain int8
        # XLA route with full-width residual carriers (the reference's own
        # deployment graph shape, quantized_resnet_v1.py:50-263)
        assert conv_mode == 'int8' and init_mode == 'int8' \
            and not use_pallas and routing is None \
            and residual_dtype == jnp.int32 and not s2d_init, \
            "requant_mode='reference' supports only the plain int8 route"
    use_f32 = conv_mode == 'f32'
    act_dt = jnp.float32 if use_f32 else jnp.int8
    res_dt = jnp.float32 if use_f32 else residual_dtype
    arch, cfg = fm.arch, fm.cfg
    plan = _Plan(fm, requant_mode)
    if routing is not None:
        use_pallas = True
    if use_pallas:
        from hawq_tpu.kernels import matmul as km
        from hawq_tpu.kernels import conv as kc
        packed_weights = {}
        conv_weights = {}

        def want_int4(key: str) -> bool:
            # stream nibble-packed weights iff the layer is 4-bit AND the
            # routing table (when present) picked the int4 kernel
            return (cfg.weight_bits(key) == 4 and
                    (routing is None or routing.get(key) == 'pallas4w'))

        def pallas_weights(key: str):
            if key not in packed_weights:
                w = fm[key + '.weight_int']          # (1, 1, Cin, Cout)
                w2d = np.asarray(w).reshape(w.shape[2], w.shape[3])
                if want_int4(key):
                    packed_weights[key] = (km.pack_int4(w2d), True)
                else:
                    packed_weights[key] = (w2d, False)
            return packed_weights[key]

        def conv_kernel_weights(key: str, stride: int):
            """Flattened (and for W4, per-tap nibble-packed) conv weights;
            stride-2 kernels are space-to-depth transformed."""
            ck = (key, stride)
            if ck not in conv_weights:
                w = np.asarray(fm[key + '.weight_int'])
                if stride == 2:
                    w = kc.s2d_kernel(w)
                taps = (w.shape[0], w.shape[1])
                wf = kc.flatten_conv_kernel(w)
                if want_int4(key):
                    conv_weights[ck] = (kc.pack_int4_conv(
                        wf, taps[0] * taps[1]), taps, w.shape[2], True)
                else:
                    conv_weights[ck] = (wf, taps, w.shape[2], False)
            return conv_weights[ck]

        def pallas_routable(key: str, kh: int, kw: int, cin: int,
                            cout: int) -> bool:
            ok1x1 = (kh == 1 and kw == 1 and cin % 128 == 0
                     and cout % 128 == 0)
            # 3×3: the conv kernel needs lane-aligned per-tap slices
            # (cin % 128; after the stride-2 s2d rewrite cin → 4·cin)
            ok3x3 = (kh == 3 and kw == 3 and cin % 128 == 0
                     and cout % 128 == 0)
            ok = ok1x1 or ok3x3
            if routing is not None:
                return ok and routing.get(key, 'xla') != 'xla'
            return ok

        def pallas_conv3x3(x8, key, stride, mult, out_bits, signed, relu,
                           acc_only=False):
            b, h, w_, c = x8.shape
            if stride == 2:
                x8 = kc.s2d_input(x8, 1)
                oh, ow = kc.s2d_output_hw(h, w_, 3, 3, 1)
                xp = kc.prepare_conv_input(x8, (0, 0))
            else:
                oh, ow = h, w_
                xp = kc.prepare_conv_input(x8, (1, 1))
            wq, taps, cin_k, is4 = conv_kernel_weights(key, stride)
            bias = np.asarray(fm[key + '.bias_int'])
            if acc_only:
                fn = kc.int4w_conv_acc if is4 else kc.int8_conv_acc
                y = fn(xp, wq, bias, taps=taps, out_hw=(oh, ow), cin=cin_k)
            else:
                fn = kc.int4w_conv_requant if is4 else kc.int8_conv_requant
                y = fn(xp, wq, bias, mult, taps=taps, out_hw=(oh, ow),
                       cin=cin_k, out_bits=out_bits, signed=signed,
                       relu=relu)
            return y.reshape(b, oh, ow, y.shape[-1])

        def pallas_conv1x1_requant(x8, key, stride, mult, out_bits, signed,
                                   relu):
            if stride > 1:
                x8 = x8[:, ::stride, ::stride, :]
            b, h, w_, c = x8.shape
            m = b * h * w_
            xm = km.pad_to(x8.reshape(m, c), 256, 1)
            wq, is4 = pallas_weights(key)
            bias = plan.conv(key)[1]
            fn = km.int4w_matmul_requant if is4 else km.int8_matmul_requant
            y = fn(xm, wq, bias, mult, out_bits=out_bits, signed=signed,
                   relu=relu)
            cout = y.shape[-1]
            return y[:m].reshape(b, h, w_, cout)

        def pallas_conv1x1_acc(x8, key, stride):
            if stride > 1:
                x8 = x8[:, ::stride, ::stride, :]
            b, h, w_, c = x8.shape
            m = b * h * w_
            xm = km.pad_to(x8.reshape(m, c), 256, 1)
            wq, is4 = pallas_weights(key)
            bias = plan.conv(key)[1]
            if is4:
                y = km.int4w_matmul_acc(xm, wq, bias)
            else:
                y = km.int8_matmul_acc(xm, wq, bias)
            cout = y.shape[-1]
            return y[:m].reshape(b, h, w_, cout)

        def pallas_conv_requant(x8, key, stride, mult, out_bits, signed,
                                relu):
            if fm[key + '.weight_int'].shape[0] == 1:
                return pallas_conv1x1_requant(x8, key, stride, mult,
                                              out_bits, signed, relu)
            return pallas_conv3x3(x8, key, stride, mult, out_bits, signed,
                                  relu)

        def pallas_conv_acc(x8, key, stride):
            if fm[key + '.weight_int'].shape[0] == 1:
                return pallas_conv1x1_acc(x8, key, stride)
            return pallas_conv3x3(x8, key, stride, None, 8, True, False,
                                  acc_only=True)
    bottleneck = RESNET_CONVS_PER_UNIT[arch] == 3
    conv1_stride = arch == 'resnet50'
    cifar = arch in RESNET_CIFAR_ARCHS
    init_key = 'quant_init_convbn' if bottleneck else 'quant_init_block_convbn'

    # All scales are static python/numpy values at build time.
    s_in = fm.act_scale('quant_input')

    def act_info(key: str) -> Tuple[float, int, bool]:
        return (float(fm.act_scale(key)), cfg.act_bits(key),
                cfg.act_mode(key) == 'symmetric')

    captured = {}

    def emit(name, value):
        if capture is not None and name == capture:
            captured['value'] = value

    def emit_int(name, value):
        """emit for integer-valued nodes — f32-threaded tensors capture as
        their exact int32 integers (the golden-featuremap contract)."""
        if capture is not None and name == capture:
            if jnp.issubdtype(value.dtype, jnp.floating):
                value = value.astype(jnp.int32)
            captured['value'] = value

    def as_i8(t):
        """Local int8 view of an integer-valued f32 activation (exact —
        requant clip bounds keep values in int8 range)."""
        return t if t.dtype == jnp.int8 else t.astype(jnp.int8)

    # uint8 serving path: raw pixels transfer host→device (4× fewer bytes)
    # and the device replays the host preprocessing with the **identical
    # float32 op order** (u8/255 → (v−mean)/std → round(v/s_in)): IEEE f32
    # div/sub/floor are deterministic, so the uint8 path is bit-identical
    # to running the float path on host-preprocessed images — no affine
    # refactoring, no tolerance.  (An earlier 256-entry per-channel LUT had
    # the same numerics but lowered to a gather — ~19× slower end-to-end on
    # TPU at batch 64, 96.5 ms vs 5.1 ms.)
    u8_mean = input_mean.astype(np.float32)       # (C,), broadcasts minor
    u8_std = input_std.astype(np.float32)

    folded = input_mode.startswith('folded')
    if pool_kernel and not folded:
        raise ValueError(
            f"pool_kernel=True requires a folded input mode (the Pallas "
            f"pool operates on the fold4 layout); input_mode={input_mode!r} "
            f"would silently measure the default pool path")
    if folded:
        from hawq_tpu.inference import fold as _fold
        w_init = np.asarray(fm[init_key + '.weight_int'])
        assert w_init.shape[:2] == (7, 7), \
            'folded input modes require the 7×7/s2 init conv'
        w_fold = _fold.fold4_kernel(w_init)
        # In-layout pool route.  The one-pass Pallas kernel
        # (kernels/pool.py) wins ISOLATED (b64: 0.221 vs 0.556 ms) but
        # LOSES in-engine at every batch (b8 0.770 vs 0.556, b64 8.69 vs
        # 5.28 — benchmarks/pool_kernel_b8_b64.json): the custom-call
        # boundary breaks the init conv's epilogue fusion and forces
        # layout materialization worth far more than the kernel saves —
        # the same lesson as engine-integrated pallas conv routing
        # (docs/perf_tpu.md).  Default stays on the jnp shifted-max path;
        # the kernel remains selectable for future hardware/XLA versions.
        if pool_kernel is None:
            pool_kernel = False
        if pool_kernel:
            from hawq_tpu.kernels.pool import maxpool_folded as _pool_fold
        else:
            _pool_fold = _fold.maxpool_3x3s2p1_folded

    # One certificate covers every init variant: the fold/s2d rewrites only
    # permute (and zero-pad) kernel taps, so per-output-channel |w| sums
    # never grow.  When certified, the quantized input skips the int8
    # materialization (42× lane-padded at C=3).
    _w_init_c, _b_init_c = plan.conv(init_key)
    init_f32 = ((use_f32 or init_mode == 'bf16cert')
                and f32_exact_ok(_w_init_c, _b_init_c, 128.0))

    def forward(images: jnp.ndarray) -> jnp.ndarray:
        # ---- input quantization (test_resnet_accuracy_imagenet.py:62-75) --
        if input_mode == 'uint8':
            # exact_div: all three denominators are baked constants —
            # XLA would rewrite the divides into reciprocal multiplies,
            # breaking the bit-identity with the host preprocessing
            # (quant/ops.py exact_div).
            v = qops.exact_div(
                qops.exact_div(images.astype(jnp.float32), 255.0) - u8_mean,
                u8_std)
            x8 = jnp.clip(jnp.floor(qops.exact_div(v, s_in)
                                    + jnp.float32(0.5)),
                          -128, 127)
            if not init_f32:
                x8 = x8.astype(jnp.int8)
        elif input_mode == 'folded_int8':
            x8 = images          # host quantized + folded (csrc mirror)
        else:   # 'float32' / 'folded_float32': device-side quantization.
            # For folded input the pad zeros quantize to integer 0, exactly
            # like the device-side zero padding of the direct conv.
            x8 = jnp.clip(qops.round_half_up(qops.exact_div(images, s_in)),
                          -128, 127)
            if not init_f32:
                x8 = x8.astype(jnp.int8)
        emit('input', as_i8(x8))

        # ---- init block ----
        # requant + ReLU run *before* the maxpool (all three are monotone, so
        # this commutes exactly with the training graph's pool→requant→relu
        # order) — the pool then moves residual_dtype instead of int32.
        w8, b32 = plan.conv(init_key)
        s_init = (fm[init_key + '.weight_scale'].astype(np.float32)
                  * np.float32(s_in))
        s16, b16, signed16 = act_info('quant_act_int32')
        init_conv = ((_conv_bf16 if init_mode == 'bf16cert' and not use_f32
                      else _conv_f32) if init_f32 else _conv_i8)
        if folded:
            # 4×4 block-folded init conv (inference/fold.py): bit-exact
            # 3×3/s1 rewrite of the 7×7/s2; requant+relu in folded layout
            # (per-channel vectors tiled over the 4 stride-2 origins), then
            # depth-to-space on the narrow residual dtype.
            acc = init_conv(x8, w_fold, (1, 1), 'VALID') + np.tile(b32, 4)
            mult = plan.requant_mult('init_requant', np.tile(s_init, 4), s16)
            x16 = _requant(acc, mult, b16, signed16, res_dt)
            x16 = jnp.maximum(x16, 0)
            # maxpool directly in the folded layout (fold.py / kernels/
            # pool.py): bit-exact equal to depth_to_space + reduce_window,
            # without the 2× intermediate — reduce_window on the unfolded
            # int16 tensor measured ~12× off the BW roofline at b64
            # (1.94 ms vs 0.35)
            x16 = _pool_fold(x16)
        else:
            if cifar:
                # CIFAR init: 3×3/s1/pad1, no maxpool
                # (quantized_resnet_v1.py:334-348)
                acc = init_conv(x8, w8, (1, 1), ((1, 1), (1, 1))) + b32
            elif s2d_init and w8.shape[:2] == (7, 7) and x8.shape[1] % 2 == 0:
                # space-to-depth: the 7×7/s2 conv on 3 channels wastes the
                # 128-wide MXU; fold 2×2 pixel blocks into channels and run
                # the exact same MACs as a 4×4/s1 conv on 12 channels.
                # Bit-exact: identical products and int32 sums, reordered.
                acc = init_conv(_s2d_input(x8),
                                _s2d_kernel(fm[init_key + '.weight_int']),
                                (1, 1), 'VALID') + b32
            else:
                acc = init_conv(x8, w8, (2, 2), ((3, 3), (3, 3))) + b32
            mult = plan.requant_mult('init_requant', s_init, s16)
            x16 = _requant(acc, mult, b16, signed16, res_dt)
            x16 = jnp.maximum(x16, 0)
        if not cifar and not folded:     # folded path pooled in-layout above
            x16 = _maxpool_int(x16, (3, 3), (2, 2), ((1, 1), (1, 1)))
        prev_scale = np.float32(s16)
        emit_int('init', x16)

        x = x16
        units = [(si, u) for si, n_units in
                 enumerate(RESNET_UNITS[arch], start=1)
                 for u in range(1, n_units + 1)]
        xa_fused = None       # next-unit input emitted at the producer site
        for ui, (si, u) in enumerate(units):
                p = f'stage{si}.unit{u}'
                stride = 2 if (u == 1 and si > 1) else 1
                has_id_conv = f'{p}.quant_identity_convbn.weight_int' in fm.tensors

                # unit input requant: prev 16-bit int32 → unit act bits.
                # For units after the first this was already computed fused
                # into the previous unit's residual-add epilogue (one pass
                # over the sum emits both the carrier and this int8 input —
                # saves a full carrier read per unit; the stage1 carrier is
                # 103 MB at b64, docs/perf_tpu.md).
                sa, ba, signed_a = act_info(f'{p}.quant_act')
                if xa_fused is not None:
                    xa = xa_fused
                else:
                    mult = plan.requant_mult(f'{p}.in', prev_scale, sa)
                    xa = _requant(x, mult, ba, signed_a, act_dt)
                emit_int(f'{p}.input', xa)
                amax_a = act_amax(ba, signed_a)

                def routable(key):
                    if not use_pallas:
                        return False
                    kh, kw, cin, cout = fm[key + '.weight_int'].shape
                    return pallas_routable(key, kh, kw, cin, cout)

                def certified(key, amax):
                    if not use_f32:
                        return False
                    w8c, b32c = plan.conv(key)
                    return f32_exact_ok(w8c, b32c, amax)

                id_key = f'{p}.quant_identity_convbn'
                if has_id_conv:
                    id_scale = (fm[id_key + '.weight_scale']
                                .astype(np.float32) * np.float32(sa))
                    wid, bid = plan.conv(id_key)
                    if certified(id_key, amax_a):
                        id_acc = _conv_f32(xa, wid, (stride, stride),
                                           'VALID') + bid
                    elif routable(id_key):
                        id_acc = pallas_conv_acc(as_i8(xa), id_key, stride)
                    else:
                        id_acc = _conv_i8(as_i8(xa), wid, (stride, stride),
                                          'VALID') + bid
                else:
                    id_acc = x          # int32 at prev_scale
                    id_scale = prev_scale

                s1 = (stride, stride) if (bottleneck and conv1_stride) else \
                     ((1, 1) if bottleneck else (stride, stride))
                s2 = (1, 1) if (bottleneck and conv1_stride) else \
                     ((stride, stride) if bottleneck else (1, 1))

                # conv1
                key1 = f'{p}.quant_convbn1'
                acc_scale = (fm[key1 + '.weight_scale']
                             .astype(np.float32) * np.float32(sa))
                sa1, ba1, sg1 = act_info(f'{p}.quant_act1')
                mult = plan.requant_mult(f'{p}.a1', acc_scale, sa1)
                pad1 = 'VALID' if bottleneck else ((1, 1), (1, 1))
                if certified(key1, amax_a):
                    w8, b32 = plan.conv(key1)
                    acc = _conv_f32(xa, w8, s1, pad1) + b32
                    acc = jnp.maximum(acc, 0)
                    h = _requant(acc, mult, ba1, sg1, act_dt)
                elif routable(key1):
                    h = pallas_conv_requant(as_i8(xa), key1, s1[0], mult,
                                            ba1, sg1, relu=True)
                    if use_f32:
                        h = h.astype(jnp.float32)
                else:
                    w8, b32 = plan.conv(key1)
                    acc = _conv_i8(as_i8(xa), w8, s1, pad1) + b32
                    acc = jnp.maximum(acc, 0)
                    h = _requant(acc, mult, ba1, sg1, act_dt)
                emit_int(f'{p}.conv1', h)

                # conv2
                key2 = f'{p}.quant_convbn2'
                acc_scale = (fm[key2 + '.weight_scale']
                             .astype(np.float32) * np.float32(sa1))

                if bottleneck:
                    sa2, ba2, sg2 = act_info(f'{p}.quant_act2')
                    mult = plan.requant_mult(f'{p}.a2', acc_scale, sa2)
                    if certified(key2, act_amax(ba1, sg1)):
                        w8, b32 = plan.conv(key2)
                        acc = _conv_f32(h, w8, s2, ((1, 1), (1, 1))) + b32
                        acc = jnp.maximum(acc, 0)
                        h = _requant(acc, mult, ba2, sg2, act_dt)
                    elif routable(key2):
                        h = pallas_conv_requant(as_i8(h), key2, s2[0], mult,
                                                ba2, sg2, relu=True)
                        if use_f32:
                            h = h.astype(jnp.float32)
                    else:
                        w8, b32 = plan.conv(key2)
                        acc = _conv_i8(as_i8(h), w8, s2,
                                       ((1, 1), (1, 1))) + b32
                        acc = jnp.maximum(acc, 0)
                        h = _requant(acc, mult, ba2, sg2, act_dt)
                    emit_int(f'{p}.conv2', h)

                    key3 = f'{p}.quant_convbn3'
                    acc_scale = (fm[key3 + '.weight_scale']
                                 .astype(np.float32) * np.float32(sa2))
                    if certified(key3, act_amax(ba2, sg2)):
                        w8, b32 = plan.conv(key3)
                        acc = _conv_f32(h, w8, (1, 1), 'VALID') + b32
                    elif routable(key3):
                        acc = pallas_conv1x1_acc(as_i8(h), key3, 1)
                    else:
                        w8, b32 = plan.conv(key3)
                        acc = _conv_i8(as_i8(h), w8, (1, 1), 'VALID') + b32
                else:
                    # basic block: conv2 is the unit's last conv — its raw
                    # accumulator feeds the residual requant-add
                    if certified(key2, act_amax(ba1, sg1)):
                        w8, b32 = plan.conv(key2)
                        acc = _conv_f32(h, w8, s2, ((1, 1), (1, 1))) + b32
                    elif routable(key2):
                        acc = pallas_conv_acc(as_i8(h), key2, s2[0])
                    else:
                        w8, b32 = plan.conv(key2)
                        acc = _conv_i8(as_i8(h), w8, s2,
                                       ((1, 1), (1, 1))) + b32

                # residual requant-add at 16-bit precision
                s_out, b_out, sg_out = act_info(f'{p}.quant_act_int32')
                mult_main = plan.requant_mult(f'{p}.res_main', acc_scale, s_out)
                mult_id = plan.requant_mult(f'{p}.res_id', id_scale, s_out)
                # keep the unclamped sum in a wide container (f32/int32) so
                # the clamp below sees the true value — narrowing first would
                # make out-of-range sums implementation-defined
                x_wide = _requant_add(
                    acc, mult_main, id_acc, mult_id,
                    out_dtype=jnp.float32 if use_f32 else jnp.int32)
                x_wide = jnp.maximum(x_wide, 0)
                if residual_dtype != jnp.int32:
                    # halved inter-unit traffic; clamps the (rare) residual
                    # sums above 2^15-1 — the 16-bit behavior the bit configs
                    # nominally declare for these nodes
                    x_wide = jnp.clip(x_wide, 0,
                                      jnp.iinfo(residual_dtype).max)
                x = x_wide.astype(res_dt)
                prev_scale = np.float32(s_out)
                emit_int(f'{p}.quant_act_int32', x)

                # fused emission of the NEXT unit's int8 input: bit-identical
                # to requantizing the written carrier (same clipped values,
                # dtype round-trip exact), but XLA's multi-output fusion
                # computes it in the same pass — the carrier is then read at
                # most once more (the non-resize identity add), and not at
                # all before a resize unit (DCE removes the dead write).
                # Measured on v5e (benchmarks/residual_fusion_b8_b64.json):
                # wins at small batch (b8 0.666→0.637 ms) but LOSES at b64
                # (5.12→6.68 ms — the extra fusion output stops XLA from
                # folding the add epilogue into the conv, materializing the
                # int32 accumulator), so it is trace-time batch-gated.
                fuse = (fuse_unit_input if fuse_unit_input is not None
                        else images.shape[0] <= FUSE_UNIT_INPUT_MAX_BATCH)
                if fuse and ui + 1 < len(units):
                    nsi, nu = units[ui + 1]
                    np_ = f'stage{nsi}.unit{nu}'
                    nsa, nba, nsigned = act_info(f'{np_}.quant_act')
                    nmult = plan.requant_mult(f'{np_}.in', prev_scale, nsa)
                    xa_fused = _requant(x_wide, nmult, nba, nsigned, act_dt)
                else:
                    xa_fused = None

        # ---- head ----
        # integer global average pool with truncation (quant_modules.py:557-602)
        hw = x.shape[1] * x.shape[2]
        pooled = jnp.sum(x, axis=(1, 2),
                         dtype=jnp.float32 if use_f32 else jnp.int32)
        pooled = jnp.trunc(qops.exact_div(pooled.astype(jnp.float32), hw)
                           + 0.01)
        emit('avg_pool', pooled)

        s_fc, b_fc, sg_fc = act_info('quant_act_output')
        mult = plan.requant_mult('fc_in', prev_scale, s_fc)
        f8 = _requant(pooled if use_f32 else pooled.astype(jnp.int32),
                      mult, b_fc, sg_fc)
        emit('fc_input', f8)

        w8 = np.asarray(fm['quant_output.weight_int'])
        b32 = np.asarray(fm['quant_output.bias_int'])
        acc = jax.lax.dot_general(f8, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32) + b32
        out_scale = (fm['quant_output.weight_scale'].astype(np.float32)
                     * np.float32(s_fc))
        logits = acc.astype(jnp.float32) * out_scale
        emit('fc_output', logits)
        return logits

    if capture is None:
        return jax.jit(forward)

    def forward_captured(images):
        forward(images)
        return captured['value']

    # capture mode is for tests: run uncompiled-traceable but still jittable
    return jax.jit(forward_captured)

"""Quantized neural-net layers (flax.linen), threading (int·scale, scale) pairs.

The load-bearing invariant inherited from the reference
(/root/reference/utils/quantization_utils/quant_modules.py:79-130, 205-305):
every quantized layer consumes and produces a pair ``(value, scale)`` where
``value = integer_tensor * scale`` exactly.  Downstream layers divide by the
incoming scale to recover exact integers, which is what makes the QAT graph
match the frozen integer engine bit-for-bit.

TPU-first re-design choices vs the reference's nn.Module mutation style:
  * all running statistics (activation ranges, BN stats) are explicit flax
    variables in the ``quant_stats`` / ``batch_stats`` collections, updated
    functionally — no buffer mutation, fully jit/pjit friendly;
  * range updates are computed on the *logical global* batch, so under
    GSPMD data parallelism every replica sees identical statistics.  This
    removes the reference's known multi-GPU BN/range divergence that broke
    bit-exact deployment (model_zoo.md:70);
  * layout is NHWC / HWIO (channel-minor: TPU native), per-channel scales are
    1-D vectors over the last axis;
  * the convolution/matmul forward runs *true integer* int8×int8→int32 via a
    custom_vjp (MXU path), with a float STE backward — the QAT forward is
    bit-identical to the deployment engine by construction, instead of
    relying on fp32 accumulation staying exact (the reference's F.conv2d
    approach, quant_modules.py:441-494).
  * freeze/unfreeze (quant_modules.py:739-780) becomes the functional
    ``update_stats`` / ``folded`` call arguments driven by the trainer.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hawq_tpu.quant import ops as qops


# ---------------------------------------------------------------------------
# Exact integer conv / matmul with STE backward
# ---------------------------------------------------------------------------

# Storage dtype for the conv save-for-backward residuals (x_int, w_int).
# Both are integer-valued floats bounded by the 8-bit ranges (|x_int| ≤ 128,
# |w_int| ≤ 127), and bf16 represents integers up to 256 exactly — so
# 'bfloat16' halves the dominant fwd→bwd HBM traffic of the train step with
# value-exact residuals (the one non-integer case, the image-input x_int of
# the init conv, is perturbed by ≤2⁻⁸ relative on that conv's dw only).
# None keeps the reference-faithful f32 floats.  Trace-time setting — use
# the context manager (make_train_step does).  Thread-local, so a
# concurrent trace in another thread (two Trainers) sees its own value.
import contextlib
import threading

_RES_STORE = threading.local()


@contextlib.contextmanager
def residual_store_dtype(dt):
    """Trace-time override of the backward-residual storage dtype."""
    old = getattr(_RES_STORE, 'dtype', None)
    _RES_STORE.dtype = dt
    try:
        yield
    finally:
        _RES_STORE.dtype = old


def _store(t):
    dt = getattr(_RES_STORE, 'dtype', None)
    return t if dt is None else t.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def int_conv2d(x_int: jnp.ndarray, w_int: jnp.ndarray, bias_int: jnp.ndarray,
               strides: Tuple[int, int], padding: Any,
               feature_group_count: int) -> jnp.ndarray:
    """Exact int8×int8→int32 convolution + int32 bias add, returned as float32.

    x_int, w_int, bias_int are integer-valued float tensors (NHWC / HWIO /
    (Cout,)) whose values fit int8 / int32.  Forward rounds + casts to
    int8/int32 and accumulates on the MXU in int32; the bias is added **in
    int32 before the float32 cast** so the returned tensor is exactly
    f32(acc + b) — the same single rounding the frozen engine performs
    (inference/engine.py), even for accumulators beyond 2**24.  Backward
    treats the op as the ordinary float convolution (straight-through).
    """
    x8 = qops.round_half_up(x_int).astype(jnp.int8)
    w8 = qops.round_half_up(w_int).astype(jnp.int8)
    b32 = qops.round_half_up(bias_int).astype(jnp.int32)
    dn = jax.lax.conv_dimension_numbers(x8.shape, w8.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    acc = jax.lax.conv_general_dilated(
        x8, w8, strides, padding, dimension_numbers=dn,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.int32)
    return (acc + b32).astype(jnp.float32)


def _float_conv(x, w, strides, padding, feature_group_count):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn,
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32)


def _int_conv2d_fwd(x_int, w_int, bias_int, strides, padding,
                    feature_group_count):
    return int_conv2d(x_int, w_int, bias_int, strides, padding,
                      feature_group_count), (_store(x_int), _store(w_int))


def _int_conv2d_bwd(strides, padding, feature_group_count, res, g):
    x_int, w_int = res
    # Narrow-residual dispatch keys on the residual dtype being one of the
    # explicit narrow storage dtypes, so full-precision paths — f32, and
    # f64 under jax x64 — always take the faithful branch and return
    # gradients in the primal dtype as custom_vjp requires.
    if x_int.dtype not in (jnp.bfloat16, jnp.float16):
        _, vjp = jax.vjp(
            lambda x, w: _float_conv(x, w, strides, padding,
                                     feature_group_count),
            x_int, w_int)
        dx, dw = vjp(g)
        return (dx, dw, jnp.sum(g, axis=(0, 1, 2)))

    # reduced-precision backward: residuals were stored narrow (value-exact
    # for integer activations); run the gradient convolutions entirely on
    # narrow operands/cotangents — upcasting them back to f32 materializes
    # convert copies that eat the entire traffic saving (measured neutral,
    # 38.23 vs 38.10 ms at resnet50 b64).  The cotangent truncation is the
    # one numerics deviation (~2⁻⁸ relative on conv gradients) — opt-in
    # via make_train_step(residual_store_dtype=...).
    dt = x_int.dtype

    def conv_dt(x, w):
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ('NHWC', 'HWIO', 'NHWC'))
        return jax.lax.conv_general_dilated(
            x, w, strides, padding, dimension_numbers=dn,
            feature_group_count=feature_group_count,
            preferred_element_type=dt)

    _, vjp = jax.vjp(conv_dt, x_int, w_int)
    dx, dw = vjp(g.astype(dt))
    return (dx.astype(g.dtype), dw.astype(g.dtype),
            jnp.sum(g, axis=(0, 1, 2)))


int_conv2d.defvjp(_int_conv2d_fwd, _int_conv2d_bwd)


@jax.custom_vjp
def int_matmul(x_int: jnp.ndarray, w_int: jnp.ndarray,
               bias_int: jnp.ndarray) -> jnp.ndarray:
    """Exact int8×int8→int32 matmul + int32 bias (x: [B, F], w: [F, O])."""
    x8 = qops.round_half_up(x_int).astype(jnp.int8)
    w8 = qops.round_half_up(w_int).astype(jnp.int8)
    b32 = qops.round_half_up(bias_int).astype(jnp.int32)
    acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc + b32).astype(jnp.float32)


def _int_matmul_fwd(x_int, w_int, bias_int):
    return int_matmul(x_int, w_int, bias_int), (x_int, w_int)


def _int_matmul_bwd(res, g):
    x_int, w_int = res
    return (g @ w_int.T, x_int.T @ g, jnp.sum(g, axis=0))


int_matmul.defvjp(_int_matmul_fwd, _int_matmul_bwd)


# ---------------------------------------------------------------------------
# QuantAct — activation quantizer + requantization node
# ---------------------------------------------------------------------------

class QuantAct(nn.Module):
    """Activation range tracker + quantizer + dyadic requant node.

    Parity target: QuantAct (quant_modules.py:133-305).  Three forward cases:
      (a) no incoming scale (input quantization) or fixed_point mode:
          direct fake-quant with this node's scale;
      (b) ``branch_scales`` given (multi-branch concat, InceptionV3):
          per-channel-slice dyadic requant of each branch to one scale;
      (c) normal / residual: dyadic requant of the int32 accumulator, with an
          optional identity branch carrying its own (act, weight) scales.

    Returns ``(int_value * scale, scale)``.
    """
    bits: int = 8
    momentum: float = 0.99
    quant_mode: str = 'symmetric'       # 'symmetric' | 'asymmetric'
    percentile: float = 0.0             # 0 = plain min/max
    fixed_point: bool = False           # skip integer-only requant (debug)

    @nn.compact
    def __call__(self, x, pre_act_scale=None, pre_weight_scale=None,
                 identity=None, identity_scale=None,
                 identity_weight_scale=None,
                 branch_scales: Optional[Sequence] = None,
                 branch_channels: Optional[Sequence[int]] = None,
                 *, x_int=None, identity_int=None,
                 update_stats: bool = False):
        x_min = self.variable('quant_stats', 'x_min',
                              lambda: jnp.zeros((), jnp.float32))
        x_max = self.variable('quant_stats', 'x_max',
                              lambda: jnp.zeros((), jnp.float32))

        if update_stats:
            # Range statistics are *buffers* in the reference — computed
            # from x.data / x.detach() (quant_modules.py:235-245) — so no
            # gradient may flow from the scales back into the min/max
            # reductions.  Without this stop_gradient every downstream
            # float use of `scale` (dequant multiplies, scale threading)
            # back-propagates through argmin/argmax scatters over the full
            # activation tensor: wrong STE semantics AND measured ~2× on
            # the b64 train-step backward (benchmarks/train_breakdown).
            xd = jax.lax.stop_gradient(x)
            if self.percentile == 0:
                cur_min, cur_max = qops.fused_minmax(xd)
            elif self.quant_mode == 'symmetric':
                cur_min, cur_max = qops.percentile_bounds(
                    xd.reshape(-1), 100.0 - self.percentile, self.percentile)
            else:
                # asymmetric is always post-ReLU with zero_point 0: lower
                # bound pinned to 0 (quant_modules.py:244-245).
                cur_min, cur_max = qops.percentile_bounds(
                    xd.reshape(-1), 0.0, self.percentile)

            uninit = x_min.value == x_max.value
            if self.momentum < 0:  # running min/max mode (momentum == -1)
                new_min = jnp.minimum(x_min.value, cur_min)
                new_max = jnp.maximum(x_max.value, cur_max)
            else:
                new_min = x_min.value * self.momentum + cur_min * (1 - self.momentum)
                new_max = x_max.value * self.momentum + cur_max * (1 - self.momentum)
            x_min.value = jnp.where(uninit, cur_min, new_min)
            x_max.value = jnp.where(uninit, cur_max, new_max)

        if self.quant_mode == 'symmetric':
            scale = qops.symmetric_quant_scale(self.bits, x_min.value, x_max.value)
        else:
            scale = qops.asymmetric_quant_scale(self.bits, x_min.value, x_max.value)
        signed = self.quant_mode == 'symmetric'

        if pre_act_scale is None or self.fixed_point:
            if signed:
                q = qops.quantize_symmetric(x, scale, self.bits)
            else:
                q = qops.quantize_asymmetric(x, scale, self.bits)
        elif branch_scales is not None:
            # multi-branch concat requant (quant_modules.py:275-286): each
            # channel slice carries its own producer scale; requant all to
            # this node's scale.  Weight scale is identity (ratio of 1).
            pieces = []
            start = 0
            for b_scale, c in zip(branch_scales, branch_channels):
                piece = x[..., start:start + c]
                pieces.append(qops.dyadic_requant(
                    piece, b_scale, scale, self.bits, signed))
                start += c
            q = jnp.concatenate(pieces, axis=-1)
        elif identity is None:
            acc_scale = qops.exact(pre_act_scale * (
                jnp.ones(()) if pre_weight_scale is None else pre_weight_scale))
            q = qops.dyadic_requant(x, acc_scale, scale, self.bits, signed,
                                    z_int=x_int)
        else:
            acc_scale = qops.exact(pre_act_scale * (
                jnp.ones(()) if pre_weight_scale is None else pre_weight_scale))
            id_scale = qops.exact(identity_scale * (
                jnp.ones(()) if identity_weight_scale is None
                else identity_weight_scale))
            q = qops.dyadic_requant_residual(x, acc_scale, identity,
                                             id_scale, scale, z_int=x_int,
                                             identity_int=identity_int)

        # golden-featuremap hook: expose the integer tensor for per-unit
        # parity tests against the engine's capture mode (the reference's
        # --debug-unit mechanism, hawq_utils_resnet50.py:374-424) and for
        # the bit-config 'hook' entries (quant_train.py:285-289)
        self.sow('intermediates', 'q_int', q)
        return q * scale, scale


# ---------------------------------------------------------------------------
# QuantConvBn — conv + folded/unfolded BN
# ---------------------------------------------------------------------------

class QuantConvBn(nn.Module):
    """Quantized conv2d with batch norm, foldable.

    Parity target: QuantBnConv2d (quant_modules.py:308-494).  Two modes,
    selected by the ``folded`` call argument (the trainer owns the fix-BN
    schedule instead of the reference's hidden per-module counter,
    quant_modules.py:407-414):

      * unfolded (early QAT): integer conv with weight-only quantization,
        then batch-statistics BN in float; returned weight scale is
        conv_scale * gamma / sqrt(var + eps) per channel;
      * folded (late QAT / frozen): BN folded into weight and bias, folded
        weight quantized per channel, bias at 32 bits, integer conv.

    Returns ``(value, weight_scale, acc)`` where ``acc`` is the exact
    integer accumulator (f32(int32 conv + bias), folded mode) or None
    (unfolded).  Models thread ``acc`` into the following QuantAct so the
    requant runs on exact integers (no f32 value→int recovery).

    Weight layout HWIO; per-channel ranges over the output-channel axis.
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 'SAME'
    groups: int = 1
    weight_bit: int = 8
    bias_bit: int = 32
    per_channel: bool = True
    weight_percentile: float = 0.0
    bn_eps: float = 1e-5
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, pre_act_scale, *, folded: bool = True,
                 update_stats: bool = False):
        in_ch = x.shape[-1] // self.groups
        kernel = self.param('kernel', nn.initializers.he_normal(),
                            (*self.kernel_size, in_ch, self.features))
        gamma = self.param('gamma', nn.initializers.ones, (self.features,))
        beta = self.param('beta', nn.initializers.zeros, (self.features,))
        running_mean = self.variable('batch_stats', 'mean',
                                     lambda: jnp.zeros((self.features,)))
        running_var = self.variable('batch_stats', 'var',
                                    lambda: jnp.ones((self.features,)))

        if not folded:
            # --- unfolded: quantized conv then batch-stats BN in float ---
            # weight ranges detached per the reference (w.data.detach(),
            # quant_modules.py:95): gradient reaches the kernel only via
            # the STE quantize path, never via the scale
            w_flat = jax.lax.stop_gradient(kernel).reshape(-1, self.features)
            if self.per_channel:
                w_min = jnp.min(w_flat, axis=0)
                w_max = jnp.max(w_flat, axis=0)
            else:
                w_min = jnp.min(w_flat)
                w_max = jnp.max(w_flat)
            conv_scale = qops.symmetric_quant_scale(self.weight_bit, w_min, w_max)
            w_int = qops.quantize_symmetric(kernel, conv_scale, self.weight_bit)
            x_int = x / pre_act_scale
            conv_out = int_conv2d(x_int, w_int, jnp.zeros((self.features,)),
                                  self.strides, self.padding,
                                  self.groups) * conv_scale * pre_act_scale

            batch_mean = jnp.mean(conv_out, axis=(0, 1, 2))
            batch_var = jnp.var(conv_out, axis=(0, 1, 2), ddof=1)
            if update_stats:
                running_mean.value = (running_mean.value * self.bn_momentum
                                      + batch_mean * (1 - self.bn_momentum))
                running_var.value = (running_var.value * self.bn_momentum
                                     + batch_var * (1 - self.bn_momentum))
            output_factor = qops.bn_inv_factor(gamma, batch_var, self.bn_eps)
            out = output_factor * (conv_out - batch_mean) + beta
            return out, conv_scale * output_factor, None

        # --- folded path ---
        bn_factor = qops.bn_inv_factor(gamma, running_var.value, self.bn_eps)
        # exact(): the folded tensors must be consumed as leaves — XLA would
        # otherwise reassociate (kernel·bn_factor)/weight_scale into
        # kernel·(bn_factor/weight_scale), flipping borderline weight ints
        # (see quant/ops.py exact()).
        scaled_weight = qops.exact(kernel * bn_factor)   # broadcast over Cout
        scaled_bias = qops.exact(
            (jnp.zeros((self.features,)) - running_mean.value)
            * bn_factor + beta)

        # ranges from the detached folded weight (scaled_weight.data,
        # quant_modules.py:453-471) — the scale carries no gradient
        w_flat = jax.lax.stop_gradient(scaled_weight).reshape(-1, self.features)
        if self.per_channel:
            if self.weight_percentile == 0:
                w_min = jnp.min(w_flat, axis=0)
                w_max = jnp.max(w_flat, axis=0)
            else:
                # reference kthvalue-at-ceil-index semantics
                # (quant_modules.py:459-467)
                w_min, w_max = qops.weight_percentile_bounds_per_channel(
                    w_flat, self.weight_percentile)
        else:
            if self.weight_percentile == 0:
                w_min = jnp.min(w_flat)
                w_max = jnp.max(w_flat)
            else:
                w_min, w_max = qops.percentile_bounds(
                    w_flat.reshape(-1), 100 - self.weight_percentile,
                    self.weight_percentile)

        weight_scale = qops.symmetric_quant_scale(self.weight_bit, w_min, w_max)
        w_int = qops.quantize_symmetric(scaled_weight, weight_scale,
                                        self.weight_bit)
        bias_scale = qops.exact(weight_scale * pre_act_scale)
        b_int = qops.quantize_symmetric(scaled_bias, bias_scale, self.bias_bit)

        x_int = x / pre_act_scale
        # acc = f32(int32 conv + int32 bias): bit-identical to the engine's
        # accumulator at any magnitude; threaded to the next QuantAct so the
        # dyadic requant needs no value→int recovery division.
        acc = int_conv2d(x_int, w_int, b_int, self.strides, self.padding,
                         self.groups)
        out = acc * bias_scale
        return out, weight_scale, acc


class QuantConv2d(nn.Module):
    """Bare quantized conv (no BN) — parity: QuantConv2d (quant_modules.py:605-736).

    Used for the MobileNetV2 1×1 output head.
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 'SAME'
    groups: int = 1
    weight_bit: int = 8
    bias_bit: int = 32
    per_channel: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, pre_act_scale):
        in_ch = x.shape[-1] // self.groups
        kernel = self.param('kernel', nn.initializers.he_normal(),
                            (*self.kernel_size, in_ch, self.features))
        # detached ranges (w.data.detach(), quant_modules.py:663-684)
        w_flat = jax.lax.stop_gradient(kernel).reshape(-1, self.features)
        if self.per_channel:
            w_min = jnp.min(w_flat, axis=0)
            w_max = jnp.max(w_flat, axis=0)
        else:
            w_min = jnp.min(w_flat)
            w_max = jnp.max(w_flat)
        weight_scale = qops.symmetric_quant_scale(self.weight_bit, w_min, w_max)
        w_int = qops.quantize_symmetric(kernel, weight_scale, self.weight_bit)

        bias_scale = qops.exact(weight_scale * pre_act_scale)
        x_int = x / pre_act_scale
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros, (self.features,))
            b_int = qops.quantize_symmetric(bias, bias_scale, self.bias_bit)
        else:
            b_int = jnp.zeros((self.features,))
        acc = int_conv2d(x_int, w_int, b_int, self.strides, self.padding,
                         self.groups)
        return acc * bias_scale, weight_scale, acc


class QuantLinear(nn.Module):
    """Quantized dense head — parity: QuantLinear (quant_modules.py:12-130)."""
    features: int
    weight_bit: int = 8
    bias_bit: int = 32
    per_channel: bool = True

    @nn.compact
    def __call__(self, x, pre_act_scale):
        in_features = x.shape[-1]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (in_features, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))

        kd = jax.lax.stop_gradient(kernel)   # detached ranges (w.data.detach())
        if self.per_channel:
            w_min = jnp.min(kd, axis=0)
            w_max = jnp.max(kd, axis=0)
        else:
            w_min = jnp.min(kd)
            w_max = jnp.max(kd)
        weight_scale = qops.symmetric_quant_scale(self.weight_bit, w_min, w_max)
        w_int = qops.quantize_symmetric(kernel, weight_scale, self.weight_bit)
        bias_scale = qops.exact(weight_scale * pre_act_scale)
        b_int = qops.quantize_symmetric(bias, bias_scale, self.bias_bit)

        x_int = x / pre_act_scale
        acc = int_matmul(x_int, w_int, b_int)
        return acc * bias_scale


class QuantBnAct(nn.Module):
    """Standalone integer batch-norm + requantization (pre-activation nets).

    Parity target: the v2 deployment graph's explicit quantized_batchnorm
    (int mul + add) followed by relu + requantize
    (/root/reference/tvm_benchmark/mixed_precision_models/
    quantized_resnet_v2.py:42-57, layers.py:142-156).  Pre-activation units
    apply BN to the residual *stream*, which feeds both the shortcut and the
    convs, so it cannot fold into any conv — it must run as its own integer
    op.  Canonical integer semantics (shared verbatim by the engine):

        A  = in_scale · γ/√(σ²+ε)          (per channel, f32)
        b1 = round_half_up((β − μ·γ/√(σ²+ε)) / s_out)
        y  = clip(round_half_up(x_int · dyadic(A / s_out)) + b1)

    i.e. one dyadic requant plus an integer offset.  ``relu`` clamps the low
    end at 0 (applied after the BN affine, before the clip — exact because
    the offset+clip order matches the engine).  Unfolded mode (early QAT)
    runs float batch-stats BN on the value tensor instead.
    """
    features: int
    bits: int = 8
    momentum: float = 0.99
    quant_mode: str = 'symmetric'
    relu: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, in_scale, *, x_int=None, folded: bool = True,
                 update_stats: bool = False):
        gamma = self.param('gamma', nn.initializers.ones, (self.features,))
        beta = self.param('beta', nn.initializers.zeros, (self.features,))
        running_mean = self.variable('batch_stats', 'mean',
                                     lambda: jnp.zeros((self.features,)))
        running_var = self.variable('batch_stats', 'var',
                                    lambda: jnp.ones((self.features,)))
        x_min = self.variable('quant_stats', 'x_min',
                              lambda: jnp.zeros((), jnp.float32))
        x_max = self.variable('quant_stats', 'x_max',
                              lambda: jnp.zeros((), jnp.float32))

        if not folded:
            batch_mean = jnp.mean(x, axis=(0, 1, 2))
            batch_var = jnp.var(x, axis=(0, 1, 2), ddof=1)
            if update_stats:
                running_mean.value = (running_mean.value * self.bn_momentum
                                      + batch_mean * (1 - self.bn_momentum))
                running_var.value = (running_var.value * self.bn_momentum
                                     + batch_var * (1 - self.bn_momentum))
            bn_factor = qops.bn_inv_factor(gamma, batch_var, self.bn_eps)
            y = (x - batch_mean) * bn_factor + beta
        else:
            bn_factor = qops.bn_inv_factor(gamma, running_var.value,
                                           self.bn_eps)
            if x_int is None:
                x_int = qops.ste_recover_int(x, in_scale)
            y = x_int * (in_scale * bn_factor) \
                + (beta - running_mean.value * bn_factor)
        if self.relu:
            y = nn.relu(y)

        if update_stats:
            yd = jax.lax.stop_gradient(y)    # buffer stats, detached
            cur_min, cur_max = jnp.min(yd), jnp.max(yd)
            uninit = x_min.value == x_max.value
            new_min = x_min.value * self.momentum + cur_min * (1 - self.momentum)
            new_max = x_max.value * self.momentum + cur_max * (1 - self.momentum)
            x_min.value = jnp.where(uninit, cur_min, new_min)
            x_max.value = jnp.where(uninit, cur_max, new_max)

        signed = self.quant_mode == 'symmetric'
        if signed:
            scale = qops.symmetric_quant_scale(self.bits, x_min.value,
                                               x_max.value)
        else:
            scale = qops.asymmetric_quant_scale(self.bits, x_min.value,
                                                x_max.value)

        if not folded:
            q = (qops.quantize_symmetric(y, scale, self.bits) if signed
                 else qops.quantize_asymmetric(y, scale, self.bits))
            self.sow('intermediates', 'q_int', q)
            return q * scale, scale

        # folded: pure-integer BN affine + requant, engine-identical
        a_scale = qops.exact(in_scale * bn_factor)
        b1 = qops.ste_round((beta - running_mean.value * bn_factor) / scale)
        q = qops.requant_core_ste(x_int, a_scale, scale, None, signed) + b1
        if self.relu:
            q = jnp.maximum(q, 0.0)
        lo, hi = qops.requant_clip_bounds(self.bits, signed)
        q = jnp.clip(q, lo, hi)
        self.sow('intermediates', 'q_int', q)
        return q * scale, scale


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------

class QuantDropout(nn.Module):
    """Scale-passthrough dropout (quant_modules.py:532-554).

    Dropout rescales surviving activations by 1/(1-p), which breaks the
    int·scale invariant during training; like the reference, it is applied
    on the value tensor (fake-quant semantics recover at the next QuantAct)
    and is the identity at inference.
    """
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, scale, *, deterministic: Optional[bool] = None):
        """deterministic=None (the default) keys off rng availability: the
        layer drops only when the caller provided a 'dropout' rng (the train
        step does, eval/calibration/engine don't) — so wiring it into a
        model changes no call signatures, mirroring the reference where
        nn.Dropout keys off module.training."""
        if deterministic is None:
            deterministic = not self.has_rng('dropout')
        if self.rate > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.rate, deterministic=False)(x)
        return x, scale


def quant_max_pool(x, scale, window=(3, 3), strides=(2, 2), padding='SAME'):
    """Max pool is scale-invariant — passthrough (quant_modules.py:497-529)."""
    y = nn.max_pool(x, window, strides=strides, padding=padding)
    return y, scale


def quant_avg_pool(x, scale, window, strides=(1, 1), padding='VALID'):
    """Integer average pooling (quant_modules.py:557-602).

    Divide out the scale, round to exact ints, average-pool, truncate the
    float average to the integer division a hardware pool performs, rescale.
    """
    x_int = qops.ste_round(x / scale)
    # window-sum then a pinned true division: nn.avg_pool's internal
    # x/window_size is subject to XLA's reciprocal-multiply rewrite (1 ulp),
    # which can flip the trunc(+0.01) below between jit and eager for large
    # integer sums.  exact_div keeps QAT and every engine on the identical
    # IEEE divide (see quant/ops.py exact_div; engines mirror this op order).
    summed = nn.pool(x_int, 0.0, jax.lax.add, window, strides, padding)
    pooled = qops.exact_div(summed, float(window[0] * window[1]))
    pooled_int = qops.ste_floor_eps(pooled)
    return pooled_int * scale, scale


def quant_global_avg_pool(x, scale):
    """Global spatial integer average pool → (B, C)."""
    h, w = x.shape[1], x.shape[2]
    y, s = quant_avg_pool(x, scale, (h, w))
    return y.reshape(y.shape[0], -1), s

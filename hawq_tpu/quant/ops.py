"""Core quantization math, TPU-first.

This module is the single source of truth for the integer numerics of the
framework.  Every function here is a pure jax function; the same code runs in
the QAT (fake-quant, differentiable) graph and — numerically bit-for-bit
identical — in the frozen integer inference engine.  This collapses the
reference's split between training-side autograd functions
(/root/reference/utils/quantization_utils/quant_utils.py:216-460) and the
TVM-side requantize lowering into one definition, which is what makes the
"exact parity" test strategy (SURVEY.md §4) trivial to satisfy.

Capability parity notes (reference file:line):
  * symmetric/asymmetric scale computation  — quant_utils.py:128-185
  * STE quantizers                          — quant_utils.py:216-321
  * dyadic (m, e) decomposition             — quant_utils.py:188-213 (batch_frexp)
  * fixed-point requantization, cases 0/1   — quant_utils.py:344-460 (fixedpoint_fn)
  * integer average pooling truncation      — quant_utils.py:324-341

TPU-native design of the dyadic requant
---------------------------------------
The reference decomposes ``scale_ratio ≈ m / 2**e`` with a 31-bit mantissa and
evaluates ``round(acc * m / 2**e)`` in float64.  TPUs have no fast float64 and
no int64 VPU path, but the reference's multiplier only ever carries float32
precision anyway: its scale ratio is deliberately round-tripped through
float32 ("follow TVM's computation", quant_utils.py:394-396), so the 31-bit
mantissa holds at most 24 significant bits.  We therefore define the canonical
dyadic multiplier with a 23-bit mantissa, which makes ``m * 2**-e`` *exactly*
representable as a float32.  The requant is then a single fused VPU
multiply-add-floor:

    out = floor(f32(acc) * ldexp(m, -e) + 0.5)

This is still a true dyadic rational multiplier (integer m, power-of-two
denominator: integer-only DSP hardware could evaluate it exactly); on TPU the
f32 VPU path *is* the native way to evaluate it.  Because QAT and the frozen
engine call the very same jitted formula, parity is exact by construction.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# Number of mantissa bits in the dyadic multiplier.  23 ⇒ m ∈ [2**22, 2**23],
# so m and m * 2**-e are exact float32 values.
DYADIC_MANTISSA_BITS = 23

_EPS = 1e-8  # scale clamp floor, mirrors quant_utils.py:147,150,173


def exact(x):
    """Pin a quantization-critical value against XLA algebraic rewrites.

    XLA's algebraic simplifier freely rewrites f32 arithmetic under jit —
    ``a / sqrt(b)`` → ``a * rsqrt(b)``, ``(a / c) * b`` → ``(a * b) / c``,
    and similar mul/div reassociations — each differing from the written
    op order by 1 ulp on a large fraction of inputs.  A 1-ulp scale change
    flips borderline round-half-up decisions, silently breaking bit-exact
    QAT↔engine parity at real-model scale (eager execution and the numpy
    freeze mirror both evaluate the written op order).  Wrapping a scale,
    ratio, or multiplier in ``exact()`` makes it opaque to the simplifier:
    the value is computed exactly as written and consumed as a leaf.

    Gradients pass through unchanged (optimization_barrier is linear).
    """
    return jax.lax.optimization_barrier(x)


def exact_div(x: jnp.ndarray, denom) -> jnp.ndarray:
    """True IEEE division, immune to XLA's divide-by-constant rewrite.

    XLA turns ``x / c`` (c a compile-time constant) into ``x * (1/c)``,
    which differs from true division by 1 ulp on ~5% of inputs — enough to
    flip borderline round-half-up decisions.  Pinning the denominator keeps
    the divide a real divide.  Use for every quantization-critical division
    whose denominator is a Python/numpy constant (bit-range denominators,
    baked-in engine scales); divisions by traced values are not rewritten.
    """
    return x / exact(jnp.asarray(denom, jnp.result_type(x, jnp.float32)))


def bn_inv_factor(gamma: jnp.ndarray, var: jnp.ndarray,
                  eps: float) -> jnp.ndarray:
    """γ / √(var + ε) with IEEE divide-then-sqrt semantics under jit.

    Every BN fold in the framework MUST come through here: the sqrt is
    pinned so the rsqrt rewrite cannot fire, and the quotient is pinned so
    downstream products cannot reassociate into it (see :func:`exact`).
    """
    return exact(gamma / exact(jnp.sqrt(var + eps)))


def round_half_up(x: jnp.ndarray) -> jnp.ndarray:
    """Deterministic round-half-up (0.5 → 1, -0.5 → 0).

    The reference rounds with torch.round (banker's rounding) for tensors but
    decimal.ROUND_HALF_UP for the dyadic mantissa (quant_utils.py:206).  We use
    half-up everywhere: it is one fused floor on the VPU and self-consistent
    across the whole framework.
    """
    return jnp.floor(x + 0.5)


# ---------------------------------------------------------------------------
# Scale computation
# ---------------------------------------------------------------------------

def symmetric_quant_scale(num_bits: int, sat_min: jnp.ndarray,
                          sat_max: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-tensor or per-channel scale.

    scale = max(|sat_min|, |sat_max|).clip(1e-8) / (2**(b-1) - 1)
    Mirrors quant_utils.py:128-152.  Works elementwise, so per-channel falls
    out of passing vector saturation bounds.
    """
    n = 2 ** (num_bits - 1) - 1
    bound = jnp.maximum(jnp.abs(sat_min), jnp.abs(sat_max))
    return exact(exact_div(jnp.clip(bound, min=_EPS), n))


def asymmetric_quant_scale(num_bits: int, sat_min: jnp.ndarray,
                           sat_max: jnp.ndarray) -> jnp.ndarray:
    """Asymmetric (scaled-unsigned, zero_point forced 0) scale.

    Only valid post-ReLU, matching the hardware constraint documented at
    quant_utils.py:155-185.  scale = (max - min).clip(1e-8) / (2**b - 1).
    """
    n = 2 ** num_bits - 1
    return exact(exact_div(jnp.clip(sat_max - sat_min, min=_EPS), n))


def fused_minmax(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(min, max) of an activation tensor — the measured-best formulation.

    jnp.min + jnp.max lower to two separate reduction kernels, each
    re-reading the tensor — but each pass runs AT the HBM read roofline
    (205 MB in 0.622 ms ≈ 660 GB/s, v5e), and every one-pass alternative
    measured WORSE: XLA's variadic (min,max) reduce 1.794 ms (3×), a
    pallas one-pass kernel (kernels/reduce.py) 0.899 ms fed layout-native
    2D and 1.535 ms fed NHWC (the mandatory in-graph case — XLA inserts a
    ~0.64 ms relayout copy before the custom call), a running-accumulator
    variant 1.632 ms.  The custom-call read rate (~230 GB/s) never
    approaches XLA's own reduction DMA.  So the two-pass jnp formulation
    stays; the pallas kernel is kept exactness-tested as the alternative
    for future toolchains.  (benchmarks/train_breakdown_b64.json
    minmax_isolated_205MB.)
    """
    return jnp.min(x), jnp.max(x)


def percentile_bounds(x_flat: jnp.ndarray, lower_pct: float,
                      upper_pct: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Percentile min/max of a flat tensor — exact order statistics with the
    reference's index semantics (get_percentile_min_max, quant_utils.py:40-70).

    lower_pct / upper_pct are in percent, e.g. (0.1, 99.9) keeps the central
    99.8%.  The reference takes ``torch.kthvalue`` at
    ``round(len·upper_pct/100)`` for the upper bound and the *negated*
    kthvalue at ``round(len·(1 − lower_pct/100))`` for the lower bound — no
    interpolation (``round`` is Python's builtin, half-even).  Calibrated
    ranges of percentile-trained imported checkpoints depend on these exact
    indices, so jnp.quantile's linear interpolation is not acceptable here.

    One ascending sort serves both ends:  -kthvalue(-x, k) equals the
    (n-k+1)-th smallest of x, i.e. ``sorted(x)[n-k]`` — identical value for
    ties, and ``-(-v) == v`` bit-for-bit for every float.  Indices are
    computed host-side (shapes are static under jit).
    """
    n = int(x_flat.shape[0])
    s = jnp.sort(x_flat)
    upper_index = round(n * upper_pct * 0.01)
    # torch.kthvalue(k=0) raises; a wrapped s[-1] would silently return the
    # tensor max instead — fail loudly like the reference does.
    if upper_index < 1:
        raise ValueError(
            f'percentile_bounds: upper index {upper_index} < 1 '
            f'(n={n}, upper_pct={upper_pct}) — tensor too small for this '
            f'percentile (reference torch.kthvalue would raise)')
    upper = s[upper_index - 1]
    if lower_pct == 0:
        lower = upper * 0
    else:
        lower_index = round(n * (1.0 - lower_pct * 0.01))
        if lower_index < 1 or lower_index > n:
            raise ValueError(
                f'percentile_bounds: lower index {lower_index} out of '
                f'[1, {n}] (lower_pct={lower_pct})')
        lower = s[n - lower_index]
    return lower, upper


def weight_percentile_bounds_per_channel(
        w_flat: jnp.ndarray, pct: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel weight percentile range, reference kthvalue semantics.

    ``w_flat`` is (L, Cout) — per-channel elements along axis 0 (the
    channel-minor transpose of the reference's ``view(out_channels, -1)``).
    The reference (QuantBnConv2d folded / QuantConv2d,
    quant_modules.py:459-467, 697-705) uses ``math.ceil`` indices — a
    *different* rounding from the activation path's ``round`` —
    and takes the plain kthvalue for BOTH bounds (no negation):
      w_min = kth smallest at ceil(L·(100−pct)/100),
      w_max = kth smallest at ceil(L·pct/100).
    """
    ln = int(w_flat.shape[0])
    lower_index = math.ceil(ln * (100.0 - pct) * 0.01)
    upper_index = math.ceil(ln * pct * 0.01)
    # index 0 would wrap to ws[-1] (per-channel max as w_min, inverting the
    # range); the reference's torch.kthvalue(k=0) raises instead.
    if lower_index < 1 or upper_index < 1:
        raise ValueError(
            f'weight_percentile_bounds_per_channel: kth indices '
            f'({lower_index}, {upper_index}) < 1 (L={ln}, pct={pct}) — '
            f'channel too small for this percentile')
    ws = jnp.sort(w_flat, axis=0)
    return ws[lower_index - 1], ws[upper_index - 1]


# ---------------------------------------------------------------------------
# STE quantizers
# ---------------------------------------------------------------------------

def _reshape_scale_like(scale: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-channel scale against x.

    Layout convention is channel-LAST everywhere (NHWC activations, HWIO
    weights flattened to (..., Cout)), so a 1-D scale broadcasts naturally.
    Scalar scales broadcast trivially.  (The reference is channels-first and
    needs shape-cased reshapes, quant_utils.py:83-93; NHWC removes that.)
    """
    del x
    return scale


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def quantize_symmetric(x: jnp.ndarray, scale: jnp.ndarray,
                       num_bits: int) -> jnp.ndarray:
    """Symmetric STE quantizer → integer-valued f32 tensor in [-2^(b-1), 2^(b-1)-1].

    Returns the *integer values* (float dtype); callers multiply by scale to
    get the fake-quant value.  Backward is the straight-through estimator
    g / scale with no range masking, mirroring SymmetricQuantFunction
    (quant_utils.py:231-272).
    """
    n = 2 ** (num_bits - 1) - 1
    q = round_half_up(x / _reshape_scale_like(scale, x))
    return jnp.clip(q, -n - 1, n)


def _quantize_symmetric_fwd(x, scale, num_bits):
    return quantize_symmetric(x, scale, num_bits), scale


def _quantize_symmetric_bwd(num_bits, scale, g):
    return (g / _reshape_scale_like(scale, g), jnp.zeros_like(scale))


quantize_symmetric.defvjp(_quantize_symmetric_fwd, _quantize_symmetric_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def quantize_asymmetric(x: jnp.ndarray, scale: jnp.ndarray,
                        num_bits: int) -> jnp.ndarray:
    """Asymmetric (unsigned, zero_point=0) STE quantizer → ints in [0, 2^b-1].

    Mirrors AsymmetricQuantFunction (quant_utils.py:275-321); only used for
    post-ReLU activations.
    """
    n = 2 ** num_bits - 1
    q = round_half_up(x / _reshape_scale_like(scale, x))
    return jnp.clip(q, 0, n)


def _quantize_asymmetric_fwd(x, scale, num_bits):
    return quantize_asymmetric(x, scale, num_bits), scale


def _quantize_asymmetric_bwd(num_bits, scale, g):
    return (g / _reshape_scale_like(scale, g), jnp.zeros_like(scale))


quantize_asymmetric.defvjp(_quantize_asymmetric_fwd, _quantize_asymmetric_bwd)


@jax.custom_vjp
def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through round-half-up (quant_utils.py:216-228)."""
    return round_half_up(x)


ste_round.defvjp(lambda x: (ste_round(x), None), lambda _, g: (g,))


@jax.custom_vjp
def ste_floor_eps(x: jnp.ndarray) -> jnp.ndarray:
    """trunc(x + 0.01) with STE backward — integer average pooling.

    Converts float-division average pooling into the integer division a
    hardware avg-pool performs; the 0.01 epsilon absorbs float representation
    error (e.g. 2 showing up as 1.99999999) and is safe for pool windows up to
    7×7 (needs 48/49 + eps < 1).  Mirrors
    transfer_float_averaging_to_int_averaging (quant_utils.py:324-341).
    """
    return jnp.trunc(x + 0.01)


ste_floor_eps.defvjp(lambda x: (ste_floor_eps(x), None), lambda _, g: (g,))


# ---------------------------------------------------------------------------
# Dyadic requantization (the heart of HAWQ-V3)
# ---------------------------------------------------------------------------

def dyadic_decompose(scale_ratio: jnp.ndarray,
                     mantissa_bits: int = DYADIC_MANTISSA_BITS
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decompose a positive scale ratio into (m, e) with ratio ≈ m / 2**e.

    m is an integer in [2**(mb-1), 2**mb] held in float32 (exact), e int32.
    TPU-native replacement for batch_frexp (quant_utils.py:188-213): same
    round-half-up mantissa rounding, 23-bit mantissa instead of 31 so that the
    reconstructed multiplier is an exact float32 (see module docstring).
    """
    mant, exp = jnp.frexp(scale_ratio.astype(jnp.float32))
    m = round_half_up(mant * (2.0 ** mantissa_bits))
    e = mantissa_bits - exp
    return m, e.astype(jnp.int32)


def dyadic_multiplier(scale_ratio: jnp.ndarray) -> jnp.ndarray:
    """The exact float32 value of the dyadic multiplier m * 2**-e.

    Snapping a scale ratio to its dyadic grid point; multiplying an int32
    accumulator by this float32 is bit-identical to evaluating the integer
    expression round(acc * m / 2**e) up to the documented f32 product
    rounding, and is the canonical requant multiplier everywhere.
    """
    m, e = dyadic_decompose(scale_ratio)
    return exact(jnp.ldexp(m, -e))


def _requant_core(z_int: jnp.ndarray, scale_ratio: jnp.ndarray) -> jnp.ndarray:
    """round_half_up(z_int * dyadic(scale_ratio)), unclamped."""
    return round_half_up(z_int * dyadic_multiplier(scale_ratio))


def requant_clip_bounds(num_bits: int, signed: bool) -> Tuple[float, float]:
    if signed:
        n = 2 ** (num_bits - 1) - 1
        return float(-n - 1), float(n)
    return 0.0, float(2 ** num_bits - 1)


@jax.custom_vjp
def ste_recover_int(z: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """round_half_up(z / scale) with STE backward g / scale.

    Recovers the exact integer tensor from an int·scale value.  Exact as long
    as the integers stay below 2**22 (f32 product/divide round-trip error
    < 0.5); raw conv accumulators can exceed that, which is why the quant
    layers thread their accumulator tensors directly (``z_int`` arguments
    below) instead of relying on recovery.
    """
    return round_half_up(z / scale)


ste_recover_int.defvjp(
    lambda z, s: (ste_recover_int(z, s), s),
    lambda s, g: (g / s, jnp.zeros_like(s)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def requant_core_ste(z_int: jnp.ndarray, acc_scale: jnp.ndarray,
                     out_scale: jnp.ndarray, num_bits: Optional[int],
                     signed: bool) -> jnp.ndarray:
    """Dyadic requant of an exact integer tensor, with STE backward.

    z_int is an integer-valued f32 tensor (e.g. the raw int32 accumulator of
    int_conv2d, cast to f32).  Forward is the canonical dyadic arithmetic —
    identical to the frozen engine's :func:`requant_int32` — snap
    acc_scale/out_scale to the dyadic grid, multiply, round, clamp
    (num_bits=None skips the clamp, the residual-branch case).  Backward is
    the straight-through estimator g·acc_scale/out_scale: chained with the
    producing layer's 1/acc_scale value→int factor this reproduces the
    reference's g/out_scale (quant_utils.py:458-460).
    """
    out = _requant_core(z_int, exact(acc_scale / out_scale))
    if num_bits is None:
        return out
    lo, hi = requant_clip_bounds(num_bits, signed)
    return jnp.clip(out, lo, hi)


def _requant_core_ste_fwd(z_int, acc_scale, out_scale, num_bits, signed):
    out = requant_core_ste(z_int, acc_scale, out_scale, num_bits, signed)
    return out, (acc_scale, out_scale)


def _requant_core_ste_bwd(num_bits, signed, res, g):
    acc_scale, out_scale = res
    return (g * acc_scale / out_scale, jnp.zeros_like(acc_scale),
            jnp.zeros_like(out_scale))


requant_core_ste.defvjp(_requant_core_ste_fwd, _requant_core_ste_bwd)


def dyadic_requant(z: jnp.ndarray, acc_scale: jnp.ndarray,
                   out_scale: jnp.ndarray, num_bits: int, signed: bool,
                   z_int: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Requantize an int32-valued accumulator tensor to num_bits.

    z            — accumulator *value* tensor (= z_int * acc_scale, float)
    acc_scale    — product s_act * s_weight of the producing layer
                   (scalar or per-channel over the last axis)
    out_scale    — target activation scale (scalar)
    z_int        — optional exact integer tensor; when given the value/scale
                   recovery division is skipped entirely, making the result
                   bit-exact for accumulators beyond the f32 round-trip range
    returns      — integer values in the target bit range (float dtype)

    Mirrors fixedpoint_fn case 0 (quant_utils.py:390-413): recover z_int,
    snap acc_scale/out_scale to the dyadic grid, multiply, round, clamp.
    Backward is STE scaled by 1/out_scale (quant_utils.py:458-460).
    """
    if z_int is None:
        z_int = ste_recover_int(z, acc_scale)
    return requant_core_ste(z_int, acc_scale, out_scale, num_bits, signed)


def dyadic_requant_residual(z: jnp.ndarray, acc_scale: jnp.ndarray,
                            identity: jnp.ndarray, identity_scale: jnp.ndarray,
                            out_scale: jnp.ndarray,
                            z_int: Optional[jnp.ndarray] = None,
                            identity_int: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """Residual-add requantization — fixedpoint_fn case 1 (quant_utils.py:415-456).

    z is the *sum* main + identity (both int·scale tensors); the two branches
    are separated, each requantized with its own dyadic multiplier to the
    common out_scale, rounded independently, then added.  Note: like the
    reference, the sum is NOT clamped here (the residual carries the
    16-bit-config precision); the following QuantAct clamps.

    ``z_int`` is the exact *main-branch* integer accumulator (not the sum);
    when given, the main branch skips the f32 subtraction + recovery and the
    result is bit-exact at any accumulator magnitude.  ``identity_int``
    likewise for a convolved identity branch.
    """
    if z_int is None:
        z_int = ste_recover_int(z - identity, acc_scale)
    if identity_int is None:
        identity_int = ste_recover_int(identity, identity_scale)
    out_main = requant_core_ste(z_int, acc_scale, out_scale, None, True)
    out_id = requant_core_ste(identity_int, identity_scale, out_scale,
                              None, True)
    return out_main + out_id


# ---------------------------------------------------------------------------
# Pure integer-side helpers (frozen inference engine)
# ---------------------------------------------------------------------------

def requant_int32(acc: jnp.ndarray, multiplier: jnp.ndarray,
                  num_bits: int, signed: bool,
                  out_dtype: jnp.dtype = jnp.int8) -> jnp.ndarray:
    """Frozen-engine requant: int32 accumulator → num_bits integers.

    ``multiplier`` must come from :func:`dyadic_multiplier` (host- or
    trace-time).  This is the same arithmetic as :func:`dyadic_requant` minus
    the scale bookkeeping — used in the integer graph where activations are
    real int8/int32 arrays rather than int·scale floats.  Pick out_dtype int8
    for ≤8-bit targets, int32 for the 16-bit residual-precision nodes.
    """
    out = round_half_up(acc.astype(jnp.float32) * multiplier)
    lo, hi = requant_clip_bounds(num_bits, signed)
    return jnp.clip(out, lo, hi).astype(out_dtype)


def _assert_x64() -> None:
    if jnp.zeros((), jnp.float64).dtype != jnp.dtype('float64'):
        raise RuntimeError(
            "requant_mode='reference' needs float64: enable jax x64 "
            "(jax.experimental.enable_x64() context or "
            "jax.config.update('jax_enable_x64', True)) around both the "
            "engine build and its calls")


def requant_int32_ref(acc: jnp.ndarray, m: jnp.ndarray, inv2e: jnp.ndarray,
                      num_bits: int, signed: bool,
                      out_dtype: jnp.dtype = jnp.int8) -> jnp.ndarray:
    """Reference-exact replay requant (31-bit mantissa, float64).

    ``(m, inv2e)`` come from reference_oracle.decompose_ref — the
    reference's batch_frexp constants.  Evaluates fixedpoint_fn case 0
    (quant_utils.py:390-413) exactly: the float64 product acc·m rounds
    exactly as torch's does (the optimization barrier stops XLA from
    reassociating it with the exact 2⁻ᵉ factor, which would change which
    step rounds), then round-half-even, clamp.  Requires jax x64; intended
    for imported reference checkpoints on CPU — the production TPU path is
    the native 23-bit mode (TPUs have no f64).
    """
    _assert_x64()
    p = exact(acc.astype(jnp.float64) * m)
    out = jnp.rint(p * inv2e)
    lo, hi = requant_clip_bounds(num_bits, signed)
    return jnp.clip(out, lo, hi).astype(out_dtype)


def requant_add_int32_ref(acc: jnp.ndarray, m_acc: jnp.ndarray,
                          inv2e_acc: jnp.ndarray, identity: jnp.ndarray,
                          m_id: jnp.ndarray, inv2e_id: jnp.ndarray,
                          out_dtype: jnp.dtype = jnp.int32) -> jnp.ndarray:
    """Reference-exact dual-branch residual requant-add (fixedpoint_fn
    case 1, quant_utils.py:415-456): each branch rounds half-even in f64
    with its own 31-bit (m, e); the sum is left unclamped."""
    _assert_x64()
    a = jnp.rint(exact(acc.astype(jnp.float64) * m_acc) * inv2e_acc)
    b = jnp.rint(exact(identity.astype(jnp.float64) * m_id) * inv2e_id)
    return (a + b).astype(out_dtype)


def requant_add_int32(acc: jnp.ndarray, acc_multiplier: jnp.ndarray,
                      identity: jnp.ndarray, id_multiplier: jnp.ndarray,
                      out_dtype: jnp.dtype = jnp.int32) -> jnp.ndarray:
    """Frozen-engine dual-branch residual requant-add → int32.

    Matches :func:`dyadic_requant_residual` exactly: each branch rounds with
    its own dyadic multiplier, the sum is left unclamped (it carries the
    16-bit residual precision of the quant_act_int32 nodes) and stays in an
    int32 container until the next unit's input requant narrows it.
    ``out_dtype=float32`` keeps the (integer-valued, < 2²⁴) sum in f32 for
    the certified-f32 engine route — same numbers, no retiling convert.
    """
    a = round_half_up(acc.astype(jnp.float32) * acc_multiplier)
    b = round_half_up(identity.astype(jnp.float32) * id_multiplier)
    return (a + b).astype(out_dtype)

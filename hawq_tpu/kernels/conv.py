"""Pallas TPU integer convolution kernels with fused dyadic requant epilogues.

The conv half of the native-kernel layer — the role the TVM fork's
tensor-core conv schedules play in the reference (SURVEY.md §2.2):

  reference                                    here
  -------------------------------------------  ------------------------------
  conv2d_nhwc_tensorcore_im2col.cuda (int8)    int8_conv_requant / _acc
  conv2d_HWNCnc_tensorcore.cuda (uint4×int4)   int4w_conv_requant / _acc
                                               (nibble-packed weights)
  HWNC layout transforms                       space-to-depth stride-2
                                               rewrite (s2d_conv_transform)

Design (TPU v5e):
  * stride-1 only in the kernel.  Stride-2 convolutions are rewritten
    outside via **space-to-depth**: fold 2×2 pixel blocks into channels and
    run the identical MACs as a stride-1 conv with a half-size kernel on 4C
    channels (bit-exact: same products, same int32 sums, reordered).  1×1
    stride-2 convs are plain slices.
  * implicit GEMM, tap-decomposed: the padded input lives in VMEM as one
    (Hp, Wp·C) slab per sample; for each kernel tap (dy, dx) the kernel
    slices rows [dy, dy+H) and lanes [dx·C, (dx+W)·C) — contiguous because
    the layout is channel-minor — reshapes to (H·W, C) and issues one MXU
    dot against that tap's (C, N-block) weight slice, accumulating int32.
  * grid order (cout_tiles, batch): batch innermost, so each weight block
    streams from HBM **once** per kernel — the weight-bandwidth term, which
    is what the packed-int4 variant halves, is minimal by construction.
    Activations re-stream once per cout tile (they are the small operand at
    serving batch sizes).
  * int4 weights are nibble-packed **per tap, split-C**: byte[t, c, n] =
    (W[t, c+C/2, n] << 4) | (W[t, c, n] & 0xF), so unpacking yields two
    contiguous half-C slabs and each tap runs two MXU dots — no lane
    interleaving (same layout idea as kernels/matmul.py).
  * the epilogue is the framework-canonical dyadic requant
    (hawq_tpu/quant/ops.py): clip(floor(f32(acc + bias)·(m·2⁻ᵉ) + 0.5)),
    per-output-channel multipliers, fused in VMEM; the `_acc` variants
    return the raw int32 accumulator + bias for residual-add consumers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# host-side layout helpers
# ---------------------------------------------------------------------------

def flatten_conv_kernel(w: np.ndarray) -> np.ndarray:
    """(kh, kw, C, O) HWIO → (kh·kw·C, O), row = (dy·kw + dx)·C + c."""
    kh, kw, c, o = w.shape
    return np.ascontiguousarray(w.reshape(kh * kw * c, o))


def pack_int4_conv(w_flat: np.ndarray, taps: int) -> np.ndarray:
    """Per-tap split-C nibble packing of a flattened conv kernel.

    w_flat (taps·C, N) int4-valued int8 → (taps·C/2, N) bytes; within each
    tap block, byte[c, n] = (W[c + C/2, n] << 4) | (W[c, n] & 0xF).
    """
    k, n = w_flat.shape
    c = k // taps
    assert c % 2 == 0, (k, taps)
    w3 = w_flat.reshape(taps, c, n)
    lo = w3[:, : c // 2].astype(np.uint8) & 0xF
    hi = (w3[:, c // 2:].astype(np.uint8) & 0xF) << 4
    return np.ascontiguousarray((lo | hi).astype(np.int8)
                                .reshape(taps * (c // 2), n))


def prepare_conv_input(x8: jnp.ndarray, pad: Tuple[int, int]) -> jnp.ndarray:
    """NHWC int8 → symmetrically zero-padded (B, H+2ph, (W+2pw)·C) slab.

    The kernel's output geometry (out_hw) then satisfies
    Hp = H_out + kh - 1 with H_out = H + 2ph - kh + 1 — SAME-style padded
    convs pass their conv padding, VALID convs pass (0, 0).
    """
    b, h, w, c = x8.shape
    ph, pw = pad
    if ph or pw:
        x8 = jnp.pad(x8, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    return x8.reshape(b, h + 2 * ph, (w + 2 * pw) * c)


def s2d_input(x8: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Space-to-depth half of the stride-2 rewrite: pad, make even, fold
    2×2 pixel blocks into channels → (B, ⌈(H+2p)/2⌉, ⌈(W+2p)/2⌉, 4C)."""
    c = x8.shape[-1]
    xp = jnp.pad(x8, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = xp.shape[1], xp.shape[2]
    if hp % 2:
        xp = jnp.pad(xp, ((0, 0), (0, 1), (0, 0), (0, 0)))
        hp += 1
    if wp % 2:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 1), (0, 0)))
        wp += 1
    x2 = xp.reshape(x8.shape[0], hp // 2, 2, wp // 2, 2, c)
    return x2.transpose(0, 1, 3, 2, 4, 5).reshape(
        x8.shape[0], hp // 2, wp // 2, 4 * c)


def s2d_kernel(w: np.ndarray) -> np.ndarray:
    """Kernel half of the stride-2 rewrite: (kh, kw, C, O) → (a, b, 4C, O)
    with the kernel zero-padded to the next even size and 2×2-folded in the
    same (cy, cx, c) channel order as :func:`s2d_input`."""
    kh, kw, c, o = w.shape
    a, b2 = (kh + 2) // 2, (kw + 2) // 2
    wpad = np.zeros((2 * a, 2 * b2, c, o), w.dtype)
    wpad[:kh, :kw] = w
    w2 = wpad.reshape(a, 2, b2, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return w2.reshape(a, b2, 4 * c, o)


def s2d_conv_transform(x8: jnp.ndarray, w: np.ndarray, pad: int
                       ) -> Tuple[jnp.ndarray, np.ndarray]:
    """Rewrite a stride-2 conv as a stride-1 conv via space-to-depth.

    x8 (B, H, W, C) int8, w (kh, kw, C, O); returns (x2 (B, H2, W2, 4C),
    w2 (a, b, 4C, O)) such that conv(x2, w2, stride 1, VALID) equals
    conv(x8, w, stride 2, pad) exactly (identical integer products).
    Generalizes the engine's 7×7 init rewrite (inference/engine.py) to any
    kernel size / padding.
    """
    return s2d_input(x8, pad), s2d_kernel(w)


def s2d_output_hw(h: int, w: int, kh: int, kw: int, pad: int
                  ) -> Tuple[int, int]:
    """Output spatial size of the stride-2 conv the transform replaces."""
    return ((h + 2 * pad - kh) // 2 + 1, (w + 2 * pad - kw) // 2 + 1)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _tap_dot(x_ref, w_ref, dy, dx, t, H, W, C, int4):
    xt = x_ref[0, dy:dy + H, dx * C:(dx + W) * C].reshape(H * W, C)
    if not int4:
        wt = w_ref[t * C:(t + 1) * C, :]
        return jax.lax.dot_general(xt, wt, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
    ch = C // 2
    packed = w_ref[t * ch:(t + 1) * ch, :].astype(jnp.int32)
    # Mosaic can't shift int8 vectors — widen to int32, shift, narrow
    w_lo = jnp.right_shift(jnp.left_shift(packed, 28), 28).astype(jnp.int8)
    w_hi = jnp.right_shift(packed, 4).astype(jnp.int8)  # sign from the byte
    acc = jax.lax.dot_general(xt[:, :ch], w_lo, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(xt[:, ch:], w_hi, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    return acc


def _conv_kernel(x_ref, w_ref, b_ref, m_ref, out_ref, *, H, W, C, kh, kw,
                 lo, hi, int4, acc_only):
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            d = _tap_dot(x_ref, w_ref, dy, dx, dy * kw + dx, H, W, C, int4)
            acc = d if acc is None else acc + d
    acc = acc + b_ref[:]
    if acc_only:
        out_ref[0] = acc
    else:
        out = jnp.floor(acc.astype(jnp.float32) * m_ref[:] + 0.5)
        out_ref[0] = jnp.clip(out, lo, hi).astype(jnp.int8)


def _conv_call(xp, w_q, bias, mult, *, taps, out_hw, cin, out_bits, signed,
               relu, block_n, int4, acc_only):
    kh, kw = taps
    H, W = out_hw
    B, Hp, WpC = xp.shape
    C = cin
    assert Hp == H + kh - 1 and WpC == (W + kw - 1) * C, (xp.shape, taps,
                                                          out_hw, cin)
    K, N = w_q.shape
    assert K == kh * kw * (C // 2 if int4 else C), (K, taps, C, int4)
    bn = min(block_n, N)
    if signed:
        q = 2 ** (out_bits - 1) - 1
        lo_b, hi_b = float(-q - 1), float(q)
    else:
        lo_b, hi_b = 0.0, float(2 ** out_bits - 1)
    if relu:
        lo_b = 0.0

    out_dtype = jnp.int32 if acc_only else jnp.int8
    kernel = functools.partial(_conv_kernel, H=H, W=W, C=C, kh=kh, kw=kw,
                               lo=lo_b, hi=hi_b, int4=int4, acc_only=acc_only)
    # grid: batch innermost so each weight block is DMA'd exactly once
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H * W, N), out_dtype),
        grid_spec=pl.GridSpec(
            grid=(N // bn, B),
            in_specs=[
                pl.BlockSpec((1, Hp, WpC), lambda j, b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, bn), lambda j, b: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, b: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda j, b: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H * W, bn), lambda j, b: (b, 0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * kh * kw * C * N,
            bytes_accessed=B * Hp * WpC + K * N + B * H * W * N,
            transcendentals=0),
    )(xp, w_q, bias.reshape(1, -1), mult.reshape(1, -1))


@functools.partial(jax.jit, static_argnames=('taps', 'out_hw', 'cin',
                                             'out_bits', 'signed', 'relu',
                                             'block_n'))
def int8_conv_requant(xp, w_flat, bias, mult, *, taps, out_hw, cin,
                      out_bits=8, signed=True, relu=False, block_n=256):
    """Stride-1 int8 conv + fused dyadic requant → (B, H·W, N) int8.

    xp from :func:`prepare_conv_input`, w_flat from
    :func:`flatten_conv_kernel`, bias (N,) int32, mult (N,) f32 dyadic
    multipliers.  relu=True fuses the following ReLU (clamps low at 0).
    """
    return _conv_call(xp, w_flat, bias, mult, taps=taps, out_hw=out_hw,
                      cin=cin, out_bits=out_bits, signed=signed, relu=relu,
                      block_n=block_n, int4=False, acc_only=False)


@functools.partial(jax.jit, static_argnames=('taps', 'out_hw', 'cin',
                                             'block_n'))
def int8_conv_acc(xp, w_flat, bias, *, taps, out_hw, cin, block_n=256):
    """Stride-1 int8 conv returning the raw int32 accumulator + bias."""
    mult = jnp.ones((w_flat.shape[1],), jnp.float32)
    return _conv_call(xp, w_flat, bias, mult, taps=taps, out_hw=out_hw,
                      cin=cin, out_bits=8, signed=True, relu=False,
                      block_n=block_n, int4=False, acc_only=True)


@functools.partial(jax.jit, static_argnames=('taps', 'out_hw', 'cin',
                                             'out_bits', 'signed', 'relu',
                                             'block_n'))
def int4w_conv_requant(xp, w_packed, bias, mult, *, taps, out_hw, cin,
                       out_bits=8, signed=True, relu=False, block_n=256):
    """Stride-1 conv with nibble-packed int4 weights (half the weight HBM
    traffic) + fused dyadic requant."""
    return _conv_call(xp, w_packed, bias, mult, taps=taps, out_hw=out_hw,
                      cin=cin, out_bits=out_bits, signed=signed, relu=relu,
                      block_n=block_n, int4=True, acc_only=False)


@functools.partial(jax.jit, static_argnames=('taps', 'out_hw', 'cin',
                                             'block_n'))
def int4w_conv_acc(xp, w_packed, bias, *, taps, out_hw, cin, block_n=256):
    """Packed-int4-weight conv returning the raw int32 accumulator + bias."""
    mult = jnp.ones((w_packed.shape[1],), jnp.float32)
    return _conv_call(xp, w_packed, bias, mult, taps=taps, out_hw=out_hw,
                      cin=cin, out_bits=8, signed=True, relu=False,
                      block_n=block_n, int4=True, acc_only=True)


# ---------------------------------------------------------------------------
# jnp reference (exact-equality test oracle)
# ---------------------------------------------------------------------------

def reference_conv_requant(x8, w, bias, mult, *, stride=1, pad=1,
                           out_bits=8, signed=True, relu=False):
    """lax-conv oracle with the identical requant epilogue."""
    dn = jax.lax.conv_dimension_numbers(x8.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    acc = jax.lax.conv_general_dilated(
        x8, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=dn, preferred_element_type=jnp.int32) + bias
    out = jnp.floor(acc.astype(jnp.float32) * mult + 0.5)
    if signed:
        q = 2 ** (out_bits - 1) - 1
        lo, hi = -q - 1.0, float(q)
    else:
        lo, hi = 0.0, float(2 ** out_bits - 1)
    if relu:
        lo = 0.0
    return jnp.clip(out, lo, hi).astype(jnp.int8)

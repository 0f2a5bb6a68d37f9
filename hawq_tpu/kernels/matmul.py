"""Pallas TPU kernels: fused integer matmul + dyadic requant epilogues.

The native-kernel layer of the framework — the role the TVM fork's CUDA
tensor-core schedules play in the reference (SURVEY.md §2.2):

  reference                                   here
  ------------------------------------------  -------------------------------
  dense_int8.cuda                             int8_matmul_requant
  conv2d_HWNCnc_tensorcore.cuda (uint4×int4)  int4w_matmul_requant (packed
                                              weights, split-K unpack)
  qnn.requantize (m·2⁻ᵉ + shift)              fused epilogue in both kernels

Design notes (TPU v5e):
  * the MXU consumes int8×int8→int32 natively; there is no 4-bit MXU mode,
    so int4's win on TPU is **HBM bandwidth**: weights are stored nibble-
    packed (two int4 per int8 byte) and unpacked in VMEM inside the kernel,
    halving weight traffic — the matmul itself runs int8.
  * packing layout: byte[k, n] holds (lo = W[k, n], hi = W[k + K/2, n]), so
    unpacking yields two *contiguous* K/2 halves and the kernel computes
    acc = X[:, :K/2]·lo + X[:, K/2:]·hi — no lane interleaving needed.
  * the requant epilogue is the framework-canonical dyadic arithmetic
    (hawq_tpu/quant/ops.py): out = clip(floor(acc · (m·2⁻ᵉ) + 0.5)), with
    per-output-channel multipliers, fused so the int32 accumulator never
    touches HBM.
  * all tiles are MXU/VPU aligned (multiples of (32, 128) for int8); callers
    pad via the pad_to helpers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pad_to(x: jnp.ndarray, row_mult: int, col_mult: int) -> jnp.ndarray:
    r = _round_up(x.shape[0], row_mult) - x.shape[0]
    c = _round_up(x.shape[1], col_mult) - x.shape[1]
    if r == 0 and c == 0:
        return x
    return jnp.pad(x, ((0, r), (0, c)))


def _requant_epilogue(acc_i32, bias_ref, mult_ref, lo: float, hi: float):
    acc = acc_i32 + bias_ref[:]              # bias int32, shape (1, TN)
    out = jnp.floor(acc.astype(jnp.float32) * mult_ref[:] + 0.5)
    return jnp.clip(out, lo, hi).astype(jnp.int8)


def _int8_kernel(x_ref, w_ref, bias_ref, mult_ref, out_ref, *, lo, hi):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = _requant_epilogue(acc, bias_ref, mult_ref, lo, hi)


@functools.partial(jax.jit, static_argnames=('out_bits', 'signed', 'relu',
                                             'block_m', 'block_n'))
def int8_matmul_requant(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
                        mult: jnp.ndarray, *, out_bits: int = 8,
                        signed: bool = True, relu: bool = False,
                        block_m: int = 256,
                        block_n: int = 256) -> jnp.ndarray:
    """out[i, n] = requant(Σ_k x[i,k]·w[k,n] + bias[n]) as int8.

    x (M, K) int8, w (K, N) int8, bias (N,) int32, mult (N,) float32 dyadic
    multipliers.  M, K, N must be tile-aligned (pad_to).  relu=True fuses the
    following ReLU by clamping the low end at 0 (exact: post-ReLU symmetric
    quantization never produces negative integers).
    """
    m, k = x.shape
    _, n = w.shape
    bm, bn = min(block_m, m), min(block_n, n)
    if signed:
        q = 2 ** (out_bits - 1) - 1
        lo, hi = float(-q - 1), float(q)
    else:
        lo, hi = 0.0, float(2 ** out_bits - 1)
    if relu:
        lo = 0.0

    grid = (m // bm, n // bn)
    return pl.pallas_call(
        functools.partial(_int8_kernel, lo=lo, hi=hi),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=m * k + k * n + m * n,
            transcendentals=0),
    )(x, w, bias.reshape(1, -1), mult.reshape(1, -1))


def _int4w_kernel(x_ref, wp_ref, bias_ref, mult_ref, out_ref, *, lo, hi):
    # unpack nibbles: byte holds (lo_nib = W[k, :], hi_nib = W[k + K/2, :]).
    # Mosaic has no int8 vector shifts — widen to int32, shift, narrow.
    packed = wp_ref[:].astype(jnp.int32)
    w_lo = jnp.right_shift(jnp.left_shift(packed, 28), 28).astype(jnp.int8)
    w_hi = jnp.right_shift(packed, 4).astype(jnp.int8)  # sign carried by byte
    khalf = packed.shape[0]
    acc = jax.lax.dot_general(
        x_ref[:, :khalf], w_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(
        x_ref[:, khalf:], w_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = _requant_epilogue(acc, bias_ref, mult_ref, lo, hi)


@functools.partial(jax.jit, static_argnames=('out_bits', 'signed', 'relu',
                                             'block_m', 'block_n'))
def int4w_matmul_requant(x: jnp.ndarray, w_packed: jnp.ndarray,
                         bias: jnp.ndarray, mult: jnp.ndarray, *,
                         out_bits: int = 8, signed: bool = True,
                         relu: bool = False, block_m: int = 256,
                         block_n: int = 256) -> jnp.ndarray:
    """Matmul with nibble-packed int4 weights (halved weight HBM traffic).

    x (M, K) int8 (activation ints, any ≤8-bit range), w_packed (K/2, N)
    int8 from :func:`pack_int4`, bias/mult as in int8_matmul_requant.
    """
    m, k = x.shape
    khalf, n = w_packed.shape
    assert k == 2 * khalf, (k, khalf)
    bm, bn = min(block_m, m), min(block_n, n)
    if signed:
        q = 2 ** (out_bits - 1) - 1
        lo, hi = float(-q - 1), float(q)
    else:
        lo, hi = 0.0, float(2 ** out_bits - 1)
    if relu:
        lo = 0.0

    grid = (m // bm, n // bn)
    return pl.pallas_call(
        functools.partial(_int4w_kernel, lo=lo, hi=hi),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((khalf, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + khalf * n + m * n, transcendentals=0),
    )(x, w_packed, bias.reshape(1, -1), mult.reshape(1, -1))


def _int8_acc_kernel(x_ref, w_ref, bias_ref, out_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = acc + bias_ref[:]


@functools.partial(jax.jit, static_argnames=('block_m', 'block_n'))
def int8_matmul_acc(x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray, *,
                    block_m: int = 256, block_n: int = 256) -> jnp.ndarray:
    """int8 matmul returning the raw int32 accumulator + bias (for consumers
    that need the accumulator, e.g. residual requant-add nodes)."""
    m, k = x.shape
    _, n = w.shape
    bm, bn = min(block_m, m), min(block_n, n)
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        _int8_acc_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=m * k + k * n + 4 * m * n,
            transcendentals=0),
    )(x, w, bias.reshape(1, -1))


def _int4w_acc_kernel(x_ref, wp_ref, bias_ref, out_ref):
    packed = wp_ref[:].astype(jnp.int32)
    w_lo = jnp.right_shift(jnp.left_shift(packed, 28), 28).astype(jnp.int8)
    w_hi = jnp.right_shift(packed, 4).astype(jnp.int8)
    khalf = packed.shape[0]
    acc = jax.lax.dot_general(
        x_ref[:, :khalf], w_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc += jax.lax.dot_general(
        x_ref[:, khalf:], w_hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = acc + bias_ref[:]


@functools.partial(jax.jit, static_argnames=('block_m', 'block_n'))
def int4w_matmul_acc(x: jnp.ndarray, w_packed: jnp.ndarray,
                     bias: jnp.ndarray, *, block_m: int = 256,
                     block_n: int = 256) -> jnp.ndarray:
    """Packed-int4-weight matmul returning the raw int32 accumulator + bias.

    Used where the consumer needs the accumulator (residual requant-add
    nodes) rather than a requantized int8 tensor.
    """
    m, k = x.shape
    khalf, n = w_packed.shape
    assert k == 2 * khalf, (k, khalf)
    bm, bn = min(block_m, m), min(block_n, n)
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        _int4w_acc_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((khalf, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k + khalf * n + 4 * m * n, transcendentals=0),
    )(x, w_packed, bias.reshape(1, -1))


def pack_int4(w: np.ndarray) -> np.ndarray:
    """Pack int4-valued (K, N) int8 weights → (K/2, N) bytes.

    byte[k, n] = (W[k + K/2, n] << 4) | (W[k, n] & 0xF) — the contiguous
    split-K layout the kernel expects.  The TPU-chosen analog of the
    reference's 8-nibbles-per-int32 big-endian packing
    (hawq_utils_resnet50.py:21-30).
    """
    w = np.asarray(w, np.int8)
    k, n = w.shape
    assert k % 2 == 0
    lo = w[: k // 2].astype(np.uint8) & 0xF
    hi = (w[k // 2:].astype(np.uint8) & 0xF) << 4
    return (lo | hi).astype(np.int8)


def unpack_int4(packed: np.ndarray) -> np.ndarray:
    """Inverse of pack_int4 (host-side, for tests)."""
    p = np.asarray(packed, np.uint8)
    lo = (p & 0xF).astype(np.int8)
    lo = np.where(lo >= 8, lo - 16, lo)
    hi = (p >> 4).astype(np.int8)
    hi = np.where(hi >= 8, hi - 16, hi)
    return np.concatenate([lo, hi], axis=0).astype(np.int8)


# ---------------------------------------------------------------------------
# K-blocked pipelined variant
# ---------------------------------------------------------------------------

def _int8_kblocked_kernel(x_ref, w_ref, bias_ref, mult_ref, out_ref,
                          acc_ref, *, lo, hi, nk):
    """Grid (i, j, k): accumulate K-blocks into a VMEM scratch, requant on
    the last K step.  Mosaic double-buffers the x/w block DMAs across grid
    steps, overlapping HBM traffic with the MXU."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = _requant_epilogue(acc_ref[:], bias_ref, mult_ref,
                                       lo, hi)


@functools.partial(jax.jit, static_argnames=('out_bits', 'signed', 'relu',
                                             'block_m', 'block_n', 'block_k'))
def int8_matmul_requant_kblocked(x: jnp.ndarray, w: jnp.ndarray,
                                 bias: jnp.ndarray, mult: jnp.ndarray, *,
                                 out_bits: int = 8, signed: bool = True,
                                 relu: bool = False, block_m: int = 512,
                                 block_n: int = 256,
                                 block_k: int = 512) -> jnp.ndarray:
    """K-blocked int8 matmul + fused requant (pipelined DMA variant)."""
    m, k = x.shape
    _, n = w.shape
    bm, bn, bk = min(block_m, m), min(block_n, n), min(block_k, k)
    if signed:
        q = 2 ** (out_bits - 1) - 1
        lo, hi = float(-q - 1), float(q)
    else:
        lo, hi = 0.0, float(2 ** out_bits - 1)
    if relu:
        lo = 0.0
    nk = k // bk

    return pl.pallas_call(
        functools.partial(_int8_kblocked_kernel, lo=lo, hi=hi, nk=nk),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        grid_spec=pl.GridSpec(
            grid=(m // bm, n // bn, nk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=m * k + k * n + m * n,
            transcendentals=0),
    )(x, w, bias.reshape(1, -1), mult.reshape(1, -1))


# ---------------------------------------------------------------------------
# jnp reference implementations (exact-equality test oracles)
# ---------------------------------------------------------------------------

def reference_matmul_requant(x, w, bias, mult, *, out_bits=8, signed=True):
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32) + bias
    out = jnp.floor(acc.astype(jnp.float32) * mult + 0.5)
    if signed:
        q = 2 ** (out_bits - 1) - 1
        return jnp.clip(out, -q - 1, q).astype(jnp.int8)
    return jnp.clip(out, 0, 2 ** out_bits - 1).astype(jnp.int8)

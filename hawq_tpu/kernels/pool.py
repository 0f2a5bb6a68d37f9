"""Pallas TPU kernel for the folded-layout 3×3/s2/p1 max-pool.

One VMEM pass: the (Hq, Wq, 4N) image block is read from HBM exactly
once, the nine shifted maxes run on-chip, and only the (Hq, Wq, N) result
is written back.  Isolated on one v5e this beats the jnp shifted-max
formulation 2.5× at batch 64 (0.221 vs 0.556 ms, HBM roofline 0.157 —
benchmarks/pool_kernel_b8_b64.json).

**It is NOT the production route.**  In-engine the custom-call boundary
breaks the init conv's requant-epilogue fusion and forces layout
materialization around the call, costing far more than the kernel saves
(engine A/B, logits bit-identical: b8 0.770 vs 0.556 ms, b64 8.69 vs
5.28).  Same lesson as engine-integrated pallas conv routing at batch 1
(docs/perf_tpu.md): isolated kernel wins do not survive insertion into
the XLA engine graph on this workload.  The engine therefore defaults to
the jnp path (`build_resnet_engine(pool_kernel=False)`); this kernel
stays as the measured alternative for future hardware/XLA versions.

Semantics are identical bit-for-bit to the jnp path (the engines' parity
guarantee): same (py, px, n) channel layout, same dtype-min padding at the
pool's zero-pad border (reference pool semantics:
tvm_benchmark/quantized_resnet_v1.py:358-366 pools the int-valued tensor;
max commutes with the monotone requant, SURVEY.md §3.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _neg_limit(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return -jnp.inf
    return jnp.iinfo(dtype).min


def _pool_kernel(x_ref, o_ref, *, n: int):
    # All concatenates run on half-lane-aligned operands (channel offsets
    # 0 or 2n) — Mosaic cannot concatenate a lane-offset-n slice along a
    # non-lane dimension — and the sub-vreg n-wide slices appear only as
    # elementwise max operands, which relayout freely.
    x = x_ref[0]                                   # (Hq, Wq, 4n)
    hq, wq, _ = x.shape
    out_dt = x.dtype
    if x.dtype == jnp.int16:
        # Mosaic cannot legalize maxsi on packed int16 vectors (same class
        # of limitation as the int8-shift note in CLAUDE.md) — widen the
        # VMEM compute to int32; HBM traffic is unchanged.
        x = x.astype(jnp.int32)
    neg = jnp.asarray(_neg_limit(out_dt), x.dtype)
    # Row max: logical pool row i reads rows {2i−1, 2i, 2i+1} =
    # {(i−1, py=1), (i, py=0), (i, py=1)}; row −1 is the pool's border pad.
    pad_row = jnp.full((1, wq, 2 * n), neg, x.dtype)
    b0, b1 = x[..., : 2 * n], x[..., 2 * n:]       # py = 0 / 1 blocks
    up1 = jnp.concatenate([pad_row, b1[:-1]], axis=0)
    rm = jnp.maximum(jnp.maximum(b0, b1), up1)     # (Hq, Wq, 2n)
    # Column max over (px=0, px=1, left-shifted px=1).
    pad_col = jnp.full((hq, 1, 2 * n), neg, x.dtype)
    rml = jnp.concatenate([pad_col, rm[:, :-1]], axis=1)
    o_ref[0] = jnp.maximum(jnp.maximum(rm[..., :n], rm[..., n:]),
                           rml[..., n:]).astype(out_dt)


@functools.partial(jax.jit, static_argnames=('interpret',))
def maxpool_folded(xf: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """(B, Hq, Wq, 4N) folded conv output → (B, Hq, Wq, N) pooled, one HBM
    pass.  Bit-equal to ``fold.maxpool_3x3s2p1_folded`` (tests/test_kernels).
    """
    b, hq, wq, n4 = xf.shape
    assert n4 % 4 == 0, n4
    n = n4 // 4
    return pl.pallas_call(
        functools.partial(_pool_kernel, n=n),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, hq, wq, n4), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, hq, wq, n), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, wq, n), xf.dtype),
        interpret=interpret,
    )(xf)

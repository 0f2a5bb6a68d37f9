"""One-pass Pallas min+max reduction for QAT range statistics.

Every QuantAct recomputes its activation range each training step as two
separate XLA reductions (jnp.min + jnp.max), each re-reading the full
activation tensor from HBM — measured ~2.5× the one-read roofline across
the resnet50 b64 step (benchmarks/train_breakdown_b64.json: 8.1 ms of
range statistics; the variadic (min,max) reduce lowers 3× slower still).
This kernel reads each block exactly once and emits both bounds.

**Measured NEGATIVE on one v5e — not the production path.**  205 MB f32:
two-pass jnp 0.622 ms (each pass at the ~660 GB/s read roofline), this
kernel 0.899 ms fed layout-native 2D and 1.535 ms fed NHWC (XLA inserts a
~0.64 ms relayout copy before the custom call — unavoidable in-graph), a
running-(1,1)-accumulator variant 1.632 ms.  The custom-call read rate
(~230 GB/s) never approaches XLA's own reduction DMA on this toolchain,
so quant/ops.fused_minmax keeps the jnp two-pass formulation and this
kernel stays as the exactness-tested alternative (the fourth data point
for the pallas-insertion law, and the first where even an ISOLATED pallas
kernel loses: reductions have no arithmetic intensity to amortize the
custom-call DMA gap).  Semantics are exactly jnp.min/jnp.max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# rows (of 128 lanes) per grid step: 4096·128 f32 = 2 MB per block read
_BLOCK_ROWS = 4096
_LANES = 128
_CHUNK = _BLOCK_ROWS * _LANES


def _minmax_kernel(x_ref, min_ref, max_ref):
    # Each grid step writes an independent (8, 128) partial — no cross-step
    # output dependency, so the input DMA pipeline runs at full depth (a
    # running (1,1) accumulator measured 2.6× slower: the revisited output
    # block serialized the steps).
    x = x_ref[...]
    g = x.reshape(8, _BLOCK_ROWS // 8, _LANES)
    min_ref[...] = jnp.min(g, axis=1)
    max_ref[...] = jnp.max(g, axis=1)


@functools.partial(jax.jit, static_argnames=())
def _minmax_body(body2d: jnp.ndarray):
    nb = body2d.shape[0] // _BLOCK_ROWS
    mins, maxs = pl.pallas_call(
        _minmax_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((8, _LANES), lambda i: (i, 0)),
                   pl.BlockSpec((8, _LANES), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((nb * 8, _LANES), body2d.dtype),
                   jax.ShapeDtypeStruct((nb * 8, _LANES), body2d.dtype)],
    )(body2d)
    return jnp.min(mins), jnp.max(maxs)


def minmax_1pass(x: jnp.ndarray):
    """(min, max) of x in one HBM pass (pallas body + jnp tail).

    The flattened prefix that fills whole (_BLOCK_ROWS, 128) blocks goes
    through the kernel; the remainder (< _CHUNK = _BLOCK_ROWS·128
    elements) is reduced with jnp and merged — reshapes of a contiguous
    flatten are views, so no copy.
    """
    xf = x.reshape(-1)
    n = xf.shape[0]
    main = (n // _CHUNK) * _CHUNK
    if main == 0:
        return jnp.min(xf), jnp.max(xf)
    body = xf[:main].reshape(-1, _LANES)
    mn, mx = _minmax_body(body)
    if main < n:
        tail = xf[main:]
        mn = jnp.minimum(mn, jnp.min(tail))
        mx = jnp.maximum(mx, jnp.max(tail))
    return mn, mx

"""4×4 block-fold of the init convolution — the TPU answer to C=3 inputs.

Any on-device strategy for the 7×7/stride-2 RGB init conv pays a fixed
~0.44 ms/batch-8 on v5e (benchmarks/init_conv_b8.json): a (…, 3)-minor
tensor is stored lane-padded, so every vectorized read costs ~42× the
payload.  The reference's TVM engine dictates its own input layout (NCHW /
HWNC) for the same reason — the host loader, not the device, owns the
layout (tvm_benchmark/test_resnet_inference_time.py:84-99).

Here the host folds 4×4 pixel blocks into channels:

    (B, H, W, 3) --pad (3,5)--> (B, H+8, W+8, 3) --fold--> (B, (H+8)/4,
    (W+8)/4, 48)

and the 7×7/s2 conv becomes a **3×3/s1 conv with K=432, N=4·64** over the
folded grid (each output block pixel holds the 2×2 stride-2 origins of the
4×4 block), followed by a depth-to-space interleave.  Bit-exact: the same
int8 products and int32 sums, reassociated.  MAC overhead is 9·48·256 /
(4·147·64) = 2.94× (kernel zeros), repaid by the MXU-friendly K=432,
N=256 shape and the 48-minor input layout (2.7× lane pad instead of 42×).

The fold itself is a pure memory permutation the host does for free while
building the batch (numpy here, csrc/hawq_preproc.cpp in production).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def fold4_geometry(h: int, w: int) -> Tuple[int, int]:
    """Folded spatial dims for an (h, w) image; requires h % 4 == w % 4 == 0."""
    assert h % 4 == 0 and w % 4 == 0, (h, w)
    return (h + 8) // 4, (w + 8) // 4


def fold4_images(x: np.ndarray) -> np.ndarray:
    """(B, H, W, C) → (B, (H+8)/4, (W+8)/4, 16C), pad (3, 5) per axis.

    Works for float32 (pre-quantization input), int8, or uint8 pixels —
    padding is zeros, which quantize to the integer 0 exactly like the
    device-side zero padding of the direct conv.
    """
    b, h, w, c = x.shape
    nb, mb = fold4_geometry(h, w)
    xp = np.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    xf = xp.reshape(b, nb, 4, mb, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(xf.reshape(b, nb, mb, 16 * c))


def fold4_images_jnp(x):
    """Device-side fold (for API compatibility when the host can't fold);
    pays the C-minor relayout the host fold avoids."""
    import jax.numpy as jnp
    b, h, w, c = x.shape
    nb, mb = fold4_geometry(h, w)
    xp = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    xf = xp.reshape(b, nb, 4, mb, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return xf.reshape(b, nb, mb, 16 * c)


def fold4_kernel(w: np.ndarray) -> np.ndarray:
    """(7, 7, C, N) stride-2 kernel → (3, 3, 16C, 4N) stride-1 over the fold.

    Output channel (py, px, n) is the conv output at stride-2 origin
    (2·py, 2·px) within the 4×4 block; input channel (ry, rx, c) is pixel
    (ry, rx) of a block.  Taps: dy = 4·By + ry − 2·py ∈ [0, 7) — the py=1
    phase's 7-tap window spans 3 blocks, hence the 3×3 block kernel
    (zeros elsewhere; MAC overhead 9·48·256 / (4·147·64) = 2.94×, repaid
    by the ideal K=432, N=4·64 MXU shape and the 48-minor input layout).
    """
    kh, kw, c, n = w.shape
    assert (kh, kw) == (7, 7), (kh, kw)
    out = np.zeros((3, 3, 4, 4, c, 2, 2, n), w.dtype)
    for by in range(3):
        for ry in range(4):
            for py in range(2):
                dy = 4 * by + ry - 2 * py
                if not 0 <= dy < kh:
                    continue
                for bx in range(3):
                    for rx in range(4):
                        for px in range(2):
                            dx = 4 * bx + rx - 2 * px
                            if not 0 <= dx < kw:
                                continue
                            out[by, bx, ry, rx, :, py, px, :] = w[dy, dx]
    return np.ascontiguousarray(out.reshape(3, 3, 16 * c, 4 * n))


def fold4_3x3s2_geometry(h: int, p0: int) -> Tuple[int, int, int]:
    """Geometry for the 4×4 fold of a 3×3/stride-2 conv with pad ``p0``.

    Returns (out_pixels, folded_rows, padded_size): the conv produces
    ``out`` pixels; the host pads to ``padded`` (p0 before, the rest
    after) and folds to ``folded`` block rows; the device then runs a
    2×2/s1 conv over ``folded`` rows → ``folded−1`` block outputs, each
    holding 2 stride-2 origins (depth-to-space + slice to ``out``)."""
    out = (h + 2 * p0 - 3) // 2 + 1
    folded = (out + 1) // 2 + 1
    return out, folded, 4 * folded


def fold4_images_3x3s2(x: np.ndarray, p0: int) -> np.ndarray:
    """(B, H, W, C) → (B, fh, fw, 16C): the host-side 4×4 fold for a
    3×3/stride-2 init conv (MobileNetV2 p0=1, InceptionV3 p0=0) — same
    bit-exact reassociation as fold4_images, different padding."""
    b, h, w, c = x.shape
    _, fh, hp = fold4_3x3s2_geometry(h, p0)
    _, fw, wp = fold4_3x3s2_geometry(w, p0)
    xp = np.pad(x, ((0, 0), (p0, hp - h - p0), (p0, wp - w - p0), (0, 0)))
    xf = xp.reshape(b, fh, 4, fw, 4, c).transpose(0, 1, 3, 2, 4, 5)
    return np.ascontiguousarray(xf.reshape(b, fh, fw, 16 * c))


def fold4_kernel_3x3s2(w: np.ndarray) -> np.ndarray:
    """(3, 3, C, N) stride-2 kernel → (2, 2, 16C, 4N) stride-1 over the
    fold.  Same construction as fold4_kernel: output channel (py, px, n)
    is the stride-2 origin (2py, 2px) inside the block; tap
    dy = 4·By + ry − 2·py ∈ [0, 3) spans two blocks."""
    kh, kw, c, n = w.shape
    assert (kh, kw) == (3, 3), (kh, kw)
    out = np.zeros((2, 2, 4, 4, c, 2, 2, n), w.dtype)
    for by in range(2):
        for ry in range(4):
            for py in range(2):
                dy = 4 * by + ry - 2 * py
                if not 0 <= dy < kh:
                    continue
                for bx in range(2):
                    for rx in range(4):
                        for px in range(2):
                            dx = 4 * bx + rx - 2 * px
                            if not 0 <= dx < kw:
                                continue
                            out[by, bx, ry, rx, :, py, px, :] = w[dy, dx]
    return np.ascontiguousarray(out.reshape(2, 2, 16 * c, 4 * n))


def maxpool_3x3s2p1_folded(xf):
    """3×3/stride-2/pad-1 max-pool of the depth-to-space image, computed
    directly in the folded (2, 2, N) channel layout.

    Input: the folded init-conv output (B, Hq, Wq, 4N), channel layout
    (py, px, n) — logical pixel (2a+py, 2b+px) lives at xf[a, b, py, px].
    Pool output row i reads logical rows {2i−1, 2i, 2i+1} =
    {(a=i−1, py=1), (a=i, py=0), (a=i, py=1)} (same for columns), so the
    pool is nine shifted elementwise maxes over the block slices and the
    output grid (B, Hq, Wq, N) **is** the folded grid: no depth-to-space,
    no 2×-larger intermediate.  Bit-exact vs depth_to_space_2x2 +
    reduce_window (tests/test_fold.py); measured 5.5× faster at batch 64
    on v5e, where reduce_window on the int16 112² tensor lowers ~12× off
    the bandwidth roofline (benchmarks/residual_fusion_b8_b64.json notes).
    """
    import jax.numpy as jnp
    b, hq, wq, n4 = xf.shape
    n = n4 // 4
    if jnp.issubdtype(xf.dtype, jnp.floating):
        neg = jnp.asarray(-jnp.inf, xf.dtype)
    else:
        neg = jnp.asarray(jnp.iinfo(xf.dtype).min, xf.dtype)

    def up(t):      # t[i-1, j]; row −1 is the pool's zero-pad → identity min
        return jnp.pad(t[:, :-1], ((0, 0), (1, 0), (0, 0), (0, 0)),
                       constant_values=neg)

    def left(t):    # t[i, j-1]
        return jnp.pad(t[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)),
                       constant_values=neg)

    # Progressive lane-halving (4n → 2n → n, each slice vreg-friendly)
    # instead of four n-wide minor-dim slices:
    #   row max   rm = [max(B00, B10, up B10) | max(B01, B11, up B11)]
    #   col max  out =  max(rm0, rm1, left rm1)
    # where the channel blocks are ordered (py, px, n) = B00 B01 B10 B11.
    m1 = jnp.maximum(xf, up(xf))
    rm = jnp.maximum(xf[..., :2 * n], m1[..., 2 * n:])
    m2 = jnp.maximum(rm, left(rm))
    return jnp.maximum(rm[..., :n], m2[..., n:])


def depth_to_space_2x2(acc):
    """(B, H/4, W/4, 4N) folded conv output → (B, H/2, W/2, N).

    Works on numpy and jax arrays (transpose(*axes) is common to both).
    """
    b, hq, wq, n4 = acc.shape
    n = n4 // 4
    y = acc.reshape(b, hq, wq, 2, 2, n).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * hq, 2 * wq, n)

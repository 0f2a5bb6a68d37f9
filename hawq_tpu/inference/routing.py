"""Pallas kernel routing for the MobileNetV2 / InceptionV3 engines.

The reference tunes a CUDA schedule per conv layer and caches the result in
tuning_logs/*.log (/root/reference/tvm_benchmark/test_resnet_inference_time
.py:189-217); the ResNet engine's analog lives in inference/autotune.py +
inference/engine.py (`routing=` tables).  This module extends the same
mechanism to the other two model families:

  * every 1x1 stride-1 convolution is matmul-shaped and can route through
    the fused Pallas kernels (hawq_tpu/kernels/matmul.py) — int8, or
    nibble-packed int4 weights for 4-bit layers (halved weight HBM traffic,
    the only lever int4 has on v5e, see docs/perf_tpu.md);
  * unlike the ResNet engine (whose channels are all 128-aligned), these
    families have arbitrary channel counts (e.g. MobileNetV2 320->1280,
    Inception 768->192), so the wrappers here zero-pad M/K/N up to MXU tile
    multiples and slice the result — zero-padded K contributes exact zeros
    to the int32 accumulator, so routing stays bit-exact;
  * `conv1x1_sites` enumerates the routable sites per family (the shape
    table the autotuner sweeps — the tuning_logs shape list analog).

Epilogue fusion per site:
  * InceptionV3 convs are conv -> ReLU -> dyadic requant with one
    per-channel multiplier: the fully fused `int8_matmul_requant(relu=True)`
    is bit-exact (requant is monotone with requant(0) == 0, so clamping the
    requantized value at 0 equals requantizing max(acc, 0)).
  * MobileNetV2 1x1s feed either ReLU6 (a per-channel clamp in the
    *accumulator* domain) or a residual add that consumes the raw
    accumulator, so those route through the `*_acc` kernels (bias folded
    in-kernel) and keep the XLA epilogue — the int4 weight-traffic win is
    in the matmul, not the epilogue.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hawq_tpu.inference.freeze import FrozenModel
from hawq_tpu.kernels import matmul as km


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class Routed1x1:
    """A 1x1 conv site prepared for the Pallas matmul kernels.

    Host-side (numpy) weight reshape + zero-padding happens once at engine
    build; the returned callables close over padded constants.  ``int4``
    selects the nibble-packed weight layout (only valid for 4-bit weight
    integers, which fit a nibble by construction).
    """

    def __init__(self, w_hwio: np.ndarray, bias: np.ndarray,
                 int4: bool):
        assert w_hwio.shape[0] == 1 and w_hwio.shape[1] == 1, w_hwio.shape
        cin, cout = w_hwio.shape[2], w_hwio.shape[3]
        self.cin, self.cout = cin, cout
        self.int4 = int4
        k_mult = 256 if int4 else 128
        kp = _round_up(cin, k_mult)
        np_ = _round_up(cout, 128)
        w2d = np.zeros((kp, np_), np.int8)
        w2d[:cin, :cout] = np.asarray(w_hwio, np.int8).reshape(cin, cout)
        self.w = km.pack_int4(w2d) if int4 else w2d
        self.bias = np.zeros((np_,), np.int32)
        self.bias[:cout] = np.asarray(bias, np.int32).reshape(-1)
        self.kp, self.np_ = kp, np_

    def _prep_x(self, x8: jnp.ndarray) -> Tuple[jnp.ndarray, int, Tuple]:
        b, h, w, c = x8.shape
        assert c == self.cin, (c, self.cin)
        m = b * h * w
        mp = _round_up(m, 256) if m > 256 else _round_up(m, 32)
        x2 = x8.reshape(m, c)
        if mp != m or self.kp != c:
            x2 = jnp.pad(x2, ((0, mp - m), (0, self.kp - c)))
        return x2, m, (b, h, w)

    def _mult_padded(self, mult: np.ndarray) -> np.ndarray:
        mp = np.zeros((self.np_,), np.float32)
        mp[:self.cout] = np.asarray(mult, np.float32).reshape(-1)
        return mp

    def requant(self, x8: jnp.ndarray, mult: np.ndarray, *, out_bits: int,
                signed: bool, relu: bool) -> jnp.ndarray:
        """Fully fused conv + bias + (relu) + dyadic requant -> int8 NHWC."""
        x2, m, (b, h, w) = self._prep_x(x8)
        bm = min(256, x2.shape[0])
        fn = km.int4w_matmul_requant if self.int4 else km.int8_matmul_requant
        out = fn(x2, jnp.asarray(self.w), jnp.asarray(self.bias),
                 jnp.asarray(self._mult_padded(mult)), out_bits=out_bits,
                 signed=signed, relu=relu, block_m=bm, block_n=128)
        return out[:m, :self.cout].reshape(b, h, w, self.cout)

    def acc(self, x8: jnp.ndarray) -> jnp.ndarray:
        """conv + bias -> raw int32 accumulator NHWC (epilogue stays XLA)."""
        x2, m, (b, h, w) = self._prep_x(x8)
        bm = min(256, x2.shape[0])
        fn = km.int4w_matmul_acc if self.int4 else km.int8_matmul_acc
        out = fn(x2, jnp.asarray(self.w), jnp.asarray(self.bias),
                 block_m=bm, block_n=128)
        return out[:m, :self.cout].reshape(b, h, w, self.cout)


def make_router(fm: FrozenModel, routing: Optional[Dict[str, str]]):
    """Return route(key) -> Optional[Routed1x1] for an engine build.

    ``routing`` maps conv keys to 'xla' | 'pallas8' | 'pallas4w' (the
    autotune table).  Keys absent from the table stay on XLA.  'pallas4w'
    on a non-4-bit layer falls back to int8 pallas (int4 packing requires
    nibble-range weights)."""
    cache: Dict[str, Optional[Routed1x1]] = {}
    if not routing:
        return lambda key: None

    def route(key: str) -> Optional[Routed1x1]:
        if key not in cache:
            backend = routing.get(key, 'xla')
            if backend == 'xla':
                cache[key] = None
            else:
                w = np.asarray(fm[key + '.weight_int'])
                b = np.asarray(fm[key + '.bias_int'])
                int4 = (backend == 'pallas4w'
                        and fm.cfg.weight_bits(key) == 4)
                if w.shape[0] != 1 or w.shape[1] != 1:
                    cache[key] = None        # only 1x1 sites are routable
                else:
                    cache[key] = Routed1x1(w, b, int4)
        return cache[key]

    return route


# ---------------------------------------------------------------------------
# routable-site enumeration (the autotune shape tables)
# ---------------------------------------------------------------------------

def mobilenet_conv1x1_sites(stages=None, init_ch=None, final_ch=None,
                            image_size: int = 224
                            ) -> List[Tuple[str, int, int, int, str]]:
    """(key, spatial, cin, cout, epilogue) for every 1x1 conv in the
    MobileNetV2 engine.  epilogue is 'acc' (ReLU6 / residual consumers keep
    the XLA epilogue) — see module docstring.  Defaults to the full-size
    model; pass the tiny stage lists for test-scale enumeration."""
    from hawq_tpu.models.mobilenetv2 import (MOBILENETV2_STAGES,
                                             MOBILENETV2_INIT_CH,
                                             MOBILENETV2_FINAL_CH)
    stages = MOBILENETV2_STAGES if stages is None else stages
    init_ch = MOBILENETV2_INIT_CH if init_ch is None else init_ch
    final_ch = MOBILENETV2_FINAL_CH if final_ch is None else final_ch
    sites = []
    spatial = image_size // 2                     # init conv s2
    in_ch = init_ch
    for i, stage in enumerate(stages, start=1):
        for j, out_ch in enumerate(stage, start=1):
            p = f'features.stage{i}.unit{j}'
            stride = 2 if (j == 1 and i != 1) else 1
            mid = in_ch * (1 if (i == 1 and j == 1) else 6)
            sites.append((f'{p}.conv1', spatial, in_ch, mid, 'acc'))
            spatial_out = spatial // stride
            sites.append((f'{p}.conv3', spatial_out, mid, out_ch, 'acc'))
            spatial, in_ch = spatial_out, out_ch
    sites.append(('features.final_block', spatial, in_ch,
                  final_ch, 'acc'))
    return sites


def inception_conv1x1_sites(cfg, image_size: int = 299,
                            width_div: int = 1
                            ) -> List[Tuple[str, int, int, int, str]]:
    """(key, spatial, cin, cout, epilogue) for every 1x1 stride-1 conv in
    the InceptionV3 engine (epilogue 'requant': conv->relu->requant fuses
    fully).  Spatial geometry: init 299->35, stage1 @35, stage2 @17
    (reduction unit's 1x1 heads still @35), stage3 @8 (heads @17)."""
    from hawq_tpu.models.inceptionv3 import (INCEPTION_CHANNELS, build_unit,
                                             _Conv1x1Branch, _ConvSeqBranch,
                                             _AvgPoolBranch,
                                             _ConvSeq3x3Branch, _cdiv)
    d = (lambda c: _cdiv(c, width_div)) if width_div > 1 else (lambda c: c)
    # init block spatials (299 input): conv1 3x3/s2 -> 149, conv2 3x3/v ->
    # 147, conv3 3x3/p1 -> 147, maxpool/s2 -> 73, conv4 1x1 -> 73,
    # conv5 3x3/v -> 71, maxpool/s2 -> 35 (init_chs 32,32,64,80,192)
    s0 = (image_size - 1) // 2 - 2                # 147 @ 299
    s_pool1 = (s0 - 1) // 2                       # 73
    sp1 = (s_pool1 - 3) // 2                      # 35 (after conv5 + pool)
    spatials = {1: sp1, 2: (sp1 - 3) // 2 + 1,    # 17 (reduction A 3x3/s2/v)
                3: ((sp1 - 3) // 2 + 1 - 3) // 2 + 1}     # 8
    sites = [('features.q_init_block.q_conv4.q_convbn', s_pool1, d(64),
              d(80), 'requant')]

    b_idx = 0
    in_ch = d(192)
    for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
        for j, out_ch in enumerate(stage, start=1):
            unit = build_unit(cfg, i, j, out_ch, b_idx, width_div=width_div)
            if i == 2 and j != 1:
                b_idx += 1
            reduction = (j == 1 and i != 1)
            sp = spatials[i - 1] if reduction else spatials[i]
            p = unit.prefix
            for name, ctor, kwargs in unit.branch_defs:
                bp = f'{p}.branches.{name}'
                if ctor is _Conv1x1Branch:
                    sites.append((f'{bp}.q_conv.q_convbn', sp, in_ch,
                                  kwargs['features'], 'requant'))
                elif ctor in (_ConvSeqBranch, _ConvSeq3x3Branch):
                    c_in = in_ch
                    for c, (oc, kz, st) in enumerate(
                            zip(kwargs['out_channels'], kwargs['kernels'],
                                kwargs['strides']), start=1):
                        if kz == 1 and st == 1:
                            sites.append(
                                (f'{bp}.q_conv_list.q_conv{c}.q_convbn',
                                 sp, c_in, oc, 'requant'))
                        c_in = oc
                elif ctor is _AvgPoolBranch:
                    sites.append((f'{bp}.q_conv.q_convbn', sp, in_ch,
                                  kwargs['features'], 'requant'))
            in_ch = d(out_ch)
    return sites

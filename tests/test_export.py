"""Export subsystem tests: deployment bundles, StableHLO serialization,
checkpoint save/load round trips."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
from hawq_tpu.inference.engine import build_resnet_engine
from hawq_tpu.export.export import (bundle_manifest, export_bundle,
                                    export_stablehlo, load_stablehlo)
from hawq_tpu.utils import checkpoint as ckpt


@pytest.fixture(scope='module')
def fm():
    cfg = get_bit_config('tiny50', 'uniform8')
    return synthetic_frozen_resnet('tiny50', cfg, num_classes=16)


class TestBundle:
    def test_manifest_structure(self, fm):
        man = bundle_manifest(fm)
        assert man['format'] == 'hawq-tpu-bundle-v1'
        ops = [n['op'] for n in man['graph']]
        assert ops[0] == 'quantize_input'
        assert 'requantize_add' in ops
        assert ops[-1] == 'dequantize'
        # every requant node carries integer dyadic (m, e) pairs
        for n in man['graph']:
            if n['op'] == 'requantize':
                assert all(isinstance(m, int) for m in n['m'])
                assert n['rounding'] == 'half_up'

    def test_bundle_roundtrip(self, fm, tmp_path):
        path = str(tmp_path / 'model')
        export_bundle(path, fm)
        assert os.path.exists(path + '.npz')
        with open(path + '.bundle.json') as f:
            man = json.load(f)
        # manifest tensor refs resolve in the npz
        with np.load(path + '.npz') as z:
            for n in man['graph']:
                if n['op'] == 'qconv2d':
                    assert n['weight'] in z.files
                    assert n['bias'] in z.files

    def test_manifest_multipliers_match_engine(self, fm):
        """(m, e) in the bundle reconstruct the engine's f32 multipliers."""
        from hawq_tpu.inference.engine import _np_dyadic_multiplier
        man = bundle_manifest(fm)
        init = next(n for n in man['graph'] if n['name'] == 'init_requant')
        m = np.array(init['m'], np.float64)
        e = np.array(init['e'], np.float64)
        recon = (m * 2.0 ** -e).astype(np.float32)
        init_key = 'quant_init_convbn'
        acc_scale = (fm[init_key + '.weight_scale'].astype(np.float32)
                     * fm.act_scale('quant_input'))
        expect = _np_dyadic_multiplier(
            acc_scale / fm.act_scale('quant_act_int32'))
        np.testing.assert_array_equal(recon, expect)


class TestStableHLO:
    def test_serialize_and_reload(self, fm):
        blob = export_stablehlo(fm, batch_size=1, image_size=32)
        assert len(blob) > 1000
        fn = load_stablehlo(blob)
        x = jnp.asarray(np.random.RandomState(0)
                        .rand(1, 32, 32, 3).astype(np.float32))
        out = np.asarray(fn(x))
        ref = np.asarray(build_resnet_engine(fm)(x))
        np.testing.assert_array_equal(out, ref)


class TestCheckpointIO:
    def test_frozen_roundtrip(self, fm, tmp_path):
        path = str(tmp_path / 'frozen')
        ckpt.save_frozen(path, fm)
        fm2 = ckpt.load_frozen(path)
        assert fm2.arch == fm.arch
        assert fm2.cfg.table == dict(fm.cfg.table)
        for k, v in fm.tensors.items():
            np.testing.assert_array_equal(fm2.tensors[k], v)
        # engines built from original and reloaded agree bit-for-bit
        x = jnp.asarray(np.random.RandomState(1)
                        .rand(1, 32, 32, 3).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(build_resnet_engine(fm)(x)),
            np.asarray(build_resnet_engine(fm2)(x)))

    def test_train_checkpoint_roundtrip(self, tmp_path):
        variables = {'params': {'layer': {'w': np.arange(6.0).reshape(2, 3)}},
                     'quant_stats': {'act': {'x_min': np.float32(-1.5)}}}
        path = str(tmp_path / 'train.npz')
        ckpt.save_train_checkpoint(path, variables, {'epoch': 3})
        loaded, meta = ckpt.load_train_checkpoint(path)
        np.testing.assert_array_equal(loaded['params']['layer']['w'],
                                      variables['params']['layer']['w'])
        assert meta['epoch'] == 3

"""QONNX export: serialize → parse back → replay bit-equal to the engine.

Parity target: the reference's ONNX export capability
(/root/reference/utils/export/manager.py:111-142, function.py:8-141) — an
actual ONNX protobuf file with custom-domain quantization ops that an
external toolchain can parse.  The validation bar here is stronger than the
reference's (which never replays its export): the emitted integer graph,
executed by an independent numpy interpreter, must reproduce the engine's
logits bit-for-bit.
"""

import numpy as np
import jax
import pytest

from hawq_tpu.inference.freeze import freeze_resnet
from hawq_tpu.inference.engine import build_resnet_engine
from hawq_tpu.export import qonnx
from hawq_tpu.export.onnx_subset_pb2 import TensorProto

from tests.test_engine_parity import _calibrated_model


@pytest.mark.parametrize('arch', ['tiny18', 'tiny50'])
def test_export_reload_replay_bit_equal(arch, tmp_path):
    model, cfg, v, x = _calibrated_model(arch, 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), arch, cfg, 10)
    path = str(tmp_path / f'{arch}.onnx')
    qonnx.export_qonnx_resnet(fm, path, image_size=32)

    eng_logits = np.asarray(build_resnet_engine(fm)(x))
    m = qonnx.load_qonnx(path)
    replay = qonnx.replay_qonnx(m, np.asarray(x))
    np.testing.assert_array_equal(replay.astype(np.float32), eng_logits)


@pytest.mark.parametrize('arch,scheme', [('tiny18v2', 'uniform8'),
                                         ('tiny50v2', 'uniform4')])
def test_export_resnet_v2_replay_bit_equal(arch, scheme, tmp_path):
    from hawq_tpu.inference.engine_v2 import (freeze_resnet_v2,
                                              build_resnet_v2_engine)
    from tests.test_resnet_v2 import _calibrated

    model, cfg, v, x = _calibrated(arch, scheme)
    fm = freeze_resnet_v2(jax.tree.map(np.asarray, v), arch, cfg, 10)
    path = str(tmp_path / f'{arch}.onnx')
    qonnx.export_qonnx(fm, path, image_size=32)       # arch dispatch

    eng_logits = np.asarray(build_resnet_v2_engine(fm)(x))
    replay = qonnx.replay_qonnx(qonnx.load_qonnx(path), np.asarray(x))
    np.testing.assert_array_equal(replay.astype(np.float32), eng_logits)

    m = qonnx.load_qonnx(path)
    assert any(n.op_type == 'RequantBn' for n in m.graph.node)


def test_export_weight_metadata_and_uniform4(tmp_path):
    """Conv initializers carry weight_scale/weight_bits; a 4-bit config's
    exported weights fit in the 4-bit range."""
    model, cfg, v, x = _calibrated_model('tiny50', 'uniform4')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg, 10)
    path = str(tmp_path / 'm4.onnx')
    qonnx.export_qonnx(fm, path, image_size=32)

    eng_logits = np.asarray(build_resnet_engine(fm)(x))
    m = qonnx.load_qonnx(path)
    replay = qonnx.replay_qonnx(m, np.asarray(x))
    np.testing.assert_array_equal(replay.astype(np.float32), eng_logits)

    by_name = {t.name: t for t in m.graph.initializer}
    key = 'stage1.unit1.quant_convbn2'
    bits = np.frombuffer(by_name[key + '.weight_bits'].raw_data, np.int32)
    assert bits[0] == cfg.weight_bits(key) == 4
    w = np.frombuffer(by_name[key + '.weight'].raw_data, np.int8)
    assert w.min() >= -8 and w.max() <= 7
    scale = np.frombuffer(by_name[key + '.weight_scale'].raw_data,
                          np.float32)
    np.testing.assert_array_equal(
        scale, np.atleast_1d(fm[key + '.weight_scale'].astype(np.float32)))


def test_export_mobilenetv2_replay_bit_equal(tmp_path):
    from hawq_tpu.configs.bit_config import BitConfig, QuantSettings
    from hawq_tpu.models.mobilenetv2 import (
        QMobileNetV2, TINY_MNV2_STAGES, TINY_MNV2_INIT_CH, TINY_MNV2_FINAL_CH)
    from hawq_tpu.inference.freeze import freeze_mobilenetv2
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    import jax.numpy as jnp

    cfg = BitConfig(name='tiny_mnv2_u8', table={}, settings=QuantSettings())
    model = QMobileNetV2(cfg=cfg, num_classes=8, stages=TINY_MNV2_STAGES,
                         init_ch=TINY_MNV2_INIT_CH,
                         final_ch=TINY_MNV2_FINAL_CH)
    x = jnp.asarray(np.random.RandomState(3)
                    .randn(2, 32, 32, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    @jax.jit
    def calib(v, x):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**v, **mut}

    for _ in range(3):
        v = calib(v, x)
    fm = freeze_mobilenetv2(jax.tree.map(np.asarray, v), cfg,
                            TINY_MNV2_STAGES, num_classes=8)

    from hawq_tpu.inference.engine_mobilenet import stages_from_frozen
    assert stages_from_frozen(fm) == tuple(
        tuple(s) for s in TINY_MNV2_STAGES)
    path = str(tmp_path / 'mnv2.onnx')
    qonnx.export_qonnx(fm, path, image_size=32)       # arch dispatch

    eng_logits = np.asarray(
        build_mobilenetv2_engine(fm, TINY_MNV2_STAGES)(x))
    replay = qonnx.replay_qonnx(qonnx.load_qonnx(path), np.asarray(x))
    np.testing.assert_array_equal(replay.astype(np.float32), eng_logits)

    m = qonnx.load_qonnx(path)
    groups = [a.i for n in m.graph.node if n.op_type == 'Conv'
              for a in n.attribute if a.name == 'group']
    assert max(groups) > 1          # depthwise convs exported as grouped
    assert any(n.op_type == 'Min' for n in m.graph.node)   # integer ReLU6


@pytest.mark.slow
def test_export_inceptionv3_replay_bit_equal(tmp_path):
    from hawq_tpu.configs.bit_config import BitConfig, QuantSettings
    from hawq_tpu.models.inceptionv3 import QInceptionV3
    from hawq_tpu.inference.engine_inception import (freeze_inceptionv3,
                                                     build_inceptionv3_engine)
    import jax.numpy as jnp

    width_div = 16
    cfg = BitConfig(name='incept_tiny_u8', table={}, settings=QuantSettings())
    model = QInceptionV3(cfg=cfg, num_classes=8, width_div=width_div)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 96, 96, 3).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, folded=True, update_stats=True)

    @jax.jit
    def calib(v, x):
        _, mut = model.apply(v, x, folded=True, update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**v, **mut}

    for _ in range(2):
        v = calib(v, x)
    fm = freeze_inceptionv3(jax.tree.map(np.asarray, v), cfg, num_classes=8,
                            width_div=width_div)

    from hawq_tpu.inference.engine_inception import width_div_from_frozen
    assert width_div_from_frozen(fm) == width_div
    path = str(tmp_path / 'incept.onnx')
    qonnx.export_qonnx(fm, path, image_size=96)       # arch dispatch

    eng_logits = np.asarray(
        build_inceptionv3_engine(fm, width_div=width_div)(x))
    replay = qonnx.replay_qonnx(qonnx.load_qonnx(path), np.asarray(x))
    np.testing.assert_array_equal(replay.astype(np.float32), eng_logits)

    m = qonnx.load_qonnx(path)
    ops = [n.op_type for n in m.graph.node]
    assert 'Concat' in ops and 'AveragePool' in ops


def test_exported_file_structure(tmp_path):
    model, cfg, v, x = _calibrated_model('tiny50', 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny50', cfg, 10)
    path = str(tmp_path / 'm.onnx')
    qonnx.export_qonnx_resnet(fm, path, image_size=32)

    m = qonnx.load_qonnx(path)
    assert m.ir_version == 8
    domains = {o.domain: o.version for o in m.opset_import}
    assert qonnx.QDOMAIN in domains and '' in domains

    ops = [n.op_type for n in m.graph.node]
    assert ops.count('Conv') == sum(
        1 for k in fm.tensors if k.endswith('.weight_int')) - 1  # -1: fc
    assert 'Quant' in ops and 'RequantAdd' in ops and 'Trunc' in ops

    # every conv weight initializer is int8 with HWIO dims
    by_name = {t.name: t for t in m.graph.initializer}
    n_int8 = sum(1 for t in m.graph.initializer
                 if t.data_type == TensorProto.INT8)
    assert n_int8 == sum(1 for k in fm.tensors if k.endswith('.weight_int'))
    w = by_name['stage1.unit1.quant_convbn2.weight']
    assert tuple(w.dims) == fm['stage1.unit1.quant_convbn2.weight_int'].shape

    # file parses from raw bytes (what an external tool does)
    raw = open(path, 'rb').read()
    m2 = qonnx.P.ModelProto()
    m2.ParseFromString(raw)
    assert len(m2.graph.node) == len(m.graph.node)


def test_replay_rejects_unknown_op(tmp_path):
    model, cfg, v, x = _calibrated_model('tiny18', 'uniform8')
    fm = freeze_resnet(jax.tree.map(np.asarray, v), 'tiny18', cfg, 10)
    path = str(tmp_path / 'm.onnx')
    qonnx.export_qonnx_resnet(fm, path, image_size=32)
    m = qonnx.load_qonnx(path)
    m.graph.node[3].op_type = 'Bogus'
    with pytest.raises(NotImplementedError):
        qonnx.replay_qonnx(m, np.asarray(x))


def test_bipolar_quant_roundtrip(tmp_path):
    """BipolarQuant (reference function.py:37-50): quant_node emits it for
    bitwidth 1; the serialized graph round-trips and replays as the binary
    quantizer q = where(x >= 0, 1, -1), value = q * scale."""
    from hawq_tpu.export.qonnx import _Builder, quant_node

    rng = np.random.RandomState(0)
    w = rng.randint(-7, 8, (1, 1, 8, 4)).astype(np.int8)
    bias = rng.randint(-5, 6, (4,)).astype(np.int32)

    b = _Builder('bipolar_test')
    b.io(b.g.input, 'image', ('N', 4, 4, 8))
    si = b.init_tensor('input.scale', np.float32(0.1).reshape(1))
    x = quant_node(b, 'image', si, bitwidth=1)
    node = b.g.node[-1]
    assert node.op_type == 'BipolarQuant' and node.domain == 'hawq2qonnx'
    # and a non-1 bitwidth still routes to Quant
    _ = quant_node(b, 'image', si, bitwidth=8)
    assert b.g.node[-1].op_type == 'Quant'
    del b.g.node[-1]

    wi = b.init_tensor('conv.weight', w)
    bi = b.init_tensor('conv.bias', bias)
    y = b.node('Conv', [x, wi, bi], strides=(1, 1), pads=(0, 0, 0, 0),
               group=1)
    b.io(b.g.output, y, ('N', 4, 4, 4))
    path = str(tmp_path / 'bipolar.onnx')
    with open(path, 'wb') as f:
        f.write(b.model.SerializeToString())

    images = rng.randn(2, 4, 4, 8).astype(np.float32)
    m = qonnx.load_qonnx(path)
    got = qonnx.replay_qonnx(m, images)

    q = np.where(images >= 0, 1, -1).astype(np.int64)
    want = np.einsum('bhwc,co->bhwo', q,
                     w.reshape(8, 4).astype(np.int64)) + bias
    np.testing.assert_array_equal(got, want)

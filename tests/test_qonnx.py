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

"""Deployment CLI: the single-tool analog of the reference's tvm_benchmark
drivers (test_resnet_inference.py classify/--debug-unit, inference_time,
export) — exercised end-to-end against tiny frozen artifacts."""

import numpy as np
import jax
import pytest

from hawq_tpu import deploy
from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
from hawq_tpu.utils.checkpoint import save_frozen


@pytest.fixture(scope='module')
def frozen_path(tmp_path_factory):
    fm = synthetic_frozen_resnet('tiny50', get_bit_config('tiny50',
                                                          'uniform8'))
    path = str(tmp_path_factory.mktemp('dep') / 'quantized_checkpoint.npz')
    save_frozen(path, fm)
    return path


def test_deploy_classify_and_export(frozen_path, tmp_path, capsys):
    onnx_path = str(tmp_path / 'm.onnx')
    rc = deploy.main(['--frozen', frozen_path, '--image-size', '32',
                      '--batch', '2', '--export-onnx', onnx_path])
    out = capsys.readouterr().out
    assert rc == 0
    assert 'arch=tiny50' in out and 'top-5 classes' in out
    from hawq_tpu.export.qonnx import load_qonnx
    assert len(load_qonnx(onnx_path).graph.node) > 10


def test_deploy_capture_compare_golden(frozen_path, tmp_path, capsys):
    node = 'stage1.unit1.quant_act_int32'
    cap = str(tmp_path / 'cap.npy')
    rc = deploy.main(['--frozen', frozen_path, '--image-size', '32',
                      '--batch', '2', '--capture', node,
                      '--save-capture', cap])
    assert rc == 0

    # self-comparison: the reference's "100% matched!" debug-unit flow
    rc = deploy.main(['--frozen', frozen_path, '--image-size', '32',
                      '--batch', '2', '--capture', node, '--compare', cap])
    assert rc == 0 and '100% matched!' in capsys.readouterr().out

    # corrupt one value → nonzero exit + mismatch report
    g = np.load(cap)
    g.flat[0] += 1
    bad = str(tmp_path / 'bad.npy')
    np.save(bad, g)
    rc = deploy.main(['--frozen', frozen_path, '--image-size', '32',
                      '--batch', '2', '--capture', node, '--compare', bad])
    assert rc == 1 and 'MISMATCH' in capsys.readouterr().out


def test_deploy_accuracy_over_image_folder(frozen_path, tmp_path, capsys):
    """Engine-side dataset accuracy (the test_resnet_accuracy_imagenet.py
    flow): runs the integer engine over an ImageFolder and reports meters."""
    from PIL import Image
    rng = np.random.RandomState(0)
    for cls in ['a', 'b']:
        d = tmp_path / 'val' / cls
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(rng.randint(0, 255, (40, 40, 3), dtype=np.uint8)
                            ).save(d / f'{i}.jpg')
    rc = deploy.main(['--frozen', frozen_path, '--image-size', '32',
                      '--batch', '4', '--accuracy', str(tmp_path / 'val'),
                      '--print-freq', '1'])
    out = capsys.readouterr().out
    assert rc == 0
    import json
    last = json.loads(out.strip().splitlines()[-1])
    assert last['images'] == 8
    assert 0.0 <= last['top1'] <= last['top5'] <= 1.0
    assert '[1] top1' in out          # running meter lines


def test_deploy_synthetic_arch(capsys):
    rc = deploy.main(['--arch', 'tiny18', '--scheme', 'uniform4',
                      '--image-size', '32', '--batch', '2'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'scheme=tiny18_uniform4' in out and 'deployed_size=' in out


def test_deploy_synthetic_v2_arch(capsys):
    """The pre-activation v2 family in the driver's synthetic latency mode —
    the exact form the reference ships v2 in (create_workload random params,
    quantized_resnet_v2.py + init.py:143-180)."""
    rc = deploy.main(['--arch', 'tiny18v2', '--scheme', 'uniform8',
                      '--image-size', '32', '--batch', '2'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'arch=tiny18v2' in out and 'deployed_size=' in out


def test_deploy_synthetic_mobilenet_not_misrouted_as_v2(capsys):
    """'mobilenetv2' ends in 'v2' but must dispatch to the mobilenet
    synthetic workload, not the pre-activation resnet-v2 one."""
    rc = deploy.main(['--arch', 'mobilenetv2', '--scheme', 'uniform8',
                      '--image-size', '64', '--batch', '1'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'arch=mobilenetv2' in out


def test_deploy_folded_input_mode(frozen_path, capsys):
    """--input-mode folded_float32 folds on host and classifies identically
    to the direct path (same synthetic input, same RNG)."""
    base = ['--frozen', frozen_path, '--image-size', '32', '--batch', '2']
    assert deploy.main(base) == 0
    direct = capsys.readouterr().out
    assert deploy.main(base + ['--input-mode', 'folded_float32']) == 0
    folded = capsys.readouterr().out
    d = [l for l in direct.splitlines() if l.startswith('image ')]
    f = [l for l in folded.splitlines() if l.startswith('image ')]
    assert d == f and len(d) == 2

    # unsupported family → clean error exit
    assert deploy.main(base + ['--input-mode', 'uint8',
                               '--accuracy', '/nonexistent']) == 2


def test_deploy_dump_hlo(frozen_path, tmp_path, capsys):
    hlo = str(tmp_path / 'engine.hlo')
    rc = deploy.main(['--frozen', frozen_path, '--image-size', '32',
                      '--batch', '2', '--dump-hlo', hlo])
    assert rc == 0
    text = open(hlo).read()
    assert 'convolution' in text and len(text) > 1000


def test_deploy_cifar_arch(capsys):
    """CIFAR form end to end through the driver: 32×32 default image size,
    3-stage graph (quantized_resnet_v1.py:334-348, 504-513)."""
    rc = deploy.main(['--arch', 'resnet20_cifar', '--scheme', 'uniform8',
                      '--batch', '2'])
    assert rc == 0
    out = capsys.readouterr().out
    assert 'arch=resnet20_cifar' in out and 'image_size=32' in out


def test_deploy_import_reference_replay_mode(tmp_path):
    """--import-reference + --requant-mode reference end to end through the
    CLI (subprocess: the flag enables jax x64 globally, which must not leak
    into this test process)."""
    import subprocess
    import sys as _sys
    torch = pytest.importorskip('torch')
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    from tests.test_reference_import import to_reference_state

    fm = synthetic_frozen_resnet('tiny18', get_bit_config('tiny18',
                                                          'uniform8'),
                                 num_classes=8, seed=3)
    path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    torch.save(to_reference_state(fm), path)
    r = subprocess.run(
        [_sys.executable, '-m', 'hawq_tpu.deploy', '--import-reference',
         path, '--arch', 'tiny18', '--scheme', 'uniform8', '--image-size',
         '32', '--batch', '2', '--requant-mode', 'reference'],
        capture_output=True, text=True, timeout=300,
        env={**__import__('os').environ, 'JAX_PLATFORMS': 'cpu'})
    assert r.returncode == 0, r.stderr[-800:]
    assert 'arch=tiny18' in r.stdout


def test_deploy_import_reference_mobilenetv2_replay(tmp_path):
    """--import-reference for the MobileNetV2 family (extended six-slice
    checkpoint, utils/checkpoint.py _REF_CONV_SLICE) + reference-replay
    numerics through the CLI."""
    import subprocess
    import sys as _sys
    torch = pytest.importorskip('torch')
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_mobilenet
    from tests.test_reference_import import to_reference_state

    fm = synthetic_frozen_mobilenet(get_bit_config('mobilenetv2',
                                                   'uniform8'), seed=5)
    path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    torch.save(to_reference_state(fm), path)
    r = subprocess.run(
        [_sys.executable, '-m', 'hawq_tpu.deploy', '--import-reference',
         path, '--arch', 'mobilenetv2', '--scheme', 'uniform8',
         '--image-size', '96', '--batch', '1',
         '--requant-mode', 'reference'],
        capture_output=True, text=True, timeout=300,
        env={**__import__('os').environ, 'JAX_PLATFORMS': 'cpu'})
    assert r.returncode == 0, r.stderr[-800:]
    assert 'arch=mobilenetv2' in r.stdout


def test_deploy_import_reference_inceptionv3(tmp_path):
    """--import-reference accepts the InceptionV3 family (the reference's
    five-slice dump is complete for it) and classifies through the CLI."""
    import subprocess
    import sys as _sys
    torch = pytest.importorskip('torch')
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_inception
    from tests.test_reference_import import to_reference_state

    fm = synthetic_frozen_inception(get_bit_config('inceptionv3',
                                                   'uniform8'), seed=5)
    path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    state = to_reference_state(fm)
    del state['conv_scaling_factor']      # the literal five-slice recipe
    torch.save(state, path)
    r = subprocess.run(
        [_sys.executable, '-m', 'hawq_tpu.deploy', '--import-reference',
         path, '--arch', 'inceptionv3', '--scheme', 'uniform8',
         '--image-size', '107', '--batch', '1'],
        capture_output=True, text=True, timeout=480,
        env={**__import__('os').environ, 'JAX_PLATFORMS': 'cpu'})
    assert r.returncode == 0, r.stderr[-800:]
    assert 'arch=inceptionv3' in r.stdout


def test_production_route_table():
    """Lock the measured per-family per-batch auto routes (docs/perf_tpu.md
    round-5 table; inception_wide16.json, mnv2_variants_b{8,16,64}.json,
    input_mode_b64.json)."""
    from hawq_tpu.inference.synthetic import (synthetic_frozen_mobilenet,
                                              synthetic_frozen_inception)
    fm_i = synthetic_frozen_inception(get_bit_config('inceptionv3',
                                                     'uniform8'))
    assert deploy.production_route(fm_i, 8) == ('folded_float32', 'bf16')
    assert deploy.production_route(fm_i, 16) == ('folded_float32', 'int8')
    assert deploy.production_route(fm_i, 64) == ('float32', 'int8')
    fm_m = synthetic_frozen_mobilenet(get_bit_config('mobilenetv2',
                                                     'uniform8'))
    assert deploy.production_route(fm_m, 8) == ('float32', 'int8')
    assert deploy.production_route(fm_m, 64) == ('float32', 'bf16')
    fm_r = synthetic_frozen_resnet('tiny50', get_bit_config('tiny50',
                                                            'uniform8'))
    # resnet folds its 7x7 init at b<=16, raw float32 at b>=32
    assert deploy.production_route(fm_r, 8) == ('folded_float32', 'int8')
    assert deploy.production_route(fm_r, 64) == ('float32', 'int8')

"""End-to-end accuracy-harness readiness (VERDICT round-3 item 7).

The published-accuracy targets (BASELINE.md Δ≤0.3) are unmeasurable in this
zero-egress environment (no ImageNet, no pretrained weights) — so this test
proves the harness itself end-to-end: the day real weights/data appear, one
command per side reproduces the reference flow
(/root/reference/tvm_benchmark/test_resnet_accuracy_imagenet.py:78-166 for
the deployed engine, quant_train.py --evaluate for the QAT side):

  mini ImageFolder tree → Trainer(train → frozen artifact)
    → reference-format quantized_checkpoint.pth.tar (fabricated)
    → ``deploy --import-reference --accuracy`` (engine top-1)
  and  ``trainer --evaluate --resume --resume-quantize`` (QAT top-1)

and the two accuracy paths must agree exactly on the same data (bit-exact
QAT↔engine parity ⇒ identical predictions ⇒ identical meters).
"""

import json

import numpy as np
import pytest

from hawq_tpu import deploy
from hawq_tpu.train.trainer import Trainer, TrainerConfig

torch = pytest.importorskip('torch')


def _make_image_folder(root, n_per_class=4, seed=0):
    """Two visually separable classes (dark vs bright) in train/ and val/."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    for split in ('train', 'val'):
        for lo, hi, cls in ((0, 100, 'a'), (155, 255, 'b')):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n_per_class):
                arr = rng.randint(lo, hi, (40, 40, 3), dtype=np.uint8)
                Image.fromarray(arr).save(d / f'{i}.jpg')


@pytest.mark.slow
def test_accuracy_paths_agree_end_to_end(tmp_path, capsys):
    data = tmp_path / 'data'
    _make_image_folder(data)
    run = tmp_path / 'run'

    cfg = TrainerConfig(arch='tiny18', scheme='uniform8', num_classes=2,
                        image_size=32, batch_size=4, epochs=1, lr=1e-3,
                        calib_batches=2, data_dir=str(data),
                        save_path=str(run), use_mesh=False, workers=1)
    Trainer(cfg).run()          # calibrate → train → eval → save artifacts

    # QAT-side accuracy: the --evaluate --resume-quantize flow (restored
    # ranges, no recalibration — quant_train.py:304-318, 455-458)
    eval_cfg = TrainerConfig(
        arch='tiny18', scheme='uniform8', num_classes=2, image_size=32,
        batch_size=4, data_dir=str(data), save_path=str(tmp_path / 'eval'),
        use_mesh=False, workers=1, evaluate=True,
        resume=str(run / 'checkpoint.npz'), resume_quantize=True)
    top1_qat = Trainer(eval_cfg).run()

    # engine side: frozen artifact → reference five-slice format →
    # deploy --import-reference --accuracy (the fabricated-checkpoint stand-in
    # for a published model-zoo artifact)
    from hawq_tpu.utils.checkpoint import load_frozen
    from tests.test_reference_import import to_reference_state
    fm = load_frozen(str(run / 'quantized_checkpoint.npz'))
    ref_path = str(tmp_path / 'quantized_checkpoint.pth.tar')
    torch.save(to_reference_state(fm), ref_path)

    rc = deploy.main(['--import-reference', ref_path, '--arch', 'tiny18',
                      '--scheme', 'uniform8', '--image-size', '32',
                      '--batch', '4', '--accuracy', str(data / 'val'),
                      '--print-freq', '1'])
    out = capsys.readouterr().out
    assert rc == 0
    meters = json.loads(out.strip().splitlines()[-1])
    assert meters['images'] == 8

    assert meters['top1'] == pytest.approx(top1_qat, abs=1e-9), \
        (meters, top1_qat)

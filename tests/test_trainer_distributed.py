"""Trainer-integrated SPMD training over the virtual 8-device mesh.

The reference's distributed story is DDP + DistributedSampler + NCCL
(/root/reference/quant_train.py:190-223, 320-360) with a documented pitfall:
multi-GPU BN/range stats diverge across replicas and break bit-exact
deployment (model_zoo.md:70).  Here the Trainer itself builds the mesh,
shards every batch over 'data', and computes statistics on the logical
global batch — these tests pin down that (a) the mesh path runs end-to-end
through Trainer.run, (b) quant/BN statistics stay replicated and identical
to a single-device run on the same data, (c) the dp×tp (model_parallel)
variant trains.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.train.trainer import Trainer, TrainerConfig


def _cfg(tmp, **kw):
    base = dict(arch='tiny18', scheme='uniform8', num_classes=10,
                image_size=32, batch_size=8, epochs=1, lr=1e-3,
                calib_batches=2, steps_per_epoch=3, eval_batches=2,
                save_path=str(tmp))
    base.update(kw)
    return TrainerConfig(**base)


def test_trainer_uses_mesh_and_matches_single_device(tmp_path):
    assert len(jax.devices()) == 8, 'conftest must expose 8 virtual devices'

    t_mesh = Trainer(_cfg(tmp_path / 'mesh', use_mesh=True))
    assert t_mesh.mesh is not None and t_mesh.mesh.shape['data'] == 8
    t_one = Trainer(_cfg(tmp_path / 'one', use_mesh=False))
    assert t_one.mesh is None

    for t in (t_mesh, t_one):
        t.calibrate()
        t.train_epoch(0)

    # statistics computed on the global batch must match the single-device
    # run on the same data (min/max exactly; BN sums to reduction-order ulps)
    qs_m = jax.tree.map(np.asarray, t_mesh.state.quant_stats)
    qs_1 = jax.tree.map(np.asarray, t_one.state.quant_stats)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                         atol=1e-6),
                 qs_m, qs_1)
    bs_m = jax.tree.map(np.asarray, t_mesh.state.batch_stats)
    bs_1 = jax.tree.map(np.asarray, t_one.state.batch_stats)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-5),
                 bs_m, bs_1)

    # every stat leaf must be fully replicated across the mesh
    def assert_replicated(x):
        if isinstance(x, jax.Array):
            assert x.sharding.is_fully_replicated, x.sharding
    jax.tree.map(assert_replicated, t_mesh.state.quant_stats)
    jax.tree.map(assert_replicated, t_mesh.state.params)

    acc = t_mesh.evaluate()
    assert 0.0 <= acc <= 1.0


def test_trainer_model_parallel_head(tmp_path):
    """dp×tp: 4-way data, 2-way tensor sharding of the classifier head."""
    t = Trainer(_cfg(tmp_path, use_mesh=True, model_parallel=2))
    assert dict(t.mesh.shape) == {'data': 4, 'model': 2}
    kernel = t.state.params['quant_output']['kernel']
    assert not kernel.sharding.is_fully_replicated   # tensor-sharded
    t.calibrate()
    t.train_epoch(0)
    assert np.isfinite(float(t.state.step))


def test_trainer_mobilenet_frozen_artifact(tmp_path):
    """The per-epoch quantized_checkpoint.npz hand-off works for the
    MobileNetV2 family too: the dumped FrozenModel rebuilds an engine that
    runs (quant_train.py:665-670 writes the artifact for every arch)."""
    from hawq_tpu.utils.checkpoint import load_frozen
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine

    t = Trainer(_cfg(tmp_path, arch='tiny_mnv2'))
    t.calibrate()
    t.train_epoch(0)
    t.evaluate()
    t.save_checkpoint(0, False)

    fm = load_frozen(str(tmp_path / 'quantized_checkpoint.npz'))
    assert fm.arch == 'mobilenetv2'
    eng = build_mobilenetv2_engine(fm, t.model.stages)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 32, 32, 3).astype(np.float32))
    logits = np.asarray(eng(x))
    assert logits.shape == (2, 10) and np.isfinite(logits).all()


@pytest.mark.slow
def test_trainer_inception_frozen_artifact(tmp_path):
    from hawq_tpu.utils.checkpoint import load_frozen
    from hawq_tpu.inference.engine_inception import build_inceptionv3_engine

    t = Trainer(_cfg(tmp_path, arch='tiny_inceptionv3', image_size=96,
                     batch_size=2, steps_per_epoch=1, calib_batches=1,
                     eval_batches=1))
    t.calibrate()
    t.train_epoch(0)
    t.save_checkpoint(0, False)

    fm = load_frozen(str(tmp_path / 'quantized_checkpoint.npz'))
    assert fm.arch == 'inceptionv3'
    eng = build_inceptionv3_engine(fm, width_div=t.model.width_div)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 96, 96, 3).astype(np.float32))
    logits = np.asarray(eng(x))
    assert logits.shape == (1, 10) and np.isfinite(logits).all()


def test_trainer_v2_family_end_to_end(tmp_path):
    """The pre-activation v2 family trains through the Trainer (L5→L4
    wiring): train → per-epoch frozen artifact → v2 engine, with the engine
    bit-exact against the trained QAT graph (same integer-logit criterion as
    tests/test_resnet_v2.py)."""
    from hawq_tpu.utils.checkpoint import load_frozen
    from hawq_tpu.inference.engine_v2 import build_resnet_v2_engine

    t = Trainer(_cfg(tmp_path, arch='tiny18v2'))
    assert type(t.model).__name__ == 'QResNetV2'
    t.calibrate()
    t.train_epoch(0)
    t.evaluate()
    t.save_checkpoint(0, False)

    fm = load_frozen(str(tmp_path / 'quantized_checkpoint.npz'))
    assert fm.arch == 'tiny18v2'
    eng = build_resnet_v2_engine(fm)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 32, 32, 3).astype(np.float32))
    logits = np.asarray(eng(x))
    assert logits.shape == (2, 10) and np.isfinite(logits).all()

    # parity: trained QAT graph (frozen stats, folded) == integer engine
    v = t.state.variables()
    qat = np.asarray(jax.jit(
        lambda v, x: t.model.apply(v, x, folded=True,
                                   update_stats=False))(v, x))
    out_scale = (fm['quant_output.weight_scale'].astype(np.float64)
                 * np.float64(fm.act_scale('quant_act_output')))
    qi, ei = np.round(qat / out_scale), np.round(logits / out_scale)
    assert int(np.sum(qi != ei)) == 0


def test_resume_quantize_without_quant_stats_recalibrates(tmp_path):
    """--resume-quantize on a checkpoint that carries no quantization state
    (e.g. a float-only artifact) must warn and fall back to calibration
    instead of silently evaluating with degenerate fresh ranges."""
    from hawq_tpu.utils import checkpoint as ckpt

    donor = Trainer(_cfg(tmp_path / 'donor', use_mesh=False))
    variables = jax.tree.map(np.asarray, donor.state.variables())
    variables.pop('quant_stats')          # a weights-only artifact
    path = str(tmp_path / 'float_only.npz')
    ckpt.save_train_checkpoint(path, variables, {})

    t = Trainer(_cfg(tmp_path / 'run', use_mesh=False, evaluate=True,
                     resume=path, resume_quantize=True))
    assert not t._restored_quant_stats
    t.run()
    log = (tmp_path / 'run' / 'log.log').read_text()
    assert 'without quantization state' in log
    assert 'calibrated on' in log        # calibration still ran


def test_trainer_quant_overrides_and_eval_only(tmp_path):
    """CLI quant flags reach QuantSettings; --evaluate runs no train step."""
    t = Trainer(_cfg(tmp_path, act_percentile=99.9, channel_wise=0,
                     bias_bit=16, evaluate=True))
    st = t.bit_cfg.settings
    assert st.act_percentile == 99.9 and st.per_channel is False
    assert st.bias_bit == 16
    assert t.model.cfg.settings is st        # the model sees the overrides

    acc = t.run()
    assert 0.0 <= acc <= 1.0
    assert int(t.state.step) == 0            # no optimizer step taken


def test_trainer_kd_random_teacher_warns(tmp_path):
    # basicConfig(force=True) owns the handlers, so check the log file
    Trainer(_cfg(tmp_path, distill_alpha=0.9))
    log = (tmp_path / 'log.log').read_text()
    assert 'randomly initialized' in log


def test_trainer_kd_teacher_checkpoint_end_to_end(tmp_path):
    """--teacher-checkpoint driven for real: synthetic-train a tiny float
    teacher, save it, distill a quantized student from it through the
    Trainer (train_kd + teacher restore, quant_train.py:442-449, 533-622)."""
    from hawq_tpu.models.resnet import FloatResNet
    from hawq_tpu.utils import checkpoint as ckpt

    teacher = FloatResNet(arch='tiny18', num_classes=10)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(8, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, 8))
    tvars = teacher.init(jax.random.PRNGKey(3), x)

    def ce(params):
        logits = teacher.apply(
            {'params': params, 'batch_stats': tvars['batch_stats']}, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(logp[jnp.arange(8), y])

    params = tvars['params']
    grad_fn = jax.jit(jax.value_and_grad(ce))
    first_loss, _ = grad_fn(params)
    for _ in range(5):
        loss, g = grad_fn(params)
        params = jax.tree.map(lambda p, gi: p - 0.5 * gi, params, g)
    assert float(loss) < float(first_loss)      # the teacher actually trained

    trained = {'params': params, 'batch_stats': tvars['batch_stats']}
    tpath = str(tmp_path / 'teacher.npz')
    ckpt.save_train_checkpoint(tpath, jax.tree.map(np.asarray, trained),
                               {'arch': 'tiny18'})

    t = Trainer(_cfg(tmp_path / 'student', distill_alpha=0.9,
                     teacher_checkpoint=tpath, teacher_arch='tiny18'))
    log = (tmp_path / 'student' / 'log.log').read_text()
    assert 'randomly initialized' not in log    # the real-teacher path
    # the restored teacher serves the trained weights, not an init
    want = np.asarray(teacher.apply(trained, x))
    np.testing.assert_allclose(np.asarray(t.teacher_fn(x)), want,
                               rtol=1e-6, atol=1e-6)
    t.calibrate()
    epoch_loss = t.train_epoch(0)
    assert np.isfinite(float(epoch_loss))


def test_trainer_resume_float_and_quantized(tmp_path):
    """Both resume flavors (quant_train.py:238-258, :304-318) + progressive
    QAT chaining (model_zoo.md:83): uniform8 → resume-quantize → uniform4."""
    from hawq_tpu.utils import checkpoint as ckpt

    cfg = _cfg(tmp_path / 'run8', use_mesh=False)
    t = Trainer(cfg)
    t.run()
    path = str(tmp_path / 'run8' / 'checkpoint.npz')
    saved, meta, opt_leaves = ckpt.load_train_checkpoint(path,
                                                         return_opt=True)
    assert meta['epoch'] == 1 and opt_leaves, meta

    # float flavor: weights + BN statistics restore bit-for-bit, activation
    # ranges do NOT (they recalibrate); epoch/step/optimizer restore
    t2 = Trainer(_cfg(tmp_path / 'resume_float', use_mesh=False,
                      epochs=2, resume=path))
    assert t2.start_epoch == 1
    assert int(t2.state.step) == int(meta['step'])
    got = jax.tree.map(np.asarray, t2.state.variables())
    np.testing.assert_array_equal(
        got['params']['quant_output']['kernel'],
        saved['params']['quant_output']['kernel'])
    fresh = Trainer(_cfg(tmp_path / 'fresh', use_mesh=False))
    ranges_restored = np.array_equal(
        ckpt.flatten_dict(got['quant_stats'])['quant_input/x_max'],
        ckpt.flatten_dict(saved['quant_stats'])['quant_input/x_max'])
    assert not ranges_restored or np.array_equal(
        ckpt.flatten_dict(
            jax.tree.map(np.asarray, fresh.state.variables())['quant_stats']
        )['quant_input/x_max'],
        ckpt.flatten_dict(saved['quant_stats'])['quant_input/x_max'])
    n_opt = len(jax.tree_util.tree_leaves(t2.state.opt_state))
    assert n_opt == len(opt_leaves)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(t2.state.opt_state)[0]),
        opt_leaves[0])
    t2.run()    # continues from epoch 1 without retraining epoch 0

    # quantized flavor, chained into a *different scheme*: weights AND
    # ranges restore (progressive QAT), then uniform4 training proceeds
    t4 = Trainer(_cfg(tmp_path / 'run4', use_mesh=False, scheme='uniform4',
                      epochs=2, resume=path, resume_quantize=True))
    got4 = jax.tree.map(np.asarray, t4.state.variables())
    np.testing.assert_array_equal(
        got4['params']['quant_output']['kernel'],
        saved['params']['quant_output']['kernel'])
    np.testing.assert_array_equal(
        ckpt.flatten_dict(got4['quant_stats'])['quant_input/x_max'],
        ckpt.flatten_dict(saved['quant_stats'])['quant_input/x_max'])
    acc = t4.run()
    assert 0.0 <= acc <= 1.0

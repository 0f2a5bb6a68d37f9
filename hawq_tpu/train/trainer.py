"""End-to-end QAT trainer — the reference CLI driver rebuilt TPU-first.

Parity target: /root/reference/quant_train.py (argparse :26-152, main_worker
:208-481, train :484-530, train_kd :533-622, validate :625-674).  The
orchestration:

  build model (arch + scheme) → optionally import float weights → calibrate
  activation ranges → epoch loop { train (unfolded or folded BN per the
  fix-BN schedule) → eval with frozen ranges → save checkpoint + best copy +
  frozen integer artifact } → resume from either checkpoint flavor.

TPU-native differences: one jitted train step over a data mesh (replicas
share globally-computed statistics), functional state (TrainState), npz/JSON
checkpoints, and the frozen artifact is the engine-ready FrozenModel rather
than a torch state-dict slice.

CLI: python -m hawq_tpu.train.trainer --arch resnet50 --scheme uniform8 ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import shutil
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hawq_tpu.configs.bit_config import (BitConfig, QuantSettings,
                                         get_bit_config)
from hawq_tpu.inference.freeze import freeze_resnet
from hawq_tpu.train import data as data_lib
from hawq_tpu.train.train import (TrainState, make_train_step, make_eval_step,
                                  make_calibration_step, sgd_with_step_decay)
from hawq_tpu.utils import checkpoint as ckpt


@dataclasses.dataclass
class TrainerConfig:
    arch: str = 'resnet50'
    scheme: str = 'uniform8'
    num_classes: int = 1000
    image_size: int = 224
    batch_size: int = 128
    epochs: int = 1
    lr: float = 1e-4
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_decay_epochs: int = 30        # ×0.1 every N epochs (quant_train.py:725)
    fix_bn: bool = False             # start folded
    fix_bn_threshold: Optional[int] = None   # steps until forced folded
    calib_batches: int = 8
    distill_alpha: Optional[float] = None
    temperature: float = 6.0
    teacher_checkpoint: Optional[str] = None   # float checkpoint (npz) for KD
    teacher_arch: str = 'resnet101'            # KD teacher (quant_train.py:442)
    data_dir: Optional[str] = None   # None → synthetic data
    dataset: str = 'imagenet'        # 'imagenet' (ImageFolder) | 'cifar10'
    data_percentage: float = 1.0
    save_path: str = '/tmp/hawq_tpu_run'
    resume: Optional[str] = None
    resume_quantize: bool = False
    steps_per_epoch: Optional[int] = None    # cap (synthetic data)
    eval_batches: Optional[int] = None
    use_mesh: bool = True            # SPMD over all visible devices
    model_parallel: int = 1          # tensor-shard the classifier head
    evaluate_times: int = 0          # mid-epoch evals per epoch (train_kd)
    print_freq: int = 0              # per-step log interval (ProgressMeter)
    evaluate: bool = False           # eval-only, no training (quant_train.py
                                     # --evaluate, :455-458)
    seed: int = 0                    # init/data seed (--seed)
    grad_precision: Optional[str] = None   # matmul precision for backward
                                     # convs: None = f32-faithful default;
                                     # 'bfloat16' = 1.7x faster step
                                     # (train/train.py make_train_step)
    residual_store_dtype: Optional[str] = None   # 'bfloat16': narrow conv
                                     # backward residuals + bf16 gradient
                                     # convs (value-exact storage, ~2e-3
                                     # relative gradient deviation;
                                     # measured -1.4% step time at b64)
    workers: int = 4                 # loader threads (-j/--workers)
    start_epoch: int = 0             # epoch offset (--start-epoch)
    # QuantSettings overrides — the reference's quant argparse tier
    # (quant_train.py:70-117); None keeps the scheme's stored settings
    bias_bit: Optional[int] = None               # --bias-bit
    channel_wise: Optional[int] = None           # --channel-wise 0|1
    act_percentile: Optional[float] = None       # --act-percentile
    weight_percentile: Optional[float] = None    # --weight-percentile
    act_range_momentum: Optional[float] = None   # --act-range-momentum
    fixed_point_quantization: bool = False       # --fixed-point-quantization


def _apply_quant_overrides(cfg: TrainerConfig, bit_cfg: BitConfig
                           ) -> BitConfig:
    """Fold the CLI quant flags into the scheme's QuantSettings."""
    repl = {}
    if cfg.bias_bit is not None:
        repl['bias_bit'] = int(cfg.bias_bit)
    if cfg.channel_wise is not None:
        repl['per_channel'] = bool(cfg.channel_wise)
    if cfg.act_percentile is not None:
        repl['act_percentile'] = float(cfg.act_percentile)
    if cfg.weight_percentile is not None:
        repl['weight_percentile'] = float(cfg.weight_percentile)
    if cfg.act_range_momentum is not None:
        repl['act_range_momentum'] = float(cfg.act_range_momentum)
    if cfg.fixed_point_quantization:
        repl['fixed_point_quantization'] = True
    if not repl:
        return bit_cfg
    return dataclasses.replace(
        bit_cfg, settings=dataclasses.replace(bit_cfg.settings, **repl))


def build_model(cfg: TrainerConfig):
    from hawq_tpu.models.resnet import QResNet
    if cfg.arch in ('mobilenetv2_w1', 'tiny_mnv2'):
        from hawq_tpu.models.mobilenetv2 import (
            QMobileNetV2, TINY_MNV2_STAGES, TINY_MNV2_INIT_CH,
            TINY_MNV2_FINAL_CH)
        if cfg.arch == 'tiny_mnv2':    # test-scale variant, uniform-8 table
            bit_cfg = _apply_quant_overrides(cfg, BitConfig(
                name=f'tiny_mnv2_{cfg.scheme}', table={},
                settings=QuantSettings()))
            return QMobileNetV2(cfg=bit_cfg, num_classes=cfg.num_classes,
                                stages=TINY_MNV2_STAGES,
                                init_ch=TINY_MNV2_INIT_CH,
                                final_ch=TINY_MNV2_FINAL_CH), bit_cfg
        bit_cfg = _apply_quant_overrides(
            cfg, get_bit_config(cfg.arch, cfg.scheme))
        return QMobileNetV2(cfg=bit_cfg, num_classes=cfg.num_classes), bit_cfg
    if cfg.arch in ('inceptionv3', 'tiny_inceptionv3'):
        from hawq_tpu.models.inceptionv3 import QInceptionV3
        if cfg.arch == 'tiny_inceptionv3':   # width/16 test-scale variant
            bit_cfg = _apply_quant_overrides(cfg, BitConfig(
                name=f'tiny_inceptionv3_{cfg.scheme}',
                table={}, settings=QuantSettings()))
            return QInceptionV3(cfg=bit_cfg, num_classes=cfg.num_classes,
                                width_div=16), bit_cfg
        bit_cfg = _apply_quant_overrides(
            cfg, get_bit_config(cfg.arch, cfg.scheme))
        return QInceptionV3(cfg=bit_cfg, num_classes=cfg.num_classes), bit_cfg
    bit_cfg = _apply_quant_overrides(
        cfg, get_bit_config(cfg.arch, cfg.scheme))
    if cfg.arch.endswith('v2'):
        from hawq_tpu.configs.bit_config import RESNET_UNITS
        from hawq_tpu.models.resnet_v2 import QResNetV2
        if cfg.arch[:-2] in RESNET_UNITS:
            return QResNetV2(arch=cfg.arch, cfg=bit_cfg,
                             num_classes=cfg.num_classes), bit_cfg
    if cfg.arch.startswith(('resnet', 'tiny')):
        return QResNet(arch=cfg.arch, cfg=bit_cfg,
                       num_classes=cfg.num_classes), bit_cfg
    raise ValueError(f'unknown arch {cfg.arch}')


def _batches(cfg: TrainerConfig, train: bool, epoch: int) -> Iterator[dict]:
    if cfg.data_dir is None:
        n = cfg.steps_per_epoch or 10
        yield from data_lib.synthetic_batches(
            cfg.batch_size, cfg.image_size, cfg.num_classes, n,
            seed=epoch if train else 10_000)
        return
    if cfg.dataset == 'cifar10':
        yield from data_lib.cifar10_batches(
            cfg.data_dir, cfg.batch_size, train=train, seed=epoch,
            data_percentage=cfg.data_percentage,
            process_index=jax.process_index(),
            process_count=jax.process_count())
        return
    split = 'train' if train else 'val'
    loader = data_lib.ImageFolderLoader(
        os.path.join(cfg.data_dir, split), cfg.batch_size, train=train,
        image_size=cfg.image_size, data_percentage=cfg.data_percentage,
        num_workers=cfg.workers, seed=cfg.seed,
        process_index=jax.process_index(), process_count=jax.process_count())
    yield from loader.epoch(epoch)


class Trainer:
    def __init__(self, cfg: TrainerConfig):
        # multi-host rendezvous first — must precede any device query
        # (the jax.distributed analog of dist.init_process_group,
        # quant_train.py:222-223)
        from hawq_tpu.parallel import distributed
        from hawq_tpu.parallel import mesh as pmesh
        distributed.initialize()

        self.cfg = cfg
        os.makedirs(cfg.save_path, exist_ok=True)
        logging.basicConfig(
            level=logging.INFO,
            handlers=[logging.StreamHandler(),
                      logging.FileHandler(
                          os.path.join(cfg.save_path, 'log.log'))],
            format='%(asctime)s %(message)s', force=True)
        self.log = logging.getLogger('hawq_tpu')
        self.model, self.bit_cfg = build_model(cfg)
        self.best_acc = 0.0
        self.start_epoch = cfg.start_epoch

        # SPMD mesh over every visible device: batch over 'data', params
        # replicated, classifier head optionally tensor-sharded over 'model'
        n_dev = len(jax.devices())
        self.mesh = None
        if cfg.use_mesh and n_dev > 1 and cfg.batch_size % n_dev == 0:
            self.mesh = pmesh.make_mesh(
                n_data=n_dev // cfg.model_parallel,
                n_model=cfg.model_parallel)
            self.log.info('mesh: %s over %d devices (%d hosts)',
                          dict(self.mesh.shape), n_dev, jax.process_count())
        elif cfg.use_mesh and n_dev > 1:
            self.log.warning(
                'batch_size %d not divisible by %d devices — single-device',
                cfg.batch_size, n_dev)

        example = jnp.zeros((cfg.batch_size, cfg.image_size, cfg.image_size,
                             3), jnp.float32)
        variables = self.model.init(jax.random.PRNGKey(cfg.seed), example,
                                    folded=True, update_stats=True)
        steps_per_epoch = cfg.steps_per_epoch or 1000
        tx = sgd_with_step_decay(
            cfg.lr, cfg.momentum, cfg.weight_decay,
            decay_every_steps=cfg.lr_decay_epochs * steps_per_epoch)
        self.state = TrainState.create(variables, tx)
        if self.mesh is not None:
            self.state = self._shard_state(self.state)

        if cfg.resume:
            self._resume(cfg.resume, cfg.resume_quantize)

        # KD teacher: a float model applied per batch to produce soft targets
        # (train_kd, quant_train.py:533-622; default teacher resnet101)
        self.teacher_fn = None
        if cfg.distill_alpha is not None:
            from hawq_tpu.models.resnet import FloatResNet
            teacher = FloatResNet(arch=cfg.teacher_arch,
                                  num_classes=cfg.num_classes)
            if cfg.teacher_checkpoint:
                tvars, _ = ckpt.load_train_checkpoint(cfg.teacher_checkpoint)
            else:
                self.log.warning(
                    'KD enabled without --teacher-checkpoint: the teacher is '
                    'randomly initialized and distillation will distill '
                    'noise — pass a trained float checkpoint for real runs')
                tvars = teacher.init(jax.random.PRNGKey(1), example)
            self.teacher_fn = jax.jit(
                lambda x: teacher.apply(tvars, x))

    def _shard_state(self, state):
        """Replicate the train state over the mesh; tensor-shard the
        classifier head over 'model' when model_parallel > 1."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from hawq_tpu.parallel import mesh as pmesh
        state = pmesh.replicate_state(self.mesh, state)
        if self.cfg.model_parallel > 1 and 'quant_output' in state.params:
            qo = dict(state.params['quant_output'])
            qo['kernel'] = jax.device_put(
                qo['kernel'], NamedSharding(self.mesh, P(None, 'model')))
            qo['bias'] = jax.device_put(
                qo['bias'], NamedSharding(self.mesh, P('model')))
            params = dict(state.params)
            params['quant_output'] = qo
            state = state.replace(params=params,
                                  opt_state=state.tx.init(params))
        return state

    def _global_batch(self, batch, with_teacher: bool = False):
        """Host-local numpy shard → globally sharded device batch
        (the DistributedSampler + H2D analog, quant_train.py:411, 507)."""
        from hawq_tpu.parallel import distributed
        batch = {k: np.asarray(v) for k, v in batch.items()}
        if with_teacher and self.teacher_fn is not None:
            batch['teacher_logits'] = np.asarray(
                self.teacher_fn(jnp.asarray(batch['image'])))
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        return distributed.global_batch_from_host_shards(self.mesh, batch)

    # -- checkpointing (quant_train.py:475-481, 677-680, 238-318) ----------
    def _ckpt_path(self, name):
        return os.path.join(self.cfg.save_path, name)

    def save_checkpoint(self, epoch: int, is_best: bool):
        variables = jax.tree.map(np.asarray, self.state.variables())
        meta = {'epoch': epoch, 'arch': self.cfg.arch,
                'scheme': self.cfg.scheme, 'best_acc': self.best_acc,
                'step': int(self.state.step)}
        opt_leaves = [np.asarray(l) for l in
                      jax.tree_util.tree_leaves(self.state.opt_state)]
        ckpt.save_train_checkpoint(self._ckpt_path('checkpoint.npz'),
                                   variables, meta, opt_leaves=opt_leaves)
        if is_best:
            shutil.copy(self._ckpt_path('checkpoint.npz'),
                        self._ckpt_path('model_best.npz'))
            shutil.copy(self._ckpt_path('checkpoint.npz.meta.json'),
                        self._ckpt_path('model_best.npz.meta.json'))
        # frozen integer artifact (the deployment hand-off,
        # quant_train.py:665-670) — all three model families
        if self.cfg.arch in ('mobilenetv2_w1', 'tiny_mnv2'):
            from hawq_tpu.inference.freeze import freeze_mobilenetv2
            fm = freeze_mobilenetv2(variables, self.bit_cfg,
                                    self.model.stages, self.cfg.num_classes)
        elif self.cfg.arch in ('inceptionv3', 'tiny_inceptionv3'):
            from hawq_tpu.inference.engine_inception import freeze_inceptionv3
            fm = freeze_inceptionv3(variables, self.bit_cfg,
                                    self.cfg.num_classes,
                                    width_div=self.model.width_div)
        elif self.cfg.arch.endswith('v2'):
            from hawq_tpu.inference.engine_v2 import freeze_resnet_v2
            fm = freeze_resnet_v2(variables, self.cfg.arch, self.bit_cfg,
                                  self.cfg.num_classes)
        else:
            fm = freeze_resnet(variables, self.cfg.arch, self.bit_cfg,
                               self.cfg.num_classes)
        ckpt.save_frozen(self._ckpt_path('quantized_checkpoint.npz'), fm)

    def _resume(self, path: str, quantized: bool):
        """Reference flavors (quant_train.py):
        --resume (:238-258): map the checkpoint's *weights + BN statistics*
          onto the model; activation ranges stay fresh (the reference's key
          remap skips scaling_factor/min/max) and are recalibrated.
        --resume-quantize (:304-318): quantized-training continuation —
          weights AND quantization state (ranges, BN stats) restore, the
          progressive-QAT path (model_zoo.md:83).
        Both restore epoch/best/step/optimizer when present (:370-387)."""
        variables, meta, opt_leaves = ckpt.load_train_checkpoint(
            path, return_opt=True)
        cur = self.state.variables()
        self._restored_quant_stats = quantized and 'quant_stats' in variables
        if quantized and not self._restored_quant_stats:
            self.log.warning(
                '--resume-quantize on a checkpoint without quantization '
                'state (%s) — activation ranges stay fresh and will be '
                'calibrated', path)
        merged = {'params': variables.get('params', cur['params']),
                  'quant_stats': (variables.get('quant_stats',
                                                cur['quant_stats'])
                                  if quantized else cur['quant_stats']),
                  'batch_stats': variables.get('batch_stats',
                                               cur['batch_stats'])}
        self.state = self.state.replace(
            params=merged['params'], quant_stats=merged['quant_stats'],
            batch_stats=merged.get('batch_stats', {}))
        if opt_leaves:
            flat, treedef = jax.tree_util.tree_flatten(self.state.opt_state)
            if len(opt_leaves) == len(flat) and all(
                    np.shape(a) == np.shape(b) for a, b in
                    zip(opt_leaves, flat)):
                self.state = self.state.replace(
                    opt_state=jax.tree_util.tree_unflatten(
                        treedef, [jnp.asarray(l) for l in opt_leaves]))
            else:
                self.log.warning(
                    'checkpoint optimizer state does not match the current '
                    'optimizer (%d vs %d leaves) — reinitialized',
                    len(opt_leaves), len(flat))
        if meta:
            self.start_epoch = int(meta.get('epoch', 0))
            self.best_acc = float(meta.get('best_acc', 0.0))
            if 'step' in meta:
                self.state = self.state.replace(
                    step=jnp.asarray(int(meta['step']), jnp.int32))
        if self.mesh is not None:
            from hawq_tpu.parallel import mesh as pmesh
            self.state = pmesh.replicate_state(self.mesh, self.state)
        self.log.info('resumed from %s (%s, epoch %d, best %.2f)', path,
                      'quantized' if quantized else 'float',
                      self.start_epoch, self.best_acc)

    # -- phases -------------------------------------------------------------
    def calibrate(self):
        calib = make_calibration_step(self.model, folded=True,
                                      mesh=self.mesh)
        variables = self.state.variables()
        for i, batch in enumerate(_batches(self.cfg, True, epoch=0)):
            if i >= self.cfg.calib_batches:
                break
            batch = self._global_batch(
                {'image': batch['image']})
            variables = calib(variables, batch['image'])
        self.state = self.state.replace(
            quant_stats=variables['quant_stats'],
            batch_stats=variables.get('batch_stats',
                                      self.state.batch_stats))
        self.log.info('calibrated on %d batches', self.cfg.calib_batches)

    def train_epoch(self, epoch: int):
        cfg = self.cfg
        # fix-BN schedule (quant_modules.py:407-414), owned by the trainer
        folded = cfg.fix_bn or (
            cfg.fix_bn_threshold is not None
            and int(self.state.step) >= cfg.fix_bn_threshold)
        step_fn = make_train_step(self.model, folded=folded,
                                  distill_alpha=cfg.distill_alpha,
                                  temperature=cfg.temperature,
                                  mesh=self.mesh, rng_seed=cfg.seed,
                                  matmul_precision=cfg.grad_precision,
                                  residual_store_dtype=
                                  cfg.residual_store_dtype)
        # mid-epoch evaluation (train_kd evaluate_times,
        # quant_train.py:591-610)
        eval_every = None
        if cfg.evaluate_times > 0 and cfg.steps_per_epoch:
            eval_every = max(cfg.steps_per_epoch // cfg.evaluate_times, 1)
        t0 = time.time()
        n, loss_sum, acc_sum = 0, 0.0, 0.0
        for i, batch in enumerate(_batches(cfg, True, epoch)):
            if cfg.steps_per_epoch and i >= cfg.steps_per_epoch:
                break
            batch = self._global_batch(batch, with_teacher=True)
            self.state, metrics = step_fn(self.state, batch)
            loss_sum += float(metrics['loss'])
            acc_sum += float(metrics['accuracy'])
            n += 1
            if cfg.print_freq and n % cfg.print_freq == 0:
                dt = time.time() - t0
                self.log.info(
                    'epoch %d [%d/%s] loss %.4f (%.4f) acc %.4f '
                    '(%.1f img/s)', epoch, n, cfg.steps_per_epoch or '?',
                    float(metrics['loss']), loss_sum / n, acc_sum / n,
                    n * cfg.batch_size / max(dt, 1e-9))
            if eval_every and n % eval_every == 0 \
                    and n != cfg.steps_per_epoch:
                acc = self.evaluate()
                if acc > self.best_acc:
                    self.best_acc = acc
                    self.save_checkpoint(epoch, is_best=True)
        self.log.info(
            'epoch %d: folded_bn=%s loss %.4f acc %.4f (%d steps, %.1fs)',
            epoch, folded, loss_sum / max(n, 1), acc_sum / max(n, 1), n,
            time.time() - t0)
        return loss_sum / max(n, 1)

    def evaluate(self) -> float:
        from hawq_tpu.parallel.distributed import psum_metrics
        eval_fn = make_eval_step(self.model, mesh=self.mesh)
        variables = self.state.variables()
        tops, n, n_samples = 0.0, 0, 0
        for i, batch in enumerate(_batches(self.cfg, False, epoch=0)):
            if self.cfg.eval_batches and i >= self.cfg.eval_batches:
                break
            batch = {k: jnp.asarray(v) for k, v in batch.items()
                     if k in ('image', 'label')}
            bsz = int(batch['label'].shape[0])
            batch = self._global_batch(batch)
            out = eval_fn(variables, batch)
            tops += float(out['top1']) * bsz
            n += 1
            n_samples += bsz
        # cross-host aggregation weighted by per-host sample counts, so
        # uneven final batches don't skew the global mean
        agg = psum_metrics({'top1': tops / max(n_samples, 1)},
                           count=n_samples)
        acc = agg['top1']
        self.log.info('eval top-1 %.4f (%d batches)', acc, n)
        return acc

    def run(self):
        # a quantized resume restores trained activation ranges — do not
        # recalibrate over them (the reference evaluates/trains straight
        # from the restored buffers, quant_train.py:304-318, 455-458);
        # if the checkpoint carried no quant_stats the ranges are fresh
        # and calibration still runs (with a warning from _resume)
        if not getattr(self, '_restored_quant_stats', False):
            self.calibrate()
        if self.cfg.evaluate:       # eval-only (quant_train.py:455-458)
            return self.evaluate()
        for epoch in range(self.start_epoch, self.cfg.epochs):
            self.train_epoch(epoch)
            acc = self.evaluate()
            is_best = acc > self.best_acc
            self.best_acc = max(self.best_acc, acc)
            self.save_checkpoint(epoch + 1, is_best)
        return self.best_acc


def main(argv=None):
    p = argparse.ArgumentParser(description='hawq-tpu QAT trainer')
    none_types = {'fix_bn_threshold': int, 'steps_per_epoch': int,
                  'eval_batches': int, 'distill_alpha': float,
                  'data_dir': str, 'resume': str,
                  'teacher_checkpoint': str, 'bias_bit': int,
                  'channel_wise': int, 'act_percentile': float,
                  'weight_percentile': float, 'act_range_momentum': float,
                  'grad_precision': str, 'residual_store_dtype': str}
    for f in dataclasses.fields(TrainerConfig):
        name = '--' + f.name.replace('_', '-')
        if isinstance(f.default, bool):
            p.add_argument(name, action='store_true', default=f.default)
        else:
            typ = none_types.get(f.name, type(f.default)) \
                if f.default is None else type(f.default)
            p.add_argument(name, type=typ, default=f.default)
    args = p.parse_args(argv)
    # honor JAX_PLATFORMS even where a sitecustomize force-registers a
    # device plugin (the config API wins over plugin registration)
    if os.environ.get('JAX_PLATFORMS'):
        jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])
    cfg = TrainerConfig(**vars(args))
    return Trainer(cfg).run()


if __name__ == '__main__':
    main()

"""QAT training loop — jit/pjit train step, SGD + step decay, KD, BN schedule.

Parity targets in /root/reference/quant_train.py:
  * train()/loss           — :484-530 (CE + SGD, top-1/top-5 meters)
  * train_kd()/loss_kd     — :533-622, 750-762 (KL(student/T, teacher/T)·αT²
                              + CE·(1-α))
  * adjust_learning_rate   — :725-729 (lr × 0.1 every 30 epochs)
  * fix-BN schedule        — quant_modules.py:407-414 (auto-switch to folded
                              BN after fix_BN_threshold steps) — here the
                              trainer owns the schedule explicitly
  * freeze/eval/unfreeze   — :625-674 via update_stats=False

TPU-native: the step is one jitted function over a jax.sharding.Mesh; the
batch is sharded over the 'data' axis and parameters are replicated.  Range
statistics (EMA min/max) and BN batch stats are computed on the *logical
global* batch under GSPMD, so all replicas hold identical statistics — this
fixes the reference's multi-GPU BN divergence (model_zoo.md:70) by
construction.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    quant_stats: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables: Mapping, tx: optax.GradientTransformation):
        params = variables['params']
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   quant_stats=variables['quant_stats'],
                   batch_stats=variables.get('batch_stats', {}),
                   opt_state=tx.init(params), tx=tx)

    def variables(self) -> Mapping:
        return {'params': self.params, 'quant_stats': self.quant_stats,
                'batch_stats': self.batch_stats}


def sgd_with_step_decay(base_lr: float, momentum: float = 0.9,
                        weight_decay: float = 1e-4,
                        decay_every_steps: Optional[int] = None,
                        decay_factor: float = 0.1):
    """SGD + momentum + weight decay, lr stepped ×decay_factor periodically
    (quant_train.py:725-729's epoch-level 10× decay, expressed in steps)."""
    if decay_every_steps is None:
        sched = base_lr
    else:
        sched = lambda step: base_lr * decay_factor ** (step // decay_every_steps)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=sched, momentum=momentum))


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def kd_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
            labels: jnp.ndarray, alpha: float = 0.95,
            temperature: float = 6.0) -> jnp.ndarray:
    """KD_naive distillation loss (quant_train.py:750-762)."""
    t = temperature
    kl = optax.kl_divergence(
        jax.nn.log_softmax(student_logits / t, axis=-1),
        jax.nn.softmax(teacher_logits / t, axis=-1)).mean()
    ce = cross_entropy(student_logits, labels)
    return kl * (alpha * t * t) + ce * (1.0 - alpha)


def _mesh_jit(fn, mesh, donate_argnums=()):
    """jit with explicit data-parallel shardings over a mesh.

    The batch (second argument) is sharded over the 'data' axis (prefix
    sharding: every leaf's leading axis); the state keeps its incoming
    shardings (replicated params/stats, optionally tensor-sharded head).
    GSPMD inserts the gradient/stat all-reduces (the NCCL role,
    quant_train.py:222-223, 332-343).
    """
    if mesh is None:
        return jax.jit(fn, donate_argnums=donate_argnums)
    from jax.sharding import NamedSharding, PartitionSpec as P
    data_sh = NamedSharding(mesh, P('data'))
    n_args = 2
    in_sh = tuple([None] * (n_args - 1)) + (data_sh,)
    return jax.jit(fn, donate_argnums=donate_argnums, in_shardings=in_sh)


def make_train_step(model, *, folded: bool,
                    distill_alpha: Optional[float] = None,
                    temperature: float = 6.0, mesh=None,
                    rng_seed: int = 0,
                    matmul_precision: Optional[str] = None,
                    residual_store_dtype: Optional[str] = None) -> Callable:
    """Build the jitted QAT train step.

    ``folded`` selects the BN mode statically (two compiled versions; the
    trainer flips at fix_BN_threshold).  If ``distill_alpha`` is set, the
    batch must carry 'teacher_logits'.  With ``mesh``, the step runs SPMD:
    batch sharded over 'data', parameters/stats replicated — range and BN
    statistics are computed on the logical global batch, so every replica
    holds identical statistics (fixes the reference's multi-GPU BN pitfall,
    model_zoo.md:70).

    ``matmul_precision``: precision for the float (backward/STE)
    convolutions — the quantized forward runs on the int8 MXU regardless.
    None keeps JAX's default; 'bfloat16' forces one-pass MXU gradient
    convs.  With the detached range statistics (nn/layers.py, matching
    the reference's x.data/w.data buffers) the default backward already
    runs at the bf16 rate — measured 38.3 vs 38.3 ms at resnet50 b64
    (benchmarks/train_breakdown_b64.json) — so this knob only matters if
    a future change re-introduces f32-precision float contractions.
    Forward integer numerics are bit-identical in either mode.

    ``residual_store_dtype``: storage dtype for the conv backward residuals
    (x_int, w_int) — 'bfloat16' halves the dominant fwd→bwd HBM traffic
    with value-exact residuals (conv inputs are integer-valued within the
    8-bit range, which bf16 represents exactly; see nn/layers.py).  None
    keeps the reference-faithful f32 floats.
    """

    def train_step(state: TrainState, batch: Mapping) -> Tuple[TrainState, Mapping]:
        # per-step dropout key, derived from the step counter: deterministic,
        # resume-stable, and identical on every replica (the mask is computed
        # on the logical global batch under GSPMD).  Models without dropout
        # simply never draw from it.
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(rng_seed),
                                         state.step)

        def loss_fn(params):
            logits, mut = model.apply(
                {'params': params, 'quant_stats': state.quant_stats,
                 'batch_stats': state.batch_stats},
                batch['image'], folded=folded, update_stats=True,
                mutable=['quant_stats', 'batch_stats'],
                rngs={'dropout': dropout_rng})
            if distill_alpha is not None:
                loss = kd_loss(logits, batch['teacher_logits'], batch['label'],
                               distill_alpha, temperature)
            else:
                loss = cross_entropy(logits, batch['label'])
            return loss, (logits, mut)

        import contextlib
        from hawq_tpu.nn import layers as _L
        ctx = contextlib.ExitStack()
        # both contexts apply at trace time (this function body IS the trace)
        if residual_store_dtype is not None:
            ctx.enter_context(
                _L.residual_store_dtype(jnp.dtype(residual_store_dtype)))
        if matmul_precision is not None:
            ctx.enter_context(jax.default_matmul_precision(matmul_precision))
        with ctx:
            (loss, (logits, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state,
            quant_stats=mut['quant_stats'],
            batch_stats=mut.get('batch_stats', state.batch_stats))
        acc = jnp.mean((jnp.argmax(logits, -1) == batch['label']).astype(jnp.float32))
        return new_state, {'loss': loss, 'accuracy': acc}

    return _mesh_jit(train_step, mesh, donate_argnums=(0,))


def make_eval_step(model, *, folded: bool = True, mesh=None) -> Callable:
    """Frozen-range eval step (freeze_model → eval → unfreeze of
    quant_train.py:625-674 becomes simply update_stats=False)."""

    def eval_step(variables: Mapping, batch: Mapping) -> Mapping:
        logits = model.apply(variables, batch['image'], folded=folded,
                             update_stats=False)
        top1 = (jnp.argmax(logits, -1) == batch['label']).astype(jnp.float32)
        k = min(5, logits.shape[-1])
        top5 = (jax.lax.top_k(logits, k)[1] == batch['label'][:, None]
                ).any(axis=-1).astype(jnp.float32)
        return {'top1': top1.mean(), 'top5': top5.mean(),
                'loss': cross_entropy(logits, batch['label'])}

    return _mesh_jit(eval_step, mesh)


def make_calibration_step(model, *, folded: bool = True, mesh=None) -> Callable:
    """Range-calibration pass: forward only, updating quant stats."""

    def calib_step(variables: Mapping, images: jnp.ndarray) -> Mapping:
        _, mut = model.apply(variables, images, folded=folded,
                             update_stats=True,
                             mutable=['quant_stats', 'batch_stats'])
        return {**dict(variables), **dict(mut)}

    return _mesh_jit(calib_step, mesh)

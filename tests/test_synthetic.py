"""Synthetic frozen models (inference/synthetic.py) must mirror the real
freezers' tensor namespace and shapes exactly — they stand in for trained
checkpoints in every latency benchmark (the reference's create_workload
analog, /root/reference/tvm_benchmark/mixed_precision_models/init.py:118-180),
so a drifted shape would silently benchmark the wrong program.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hawq_tpu.configs.bit_config import BitConfig, QuantSettings


def _assert_same_namespace(real, syn):
    rk, sk = set(real.tensors), set(syn.tensors)
    assert rk == sk, (sorted(rk - sk), sorted(sk - rk))
    bad = [(k, np.shape(real.tensors[k]), np.shape(syn.tensors[k]))
           for k in rk if np.shape(real.tensors[k])
           != np.shape(syn.tensors[k])]
    assert not bad, bad


def test_synthetic_mobilenet_matches_real_freeze():
    from hawq_tpu.models.mobilenetv2 import (QMobileNetV2, TINY_MNV2_STAGES,
                                             TINY_MNV2_INIT_CH,
                                             TINY_MNV2_FINAL_CH)
    from hawq_tpu.inference.freeze import freeze_mobilenetv2
    from hawq_tpu.inference.synthetic import synthetic_frozen_mobilenet
    cfg = BitConfig(name='t', table={}, settings=QuantSettings())
    m = QMobileNetV2(cfg=cfg, num_classes=8, stages=TINY_MNV2_STAGES,
                     init_ch=TINY_MNV2_INIT_CH, final_ch=TINY_MNV2_FINAL_CH)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
               folded=True, update_stats=True)
    real = freeze_mobilenetv2(jax.tree.map(np.asarray, v), cfg,
                              TINY_MNV2_STAGES, 8)
    syn = synthetic_frozen_mobilenet(cfg, 8, stages=TINY_MNV2_STAGES,
                                     init_ch=TINY_MNV2_INIT_CH,
                                     final_ch=TINY_MNV2_FINAL_CH)
    _assert_same_namespace(real, syn)
    # and the engine runs on it
    from hawq_tpu.inference.engine_mobilenet import build_mobilenetv2_engine
    out = build_mobilenetv2_engine(syn, TINY_MNV2_STAGES)(
        jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 8) and bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_synthetic_inception_matches_real_freeze():
    from hawq_tpu.models.inceptionv3 import QInceptionV3
    from hawq_tpu.inference.engine_inception import (freeze_inceptionv3,
                                                     build_inceptionv3_engine)
    from hawq_tpu.inference.synthetic import synthetic_frozen_inception
    cfg = BitConfig(name='t', table={}, settings=QuantSettings())
    m = QInceptionV3(cfg=cfg, num_classes=8, width_div=16)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)),
               folded=True, update_stats=True)
    real = freeze_inceptionv3(jax.tree.map(np.asarray, v), cfg, 8,
                              width_div=16)
    syn = synthetic_frozen_inception(cfg, 8, width_div=16)
    _assert_same_namespace(real, syn)
    out = build_inceptionv3_engine(syn, width_div=16)(
        jnp.zeros((1, 96, 96, 3)))
    assert out.shape == (1, 8) and bool(jnp.all(jnp.isfinite(out)))

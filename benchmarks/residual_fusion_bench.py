"""A/B the residual-add -> next-unit-input requant fusion on the real TPU.

The fusion emits the int16 carrier and the next unit's int8 input in one
pass over the residual sum (engine.py), saving a full carrier read per unit
— but the extra fusion output can stop XLA from folding the add epilogue
into the conv, materializing the int32 accumulator instead.  This sweep
measures both builds across batch sizes to set
engine.FUSE_UNIT_INPUT_MAX_BATCH (ResNet50, folded input, int16 residual —
the production config)."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from bench import time_per_iter
    from hawq_tpu.configs.bit_config import get_bit_config
    from hawq_tpu.inference.synthetic import synthetic_frozen_resnet
    from hawq_tpu.inference.engine import build_resnet_engine
    from hawq_tpu.inference.fold import fold4_images

    out = {'device': str(jax.devices()[0]), 'scheme': 'uniform8'}
    cfg = get_bit_config('resnet50', 'uniform8')
    fm = synthetic_frozen_resnet('resnet50', cfg)
    engines = {
        'fused': build_resnet_engine(fm, residual_dtype=jnp.int16,
                                     input_mode='folded_float32',
                                     fuse_unit_input=True),
        'unfused': build_resnet_engine(fm, residual_dtype=jnp.int16,
                                       input_mode='folded_float32',
                                       fuse_unit_input=False),
    }
    logits = {}
    for B in (1, 8, 16, 32, 64):
        raw = np.random.RandomState(0).rand(B, 224, 224, 3).astype(np.float32)
        x = jnp.asarray(fold4_images(raw))
        for name, eng in engines.items():
            logits[name] = np.asarray(eng(x))
            t = time_per_iter(eng, x)
            out[f'{name}_b{B}_ms'] = round(t * 1e3, 4)
            print(f'{name:8s} b{B:2d}: {t*1e3:8.4f} ms ({B/t:7.0f} img/s)',
                  flush=True)
        assert np.array_equal(logits['fused'], logits['unfused']), B
    out['bit_identical'] = True
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'residual_fusion_b8_b64.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

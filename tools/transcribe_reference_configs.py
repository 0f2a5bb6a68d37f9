"""Transcribe published bit-allocation tables from the reference registry.

The mixed-precision and uniform per-layer bit tables in
/root/reference/bit_config.py:1-4204 are published configuration *data*
(HAWQ-V3 paper artifacts); this tool copies the mobilenetv2_w1 / inceptionv3
uniform8/uniform4 dicts into our JSON config format
(hawq_tpu/configs/data/*.json), dropping the (bit, 'hook') tuple decoration
— forward hooks are replaced by flax `sow` intermediates (nn/layers.py).

Run from the repo root:  python tools/transcribe_reference_configs.py
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, '/root/reference')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TARGETS = ['mobilenetv2_w1_uniform8', 'mobilenetv2_w1_uniform4',
           'inceptionv3_uniform8', 'inceptionv3_uniform4']


def main():
    import bit_config as reference_registry
    from hawq_tpu.configs.bit_config import QuantSettings, _DATA_DIR

    for name in TARGETS:
        src = reference_registry.bit_config_dict[f'bit_config_{name}']
        table = {}
        for key, val in src.items():
            bits = val[0] if isinstance(val, tuple) else val
            table[key] = int(bits)
        doc = {'name': name,
               'settings': dataclasses.asdict(QuantSettings()),
               'table': table}
        path = os.path.join(_DATA_DIR, name + '.json')
        with open(path, 'w') as f:
            json.dump(doc, f, indent=1, sort_keys=True)
        print(f'wrote {path} ({len(table)} keys)')


if __name__ == '__main__':
    main()

"""Regenerate the published mixed-precision configs from the reference's
measured ILP inputs and report per-layer agreement (SURVEY §7 stage 6).

Writes docs/ilp_validation.md.  Run: python examples/ilp_validation.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hawq_tpu.configs.bit_config import get_bit_config
from hawq_tpu.sensitivity.ilp import (allocate_bits, published_ilp_inputs)

MODES = {'modelsize': 'model_size', 'bops': 'bops', 'latency': 'latency'}
FRACS = (0.25, 0.5, 0.75)


def main():
    lines = [
        '# ILP allocator validation against the published configs',
        '',
        'The allocator (hawq_tpu/sensitivity/ilp.py, scipy MILP) is run on',
        'the reference\'s own measured inputs (ILP.ipynb cells 4/17:',
        'Hutchinson traces, ||W-Q(W)||^2, params, BOPS, T4 latency LUT —',
        'shipped as configs/data/ilp_inputs_*.json) and its per-conv bit',
        'choices are compared with the published mixed tables',
        '(configs/data/<arch>_<mode>_<frac>.json = reference bit_config.py).',
        '',
        '| config | agree / convs | mismatched layers |',
        '|---|---|---|',
    ]
    worst = 1.0
    for arch in ('resnet18', 'resnet50'):
        layers = published_ilp_inputs(arch)
        for mode_name, mode in MODES.items():
            for frac in FRACS:
                alloc = allocate_bits(layers, mode, frac)
                pub = get_bit_config(arch, f'{mode_name}_{frac}')
                agree, total, bad = 0, 0, []
                for lc in layers:
                    got = alloc.bits[lc.key]
                    want = pub.table.get(lc.key)
                    if want is None:
                        continue
                    total += 1
                    if got == int(want):
                        agree += 1
                    else:
                        bad.append(f'{lc.key}({got}≠{want})')
                frac_ok = agree / max(total, 1)
                worst = min(worst, frac_ok)
                lines.append(
                    f'| {arch} {mode_name} {frac} | {agree}/{total} | '
                    + (', '.join(bad[:6]) + (' …' if len(bad) > 6 else '')
                       if bad else '—') + ' |')
                print(f'{arch} {mode_name} {frac}: {agree}/{total}')
    lines += [
        '',
        'Residual mismatches (if any) are solver ties: layers whose swap',
        'leaves the objective within the resource budget at equal cost —',
        'GLPK (reference) and scipy HiGHS may break ties differently.',
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'docs', 'ilp_validation.md')
    with open(out, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print('wrote', out, 'worst agreement', worst)


if __name__ == '__main__':
    main()

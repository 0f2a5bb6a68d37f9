"""Measured A/B: stage1 in standard layout vs 2×2-folded "phase conv" layout.

VERDICT round-3 item 3 proposed extending the host fold *through stage1*:
run the stride-1 bottleneck units on a (H/2, W/2, 4C) layout, expressing
the 3×3 conv as bit-exact phase convolutions (the s2d MAC-reordering
argument), hoping the carrier tiles better at 4C channels than at H=56.

This probe times the two dataflows on synthetic integers at stage1's exact
shapes (3 bottleneck units, C=256 carrier / 64 mid, 56² unfolded, int16
carrier + int8 unit inputs, fused requant-add epilogues — the production
wiring of inference/engine.py):

  std    (N, 56, 56, 256):   1×1 → 3×3 → 1×1, dual-requant add
  folded (N, 28, 28, 1024):  grouped 1×1 convs (fgc=4, identical MACs),
         3×3 phase conv as 4 per-output-phase 2×2 convs over all input
         phases (the minimal-tap formulation: 16/9 ≈ 1.78× the MACs of
         the unfolded 3×3 — phase pairs use 2×2 tap subsets, and XLA
         cannot skip structural zeros), elementwise in-layout.

The numerics here are shape-faithful, not bit-exact — the probe decides
whether the folded dataflow can WIN on time; only a win would justify the
bit-exact engine integration.  Accounting argument it tests: bytes moved
are identical in both layouts (H²C invariant), conv2's MACs inflate 1.78×,
and the std stage already runs at ~85% of its HBM bound at b8
(docs/perf_tpu.md) — so the fold can only win if the folded layout's
tiling recovers more than the extra MACs cost.

Writes benchmarks/stage1_fold_probe.json.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(batch):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    C, M, H = 256, 64, 56
    Hq = H // 2
    mult = jnp.float32(1e-4)

    def conv(x, w, stride=1, pad='VALID', fgc=1):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
        return lax.conv_general_dilated(
            x, w, (stride, stride), pad, dimension_numbers=dn,
            feature_group_count=fgc, preferred_element_type=jnp.int32)

    def w8(*shape):
        return jnp.asarray(rng.randint(-127, 128, shape).astype(np.int8))

    def requant8(acc):
        return jnp.clip(jnp.floor(acc.astype(jnp.float32) * mult + 0.5),
                        -128, 127).astype(jnp.int8)

    def requant16_add(acc, carrier):
        s = (jnp.floor(acc.astype(jnp.float32) * mult + 0.5)
             + jnp.floor(carrier.astype(jnp.float32) * 0.25 + 0.5))
        s = jnp.clip(jnp.maximum(s, 0), 0, 32767)
        return s.astype(jnp.int16), requant8(s * 64.0)

    # ---- standard layout -------------------------------------------------
    ws1 = [w8(1, 1, C, M) for _ in range(3)]
    ws2 = [w8(3, 3, M, M) for _ in range(3)]
    ws3 = [w8(1, 1, M, C) for _ in range(3)]

    def stage_std(carrier16, xa8):
        c, xa = carrier16, xa8
        for u in range(3):
            h = requant8(conv(xa, ws1[u]))
            h = requant8(conv(h, ws2[u], pad=((1, 1), (1, 1))))
            acc = conv(h, ws3[u])
            c, xa = requant16_add(acc, c)
        return c, xa

    # ---- folded layout ---------------------------------------------------
    # channels ordered (phase, C): 4 groups of C
    wf1 = [w8(1, 1, C, 4 * M) for _ in range(3)]       # fgc=4: per-group C→M
    # per-output-phase 2×2 conv over all 4 input phases (4M channels)
    wf2 = [[w8(2, 2, 4 * M, M) for _ in range(4)] for _ in range(3)]
    wf3 = [w8(1, 1, M, 4 * C) for _ in range(3)]       # fgc=4: per-group M→C

    def stage_folded(carrier16, xa8):
        c, xa = carrier16, xa8                          # (N, 28, 28, 4C)
        for u in range(3):
            h = requant8(conv(xa, wf1[u], fgc=4))       # (N,28,28,4M)
            # phase conv: each output phase from a 2×2 window over all
            # input phases; pad to keep 28×28
            hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))
            phases = [requant8(conv(hp[:, dy:dy + Hq + 1, dx:dx + Hq + 1, :],
                                    wf2[u][p]))
                      for p, (dy, dx) in enumerate(
                          [(0, 0), (0, 1), (1, 0), (1, 1)])]
            h = jnp.concatenate(phases, axis=-1)        # (N,28,28,4M)
            acc = conv(h, wf3[u], fgc=4)                # (N,28,28,4C)
            c, xa = requant16_add(acc, c)
        return c, xa

    x_std = (jnp.asarray(rng.randint(0, 32768, (batch, H, H, C))
                         .astype(np.int16)),
             jnp.asarray(rng.randint(-128, 128, (batch, H, H, C))
                         .astype(np.int8)))
    x_fold = (jnp.asarray(rng.randint(0, 32768, (batch, Hq, Hq, 4 * C))
                          .astype(np.int16)),
              jnp.asarray(rng.randint(-128, 128, (batch, Hq, Hq, 4 * C))
                          .astype(np.int8)))
    return (jax.jit(stage_std), x_std), (jax.jit(stage_folded), x_fold)


def main():
    import jax.numpy as jnp
    from bench import time_per_iter

    out = {}
    for batch in (8, 64):
        (f_std, x_std), (f_fold, x_fold) = build(batch)

        def wrap(f, args):
            def g(c):
                c2, xa2 = f(c, args[1])
                return (c2.astype(jnp.float32).sum()
                        + xa2.astype(jnp.float32).sum())
            return g, args[0]

        g1, a1 = wrap(f_std, x_std)
        g2, a2 = wrap(f_fold, x_fold)
        import jax
        t_std = time_per_iter(jax.jit(g1), a1)
        t_fold = time_per_iter(jax.jit(g2), a2)
        out[f'b{batch}'] = {'std_ms': t_std * 1e3, 'folded_ms': t_fold * 1e3,
                            'ratio': t_fold / t_std}
        print(f'b{batch}: std {t_std*1e3:.3f} ms   folded {t_fold*1e3:.3f} '
              f'ms   ratio {t_fold/t_std:.2f}', flush=True)

    out['note'] = ('stage1-shaped 3-unit chain, synthetic ints, one v5e. '
                   'folded = 2x2 fold through stage1 (grouped 1x1 + 4-phase '
                   '2x2 convs, 1.78x conv2 MACs, identical bytes).')
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'stage1_fold_probe.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path)


if __name__ == '__main__':
    main()

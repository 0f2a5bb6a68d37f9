"""Hutchinson layer-wise Hessian-trace estimation.

The reference consumes pre-computed Hessian traces as pasted constants
(/root/reference/ILP.ipynb cell 4: "Hutchinson_trace ... already normalized,
Trace/#params") produced offline by PyHessian.  Here the estimator is a real
component: for Rademacher probes v ~ {-1,+1}^d,

    E[v_l · (Hv)_l] = trace(H_{ll})

so a single full-pytree Hessian-vector product yields unbiased per-layer
trace estimates for *all* layers simultaneously (cross-block terms vanish in
expectation).  Hv is computed reverse-over-reverse (grad of vdot-of-grad,
see :func:`hvp` — the STE custom_vjp quantizers rule out jvp-of-grad);
both passes are fully jittable and TPU-friendly.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rademacher_like(rng: jax.Array, params) -> Tuple[jax.Array, object]:
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(rng, len(leaves) + 1)
    probes = [
        (jax.random.bernoulli(r, 0.5, leaf.shape).astype(leaf.dtype) * 2 - 1)
        for r, leaf in zip(rngs[1:], leaves)
    ]
    return rngs[0], jax.tree.unflatten(treedef, probes)


def hvp(loss_fn: Callable, params, v):
    """Hessian-vector product via reverse-over-reverse.

    Forward-over-reverse (jvp of grad) is the textbook HVP, but the
    framework's STE quantizers are custom_vjp functions, which JAX cannot
    jvp; grad-of-vdot-of-grad differentiates through their (traceable)
    backward rules instead and works for the full QAT graph.
    """
    def gdot(p):
        g = jax.grad(loss_fn)(p)
        return sum(jnp.vdot(a, b) for a, b in
                   zip(jax.tree.leaves(g), jax.tree.leaves(v)))

    return jax.grad(gdot)(params)


def hutchinson_layer_traces(loss_fn: Callable, params,
                            n_probes: int = 8,
                            rng: jax.Array | None = None,
                            normalize: bool = True) -> Dict[str, float]:
    """Per-layer Hessian traces of ``loss_fn(params)``.

    Returns {flat_layer_path: trace or trace/#params}.  ``loss_fn`` should
    close over a fixed calibration batch (the HAWQ-V2 protocol).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)

    @jax.jit
    def one_probe(rng):
        rng, v = _rademacher_like(rng, params)
        hv = hvp(loss_fn, params, v)
        prods = jax.tree.map(lambda a, b: jnp.sum(a * b), v, hv)
        return rng, prods

    acc = None
    for _ in range(n_probes):
        rng, prods = one_probe(rng)
        acc = prods if acc is None else jax.tree.map(jnp.add, acc, prods)

    flat = _flatten_with_paths(acc)
    sizes = _flatten_with_paths(jax.tree.map(lambda x: x.size, params))
    out = {}
    for key, total in flat.items():
        t = float(total) / n_probes
        if normalize:
            t /= float(sizes[key])
        out[key] = t
    return out


def conv_layer_traces(traces: Mapping[str, float],
                      kernel_suffix: str = 'kernel') -> Dict[str, float]:
    """Keep only conv/linear kernel entries, keyed by their module path."""
    out = {}
    for key, t in traces.items():
        parts = key.split('/')
        if parts[-1] == kernel_suffix:
            out['/'.join(parts[:-1])] = t
    return out


def quantization_perturbation(weight: np.ndarray, bits: int,
                              per_channel: bool = True) -> float:
    """‖W − Q(W)‖² for symmetric quantization at the given bits — the ΔW²
    arrays of ILP.ipynb cell 4, computed from real weights."""
    w = np.asarray(weight, np.float64)
    flat = w.reshape(-1, w.shape[-1]) if (per_channel and w.ndim > 1) \
        else w.reshape(-1, 1)
    n = 2 ** (bits - 1) - 1
    scale = np.maximum(np.maximum(np.abs(flat.min(0)), np.abs(flat.max(0))),
                       1e-8) / n
    q = np.clip(np.floor(flat / scale + 0.5), -n - 1, n) * scale
    return float(np.sum((flat - q) ** 2))


def _flatten_with_paths(tree) -> Dict[str, object]:
    out = {}

    def rec(prefix, node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                rec(f'{prefix}/{k}' if prefix else str(k), v)
        else:
            out[prefix] = node

    rec('', tree)
    return out

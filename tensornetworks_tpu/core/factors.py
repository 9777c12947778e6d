"""Factored (CPT-level) Bayesian-network evaluation, jittable.

The dense ``joint_table`` path (bayes_net.py) enumerates all 2^N assignments
— exact but capped near N ≈ 22 by host float64 memory. This module compiles
the network once into padded parent-index / CPT arrays so ``log p(v)`` of a
*batch of assignments* is a handful of small gathers inside jit: O(N) per
assignment, no 2^N anywhere. This is what lets the sampled KSD engine
(engines/sampled.py) scale past exact enumeration.

No reference counterpart: ``bayesian_network.py:111-146`` walks Python dicts
per assignment; here the same chain rule is data — three arrays — and the
evaluation is a vectorized gather program.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .bayes_net import BayesianNetwork

# Zero CPT entries become exp(LOG_FLOOR); sums of N of these stay finite, so
# impossible assignments read as log p ≈ -700·N rather than NaN-producing -inf.
LOG_FLOOR = 1e-300


def compile_factors(bn: BayesianNetwork):
    """Compile the network into dense padded arrays.

    Returns ``(parent_idx, parent_weight, log_cpt)``:

    - ``parent_idx``  (N, P) int32 — node indices of each node's parents,
      MSB-first, padded with 0 (P = max parent count, ≥ 1);
    - ``parent_weight`` (N, P) int32 — ``2^(P-1-j)`` for real parent slots,
      0 for padding, so ``(assign[parents] * weight).sum()`` reproduces each
      node's MSB-first CPT row index;
    - ``log_cpt`` (N, 2^P, 2) float — ``log p(v_i = b | parents = row)``,
      rows tiled so padded parent bits are ignored.
    """
    N = bn.num_nodes
    P = max(1, max(len(bn.parents[v]) for v in bn.nodes))
    parent_idx = np.zeros((N, P), dtype=np.int32)
    parent_weight = np.zeros((N, P), dtype=np.int32)
    log_cpt = np.zeros((N, 2**P, 2), dtype=np.float64)
    for i, name in enumerate(bn.nodes):
        ps = [bn.node_to_index[q] for q in bn.parents[name]]
        k = len(ps)
        for j, pp in enumerate(ps):
            parent_idx[i, j] = pp
            parent_weight[i, j] = 1 << (P - 1 - j)
        table = bn._cpt_arrays[name]  # (2^k, 2)
        # Real parents hold the top k bits of the padded row index; tiling
        # over the 2^(P-k) padding bits makes them don't-cares.
        expanded = np.repeat(table, 2 ** (P - k), axis=0)
        log_cpt[i] = np.log(np.clip(expanded, LOG_FLOOR, None))
    return parent_idx, parent_weight, log_cpt


def make_log_joint_fn(bn: BayesianNetwork, dtype=jnp.float32) -> Callable:
    """Jittable ``log p(v)`` over batches of full assignments.

    The returned function maps ``assign`` of shape (..., N) with 0/1 entries
    to ``log p`` of shape (...,), in O(N) gathers — no 2^N table.
    """
    parent_idx, parent_weight, log_cpt = compile_factors(bn)
    pi = jnp.asarray(parent_idx)
    pw = jnp.asarray(parent_weight)
    lc = jnp.asarray(log_cpt, dtype=dtype)
    N = bn.num_nodes
    nodes = jnp.arange(N)

    def log_joint(assign: jnp.ndarray) -> jnp.ndarray:
        a = assign.astype(jnp.int32)
        vals = a[..., pi]                       # (..., N, P)
        rows = (vals * pw).sum(axis=-1)         # (..., N)
        terms = lc[nodes, rows, a]              # (..., N)
        return terms.sum(axis=-1)

    return log_joint


def make_latent_log_joint_fn(bn: BayesianNetwork,
                             latent_names: Sequence[str],
                             observed: Dict[str, int],
                             dtype=jnp.float32) -> Callable:
    """Jittable ``log p(x, z)`` as a function of latent bits only.

    ``z`` has shape (..., n) ordered as ``latent_names`` (MSB-first, the same
    convention as ``conditional_joint_table``); observed values are baked in.
    Nodes in neither list are not allowed (they would need marginalizing).
    """
    names = set(latent_names) | set(observed)
    missing = [v for v in bn.nodes if v not in names]
    if missing:
        raise ValueError(
            f"make_latent_log_joint_fn needs every node latent or observed; "
            f"unassigned: {missing}")
    log_joint = make_log_joint_fn(bn, dtype=dtype)
    N = bn.num_nodes
    template = np.zeros(N, dtype=np.int32)
    for v, b in observed.items():
        template[bn.node_to_index[v]] = int(b)
    tpl = jnp.asarray(template)
    lat_pos = jnp.asarray([bn.node_to_index[v] for v in latent_names],
                          dtype=jnp.int32)

    def log_joint_latent(z: jnp.ndarray) -> jnp.ndarray:
        z = z.astype(jnp.int32)
        batch = z.shape[:-1]
        assign = jnp.broadcast_to(tpl, batch + (N,))
        assign = assign.at[..., lat_pos].set(z)
        return log_joint(assign)

    return log_joint_latent

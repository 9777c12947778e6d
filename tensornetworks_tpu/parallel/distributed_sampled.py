"""Distributed two-stage measurement sampling on a state-sharded register.

The sampled-KSD engine (engines/sampled.py) is the n-beyond-enumeration
path: no 2^n Stein structure exists, but the Born machine's probability
vector itself is still 2^n — at n ≳ 26 THAT becomes the single-chip wall.
This module shards the sampling side of the estimator over the mesh's
``state`` axis so the whole engine composes with the distributed ansatz
executor (``parallel/distributed_ansatz.py``), giving per-device memory
``2^n / D`` for every large buffer (statevector, probabilities) while the
estimator's per-sample structures (bits, scores, the (M, M) Gram) stay
replicated — they are O(M·n + M²), independent of 2^n.

Exact-equivalence contract (tested on the 8-virtual-device CPU mesh):
:func:`make_distributed_two_stage_sampler` draws bit-identical shots to the
single-device ``sim.sampling.sample_indices_2d`` given the same key — stage 1
samples the row (high/global bits) from the all-gathered row-marginal CDF
(an (R,) ≈ 2^{n/2} collective, never 2^n); stage 2 masks each shot to its
owning shard, ``psum``-combines the gathered rows, and samples the column
locally. The gathered raw rows stay differentiable, so ``q`` at the shots
backpropagates through the psum into the owning shard and on through the
sharded circuit (shard_map AD transposes the psum/mask pair to a local
scatter).

No reference counterpart: ``sozoluffy/TensorNetworks`` is single-process
Python end to end (SURVEY.md §2 parallelism inventory).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .mesh import STATE_AXIS
from .shard_state import _num_global_bits


def make_distributed_two_stage_sampler(mesh: Mesh, num_vars: int,
                                       num_samples: int, eps: float = 1e-10):
    """Build ``sample(P2, key) -> (flat_idx, q_at)`` for an (R, C) probability
    view row-sharded over the mesh's state axis.

    ``flat_idx`` (int32, replicated) and the differentiable ``q_at = P2[r, c]``
    reproduce ``sample_indices_2d`` + ``gather_2d`` (sim/sampling.py) exactly:
    same smoothing, same CDF normalization, same uniforms (the key is
    replicated, so every device draws the same shots). R must be divisible by
    the state-axis device count.
    """
    n, M = num_vars, num_samples
    rb = (n + 1) // 2
    R, C = 1 << rb, 1 << (n - rb)
    D = mesh.shape[STATE_AXIS]
    _num_global_bits(mesh)  # validates power-of-two axis
    if R % D != 0:
        raise ValueError(f"row extent {R} not divisible by {D} devices")
    Rl = R // D

    # check_vma=False: the outputs ARE replicated (everything flows through
    # all_gather/psum + identical per-device RNG draws) but the static
    # varying-mesh-axes inference cannot see through the all_gather; the
    # replication and the AD transpose are pinned by
    # tests/test_distributed_sampled.py instead.
    @partial(shard_map, mesh=mesh, in_specs=(P(STATE_AXIS, None), P()),
             out_specs=(P(), P()), check_vma=False)
    def sample(P2l, key):
        # Stage 1: rows from the global row-marginal CDF. The all_gather
        # payload is (R,) ≈ 2^{n/2} — tiny next to the 2^n state.
        ml = (P2l + eps).sum(axis=1)                       # (Rl,)
        m = jax.lax.all_gather(ml, STATE_AXIS).reshape(R)
        key_r, key_c = jax.random.split(key)
        cdf_r = jnp.cumsum(m)
        cdf_r = cdf_r / cdf_r[-1]
        u_r = jax.random.uniform(key_r, (M,), dtype=cdf_r.dtype)
        r = jnp.clip(jnp.searchsorted(cdf_r, u_r, side="right"), 0, R - 1)

        # Stage 2: the owning shard contributes each shot's raw row; psum
        # replicates the (M, C) row buffer (differentiable — the eps
        # smoothing is added only to the stop-gradient CDF below, matching
        # sample_indices_2d / gather_2d semantics).
        idx_dev = jax.lax.axis_index(STATE_AXIS)
        off = idx_dev * Rl
        local = (r >= off) & (r < off + Rl)
        rows_l = jnp.take(P2l, jnp.clip(r - off, 0, Rl - 1), axis=0)
        rows = jax.lax.psum(jnp.where(local[:, None], rows_l, 0.0),
                            STATE_AXIS)                     # (M, C)
        rows_s = jax.lax.stop_gradient(rows) + eps
        cdf_c = jnp.cumsum(rows_s, axis=1)
        cdf_c = cdf_c / cdf_c[:, -1:]
        u_c = jax.random.uniform(key_c, (M,), dtype=cdf_c.dtype)
        c = jnp.clip(
            jax.vmap(lambda cd, u: jnp.searchsorted(cd, u, side="right"))(
                cdf_c, u_c),
            0, C - 1)
        q_at = jnp.take_along_axis(rows, c[:, None], axis=1)[:, 0]
        return (r * C + c).astype(jnp.int32), q_at

    return sample

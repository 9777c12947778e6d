"""Manual SPMD statevector primitives: explicit ICI collectives via shard_map.

SURVEY.md §5.7: the workload's long axis is the ``2^n`` state vector; sharding
it puts the leading ``log2(D)`` "global" bits on the device axis. A gate on a
*local* bit needs no communication; a gate on a *global* bit pairs devices
whose indices differ in that bit — the amplitude exchange is one
``lax.ppermute`` over ICI (this workload's ring-attention analog). The
Kronecker base-kernel matvec mixes all global-bit combinations densely, so
its device-axis contraction uses one ``all_gather`` + local matmul.

These are the hand-written equivalents of what GSPMD derives automatically
from the sharding constraints in ``parallel/sharded.py``; they exist for
explicit control of the collective schedule and as the template for
multi-slice scaling.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.kron import apply_adjacent_block, kron_matvec, kron_power_np
from .mesh import STATE_AXIS


def _num_global_bits(mesh: Mesh) -> int:
    d = mesh.shape[STATE_AXIS]
    k = int(np.log2(d))
    if 2**k != d:
        raise ValueError(f"state axis size {d} must be a power of 2")
    return k


def distributed_apply_1q(mesh: Mesh, num_vars: int):
    """Build ``apply(state, U, qubit) -> state`` for a (2^n,) state sharded
    over the leading bits. ``qubit`` is static. Global-bit gates exchange
    partner shards with ``lax.ppermute``; local-bit gates contract in place.
    """
    k = _num_global_bits(mesh)
    d = 1 << k
    spec = P(STATE_AXIS)

    def apply_fn(state, U, qubit: int):
        if qubit >= k:
            @partial(shard_map, mesh=mesh, in_specs=(spec, P(None, None)),
                     out_specs=spec)
            def local_gate(x, u):
                return apply_adjacent_block(x, u, qubit - k, 1, num_vars - k)

            return local_gate(state, U)

        bit = 1 << (k - 1 - qubit)
        perm = [(i, i ^ bit) for i in range(d)]

        @partial(shard_map, mesh=mesh, in_specs=(spec, P(None, None)),
                 out_specs=spec)
        def global_gate(x, u):
            idx = jax.lax.axis_index(STATE_AXIS)
            other = jax.lax.ppermute(x, STATE_AXIS, perm)
            mine = (idx >> (k - 1 - qubit)) & 1
            diag = jnp.where(mine == 0, u[0, 0], u[1, 1])
            offd = jnp.where(mine == 0, u[0, 1], u[1, 0])
            return diag * x + offd * other

        return global_gate(state, U)

    return apply_fn


def distributed_apply_cz(mesh: Mesh, num_vars: int):
    """CZ between any two wires of a state-sharded register. Diagonal, so it
    needs NO communication even on global bits — the sign is computed from
    the device index and the local index."""
    k = _num_global_bits(mesh)
    spec = P(STATE_AXIS)
    local_n = num_vars - k

    def apply_fn(state, q1: int, q2: int):
        @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
        def body(x):
            idx = jax.lax.axis_index(STATE_AXIS)
            lidx = jnp.arange(x.shape[0], dtype=jnp.int32)

            def bit(q):
                if q < k:
                    return (idx >> (k - 1 - q)) & 1
                return (lidx >> (local_n - 1 - (q - k))) & 1

            sign = 1 - 2 * (bit(q1) * bit(q2))
            return x * sign.astype(x.dtype)

        return body(state)

    return apply_fn


def distributed_apply_cnot(mesh: Mesh, num_vars: int):
    """CNOT between any two wires of a state-sharded register.

    Four cases by where control c and target t live (SURVEY.md §7 hard part
    (d) — the sharded two-qubit gate):

    - both local: in-place slice permutation, no communication;
    - c global, t local: conditional local target-flip on the c=1 devices;
    - t global (c anywhere): ``lax.ppermute`` pairs devices differing in the
      target bit; each element keeps its own value unless its control bit is
      1, in which case it takes the partner's.
    """
    k = _num_global_bits(mesh)
    d = 1 << k
    spec = P(STATE_AXIS)
    local_n = num_vars - k

    def _local_flip(x, t_local: int):
        # Flip the target axis of the local chunk (a permutation copy).
        a = 1 << t_local
        b = 1 << (local_n - t_local - 1)
        v = x.reshape(a, 2, b)
        return jnp.stack([v[:, 1], v[:, 0]], axis=1).reshape(x.shape)

    def apply_fn(state, c: int, t: int):
        if c >= k and t >= k:
            # Both wires local: plain local CNOT.
            @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
            def both_local(x):
                from ..sim.statevector import apply_cnot

                nd = x.reshape((2,) * local_n)
                return apply_cnot(nd, c - k, t - k).reshape(x.shape)

            return both_local(state)

        if c < k and t >= k:
            @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
            def c_global(x):
                idx = jax.lax.axis_index(STATE_AXIS)
                mine = (idx >> (k - 1 - c)) & 1
                return jnp.where(mine == 1, _local_flip(x, t - k), x)

            return c_global(state)

        # Target is global: exchange partner shards along the target bit.
        bit = 1 << (k - 1 - t)
        perm = [(i, i ^ bit) for i in range(d)]

        @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
        def t_global(x):
            idx = jax.lax.axis_index(STATE_AXIS)
            other = jax.lax.ppermute(x, STATE_AXIS, perm)
            if c < k:
                ctrl = ((idx >> (k - 1 - c)) & 1).astype(jnp.int32)
                return jnp.where(ctrl == 1, other, x)
            lidx = jnp.arange(x.shape[0], dtype=jnp.int32)
            ctrl = (lidx >> (local_n - 1 - (c - k))) & 1
            return jnp.where(ctrl == 1, other, x)

        return t_global(state)

    return apply_fn


def distributed_kron_matvec(mesh: Mesh, A: np.ndarray, num_vars: int, group: int = 7):
    """Build ``matvec(v) = (A^{⊗n}) @ v`` for v (2^n,) sharded over the
    leading bits: local bits via grouped MXU matmuls, the k global bits via
    one ``all_gather`` + a per-device weighted reduction (the base kernel's
    device-axis mixing is dense, so gather-then-contract is the
    bandwidth-optimal collective)."""
    k = _num_global_bits(mesh)
    Mk = kron_power_np(A, k)  # (D, D) operator over the global bits
    spec = P(STATE_AXIS)
    local_vars = num_vars - k

    @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec)
    def matvec(x):
        if local_vars > 0:
            x = kron_matvec(x, A, local_vars, group=group)
        gathered = jax.lax.all_gather(x, STATE_AXIS)  # (D, local)
        idx = jax.lax.axis_index(STATE_AXIS)
        row = jnp.take(jnp.asarray(Mk, dtype=x.dtype), idx, axis=0)  # (D,)
        return jnp.tensordot(row, gathered, axes=(0, 0))

    return matvec

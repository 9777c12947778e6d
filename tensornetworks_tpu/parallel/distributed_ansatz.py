"""Fully distributed ansatz execution over a state-sharded register.

Composes the manual shard_map gate primitives (``shard_state``) into complete
reference circuits (``quantum_born_machine.py:57-128`` families): every gate
— Hadamard wall, fused rotations, CNOT chain/ring, CZ layers — runs SPMD on
the sharded ``(2^n,)`` state, with ``ppermute`` partner exchanges only for
gates touching the global (device-axis) bits and no communication for
diagonal gates. This is the n-beyond-single-chip-memory path: state memory
scales as ``2^n / D`` per device.

For single-chip execution prefer ``sim.blocked`` (fewer, larger fused ops);
this module trades per-gate granularity for distribution.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..sim.adjoint import primitive_ansatz_program
from ..sim.gates import rx, ry, rz, H
from .mesh import state_sharding
from .shard_state import (
    distributed_apply_1q,
    distributed_apply_cnot,
    distributed_apply_cz,
)

_ROT = {"x": rx, "y": ry, "z": rz}


def make_distributed_ansatz_probs(mesh: Mesh, num_wires: int, layers: int,
                                  ansatz_type: str, dtype=jnp.complex64,
                                  edges=None, conditioning: bool = False):
    """probs(params[, embed_angles]) with the statevector sharded over the
    mesh's state axis. Returns a function producing the (2^n,) distribution,
    itself sharded.

    ``ansatz_type='bn_structured'`` takes ``edges`` (DAG entangling map);
    ``conditioning=True`` adds an RY(embed_angles[q]) wall after the
    Hadamard wall (angle-embedding conditioning, matching
    ``QuantumBornMachine._embed_angles`` semantics) — the returned function
    then requires the second argument.
    """
    program = primitive_ansatz_program(num_wires, layers, ansatz_type,
                                       edges=edges)
    apply_1q = distributed_apply_1q(mesh, num_wires)
    apply_cnot = distributed_apply_cnot(mesh, num_wires)
    apply_cz = distributed_apply_cz(mesh, num_wires)
    sharding = state_sharding(mesh, 1)
    size = 1 << num_wires
    h_mat = jnp.asarray(H, dtype=dtype)

    def run(params: jnp.ndarray, embed_angles=None) -> jnp.ndarray:
        state = jnp.zeros((size,), dtype=dtype).at[0].set(1.0)
        state = jax.lax.with_sharding_constraint(state, sharding)
        first_rotation_seen = False
        for op in program:
            if op[0] == "h":
                state = apply_1q(state, h_mat, op[1])
            elif op[0] == "r":
                if conditioning and not first_rotation_seen:
                    # RY(x_q) embedding wall sits between the Hadamard wall
                    # and the first parameterized layer.
                    for q in range(num_wires):
                        state = apply_1q(state, ry(embed_angles[q]).astype(dtype), q)
                    first_rotation_seen = True
                _, q, axis, idx = op
                U = _ROT[axis](params[idx]).astype(dtype)
                state = apply_1q(state, U, q)
            elif op[0] == "cnot":
                state = apply_cnot(state, op[1], op[2])
            else:
                state = apply_cz(state, op[1], op[2])
        return jnp.real(state * jnp.conj(state))

    if conditioning:
        if not any(op[0] == "r" for op in program):
            raise ValueError("conditioning requires a parameterized ansatz")
        return run

    def probs_fn(params: jnp.ndarray) -> jnp.ndarray:
        return run(params)

    return probs_fn

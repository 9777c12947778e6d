"""Batched statevector engine: states as (2,)*n tensors, gates as axis
contractions, gradients via jax.grad end-to-end.

From-scratch TPU replacement for the reference's PennyLane ``default.qubit``
dependency (``quantum_born_machine.py:28``): no parameter-shift loops — the
whole circuit is one traced XLA program and ``jax.grad`` backpropagates
through the contractions (adjoint-state equivalent), eliminating the
``2·(3·L·n)`` extra circuit evaluations per step the reference pays
(``quantum_born_machine.py:58``, SURVEY.md §3.2).

Diagonal gates (CZ, RZ-like phases) use an elementwise broadcast fast path
instead of a contraction.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..ops.kron import apply_to_wires

DEFAULT_DTYPE = jnp.complex64


def zero_state(num_wires: int, dtype=DEFAULT_DTYPE) -> jnp.ndarray:
    """|0...0> as a (2,)*n tensor."""
    state = jnp.zeros((2,) * num_wires, dtype=dtype)
    return state.reshape(-1).at[0].set(1.0).reshape((2,) * num_wires)


def apply_gate(state: jnp.ndarray, U: jnp.ndarray, wires: Sequence[int]) -> jnp.ndarray:
    """Apply a k-wire unitary (2^k x 2^k) to the given wires."""
    return apply_to_wires(state, jnp.asarray(U, dtype=state.dtype), wires)


def apply_diagonal(state: jnp.ndarray, diag: jnp.ndarray, wires: Sequence[int]) -> jnp.ndarray:
    """Apply a diagonal k-wire gate via broadcast multiply (no contraction)."""
    n = state.ndim
    k = len(wires)
    d = jnp.asarray(diag, dtype=state.dtype).reshape((2,) * k)
    # Reorder diag axes to ascending wire order, then view with singleton
    # axes everywhere else so the multiply broadcasts into place.
    d = jnp.transpose(d, np.argsort(wires))
    view = d.reshape([2 if i in wires else 1 for i in range(n)])
    return state * view


def apply_cz(state: jnp.ndarray, w1: int, w2: int) -> jnp.ndarray:
    """CZ via its diagonal [1, 1, 1, -1]."""
    return apply_diagonal(state, jnp.array([1, 1, 1, -1]), [w1, w2])


def apply_cnot(state: jnp.ndarray, control: int, target: int) -> jnp.ndarray:
    """CNOT: roll the target axis within the control=1 slice (permutation,
    no arithmetic)."""
    idx = [slice(None)] * state.ndim
    idx[control] = 1
    flipped = state[tuple(idx)]
    flipped = jnp.flip(flipped, axis=target if target < control else target - 1)
    return state.at[tuple(idx)].set(flipped)


def probabilities(state: jnp.ndarray) -> jnp.ndarray:
    """|ψ|² as a flat (2^n,) real vector (matches qml.probs ordering)."""
    amp = state.reshape(-1)
    return jnp.real(amp * jnp.conj(amp))


def hadamard_wall(state: jnp.ndarray) -> jnp.ndarray:
    """H on every wire — one fused Kronecker application per wire."""
    from ..sim.gates import H

    for w in range(state.ndim):
        state = apply_gate(state, H, [w])
    return state

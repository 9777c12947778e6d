"""PQC ansätze matching the reference circuit families gate-for-gate.

Parity targets (``quantum_born_machine.py``):
- ``hardware_efficient`` (:57-87): Hadamard wall; per layer RX,RY,RZ on every
  qubit, nearest-neighbor CNOT chain, ring-closing CNOT(n-1, 0) when n > 2,
  and CZ(i, i+2) skip links on even layers when n > 2. 3·L·n params.
- ``all_to_all`` (:89-111): Hadamard wall; per layer RX,RY,RZ per qubit and
  CZ on all pairs. 3·L·n params.
- ``basic`` (:113-128): per layer RY,RZ per qubit, CNOT chain, ring wrap when
  n > 2. 2·L·n params. (No Hadamard wall.)

Parameter order matches the reference's sequential ``param_idx`` walk so
parameter vectors are interchangeable between the two implementations. The
three per-qubit rotations are fused into one 2x2 unitary before application
(same circuit unitary, one contraction instead of three).

``remat=True`` wraps each layer in ``jax.checkpoint``: backward-pass memory
drops from O(L·n·2^n) stored intermediates to one layer's worth, trading a
second forward of each layer — the standard large-n training configuration.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .gates import rot_zy, rot_zyx
from .statevector import (
    DEFAULT_DTYPE,
    apply_cnot,
    apply_cz,
    apply_gate,
    hadamard_wall,
    probabilities,
    zero_state,
)

ANSATZ_TYPES = ("hardware_efficient", "all_to_all", "basic")


def num_ansatz_params(num_wires: int, layers: int, ansatz_type: str) -> int:
    """Parity: ``quantum_born_machine.py:30-38``."""
    if ansatz_type in ("hardware_efficient", "all_to_all"):
        return layers * 3 * num_wires
    if ansatz_type == "basic":
        return layers * 2 * num_wires
    raise ValueError(f"Unknown ansatz_type {ansatz_type!r}; expected one of {ANSATZ_TYPES}")


def _rotation_layer_3(state, params, offset, n):
    for i in range(n):
        U = rot_zyx(params[offset + 3 * i], params[offset + 3 * i + 1], params[offset + 3 * i + 2])
        state = apply_gate(state, U, [i])
    return state


def _rotation_layer_2(state, params, offset, n):
    for i in range(n):
        U = rot_zy(params[offset + 2 * i], params[offset + 2 * i + 1])
        state = apply_gate(state, U, [i])
    return state


def _cnot_chain(state, n):
    for i in range(n - 1):
        state = apply_cnot(state, i, i + 1)
    if n > 2:
        state = apply_cnot(state, n - 1, 0)
    return state


def _maybe_remat(fn, remat):
    return jax.checkpoint(fn) if remat else fn


def hardware_efficient_state(params: jnp.ndarray, num_wires: int, layers: int,
                             dtype=None, remat: bool = False) -> jnp.ndarray:
    n = num_wires
    state = hadamard_wall(zero_state(n, dtype=dtype or DEFAULT_DTYPE))
    for layer in range(layers):
        def layer_fn(s, p, _layer=layer):
            s = _rotation_layer_3(s, p, 3 * n * _layer, n)
            if n > 1:
                s = _cnot_chain(s, n)
                if _layer % 2 == 0 and n > 2:
                    for i in range(0, n - 2, 2):
                        s = apply_cz(s, i, i + 2)
            return s

        state = _maybe_remat(layer_fn, remat)(state, params)
    return state


def all_to_all_state(params: jnp.ndarray, num_wires: int, layers: int,
                     dtype=None, remat: bool = False) -> jnp.ndarray:
    n = num_wires
    state = hadamard_wall(zero_state(n, dtype=dtype or DEFAULT_DTYPE))
    for layer in range(layers):
        def layer_fn(s, p, _layer=layer):
            s = _rotation_layer_3(s, p, 3 * n * _layer, n)
            if n > 1:
                for i in range(n):
                    for j in range(i + 1, n):
                        s = apply_cz(s, i, j)
            return s

        state = _maybe_remat(layer_fn, remat)(state, params)
    return state


def basic_state(params: jnp.ndarray, num_wires: int, layers: int,
                dtype=None, remat: bool = False) -> jnp.ndarray:
    n = num_wires
    state = zero_state(n, dtype=dtype or DEFAULT_DTYPE)
    for layer in range(layers):
        def layer_fn(s, p, _layer=layer):
            s = _rotation_layer_2(s, p, 2 * n * _layer, n)
            if n > 1:
                s = _cnot_chain(s, n)
            return s

        state = _maybe_remat(layer_fn, remat)(state, params)
    return state


_STATE_FNS = {
    "hardware_efficient": hardware_efficient_state,
    "all_to_all": all_to_all_state,
    "basic": basic_state,
}


def ansatz_state_fn(ansatz_type: str) -> Callable:
    if ansatz_type not in _STATE_FNS:
        raise ValueError(f"Unknown ansatz_type {ansatz_type!r}; expected one of {ANSATZ_TYPES}")
    return _STATE_FNS[ansatz_type]


def ansatz_probs(params: jnp.ndarray, num_wires: int, layers: int, ansatz_type: str,
                 dtype=None, remat: bool = False) -> jnp.ndarray:
    """Full analytic distribution |⟨z|ψ(θ)⟩|² over all 2^n outcomes.

    The reference's ``qml.probs(wires=range(n))`` with ``shots=None``
    (``quantum_born_machine.py:87``).
    """
    return probabilities(
        ansatz_state_fn(ansatz_type)(params, num_wires, layers, dtype=dtype, remat=remat)
    )

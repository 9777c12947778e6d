"""2D super-block statevector execution: the state as a constant-shape matrix.

For n ≤ ~18 qubits the state reshapes once into ``X ∈ C^(R×C)`` with
``R = 2^ceil(n/2)`` (qubits 0..rb-1 on rows) and ``C = 2^floor(n/2)``
(qubits rb..n-1 on columns). Every circuit element then becomes one of two
perfectly-tiled primitives on that FIXED shape:

- any operator on row qubits:  ``X ← M_row @ X``  (one MXU matmul);
- any operator on col qubits:  ``X ← X @ M_colᵀ``;
- the two cross-boundary CNOTs (chain boundary and ring wrap) via
  ``CNOT(c,t) = H_t · CZ(c,t) · H_t``: an H matmul on the target side, an
  iota-derived ±1 sign mask (CZ is diagonal), and the H matmul again;
- a layer's CZ gates: ONE combined (R, C) sign mask multiply.

No reshapes, no gathers, no tiny-axis layouts — a hardware-efficient layer is
~7 matmuls + 3 elementwise ops on (R, C). This is also exactly the op set
(dot + elementwise on fixed shapes) that the Mosaic TPU compiler accepts
inside Pallas kernels, making this formulation the fusion path forward.

Produces bit-identical distributions to ``sim.ansatz`` (tested). Rotation
matrices for all layers build in one batched pass like ``sim.blocked``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ansatz import ANSATZ_TYPES
from .blocked import _chain_gates, _cnot_map, _cz_pairs
from .gates import batched_kron, kron_fold, rot_zy_batched, rot_zyx_batched

MAX_2D_QUBITS = 18  # (R, C) rotation operators stay small (≤ 512²)


def _perm_matrix(gates: List[Tuple[int, int]], nbits: int) -> np.ndarray | None:
    """Permutation matrix for CNOTs (local wire indices) applied in order."""
    if not gates:
        return None
    size = 1 << nbits
    idx = np.arange(size, dtype=np.int64)
    fwd = idx.copy()
    for c, t in gates:
        fwd = _cnot_map(idx, nbits, c, t)[fwd]
    P = np.zeros((size, size), dtype=np.complex64)
    P[fwd, idx] = 1.0
    return P


def _kron_h(nbits: int, wire: int) -> np.ndarray:
    """I ⊗ ... ⊗ H(at wire) ⊗ ... ⊗ I over nbits wires."""
    H = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2.0)
    M = np.eye(1, dtype=np.complex64)
    for w in range(nbits):
        M = np.kron(M, H if w == wire else np.eye(2, dtype=np.complex64))
    return M


def _h_wall(nbits: int) -> np.ndarray:
    H = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2.0)
    M = np.eye(1, dtype=np.complex64)
    for _ in range(nbits):
        M = np.kron(M, H)
    return M


def _bit_vec(nbits: int, wire: int) -> jnp.ndarray:
    """Device {0,1} vector: bit ``wire`` (MSB-first) of each index."""
    idx = jax.lax.iota(jnp.int32, 1 << nbits)
    return ((idx >> (nbits - 1 - wire)) & 1).astype(jnp.float32)


def _cz_sign_mask(rb: int, cb: int, pairs: List[Tuple[int, int]]) -> jnp.ndarray | None:
    """(R, C) ±1 mask for a set of CZ gates, computed on device from iota."""
    if not pairs:
        return None
    sign = jnp.ones((1 << rb, 1 << cb), dtype=jnp.float32)
    for a, b in pairs:
        av = _bit_vec(rb, a)[:, None] if a < rb else _bit_vec(cb, a - rb)[None, :]
        bv = _bit_vec(rb, b)[:, None] if b < rb else _bit_vec(cb, b - rb)[None, :]
        sign = sign * (1.0 - 2.0 * av * bv)
    return sign


def make_blocked2d_state_fn(num_wires: int, layers: int, ansatz_type: str,
                            dtype=jnp.complex64, conditioning: bool = False):
    """state(params[, embed_angles]) -> (R, C) matrix (flatten row-major for
    the standard (2^n,) ordering)."""
    if ansatz_type not in ANSATZ_TYPES:
        raise ValueError(f"Unknown ansatz_type {ansatz_type!r}")
    n = num_wires
    if n < 2 or n > MAX_2D_QUBITS:
        raise ValueError(f"blocked2d supports 2 <= n <= {MAX_2D_QUBITS}, got {n}")
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    per_qubit = 3 if ansatz_type in ("hardware_efficient", "all_to_all") else 2
    has_chain = ansatz_type in ("hardware_efficient", "basic")
    chain = _chain_gates(n, ansatz_type) if has_chain else []
    row_chain = [(c, t) for c, t in chain if c < rb and t < rb]
    col_chain = [(c - rb, t - rb) for c, t in chain if c >= rb and t >= rb]
    boundary = [(c, t) for c, t in chain if (c < rb) != (t < rb) and not (c == n - 1 and t == 0)]
    ring = bool(chain) and n > 2  # CNOT(n-1, 0), always cross for n >= 3... unless cb == 0
    P_row = _perm_matrix(row_chain, rb)
    P_col = _perm_matrix(col_chain, cb)
    H_wall_row = _h_wall(rb) if ansatz_type in ("hardware_efficient", "all_to_all") else None
    H_wall_col = _h_wall(cb) if H_wall_row is not None else None
    # Boundary CNOT(rb-1, rb): H on target (first col bit) conjugating CZ.
    H_col0 = _kron_h(cb, 0)
    # Ring CNOT(n-1, 0): H on target (first row bit) conjugating CZ.
    H_row0 = _kron_h(rb, 0)
    cz_layer_pairs = [_cz_pairs(n, layer, ansatz_type) for layer in range(layers)]

    def rot_mats(params):
        angles = params.reshape(layers, n, per_qubit)
        if per_qubit == 3:
            U = rot_zyx_batched(angles[..., 0], angles[..., 1], angles[..., 2])
        else:
            U = rot_zy_batched(angles[..., 0], angles[..., 1])
        U = U.astype(dtype)

        def fold(lo, hi):
            return kron_fold([U[:, q] for q in range(lo, hi)])

        return fold(0, rb), fold(rb, n)  # (L, R, R), (L, C, C)

    def state_fn(params: jnp.ndarray, embed_angles=None) -> jnp.ndarray:
        X = jnp.zeros((R, C), dtype=dtype).at[0, 0].set(1.0)
        if H_wall_row is not None:
            X = jnp.asarray(H_wall_row, dtype=dtype) @ X
            X = X @ jnp.asarray(H_wall_col, dtype=dtype).T
        if conditioning:
            if embed_angles is None:
                raise ValueError("conditioning=True requires embed_angles")
            from .gates import ry_batched

            E = ry_batched(embed_angles.reshape(n)).astype(dtype)
            Mr = kron_fold([E[q] for q in range(rb)])
            Mc = kron_fold([E[q] for q in range(rb, n)])
            X = Mr @ X @ Mc.T
        M_rows, M_cols = rot_mats(params)
        Hc0 = jnp.asarray(H_col0, dtype=dtype)
        Hr0 = jnp.asarray(H_row0, dtype=dtype)
        Pr = jnp.asarray(P_row, dtype=dtype) if P_row is not None else None
        Pc = jnp.asarray(P_col, dtype=dtype) if P_col is not None else None
        for layer in range(layers):
            # Rotations (and fold the row-chain permutation in).
            Mr = M_rows[layer]
            if Pr is not None:
                Mr = Pr @ Mr
            X = Mr @ X
            X = X @ M_cols[layer].T
            if has_chain:
                # Boundary CNOT(rb-1, rb) = H_col0 · CZ · H_col0.
                if boundary:
                    X = X @ Hc0  # H is symmetric
                    X = X * _cz_sign_mask(rb, cb, boundary)
                    X = X @ Hc0
                if Pc is not None:
                    X = X @ Pc.T
                # Ring CNOT(n-1, 0) = H_row0 · CZ(n-1, 0) · H_row0.
                if ring:
                    X = Hr0 @ X
                    X = X * _cz_sign_mask(rb, cb, [(n - 1, 0)])
                    X = Hr0 @ X
            mask = _cz_sign_mask(rb, cb, cz_layer_pairs[layer])
            if mask is not None:
                X = X * mask
        return X

    return state_fn


def make_blocked2d_probs_fn(num_wires: int, layers: int, ansatz_type: str,
                            dtype=jnp.complex64, conditioning: bool = False):
    state_fn = make_blocked2d_state_fn(num_wires, layers, ansatz_type, dtype,
                                       conditioning)

    if conditioning:
        def probs_fn(params, embed_angles):
            X = state_fn(params, embed_angles)
            return jnp.real(X * jnp.conj(X)).reshape(-1)
    else:
        def probs_fn(params):
            X = state_fn(params)
            return jnp.real(X * jnp.conj(X)).reshape(-1)

    return probs_fn

"""Problem-structured (DAG-aware) ansatz: entanglers follow the Bayesian
network's edges instead of a hardware chain.

Beyond-reference capability, motivated by the 16-qubit trainability study
(RESULTS.md "Objective quality at scale"): hardware-efficient circuits stall
at TVD ≈ 0.8 under cold-start KSD at 16 qubits, while this ansatz — same
parameter count, entangling map = the latent sub-DAG of the target network —
reaches **TVD 0.16 from a cold start** (and 0.04 under a direct fit),
because its correlation structure matches the posterior's.

Circuit (per layer ℓ): RZ·RY·RX on every qubit, then along every DAG edge
(parent, child) in topological order: CNOT(parent → child) on even layers,
CZ(parent, child) on odd layers. Parameter count 3·L·n, identical to
``hardware_efficient``.

TPU-native executor: the 2D super-block form (state as a (2^⌈n/2⌉, 2^⌊n/2⌋)
matrix). Rotations fold into one left + one right Kronecker matmul per
layer; CNOT(c, t) = H_t · CZ(c, t) · H_t (two single-qubit-H matmuls and a
±1 mask); CZ is a precomputed ±1 mask — matmuls and elementwise only. The
generic per-gate executor cannot run on this backend at scale (rank-n
complex tensors crash the TPU worker — WORKLOG.md), and the blocked
executor's chain folding assumes nearest-neighbor wiring; this formulation
handles arbitrary topology with native-safe ops.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from .gates import rot_zyx_batched

_H2 = np.array([[1.0, 1.0], [1.0, -1.0]]) / np.sqrt(2.0)


def latent_edges(bn, latent_names: Sequence[str]) -> List[Tuple[int, int]]:
    """(parent_qubit, child_qubit) pairs for every BN edge whose endpoints
    are both latent, with qubit index = position in ``latent_names``."""
    pos = {v: i for i, v in enumerate(latent_names)}
    edges = []
    for v in latent_names:
        for p in bn.parents[v]:
            if p in pos:
                edges.append((pos[p], pos[v]))
    return edges


def _h_at(k: int, nb: int) -> np.ndarray:
    M = np.array([[1.0]])
    for i in range(nb):
        M = np.kron(M, _H2 if i == k else np.eye(2))
    return M


def _cz_mask(c: int, t: int, rb: int, cb: int) -> np.ndarray:
    R, C = 1 << rb, 1 << cb
    rows = np.arange(R)[:, None]
    cols = np.arange(C)[None, :]

    def bit(q):
        if q < rb:
            return (rows >> (rb - 1 - q)) & 1
        return (cols >> (cb - 1 - (q - rb))) & 1

    return (1.0 - 2.0 * (bit(c) * bit(t))).astype(np.float32)


def make_structured_probs_fn(num_wires: int, layers: int,
                             edges: Sequence[Tuple[int, int]],
                             dtype=jnp.complex64):
    """probs(params) for the DAG-structured ansatz; params shape (3·L·n,)."""
    n = num_wires
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    edges = [(int(c), int(t)) for c, t in edges]
    for c, t in edges:
        if not (0 <= c < n and 0 <= t < n) or c == t:
            raise ValueError(f"bad edge ({c}, {t}) for {n} wires")
    # Host numpy constants: complex64 DEVICE closures cannot be embedded as
    # HLO constants on this backend (fetch is UNIMPLEMENTED — WORKLOG.md).
    np_c = np.complex64
    H_row = [_h_at(k, rb).astype(np_c) for k in range(rb)]
    H_col = [_h_at(k, cb).astype(np_c) for k in range(cb)]

    # Exact-identity rewrites (tests compare against the edge-by-edge
    # per-gate executor):
    # - consecutive same-target CNOT runs merge: H_t CZ₁ H_t · H_t CZ₂ H_t
    #   = H_t (CZ₁CZ₂) H_t, since H_t H_t = I and CZ masks are diagonal;
    #   ``latent_edges`` emits each child's parents consecutively, so this
    #   collapses one H pair + one mask per child instead of per edge.
    # - odd-layer CZs all commute (diagonal): ONE precombined ±1 mask.
    groups: List[Tuple[int, np.ndarray]] = []
    for c, t in edges:
        m = _cz_mask(c, t, rb, cb)
        if groups and groups[-1][0] == t:
            groups[-1] = (t, groups[-1][1] * m)
        else:
            groups.append((t, m))
    groups = [(t, m.astype(np_c)) for t, m in groups]
    odd_mask = np.ones((R, C), dtype=np_c)
    for _, m in groups:
        odd_mask = odd_mask * m
    has_edges = bool(edges)

    def apply_h(X, t):
        if t < rb:
            return H_row[t] @ X
        return X @ H_col[t - rb].T

    def probs(params: jnp.ndarray) -> jnp.ndarray:
        a = params.reshape(layers, n, 3)
        U = rot_zyx_batched(a[..., 0], a[..., 1], a[..., 2]).astype(dtype)

        def fold(l, lo, hi):
            M = U[l, lo]
            for q in range(lo + 1, hi):
                M = jnp.kron(M, U[l, q])
            return M

        X = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)), dtype=dtype)
        for l in range(layers):
            X = fold(l, 0, rb) @ X @ fold(l, rb, n).T
            if not has_edges:
                continue
            if l % 2 == 0:
                for t, m in groups:
                    X = apply_h(X, t)
                    X = X * m
                    X = apply_h(X, t)
            else:
                X = X * odd_mask
        flat = X.reshape(-1)
        return jnp.real(flat * jnp.conj(flat))

    return probs

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
``hardware_efficient``. Optional angle-embedding conditioning (an RY(x_q)
wall after the Hadamard wall) makes the DAG ansatz usable for amortized
inference.

Two executors:

- ``make_structured_probs_fn_flat`` — the production TPU path, built on the
  blocked executor's flat-state machinery (see its docstring for the layout
  rules that make arbitrary-topology CNOTs lane-friendly).
- ``make_structured_probs_fn`` — the 2D super-block flip-select form. Exact
  and the CPU/test reference, but its per-edge reshape+axis-reverse flips
  relayout-crawl on the TPU backend for low-order bits (measured 59
  ms/forward at 20 qubits vs 17 ms for the flat executor).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.kron import apply_adjacent_block
from .gates import batched_kron, rot_zyx_batched, ry_batched

_SX = np.array([[0.0, 1.0], [1.0, 0.0]], dtype=np.complex64)


def make_structured_probs_fn_flat(num_wires: int, layers: int,
                                  edges: Sequence[Tuple[int, int]],
                                  block: int = 8, dtype=jnp.complex64,
                                  conditioning: bool = False):
    """Flat-state (blocked-executor) evaluation of the DAG-structured ansatz
    — the production TPU path.

    The 2D flip-select executor below is exact but its per-edge
    reshape+axis-reverse flips relayout-crawl on the TPU for low-order bits
    (measured 59 ms/forward and ~8 min compiles at 20 qubits). Here every
    circuit element rides the layout machinery the blocked executor already
    proved out on this backend:

    - rotations: per-block Kronecker folds, one (2^b, 2^b) matmul per block
      per layer (same as ``sim.blocked``);
    - even-layer CNOT(c, t): a 2x2 σx contraction on qubit t's axis
      (``apply_adjacent_block`` — lane-friendly at every position, including
      the trailing-extent special cases) gated by an iota-derived control
      mask: ``state + m_c ∘ (σx_t state − state)``;
    - odd-layer CZs: one iota-derived ±1 diagonal for the whole layer.

    Gate order matches ``make_structured_probs_fn`` exactly (edges applied
    in sequence), so the two executors agree amplitude-for-amplitude
    (tests/test_structured_ansatz.py).
    """
    from .blocked import _blocks, _cz_diag_device

    n = num_wires
    size = 1 << n
    edges = [(int(c), int(t)) for c, t in edges]
    for c, t in edges:
        if not (0 <= c < n and 0 <= t < n) or c == t:
            raise ValueError(f"bad edge ({c}, {t}) for {n} wires")
    has_edges = bool(edges)
    blocks = _blocks(n, block)
    # numpy, NOT factory-scope device arrays: embedding a live complex64
    # device buffer as a jit constant needs a D2H fetch that the axon
    # backend rejects (UNIMPLEMENTED); numpy constants embed host-side.
    npdt = np.dtype(dtype)
    # Trailing-qubit gates: a bare 2x2 contraction at qubit t >= n-tg puts a
    # sub-128 extent on the lane axis (64x padding). Embed σx into a
    # (2^tg, 2^tg) operator on the ALIGNED trailing block instead — the
    # lane-axis right-multiply path of apply_adjacent_block then runs with
    # full lanes. (This was a 5x whole-forward regression before the fix.)
    tg = min(7, n)
    tstart = n - tg

    def _embed_trailing(M2: np.ndarray, pos: int) -> np.ndarray:
        out = np.eye(1, dtype=npdt)
        for q in range(tg):
            out = np.kron(out, M2 if q == pos else np.eye(2))
        return out.astype(npdt)

    sx_embed = {t: _embed_trailing(_SX, t - tstart)
                for t in range(tstart, n)}

    def _local_cnot(c: int, t: int) -> np.ndarray:
        """(2^tg, 2^tg) permutation of CNOT(c, t) inside the trailing block."""
        idx = np.arange(1 << tg, dtype=np.int64)
        cb = 1 << (tg - 1 - (c - tstart))
        tb = 1 << (tg - 1 - (t - tstart))
        fwd = idx ^ (((idx & cb) >> int(np.log2(cb))) * tb)
        P = np.zeros((1 << tg, 1 << tg), dtype=npdt)
        P[fwd, idx] = 1.0
        return P

    # Per-edge plan for even layers, preserving edge order: runs of edges
    # fully inside the trailing block compose into ONE permutation matmul;
    # every other edge is one masked X-gate application.
    plan = []  # ("perm", matrix) | ("cx", c, t, sx_matrix)
    for c, t in edges:
        if c >= tstart and t >= tstart:
            P = _local_cnot(c, t)
            if plan and plan[-1][0] == "perm":
                plan[-1] = ("perm", P @ plan[-1][1])
            else:
                plan.append(("perm", P))
        else:
            M = sx_embed[t] if t >= tstart else _SX.astype(npdt)
            plan.append(("cx", c, t, M))

    def control_mask(c):
        b = (jax.lax.iota(jnp.int32, size) >> (n - 1 - c)) & 1
        return b.astype(jnp.float32)

    def block_matrices(params):
        angles = params.reshape(layers, n, 3)
        U = rot_zyx_batched(angles[..., 0], angles[..., 1],
                            angles[..., 2]).astype(dtype)
        out = []
        for s, bs in blocks:
            M = U[:, s]
            for q in range(s + 1, s + bs):
                M = batched_kron(M, U[:, q])
            out.append(M)
        return out

    def run(params, embed_angles=None):
        state = jnp.full((size,), 1.0 / np.sqrt(float(size)), dtype=dtype)
        if conditioning:
            if embed_angles is None:
                raise ValueError("conditioning=True requires embed_angles")
            E = ry_batched(jnp.asarray(embed_angles).reshape(n)).astype(dtype)
            for s, bs in blocks:
                M = E[s]
                for q in range(s + 1, s + bs):
                    M = jnp.kron(M, E[q])
                state = apply_adjacent_block(state, M, s, bs, n)
        mats = block_matrices(params)
        cz = _cz_diag_device(n, edges) if has_edges else None
        for l in range(layers):
            for i, (s, bs) in enumerate(blocks):
                state = apply_adjacent_block(state, mats[i][l], s, bs, n)
            if not has_edges:
                continue
            if l % 2 == 0:
                for step in plan:
                    if step[0] == "perm":
                        state = apply_adjacent_block(
                            state, jnp.asarray(step[1]), tstart, tg, n)
                    else:
                        _, c, t, M = step
                        if t >= tstart:
                            flipped = apply_adjacent_block(
                                state, jnp.asarray(M), tstart, tg, n)
                        else:
                            flipped = apply_adjacent_block(
                                state, jnp.asarray(M), t, 1, n)
                        m = control_mask(c)
                        state = state + m * (flipped - state)
            else:
                state = state * cz
        return jnp.real(state * jnp.conj(state))

    if conditioning:
        return run

    def probs(params: jnp.ndarray) -> jnp.ndarray:
        return run(params)

    return probs


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


def make_structured_probs_fn(num_wires: int, layers: int,
                             edges: Sequence[Tuple[int, int]],
                             dtype=jnp.complex64,
                             conditioning: bool = False):
    """probs(params[, embed_angles]) for the DAG-structured ansatz; params
    shape (3·L·n,). With ``conditioning=True`` the returned function takes a
    second argument of per-qubit embedding angles (RY(x_q) wall after the
    Hadamard wall — the angle-embedding scheme the reference declares but
    never implements, ``quantum_born_machine.py:132-137``)."""
    n = num_wires
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    edges = [(int(c), int(t)) for c, t in edges]
    for c, t in edges:
        if not (0 <= c < n and 0 <= t < n) or c == t:
            raise ValueError(f"bad edge ({c}, {t}) for {n} wires")
    has_edges = bool(edges)
    # numpy-side dtype probe: an EAGER jnp op here (jnp.real of a device
    # scalar) hits the axon backend outside any jit and fails with
    # UNIMPLEMENTED — factory functions must never touch the device.
    real_dtype = jnp.dtype(np.zeros(0, dtype=np.dtype(dtype)).real.dtype)

    def bit_mask(q):
        """0/1 indicator of qubit q's basis bit, iota-derived on device,
        shaped (R, 1) for row bits / (1, C) for column bits."""
        if q < rb:
            b = (jax.lax.iota(jnp.int32, R) >> (rb - 1 - q)) & 1
            return b.astype(real_dtype)[:, None]
        b = (jax.lax.iota(jnp.int32, C) >> (cb - 1 - (q - rb))) & 1
        return b.astype(real_dtype)[None, :]

    def flip_bit(X, q):
        """Reverse qubit q's basis bit: reshape + axis-flip (no gather)."""
        if q < rb:
            pre = 1 << q
            return X.reshape(pre, 2, R // (2 * pre), C)[:, ::-1].reshape(R, C)
        qq = q - rb
        pre = 1 << qq
        return X.reshape(R, pre, 2, C // (2 * pre))[:, :, ::-1].reshape(R, C)

    def apply_cnot(X, c, t):
        return X + bit_mask(c) * (flip_bit(X, t) - X)

    def odd_layer_sign():
        """All the odd layer's CZ(c, t) signs multiplied into one mask
        (CZs are diagonal, hence commuting)."""
        s = jnp.ones((1, 1), dtype=real_dtype)
        for c, t in edges:
            s = s * (1.0 - 2.0 * bit_mask(c) * bit_mask(t))
        return s

    def fold_rotations(U):
        """(L, n, 2, 2) per-qubit rotations -> ((L, R, R), (L, C, C))
        layer-batched Kronecker folds for the left/right matmuls."""
        M = U[:, 0]
        for q in range(1, rb):
            M = batched_kron(M, U[:, q])
        if cb == 0:
            return M, jnp.ones((layers, 1, 1), dtype=dtype)
        N = U[:, rb]
        for q in range(rb + 1, n):
            N = batched_kron(N, U[:, q])
        return M, N

    def embed_wall(X, embed_angles):
        """RY(x_q) wall folded into one left + one right matmul."""
        E = ry_batched(jnp.asarray(embed_angles).reshape(n)).astype(dtype)
        M = E[0]
        for q in range(1, rb):
            M = jnp.kron(M, E[q])
        X = M @ X
        if cb:
            N = E[rb]
            for q in range(rb + 1, n):
                N = jnp.kron(N, E[q])
            X = X @ N.T
        return X

    def run(params: jnp.ndarray, embed_angles=None) -> jnp.ndarray:
        a = params.reshape(layers, n, 3)
        U = rot_zyx_batched(a[..., 0], a[..., 1], a[..., 2]).astype(dtype)
        Lm, Rm = fold_rotations(U)

        X = jnp.full((R, C), 1.0 / np.sqrt(float(1 << n)), dtype=dtype)
        if conditioning:
            if embed_angles is None:
                raise ValueError("conditioning=True requires embed_angles")
            X = embed_wall(X, embed_angles)
        sign = odd_layer_sign() if has_edges else None
        for l in range(layers):
            X = Lm[l] @ X @ Rm[l].T
            if not has_edges:
                continue
            if l % 2 == 0:
                for c, t in edges:
                    X = apply_cnot(X, c, t)
            else:
                X = X * sign
        flat = X.reshape(-1)
        return jnp.real(flat * jnp.conj(flat))

    if conditioning:
        return run

    def probs(params: jnp.ndarray) -> jnp.ndarray:
        return run(params)

    return probs

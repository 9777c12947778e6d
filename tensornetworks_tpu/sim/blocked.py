"""Blocked statevector execution: TPU-layout-friendly circuit evaluation.

The per-gate einsum path operates on a ``(2,)*n`` tensor whose trailing 2x2
axes are pathological for TPU tiling (every op pads tiny axes to full
(8,128) tiles). This module rewrites a whole ansatz layer into three
TPU-native steps on the *flat* ``(2^n,)`` state:

1. **Rotations** — consecutive qubits are grouped into blocks of ``b`` (=8 by
   default); each block's per-qubit 2x2 rotations Kronecker-fold into one
   ``(2^b, 2^b)`` matrix applied as a single MXU matmul over a
   ``(pre, 2^b, post)`` reshape (``ops.kron.apply_adjacent_block``).
2. **CNOT chain** — every CNOT is a classical permutation of basis states;
   the chain segment inside each block folds into a static permutation
   matrix (block 0's merges into its rotation matmul), each boundary CNOT is
   a 4x4 adjacent-bit matmul, and the ring wrap CNOT(n-1, 0) becomes
   H₀·CZ·H₀ (two tiled 2x2 matmuls + a static diagonal) — no gathers
   (complex gathers are unsupported on some TPU lowerings) and no strided
   restacks.
3. **CZ layer** — all CZ gates are diagonal ±1; a layer's CZs multiply into
   ONE static sign vector, applied as one elementwise product.

Rotation matrices for all layers are built in one batched pass (vectorized
2x2 rotations + layer-batched Kronecker folds), keeping the traced op count
O(n) regardless of depth.

An L-layer hardware-efficient circuit becomes ~L·(n/b + 2) large ops instead
of ~L·2n tiny ones. Produces bit-identical distributions to ``sim.ansatz``
(tested) and is fully differentiable by ``jax.grad``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.kron import apply_adjacent_block
from .ansatz import ANSATZ_TYPES
from .gates import batched_kron, kron_fold, rot_zy_batched, rot_zyx_batched


def _blocks(n: int, b: int) -> List[Tuple[int, int]]:
    """Consecutive (start, size) qubit blocks covering [0, n), end-aligned:
    any remainder block goes FIRST so that every non-initial block keeps a
    large trailing extent (`post`), which keeps its contraction lane-friendly
    on TPU (the final block uses a dedicated 2D matmul path)."""
    r = n % b
    out = []
    if r:
        out.append((0, r))
    s = r
    while s < n:
        out.append((s, b))
        s += b
    return out


def _cnot_map(idx: np.ndarray, n: int, c: int, t: int) -> np.ndarray:
    """Forward basis-state map of CNOT(control=c, target=t) on MSB-first ints."""
    cb = 1 << (n - 1 - c)
    tb = 1 << (n - 1 - t)
    return idx ^ (((idx & cb) >> (n - 1 - c)) * tb)


def _chain_gates(n: int, ansatz_type: str) -> List[Tuple[int, int]]:
    """The entangling CNOT sequence of one layer (quantum_born_machine.py:74-80,
    :122-126): nearest-neighbor chain + ring wrap when n > 2."""
    gates = []
    if n > 1:
        for q in range(n - 1):
            gates.append((q, q + 1))
        if n > 2:
            gates.append((n - 1, 0))
    return gates


def _cz_pairs(n: int, layer: int, ansatz_type: str) -> List[Tuple[int, int]]:
    if ansatz_type == "hardware_efficient":
        if layer % 2 == 0 and n > 2:
            return [(q, q + 2) for q in range(0, n - 2, 2)]
        return []
    if ansatz_type == "all_to_all":
        return [(a, b) for a in range(n) for b in range(a + 1, n)] if n > 1 else []
    return []


def _chain_permutation(n: int, ansatz_type: str) -> Optional[np.ndarray]:
    """Inverse index permutation implementing the full CNOT chain of a layer:
    ``state_out = state_in[perm]``. (Reference path for tests; the executor
    uses the gather-free block decomposition below.)"""
    gates = _chain_gates(n, ansatz_type)
    if not gates:
        return None
    size = 1 << n
    idx = np.arange(size, dtype=np.int64)
    fwd = idx.copy()
    for c, t in gates:
        g = _cnot_map(idx, n, c, t)
        fwd = g[fwd]
    inv = np.empty(size, dtype=np.int32)
    inv[fwd] = idx.astype(np.int32)
    return inv


def _local_perm_matrix(gates: List[Tuple[int, int]], start: int, bsize: int) -> Optional[np.ndarray]:
    """(2^b, 2^b) permutation matrix for the chain CNOTs lying fully inside
    the block [start, start+b), applied in order. None if identity."""
    local = [(c - start, t - start) for c, t in gates
             if start <= c < start + bsize and start <= t < start + bsize]
    if not local:
        return None
    size = 1 << bsize
    idx = np.arange(size, dtype=np.int64)
    fwd = idx.copy()
    for c, t in local:
        g = _cnot_map(idx, bsize, c, t)
        fwd = g[fwd]
    P = np.zeros((size, size), dtype=np.complex64)
    P[fwd, idx] = 1.0
    return P


def _cz_diag(n: int, pairs: List[Tuple[int, int]]) -> Optional[np.ndarray]:
    if not pairs:
        return None
    idx = np.arange(1 << n, dtype=np.int64)
    sign = np.ones(1 << n, dtype=np.float32)
    for a, b in pairs:
        ab = ((idx >> (n - 1 - a)) & 1) & ((idx >> (n - 1 - b)) & 1)
        sign *= 1.0 - 2.0 * ab.astype(np.float32)
    return sign


def _cz_diag_device(n: int, pairs: List[Tuple[int, int]]) -> jnp.ndarray:
    """CZ-layer sign vector computed ON DEVICE from iota.

    Embedding 2^n-sized numpy constants into the jitted program blows up the
    serialized HLO (the axon remote compiler rejects >~100MB request bodies
    at n≥22); computing from iota adds a few cheap vector ops that XLA hoists
    out of training scans."""
    idx = jax.lax.iota(jnp.int32, 1 << n)
    sign = jnp.ones((1 << n,), dtype=jnp.float32)
    for a, b in pairs:
        ab = ((idx >> (n - 1 - a)) & 1) * ((idx >> (n - 1 - b)) & 1)
        sign = sign * (1.0 - 2.0 * ab.astype(jnp.float32))
    return sign


_CNOT4 = np.array(
    [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=np.complex64
)
_H2 = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2.0)


def _hadamard_block(size: int) -> np.ndarray:
    H = np.array([[1, 1], [1, -1]], dtype=np.complex64) / np.sqrt(2.0)
    M = np.eye(1, dtype=np.complex64)
    for _ in range(size):
        M = np.kron(M, H)
    return M


def make_block_matrices_fn(num_wires: int, layers: int, ansatz_type: str,
                           block: int = 8, dtype=jnp.complex64):
    """params -> list of per-block ``(layers, 2^b, 2^b)`` rotation operators.

    The shared builder behind both the blocked forward executor and the
    O(1)-memory adjoint backward (``sim.blocked_adjoint``): per-qubit 2x2
    rotations batched over layers, Kronecker-folded per block, with block 0's
    intra-block chain permutation pre-composed (so the adjoint differentiates
    exactly the operator the forward applies)."""
    n = num_wires
    blocks = _blocks(n, block)
    per_qubit = 3 if ansatz_type in ("hardware_efficient", "all_to_all") else 2
    has_chain = ansatz_type in ("hardware_efficient", "basic")
    chain = _chain_gates(n, ansatz_type) if has_chain else []
    perm0 = _local_perm_matrix(chain, blocks[0][0], blocks[0][1]) if chain else None

    def block_matrices(params):
        angles = params.reshape(layers, n, per_qubit)
        if per_qubit == 3:
            U = rot_zyx_batched(angles[..., 0], angles[..., 1], angles[..., 2])
        else:
            U = rot_zy_batched(angles[..., 0], angles[..., 1])
        U = U.astype(dtype)  # (layers, n, 2, 2)
        out = []
        for i, (s, bs) in enumerate(blocks):
            M = kron_fold([U[:, q] for q in range(s, s + bs)])
            if i == 0 and perm0 is not None:
                M = jnp.einsum("ij,ljk->lik", jnp.asarray(perm0, dtype=dtype), M)
            out.append(M)
        return out

    return block_matrices


def make_blocked_state_fn(num_wires: int, layers: int, ansatz_type: str,
                          block: int = 8, dtype=jnp.complex64,
                          conditioning: bool = False, constrain=None,
                          remat_layers: bool = False):
    """state(params[, embed_angles]) evaluating the ansatz via blocked
    execution. With ``conditioning=True`` the returned function takes a
    second argument of per-qubit embedding angles and applies an RY(θ_q)
    wall after the Hadamard wall (angle-embedding data conditioning — a
    capability the reference declares but never implements,
    ``quantum_born_machine.py:132-137``).

    ``constrain``: optional ``state -> state`` hook applied to the flat
    (2^n,) state at initialization and after every layer — used by the GSPMD
    training path to pin ``jax.lax.with_sharding_constraint`` inside the
    forward so the statevector itself is distributed, not just the output
    probabilities (``parallel/sharded.py``).

    ``remat_layers``: wrap each ansatz layer in ``jax.checkpoint`` so reverse-
    mode AD stores only the L layer-boundary states instead of every
    intra-layer intermediate (~n/b + 3 buffers per layer). At n=28 a c64
    state is 2 GB — this is the difference between fitting the backward on
    one chip and OOM (used by the large-n sampled-KSD engine)."""
    if ansatz_type not in ANSATZ_TYPES:
        raise ValueError(f"Unknown ansatz_type {ansatz_type!r}")
    n = num_wires
    size = 1 << n
    blocks = _blocks(n, block)
    per_qubit = 3 if ansatz_type in ("hardware_efficient", "all_to_all") else 2
    has_chain = ansatz_type in ("hardware_efficient", "basic")
    chain = _chain_gates(n, ansatz_type) if has_chain else []
    # Gather-free chain decomposition: per-block intra permutation matrices
    # (block 0's folds into its rotation matmul), boundary CNOTs as 4x4
    # adjacent-bit matmuls, ring wrap last via H·CZ·H.
    perms = [_local_perm_matrix(chain, s, bs) for (s, bs) in blocks] if chain else []
    boundaries = [(s - 1, s) for (s, _) in blocks[1:]]
    ring_cross = bool(chain) and n > 2 and len(blocks) > 1
    cz_pair_lists = [_cz_pairs(n, layer, ansatz_type) for layer in range(layers)]
    h_blocks = (
        [_hadamard_block(bs) for (_, bs) in blocks]
        if ansatz_type in ("hardware_efficient", "all_to_all")
        else None
    )

    # Per-block rotation matrices for ALL layers at once (list of
    # (layers, 2^b, 2^b)); shared with the adjoint backward so both paths
    # differentiate/apply the identical operator (block 0's chain permutation
    # pre-composed).
    block_matrices = make_block_matrices_fn(num_wires, layers, ansatz_type,
                                            block, dtype)

    def state_fn(params: jnp.ndarray, embed_angles=None) -> jnp.ndarray:
        state = jnp.zeros((size,), dtype=dtype).at[0].set(1.0)
        if constrain is not None:
            state = constrain(state)
        if h_blocks is not None:
            for (s, bs), hb in zip(blocks, h_blocks):
                state = apply_adjacent_block(state, jnp.asarray(hb, dtype=dtype), s, bs, n)
        if conditioning:
            if embed_angles is None:
                raise ValueError("conditioning=True requires embed_angles")
            from .gates import ry_batched

            U = ry_batched(embed_angles.reshape(n)).astype(dtype)  # (n, 2, 2)
            for s, bs in blocks:
                M = kron_fold([U[qq] for qq in range(s, s + bs)])
                state = apply_adjacent_block(state, M, s, bs, n)
        mats = block_matrices(params)

        def layer_body(layer, state, layer_mats):
            for i, (s, bs) in enumerate(blocks):
                state = apply_adjacent_block(state, layer_mats[i], s, bs, n)
            for i in range(1, len(blocks)):
                if chain:
                    # Boundary CNOT acts on the adjacent bit pair (s-1, s):
                    # a 4x4 adjacent-block contraction, layout-friendly.
                    c, t = boundaries[i - 1]
                    state = apply_adjacent_block(
                        state, jnp.asarray(_CNOT4, dtype=dtype), c, 2, n)
                    if perms[i] is not None:
                        state = apply_adjacent_block(
                            state, jnp.asarray(perms[i], dtype=dtype),
                            blocks[i][0], blocks[i][1], n)
            if ring_cross:
                # Ring wrap CNOT(n-1, 0) via H₀·CZ(n-1,0)·H₀: a leading-axis
                # 2x2 matmul, an iota-derived diagonal, and the matmul again —
                # all perfectly tiled, unlike a strided slice/restack of the
                # two end bits.
                H = jnp.asarray(_H2, dtype=dtype)
                state = apply_adjacent_block(state, H, 0, 1, n)
                state = state * _cz_diag_device(n, [(n - 1, 0)])
                state = apply_adjacent_block(state, H, 0, 1, n)
            if cz_pair_lists[layer]:
                state = state * _cz_diag_device(n, cz_pair_lists[layer])
            if constrain is not None:
                state = constrain(state)
            return state

        for layer in range(layers):
            layer_mats = [mats[i][layer] for i in range(len(blocks))]
            if remat_layers:
                from functools import partial

                state = jax.checkpoint(partial(layer_body, layer))(
                    state, layer_mats)
            else:
                state = layer_body(layer, state, layer_mats)
        return state

    return state_fn


def make_blocked_probs_fn(num_wires: int, layers: int, ansatz_type: str,
                          block: int = 8, dtype=jnp.complex64,
                          conditioning: bool = False, constrain=None,
                          remat_layers: bool = False):
    state_fn = make_blocked_state_fn(num_wires, layers, ansatz_type, block, dtype,
                                     conditioning=conditioning,
                                     constrain=constrain,
                                     remat_layers=remat_layers)

    if conditioning:
        def probs_fn(params: jnp.ndarray, embed_angles) -> jnp.ndarray:
            amp = state_fn(params, embed_angles)
            return jnp.real(amp * jnp.conj(amp))
    else:
        def probs_fn(params: jnp.ndarray) -> jnp.ndarray:
            amp = state_fn(params)
            return jnp.real(amp * jnp.conj(amp))

    return probs_fn

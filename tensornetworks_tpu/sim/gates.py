"""Quantum gate library: constants and parameterized rotation builders.

Matrices act on the MSB-first axis convention of ``core.bits``; wire 0 is
axis 0 of the ``(2,)*n`` state tensor (PennyLane wire ordering, so
probability vectors match ``qml.probs`` of the reference's circuits at
``quantum_born_machine.py:57-128``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_C = np.complex64

H = np.array([[1, 1], [1, -1]], dtype=_C) / np.sqrt(2.0)
X = np.array([[0, 1], [1, 0]], dtype=_C)
Y = np.array([[0, -1j], [1j, 0]], dtype=_C)
Z = np.array([[1, 0], [0, -1]], dtype=_C)
S = np.array([[1, 0], [0, 1j]], dtype=_C)
T = np.array([[1, 0], [0, np.exp(1j * np.pi / 4)]], dtype=_C)
I2 = np.eye(2, dtype=_C)

CNOT = np.array(
    [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=_C
)
CZ = np.diag([1, 1, 1, -1]).astype(_C)
SWAP = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=_C
)


def rx(theta) -> jnp.ndarray:
    """RX(θ) = exp(-i θ X / 2)."""
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    return jnp.array([[c, -1j * s], [-1j * s, c]])


def ry(theta) -> jnp.ndarray:
    """RY(θ) = exp(-i θ Y / 2)."""
    c = jnp.cos(theta / 2)
    s = jnp.sin(theta / 2)
    return jnp.array([[c, -s], [s, c]])


def rz(theta) -> jnp.ndarray:
    """RZ(θ) = exp(-i θ Z / 2)."""
    e = jnp.exp(-0.5j * theta)
    return jnp.array([[e, jnp.zeros_like(e)], [jnp.zeros_like(e), jnp.conj(e)]])


def rot_zyx(ax, ay, az) -> jnp.ndarray:
    """Fused RZ(az)·RY(ay)·RX(ax) — a circuit applying RX then RY then RZ.

    Fusing the three rotations into one 2x2 unitary before application cuts
    the per-qubit-per-layer axis contractions from 3 to 1 (the reference
    applies them as separate PennyLane ops, ``quantum_born_machine.py:68-71``).
    """
    return rz(az) @ ry(ay) @ rx(ax)


def rot_zy(ay, az) -> jnp.ndarray:
    """Fused RZ(az)·RY(ay) for the 'basic' ansatz (RY then RZ)."""
    return rz(az) @ ry(ay)


def _mat2(a00, a01, a10, a11) -> jnp.ndarray:
    """Assemble (..., 2, 2) from four broadcastable entries."""
    return jnp.stack(
        [jnp.stack([a00, a01], axis=-1), jnp.stack([a10, a11], axis=-1)], axis=-2
    )


def rx_batched(theta) -> jnp.ndarray:
    """RX over an array of angles -> (..., 2, 2)."""
    c = jnp.cos(theta / 2) + 0j
    s = -1j * jnp.sin(theta / 2)
    return _mat2(c, s, s, c)


def ry_batched(theta) -> jnp.ndarray:
    c = jnp.cos(theta / 2) + 0j
    s = jnp.sin(theta / 2) + 0j
    return _mat2(c, -s, s, c)


def rz_batched(theta) -> jnp.ndarray:
    e = jnp.exp(-0.5j * theta)
    zero = jnp.zeros_like(e)
    return _mat2(e, zero, zero, jnp.conj(e))


def rot_zyx_batched(ax, ay, az) -> jnp.ndarray:
    """Batched fused RZ·RY·RX over angle arrays -> (..., 2, 2)."""
    return rz_batched(az) @ ry_batched(ay) @ rx_batched(ax)


def rot_zy_batched(ay, az) -> jnp.ndarray:
    return rz_batched(az) @ ry_batched(ay)


def batched_kron(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Kronecker product over the trailing two axes, batched over the rest."""
    da, db = A.shape[-1], B.shape[-1]
    out = jnp.einsum("...ij,...kl->...ikjl", A, B)
    return out.reshape(*A.shape[:-2], da * db, da * db)


def kron_fold(mats):
    """Balanced-tree Kronecker fold of a sequence of ``(..., d, d)`` operators.

    Kronecker associativity makes the tree bit-for-bit the same operator as
    the left-to-right chain, but the balanced shape cuts the sequential
    depth from k-1 dependent ops to ceil(log2 k). On TPU the chain of tiny
    kron steps (4x4 → … → 256x256) and especially its autodiff transpose are
    latency-bound: replacing the chain with the tree took the ENTIRE 16q
    Pallas-path train step from 1.82 ms to 0.51 ms (RESULTS.md round 3)."""
    mats = list(mats)
    if not mats:
        raise ValueError("kron_fold of an empty sequence")
    while len(mats) > 1:
        nxt = [batched_kron(mats[i], mats[i + 1])
               for i in range(0, len(mats) - 1, 2)]
        if len(mats) % 2:
            nxt.append(mats[-1])
        mats = nxt
    return mats[0]

"""Generate recorded-probability fixtures for the quantum-ansatz parity tests.

Closes the last transcription-trust gap in the quantum path (VERDICT r2
"What's missing" 3): the framework's ansätze were transcribed by hand from
the reference's PennyLane QNodes (``quantum_born_machine.py:57-128``) and,
PennyLane being uninstallable in the build sandbox (no egress), parity so far
rested on in-framework oracles only. This script records exact probability
vectors for fixed parameter draws into ``tests/fixtures/quantum_ref_*.npz``,
from either of two sources:

- ``--source pennylane`` — the reference's own QNode, imported from
  ``/root/reference`` (run wherever PennyLane is installed; the gold
  standard).
- ``--source dense`` (default) — an INDEPENDENT implementation in this file:
  full ``2^n x 2^n`` dense unitaries assembled with ``np.kron`` / explicit
  basis-permutation matrices in complex128, following the reference's gate
  list line by line. It shares no code with ``tensornetworks_tpu.sim`` (which
  is built on tensor contractions, blocked matmuls and fused rotations), so
  agreement is a genuine cross-implementation check of the gate conventions
  (PennyLane: RX/RY/RZ = exp(-i θ P/2), wire 0 = most significant bit of
  ``qml.probs``) and of the ansatz structure (gate order, ring wraps,
  even-layer CZ skips, parameter walk).

Fixture schema (one .npz per case): ``theta`` (num_params,) float64,
``probs`` (2^n,) float64, scalars ``n``, ``layers``, strings ``ansatz``,
``source``. The test (tests/test_quantum_fixtures.py) asserts the framework
simulator reproduces ``probs`` to 1e-6 on every committed fixture and skips
cleanly when fixtures are absent.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "fixtures")

# (ansatz, n, layers, seed) — n=3 L=4 HE is the reference's shipped Sprinkler
# config; n=4/5 exercise ring wraps, even-layer CZ skips and non-adjacent CZs.
CASES = [
    ("hardware_efficient", 3, 4, 0),
    ("hardware_efficient", 4, 3, 1),
    ("hardware_efficient", 5, 2, 2),
    ("all_to_all", 3, 2, 3),
    ("all_to_all", 4, 2, 4),
    ("basic", 2, 2, 5),
    ("basic", 3, 2, 6),
    ("basic", 5, 3, 7),
]


# --------------------------------------------------------------- dense source

def _rx(t):
    c, s = np.cos(t / 2), np.sin(t / 2)
    return np.array([[c, -1j * s], [-1j * s, c]], dtype=np.complex128)


def _ry(t):
    c, s = np.cos(t / 2), np.sin(t / 2)
    return np.array([[c, -s], [s, c]], dtype=np.complex128)


def _rz(t):
    return np.array([[np.exp(-1j * t / 2), 0], [0, np.exp(1j * t / 2)]],
                    dtype=np.complex128)


_H = np.array([[1, 1], [1, -1]], dtype=np.complex128) / np.sqrt(2.0)


def _one_qubit(U, wire, n):
    """I ⊗ ... ⊗ U ⊗ ... ⊗ I with wire 0 leftmost (most significant)."""
    full = np.eye(1, dtype=np.complex128)
    for q in range(n):
        full = np.kron(full, U if q == wire else np.eye(2))
    return full


def _cnot(c, t, n):
    """Permutation matrix over basis states (big-endian bitstrings)."""
    dim = 1 << n
    M = np.zeros((dim, dim), dtype=np.complex128)
    for i in range(dim):
        bits = [(i >> (n - 1 - q)) & 1 for q in range(n)]
        if bits[c]:
            bits[t] ^= 1
        j = 0
        for b in bits:
            j = (j << 1) | b
        M[j, i] = 1.0
    return M


def _cz(c, t, n):
    dim = 1 << n
    d = np.ones(dim, dtype=np.complex128)
    for i in range(dim):
        if ((i >> (n - 1 - c)) & 1) and ((i >> (n - 1 - t)) & 1):
            d[i] = -1.0
    return np.diag(d)


def dense_probs(ansatz: str, n: int, layers: int, theta: np.ndarray) -> np.ndarray:
    """Reference gate list (``quantum_born_machine.py:57-128``) executed as
    dense matrix products on the |0...0> state."""
    psi = np.zeros(1 << n, dtype=np.complex128)
    psi[0] = 1.0
    k = 0
    if ansatz in ("hardware_efficient", "all_to_all"):
        for q in range(n):
            psi = _one_qubit(_H, q, n) @ psi
    for layer in range(layers):
        if ansatz in ("hardware_efficient", "all_to_all"):
            for q in range(n):
                psi = _one_qubit(_rx(theta[k]), q, n) @ psi; k += 1
                psi = _one_qubit(_ry(theta[k]), q, n) @ psi; k += 1
                psi = _one_qubit(_rz(theta[k]), q, n) @ psi; k += 1
        else:  # basic
            for q in range(n):
                psi = _one_qubit(_ry(theta[k]), q, n) @ psi; k += 1
                psi = _one_qubit(_rz(theta[k]), q, n) @ psi; k += 1
        if ansatz == "hardware_efficient":
            if n > 1:
                for i in range(n - 1):
                    psi = _cnot(i, i + 1, n) @ psi
                if n > 2:
                    psi = _cnot(n - 1, 0, n) @ psi
                if layer % 2 == 0 and n > 2:
                    for i in range(0, n - 2, 2):
                        psi = _cz(i, i + 2, n) @ psi
        elif ansatz == "all_to_all":
            if n > 1:
                for i in range(n):
                    for j in range(i + 1, n):
                        psi = _cz(i, j, n) @ psi
        else:  # basic
            if n > 1:
                for i in range(n - 1):
                    psi = _cnot(i, i + 1, n) @ psi
                if n > 2:
                    psi = _cnot(n - 1, 0, n) @ psi
    assert k == len(theta), (k, len(theta))
    return np.abs(psi) ** 2


# ----------------------------------------------------------- pennylane source

def pennylane_probs(ansatz: str, n: int, layers: int, theta: np.ndarray) -> np.ndarray:
    """Record from the reference's own QNode (requires PennyLane + torch)."""
    sys.path.insert(0, "/root/reference")
    import torch
    from quantum_born_machine import QuantumBornMachine  # noqa: E402

    qbm = QuantumBornMachine(num_latent_vars=n, ansatz_layers=layers,
                             ansatz_type=ansatz, init_method="zero")
    with torch.no_grad():
        qbm.theta.copy_(torch.tensor(theta, dtype=torch.float32))
        probs = qbm.pqc(weights=qbm.theta)
    return np.asarray(probs, dtype=np.float64)


def num_params(ansatz: str, n: int, layers: int) -> int:
    return layers * (3 if ansatz in ("hardware_efficient", "all_to_all") else 2) * n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=("dense", "pennylane"), default="dense")
    args = ap.parse_args()

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    for ansatz, n, layers, seed in CASES:
        rng = np.random.default_rng(seed)
        # float32 draw: the reference holds theta in float32; recording the
        # exact same float32 values keeps the two sources bit-comparable.
        theta = (rng.uniform(0, 2 * np.pi,
                             num_params(ansatz, n, layers)).astype(np.float32)
                 .astype(np.float64))
        probs = (dense_probs if args.source == "dense" else pennylane_probs)(
            ansatz, n, layers, theta)
        assert abs(probs.sum() - 1.0) < 1e-9, probs.sum()
        path = os.path.join(FIXTURE_DIR, f"quantum_ref_{ansatz}_n{n}_L{layers}.npz")
        np.savez(path, theta=theta, probs=probs, n=n, layers=layers,
                 ansatz=ansatz, source=args.source)
        print(f"wrote {path} (source={args.source}, max_p={probs.max():.4f})")


if __name__ == "__main__":
    main()

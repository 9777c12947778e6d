"""Bitstring enumeration and codecs over the discrete state space {0,1}^n.

TPU-native replacement for the reference's list-of-tuples enumeration
(``utils.py:77-91`` in the reference): every ``2^n``-sized object is a dense
array indexed by the integer encoding of the bitstring.

Convention (matches the reference's ``generate_all_binary_outcomes``): state
index ``i`` encodes the bitstring MSB-first, i.e. variable/qubit ``0`` is the
**most significant** bit: ``bits(i)[k] = (i >> (n-1-k)) & 1``. This is also
PennyLane's wire ordering for ``qml.probs``, so probability vectors are
directly comparable.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def all_bitstrings(num_vars: int, dtype=np.int8) -> np.ndarray:
    """(2^n, n) matrix whose row i is the MSB-first binary expansion of i.

    Parity: ``utils.py:77-91`` (reference) returns the same rows as tuples.
    """
    if num_vars == 0:
        return np.zeros((1, 0), dtype=dtype)
    idx = np.arange(2**num_vars, dtype=np.int64)
    shifts = np.arange(num_vars - 1, -1, -1, dtype=np.int64)
    return ((idx[:, None] >> shifts[None, :]) & 1).astype(dtype)


def bits_to_index(bits: np.ndarray) -> np.ndarray:
    """Inverse of ``all_bitstrings``: rows of bits -> integer indices."""
    bits = np.asarray(bits)
    n = bits.shape[-1]
    if n == 0:
        return np.zeros(bits.shape[:-1], dtype=np.int64)
    weights = 1 << np.arange(n - 1, -1, -1, dtype=np.int64)
    return (bits.astype(np.int64) * weights).sum(axis=-1)


def jnp_bits_to_index(bits: jnp.ndarray) -> jnp.ndarray:
    """JAX version of ``bits_to_index`` (for on-device sample batches)."""
    n = bits.shape[-1]
    if n == 0:
        return jnp.zeros(bits.shape[:-1], dtype=jnp.int32)
    weights = jnp.asarray(1 << np.arange(n - 1, -1, -1), dtype=jnp.int32)
    return (bits.astype(jnp.int32) * weights).sum(axis=-1)


def jnp_index_to_bits(idx: jnp.ndarray, num_vars: int, dtype=jnp.float32) -> jnp.ndarray:
    """Integer indices -> MSB-first bit rows, on device."""
    if num_vars == 0:
        return jnp.zeros(idx.shape + (0,), dtype=dtype)
    shifts = jnp.asarray(np.arange(num_vars - 1, -1, -1), dtype=jnp.int32)
    return ((idx[..., None] >> shifts) & 1).astype(dtype)


def flip_index(idx, num_vars: int, var: int):
    """Index of the state with variable ``var`` flipped (XOR with its bitmask).

    Parity: ``stein_utils.py:7-11`` (reference ``flip_bit`` on tuples).
    """
    return idx ^ (1 << (num_vars - 1 - var))


def popcount(x: np.ndarray) -> np.ndarray:
    """Number of set bits per element (numpy, int64-safe)."""
    x = np.asarray(x, dtype=np.int64)
    count = np.zeros_like(x)
    while np.any(x):
        count += x & 1
        x >>= 1
    return count


def get_binary_key(outcome_tuple) -> str:
    """'(1,0,1)' -> '101'. Parity: ``utils.py:69-71``."""
    return "".join(str(int(b)) for b in outcome_tuple)


def get_outcome_tuple(binary_key: str) -> tuple:
    """'101' -> (1,0,1). Parity: ``utils.py:73-75``."""
    return tuple(int(c) for c in binary_key)


def generate_all_binary_outcomes(num_vars: int) -> list:
    """List-of-tuples API parity shim over ``all_bitstrings``.

    Parity: ``utils.py:77-91``.
    """
    return [tuple(int(b) for b in row) for row in all_bitstrings(num_vars)]

"""Hamming base kernel over {0,1}^n, in closed form.

Parity target: ``stein_utils.py:13-55`` in the reference
(``k(z1, z2) = exp(-||z1 - z2||_1 / (num_vars * length_scale))``), rebuilt as
dense matrix algebra: with ``a = exp(-1/(n*l))`` the kernel is ``a^d`` where
``d`` is the Hamming distance, and the full Gram matrix over all ``2^n``
states is ``a**D`` with ``D = h 1^T + 1 h^T - 2 B B^T`` — one MXU matmul of
the bits matrix. The same kernel also factorizes as the Kronecker power
``A^{⊗n}``, ``A = [[1, a], [a, 1]]`` (see ``ops.kron``), which is what the
large-n matvec path uses.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.bits import all_bitstrings


def resolve_length_scale(length_scale, num_vars: int) -> float:
    """Resolve a length-scale spec to a float.

    ``"auto"`` selects the measured per-n bandwidth optimum (RESULTS.md
    bandwidth sweeps; the reference's ``l=1`` was tuned — if at all — at
    n=3, ``stein_utils.py:30-55``, and costs 3-7x final TVD at n >= 16):

    - ``n <= 17``: ``1/n`` (``n*l = 1``, one kernel e-fold per flipped
      bit). 16q sweep: l=1/16 gives TVD 0.0141 vs 0.0196 at l=0.1 and
      0.0403 at l=1.
    - ``n >= 18``: ``2/n`` (``n*l = 2``). Measured optimum at every probed
      size: 18q 0.0161 (2/n) vs 0.0713 (1/n) at 6k epochs; 20q 0.0229
      (l=0.1) vs 0.0550 (l=0.05); 22q annealed 0.0435 (2/n) vs worse at
      1/n; the 24q headline used l=2/24.

    Sharp kernels are also better conditioned — the Kronecker factor's
    cond (1+a)/(1-a) falls as a -> 0 — so ``auto`` never picks anything
    flatter than the reference default. Numeric values pass through
    unchanged.
    """
    if isinstance(length_scale, str):
        if length_scale != "auto":
            raise ValueError(
                f"length_scale must be a float or 'auto', got {length_scale!r}")
        n = max(num_vars, 1)
        return (2.0 if n >= 18 else 1.0) / n
    return float(length_scale)


def decay_factor(num_vars: int, length_scale: float = 1.0) -> float:
    """a = exp(-1 / (n * length_scale)) — per-flipped-bit kernel decay."""
    if num_vars == 0:
        return 1.0
    return float(np.exp(-1.0 / (num_vars * length_scale)))


def hamming_distance(z1: jnp.ndarray, z2: jnp.ndarray) -> jnp.ndarray:
    """L1 distance along the last axis. Parity: ``stein_utils.py:13-28``."""
    return jnp.abs(z1 - z2).sum(axis=-1)


def base_hamming_kernel(z1: jnp.ndarray, z2: jnp.ndarray, num_vars: int, length_scale: float = 1.0) -> jnp.ndarray:
    """Elementwise kernel on (batched) bit vectors. Parity: ``stein_utils.py:30-55``."""
    if num_vars == 0:
        return jnp.ones(jnp.broadcast_shapes(z1.shape[:-1], z2.shape[:-1]), dtype=jnp.result_type(z1, z2))
    d = hamming_distance(z1, z2)
    return jnp.exp(-d / (num_vars * length_scale))


def hamming_kernel_matrix(num_vars: int, length_scale: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """Dense (2^n, 2^n) Gram matrix K[i, j] = a^{popcount(i ^ j)}.

    Assembled from the bits matrix with one matmul; use only for moderate n
    (memory is 4^n) — the Kronecker matvec path covers large n.
    """
    B = jnp.asarray(all_bitstrings(num_vars), dtype=dtype)
    h = B.sum(axis=1)
    D = h[:, None] + h[None, :] - 2.0 * (B @ B.T)
    a = decay_factor(num_vars, length_scale)
    return jnp.power(jnp.asarray(a, dtype=dtype), D)

"""Distribution metrics (TVD, KL, entropy) over dicts or dense vectors.

Parity: ``utils.py:6-36`` in the reference for ``calculate_tvd`` semantics
(dict/dict or array/array pairs, factor 1/2), extended with JAX-native
versions usable inside jitted training loops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def calculate_tvd(p_true, p_approx) -> float:
    """Total variation distance. Accepts two dicts (union of keys) or two
    equal-shape arrays. Parity: ``utils.py:6-36``."""
    if isinstance(p_true, dict) and isinstance(p_approx, dict):
        all_outcomes = set(p_true) | set(p_approx)
        return 0.5 * float(
            sum(abs(p_true.get(o, 0.0) - p_approx.get(o, 0.0)) for o in all_outcomes)
        )
    p_true = np.asarray(p_true)
    p_approx = np.asarray(p_approx)
    if p_true.shape != p_approx.shape:
        raise ValueError("Probability arrays must have the same shape for simple TVD calculation.")
    return 0.5 * float(np.abs(p_true - p_approx).sum())


def tvd(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Jittable TVD between dense probability vectors."""
    return 0.5 * jnp.abs(p - q).sum(axis=-1)


def entropy(p: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Shannon entropy -sum p log p with the reference's 1e-10 clamp
    (``born_machine_classical_sim.py:177-181``)."""
    return -(p * jnp.log(jnp.clip(p, eps, None))).sum(axis=-1)


def kl_divergence(p: jnp.ndarray, q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """KL(p || q) with clamping, for diagnostics."""
    p_ = jnp.clip(p, eps, None)
    q_ = jnp.clip(q, eps, None)
    return (p * (jnp.log(p_) - jnp.log(q_))).sum(axis=-1)

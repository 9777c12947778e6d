"""Blocked executor must produce identical distributions and gradients to the
per-gate einsum path for every ansatz family and block size."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.sim import ansatz_probs, num_ansatz_params
from tensornetworks_tpu.sim.blocked import make_blocked_probs_fn


@pytest.mark.parametrize("ansatz,n,L,block", [
    ("hardware_efficient", 3, 2, 8),
    ("hardware_efficient", 4, 3, 2),
    ("hardware_efficient", 5, 2, 3),
    ("hardware_efficient", 6, 3, 4),
    ("all_to_all", 4, 2, 2),
    ("basic", 4, 2, 3),
    ("basic", 5, 3, 8),
    ("basic", 2, 2, 8),   # n=2: chain without ring wrap
    ("hardware_efficient", 1, 2, 8),  # single qubit, no entanglers
])
def test_blocked_matches_einsum(ansatz, n, L, block):
    k = num_ansatz_params(n, L, ansatz)
    params = jnp.asarray(
        np.random.default_rng(n * 7 + L).uniform(0, 2 * np.pi, k), dtype=jnp.float64
    )
    blocked = make_blocked_probs_fn(n, L, ansatz, block=block, dtype=jnp.complex128)
    p_blk = np.asarray(blocked(params))
    p_ref = np.asarray(ansatz_probs(params, n, L, ansatz, dtype=jnp.complex128))
    np.testing.assert_allclose(p_blk, p_ref, atol=1e-12)


def test_blocked_gradients_match():
    n, L = 4, 2
    k = num_ansatz_params(n, L, "hardware_efficient")
    params = jnp.asarray(np.random.default_rng(3).uniform(0, 2 * np.pi, k))
    v = jnp.asarray(np.random.default_rng(4).normal(size=2**n))
    blocked = make_blocked_probs_fn(n, L, "hardware_efficient", block=2,
                                    dtype=jnp.complex128)
    g_blk = jax.grad(lambda p: blocked(p) @ v)(params)
    g_ref = jax.grad(
        lambda p: ansatz_probs(p, n, L, "hardware_efficient", dtype=jnp.complex128) @ v
    )(params)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref), atol=1e-10)

"""2D super-block executor vs the einsum simulator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.sim import ansatz_probs, num_ansatz_params
from tensornetworks_tpu.sim.blocked2d import make_blocked2d_probs_fn


@pytest.mark.parametrize("ansatz,n,L", [
    ("hardware_efficient", 4, 3),
    ("hardware_efficient", 5, 2),
    ("hardware_efficient", 6, 3),
    ("hardware_efficient", 7, 2),
    ("all_to_all", 5, 2),
    ("basic", 6, 2),
    ("basic", 3, 2),
    ("hardware_efficient", 2, 2),  # no ring (n <= 2)
])
def test_blocked2d_matches_einsum(ansatz, n, L):
    k = num_ansatz_params(n, L, ansatz)
    params = jnp.asarray(np.random.default_rng(n * 3 + L).uniform(0, 2 * np.pi, k),
                         dtype=jnp.float64)
    p2d = np.asarray(make_blocked2d_probs_fn(n, L, ansatz, dtype=jnp.complex128)(params))
    p_ref = np.asarray(ansatz_probs(params, n, L, ansatz, dtype=jnp.complex128))
    np.testing.assert_allclose(p2d, p_ref, atol=1e-12)


@pytest.mark.slow
def test_blocked2d_gradients():
    n, L = 6, 2
    k = num_ansatz_params(n, L, "hardware_efficient")
    params = jnp.asarray(np.random.default_rng(0).uniform(0, 2 * np.pi, k))
    v = jnp.asarray(np.random.default_rng(1).normal(size=2**n))
    f2d = make_blocked2d_probs_fn(n, L, "hardware_efficient", dtype=jnp.complex128)
    g2d = jax.grad(lambda p: f2d(p) @ v)(params)
    g_ref = jax.grad(
        lambda p: ansatz_probs(p, n, L, "hardware_efficient", dtype=jnp.complex128) @ v
    )(params)
    np.testing.assert_allclose(np.asarray(g2d), np.asarray(g_ref), atol=1e-10)


def test_blocked2d_conditioning():
    from tensornetworks_tpu.sim.blocked import make_blocked_state_fn

    n, L = 5, 2
    k = num_ansatz_params(n, L, "hardware_efficient")
    params = jnp.asarray(np.random.default_rng(2).uniform(0, 2 * np.pi, k),
                         dtype=jnp.float64)
    angles = jnp.asarray(np.random.default_rng(3).uniform(0, np.pi, n))
    f2d = make_blocked2d_probs_fn(n, L, "hardware_efficient", dtype=jnp.complex128,
                                  conditioning=True)
    s1d = make_blocked_state_fn(n, L, "hardware_efficient", dtype=jnp.complex128,
                                conditioning=True)
    p2d = np.asarray(f2d(params, angles))
    amp = s1d(params, angles)
    p1d = np.asarray(jnp.real(amp * jnp.conj(amp)))
    np.testing.assert_allclose(p2d, p1d, atol=1e-12)

"""Pallas 2D whole-circuit kernel: forward AND adjoint backward vs autodiff
(interpret mode; the same kernels compile natively — dots + iota masks only)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.ops.pallas.circuit2d import make_pallas_circuit2d_probs
from tensornetworks_tpu.sim import ansatz_probs, num_ansatz_params


@pytest.mark.parametrize("ansatz,n,L", [
    ("hardware_efficient", 6, 3),
    ("hardware_efficient", 7, 2),
    ("basic", 5, 2),
    ("all_to_all", 4, 2),
])
@pytest.mark.slow
def test_pallas2d_forward_and_adjoint_backward(ansatz, n, L):
    k = num_ansatz_params(n, L, ansatz)
    params = jnp.asarray(np.random.default_rng(n + L).uniform(0, 2 * np.pi, k),
                         dtype=jnp.float32)
    fn = make_pallas_circuit2d_probs(n, L, ansatz, interpret=True)
    p_pal = np.asarray(fn(params))
    p_ref = np.asarray(ansatz_probs(params, n, L, ansatz))
    np.testing.assert_allclose(p_pal, p_ref, atol=5e-6)

    v = jnp.asarray(np.random.default_rng(9).normal(size=2**n), dtype=jnp.float32)
    g_pal = np.asarray(jax.grad(lambda p: fn(p) @ v)(params))
    g_ref = np.asarray(jax.grad(lambda p: ansatz_probs(p, n, L, ansatz) @ v)(params))
    np.testing.assert_allclose(g_pal, g_ref, atol=5e-5)


@pytest.mark.slow
def test_pallas2d_conditioning_matches_blocked():
    from tensornetworks_tpu.sim.blocked import make_blocked_probs_fn

    n, L = 6, 2
    k = num_ansatz_params(n, L, "hardware_efficient")
    params = jnp.asarray(np.random.default_rng(0).uniform(0, 2 * np.pi, k),
                         dtype=jnp.float32)
    angles = jnp.asarray(np.random.default_rng(1).uniform(0, np.pi, n),
                         dtype=jnp.float32)
    fp = make_pallas_circuit2d_probs(n, L, "hardware_efficient",
                                     interpret=True, conditioning=True)
    fb = make_blocked_probs_fn(n, L, "hardware_efficient", conditioning=True)
    np.testing.assert_allclose(np.asarray(fp(params, angles)),
                               np.asarray(fb(params, angles)), atol=5e-6)
    g1 = jax.grad(lambda p: fp(p, angles)[3])(params)
    g2 = jax.grad(lambda p: fb(p, angles).astype(jnp.float32)[3])(params)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-6)

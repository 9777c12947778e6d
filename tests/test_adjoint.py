"""Adjoint-method gradients must equal jax.grad through the einsum circuit
for every ansatz family."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.sim import ansatz_probs, num_ansatz_params
from tensornetworks_tpu.sim.adjoint import make_adjoint_probs_fn


@pytest.mark.parametrize("ansatz,n,L", [
    ("hardware_efficient", 3, 2),
    ("hardware_efficient", 4, 3),
    ("all_to_all", 3, 2),
    ("basic", 4, 2),
])
@pytest.mark.slow
def test_adjoint_grad_matches_autodiff(ansatz, n, L):
    k = num_ansatz_params(n, L, ansatz)
    params = jnp.asarray(
        np.random.default_rng(n + L).uniform(0, 2 * np.pi, k), dtype=jnp.float64
    )
    v = jnp.asarray(np.random.default_rng(99).normal(size=2**n))

    adj_probs = make_adjoint_probs_fn(n, L, ansatz, dtype=jnp.complex128)

    def loss_adj(p):
        return adj_probs(p) @ v

    def loss_ad(p):
        return ansatz_probs(p, n, L, ansatz, dtype=jnp.complex128) @ v

    # Values identical.
    np.testing.assert_allclose(float(loss_adj(params)), float(loss_ad(params)), rtol=1e-12)
    # Gradients identical.
    g_adj = jax.grad(loss_adj)(params)
    g_ad = jax.grad(loss_ad)(params)
    np.testing.assert_allclose(np.asarray(g_adj), np.asarray(g_ad), atol=1e-10)


def test_adjoint_under_jit_and_ksd():
    from tensornetworks_tpu.core import get_sprinkler_network
    from tensornetworks_tpu.ops import SteinOperator, score_table

    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    op = SteinOperator(score_table(t), 3, dtype=jnp.float64)
    adj_probs = make_adjoint_probs_fn(3, 2, "hardware_efficient", dtype=jnp.complex128)

    @jax.jit
    def loss(p):
        return op.ksd_loss(adj_probs(p))

    k = num_ansatz_params(3, 2, "hardware_efficient")
    params = jnp.asarray(np.random.default_rng(0).uniform(0, 1, k))
    g = jax.grad(loss)(params)
    g_ref = jax.grad(
        lambda p: op.ksd_loss(ansatz_probs(p, 3, 2, "hardware_efficient",
                                           dtype=jnp.complex128))
    )(params)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-9)

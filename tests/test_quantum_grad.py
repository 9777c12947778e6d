"""Gradient parity through the FULL quantum KSD objective: jax.grad through
statevector + Stein quadratic form must match the parameter-shift chain rule
(SURVEY.md §7 hard part (b))."""

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.core import get_sprinkler_network
from tensornetworks_tpu.ops import SteinOperator, score_table
from tensornetworks_tpu.sim import ansatz_probs, num_ansatz_params, parameter_shift_jacobian


def test_full_ksd_grad_matches_parameter_shift():
    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    S = score_table(t)
    op = SteinOperator(S, 3, 1.0, dtype=jnp.float64)

    n, L = 3, 2
    k = num_ansatz_params(n, L, "hardware_efficient")
    params = jnp.asarray(np.random.default_rng(11).uniform(0, 2 * np.pi, k))

    def probs_fn(p):
        return ansatz_probs(p, n, L, "hardware_efficient", dtype=jnp.complex128)

    def loss(p):
        return op.quadform(probs_fn(p))

    g_ad = jax.grad(loss)(params)

    # Parameter-shift: dL/dθ = (∂L/∂q) · (dq/dθ) with dq/dθ from the shift rule.
    q = probs_fn(params)
    dL_dq = jax.grad(lambda qq: op.quadform(qq))(q)
    jac = parameter_shift_jacobian(probs_fn, params)  # (2^n, P)
    g_ps = dL_dq @ jac

    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_ps), atol=1e-9)


def test_matvec_path_grad_matches_dense_path_grad():
    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    S = score_table(t)
    op_d = SteinOperator(S, 3, 1.0, dtype=jnp.float64, dense=True)
    op_m = SteinOperator(S, 3, 1.0, dtype=jnp.float64, dense=False, group=2)

    n, L = 3, 2
    k = num_ansatz_params(n, L, "basic")
    params = jnp.asarray(np.random.default_rng(5).uniform(0, 2 * np.pi, k))

    def loss(p, op):
        return op.ksd_loss(ansatz_probs(p, n, L, "basic", dtype=jnp.complex128))

    g_d = jax.grad(lambda p: loss(p, op_d))(params)
    g_m = jax.grad(lambda p: loss(p, op_m))(params)
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_d), rtol=1e-8, atol=1e-10)

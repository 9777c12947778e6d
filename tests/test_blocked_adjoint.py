"""Blocked adjoint backward == jax.grad through the blocked forward.

The O(1)-memory layer-reversed sweep (sim/blocked_adjoint.py) must reproduce
autodiff gradients exactly (float64 roundoff) for every ansatz family and
loss shape it serves — it replaces the checkpointed autodiff backward at
n ≥ 26 where the latter OOMs (engines/sampled.py), so exactness here is what
certifies those runs. Reference parity: the gradients being matched are the
ones parameter-shift would produce for the same circuits
(quantum_born_machine.py:57-128).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensornetworks_tpu.sim.blocked import make_blocked_probs_fn
from tensornetworks_tpu.sim.blocked_adjoint import make_blocked_adjoint_probs_fn


def _rand_params(n, layers, ansatz_type, seed):
    per_qubit = 3 if ansatz_type in ("hardware_efficient", "all_to_all") else 2
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1.0, layers * n * per_qubit),
                       dtype=jnp.float64)


@pytest.mark.parametrize("ansatz_type", ["hardware_efficient", "basic",
                                         "all_to_all"])
@pytest.mark.parametrize("n,layers,block", [(5, 2, 3), (8, 3, 4), (9, 2, 4)])
@pytest.mark.slow
def test_adjoint_matches_autodiff(ansatz_type, n, layers, block):
    probs_ad = make_blocked_probs_fn(n, layers, ansatz_type, block=block,
                                     dtype=jnp.complex128)
    probs_adj = make_blocked_adjoint_probs_fn(n, layers, ansatz_type,
                                              block=block,
                                              dtype=jnp.complex128)
    params = _rand_params(n, layers, ansatz_type, seed=n * 7 + layers)

    p0 = np.asarray(probs_ad(params))
    p1 = np.asarray(probs_adj(params))
    np.testing.assert_allclose(p1, p0, rtol=1e-12, atol=1e-14)

    # A non-trivial real loss touching every outcome with distinct weights
    # (catches conjugation/transpose/factor-of-2 mistakes a symmetric loss
    # would mask).
    w = jnp.asarray(np.random.default_rng(3).normal(0, 1, 1 << n),
                    dtype=jnp.float64)

    def loss(probs_fn):
        return lambda t: jnp.sum(w * probs_fn(t) ** 2) + jnp.sum(
            jnp.sin(probs_fn(t)[: 1 << (n - 1)]))

    g0 = np.asarray(jax.grad(loss(probs_ad))(params))
    g1 = np.asarray(jax.grad(loss(probs_adj))(params))
    np.testing.assert_allclose(g1, g0, rtol=1e-9,
                               atol=1e-11 * max(1.0, np.abs(g0).max()))


def test_adjoint_inside_jit_and_scan():
    # The sampled engine consumes the adjoint inside jitted scans; make sure
    # the custom VJP composes with jit + scan + value_and_grad.
    n, layers = 6, 2
    probs_adj = make_blocked_adjoint_probs_fn(n, layers, "hardware_efficient",
                                              block=3, dtype=jnp.complex128)
    probs_ad = make_blocked_probs_fn(n, layers, "hardware_efficient", block=3,
                                     dtype=jnp.complex128)
    params = _rand_params(n, layers, "hardware_efficient", seed=0)
    tgt = jnp.asarray(np.random.default_rng(1).dirichlet(np.ones(1 << n)))

    def make_step(probs_fn):
        def step(carry, _):
            p = carry
            l, g = jax.value_and_grad(
                lambda t: jnp.sum((probs_fn(t) - tgt) ** 2))(p)
            return p - 0.1 * g, l
        return step

    run_adj = jax.jit(lambda p: jax.lax.scan(make_step(probs_adj), p, None,
                                             length=5))
    run_ad = jax.jit(lambda p: jax.lax.scan(make_step(probs_ad), p, None,
                                            length=5))
    p_adj, l_adj = run_adj(params)
    p_ad, l_ad = run_ad(params)
    np.testing.assert_allclose(np.asarray(l_adj), np.asarray(l_ad),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p_adj), np.asarray(p_ad),
                               rtol=1e-9, atol=1e-12)

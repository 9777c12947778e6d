"""Pallas two-sided Stein matvec kernel vs the XLA path (interpret mode)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.core import get_random_chain_network, all_bitstrings
from tensornetworks_tpu.ops import score_table, stein_matvec
from tensornetworks_tpu.ops.pallas.stein2d import (
    make_pallas_stein2d_matvec,
    make_pallas_stein2d_quadform,
)


def _setup(n, seed=0):
    bn = get_random_chain_network(n + 1, seed=seed)
    t = bn.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
    S = jnp.asarray(score_table(t), dtype=jnp.float32)
    B = jnp.asarray(all_bitstrings(n), dtype=jnp.float32)
    q = jnp.asarray(np.random.default_rng(seed).random(2**n), dtype=jnp.float32)
    return S, B, q


@pytest.mark.slow
def test_stein2d_matvec_matches_xla():
    for n in (6, 9, 10):
        S, B, q = _setup(n)
        mv = make_pallas_stein2d_matvec(n, interpret=True)
        y1 = np.asarray(mv(q, S, B))
        y2 = np.asarray(stein_matvec(q, S, B, n, 1.0))
        np.testing.assert_allclose(y1, y2, rtol=2e-5,
                                   atol=2e-5 * np.abs(y2).max())


def test_stein2d_quadform_grad_is_2Kq():
    n = 8
    S, B, q = _setup(n, seed=3)
    qf = make_pallas_stein2d_quadform(n, interpret=True)
    g = np.asarray(jax.grad(lambda qq: qf(qq, S, B))(q))
    y = np.asarray(stein_matvec(q, S, B, n, 1.0))
    np.testing.assert_allclose(g, 2.0 * y, rtol=2e-5, atol=2e-5 * np.abs(y).max())

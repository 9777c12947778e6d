"""Pallas fused-circuit kernel vs the einsum simulator (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.ops.pallas.templates import make_fused_ansatz_probs
from tensornetworks_tpu.sim import ansatz_probs, num_ansatz_params


@pytest.mark.parametrize("ansatz,n,L", [
    ("hardware_efficient", 3, 2),
    ("hardware_efficient", 4, 3),
    ("all_to_all", 3, 2),
    ("basic", 4, 2),
])
def test_fused_circuit_matches_einsum(ansatz, n, L):
    k = num_ansatz_params(n, L, ansatz)
    params = jnp.asarray(
        np.random.default_rng(n * 10 + L).uniform(0, 2 * np.pi, k), dtype=jnp.float32
    )
    fused = make_fused_ansatz_probs(n, L, ansatz, interpret=True)
    p_fused = np.asarray(fused(params))
    p_ref = np.asarray(ansatz_probs(params, n, L, ansatz))
    np.testing.assert_allclose(p_fused, p_ref, atol=2e-6)
    assert abs(p_fused.sum() - 1.0) < 1e-5

"""Pallas fused Stein matvec vs the XLA path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import get_random_chain_network
from tensornetworks_tpu.core.bits import all_bitstrings
from tensornetworks_tpu.ops import score_table, stein_matvec
from tensornetworks_tpu.ops.pallas.templates.stein_matvec import make_pallas_stein_matvec, supported


def test_supported_range():
    assert not supported(13)
    assert supported(14) and supported(16) and supported(17)
    assert not supported(18)
    with pytest.raises(ValueError):
        make_pallas_stein_matvec(np.zeros((8, 3)), 3)


def test_pallas_stein_matvec_matches_xla():
    n = 14
    bn = get_random_chain_network(n + 1, seed=0)
    t = bn.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
    S = score_table(t)
    q = np.random.default_rng(0).random(2**n).astype(np.float32)
    mv = make_pallas_stein_matvec(S, n, interpret=True)
    y_pallas = np.asarray(mv(jnp.asarray(q)))
    B = jnp.asarray(all_bitstrings(n), dtype=jnp.float32)
    y_ref = np.asarray(
        stein_matvec(jnp.asarray(q), jnp.asarray(S, dtype=jnp.float32), B, n, 1.0)
    )
    np.testing.assert_allclose(y_pallas, y_ref,
                               rtol=5e-6, atol=5e-6 * np.abs(y_ref).max())

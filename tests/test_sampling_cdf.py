"""Inverse-CDF sampling path (large outcome spaces) draws the right
distribution."""

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.core import calculate_tvd
from tensornetworks_tpu.sim import sample_bits, sample_indices


def test_cdf_sampling_statistics():
    n = 12  # 4096 outcomes -> triggers the CDF path
    rng = np.random.default_rng(0)
    p = rng.random(2**n).astype(np.float32)
    p /= p.sum()
    idx = np.asarray(sample_indices(jax.random.PRNGKey(0), jnp.asarray(p), 200_000))
    emp = np.bincount(idx, minlength=2**n) / idx.size
    # Expected multinomial noise floor: ~sqrt(K/(2*pi*N)) summed ≈ 0.057 for
    # K=4096 outcomes and N=200k samples.
    assert calculate_tvd(emp, p) < 0.08
    assert idx.min() >= 0 and idx.max() < 2**n


def test_cdf_and_categorical_agree_in_distribution():
    p = jnp.asarray(np.array([0.5, 0.25, 0.125, 0.125] * 1024) / 1024, dtype=jnp.float32)
    bits = sample_bits(jax.random.PRNGKey(1), p, 50_000, 12)
    assert bits.shape == (50_000, 12)
    # Marginal of the last two bits must follow the repeating pattern.
    last2 = np.asarray(bits[:, -2] * 2 + bits[:, -1]).astype(int)
    emp = np.bincount(last2, minlength=4) / last2.size
    np.testing.assert_allclose(emp, [0.5, 0.25, 0.125, 0.125], atol=0.02)

"""Inverse-CDF sampling path (large outcome spaces) draws the right
distribution."""

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.core import calculate_tvd
from tensornetworks_tpu.sim import sample_bits, sample_indices
from tensornetworks_tpu.sim.sampling import gather_2d, sample_indices_2d


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


def test_two_stage_sampling_statistics():
    """sample_indices_2d draws the same joint as flat sampling: empirical
    TVD to the target is at the multinomial noise floor."""
    n = 12
    rng = np.random.default_rng(2)
    p = rng.random(2**n).astype(np.float32)
    p /= p.sum()
    P2 = jnp.asarray(p.reshape(64, 64))
    idx, r, c = sample_indices_2d(jax.random.PRNGKey(0), P2, 200_000)
    idx = np.asarray(idx)
    assert idx.min() >= 0 and idx.max() < 2**n
    np.testing.assert_array_equal(idx, np.asarray(r) * 64 + np.asarray(c))
    emp = np.bincount(idx, minlength=2**n) / idx.size
    assert calculate_tvd(emp, p) < 0.08


def test_two_stage_sampling_concentrated_rows():
    """Mass concentrated in a few rows/columns is respected exactly."""
    P = np.zeros((8, 16), dtype=np.float32)
    P[3, 5] = 0.7
    P[6, 0] = 0.2
    P[0, 15] = 0.1
    idx, r, c = sample_indices_2d(jax.random.PRNGKey(1), jnp.asarray(P), 50_000)
    emp = np.bincount(np.asarray(idx), minlength=128) / 50_000
    np.testing.assert_allclose(
        [emp[3 * 16 + 5], emp[6 * 16 + 0], emp[0 * 16 + 15]],
        [0.7, 0.2, 0.1], atol=0.02)


def test_gather_2d_matches_flat_gather_and_grad():
    """The two-level gather equals flat indexing, and its VJP scatters the
    same cotangent."""
    rng = np.random.default_rng(3)
    P = jnp.asarray(rng.random((32, 64)).astype(np.float64))
    r = jnp.asarray(rng.integers(0, 32, 100))
    c = jnp.asarray(rng.integers(0, 64, 100))
    flat = P.reshape(-1)[r * 64 + c]
    np.testing.assert_array_equal(np.asarray(gather_2d(P, r, c)),
                                  np.asarray(flat))

    def f2(M):
        return jnp.sum(jnp.log(gather_2d(M, r, c)) ** 2)

    def f1(M):
        return jnp.sum(jnp.log(M.reshape(-1)[r * 64 + c]) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(f2)(P)),
                               np.asarray(jax.grad(f1)(P)), rtol=1e-12)

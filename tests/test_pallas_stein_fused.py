"""Exactness of the fused roll-based Stein matvec kernel (interpret mode).

The kernel's algebra must match the production XLA gcorr path and the dense
Stein Gram bit-for-bit in structure (same decomposition); here we assert
numeric agreement in float64 interpret mode at tight tolerance and in
float32 against the f32 XLA path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensornetworks_tpu.ops.stein import (make_gcorr_tables, stein_gram_dense,
                                          stein_matvec_gcorr_tables)
from tensornetworks_tpu.ops.pallas.stein_fused import make_stein_matvec_fused


def _setup(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.dirichlet(np.ones(1 << n))
    S = rng.normal(size=(1 << n, n))
    return q, S


def _s3d(S, n, rb):
    cb = n - rb
    return jnp.asarray(S.T.reshape(n, 1 << rb, 1 << cb))


@pytest.mark.parametrize("n", [4, 7, 10, 12])
def test_fused_matches_dense_gram_f64(n):
    q, S = _setup(n)
    Kp = np.asarray(stein_gram_dense(jnp.asarray(S), n, dtype=jnp.float64))
    want = Kp @ q
    rb = (n + 1) // 2
    mv = make_stein_matvec_fused(n, interpret=True, dtype=jnp.float64)
    got = np.asarray(mv(jnp.asarray(q.reshape(1 << rb, -1)), _s3d(S, n, rb)))
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("n,ls", [(6, 1.0), (9, 0.5), (11, 2.0)])
@pytest.mark.slow
def test_fused_matches_gcorr_tables_path(n, ls):
    q, S = _setup(n, seed=n)
    tables = make_gcorr_tables(jnp.asarray(S), n)
    want = np.asarray(stein_matvec_gcorr_tables(
        jnp.asarray(q), tables, n, length_scale=ls))
    rb = (n + 1) // 2
    mv = make_stein_matvec_fused(n, length_scale=ls, interpret=True,
                                 dtype=jnp.float64)
    got = np.asarray(mv(jnp.asarray(q.reshape(1 << rb, -1)), _s3d(S, n, rb)))
    np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-9, atol=1e-11)


def test_fused_f32_accuracy():
    n = 10
    q, S = _setup(n, seed=3)
    Kp = np.asarray(stein_gram_dense(jnp.asarray(S), n, dtype=jnp.float64))
    want = Kp @ q
    rb = (n + 1) // 2
    mv = make_stein_matvec_fused(n, interpret=True, dtype=jnp.float32)
    got = np.asarray(mv(jnp.asarray(q.reshape(1 << rb, -1), dtype=jnp.float32),
                        _s3d(S, n, rb).astype(jnp.float32)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got.reshape(-1) / scale, want / scale, atol=5e-5)


@pytest.mark.slow
def test_fused_asymmetric_rb():
    """Non-default row/column split (the n=22 VMEM-pressure configuration)."""
    n = 9
    q, S = _setup(n, seed=5)
    Kp = np.asarray(stein_gram_dense(jnp.asarray(S), n, dtype=jnp.float64))
    want = Kp @ q
    for rb in (3, 6):
        mv = make_stein_matvec_fused(n, rb=rb, interpret=True, dtype=jnp.float64)
        got = np.asarray(mv(jnp.asarray(q.reshape(1 << rb, -1)),
                            _s3d(S, n, rb)))
        np.testing.assert_allclose(got.reshape(-1), want, rtol=1e-10, atol=1e-12)

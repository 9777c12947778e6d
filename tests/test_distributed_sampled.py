"""Distributed sampled-KSD (state-sharded forward + sharded two-stage
sampling + replicated U-statistic estimator) vs the single-device engine,
on the 8-way virtual CPU mesh.

VERDICT round-4 item 5: the exact distributed engine's per-device (2^n/D, n)
score shards die around n ≈ 25-26 — the sampled engine is the real n ≥ 30
multi-chip path. These tests pin (a) the sharded sampler draws bit-identical
shots to ``sample_indices_2d``; (b) end-to-end loss parity vs
``SampledKSDVariationalInference``; (c) parity holds for the cv baseline
(whose bit-marginal correction reduces over the sharded probs view)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import get_random_chain_network
from tensornetworks_tpu.engines import (DistributedSampledKSDVariationalInference,
                                        SampledKSDVariationalInference)
from tensornetworks_tpu.parallel import make_mesh, state_sharding
from tensornetworks_tpu.parallel.distributed_sampled import (
    make_distributed_two_stage_sampler)
from tensornetworks_tpu.sim.sampling import gather_2d, sample_indices_2d


def test_distributed_sampler_matches_single_device():
    n, M = 8, 512
    rb = (n + 1) // 2
    R, C = 1 << rb, 1 << (n - rb)
    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(3)
    P = rng.dirichlet(np.ones(1 << n)).astype(np.float32).reshape(R, C)
    key = jax.random.PRNGKey(17)

    idx1, r1, c1 = sample_indices_2d(key, jnp.asarray(P), M)
    q1 = gather_2d(jnp.asarray(P), r1, c1)

    sampler = make_distributed_two_stage_sampler(mesh, n, M)
    P_sh = jax.device_put(jnp.asarray(P), state_sharding(mesh, 2, axis=0))
    idx2, q2 = jax.jit(sampler)(P_sh, key)

    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=1e-6, atol=1e-9)


def test_distributed_sampler_gradient_flows_to_owning_shard():
    """d q_at / d P2 is one-hot at each sampled (r, c) — the psum/mask pair
    transposes to a scatter into the owning shard."""
    n, M = 6, 64
    rb = (n + 1) // 2
    R, C = 1 << rb, 1 << (n - rb)
    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(0)
    P = rng.dirichlet(np.ones(1 << n)).astype(np.float32).reshape(R, C)
    key = jax.random.PRNGKey(5)
    sampler = make_distributed_two_stage_sampler(mesh, n, M)
    P_sh = jax.device_put(jnp.asarray(P), state_sharding(mesh, 2, axis=0))

    def total(P2):
        idx, q_at = sampler(P2, key)
        return q_at.sum(), idx

    (g, idx) = jax.jit(jax.grad(total, has_aux=True))(P_sh)
    g = np.asarray(g)
    idx = np.asarray(idx)
    want = np.zeros((R, C), dtype=np.float32)
    for i in idx:
        want[i // C, i % C] += 1.0
    np.testing.assert_allclose(g, want, rtol=0, atol=1e-6)


def _problem(n):
    bn = get_random_chain_network(n + 1, seed=2)
    latent = [f"V{i}" for i in range(n)]
    obs = {f"V{n}": 1}
    return bn, latent, obs


@pytest.mark.parametrize("baseline", ["loo", "cv"])
def test_distributed_sampled_engine_loss_parity(baseline):
    n, M = 7, 256
    bn, latent, obs = _problem(n)
    post = bn.posterior_vector(latent, obs)
    kw = dict(num_epochs=25, lr_born_machine=0.05, verbose=False,
              true_posterior_for_tvd=post,
              reuse_loss_forward_for_eval=True)
    single = SampledKSDVariationalInference(
        bn, latent, [f"V{n}"], qbm_ansatz_layers=2, qbm_backend="einsum",
        num_samples=M, seed=0, sampling="two_stage", grad_baseline=baseline)
    dist = DistributedSampledKSDVariationalInference(
        bn, latent, [f"V{n}"], qbm_ansatz_layers=2, num_samples=M, seed=0,
        grad_baseline=baseline, mesh=make_mesh(8, dp=1))
    h1 = single.train(obs, **kw)
    h2 = dist.train(obs, **kw)
    np.testing.assert_allclose(h2["loss_ksd"], h1["loss_ksd"],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(h2["tvd"][1:], h1["tvd"][1:],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(dist.best_tvd_, single.best_tvd_,
                               rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_distributed_sampled_engine_chunked_matches_single_scan():
    n, M = 6, 128
    bn, latent, obs = _problem(n)
    post = bn.posterior_vector(latent, obs)
    kw = dict(num_epochs=40, lr_born_machine=0.05, verbose=False,
              true_posterior_for_tvd=post)
    mesh = make_mesh(8, dp=1)
    e1 = DistributedSampledKSDVariationalInference(
        bn, latent, [f"V{n}"], qbm_ansatz_layers=2, num_samples=M, seed=0,
        mesh=mesh)
    e2 = DistributedSampledKSDVariationalInference(
        bn, latent, [f"V{n}"], qbm_ansatz_layers=2, num_samples=M, seed=0,
        mesh=mesh)
    h1 = e1.train(obs, **kw)
    h2 = e2.train(obs, **kw, chunk_epochs=15)
    np.testing.assert_allclose(h1["loss_ksd"], h2["loss_ksd"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(e1.best_tvd_, e2.best_tvd_,
                               rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_distributed_sampled_engine_converges():
    n, M = 6, 512
    bn, latent, obs = _problem(n)
    post = bn.posterior_vector(latent, obs)
    eng = DistributedSampledKSDVariationalInference(
        bn, latent, [f"V{n}"], qbm_ansatz_layers=3,
        qbm_ansatz_type="bn_structured", num_samples=M, seed=0,
        grad_baseline="cv", mesh=make_mesh(8, dp=1))
    eng.train(obs, num_epochs=400, lr_born_machine=0.05, verbose=False,
              true_posterior_for_tvd=post)
    assert eng.best_tvd_ < 0.15, eng.best_tvd_

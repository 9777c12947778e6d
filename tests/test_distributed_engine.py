"""Distributed quantum-KSD ENGINE (scan/history/best-snapshot/chunking over
the mesh) vs the single-device scan, on the 8-way virtual CPU mesh.

Covers VERDICT.md round-2 item 4: (a) the engine — not just a step — runs
distributed with identical semantics; (b) bn_structured (+ conditioning)
executes distributed and matches the single-device structured executor;
(c) an n=20 run whose per-device buffers are asserted to be 2^n/D;
(d) chunked mode + durable resume work distributed.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import get_random_chain_network
from tensornetworks_tpu.engines.common import make_optimizer
from tensornetworks_tpu.engines.distributed import (
    DistributedQuantumKSDVariationalInference)
from tensornetworks_tpu.engines.ksd import run_ksd_scan
from tensornetworks_tpu.ops import SteinOperator, score_table
from tensornetworks_tpu.parallel import make_mesh
from tensornetworks_tpu.parallel.distributed_ansatz import (
    make_distributed_ansatz_probs)
from tensornetworks_tpu.sim import ansatz_probs
from tensornetworks_tpu.sim.structured import (latent_edges,
                                               make_structured_probs_fn)


def _problem(n, seed=0):
    bn = get_random_chain_network(n + 1, seed=seed)
    latent = [f"V{i}" for i in range(n)]
    observed = {f"V{n}": 1}
    return bn, latent, observed


@pytest.mark.slow
def test_distributed_engine_matches_single_device_scan():
    """Full engine train() (f64/c128) vs run_ksd_scan with the single-device
    einsum executor: loss and TVD histories agree to 1e-9."""
    n, L, epochs = 6, 2, 25
    bn, latent, observed = _problem(n)
    post = bn.posterior_vector(latent, observed)
    mesh = make_mesh(8, dp=1)

    model = DistributedQuantumKSDVariationalInference(
        bn, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=L, qbm_init_method="small_random", seed=0,
        mesh=mesh, dtype=jnp.float64, state_dtype=jnp.complex128)
    # f64 params in BOTH paths so rotation matrices are built at the same
    # precision (the default init is f32).
    p0 = np.asarray(jax.device_get(model.params), dtype=np.float64)
    from tensornetworks_tpu.parallel import replicated

    model.params = jax.device_put(jnp.asarray(p0), replicated(mesh))
    h = model.train(observed, num_epochs=epochs, lr_born_machine=5e-3,
                    verbose=False, true_posterior_for_tvd=post)

    t = bn.conditional_joint_table(latent, observed)
    op = SteinOperator(score_table(t), n, dtype=jnp.float64, dense=True)
    out = run_ksd_scan(
        probs_fn=lambda p, r: ansatz_probs(p, n, L, "hardware_efficient",
                                           dtype=jnp.complex128
                                           ).astype(jnp.float64),
        eval_probs_fn=lambda p: ansatz_probs(p, n, L, "hardware_efficient",
                                             dtype=jnp.complex128
                                             ).astype(jnp.float64),
        params0=jnp.asarray(p0), op=op, num_epochs=epochs,
        optimizer=make_optimizer("adam", 5e-3, epochs, True, (0.9, 0.999),
                                 10.0),
        entropy_weight=None,
        posterior_vec=jnp.asarray(post, dtype=jnp.float64),
        early_stopping=False, patience=0, key=jax.random.PRNGKey(0),
        reuse_loss_forward_for_eval=True)

    np.testing.assert_allclose(np.asarray(h["loss_ksd"]),
                               np.asarray(out["loss_ksd"]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(h["tvd"]), np.asarray(out["tvd"]),
                               rtol=1e-8, atol=1e-12)
    assert abs(model.best_tvd_ - float(out["best_tvd"])) < 1e-9


@pytest.mark.slow
def test_distributed_structured_ansatz_matches_single_device():
    """bn_structured (+ conditioning) through the shard_map gate primitives
    equals the single-device 2D structured executor."""
    n, L = 6, 3
    bn, latent, _ = _problem(n)
    edges = latent_edges(bn, latent)
    assert edges, "test DAG must have latent edges"
    mesh = make_mesh(8, dp=1)
    rng = np.random.default_rng(0)
    # f64 angles: both executors then build rotation entries at f64, so the
    # comparison is limited by c128 contraction rounding, not angle rounding.
    p = jnp.asarray(0.2 * rng.normal(size=3 * L * n), dtype=jnp.float64)

    dist = make_distributed_ansatz_probs(mesh, n, L, "bn_structured",
                                         dtype=jnp.complex128, edges=edges)
    single = make_structured_probs_fn(n, L, edges, dtype=jnp.complex128)
    np.testing.assert_allclose(np.asarray(dist(p)), np.asarray(single(p)),
                               atol=1e-12)

    dist_c = make_distributed_ansatz_probs(mesh, n, L, "bn_structured",
                                           dtype=jnp.complex128, edges=edges,
                                           conditioning=True)
    single_c = make_structured_probs_fn(n, L, edges, dtype=jnp.complex128,
                                        conditioning=True)
    ang = jnp.asarray(rng.normal(size=n), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(dist_c(p, ang)),
                               np.asarray(single_c(p, ang)), atol=1e-12)


@pytest.mark.slow
def test_distributed_engine_structured_with_conditioning_trains():
    """The flagship config (bn_structured + conditioning) runs distributed
    end-to-end through the engine and the loss decreases."""
    n, L = 5, 2
    bn, latent, observed = _problem(n)
    post = bn.posterior_vector(latent, observed)
    model = DistributedQuantumKSDVariationalInference(
        bn, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=L, qbm_ansatz_type="bn_structured",
        qbm_conditioning_dim=1, seed=0, num_devices=8)
    assert model.edges  # auto-derived from the BN
    h = model.train(observed, num_epochs=60, lr_born_machine=2e-2,
                    verbose=False, true_posterior_for_tvd=post)
    assert h["loss_ksd"][-1] < h["loss_ksd"][0] * 0.8
    assert np.isfinite(model.best_tvd_)


@pytest.mark.slow
def test_distributed_engine_chunked_resume_bit_identical(tmp_path):
    """Chunked + fault-injected resume through the distributed engine
    replays bit-identically to the uninterrupted chunked run."""
    n, L, epochs = 5, 2, 24
    bn, latent, observed = _problem(n)
    post = bn.posterior_vector(latent, observed)

    def make_model():
        return DistributedQuantumKSDVariationalInference(
            bn, latent, list(observed), qbm_num_latent_vars=n,
            qbm_ansatz_layers=L, seed=0, num_devices=8)

    m_full = make_model()
    h_full = m_full.train(observed, num_epochs=epochs, lr_born_machine=1e-2,
                          verbose=False, true_posterior_for_tvd=post,
                          chunk_epochs=8)

    state = str(tmp_path / "resume.npz")
    m_int = make_model()
    import tensornetworks_tpu.engines.distributed as dist_mod
    orig = dist_mod.run_ksd_scan

    def failing(*a, **kw):
        kw["fail_after_chunks"] = 1
        return orig(*a, **kw)

    dist_mod.run_ksd_scan = failing
    try:
        with pytest.raises(RuntimeError, match="fault injection"):
            m_int.train(observed, num_epochs=epochs, lr_born_machine=1e-2,
                        verbose=False, true_posterior_for_tvd=post,
                        chunk_epochs=8, resume_state_path=state)
    finally:
        dist_mod.run_ksd_scan = orig
    assert os.path.exists(state)

    h_res = m_int.train(observed, num_epochs=epochs, lr_born_machine=1e-2,
                        verbose=False, true_posterior_for_tvd=post,
                        chunk_epochs=8, resume_state_path=state)
    np.testing.assert_array_equal(np.asarray(h_full["loss_ksd"]),
                                  np.asarray(h_res["loss_ksd"]))
    np.testing.assert_array_equal(np.asarray(h_full["tvd"]),
                                  np.asarray(h_res["tvd"]))
    assert m_full.best_tvd_ == m_int.best_tvd_
    assert not os.path.exists(state)


@pytest.mark.slow
def test_distributed_engine_20q_memory_sharded():
    """n=20 on the 8-device mesh: per-device buffers (probabilities, score
    and bits tables, posterior) are asserted to hold exactly 2^20/8 rows —
    the beyond-one-device's-budget demonstration (structurally: every 2^n
    buffer, including the statevector inside the forward, carries a state-
    axis sharding; memory per device scales as 2^n/D)."""
    n, L, D = 20, 1, 8
    bn, latent, observed = _problem(n)
    model = DistributedQuantumKSDVariationalInference(
        bn, latent, list(observed), qbm_num_latent_vars=n,
        qbm_ansatz_layers=L, qbm_ansatz_type="bn_structured",
        seed=0, num_devices=D)
    op = model.build_operator(observed)
    (S,) = op.args()
    assert S.sharding.shard_shape(S.shape) == (2**n // D, n)
    q = jax.jit(model._probs)(model.params)
    assert q.sharding.shard_shape(q.shape) == (2**n // D,)
    for shard in q.addressable_shards:
        assert shard.data.shape == (2**n // D,)
    h = model.train(observed, num_epochs=2, lr_born_machine=1e-2,
                    verbose=False, true_posterior_for_tvd=None)
    assert np.isfinite(np.asarray(h["loss_ksd"])).all()


@pytest.mark.slow
def test_distributed_runner_lr_phases():
    """The distributed scale runner chains LR-annealed restarts over the
    mesh and restores the across-phase best (CLI: --mesh D --lr-phases)."""
    from tensornetworks_tpu.runners.scale_distributed import (
        run_distributed_scale_experiment)

    out = run_distributed_scale_experiment(
        num_qubits=5, layers=2, num_devices=4, verbose=False,
        ansatz="bn_structured", lr_phases=[(40, 0.05), (30, 0.005)])
    eng = out["model"]
    assert np.isfinite(eng.best_tvd_)
    q = np.asarray(eng._probs(eng.params))
    bn, latent, observed = _problem(5)
    post = bn.posterior_vector(latent, observed)
    tvd = 0.5 * np.abs(q - np.asarray(post)).sum()
    np.testing.assert_allclose(tvd, eng.best_tvd_, atol=1e-5)

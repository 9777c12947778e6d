"""Sampled (U-statistic) KSD stack: factored log-joint, sampled scores and
Gram vs the exact enumerated oracles, REINFORCE estimator algebra, engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import (all_bitstrings, get_random_chain_network,
                                     get_sprinkler_network)
from tensornetworks_tpu.core.factors import (compile_factors,
                                             make_latent_log_joint_fn,
                                             make_log_joint_fn)
from tensornetworks_tpu.engines import SampledKSDVariationalInference
from tensornetworks_tpu.ops import score_table, stein_gram_dense
from tensornetworks_tpu.ops.stein_sampled import (
    fit_linear_control_variate, ksd_ustat, ksd_vstat, reinforce_surrogate,
    reinforce_surrogate_cv, reinforce_surrogate_weighted, score_at_samples,
    stein_gram_samples)


def test_factored_log_joint_matches_dense_table():
    for bn in (get_sprinkler_network(), get_random_chain_network(7, seed=3)):
        n = bn.num_nodes
        log_joint = make_log_joint_fn(bn, dtype=jnp.float64)
        assign = jnp.asarray(all_bitstrings(n), dtype=jnp.int32)
        got = np.asarray(log_joint(assign))
        want = np.log(np.clip(bn.joint_table(), 1e-300, None))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_latent_log_joint_matches_conditional_table():
    bn = get_random_chain_network(8, seed=5)
    latent = [f"V{i}" for i in range(6)]
    obs = {"V6": 1, "V7": 0}
    fn = make_latent_log_joint_fn(bn, latent, obs, dtype=jnp.float64)
    Z = jnp.asarray(all_bitstrings(6), dtype=jnp.int32)
    got = np.exp(np.asarray(fn(Z)))
    want = bn.conditional_joint_table(latent, obs)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_latent_log_joint_rejects_unassigned_nodes():
    bn = get_random_chain_network(5, seed=0)
    with pytest.raises(ValueError):
        make_latent_log_joint_fn(bn, ["V0", "V1"], {"V4": 1})


def test_score_at_samples_matches_score_table():
    bn = get_random_chain_network(8, seed=2)
    latent = [f"V{i}" for i in range(6)]
    obs = {"V6": 0, "V7": 1}
    fn = make_latent_log_joint_fn(bn, latent, obs, dtype=jnp.float64)
    Z = jnp.asarray(all_bitstrings(6), dtype=jnp.int32)
    got = np.asarray(score_at_samples(fn, Z))
    want = score_table(bn.conditional_joint_table(latent, obs))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_score_guard_zeroes_impossible_rows():
    # Deterministic CPT -> hard-zero assignments exercise the eps guard.
    from tensornetworks_tpu.core import BayesianNetwork

    bn = BayesianNetwork()
    bn.add_node("A", {(): {0: 0.4, 1: 0.6}})
    bn.add_node("B", {(0,): {0: 1.0, 1: 0.0}, (1,): {0: 0.3, 1: 0.7}},
                parent_names=["A"])
    bn.add_node("X", {(0,): {0: 0.2, 1: 0.8}, (1,): {0: 0.5, 1: 0.5}},
                parent_names=["B"])
    latent = ["A", "B"]
    obs = {"X": 1}
    t = bn.conditional_joint_table(latent, obs)
    assert (t < 1e-12).any(), "expected an impossible assignment"
    fn = make_latent_log_joint_fn(bn, latent, obs, dtype=jnp.float64)
    Z = jnp.asarray(all_bitstrings(2), dtype=jnp.int32)
    got = np.asarray(score_at_samples(fn, Z))
    want = score_table(t)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    assert (got[t < 1e-12] == 0.0).all()


def test_sampled_gram_equals_dense_on_full_enumeration():
    bn = get_random_chain_network(7, seed=4)
    latent = [f"V{i}" for i in range(5)]
    obs = {"V5": 1, "V6": 0}
    S = score_table(bn.conditional_joint_table(latent, obs))
    B = all_bitstrings(5)
    for ls in (1.0, 0.25):
        dense = np.asarray(stein_gram_dense(S, 5, ls, dtype=jnp.float64))
        sampled = np.asarray(stein_gram_samples(
            jnp.asarray(S), jnp.asarray(B, dtype=jnp.float64), 5, ls))
        np.testing.assert_allclose(sampled, dense, rtol=1e-9,
                                   atol=1e-9 * np.abs(dense).max())


def test_ustat_vstat_statistics():
    g = jnp.asarray([[4.0, 1.0], [3.0, 2.0]])
    np.testing.assert_allclose(float(ksd_ustat(g)), 2.0)
    np.testing.assert_allclose(float(ksd_vstat(g)), 2.5)


def test_reinforce_weighted_gradient_equals_exact():
    # Enumerated-weights surrogate gradient == autodiff of q^T K_p q.
    bn = get_random_chain_network(6, seed=1)
    latent = [f"V{i}" for i in range(5)]
    obs = {"V5": 1}
    S = score_table(bn.conditional_joint_table(latent, obs))
    Kp = jnp.asarray(np.asarray(stein_gram_dense(S, 5, 1.0, dtype=jnp.float64)))
    logits0 = jax.random.normal(jax.random.PRNGKey(0), (32,), dtype=jnp.float64)

    def exact(logits):
        q = jax.nn.softmax(logits)
        return q @ (Kp @ q)

    def surrogate(logits):
        q = jax.nn.softmax(logits)
        log_q = jax.nn.log_softmax(logits)
        gram = stein_gram_samples(
            jnp.asarray(S), jnp.asarray(all_bitstrings(5), dtype=jnp.float64),
            5, 1.0)
        return reinforce_surrogate_weighted(gram, log_q, q)

    g_exact = np.asarray(jax.grad(exact)(logits0))
    g_est = np.asarray(jax.grad(surrogate)(logits0))
    np.testing.assert_allclose(g_est, g_exact, rtol=1e-8,
                               atol=1e-10 * np.abs(g_exact).max())


@pytest.mark.slow
def test_reinforce_sampled_gradient_is_unbiasedish():
    # Many-shot sampled gradient approaches the exact gradient direction.
    bn = get_random_chain_network(5, seed=6)
    latent = [f"V{i}" for i in range(4)]
    obs = {"V4": 1}
    S = score_table(bn.conditional_joint_table(latent, obs))
    Kp = jnp.asarray(np.asarray(stein_gram_dense(S, 4, 1.0, dtype=jnp.float64)))
    fn = make_latent_log_joint_fn(bn, latent, obs, dtype=jnp.float64)
    logits0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (16,), dtype=jnp.float64)

    def exact(logits):
        q = jax.nn.softmax(logits)
        return q @ (Kp @ q)

    def sampled(logits, key):
        q = jax.nn.softmax(logits)
        idx = jax.random.categorical(key, jax.lax.stop_gradient(logits), shape=(4096,))
        Z = ((idx[:, None] >> jnp.arange(3, -1, -1)) & 1).astype(jnp.int32)
        Sx = score_at_samples(fn, Z)
        gram = stein_gram_samples(Sx, Z.astype(jnp.float64), 4, 1.0)
        log_q = jax.nn.log_softmax(logits)[idx]
        return reinforce_surrogate(gram, log_q)

    g_exact = np.asarray(jax.grad(exact)(logits0))
    gs = [np.asarray(jax.grad(sampled)(logits0, jax.random.PRNGKey(k)))
          for k in range(8)]
    g_mean = np.mean(gs, axis=0)
    cos = g_mean @ g_exact / (np.linalg.norm(g_mean) * np.linalg.norm(g_exact))
    assert cos > 0.95, cos
    # And the U-stat value estimates the exact quadform.
    def val(key):
        q = jax.nn.softmax(logits0)
        idx = jax.random.categorical(key, logits0, shape=(4096,))
        Z = ((idx[:, None] >> jnp.arange(3, -1, -1)) & 1).astype(jnp.int32)
        Sx = score_at_samples(fn, Z)
        return float(ksd_ustat(stein_gram_samples(Sx, Z.astype(jnp.float64), 4, 1.0)))
    vals = [val(jax.random.PRNGKey(k)) for k in range(8)]
    np.testing.assert_allclose(np.mean(vals), float(exact(logits0)), rtol=0.05)


@pytest.mark.slow
def test_sampled_engine_converges_on_sprinkler():
    bn = get_sprinkler_network()
    latent = ["C", "S", "R"]
    obs = {"W": 1}
    post = bn.posterior_vector(latent, obs)
    engine = SampledKSDVariationalInference(
        bn, latent, ["W"], qbm_ansatz_layers=2, qbm_backend="einsum",
        num_samples=1024, seed=0)
    h = engine.train(obs, num_epochs=500, lr_born_machine=0.05,
                     verbose=False, true_posterior_for_tvd=post)
    assert engine.best_tvd_ < 0.08, engine.best_tvd_
    assert np.isfinite(h["loss_ksd"]).all()


@pytest.mark.slow
def test_sampled_engine_chunked_matches_single():
    bn = get_sprinkler_network()
    latent = ["C", "S", "R"]
    obs = {"W": 1}
    post = bn.posterior_vector(latent, obs)
    kw = dict(num_epochs=80, lr_born_machine=0.05, verbose=False,
              true_posterior_for_tvd=post)
    e1 = SampledKSDVariationalInference(bn, latent, ["W"], qbm_ansatz_layers=2,
                                        qbm_backend="einsum", num_samples=256,
                                        seed=0)
    e2 = SampledKSDVariationalInference(bn, latent, ["W"], qbm_ansatz_layers=2,
                                        qbm_backend="einsum", num_samples=256,
                                        seed=0)
    h1 = e1.train(obs, **kw)
    h2 = e2.train(obs, **kw, chunk_epochs=30)
    np.testing.assert_allclose(h1["loss_ksd"], h2["loss_ksd"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(e1.best_tvd_, e2.best_tvd_, rtol=1e-6, atol=1e-8)
    assert e1.best_epoch_ == e2.best_epoch_


@pytest.mark.slow
def test_sampled_engine_two_stage_converges():
    """Measurement-shot (two-stage) sampling trains to the same quality as
    the flat inverse-CDF path on the Sprinkler posterior."""
    bn = get_sprinkler_network()
    latent = ["C", "S", "R"]
    obs = {"W": 1}
    post = bn.posterior_vector(latent, obs)
    engine = SampledKSDVariationalInference(
        bn, latent, ["W"], qbm_ansatz_layers=2, qbm_backend="einsum",
        num_samples=1024, seed=0, sampling="two_stage")
    assert engine.sampling == "two_stage"
    h = engine.train(obs, num_epochs=500, lr_born_machine=0.05,
                     verbose=False, true_posterior_for_tvd=post)
    assert engine.best_tvd_ < 0.08, engine.best_tvd_
    assert np.isfinite(h["loss_ksd"]).all()


def test_sampled_engine_auto_sampling_thresholds():
    bn = get_sprinkler_network()
    small = SampledKSDVariationalInference(
        bn, ["C", "S", "R"], ["W"], qbm_ansatz_layers=1, qbm_backend="einsum")
    assert small.sampling == "flat"


@pytest.mark.slow
def test_sampled_engine_adjoint_grad_matches_autodiff():
    """qbm_grad_method='adjoint' (the O(1)-memory large-n backward,
    sim/blocked_adjoint.py) produces the same training trajectory as the
    checkpointed-autodiff path — same shots, same updates."""
    from tensornetworks_tpu.core import get_random_chain_network

    n = 8
    bn = get_random_chain_network(n + 1, seed=3)
    latent = [f"V{i}" for i in range(n)]
    obs = {f"V{n}": 1}
    post = bn.posterior_vector(latent, obs)
    kw = dict(num_epochs=60, lr_born_machine=0.05, verbose=False,
              true_posterior_for_tvd=post)
    e_adj = SampledKSDVariationalInference(
        bn, latent, [f"V{n}"], qbm_ansatz_layers=2, qbm_backend="blocked",
        num_samples=256, seed=0, qbm_grad_method="adjoint")
    assert e_adj.born_machine.grad_method == "adjoint"
    e_ad = SampledKSDVariationalInference(
        bn, latent, [f"V{n}"], qbm_ansatz_layers=2, qbm_backend="blocked",
        num_samples=256, seed=0, qbm_grad_method="autodiff")
    h_adj = e_adj.train(obs, **kw)
    h_ad = e_ad.train(obs, **kw)
    np.testing.assert_allclose(h_adj["loss_ksd"], h_ad["loss_ksd"],
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(e_adj.best_tvd_, e_ad.best_tvd_,
                               rtol=1e-3, atol=1e-4)


def test_sampled_engine_auto_grad_method_threshold():
    from tensornetworks_tpu.core import get_random_chain_network

    bn = get_random_chain_network(9, seed=0)
    small = SampledKSDVariationalInference(
        bn, [f"V{i}" for i in range(8)], ["V8"], qbm_ansatz_layers=1,
        qbm_backend="blocked")
    assert small.born_machine.grad_method == "autodiff"


def _loo_test_setup(n, bn_seed):
    bn = get_random_chain_network(n + 1, seed=bn_seed)
    latent = [f"V{i}" for i in range(n)]
    obs = {f"V{n}": 1}
    S = score_table(bn.conditional_joint_table(latent, obs))
    Kp = jnp.asarray(np.asarray(stein_gram_dense(S, n, 1.0, dtype=jnp.float64)))
    fn = make_latent_log_joint_fn(bn, latent, obs, dtype=jnp.float64)
    return Kp, fn


@pytest.mark.slow
def test_reinforce_loo_baseline_exactly_unbiased():
    """Full enumeration over all M=3 sample tuples: the loo baseline leaves
    E[grad surrogate] == grad(q^T K_p q) to fp precision, while the plain
    mean baseline is measurably O(1/M)-biased (w-bar couples to z_i)."""
    n, M = 2, 3
    Kp, fn = _loo_test_setup(n, bn_seed=2)
    logits0 = 0.7 * jax.random.normal(jax.random.PRNGKey(3), (1 << n,),
                                      dtype=jnp.float64)
    q0 = np.asarray(jax.nn.softmax(logits0))

    def exact(logits):
        q = jax.nn.softmax(logits)
        return q @ (Kp @ q)

    g_exact = np.asarray(jax.grad(exact)(logits0))

    def grad_for(idx_tuple, baseline):
        idx = jnp.asarray(idx_tuple, dtype=jnp.int32)

        def surr(logits):
            log_q = jax.nn.log_softmax(logits)[idx]
            Z = ((idx[:, None] >> jnp.arange(n - 1, -1, -1)) & 1)
            Sx = score_at_samples(fn, Z.astype(jnp.int32))
            gram = stein_gram_samples(Sx, Z.astype(jnp.float64), n, 1.0)
            return reinforce_surrogate(gram, log_q, baseline)

        return np.asarray(jax.grad(surr)(logits0))

    import itertools

    for baseline, expect_unbiased in (("loo", True), ("mean", False)):
        g_mean = np.zeros(1 << n)
        for tup in itertools.product(range(1 << n), repeat=M):
            w = float(np.prod([q0[i] for i in tup]))
            g_mean += w * grad_for(tup, baseline)
        bias = np.abs(g_mean - g_exact).max() / np.abs(g_exact).max()
        if expect_unbiased:
            assert bias < 1e-10, f"loo bias {bias}"
        else:
            assert bias > 1e-6, f"mean baseline unexpectedly unbiased: {bias}"


def test_reinforce_loo_baseline_reduces_variance():
    """Empirical gradient variance: the loo baseline sits measurably under
    no-baseline (measured ~13% here; the biased mean baseline cuts ~19% —
    the loo price for exact unbiasedness is a few points of variance)."""
    n, M = 4, 64
    Kp, fn = _loo_test_setup(n, bn_seed=6)
    logits0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (1 << n,),
                                      dtype=jnp.float64)

    @jax.jit
    def sampled_grad(key, baseline_id):
        def surr(logits):
            idx = jax.random.categorical(
                key, jax.lax.stop_gradient(logits), shape=(M,))
            log_q = jax.nn.log_softmax(logits)[idx]
            Z = ((idx[:, None] >> jnp.arange(n - 1, -1, -1)) & 1)
            Sx = score_at_samples(fn, Z.astype(jnp.int32))
            gram = stein_gram_samples(Sx, Z.astype(jnp.float64), n, 1.0)
            return jax.lax.switch(baseline_id, [
                lambda: reinforce_surrogate(gram, log_q, "none"),
                lambda: reinforce_surrogate(gram, log_q, "loo"),
            ])

        return jax.grad(surr)(logits0)

    keys = [jax.random.PRNGKey(k) for k in range(200)]
    g_none = np.stack([np.asarray(sampled_grad(k, 0)) for k in keys])
    g_loo = np.stack([np.asarray(sampled_grad(k, 1)) for k in keys])
    var_none = g_none.var(axis=0).sum()
    var_loo = g_loo.var(axis=0).sum()
    assert var_loo < 0.95 * var_none, (var_loo, var_none)


def test_reinforce_cv_weighted_gradient_equals_exact():
    """Control-variate correction algebra: for ANY fixed c(z) = c0 + z·β,
    the weighted (full-enumeration) surrogate with the exact-marginal
    correction term has gradient exactly ∇(qᵀ K_p q) — the subtraction and
    the restored expectation cancel identically."""
    n = 5
    bn = get_random_chain_network(n + 1, seed=1)
    latent = [f"V{i}" for i in range(n)]
    obs = {f"V{n}": 1}
    S = score_table(bn.conditional_joint_table(latent, obs))
    Kp = jnp.asarray(np.asarray(stein_gram_dense(S, n, 1.0, dtype=jnp.float64)))
    Zf = jnp.asarray(all_bitstrings(n), dtype=jnp.float64)
    logits0 = jax.random.normal(jax.random.PRNGKey(0), (1 << n,),
                                dtype=jnp.float64)
    beta = jax.random.normal(jax.random.PRNGKey(7), (n,), dtype=jnp.float64)
    c0 = 0.37

    def exact(logits):
        q = jax.nn.softmax(logits)
        return q @ (Kp @ q)

    def surrogate(logits):
        q = jax.nn.softmax(logits)
        log_q = jax.nn.log_softmax(logits)
        gram = stein_gram_samples(jnp.asarray(S), Zf, n, 1.0)
        g = jax.lax.stop_gradient(gram)
        w = g @ jax.lax.stop_gradient(q)
        c = c0 + Zf @ beta
        marg = q @ Zf  # exact differentiable bit marginals
        return (2.0 * (jax.lax.stop_gradient(q) * (w - c) * log_q).sum()
                + 2.0 * jnp.dot(beta, marg))

    g_exact = np.asarray(jax.grad(exact)(logits0))
    g_est = np.asarray(jax.grad(surrogate)(logits0))
    np.testing.assert_allclose(g_est, g_exact, rtol=1e-8,
                               atol=1e-10 * np.abs(g_exact).max())


def test_fit_linear_control_variate_recovers_linear_function():
    # An exactly-linear w is fit exactly (up to the relative ridge).
    key = jax.random.PRNGKey(2)
    Z = jax.random.bernoulli(key, 0.5, (256, 6)).astype(jnp.float64)
    beta_true = jnp.asarray([1.0, -2.0, 0.5, 0.0, 3.0, -1.0], jnp.float64)
    w = 4.2 + Z @ beta_true
    beta, wm, zm = fit_linear_control_variate(w, Z, ridge=1e-10)
    np.testing.assert_allclose(np.asarray(beta), np.asarray(beta_true),
                               rtol=1e-6, atol=1e-7)
    pred = float(wm) + (Z - zm) @ beta
    np.testing.assert_allclose(np.asarray(pred), np.asarray(w),
                               rtol=1e-6, atol=1e-6)


def test_reinforce_cv_baseline_reduces_variance_below_loo():
    """The regression control variate removes the z-dependent part of
    w(z) = E[k_p(z, ·)] that the constant loo baseline cannot — measured
    here as a strict empirical gradient-variance reduction vs loo."""
    n, M = 4, 64
    Kp, fn = _loo_test_setup(n, bn_seed=6)
    Zf = jnp.asarray(all_bitstrings(n), dtype=jnp.float64)
    logits0 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (1 << n,),
                                      dtype=jnp.float64)

    @jax.jit
    def sampled_grad(key, use_cv):
        def surr(logits):
            idx = jax.random.categorical(
                key, jax.lax.stop_gradient(logits), shape=(M,))
            log_q = jax.nn.log_softmax(logits)[idx]
            Z = ((idx[:, None] >> jnp.arange(n - 1, -1, -1)) & 1)
            Sx = score_at_samples(fn, Z.astype(jnp.int32))
            gram = stein_gram_samples(Sx, Z.astype(jnp.float64), n, 1.0)
            marg = jax.nn.softmax(logits) @ Zf
            return jax.lax.cond(
                use_cv,
                lambda: reinforce_surrogate_cv(gram, log_q,
                                               Z.astype(jnp.float64), marg),
                lambda: reinforce_surrogate(gram, log_q, "loo"))

        return jax.grad(surr)(logits0)

    keys = [jax.random.PRNGKey(k) for k in range(200)]
    g_loo = np.stack([np.asarray(sampled_grad(k, False)) for k in keys])
    g_cv = np.stack([np.asarray(sampled_grad(k, True)) for k in keys])
    var_loo = g_loo.var(axis=0).sum()
    var_cv = g_cv.var(axis=0).sum()
    assert var_cv < 0.9 * var_loo, (var_cv, var_loo)
    # And the cv estimator's mean stays on the exact gradient (fit-coupling
    # bias is O(1/M) — small at M=64).
    def exact(logits):
        q = jax.nn.softmax(logits)
        return q @ (Kp @ q)
    g_exact = np.asarray(jax.grad(exact)(logits0))
    rel = np.abs(g_cv.mean(axis=0) - g_exact).max() / np.abs(g_exact).max()
    assert rel < 0.15, rel


@pytest.mark.slow
def test_sampled_engine_cv_baseline_converges():
    bn = get_sprinkler_network()
    latent = ["C", "S", "R"]
    obs = {"W": 1}
    post = bn.posterior_vector(latent, obs)
    engine = SampledKSDVariationalInference(
        bn, latent, ["W"], qbm_ansatz_layers=2, qbm_backend="einsum",
        num_samples=1024, seed=0, grad_baseline="cv")
    h = engine.train(obs, num_epochs=500, lr_born_machine=0.05,
                     verbose=False, true_posterior_for_tvd=post)
    assert engine.best_tvd_ < 0.08, engine.best_tvd_
    assert np.isfinite(h["loss_ksd"]).all()


def test_sampled_engine_eval_reuse_matches_second_forward():
    """reuse_loss_forward_for_eval changes no update (same shots, same
    grads): its TVD history is the plain run's shifted one epoch, and the
    post-scan final eval restores the identical across-run best."""
    bn = get_sprinkler_network()
    latent = ["C", "S", "R"]
    obs = {"W": 1}
    post = bn.posterior_vector(latent, obs)
    kw = dict(num_epochs=60, lr_born_machine=0.05, verbose=False,
              true_posterior_for_tvd=post)
    mk = lambda: SampledKSDVariationalInference(
        bn, latent, ["W"], qbm_ansatz_layers=2, qbm_backend="einsum",
        num_samples=256, seed=0)
    e1, e2 = mk(), mk()
    h1 = e1.train(obs, **kw)
    h2 = e2.train(obs, **kw, reuse_loss_forward_for_eval=True)
    np.testing.assert_allclose(h1["loss_ksd"], h2["loss_ksd"],
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(h2["tvd"][1:], h1["tvd"][:-1],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(e1.best_tvd_, e2.best_tvd_,
                               rtol=1e-5, atol=1e-6)


def test_reinforce_surrogate_rejects_unknown_baseline():
    g = jnp.eye(4, dtype=jnp.float64)
    lq = jnp.zeros(4, dtype=jnp.float64)
    with pytest.raises(ValueError):
        reinforce_surrogate(g, lq, "ema")
    with pytest.raises(ValueError):
        SampledKSDVariationalInference(
            get_sprinkler_network(), ["C", "S", "R"], ["W"],
            qbm_ansatz_layers=1, qbm_backend="einsum", grad_baseline="ema")

"""End-to-end engine tests: the reference's oracle-based evaluation pattern
(SURVEY.md §4.2) — train against the exact enumerated Sprinkler posterior and
assert convergence of TVD / loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import get_sprinkler_network
from tensornetworks_tpu.engines import (
    AdversarialVariationalInference,
    KSDVariationalInference,
    QuantumKSDVariationalInference,
)
from tensornetworks_tpu.engines.common import cosine_lr_schedule


@pytest.fixture(scope="module")
def sprinkler():
    bn = get_sprinkler_network()
    post, p_obs = bn.get_true_posterior(["C", "S", "R"], {"W": 1})
    return bn, post


def test_cosine_schedule_matches_torch_semantics():
    sched = cosine_lr_schedule(0.01, 100)
    assert abs(float(sched(0)) - 0.01) < 1e-9
    # Midpoint: eta_min + (lr-eta_min)/2
    assert abs(float(sched(50)) - (0.001 + 0.009 / 2)) < 1e-9
    assert abs(float(sched(100)) - 0.001) < 1e-9
    # steps_per_epoch mapping
    sched5 = cosine_lr_schedule(0.01, 100, steps_per_epoch=5)
    assert abs(float(sched5(250)) - float(sched(50))) < 1e-12


def test_classical_ksd_converges(sprinkler):
    bn, post = sprinkler
    m = KSDVariationalInference(
        bn, ["C", "S", "R"], ["W"],
        born_machine_config={"use_logits": True, "conditioning_dim": 0},
    )
    h = m.train({"W": 1}, num_epochs=1200, lr_born_machine=5e-3, verbose=False,
                true_posterior_for_tvd=post, gradient_clip_norm=5.0,
                entropy_weight=1e-3, patience=200)
    assert h["loss_ksd"][-1] < h["loss_ksd"][0] * 0.2
    assert m.best_tvd_ < 0.15
    # Fixed-probs restore: reported dict must match best snapshot.
    d = m.get_prob_dict()
    assert abs(sum(d.values()) - 1.0) < 1e-5


def test_classical_ksd_conditional_runs(sprinkler):
    bn, post = sprinkler
    m = KSDVariationalInference(
        bn, ["C", "S", "R"], ["W"],
        born_machine_config={
            "use_logits": True, "conditioning_dim": 1,
            "init_method": "uniform", "hidden_dims": None, "use_layer_norm": False,
        },
    )
    h = m.train({"W": 1}, num_epochs=150, lr_born_machine=3e-3, verbose=False,
                true_posterior_for_tvd=post, entropy_weight=1e-3)
    assert len(h["loss_ksd"]) == 150
    assert np.isfinite(h["loss_ksd"]).all()
    assert h["tvd"][-1] < h["tvd"][0]


def test_quantum_ksd_converges(sprinkler):
    bn, post = sprinkler
    m = QuantumKSDVariationalInference(
        bn, ["C", "S", "R"], ["W"], qbm_num_latent_vars=3,
        qbm_ansatz_layers=2, qbm_ansatz_type="hardware_efficient",
        qbm_init_method="small_random",
    )
    h = m.train({"W": 1}, num_epochs=400, lr_born_machine=5e-3, verbose=False,
                true_posterior_for_tvd=post, gradient_clip_norm=10.0)
    assert h["loss_ksd"][-1] < h["loss_ksd"][0] * 0.5
    assert m.best_tvd_ < 0.35
    d = m.get_prob_dict()
    assert abs(sum(d.values()) - 1.0) < 1e-5


@pytest.mark.slow
def test_adversarial_converges(sprinkler):
    bn, post = sprinkler
    m = AdversarialVariationalInference(
        bn, ["C", "S", "R"], ["W"],
        born_machine_config={"use_logits": True, "conditioning_dim": 1,
                             "init_method": "uniform"},
        classifier_config={"hidden_dims": [32, 16], "use_batch_norm": False},
    )
    h = m.train({"W": 1}, num_epochs=250, batch_size=100, lr_born_machine=3e-3,
                lr_classifier=3e-2, k_classifier_steps=5, k_born_steps=1,
                verbose=False, true_posterior_for_tvd=post,
                gradient_clip_norm=5.0, baseline_decay=0.95, adam_betas=(0.5, 0.999))
    assert m.best_tvd_ < 0.08
    assert np.isfinite(h["loss_classifier"]).all()


def test_early_stopping_truncates_history(sprinkler):
    bn, post = sprinkler
    m = KSDVariationalInference(
        bn, ["C", "S", "R"], ["W"],
        born_machine_config={"use_logits": True, "conditioning_dim": 0},
    )
    # patience 5 after epoch 300 -> must stop well before 2000.
    h = m.train({"W": 1}, num_epochs=2000, lr_born_machine=5e-3, verbose=False,
                true_posterior_for_tvd=post, entropy_weight=1e-3, patience=5)
    assert len(h["loss_ksd"]) < 2000


def test_prior_tabulation_matches_reference_semantics(sprinkler):
    bn, post = sprinkler
    m = AdversarialVariationalInference(
        bn, ["C", "S", "R"], ["W"],
        born_machine_config={"use_logits": True, "conditioning_dim": 0},
        classifier_config={"hidden_dims": [16, 8]},
    )
    # p(z) marginal over C,S,R: P(C=1,S=0,R=1) = 0.5*0.9*0.8 = 0.36
    assert abs(m.prior_z_dist_dict[(1, 0, 1)] - 0.36) < 1e-10
    # log p(x|z) table spot check: z=(1,0,1): p(W=1|S=0,R=1) = 0.9
    table = m._log_p_x_given_z_table({"W": 1})
    assert abs(table[0b101] - np.log(0.9 + 1e-9)) < 1e-6


@pytest.mark.slow
def test_eval_reuse_matches_two_forward_path():
    """reuse_loss_forward_for_eval must give the SAME tvd history, best
    snapshot, and final params as the two-forward path (the quantum forward
    is deterministic, so the reused loss forward equals the separate eval)."""
    import jax
    import jax.numpy as jnp
    from tensornetworks_tpu.core import get_sprinkler_network
    from tensornetworks_tpu.engines.common import make_optimizer
    from tensornetworks_tpu.engines.ksd import run_ksd_scan
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.ops import SteinOperator, score_table

    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    op = SteinOperator(score_table(t), 3, 1.0)
    pv = jnp.asarray(bn.posterior_vector(["C", "S", "R"], {"W": 1}),
                     dtype=jnp.float32)
    qbm = QuantumBornMachine(3, ansatz_layers=2)
    p0 = qbm.init(jax.random.PRNGKey(1))
    kw = dict(
        probs_fn=lambda p, rng: qbm.probs(p).astype(jnp.float32),
        eval_probs_fn=lambda p: qbm.probs(p).astype(jnp.float32),
        params0=p0, op=op, num_epochs=30,
        optimizer=make_optimizer("adam", 5e-3, 30, True, (0.9, 0.999), 10.0),
        entropy_weight=None, posterior_vec=pv, early_stopping=False,
        patience=0, key=jax.random.PRNGKey(0))
    a = run_ksd_scan(**kw, reuse_loss_forward_for_eval=False)
    b = run_ksd_scan(**kw, reuse_loss_forward_for_eval=True)
    # ULP-level tolerance: the best 2^n probs vector is no longer carried
    # through the scan, so XLA may fuse the eval forward differently between
    # the two paths (semantically identical; bitwise equality is not a JAX
    # guarantee across fusion choices).
    np.testing.assert_allclose(np.asarray(a["tvd"]), np.asarray(b["tvd"]),
                               rtol=3e-7, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(a["params"]), np.asarray(b["params"]))
    np.testing.assert_array_equal(np.asarray(a["best_params"]),
                                  np.asarray(b["best_params"]))
    np.testing.assert_allclose(float(a["best_tvd"]), float(b["best_tvd"]),
                               rtol=3e-7, atol=1e-7)
    assert int(a["best_epoch"]) == int(b["best_epoch"])


@pytest.mark.slow
def test_eval_convention_noisy_matches_deterministic_without_dropout():
    """With dropout_rate=0 the train-mode forward IS the deterministic
    forward, so both evaluation conventions must produce identical histories
    (mechanical check of the BASELINE.md attribution-study plumbing)."""
    from tensornetworks_tpu.core import get_sprinkler_network
    from tensornetworks_tpu.engines import KSDVariationalInference

    bn = get_sprinkler_network()
    post, _ = bn.get_true_posterior(["C", "S", "R"], {"W": 1})

    def run(conv):
        m = KSDVariationalInference(
            bn, ["C", "S", "R"], ["W"],
            born_machine_config={"use_logits": True, "conditioning_dim": 1,
                                 "dropout_rate": 0.0}, seed=0)
        m.train({"W": 1}, num_epochs=40, lr_born_machine=3e-3, verbose=False,
                true_posterior_for_tvd=post, eval_convention=conv)
        return m

    a, b = run("deterministic"), run("train_noisy")
    np.testing.assert_allclose(np.asarray(a.history_["tvd"]),
                               np.asarray(b.history_["tvd"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(a.best_tvd_, b.best_tvd_, rtol=1e-6)


@pytest.mark.slow
def test_eval_convention_noisy_differs_with_dropout():
    """With dropout active, the noisy convention evaluates a different
    (stochastic) distribution — histories must differ, and the run completes
    with a finite best (the reference-convention replication path)."""
    from tensornetworks_tpu.core import get_sprinkler_network
    from tensornetworks_tpu.engines import KSDVariationalInference

    bn = get_sprinkler_network()
    post, _ = bn.get_true_posterior(["C", "S", "R"], {"W": 1})

    def run(conv):
        m = KSDVariationalInference(
            bn, ["C", "S", "R"], ["W"],
            born_machine_config={"use_logits": True, "conditioning_dim": 1},
            seed=0)
        m.train({"W": 1}, num_epochs=40, lr_born_machine=3e-3, verbose=False,
                true_posterior_for_tvd=post, eval_convention=conv)
        return m

    a, b = run("deterministic"), run("train_noisy")
    assert np.isfinite(b.best_tvd_)
    assert not np.allclose(np.asarray(a.history_["tvd"]),
                           np.asarray(b.history_["tvd"]))


@pytest.mark.slow
def test_chunk_carry_has_no_weak_types():
    """A weak-typed scalar in the scan carry makes chunk 1 recompile the
    whole chunk program (the step returns strong int32, changing the carry
    aval after the first dispatch) — measured as a second full ~40 s compile
    at 20q. Pin: every init-carry leaf the quantum/classical KSD scan uses
    must already be strong-typed, and one epoch_step application must map
    the carry to IDENTICAL avals."""
    import jax

    from tensornetworks_tpu.core import get_sprinkler_network
    from tensornetworks_tpu.engines.ksd import run_ksd_scan
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.ops.stein import SteinOperator, score_table

    bn = get_sprinkler_network()
    latent = ["C", "S", "R"]
    t = bn.conditional_joint_table(latent, {"W": 1})
    op = SteinOperator(score_table(t), 3)
    qbm = QuantumBornMachine(3, ansatz_layers=1, backend="einsum")
    p0 = qbm.init(jax.random.PRNGKey(0))
    post = jnp.asarray(t.reshape(-1) / t.sum(), jnp.float32)
    import optax

    traces = []

    def probs_fn(p, rng):
        traces.append(1)  # counts retraces of the chunk program
        return qbm.probs(p).astype(jnp.float32)

    out = run_ksd_scan(
        probs_fn=probs_fn,
        eval_probs_fn=lambda p: qbm.probs(p).astype(jnp.float32),
        params0=p0, op=op, num_epochs=40,
        optimizer=optax.adam(0.05), entropy_weight=None,
        posterior_vec=post, early_stopping=False, patience=10,
        stein_args=op.args(), chunk_epochs=10,
        reuse_loss_forward_for_eval=True)
    assert np.isfinite(out["best_tvd"])
    # one trace for the chunk program — NOT one per chunk
    assert sum(traces) == 1, f"chunk program retraced {sum(traces)} times"


def test_advi_log_p_floor_noop_when_finite(sprinkler):
    """log_p_floor (round-4 large-n REINFORCE enablement) is exact wherever
    the reference's table is finite: on Sprinkler (all finite) a huge floor
    reproduces the unfloored run bit-identically."""
    bn, post = sprinkler

    def mk():
        return AdversarialVariationalInference(
            bn, ["C", "S", "R"], ["W"],
            born_machine_config={"use_logits": True, "conditioning_dim": 0,
                                 "init_method": "small_random"},
            classifier_config={"hidden_dims": [8], "use_batch_norm": False},
            seed=0)

    kw = dict(num_epochs=25, batch_size=32, lr_born_machine=3e-3,
              lr_classifier=3e-2, verbose=False, true_posterior_for_tvd=post)
    e1, e2 = mk(), mk()
    h1 = e1.train({"W": 1}, **kw)
    h2 = e2.train({"W": 1}, **kw, log_p_floor=60.0)
    np.testing.assert_array_equal(h1["loss_born_machine"],
                                  h2["loss_born_machine"])
    # And the clamp really flattens infinities when they exist.
    table = e1._log_p_x_given_z_table({"W": 1})
    clamped = np.clip(table, -60.0, 60.0)
    assert np.isfinite(clamped).all()

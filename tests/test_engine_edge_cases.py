"""Engine edge cases: no-oracle training (tvd untracked), resume workflow,
invalid observation keys."""

import numpy as np
import pytest

from tensornetworks_tpu.core import get_sprinkler_network
from tensornetworks_tpu.engines import (
    KSDVariationalInference,
    QuantumKSDVariationalInference,
)


def test_training_without_posterior_oracle():
    bn = get_sprinkler_network()
    m = QuantumKSDVariationalInference(bn, ["C", "S", "R"], ["W"],
                                       qbm_num_latent_vars=3, qbm_ansatz_layers=1)
    h = m.train({"W": 1}, num_epochs=15, lr_born_machine=5e-3, verbose=False,
                true_posterior_for_tvd=None)
    # TVD column is NaN (adversarial_vi.py:254 semantics) and no restore ran.
    assert np.isnan(h["tvd"]).all()
    assert np.isfinite(h["loss_ksd"]).all()


def test_observation_key_validation():
    bn = get_sprinkler_network()
    m = KSDVariationalInference(bn, ["C", "S", "R"], ["W"],
                                born_machine_config={"conditioning_dim": 0})
    with pytest.raises(ValueError):
        m.train({"R": 1}, num_epochs=5, lr_born_machine=1e-2, verbose=False)


def test_resume_from_params():
    # Engines resume by assigning `.params` before train() — continuing
    # training must start from the assigned parameters.
    bn = get_sprinkler_network()
    post, _ = bn.get_true_posterior(["C", "S", "R"], {"W": 1})
    m = QuantumKSDVariationalInference(bn, ["C", "S", "R"], ["W"],
                                       qbm_num_latent_vars=3, qbm_ansatz_layers=1)
    m.train({"W": 1}, num_epochs=30, lr_born_machine=5e-3, verbose=False,
            true_posterior_for_tvd=post)
    mid_params = np.asarray(m.params).copy()

    m2 = QuantumKSDVariationalInference(bn, ["C", "S", "R"], ["W"],
                                        qbm_num_latent_vars=3, qbm_ansatz_layers=1)
    m2.params = m.params
    h2 = m2.train({"W": 1}, num_epochs=10, lr_born_machine=5e-3, verbose=False,
                  true_posterior_for_tvd=post)
    # Loss continues from roughly where run 1 ended, far below a fresh start.
    assert h2["loss_ksd"][0] < m.history_["loss_ksd"][0] * 0.9
    assert not np.allclose(np.asarray(m2.params), mid_params)


def test_zero_observed_vars_targets_prior():
    # No evidence: the "posterior" is the marginal prior p(z) — the KSD
    # engine must fit it (reference compute_prob_joint_xz handles empty x,
    # stein_utils.py:62).
    bn = get_sprinkler_network()
    m = QuantumKSDVariationalInference(bn, ["C", "S", "R"], [],
                                       qbm_num_latent_vars=3, qbm_ansatz_layers=3)
    prior = bn.posterior_vector(["C", "S", "R"], {})
    h = m.train({}, num_epochs=400, lr_born_machine=5e-3, verbose=False,
                true_posterior_for_tvd=prior)
    assert m.best_tvd_ < 0.2
    assert h["tvd"][-1] < h["tvd"][0] * 0.5


def test_no_large_embedded_constants():
    # Regression guard for the n>=22 HLO-size blowup: with tables passed as
    # jit arguments, the traced program must not embed multi-MB constants.
    import jax
    import jax.numpy as jnp
    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.models import QuantumBornMachine
    from tensornetworks_tpu.ops import SteinOperator, score_table

    n = 12
    bnet = get_random_chain_network(n + 1, seed=0)
    t = bnet.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
    op = SteinOperator(score_table(t), n, dense=False)
    qbm = QuantumBornMachine(n, ansatz_layers=2)
    params = qbm.init(jax.random.PRNGKey(0))

    def loss(p, tables):
        return op.ksd_loss_from(qbm.probs(p).astype(jnp.float32), *tables)

    def const_bytes_for(nn):
        bnet2 = get_random_chain_network(nn + 1, seed=0)
        t2 = bnet2.conditional_joint_table([f"V{i}" for i in range(nn)], {f"V{nn}": 1})
        op2 = SteinOperator(score_table(t2), nn, dense=False)
        qbm2 = QuantumBornMachine(nn, ansatz_layers=2)
        p2 = qbm2.init(jax.random.PRNGKey(0))

        def loss2(p, tables):
            return op2.ksd_loss_from(qbm2.probs(p).astype(jnp.float32), *tables)

        closed = jax.make_jaxpr(loss2)(p2, op2.args())
        return sum(getattr(np.asarray(c), "nbytes", 0) for c in closed.consts)

    # Only fixed-size constants remain (256x256 block matrices, 128x128 kron
    # powers) — a few MB, independent of n.
    b10, b12 = const_bytes_for(10), const_bytes_for(12)
    assert b12 < 8_000_000, f"{b12} bytes of embedded constants"
    assert b12 <= b10 * 1.5, f"constants scale with n: {b10} -> {b12}"

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

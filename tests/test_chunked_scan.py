"""chunk_epochs: split device programs must reproduce the single-scan run
(carry — params, optimizer/schedule state, best snapshot — flows across
chunks unchanged)."""

import pytest
import numpy as np
import jax.numpy as jnp

from tensornetworks_tpu.core import get_sprinkler_network
from tensornetworks_tpu.engines import (KSDVariationalInference,
                                        QuantumKSDVariationalInference)


def _mk(quantum):
    bn = get_sprinkler_network()
    latent, obs = ["C", "S", "R"], {"W": 1}
    post = bn.posterior_vector(latent, obs)
    if quantum:
        eng = lambda: QuantumKSDVariationalInference(
            bn, latent, ["W"], qbm_num_latent_vars=3, qbm_ansatz_layers=2,
            seed=0)
    else:
        eng = lambda: KSDVariationalInference(
            bn, latent, ["W"], born_machine_config={"use_logits": True}, seed=0)
    return eng, obs, post


def _histories_match(h1, h2, e1, e2):
    np.testing.assert_allclose(h1["loss_ksd"], h2["loss_ksd"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(h1["tvd"], h2["tvd"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(e1.best_tvd_, e2.best_tvd_, rtol=1e-6, atol=1e-8)
    assert e1.best_epoch_ == e2.best_epoch_


def test_chunked_classical_matches_single_scan():
    eng, obs, post = _mk(quantum=False)
    e1, e2 = eng(), eng()
    kw = dict(num_epochs=120, lr_born_machine=0.1, verbose=False,
              true_posterior_for_tvd=post)
    h1 = e1.train(obs, **kw)
    h2 = e2.train(obs, **kw, chunk_epochs=50)  # uneven last chunk on purpose
    _histories_match(h1, h2, e1, e2)


def test_chunked_quantum_matches_single_scan():
    eng, obs, post = _mk(quantum=True)
    e1, e2 = eng(), eng()
    kw = dict(num_epochs=90, lr_born_machine=0.05, verbose=False,
              true_posterior_for_tvd=post)
    h1 = e1.train(obs, **kw)
    h2 = e2.train(obs, **kw, chunk_epochs=30)
    _histories_match(h1, h2, e1, e2)


def test_chunked_without_tracking():
    eng, obs, _ = _mk(quantum=False)
    e = eng()
    h = e.train(obs, num_epochs=60, lr_born_machine=0.1, verbose=False,
                chunk_epochs=25)
    assert len(h["loss_ksd"]) == 60
    assert np.isfinite(h["loss_ksd"]).all()


@pytest.mark.slow
def test_chunked_adversarial_matches_single_scan(tmp_path):
    """ADVI chunking (round-4): chunked dispatch — and a chunked run resumed
    mid-way from its durable snapshot — must reproduce the single-scan run
    exactly (both optimizers' schedule counts, the EMA baseline, the RNG
    stream and the best snapshots all ride the carry)."""
    from tensornetworks_tpu.engines import AdversarialVariationalInference

    bn = get_sprinkler_network()
    latent, obs = ["C", "S", "R"], {"W": 1}
    post = bn.posterior_vector(latent, obs)

    def mk():
        return AdversarialVariationalInference(
            bn, latent, ["W"],
            born_machine_config={"use_logits": True, "conditioning_dim": 1,
                                 "init_method": "uniform"},
            classifier_config={"hidden_dims": [16, 8],
                               "use_batch_norm": False},
            seed=0)

    kw = dict(num_epochs=70, batch_size=64, lr_born_machine=3e-3,
              lr_classifier=3e-2, k_classifier_steps=2, k_born_steps=1,
              verbose=False, true_posterior_for_tvd=post,
              gradient_clip_norm=5.0, baseline_decay=0.95,
              adam_betas=(0.5, 0.999))
    e1, e2, e3 = mk(), mk(), mk()
    h1 = e1.train(obs, **kw)
    h2 = e2.train(obs, **kw, chunk_epochs=30)  # uneven last chunk on purpose

    for k in ("loss_classifier", "loss_born_machine", "tvd"):
        np.testing.assert_allclose(h1[k], h2[k], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(e1.best_tvd_, e2.best_tvd_, rtol=1e-6, atol=1e-8)
    assert e1.best_epoch_ == e2.best_epoch_

    # Fault-injected resume: kill after 1 chunk, resume from the snapshot —
    # the resumed run must replay bit-identically to the uninterrupted one.
    import os
    state = str(tmp_path / "advi_resume.npz")
    with pytest.raises(RuntimeError, match="fault injection"):
        e3.train(obs, **kw, chunk_epochs=30, resume_state_path=state,
                 fail_after_chunks=1)
    assert os.path.exists(state)
    h3 = e3.train(obs, **kw, chunk_epochs=30, resume_state_path=state)
    assert not os.path.exists(state)  # removed on successful completion
    for k in ("loss_classifier", "loss_born_machine", "tvd"):
        np.testing.assert_allclose(h1[k], h3[k], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(e3.best_tvd_, e1.best_tvd_, rtol=1e-6,
                               atol=1e-8)


def test_chunked_adversarial_smoke():
    """Fast-lane coverage of the ADVI chunked path (the full bit-identity +
    fault-injected-resume test is slow-lane)."""
    from tensornetworks_tpu.engines import AdversarialVariationalInference

    bn = get_sprinkler_network()
    m = AdversarialVariationalInference(
        bn, ["C", "S", "R"], ["W"],
        born_machine_config={"use_logits": True, "conditioning_dim": 0,
                             "init_method": "small_random"},
        classifier_config={"hidden_dims": [8], "use_batch_norm": False},
        seed=0)
    h = m.train({"W": 1}, num_epochs=20, batch_size=32, lr_born_machine=3e-3,
                lr_classifier=3e-2, verbose=False, chunk_epochs=8)
    assert len(h["loss_classifier"]) == 20
    assert np.isfinite(h["loss_classifier"]).all()
    assert "epochs_per_sec_steady" in h

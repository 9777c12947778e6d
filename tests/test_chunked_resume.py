"""Chunked-mode durability: early-stop breaks the chunk loop (post-stop
epochs are never dispatched) and an interrupted run resumes bit-identically
from the per-chunk .npz snapshot (reference break semantics:
``ksd_vi.py:178-184``; the reference has no resume at all — SURVEY.md §5.4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import get_sprinkler_network
from tensornetworks_tpu.engines import KSDVariationalInference
import tensornetworks_tpu.engines.ksd as ksd_mod
from tensornetworks_tpu.engines.common import make_optimizer
from tensornetworks_tpu.ops.stein import SteinOperator, score_table


def _engine():
    bn = get_sprinkler_network()
    return KSDVariationalInference(
        bn, ["C", "S", "R"], ["W"], born_machine_config={"use_logits": True},
        seed=0), {"W": 1}, bn.posterior_vector(["C", "S", "R"], {"W": 1})


def _low_level_run(chunk_epochs, **overrides):
    """run_ksd_scan on a softmax toy model so early-stop thresholds are
    controllable (the engine pins min_epochs_before_stop=300)."""
    bn = get_sprinkler_network()
    obs = {"W": 1}
    t = bn.conditional_joint_table(["C", "S", "R"], obs)
    op = SteinOperator(score_table(t), 3, 1.0)
    pv = jnp.asarray(bn.posterior_vector(["C", "S", "R"], obs))
    kw = dict(
        probs_fn=lambda p, rng: jax.nn.softmax(p),
        eval_probs_fn=jax.nn.softmax,
        params0=jnp.zeros(8, dtype=pv.dtype),
        op=op, num_epochs=200,
        optimizer=make_optimizer("adam", 0.05, 200, True, (0.9, 0.999), 10.0),
        entropy_weight=None, posterior_vec=pv, early_stopping=True,
        patience=3, min_epochs_before_stop=0, chunk_epochs=chunk_epochs,
    )
    kw.update(overrides)
    return ksd_mod.run_ksd_scan(**kw)


def test_chunked_early_stop_skips_remaining_chunks():
    full = _low_level_run(chunk_epochs=None)
    stopped = np.asarray(full["stopped"])
    assert stopped.any(), "test setup: early stop must trigger"
    chunked = _low_level_run(chunk_epochs=25)
    # the chunk loop broke: history ends at the stopping chunk's boundary
    n_rec = len(np.asarray(chunked["loss_ksd"]))
    assert n_rec < 200
    assert n_rec % 25 == 0
    # carry state is identical to the full scan (post-stop epochs are no-ops)
    np.testing.assert_array_equal(np.asarray(full["params"]),
                                  np.asarray(chunked["params"]))
    np.testing.assert_array_equal(np.asarray(full["best_probs"]),
                                  np.asarray(chunked["best_probs"]))
    assert int(full["best_epoch"]) == int(chunked["best_epoch"])


def test_chunked_resume_bit_identical(tmp_path, monkeypatch):
    eng_fn = lambda: _engine()[0]
    _, obs, post = _engine()
    kw = dict(num_epochs=120, lr_born_machine=0.1, verbose=False,
              true_posterior_for_tvd=post, chunk_epochs=40)

    e_ref = eng_fn()
    h_ref = e_ref.train(obs, **kw)

    state = str(tmp_path / "chunks.npz")
    e2 = eng_fn()
    orig = ksd_mod.run_ksd_scan
    monkeypatch.setattr(ksd_mod, "run_ksd_scan",
                        lambda **k: orig(**k, fail_after_chunks=2))
    with pytest.raises(RuntimeError, match="fault injection"):
        e2.train(obs, **kw, resume_state_path=state)
    monkeypatch.setattr(ksd_mod, "run_ksd_scan", orig)
    assert os.path.exists(state)

    h2 = e2.train(obs, **kw, resume_state_path=state)
    assert not os.path.exists(state)  # cleaned up on success
    np.testing.assert_array_equal(h_ref["loss_ksd"], h2["loss_ksd"])
    np.testing.assert_array_equal(h_ref["tvd"], h2["tvd"])
    assert e_ref.best_epoch_ == e2.best_epoch_
    assert e_ref.best_tvd_ == e2.best_tvd_
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), e_ref.best_params_, e2.best_params_)


def test_resume_requires_chunking():
    e, obs, post = _engine()
    with pytest.raises(ValueError, match="chunk_epochs"):
        e.train(obs, num_epochs=10, lr_born_machine=0.1, verbose=False,
                resume_state_path="/tmp/nope.npz")


@pytest.mark.slow
def test_tempered_schedule_identity_and_anneal():
    """betas=[1.0] must be bit-identical to the untempered chunked run; an
    annealed schedule must still track TVD against the true posterior and
    train to a finite result."""
    import numpy as np
    import jax.numpy as jnp
    from tensornetworks_tpu.core import get_sprinkler_network
    from tensornetworks_tpu.engines.ksd_quantum import KSDVariationalInference

    bn = get_sprinkler_network()
    post = bn.posterior_vector(["C", "S", "R"], {"W": 1})

    def make():
        return KSDVariationalInference(
            bn, ["C", "S", "R"], ["W"], qbm_num_latent_vars=3,
            qbm_ansatz_layers=2, seed=0)

    h_plain = make().train({"W": 1}, num_epochs=40, lr_born_machine=5e-3,
                           verbose=False, true_posterior_for_tvd=post,
                           chunk_epochs=10)
    h_b1 = make().train({"W": 1}, num_epochs=40, lr_born_machine=5e-3,
                        verbose=False, true_posterior_for_tvd=post,
                        chunk_epochs=10, temper_betas=[1.0])
    np.testing.assert_array_equal(np.asarray(h_plain["loss_ksd"]),
                                  np.asarray(h_b1["loss_ksd"]))
    np.testing.assert_array_equal(np.asarray(h_plain["tvd"]),
                                  np.asarray(h_b1["tvd"]))

    eng = make()
    h_ann = eng.train({"W": 1}, num_epochs=40, lr_born_machine=5e-3,
                      verbose=False, true_posterior_for_tvd=post,
                      chunk_epochs=10, temper_betas=[0.25, 0.5, 0.75, 1.0])
    assert np.all(np.isfinite(np.asarray(h_ann["loss_ksd"])))
    # the β=0.25 chunk optimizes a flatter target, so its KSD values differ
    # from the untempered run
    assert not np.allclose(np.asarray(h_ann["loss_ksd"])[:10],
                           np.asarray(h_plain["loss_ksd"])[:10])
    assert np.isfinite(eng.best_tvd_)

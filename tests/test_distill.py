"""Distribution distillation (engines/distill.py): direct fits of classical
and quantum Born machines to exact targets, plus the warm-start workflow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import get_random_chain_network
from tensornetworks_tpu.engines import fit_born_machine, KSDVariationalInference
from tensornetworks_tpu.models import ClassicalBornMachine, QuantumBornMachine


def _target(n=4, seed=0):
    bn = get_random_chain_network(n + 1, seed=seed)
    latent = [f"V{i}" for i in range(n)]
    return bn, latent, bn.posterior_vector(latent, {f"V{n}": 1})


def test_distill_classical_tvd():
    _, _, target = _target()
    bm = ClassicalBornMachine(num_latent_vars=4, use_logits=True)
    params, hist = fit_born_machine(bm, target, num_epochs=400, lr=0.1)
    assert hist["best_tvd"] < 0.02
    q = np.asarray(bm.probs(params))
    assert 0.5 * np.abs(q - np.asarray(target)).sum() < 0.02


def test_distill_classical_kl_and_l2():
    _, _, target = _target(seed=2)
    bm = ClassicalBornMachine(num_latent_vars=4, use_logits=True)
    for loss in ("kl", "l2"):
        _, hist = fit_born_machine(bm, target, num_epochs=400, lr=0.1, loss=loss)
        assert hist["best_tvd"] < 0.05, loss


def test_distill_quantum():
    _, _, target = _target(seed=1)
    bm = QuantumBornMachine(num_latent_vars=4, ansatz_layers=3, backend="einsum")
    params, hist = fit_born_machine(bm, target, num_epochs=400, lr=0.05)
    assert hist["best_tvd"] < 0.1
    # best-snapshot consistency: returned params reproduce best_tvd
    q = np.asarray(bm.probs(params))
    tvd = 0.5 * np.abs(q - np.asarray(target)).sum()
    np.testing.assert_allclose(tvd, hist["best_tvd"], atol=1e-5)


def test_distill_rejects_unknown_loss():
    _, _, target = _target()
    bm = ClassicalBornMachine(num_latent_vars=4)
    with pytest.raises(ValueError):
        fit_born_machine(bm, target, num_epochs=2, loss="wasserstein")


def test_distill_warm_start_into_ksd():
    bn, latent, target = _target(seed=3)
    engine = KSDVariationalInference(
        bn, latent, ["V4"],
        born_machine_config={"use_logits": True},
    )
    # Warm-start at the product of posterior marginals, then fine-tune w/ KSD.
    marg = np.asarray(target).reshape((2,) * 4)
    prod = np.ones(())
    for i in range(4):
        axes = tuple(j for j in range(4) if j != i)
        m = marg.sum(axis=axes)
        prod = np.multiply.outer(prod, m)
    prod = prod.reshape(-1)
    warm, hist0 = fit_born_machine(engine.born_machine, prod,
                                   num_epochs=300, lr=0.1)
    assert hist0["best_tvd"] < 0.02
    engine.params = warm
    post_dict, _ = bn.get_true_posterior(latent, {"V4": 1})
    h = engine.train({"V4": 1}, num_epochs=200, lr_born_machine=0.05,
                     verbose=False, true_posterior_for_tvd=post_dict)
    assert engine.best_tvd_ < 0.5 * np.abs(prod - np.asarray(target)).sum() + 1e-6


@pytest.mark.slow
def test_distill_chunked_bit_identical():
    """chunk_epochs splits the fit into bounded programs with identical
    results (same guarantee the VI engines' chunked mode provides)."""
    _, _, target = _target(seed=4)
    bm = QuantumBornMachine(num_latent_vars=4, ansatz_layers=2, backend="einsum")
    p_one, h_one = fit_born_machine(bm, target, num_epochs=120, lr=0.05)
    p_chk, h_chk = fit_born_machine(bm, target, num_epochs=120, lr=0.05,
                                    chunk_epochs=50)  # uneven final chunk
    np.testing.assert_array_equal(np.asarray(h_one["loss"]),
                                  np.asarray(h_chk["loss"]))
    np.testing.assert_array_equal(np.asarray(h_one["tvd"]),
                                  np.asarray(h_chk["tvd"]))
    assert h_one["best_epoch"] == h_chk["best_epoch"]
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                            np.asarray(b)),
                 p_one, p_chk)


def test_marginals_product_matches_handrolled():
    from tensornetworks_tpu.engines import marginals_product
    _, _, target = _target(seed=5)
    t = np.asarray(target)
    # Independent hand-rolled construction (as in the warm-start test above).
    marg = t.reshape((2,) * 4)
    prod = np.ones(())
    for i in range(4):
        axes = tuple(j for j in range(4) if j != i)
        prod = np.multiply.outer(prod, marg.sum(axis=axes))
    np.testing.assert_allclose(marginals_product(t, 4), prod.reshape(-1),
                               rtol=1e-12)
    # A product distribution is its own mean-field surrogate.
    p1 = np.array([0.3, 0.7])
    p2 = np.array([0.9, 0.1])
    prod2 = np.multiply.outer(p1, p2).reshape(-1)
    np.testing.assert_allclose(marginals_product(prod2, 2), prod2, rtol=1e-12)


@pytest.mark.slow
def test_fit_conditioned_born_machine():
    """Conditioned direct fit (round-4): one conditioned PQC fitted to BOTH
    Sprinkler posteriors simultaneously — the amortized expressivity bound.
    Chunked dispatch must match the single scan."""
    import jax.numpy as jnp

    from tensornetworks_tpu.core import get_sprinkler_network
    from tensornetworks_tpu.engines import fit_conditioned_born_machine
    from tensornetworks_tpu.models import QuantumBornMachine

    bn = get_sprinkler_network()
    latent = ["C", "S", "R"]
    observations = [{"W": 0}, {"W": 1}]
    targets = np.stack([bn.posterior_vector(latent, o) for o in observations])
    X = np.asarray([[0.0], [1.0]])

    qbm = QuantumBornMachine(3, ansatz_layers=4, conditioning_dim=1)
    best, h = fit_conditioned_born_machine(qbm, targets, X,
                                           num_epochs=1500, lr=0.05, seed=0)
    assert h["best_mean_tvd"] < 0.05, h["best_mean_tvd"]
    # Restored best params reproduce the recorded best mean TVD.
    import jax
    q = jax.vmap(lambda x: qbm.probs(best, x))(jnp.asarray(X))
    tvd = float((0.5 * np.abs(np.asarray(q) - targets).sum(-1)).mean())
    np.testing.assert_allclose(tvd, h["best_mean_tvd"], atol=1e-6)

    best2, h2 = fit_conditioned_born_machine(qbm, targets, X,
                                             num_epochs=1500, lr=0.05,
                                             seed=0, chunk_epochs=400)
    np.testing.assert_allclose(h["loss"], h2["loss"], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(h["best_mean_tvd"], h2["best_mean_tvd"],
                               rtol=1e-6, atol=1e-8)

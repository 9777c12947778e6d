"""dp-sharded amortized training on the 8-device virtual mesh: the
observation batch (AmortizedKSD) and the seed axis (train_multi_seed) shard
over ``dp`` and reproduce the single-device results."""

import itertools

import numpy as np
import jax
import pytest

from tensornetworks_tpu.core import get_random_chain_network, get_sprinkler_network
from tensornetworks_tpu.engines.amortized import AmortizedKSD, train_multi_seed
from tensornetworks_tpu.parallel import make_mesh


def _obs_grid(names):
    return [dict(zip(names, bits))
            for bits in itertools.product((0, 1), repeat=len(names))]


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8, dp=8)


def test_amortized_dp_sharded_matches_single_device(mesh8):
    bn = get_random_chain_network(6, seed=3, num_observed=3)
    latent, observed = [f"V{i}" for i in range(3)], [f"V{i}" for i in range(3, 6)]
    observations = _obs_grid(observed)  # 8 observations over dp=8
    kw = dict(num_epochs=60, lr=1e-2, verbose=False, seed=0)
    cfg = {"use_logits": True, "dropout_rate": 0.0}
    import jax.numpy as jnp

    # f64 so reduction-order differences between the GSPMD-partitioned and
    # single-device programs stay below the assert tolerance over 60 epochs.
    m1 = AmortizedKSD(bn, latent, observed, born_machine_config=cfg,
                      dtype=jnp.float64)
    h1 = m1.train(observations, **kw)
    m2 = AmortizedKSD(bn, latent, observed, born_machine_config=cfg,
                      dtype=jnp.float64)
    h2 = m2.train(observations, **kw, mesh=mesh8)

    np.testing.assert_allclose(h1["loss"], h2["loss"], rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(h1["mean_tvd"], h2["mean_tvd"], rtol=1e-9, atol=1e-11)
    for obs in observations[:2]:
        np.testing.assert_allclose(np.asarray(m1.posterior_for(obs)),
                                   np.asarray(m2.posterior_for(obs)),
                                   rtol=1e-8, atol=1e-10)


def test_multi_seed_dp_sharded_matches_single_device(mesh8):
    bn = get_sprinkler_network()
    kw = dict(num_seeds=8, ansatz_layers=2, num_epochs=80, base_seed=0)
    p1, tvd1, loss1 = train_multi_seed(bn, ["C", "S", "R"], {"W": 1}, **kw)
    p2, tvd2, loss2 = train_multi_seed(bn, ["C", "S", "R"], {"W": 1}, **kw,
                                       mesh=mesh8)
    # Raw params are NOT comparable: measurement-flat directions (e.g. final
    # RZ angles never change |ψ|²) carry pure numerical-noise gradients that
    # adam normalizes to ±lr random walks, so any 1-ulp reduction-order
    # difference between the partitioned and single-device programs decoheres
    # them. The training trajectories — losses and TVDs, f32 compute — must
    # agree.
    np.testing.assert_allclose(loss1, loss2, rtol=1e-4, atol=5e-4)
    np.testing.assert_allclose(tvd1, tvd2, rtol=1e-4, atol=5e-4)


def test_multi_seed_guard_freezes_only_bad_seed():
    """A non-finite loss in one replica must freeze that replica alone
    (per-seed guarded_update — K independent runs' NaN-skip semantics)."""
    import jax.numpy as jnp

    from tensornetworks_tpu.models import QuantumBornMachine

    bn = get_sprinkler_network()
    qbm = QuantumBornMachine(3, ansatz_layers=2)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    p0 = jax.vmap(qbm.init)(keys).at[0].set(jnp.nan)  # poison seed 0
    params, tvds, losses = train_multi_seed(
        bn, ["C", "S", "R"], {"W": 1}, num_seeds=3, ansatz_layers=2,
        num_epochs=30, base_seed=0, params0=p0)
    assert np.isnan(losses[:, 0]).all()            # poisoned seed never recovers
    assert np.isnan(params[0]).all()               # ...and is never updated
    assert np.isfinite(losses[:, 1:]).all()        # others unaffected
    assert np.isfinite(params[1:]).all()
    assert (losses[-1, 1:] < losses[0, 1:]).all()  # and still train

"""Multi-device sharding tests on the 8-way virtual CPU mesh (SURVEY.md §4:
the TPU-native substitute for multi-node test rigs)."""

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.core import get_random_chain_network, get_sprinkler_network
from tensornetworks_tpu.engines.common import make_optimizer
from tensornetworks_tpu.models import BinaryClassifierMLP, QuantumBornMachine
from tensornetworks_tpu.ops import SteinOperator, score_table
from tensornetworks_tpu.parallel import (
    make_mesh,
    make_sharded_advi_classifier_step,
    make_sharded_ksd_step,
    state_sharding,
)


def test_mesh_construction():
    mesh = make_mesh(8, dp=2)
    assert mesh.devices.shape == (2, 4)
    mesh1 = make_mesh(8)
    assert mesh1.devices.shape == (1, 8)


def test_sharded_ksd_step_matches_single_device():
    bn = get_sprinkler_network()
    # 3 latent vars -> 8 states, shardable over 8 devices... use a larger
    # random net so each shard has >1 element: 6 latent vars (64 states).
    bn = get_random_chain_network(7, seed=1)
    latent = [f"V{i}" for i in range(6)]
    t = bn.conditional_joint_table(latent, {"V6": 1})
    S = score_table(t)
    op = SteinOperator(S, 6, dense=False, group=3)
    qbm = QuantumBornMachine(6, ansatz_layers=2)
    params = qbm.init(jax.random.PRNGKey(0))
    # SGD: the update is linear in the gradient, so sharded-vs-single
    # comparison is insensitive to f32 reduction-order noise (adam's
    # rescaling would amplify it near zero-gradient coordinates).
    opt = make_optimizer("sgd", 5e-3, 10)
    opt_state = opt.init(params)

    mesh = make_mesh(8, dp=1)
    step = make_sharded_ksd_step(qbm, op, mesh, opt)
    p1, _, loss_sharded = step(params, opt_state)

    # Single-device ground truth.
    import optax

    def loss_fn(p):
        q = qbm.probs(p).astype(jnp.float32)
        return op.ksd_loss(q)

    loss_ref, grads = jax.value_and_grad(loss_fn)(params)
    upd, _ = opt.update(grads, opt.init(params), params)
    p_ref = optax.apply_updates(params, upd)

    assert abs(float(loss_sharded) - float(loss_ref)) < 1e-5
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p_ref), atol=1e-5)


def test_sharded_matvec_matches():
    # Kronecker matvec with the state axis sharded must equal unsharded.
    from tensornetworks_tpu.ops import stein_matvec
    from tensornetworks_tpu.core import all_bitstrings

    rng = np.random.default_rng(0)
    n = 6
    S = jnp.asarray(rng.normal(size=(2**n, n)))
    B = jnp.asarray(all_bitstrings(n), dtype=S.dtype)
    q = jnp.asarray(rng.random(2**n))
    y_ref = stein_matvec(q, S, B, n, 1.0, group=3)

    mesh = make_mesh(8, dp=1)
    v_sh = state_sharding(mesh, 1)
    s_sh = state_sharding(mesh, 2)
    q_s = jax.device_put(q, v_sh)
    S_s = jax.device_put(S, s_sh)
    B_s = jax.device_put(B, s_sh)
    y_sharded = jax.jit(lambda a, b, c: stein_matvec(a, b, c, n, 1.0, group=3))(q_s, S_s, B_s)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_ref), rtol=1e-10)


def test_sharded_classifier_step_runs():
    mesh = make_mesh(8, dp=2)
    clf = BinaryClassifierMLP(input_dim=4, hidden_dims=[16, 8])
    variables = clf.init_variables(jax.random.PRNGKey(0))
    opt = make_optimizer("adam", 1e-2, 10)
    opt_state = opt.init(variables["params"])
    step = make_sharded_advi_classifier_step(clf, mesh, opt, batch_size=16, input_dim=4)
    x = jnp.asarray(np.random.default_rng(0).random((16, 4)), dtype=jnp.float32)
    y = jnp.asarray((np.arange(16) % 2).reshape(-1, 1), dtype=jnp.float32)
    params, opt_state, loss = step(variables["params"], opt_state, x, y)
    assert np.isfinite(float(loss))

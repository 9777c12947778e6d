"""Model parity tests: init schemes, normalizations, fixed-probs mode,
entropy, sampling, classifier shapes (reference behaviors cited per test)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import calculate_tvd
from tensornetworks_tpu.models import (
    BinaryClassifierMLP,
    ClassicalBornMachine,
    QuantumBornMachine,
)


def test_unconditional_init_methods():
    # born_machine_classical_sim.py:51-60
    key = jax.random.PRNGKey(0)
    bm = ClassicalBornMachine(3, init_method="zero")
    assert np.all(np.asarray(bm.init(key)["table"]) == 0)
    bm = ClassicalBornMachine(3, init_method="uniform")
    t = np.asarray(bm.init(key)["table"])
    assert np.allclose(t, np.log(1 / 8), atol=0.05)
    bm = ClassicalBornMachine(3, init_method="small_random")
    t = np.asarray(bm.init(key)["table"])
    assert np.abs(t).max() < 1.0


def test_probs_softmax_and_abs_modes():
    key = jax.random.PRNGKey(1)
    bm = ClassicalBornMachine(2, use_logits=True, init_method="random")
    p = bm.probs(bm.init(key))
    assert abs(float(p.sum()) - 1.0) < 1e-6
    bm2 = ClassicalBornMachine(2, use_logits=False, init_method="random")
    params = bm2.init(key)
    p2 = bm2.probs(params)
    expected = np.abs(np.asarray(params["table"]))
    expected = expected / expected.sum()
    np.testing.assert_allclose(np.asarray(p2), expected, atol=1e-6)


def test_fixed_probs_mode():
    # born_machine_classical_sim.py:64-78
    bm = ClassicalBornMachine(2)
    params = bm.init(jax.random.PRNGKey(0))
    fixed = jnp.asarray([0.7, 0.1, 0.1, 0.1])
    bm.set_fixed_probs(fixed)
    np.testing.assert_allclose(np.asarray(bm.probs(params)), np.asarray(fixed))
    d = bm.get_prob_dict(params)
    assert abs(d[(0, 0)] - 0.7) < 1e-7
    bm.clear_fixed_probs()
    assert abs(float(bm.probs(params).sum()) - 1.0) < 1e-6


def test_conditional_mlp_shapes_and_defaults():
    # Default hidden dims [max(4d,64), max(2d,32)] (born_machine_classical_sim.py:27)
    bm = ClassicalBornMachine(3, conditioning_dim=1)
    params = bm.init(jax.random.PRNGKey(0))
    layer_names = sorted(params.keys())
    # 3 Dense layers: 1 -> 64 -> 32 -> 8
    dims = [params[k]["kernel"].shape for k in layer_names]
    assert (1, 64) in dims and (64, 32) in dims and (32, 8) in dims
    x = jnp.asarray([1.0])
    p = bm.probs(params, x)
    assert p.shape == (8,)
    assert abs(float(p.sum()) - 1.0) < 1e-6
    # Batched conditions
    xb = jnp.ones((5, 1))
    pb = bm.probs(params, xb)
    assert pb.shape == (5, 8)


def test_log_q_gather_matches_probs():
    bm = ClassicalBornMachine(3, init_method="random")
    params = bm.init(jax.random.PRNGKey(2))
    p = np.asarray(bm.probs(params))
    z = jnp.asarray([[0, 0, 0], [1, 0, 1], [1, 1, 1]], dtype=jnp.float32)
    lq = np.asarray(bm.log_q(params, z))
    np.testing.assert_allclose(lq, np.log(p[[0, 5, 7]]), atol=1e-6)


def test_entropy_uniform():
    bm = ClassicalBornMachine(3, init_method="zero")
    params = bm.init(jax.random.PRNGKey(0))
    assert abs(float(bm.entropy(params)) - 3 * np.log(2)) < 1e-6


def test_born_sampling_statistics():
    bm = ClassicalBornMachine(2, init_method="random")
    params = bm.init(jax.random.PRNGKey(3))
    p = np.asarray(bm.probs(params))
    samples = np.asarray(bm.sample(jax.random.PRNGKey(0), params, 30000))
    idx = (samples[:, 0] * 2 + samples[:, 1]).astype(int)
    emp = np.bincount(idx, minlength=4) / 30000
    assert calculate_tvd(emp, p) < 0.02


def test_quantum_bm_init_and_probs():
    qbm = QuantumBornMachine(3, ansatz_layers=4)
    assert qbm.num_params == 36
    th = qbm.init(jax.random.PRNGKey(0))
    assert th.shape == (36,)
    p = qbm.probs(th)
    assert abs(float(p.sum()) - 1.0) < 1e-5
    th0 = QuantumBornMachine(3, ansatz_layers=4, init_method="zero").init(jax.random.PRNGKey(0))
    assert np.all(np.asarray(th0) == 0)
    thr = QuantumBornMachine(3, ansatz_layers=1, init_method="random").init(jax.random.PRNGKey(0))
    assert float(thr.max()) <= 2 * np.pi and float(thr.min()) >= 0


def test_quantum_bm_conditioning_actually_conditions():
    # The reference only warns (quantum_born_machine.py:132-137); here
    # conditioning is implemented via angle embedding — different x must
    # yield different distributions, and x is required.
    qbm = QuantumBornMachine(3, ansatz_layers=2, conditioning_dim=1)
    th = qbm.init(jax.random.PRNGKey(0))
    p0 = np.asarray(qbm.probs(th, x_condition=jnp.asarray([0.0])))
    p1 = np.asarray(qbm.probs(th, x_condition=jnp.asarray([1.0])))
    assert abs(p0.sum() - 1.0) < 1e-5 and abs(p1.sum() - 1.0) < 1e-5
    assert np.abs(p0 - p1).max() > 1e-3
    with pytest.raises(ValueError):
        qbm.probs(th)
    # x = 0 embeds RY(0) = identity: matches the unconditioned circuit.
    qbm_plain = QuantumBornMachine(3, ansatz_layers=2, backend="blocked")
    np.testing.assert_allclose(p0, np.asarray(qbm_plain.probs(th)), atol=1e-6)


def test_classifier_default_dims_and_probs():
    # classifier_pytorch.py:27 default hidden dims.
    clf = BinaryClassifierMLP(input_dim=3)
    v = clf.init_variables(jax.random.PRNGKey(0))
    dims = [v["params"][k]["kernel"].shape for k in sorted(v["params"])]
    assert (3, 32) in dims and (32, 16) in dims and (16, 1) in dims
    x = jnp.ones((10, 3))
    logits = clf.apply(v, x, train=False)
    assert logits.shape == (10, 1)
    probs = clf.get_probs(v, x)
    assert np.all((np.asarray(probs) > 0) & (np.asarray(probs) < 1))


def test_classifier_batch_norm_variant():
    clf = BinaryClassifierMLP(input_dim=4, hidden_dims=[8], use_batch_norm=True)
    v = clf.init_variables(jax.random.PRNGKey(0))
    assert "batch_stats" in v
    x = jnp.ones((6, 4))
    logits, updates = clf.apply(v, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (6, 1)


def test_learned_conditioning_embedding():
    """cond_learned_embedding (round 4): at init the learned wall reproduces
    the fixed π·x embedding EXACTLY (W starts at the singleton-feature
    basis), gradients flow into the embedding tail, and training it apart
    moves the conditional distributions."""
    import jax
    import jax.numpy as jnp

    from tensornetworks_tpu.models import QuantumBornMachine

    for kw in [dict(ansatz_type="hardware_efficient", backend="blocked"),
               dict(ansatz_type="bn_structured", edges=[(0, 1), (1, 2)],
                    cond_reupload=True)]:
        a = QuantumBornMachine(4, ansatz_layers=2, conditioning_dim=2, **kw)
        b = QuantumBornMachine(4, ansatz_layers=2, conditioning_dim=2,
                               cond_learned_embedding=True, **kw)
        pa = a.init(jax.random.PRNGKey(0))
        pb = b.init(jax.random.PRNGKey(0))
        assert b.num_params == a.num_params + 4 * (1 << 2)
        assert b.num_circuit_params == a.num_params
        for bits in [(0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0)]:
            x = jnp.asarray(bits)
            np.testing.assert_allclose(np.asarray(a.probs(pa, x)),
                                       np.asarray(b.probs(pb, x)), atol=1e-9)
        g = jax.grad(lambda p: b.probs(p, jnp.asarray([1.0, 0.0]))[3])(pb)
        assert np.abs(np.asarray(g)[a.num_params:]).max() > 0

    import pytest
    with pytest.raises(ValueError):
        QuantumBornMachine(4, ansatz_layers=2, cond_learned_embedding=True)

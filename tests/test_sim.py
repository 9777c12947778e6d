"""Statevector simulator tests: analytic oracles, gate fast paths,
parameter-shift vs autodiff gradient parity (SURVEY.md §4 test strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.sim import (
    ansatz_probs,
    apply_cnot,
    apply_cz,
    apply_gate,
    gates,
    hadamard_wall,
    num_ansatz_params,
    parameter_shift_jacobian,
    probabilities,
    sample_bits,
    zero_state,
)
from tensornetworks_tpu.core import calculate_tvd
import pytest

C128 = jnp.complex128


def random_state(n, seed=0):
    rng = np.random.default_rng(seed)
    amp = rng.normal(size=2**n) + 1j * rng.normal(size=2**n)
    amp /= np.linalg.norm(amp)
    return jnp.asarray(amp.reshape((2,) * n), dtype=C128)


def test_param_counts():
    # quantum_born_machine.py:30-38
    assert num_ansatz_params(3, 4, "hardware_efficient") == 36
    assert num_ansatz_params(3, 4, "all_to_all") == 36
    assert num_ansatz_params(3, 4, "basic") == 24


def test_zero_state_and_hadamard_wall():
    s = zero_state(3, dtype=C128)
    p = probabilities(s)
    assert abs(float(p[0]) - 1.0) < 1e-12
    plus = hadamard_wall(s)
    np.testing.assert_allclose(np.asarray(probabilities(plus)), np.full(8, 1 / 8), atol=1e-12)


def test_ry_rotation_analytic():
    theta = 0.7
    s = apply_gate(zero_state(1, dtype=C128), gates.ry(theta), [0])
    p = np.asarray(probabilities(s))
    np.testing.assert_allclose(p, [np.cos(theta / 2) ** 2, np.sin(theta / 2) ** 2], atol=1e-12)


def test_cnot_fast_path_matches_dense():
    for n, (c, t) in [(3, (0, 2)), (3, (2, 0)), (4, (1, 3)), (4, (3, 1))]:
        s = random_state(n, seed=c * 10 + t)
        fast = apply_cnot(s, c, t)
        dense = apply_gate(s, gates.CNOT, [c, t])
        np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=1e-12)


def test_cz_fast_path_matches_dense():
    for n, (a, b) in [(3, (0, 2)), (3, (2, 1)), (4, (1, 3))]:
        s = random_state(n, seed=a * 7 + b)
        fast = apply_cz(s, a, b)
        dense = apply_gate(s, gates.CZ, [a, b])
        np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=1e-12)


def test_bell_state():
    s = zero_state(2, dtype=C128)
    s = apply_gate(s, gates.H, [0])
    s = apply_cnot(s, 0, 1)
    p = np.asarray(probabilities(s))
    np.testing.assert_allclose(p, [0.5, 0, 0, 0.5], atol=1e-12)


def test_unitarity_all_ansatze():
    rng = np.random.default_rng(42)
    for ansatz in ["hardware_efficient", "all_to_all", "basic"]:
        for n, L in [(2, 1), (3, 2), (4, 3)]:
            k = num_ansatz_params(n, L, ansatz)
            params = jnp.asarray(rng.uniform(0, 2 * np.pi, k))
            p = ansatz_probs(params, n, L, ansatz, dtype=C128)
            assert abs(float(p.sum()) - 1.0) < 1e-10, (ansatz, n, L)
            assert float(p.min()) >= -1e-12


def test_hardware_efficient_zero_params_uniform():
    # θ=0: H wall then identity rotations; CNOT permutes equal amplitudes and
    # CZ only adds phases — the distribution stays exactly uniform.
    for n in [2, 3, 4]:
        k = num_ansatz_params(n, 2, "hardware_efficient")
        p = ansatz_probs(jnp.zeros(k), n, 2, "hardware_efficient", dtype=C128)
        np.testing.assert_allclose(np.asarray(p), np.full(2**n, 2.0**-n), atol=1e-12)


def test_basic_zero_params_is_delta():
    # basic ansatz has no Hadamard wall (quantum_born_machine.py:113-128):
    # at θ=0 the state remains |0...0>.
    p = ansatz_probs(jnp.zeros(num_ansatz_params(3, 2, "basic")), 3, 2, "basic", dtype=C128)
    np.testing.assert_allclose(np.asarray(p), np.eye(8)[0], atol=1e-12)


def test_single_qubit_he_analytic():
    # n=1, L=1 hardware-efficient: |ψ> = RZ(c)RY(b)RX(a)H|0>.
    a, b, c = 0.3, 1.1, -0.4
    p = np.asarray(ansatz_probs(jnp.array([a, b, c]), 1, 1, "hardware_efficient", dtype=C128))
    H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)

    def rot(t, G):
        return np.cos(t / 2) * np.eye(2) - 1j * np.sin(t / 2) * G

    X = np.array([[0, 1], [1, 0]])
    Y = np.array([[0, -1j], [1j, 0]])
    Z = np.array([[1, 0], [0, -1]])
    psi = rot(c, Z) @ rot(b, Y) @ rot(a, X) @ H @ np.array([1, 0])
    np.testing.assert_allclose(p, np.abs(psi) ** 2, atol=1e-12)


@pytest.mark.slow
def test_parameter_shift_matches_jax_grad():
    # Gradient parity: jax.grad through the contraction must equal the
    # parameter-shift rule analytically (SURVEY.md §7 hard part (b)).
    for ansatz, n, L in [("hardware_efficient", 3, 2), ("basic", 3, 2), ("all_to_all", 2, 2)]:
        k = num_ansatz_params(n, L, ansatz)
        params = jnp.asarray(np.random.default_rng(7).uniform(0, 2 * np.pi, k))

        def probs_fn(p):
            return ansatz_probs(p, n, L, ansatz, dtype=C128)

        jac_ad = jax.jacrev(probs_fn)(params)
        jac_ps = parameter_shift_jacobian(probs_fn, params)
        np.testing.assert_allclose(np.asarray(jac_ad), np.asarray(jac_ps), atol=1e-10)


def test_sampling_statistics():
    key = jax.random.PRNGKey(0)
    p = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    bits = sample_bits(key, p, 40000, 2)
    assert bits.shape == (40000, 2)
    idx = np.asarray(bits[:, 0] * 2 + bits[:, 1]).astype(int)
    emp = np.bincount(idx, minlength=4) / 40000
    assert calculate_tvd(emp, np.asarray(p)) < 0.01


def test_grad_through_sampling_free_loss():
    # End-to-end: d/dθ of a linear functional of probs is finite and nonzero.
    n, L = 3, 2
    k = num_ansatz_params(n, L, "hardware_efficient")
    v = jnp.asarray(np.random.default_rng(3).normal(size=2**n))

    def loss(params):
        return ansatz_probs(params, n, L, "hardware_efficient", dtype=C128) @ v

    g = jax.grad(loss)(jnp.asarray(np.random.default_rng(4).uniform(0, 1, k)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 1e-6

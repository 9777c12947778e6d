"""Manual shard_map statevector primitives vs single-device ground truth,
on the 8-way virtual CPU mesh."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from tensornetworks_tpu.ops import kron_matvec
from tensornetworks_tpu.ops.kron import apply_adjacent_block
from tensornetworks_tpu.parallel import make_mesh, state_sharding
from tensornetworks_tpu.parallel.shard_state import (
    distributed_apply_1q,
    distributed_kron_matvec,
)


def _sharded_vector(mesh, n, dtype=jnp.complex128, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=2**n) + (1j * rng.normal(size=2**n)
                                 if jnp.issubdtype(dtype, jnp.complexfloating) else 0)
    arr = jnp.asarray(v, dtype=dtype)
    return jax.device_put(arr, state_sharding(mesh, 1)), arr


@pytest.mark.slow
def test_distributed_1q_gate_all_positions():
    n = 7
    mesh = make_mesh(8, dp=1)  # 3 global bits
    apply_fn = distributed_apply_1q(mesh, n)
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2)))
    v_sharded, v = _sharded_vector(mesh, n)
    for qubit in range(n):  # qubits 0-2 are global (ppermute), 3-6 local
        got = np.asarray(apply_fn(v_sharded, U, qubit))
        want = np.asarray(apply_adjacent_block(v, U, qubit, 1, n))
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"qubit {qubit}")


def test_distributed_kron_matvec_matches():
    n = 9
    mesh = make_mesh(8, dp=1)
    a = float(np.exp(-1.0 / n))
    A = np.array([[1.0, a], [a, 1.0]])
    mv = distributed_kron_matvec(mesh, A, n, group=3)
    v_sharded, v = _sharded_vector(mesh, n, dtype=jnp.float64)
    got = np.asarray(mv(v_sharded))
    want = np.asarray(kron_matvec(v, A, n, group=3))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_distributed_gate_under_jit():
    n = 6
    mesh = make_mesh(4, dp=1)
    apply_fn = distributed_apply_1q(mesh, n)
    U = jnp.asarray(np.array([[0.0, 1.0], [1.0, 0.0]]), dtype=jnp.complex128)  # X
    v_sharded, v = _sharded_vector(mesh, n, seed=3)
    got = np.asarray(jax.jit(lambda s: apply_fn(s, U, 0))(v_sharded))
    want = np.asarray(apply_adjacent_block(v, U, 0, 1, n))
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.mark.slow
def test_distributed_cnot_all_cases():
    # All four locality cases: (c,t) both global, c global/t local,
    # c local/t global, both local (n=6, k=3 on the 8-device mesh).
    from tensornetworks_tpu.sim.statevector import apply_cnot
    from tensornetworks_tpu.parallel.shard_state import distributed_apply_cnot

    n = 6
    mesh = make_mesh(8, dp=1)
    apply_fn = distributed_apply_cnot(mesh, n)
    v_sharded, v = _sharded_vector(mesh, n, seed=5)
    for c, t in [(0, 2), (2, 0), (1, 4), (0, 5), (4, 1), (5, 0), (3, 5), (5, 3)]:
        got = np.asarray(apply_fn(v_sharded, c, t))
        want = np.asarray(apply_cnot(v.reshape((2,) * n), c, t)).reshape(-1)
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"cnot({c},{t})")


@pytest.mark.slow
def test_distributed_cz_all_cases():
    from tensornetworks_tpu.sim.statevector import apply_cz
    from tensornetworks_tpu.parallel.shard_state import distributed_apply_cz

    n = 6
    mesh = make_mesh(8, dp=1)
    apply_fn = distributed_apply_cz(mesh, n)
    v_sharded, v = _sharded_vector(mesh, n, seed=6)
    for a, b in [(0, 1), (0, 4), (4, 0), (3, 5), (1, 2)]:
        got = np.asarray(apply_fn(v_sharded, a, b))
        want = np.asarray(apply_cz(v.reshape((2,) * n), a, b)).reshape(-1)
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"cz({a},{b})")


@pytest.mark.slow
def test_distributed_ansatz_matches_single_device():
    from tensornetworks_tpu.parallel.distributed_ansatz import (
        make_distributed_ansatz_probs,
    )
    from tensornetworks_tpu.sim import ansatz_probs, num_ansatz_params

    n, L = 6, 2
    mesh = make_mesh(8, dp=1)
    for ansatz in ["hardware_efficient", "basic"]:
        k = num_ansatz_params(n, L, ansatz)
        params = jnp.asarray(np.random.default_rng(9).uniform(0, 2 * np.pi, k),
                             dtype=jnp.float64)
        dist = make_distributed_ansatz_probs(mesh, n, L, ansatz, dtype=jnp.complex128)
        p_dist = np.asarray(jax.jit(dist)(params))
        p_ref = np.asarray(ansatz_probs(params, n, L, ansatz, dtype=jnp.complex128))
        np.testing.assert_allclose(p_dist, p_ref, atol=1e-12, err_msg=ansatz)

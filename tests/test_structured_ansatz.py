"""DAG-structured ansatz (sim/structured.py): gate-level equivalence vs the
generic statevector executor, QBM/engine wiring, convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import get_random_chain_network, get_sprinkler_network
from tensornetworks_tpu.engines import QuantumKSDVariationalInference
from tensornetworks_tpu.models import QuantumBornMachine
from tensornetworks_tpu.sim import latent_edges, make_structured_probs_fn
from tensornetworks_tpu.sim.gates import rot_zyx
from tensornetworks_tpu.sim.statevector import (apply_cnot, apply_cz,
                                                apply_gate, hadamard_wall,
                                                probabilities, zero_state)


def _reference_probs(params, n, L, edges):
    """Same circuit via the generic per-gate executor."""
    a = params.reshape(L, n, 3)
    st = hadamard_wall(zero_state(n))
    for l in range(L):
        for q in range(n):
            st = apply_gate(st, rot_zyx(a[l, q, 0], a[l, q, 1], a[l, q, 2]), [q])
        for (c, t) in edges:
            if l % 2 == 0:
                st = apply_cnot(st, c, t)
            else:
                st = apply_cz(st, c, t)
    return probabilities(st)


@pytest.mark.parametrize("n,L", [(5, 3), (6, 2), (7, 3)])
@pytest.mark.slow
def test_structured_matches_generic_executor(n, L):
    bn = get_random_chain_network(n, seed=n)
    edges = latent_edges(bn, bn.nodes)
    assert edges, "expected edges in the random DAG"
    params = jnp.asarray(
        np.random.default_rng(n + L).uniform(0, 2 * np.pi, 3 * L * n),
        dtype=jnp.float32)
    fn = make_structured_probs_fn(n, L, edges)
    got = np.asarray(fn(params))
    want = np.asarray(_reference_probs(params, n, L, edges))
    np.testing.assert_allclose(got, want, atol=5e-6)
    np.testing.assert_allclose(got.sum(), 1.0, atol=1e-5)
    # gradients agree too
    v = jnp.asarray(np.random.default_rng(1).normal(size=2**n), jnp.float32)
    g1 = np.asarray(jax.grad(lambda p: fn(p) @ v)(params))
    g2 = np.asarray(jax.grad(
        lambda p: _reference_probs(p, n, L, edges).astype(jnp.float32) @ v)(params))
    np.testing.assert_allclose(g1, g2, atol=5e-5)


def test_qbm_structured_wiring():
    bn = get_random_chain_network(5, seed=2)
    edges = latent_edges(bn, bn.nodes[:4])
    qbm = QuantumBornMachine(4, ansatz_layers=3, ansatz_type="bn_structured",
                             edges=edges)
    assert qbm.num_params == 3 * 3 * 4
    p = qbm.init(jax.random.PRNGKey(0))
    q = np.asarray(qbm.probs(p))
    np.testing.assert_allclose(q.sum(), 1.0, atol=1e-5)
    with pytest.raises(NotImplementedError):
        qbm.state(p)
    with pytest.raises(ValueError):
        QuantumBornMachine(4, ansatz_type="bn_structured")  # no edges


def test_engine_structured_autoderives_edges_and_converges():
    bn = get_sprinkler_network()
    latent = ["C", "S", "R"]
    obs = {"W": 1}
    post, _ = bn.get_true_posterior(latent, obs)
    eng = QuantumKSDVariationalInference(
        bn, latent, ["W"], qbm_num_latent_vars=3, qbm_ansatz_layers=4,
        qbm_ansatz_type="bn_structured", seed=0)
    assert eng.born_machine.edges  # derived from the BN automatically
    eng.train(obs, num_epochs=600, lr_born_machine=0.02, verbose=False,
              true_posterior_for_tvd=post)
    assert eng.best_tvd_ < 0.05, eng.best_tvd_


@pytest.mark.parametrize("n,L", [(5, 3), (9, 2), (10, 4)])
@pytest.mark.slow
def test_flat_executor_matches_2d_and_reference(n, L):
    """Production flat (blocked-machinery) structured executor: probs and
    grads match the 2D flip-select executor and the per-gate reference,
    including edges inside the trailing block (the (128,128)-embedding and
    host-composed-permutation paths)."""
    from tensornetworks_tpu.sim.structured import make_structured_probs_fn_flat

    rng = np.random.default_rng(n * 10 + L)
    # edges stressing every path: cross, trailing-target, in-trailing-block
    edges = [(0, 1), (1, n - 1), (n - 2, n - 1), (n - 1, n - 2), (2, n - 2)]
    edges = [(c, t) for c, t in edges if c != t and c < n and t < n]
    p = jnp.asarray(0.1 * rng.normal(size=3 * L * n), dtype=jnp.float32)
    flat = make_structured_probs_fn_flat(n, L, edges)
    p2d = make_structured_probs_fn(n, L, edges)
    ref = _reference_probs(p, n, L, edges)
    np.testing.assert_allclose(np.asarray(flat(p)), np.asarray(ref), atol=5e-6)
    np.testing.assert_allclose(np.asarray(flat(p)), np.asarray(p2d(p)), atol=5e-6)
    v = jnp.asarray(rng.normal(size=2**n), dtype=jnp.float32)
    g1 = jax.grad(lambda q: flat(q) @ v)(p)
    g2 = jax.grad(lambda q: p2d(q).astype(jnp.float32) @ v)(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-5)


def test_qbm_structured_backend_routing():
    qbm = QuantumBornMachine(4, 2, ansatz_type="bn_structured",
                             edges=[(0, 1), (2, 3)])
    assert qbm.backend == "structured"
    qbm2 = QuantumBornMachine(4, 2, ansatz_type="bn_structured",
                              edges=[(0, 1), (2, 3)], backend="structured2d")
    assert qbm2.backend == "structured2d"
    p = qbm.init(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(qbm.probs(p)),
                               np.asarray(qbm2.probs(p)), atol=5e-6)


@pytest.mark.parametrize("n,L", [(5, 3), (9, 2), (10, 4)])
def test_composed_executor_matches_2d_and_flat(n, L):
    """GF(2)-composed executor (round-3 production path): probs and grads
    match the 2D flip-select and flat executors, including within-half
    high→low edges (non-triangular Acc) and conditioning."""
    from tensornetworks_tpu.sim.structured import (
        make_structured_probs_fn_composed, make_structured_probs_fn_flat)

    rng = np.random.default_rng(n * 100 + L)
    edges = [(0, 1), (1, n - 1), (n - 2, n - 1), (n - 1, n - 2), (2, n - 2),
             (0, n - 1)]
    p = jnp.asarray(0.1 * rng.normal(size=3 * L * n), dtype=jnp.float32)
    comp = make_structured_probs_fn_composed(n, L, edges)
    p2d = make_structured_probs_fn(n, L, edges)
    flat = make_structured_probs_fn_flat(n, L, edges)
    np.testing.assert_allclose(np.asarray(comp(p)), np.asarray(p2d(p)), atol=5e-6)
    np.testing.assert_allclose(np.asarray(comp(p)), np.asarray(flat(p)), atol=5e-6)
    v = jnp.asarray(rng.normal(size=2**n), dtype=jnp.float32)
    g1 = jax.grad(lambda q: comp(q).astype(jnp.float32) @ v)(p)
    g2 = jax.grad(lambda q: p2d(q).astype(jnp.float32) @ v)(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-5)
    # conditioning (angle-embedding wall) parity
    comp_c = make_structured_probs_fn_composed(n, L, edges, conditioning=True)
    p2d_c = make_structured_probs_fn(n, L, edges, conditioning=True)
    ang = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(comp_c(p, ang)),
                               np.asarray(p2d_c(p, ang)), atol=5e-6)


@pytest.mark.parametrize("n,L,block", [(5, 3, 8), (9, 2, 4), (10, 4, 8),
                                       (11, 3, 4)])
@pytest.mark.slow
def test_blockcomposed_executor_matches_2d_and_flat(n, L, block):
    """Block-composed executor (round-3 production path): probs and grads
    match the 2D flip-select and flat executors on edge lists stressing
    in-block high→low edges (non-identity D fold), cross-block low→high
    edges (masked multi-bit flips), and multi-target controls."""
    from tensornetworks_tpu.sim.structured import (
        make_structured_probs_fn_blockcomposed, make_structured_probs_fn_flat)

    from tensornetworks_tpu.sim.blocked import _blocks

    rng = np.random.default_rng(n * 1000 + L)
    blocks = _blocks(n, block)
    # derive edges from the actual partition: in-block high→low (non-identity
    # D fold) and low→high, cross-block low→high chains (flip program), a
    # long-range edge and a multi-target control
    edges = []
    for s, bs in blocks:
        if bs >= 2:
            edges += [(s + 1, s), (s, s + 1)]
    firsts = [s for s, _ in blocks]
    edges += list(zip(firsts, firsts[1:]))
    edges += [(0, n - 1), (0, blocks[-1][0])]
    edges = sorted(set((c, t) for c, t in edges if c != t))
    p = jnp.asarray(0.1 * rng.normal(size=3 * L * n), dtype=jnp.float32)
    bc = make_structured_probs_fn_blockcomposed(n, L, edges, block=block)
    p2d = make_structured_probs_fn(n, L, edges)
    flat = make_structured_probs_fn_flat(n, L, edges)
    np.testing.assert_allclose(np.asarray(bc(p)), np.asarray(p2d(p)), atol=5e-6)
    np.testing.assert_allclose(np.asarray(bc(p)), np.asarray(flat(p)), atol=5e-6)
    v = jnp.asarray(rng.normal(size=2**n), dtype=jnp.float32)
    g1 = jax.grad(lambda q: bc(q).astype(jnp.float32) @ v)(p)
    g2 = jax.grad(lambda q: p2d(q).astype(jnp.float32) @ v)(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-5)
    # conditioning (angle-embedding wall) parity — the flagship amortized
    # configuration (VERDICT r2 item 8)
    bc_c = make_structured_probs_fn_blockcomposed(n, L, edges, block=block,
                                                  conditioning=True)
    p2d_c = make_structured_probs_fn(n, L, edges, conditioning=True)
    ang = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(bc_c(p, ang)),
                               np.asarray(p2d_c(p, ang)), atol=5e-6)


def test_blockcomposed_rejects_cross_block_high_to_low():
    from tensornetworks_tpu.sim.structured import (
        make_structured_probs_fn_blockcomposed)

    with pytest.raises(ValueError, match="flat"):
        make_structured_probs_fn_blockcomposed(10, 2, [(9, 2)], block=4)
    # and the QBM constructor transparently falls back to the flat executor
    qbm = QuantumBornMachine(10, 2, ansatz_type="bn_structured",
                             edges=[(9, 2)], block=4)
    assert qbm.backend == "structured_flat"


def test_composed_executor_rejects_cross_half_high_to_low():
    """A high→low edge CROSSING the row/column split produces a G block the
    composed executor does not execute — it must refuse, pointing at the
    flat executor."""
    from tensornetworks_tpu.sim.structured import (
        make_structured_probs_fn_composed)

    with pytest.raises(ValueError, match="flat"):
        make_structured_probs_fn_composed(6, 2, [(5, 0)])


@pytest.mark.parametrize("n,L,block", [(6, 3, 8), (9, 2, 4), (10, 3, 8)])
@pytest.mark.slow
def test_reupload_executors_agree_and_oracle(n, L, block):
    """Data re-uploading (RY(x) wall folded into every layer): the flat and
    block-composed executors must agree with each other AND with an
    independent oracle built by interleaving explicit embedding walls with
    single-layer circuits of the 2D flip-select executor."""
    from tensornetworks_tpu.sim.structured import (
        make_structured_probs_fn_blockcomposed, make_structured_probs_fn_flat)

    rng = np.random.default_rng(n * 31 + L)
    edges = [(i, i + 1) for i in range(0, n - 1, 2)] + [(0, n - 1)]
    edges = sorted(set(edges))
    p = jnp.asarray(0.1 * rng.normal(size=3 * L * n), dtype=jnp.float32)
    ang = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)

    bc = make_structured_probs_fn_blockcomposed(
        n, L, edges, block=block, conditioning=True, reupload=True)
    flat = make_structured_probs_fn_flat(
        n, L, edges, block=block, conditioning=True, reupload=True)
    out_bc = np.asarray(bc(p, ang))
    out_flat = np.asarray(flat(p, ang))
    np.testing.assert_allclose(out_bc, out_flat, atol=5e-6)

    # Independent oracle: statevector simulation with explicit per-layer
    # embedding walls via the per-gate einsum machinery.
    from tensornetworks_tpu.sim.gates import ry_batched
    from tensornetworks_tpu.sim.blocked import _blocks, _cz_diag_device
    from tensornetworks_tpu.ops.kron import apply_adjacent_block
    from tensornetworks_tpu.sim.structured import make_structured_probs_fn

    # build state by running L separate 1-layer flip-select circuits is not
    # possible (CZ/edge parity depends on absolute layer index); instead
    # verify against the flat executor with reupload=False and explicit
    # embedding applications between layers, constructed via its own
    # primitives:
    E = ry_batched(ang).astype(jnp.complex64)
    blocks = _blocks(n, block)

    def embed(state):
        for s, bs in blocks:
            M = E[s]
            for q in range(s + 1, s + bs):
                M = jnp.kron(M, E[q])
            state = apply_adjacent_block(state, M, s, bs, n)
        return state

    # oracle: replicate the flat executor's layer loop with embedding before
    # every layer
    from tensornetworks_tpu.sim.gates import rot_zyx_batched, batched_kron

    a = p.reshape(L, n, 3)
    U = rot_zyx_batched(a[..., 0], a[..., 1], a[..., 2]).astype(jnp.complex64)
    state = jnp.full((2 ** n,), 1.0 / np.sqrt(2.0 ** n), dtype=jnp.complex64)
    flat_ref = make_structured_probs_fn_flat(n, 1, edges, block=block)
    # apply layer-by-layer using single-layer flat executors would reset the
    # H wall; instead use gate-level application mirroring the flat run():
    cz = _cz_diag_device(n, edges)
    from tensornetworks_tpu.sim.structured import _SX

    def control_mask(c):
        b = (jax.lax.iota(jnp.int32, 2 ** n) >> (n - 1 - c)) & 1
        return b.astype(jnp.float32)

    for l in range(L):
        state = embed(state)
        for i, (s, bs) in enumerate(blocks):
            M = U[l, s]
            for q in range(s + 1, s + bs):
                M = jnp.kron(M, U[l, q])
            state = apply_adjacent_block(state, M, s, bs, n)
        if l % 2 == 0:
            for c, t in edges:
                flipped = apply_adjacent_block(
                    state, jnp.asarray(_SX, dtype=jnp.complex64), t, 1, n)
                m = control_mask(c)
                state = state + m * (flipped - state)
        else:
            state = state * cz
    oracle = np.asarray(jnp.real(state * jnp.conj(state)))
    np.testing.assert_allclose(out_bc, oracle, atol=5e-6)

    # grads agree between the two production executors
    v = jnp.asarray(rng.normal(size=2 ** n), dtype=jnp.float32)
    g1 = jax.grad(lambda q: bc(q, ang).astype(jnp.float32) @ v)(p)
    g2 = jax.grad(lambda q: flat(q, ang).astype(jnp.float32) @ v)(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-5)


def test_qbm_cond_reupload_plumbs_and_validates():
    edges = [(0, 1), (1, 2)]
    qbm = QuantumBornMachine(3, 2, ansatz_type="bn_structured", edges=edges,
                             conditioning_dim=1, cond_reupload=True)
    x = jnp.asarray([1.0])
    p = qbm.probs(qbm.init(jax.random.PRNGKey(0)), x)
    assert np.isclose(float(p.sum()), 1.0, atol=1e-5)
    with pytest.raises(ValueError, match="cond_reupload"):
        QuantumBornMachine(3, 2, ansatz_type="bn_structured", edges=edges,
                           cond_reupload=True)


@pytest.mark.parametrize("factory_name", ["blockcomposed", "flat"])
@pytest.mark.slow
def test_structured_remat_layers_bit_identical(factory_name):
    """remat_layers=True must change memory behavior only: probs AND grads
    identical to the plain executors (same contractions, re-run in the
    backward instead of stored)."""
    from tensornetworks_tpu.sim.structured import (
        make_structured_probs_fn_blockcomposed, make_structured_probs_fn_flat)

    factory = {"blockcomposed": make_structured_probs_fn_blockcomposed,
               "flat": make_structured_probs_fn_flat}[factory_name]
    n, L = 9, 4
    edges = [(0, 1), (1, 5), (2, 7), (6, 8), (0, 8)]
    rng = np.random.default_rng(7)
    p = jnp.asarray(0.1 * rng.normal(size=3 * L * n), dtype=jnp.float32)
    v = jnp.asarray(rng.normal(size=2**n), dtype=jnp.float32)
    plain = factory(n, L, edges)
    remat = factory(n, L, edges, remat_layers=True)
    np.testing.assert_array_equal(np.asarray(jax.jit(plain)(p)),
                                  np.asarray(jax.jit(remat)(p)))
    g1 = jax.jit(jax.grad(lambda q: plain(q).astype(jnp.float32) @ v))(p)
    g2 = jax.jit(jax.grad(lambda q: remat(q).astype(jnp.float32) @ v))(p)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
    # conditioned + reupload variant (embed wall inside each layer body)
    cond_plain = factory(n, L, edges, conditioning=True, reupload=True)
    cond_remat = factory(n, L, edges, conditioning=True, reupload=True,
                         remat_layers=True)
    ang = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(jax.jit(cond_plain)(p, ang)),
                                  np.asarray(jax.jit(cond_remat)(p, ang)))


@pytest.mark.parametrize("factory_name", ["blockcomposed", "flat"])
@pytest.mark.parametrize("n,L,block", [(6, 3, 4), (8, 2, 4)])
def test_per_layer_embed_angles(factory_name, n, L, block):
    """Per-layer embed_angles (layers, n) — the cond_embed_per_layer
    executor contract: a tiled copy of a 1D wall must reproduce the
    shared-wall reupload output exactly (both the fold path, n >= 2b, and
    the wall-on-state path), distinct per-layer angles must change the
    distribution, and gradients must flow through the angles."""
    from tensornetworks_tpu.sim.structured import (
        make_structured_probs_fn_blockcomposed, make_structured_probs_fn_flat)

    factory = {"blockcomposed": make_structured_probs_fn_blockcomposed,
               "flat": make_structured_probs_fn_flat}[factory_name]
    rng = np.random.default_rng(5 * n + L)
    edges = [(i, i + 1) for i in range(0, n - 1, 2)]
    p = jnp.asarray(0.1 * rng.normal(size=3 * L * n), dtype=jnp.float32)
    ang = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)
    fn = factory(n, L, edges, block=block, conditioning=True, reupload=True)

    shared = np.asarray(fn(p, ang))
    tiled = np.asarray(fn(p, jnp.tile(ang[None, :], (L, 1))))
    np.testing.assert_allclose(tiled, shared, atol=5e-7)

    ang2 = jnp.asarray(rng.normal(size=(L, n)), dtype=jnp.float32)
    distinct = np.asarray(fn(p, ang2))
    assert np.isclose(distinct.sum(), 1.0, atol=1e-5)
    assert np.abs(distinct - shared).sum() > 1e-3

    v = jnp.asarray(rng.normal(size=2 ** n), dtype=jnp.float32)
    g = jax.grad(lambda a: fn(p, a).astype(jnp.float32) @ v)(ang2)
    assert np.all(np.abs(np.asarray(g)).sum(axis=1) > 0), \
        "every layer's wall must receive gradient"

    # 2D angles without reupload are rejected
    fn_plain = factory(n, L, edges, block=block, conditioning=True)
    with pytest.raises(ValueError, match="reupload"):
        fn_plain(p, ang2)

"""Stein/KSD oracle tests.

Golden values come from the reference's inline self-tests
(``stein_utils.py:199-253``): closed-form 1-D Stein kernel values, score
values, and the joint p(B=1, A=1)=0.12 on a hand-built 2-node network. The
dense Gram and Kronecker matvec paths are additionally cross-checked against
a brute-force Eq.-13 implementation written independently here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tensornetworks_tpu.core import BayesianNetwork, all_bitstrings, get_sprinkler_network
from tensornetworks_tpu.ops import (
    SteinOperator,
    base_hamming_kernel,
    decay_factor,
    hamming_kernel_matrix,
    ksd_quadform,
    score_table,
    score_table_from_log,
    stein_gram_dense,
    stein_matvec,
)

import jax


def make_ab_network():
    # stein_utils.py:221-223 test network: P(A=1)=0.2; P(B=1|A=0)=0.3, P(B=1|A=1)=0.6.
    bn = BayesianNetwork()
    bn.add_node("A", cpt={(): {0: 0.8, 1: 0.2}})
    bn.add_node("B", cpt={(0,): {0: 0.7, 1: 0.3}, (1,): {0: 0.4, 1: 0.6}}, parent_names=["A"])
    return bn


def brute_force_stein_gram(S, num_vars, length_scale=1.0):
    """Direct Eq.-13 transcription with explicit bit flips (test oracle)."""
    size = 2**num_vars
    bits = all_bitstrings(num_vars).astype(np.float64)

    def kernel(i, j):
        d = np.abs(bits[i] - bits[j]).sum()
        return np.exp(-d / (num_vars * length_scale))

    def flip(i, m):
        return i ^ (1 << (num_vars - 1 - m))

    Kp = np.zeros((size, size))
    for i in range(size):
        for j in range(size):
            k_ij = kernel(i, j)
            term1 = S[i] @ S[j] * k_ij
            d2 = np.array([k_ij - kernel(i, flip(j, m)) for m in range(num_vars)])
            term2 = -S[i] @ d2
            d1 = np.array([k_ij - kernel(flip(i, m), j) for m in range(num_vars)])
            term3 = -d1 @ S[j]
            term4 = sum(
                k_ij - kernel(i, flip(j, m)) - kernel(flip(i, m), j)
                + kernel(flip(i, m), flip(j, m))
                for m in range(num_vars)
            )
            Kp[i, j] = term1 + term2 + term3 + term4
    return Kp


def test_base_kernel_oracle():
    # stein_utils.py:208-218: d((0,0,1,1),(1,0,0,1)) = 2, k = exp(-2/4).
    z1 = jnp.array([0.0, 0.0, 1.0, 1.0])
    z2 = jnp.array([1.0, 0.0, 0.0, 1.0])
    val = base_hamming_kernel(z1, z2, 4, 1.0)
    assert abs(float(val) - np.exp(-0.5)) < 1e-12


def test_hamming_kernel_matrix_kron_consistency():
    # Dense Gram equals the Kronecker factorization applied to identity columns.
    n = 4
    K = np.asarray(hamming_kernel_matrix(n, 1.0, dtype=jnp.float64))
    a = decay_factor(n, 1.0)
    from tensornetworks_tpu.ops import kron_matvec

    I = jnp.eye(2**n, dtype=jnp.float64)
    K2 = np.asarray(kron_matvec(I, np.array([[1.0, a], [a, 1.0]]), n, group=3))
    np.testing.assert_allclose(K, K2, atol=1e-12)


def test_score_oracle_ab_network():
    bn = make_ab_network()
    t = bn.conditional_joint_table(["A"], {"B": 1})
    # stein_utils.py:229-231: p(B=1, A=1) = 0.2*0.6 = 0.12
    assert abs(t[1] - 0.12) < 1e-12
    S = score_table(t)
    # stein_utils.py:233-236: s_p(A=1) = -1.0, s_p(A=0) = 0.5
    assert abs(S[1, 0] - (-1.0)) < 1e-12
    assert abs(S[0, 0] - 0.5) < 1e-12


def test_score_table_from_log_matches():
    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    S_np = score_table(t)
    S_jax = np.asarray(score_table_from_log(jnp.log(jnp.asarray(t)), 3))
    np.testing.assert_allclose(S_np, S_jax, atol=1e-10)


def test_score_zero_guard():
    t = np.array([0.0, 0.3, 0.0, 0.7])
    S = score_table(t)
    assert np.all(S[0] == 0.0) and np.all(S[2] == 0.0)
    assert np.isfinite(S).all()


def test_stein_kernel_1d_oracles():
    # stein_utils.py:239-252 closed forms.
    bn = make_ab_network()
    t = bn.conditional_joint_table(["A"], {"B": 1})
    S = score_table(t)
    Kp = np.asarray(stein_gram_dense(S, 1, 1.0, dtype=jnp.float64))
    assert abs(Kp[0, 1] - (2 * np.exp(-1.0) - 2.5)) < 1e-12
    assert abs(Kp[1, 0] - (2 * np.exp(-1.0) - 2.5)) < 1e-12
    assert abs(Kp[0, 0] - (1.25 - np.exp(-1.0))) < 1e-12


def test_dense_gram_matches_brute_force():
    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    S = score_table(t)
    Kp_dense = np.asarray(stein_gram_dense(S, 3, 1.0, dtype=jnp.float64))
    Kp_brute = brute_force_stein_gram(S, 3, 1.0)
    np.testing.assert_allclose(Kp_dense, Kp_brute, atol=1e-12)
    # Symmetry + PSD (Stein Gram of a proper score is PSD).
    np.testing.assert_allclose(Kp_dense, Kp_dense.T, atol=1e-12)
    assert np.linalg.eigvalsh(Kp_brute).min() > -1e-10


def test_matvec_matches_dense_random():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 5]:
        S = rng.normal(size=(2**n, n))
        q = rng.random(2**n)
        Kp = np.asarray(stein_gram_dense(S, n, 0.7, dtype=jnp.float64))
        y_dense = Kp @ q
        B = all_bitstrings(n).astype(np.float64)
        y_mv = np.asarray(
            stein_matvec(jnp.asarray(q), jnp.asarray(S), jnp.asarray(B), n, 0.7, group=3)
        )
        np.testing.assert_allclose(y_mv, y_dense, rtol=1e-10, atol=1e-10)


def test_ksd_zero_at_true_posterior():
    # KSD(q) = 0 iff q = p(z|x): the strongest end-to-end check of
    # score table + Gram assembly (paper property, SURVEY.md §4).
    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    S = score_table(t)
    post = bn.posterior_vector(["C", "S", "R"], {"W": 1})
    op = SteinOperator(S, 3, 1.0, dtype=jnp.float64)
    val = float(op.quadform(jnp.asarray(post)))
    assert abs(val) < 1e-12
    # And strictly positive elsewhere.
    q_uniform = jnp.full(8, 1.0 / 8, dtype=jnp.float64)
    assert float(op.quadform(q_uniform)) > 1e-4


def test_quadform_custom_vjp_matches_dense_grad():
    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    S = score_table(t)
    op_dense = SteinOperator(S, 3, 1.0, dtype=jnp.float64, dense=True)
    op_mv = SteinOperator(S, 3, 1.0, dtype=jnp.float64, dense=False, group=2)
    q = jnp.asarray(np.random.default_rng(1).random(8))
    g_dense = jax.grad(op_dense.quadform)(q)
    g_mv = jax.grad(op_mv.quadform)(q)
    np.testing.assert_allclose(np.asarray(g_mv), np.asarray(g_dense), rtol=1e-10)
    assert abs(float(op_dense.quadform(q)) - float(op_mv.quadform(q))) < 1e-10


def test_ksd_loss_clamp():
    bn = get_sprinkler_network()
    t = bn.conditional_joint_table(["C", "S", "R"], {"W": 1})
    S = score_table(t)
    op = SteinOperator(S, 3, 1.0, dtype=jnp.float64)
    post = bn.posterior_vector(["C", "S", "R"], {"W": 1})
    # At the true posterior the quadform underflows the 1e-12 clamp:
    # loss = sqrt(1e-12) = 1e-6 (reference ksd_vi.py:133-134 semantics).
    assert abs(float(op.ksd_loss(jnp.asarray(post))) - 1e-6) < 1e-9


def test_kron_matvec_rows_matches_columns():
    # The large-n row layout must agree with the column layout exactly.
    from tensornetworks_tpu.ops.kron import kron_matvec, kron_matvec_rows

    rng = np.random.default_rng(3)
    n, C = 10, 13
    a = float(np.exp(-1.0 / n))
    A = np.array([[1.0, a], [a, 1.0]])
    V = jnp.asarray(rng.normal(size=(2**n, C)))
    y_cols = np.asarray(kron_matvec(V, A, n, group=4))
    y_rows = np.asarray(kron_matvec_rows(V.T, A, n, group=4)).T
    np.testing.assert_allclose(y_rows, y_cols, rtol=1e-10, atol=1e-12)


def test_stein_matvec_row_layout_large_n():
    # n >= 18 triggers the row layout; cross-check against a small-group
    # column-layout evaluation of the same operator.
    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.core.bits import all_bitstrings as ab

    n = 18
    bn = get_random_chain_network(n + 1, seed=4)
    t = bn.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
    S = jnp.asarray(score_table(t), dtype=jnp.float32)
    B = jnp.asarray(ab(n), dtype=jnp.float32)
    q = jnp.asarray(np.random.default_rng(0).random(2**n), dtype=jnp.float32)
    y_rows = stein_matvec(q, S, B, n, 1.0)  # auto: rows at n>=18
    # Column-layout evaluation via the Kronecker identity K_p q expansion:
    from tensornetworks_tpu.ops.kron import kron_matvec
    from tensornetworks_tpu.ops.hamming import decay_factor

    a = decay_factor(n, 1.0)
    A = np.array([[1.0, a], [a, 1.0]])
    SB = S * B
    V = jnp.concatenate([q[:, None], B * q[:, None], S * q[:, None], SB * q[:, None]], axis=1)
    Y = kron_matvec(V, A, n)
    P0, P = Y[:, 0], Y[:, 1:n + 1]
    Q, T = Y[:, n + 1:2 * n + 1], Y[:, 2 * n + 1:]
    u, R, h = SB.sum(1), S.sum(1), B.sum(1)
    c1, c2 = 1 - 1 / a, 1 - a
    y_cols = ((S * Q).sum(1)
              - c1 * ((u * P0 + (S * (1 - 2 * B) * P).sum(1))
                      + (T.sum(1) + (B * (Q - 2 * T)).sum(1)))
              - c2 * ((R * P0) + Q.sum(1)
                      - (u * P0 + (S * (1 - 2 * B) * P).sum(1))
                      - (T.sum(1) + (B * (Q - 2 * T)).sum(1)))
              + 2 * n * (1 - a) * P0
              - 2 * (1 / a - a) * (h * P0 + P.sum(1) - 2 * (B * P).sum(1)))
    np.testing.assert_allclose(np.asarray(y_rows), np.asarray(y_cols),
                               rtol=2e-4, atol=2e-4 * float(jnp.abs(y_cols).max()))


def test_matvec_2d_window_matches_grouped():
    # The 13..17 two-big-dots layout must agree with the grouped Kronecker
    # path (and, transitively, with the dense Gram verified above).
    import numpy as np
    import jax.numpy as jnp
    from tensornetworks_tpu.core import get_random_chain_network, all_bitstrings
    from tensornetworks_tpu.ops import score_table
    from tensornetworks_tpu.ops.hamming import decay_factor
    from tensornetworks_tpu.ops.kron import kron_matvec_rows
    from tensornetworks_tpu.ops.stein import _kron_apply_2d

    for n in (13, 14, 15):
        bn = get_random_chain_network(n + 1, seed=1)
        t = bn.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
        S = jnp.asarray(score_table(t))
        B = jnp.asarray(all_bitstrings(n), dtype=S.dtype)
        q = jnp.asarray(np.random.default_rng(n).random(2**n))
        St, Bt = S.T, B.T
        V = jnp.concatenate([q[None, :], Bt * q, St * q, (St * Bt) * q], axis=0)
        a = decay_factor(n, 1.0)
        A = np.array([[1.0, a], [a, 1.0]])
        Y1 = np.asarray(_kron_apply_2d(V, A, n))
        Y2 = np.asarray(kron_matvec_rows(V, A, n))
        np.testing.assert_allclose(Y1, Y2, rtol=1e-10,
                                   atol=1e-10 * np.abs(Y2).max())


def test_matvec_gcorr_matches_dense():
    # n+1-column decomposition (bit masks pushed through K as closed-form
    # 2x2 G-corrections) must equal the dense Gram matvec exactly, for both
    # Kronecker apply layouts and odd/even n.
    import numpy as np
    import jax.numpy as jnp
    from tensornetworks_tpu.core.bits import all_bitstrings
    from tensornetworks_tpu.ops.stein import stein_gram_dense, stein_matvec_gcorr

    for n in (2, 3, 6, 9):
        rng = np.random.default_rng(n)
        S = jnp.asarray(rng.normal(size=(2**n, n)))
        B = jnp.asarray(all_bitstrings(n), dtype=S.dtype)
        q = jnp.asarray(rng.dirichlet(np.ones(2**n)))
        y_ref = np.asarray(stein_gram_dense(S, n, dtype=S.dtype) @ q)
        for kron in ("2d", "rows"):
            y = np.asarray(stein_matvec_gcorr(q, S, B, n, kron=kron))
            np.testing.assert_allclose(y, y_ref, rtol=1e-10,
                                       atol=1e-10 * np.abs(y_ref).max())


@pytest.mark.slow
def test_operator_gcorr_2d_window_real_scores():
    # The production operator path (gcorr tables, kron='2d') at a 13-qubit
    # real-score-table size vs the dense Gram, including quadform grad.
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.ops import SteinOperator, score_table
    from tensornetworks_tpu.ops.stein import stein_gram_dense

    n = 13
    bn = get_random_chain_network(n + 1, seed=3)
    t = bn.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
    S = score_table(t)
    op = SteinOperator(S, n, dense=False)
    assert op.gcorr is not None and op._gcorr_kron == "2d"
    q = jnp.asarray(np.random.default_rng(0).dirichlet(np.ones(2**n)),
                    dtype=jnp.float32)
    Kp = stein_gram_dense(jnp.asarray(S, dtype=jnp.float64), n,
                          dtype=jnp.float64)
    y_ref = np.asarray(Kp @ np.asarray(q, dtype=np.float64))
    y = np.asarray(op.matvec(q))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4,
                               atol=2e-4 * np.abs(y_ref).max())
    g = np.asarray(jax.grad(lambda x: op.quadform_from(x, *op.args()))(q))
    np.testing.assert_allclose(g, 2.0 * y_ref, rtol=2e-4,
                               atol=4e-4 * np.abs(y_ref).max())


@pytest.mark.slow
def test_gcorr_tables_large_n_window_matches_naive():
    # Extends the exactness window to the production large-n regime
    # (VERDICT r2 directive 3): the gcorr-tables matvec (n+1 Kronecker
    # columns + one-flip-per-bit corrections, both kron layouts) must agree
    # with the independently-verified naive 3n+1-column decomposition
    # (`stein_matvec`, cross-checked vs the dense Gram at n<=9 and a
    # brute-force column evaluation at n=18 above) in float64 at n=18-20.
    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.core.bits import all_bitstrings as ab
    from tensornetworks_tpu.ops.stein import (make_gcorr_tables,
                                              stein_matvec_gcorr_tables)

    for n in (18, 20, 21):
        bn = get_random_chain_network(n + 1, seed=n)
        t = bn.conditional_joint_table([f"V{i}" for i in range(n)],
                                       {f"V{n}": 1})
        S = jnp.asarray(score_table(t), dtype=jnp.float64)
        B = jnp.asarray(ab(n), dtype=jnp.float64)
        q = jnp.asarray(np.random.default_rng(n).dirichlet(np.ones(2**n)),
                        dtype=jnp.float64)
        y_ref = np.asarray(stein_matvec(q, S, B, n, compute_dtype=jnp.float64))
        tables = make_gcorr_tables(S, n)
        for kron in ("2d", "rows"):
            for corr in ("flips", "matmul", "folded"):
                y = np.asarray(stein_matvec_gcorr_tables(q, tables, n,
                                                         kron=kron, corr=corr))
                np.testing.assert_allclose(y, y_ref, rtol=1e-9,
                                           atol=1e-9 * np.abs(y_ref).max())


@pytest.mark.slow
def test_gcorr_tables_n22_matches_naive():
    # Completes the VERDICT r2 directive-3 window (18-22) at its upper end
    # for the production n=22 configuration (rows kron + folded/matmul
    # corrections). Kept `slow`: the naive reference builds a (67, 2^22)
    # float64 column batch (~2.2 GB).
    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.core.bits import all_bitstrings as ab
    from tensornetworks_tpu.ops.stein import (make_gcorr_tables,
                                              stein_matvec_gcorr_tables)

    n = 22
    bn = get_random_chain_network(n + 1, seed=n)
    t = bn.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
    S = jnp.asarray(score_table(t), dtype=jnp.float64)
    B = jnp.asarray(ab(n), dtype=jnp.float64)
    q = jnp.asarray(np.random.default_rng(n).dirichlet(np.ones(2**n)),
                    dtype=jnp.float64)
    y_ref = np.asarray(stein_matvec(q, S, B, n, compute_dtype=jnp.float64))
    tables = make_gcorr_tables(S, n)
    for corr in ("folded", "matmul"):
        y = np.asarray(stein_matvec_gcorr_tables(q, tables, n, kron="rows",
                                                 corr=corr))
        np.testing.assert_allclose(y, y_ref, rtol=1e-9,
                                   atol=1e-9 * np.abs(y_ref).max())


def test_operator_gcorr_path_keeps_s_and_b_lazy():
    # The production gcorr operator must never materialize the (2^n, n)
    # S/B device tables: at n = 24 each is 1.6 GB of HBM the exact-KSD
    # engine cannot spare. matvec/quadform/args() may only touch the
    # GcorrTables; .S/.B stay host-side-only until explicitly requested
    # (the distributed placement path does, and must still work).
    from tensornetworks_tpu.ops import SteinOperator, score_table
    from tensornetworks_tpu.core import get_random_chain_network

    n = 13
    bn = get_random_chain_network(n + 1, seed=1)
    t = bn.conditional_joint_table([f"V{i}" for i in range(n)], {f"V{n}": 1})
    op = SteinOperator(score_table(t), n, dense=False)
    assert op.gcorr is not None
    q = jnp.asarray(np.random.default_rng(0).dirichlet(np.ones(2**n)),
                    dtype=jnp.float32)
    op.matvec(q)
    float(op.quadform(q))
    float(op.ksd_loss_from(q, *op.args()))
    assert op._S is None and op._B is None
    # Explicit access still materializes them (fallback + distributed paths).
    assert op.S.shape == (2**n, n) and op.B.shape == (2**n, n)
    assert op._S is not None and op._B is not None


def test_operator_nondefault_length_scale_matches_brute_force():
    """Every operator path (dense Gram, gcorr tables matvec, quadform-from-
    tables) must honor base kernel length scales != 1 — the sweep lever for
    large-n quality (scripts/probe_lengthscale16.py). Tests elsewhere only
    exercise the default."""
    import jax.numpy as jnp
    from tensornetworks_tpu.ops.stein import SteinOperator, stein_gram_dense

    n = 6
    rng = np.random.default_rng(11)
    S = rng.normal(size=(2**n, n))
    q = jnp.asarray(rng.dirichlet(np.ones(2**n)), dtype=jnp.float64)
    for ls in (0.0625, 0.25, 0.5, 2.0, 4.0):
        Kp = brute_force_stein_gram(S, n, length_scale=ls)
        ref = float(np.asarray(q) @ Kp @ np.asarray(q))
        dense = SteinOperator(S, n, length_scale=ls, dense=True,
                              dtype=jnp.float64)
        np.testing.assert_allclose(float(dense.quadform(q)), ref, rtol=1e-9)
        op = SteinOperator(S, n, length_scale=ls, dense=False,
                           dtype=jnp.float64)
        np.testing.assert_allclose(float(op.quadform(q)), ref, rtol=1e-9)
        np.testing.assert_allclose(float(op.quadform_from(q, *op.args())),
                                   ref, rtol=1e-9)


def test_resolve_length_scale():
    from tensornetworks_tpu.ops import resolve_length_scale

    # Measured per-n optimum: n*l = 1 up to 17 vars, n*l = 2 from 18
    # (RESULTS.md bandwidth sweeps; the 18q crossover probe pinned the
    # switch point — 0.0161 at 2/n vs 0.0713 at 1/n).
    assert resolve_length_scale("auto", 16) == 1.0 / 16
    assert resolve_length_scale("auto", 17) == 1.0 / 17
    assert resolve_length_scale("auto", 18) == 2.0 / 18
    assert resolve_length_scale("auto", 20) == 0.1
    assert resolve_length_scale("auto", 24) == 2.0 / 24
    assert resolve_length_scale(0.5, 16) == 0.5
    assert resolve_length_scale(2, 4) == 2.0
    with pytest.raises(ValueError):
        resolve_length_scale("sharp", 8)


def test_engines_accept_auto_length_scale():
    """Every engine exposing base_kernel_length_scale resolves 'auto'
    through the shared per-n rule (1/n here at n=4)."""
    from tensornetworks_tpu.core import get_random_chain_network
    from tensornetworks_tpu.engines import (
        KSDVariationalInference, QuantumKSDVariationalInference)
    from tensornetworks_tpu.engines.amortized import AmortizedKSD
    from tensornetworks_tpu.engines.sampled import SampledKSDVariationalInference

    n = 4
    bn = get_random_chain_network(n + 1, seed=0)
    latent = [f"V{i}" for i in range(n)]
    obs = [f"V{n}"]
    q = QuantumKSDVariationalInference(
        bn, latent, obs, qbm_num_latent_vars=n,
        base_kernel_length_scale="auto")
    assert q.base_kernel_length_scale == 0.25
    c = KSDVariationalInference(
        bn, latent, obs, born_machine_config={},
        base_kernel_length_scale="auto")
    assert c.base_kernel_length_scale == 0.25
    a = AmortizedKSD(
        bn, latent, obs, born_machine_config={},
        base_kernel_length_scale="auto")
    assert a.length_scale == 0.25
    s = SampledKSDVariationalInference(
        bn, latent, obs, base_kernel_length_scale="auto", num_samples=16)
    assert s.length_scale == 0.25

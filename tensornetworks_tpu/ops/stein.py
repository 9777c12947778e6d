"""Discrete kernelized Stein discrepancy over {0,1}^n as dense linear algebra.

Rebuilds ``stein_utils.py`` (reference) around one observation: the Stein
kernel ``k_p(z_i, z_j)`` ("Eq. 13") depends on θ not at all — it is a fixed
``(2^n, 2^n)`` matrix ``K_p`` determined by the Bayesian network (through the
score table S) and the base Hamming kernel. The reference recomputes every
entry with Python-scalar torch ops **every epoch**
(``ksd_vi.py:114-131`` + ``stein_utils.py:138-197``); here the whole Gram is
assembled **once** from closed forms, and each training step is
``loss = sqrt(qᵀ K_p q)`` — a matmul.

Closed form. With ``a = exp(-1/(n·l))``, ``K[i,j] = a^{d_ij}`` and bits
matrix ``B``, flipping bit m of z_j multiplies ``K[i,j]`` by ``1/a`` when
``bit_m(i^j)=1`` and by ``a`` otherwise. Substituting into the four Stein
terms gives ``K_p = K ∘ W`` where (c1 = 1-1/a, c2 = 1-a, T1[i,j] =
Σ_{m:bit_m(i^j)=1} S[i,m], R = S·1, D = Hamming distance matrix):

    W = S Sᵀ - c1·(T1 + T1ᵀ) - c2·(R 1ᵀ + 1 Rᵀ - T1 - T1ᵀ)
        + 2n(1-a) - 2(1/a - a)·D

and every matrix above is a product of ``(2^n, n)`` factors — pure MXU work.

For large n the Gram is never materialized: ``K = A^{⊗n}`` (Kronecker), so
``K_p @ q`` decomposes into 3n+1 Kronecker matvecs (see ``stein_matvec``),
O(n²·2^n) total. Verified against the reference's 1-D analytic oracles
(``stein_utils.py:229-252``) in tests/test_stein.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.bits import all_bitstrings
from .hamming import decay_factor
from .kron import kron_matvec, kron_matvec_rows, kron_power_np

# Reference zero-probability guard threshold (stein_utils.py:126).
SCORE_EPS = 1e-12


# ------------------------------------------------------------------- scores


def score_table(cond_joint: np.ndarray, eps: float = SCORE_EPS) -> np.ndarray:
    """Score matrix S[i, m] = 1 - p(x, flip_m z_i) / p(x, z_i), float64.

    ``cond_joint`` is the dense ``t[z] = p(x, z)`` table from
    ``BayesianNetwork.conditional_joint_table``. Rows with ``t < eps`` are
    zeroed, matching ``stein_utils.py:115-136``.
    """
    t = np.asarray(cond_joint, dtype=np.float64)
    size = t.shape[0]
    n = int(size).bit_length() - 1
    if 2**n != size:
        raise ValueError("conditional joint table length must be a power of 2")
    if n == 0:
        return np.zeros((1, 0), dtype=np.float64)
    idx = np.arange(size, dtype=np.int64)
    S = np.zeros((size, n), dtype=np.float64)
    safe_t = np.where(np.abs(t) < eps, 1.0, t)
    for m in range(n):
        flipped = idx ^ (1 << (n - 1 - m))
        S[:, m] = 1.0 - t[flipped] / safe_t
    S[np.abs(t) < eps, :] = 0.0
    return S


def score_table_from_log(log_t: jnp.ndarray, num_vars: int, log_eps: float = np.log(SCORE_EPS)) -> jnp.ndarray:
    """On-device score table from a log joint table (for very large n)."""
    if num_vars == 0:
        return jnp.zeros((1, 0), dtype=log_t.dtype)
    idx = jnp.arange(log_t.shape[0], dtype=jnp.int32)
    cols = []
    for m in range(num_vars):
        flipped = idx ^ (1 << (num_vars - 1 - m))
        cols.append(1.0 - jnp.exp(log_t[flipped] - log_t))
    S = jnp.stack(cols, axis=1)
    return jnp.where(log_t[:, None] < log_eps, 0.0, S)


# --------------------------------------------------------------- dense Gram


def stein_gram_dense(S, num_vars: int, length_scale: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """The full (2^n, 2^n) Stein Gram matrix K_p, assembled via matmuls.

    Use for n ≲ 13 where 4^n memory is fine; one-time cost, reused for every
    epoch's ``qᵀ K_p q``.
    """
    S = jnp.asarray(S, dtype=dtype)
    B = jnp.asarray(all_bitstrings(num_vars), dtype=dtype)
    if num_vars == 0:
        return jnp.zeros((1, 1), dtype=dtype)
    a = decay_factor(num_vars, length_scale)
    h = B.sum(axis=1)
    D = h[:, None] + h[None, :] - 2.0 * (B @ B.T)
    K = jnp.power(jnp.asarray(a, dtype=dtype), D)
    G = S @ S.T
    u = (S * B).sum(axis=1)
    T1 = u[:, None] + S @ B.T - 2.0 * ((S * B) @ B.T)
    R = S.sum(axis=1)
    c1 = 1.0 - 1.0 / a
    c2 = 1.0 - a
    W = (
        G
        - c1 * (T1 + T1.T)
        - c2 * (R[:, None] + R[None, :] - T1 - T1.T)
        + 2.0 * num_vars * (1.0 - a)
        - 2.0 * (1.0 / a - a) * D
    )
    return K * W


# ------------------------------------------------------------ matvec (large n)


def _kron_apply_2d(V: jnp.ndarray, A: np.ndarray, n: int) -> jnp.ndarray:
    """Apply K = A^{⊗n} to every row of ``V`` (rows layout, (3n+1, 2^n)) via
    the two-sided split K = A^{⊗rb} ⊗ A^{⊗cb}: each row viewed as an (R, C)
    matrix gives ``Ar @ X @ Acᵀ``. Batched as TWO whole-batch MXU dots with
    lane-preserving relayouts between — the fastest n≈16 formulation measured
    (the fused Pallas kernel loops 3n+1 small dots; Mosaic's no-lane-reshape
    rule forbids this batching in-kernel, XLA does it natively)."""
    cols = V.shape[0]
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    Ar = jnp.asarray(kron_power_np(A, rb), dtype=V.dtype)
    Ac = jnp.asarray(kron_power_np(A, cb), dtype=V.dtype)
    X = V.reshape(cols, R, C).transpose(1, 0, 2).reshape(R, cols * C)
    L = Ar @ X
    Rcat = L.reshape(R, cols, C).transpose(1, 0, 2).reshape(cols * R, C)
    Y = Rcat @ Ac.T
    return Y.reshape(cols, 1 << n)


def _row_bit_flip(X: jnp.ndarray, t: int) -> jnp.ndarray:
    """Reverse row-index bit ``t`` (MSB-first) of an (R, C) matrix: a
    sublane-axis swap — the lane (last) dimension is untouched, which is the
    whole point (per-bit flips on the flat (2^n,) vector put tiny extents on
    the lane axis for low-order bits and relayout-crawl on TPU)."""
    R, C = X.shape
    pre = 1 << t
    return X.reshape(pre, 2, R // (2 * pre), C)[:, ::-1].reshape(R, C)


def _col_bit_flip(X: jnp.ndarray, t: int) -> jnp.ndarray:
    """Reverse column-index bit ``t`` (MSB-first) of an (R, C) matrix. Cheap
    only for COARSE bits (flip stride ≥ 128 lanes: whole lane-tile block
    swaps); fine column bits belong in the folded permutation einsum."""
    R, C = X.shape
    pre = 1 << t
    return X.reshape(R, pre, 2, C // (2 * pre))[:, :, ::-1].reshape(R, C)


def stein_matvec_gcorr(q: jnp.ndarray, S: jnp.ndarray, B: jnp.ndarray,
                       num_vars: int, length_scale: float = 1.0,
                       group: int = 7, kron: str = "2d") -> jnp.ndarray:
    """y = K_p @ q with only ``n + 1`` columns through the Kronecker apply.

    The naive decomposition (``stein_matvec``) pushes 3n+1 weighted copies of
    q through ``K = A^{⊗n}``; but the 2n *bit-masked* columns commute through
    K in closed form:

        K (bit_t ∘ v) = G_t (K v),   G = A P₁ A⁻¹  (2x2 on bit t),
        P₁ = diag(0, 1)  ⇒  G = [[-a², a], [-a, 1]] / (1 - a²),

    so only [q, S_t∘q] ride the (dominant) Kronecker pass — a 2.9x cut in
    its FLOPs and HBM traffic — and each masked column becomes an elementwise
    2x2 along bit t of an already-computed result:

        P_t = K(bit_t∘q)      = cs_t∘P0 + cf_t∘flip_t(P0),
        T_t = K(bit_t∘S_t∘q)  = cs_t∘Q_t + cf_t∘flip_t(Q_t),

    with cs/cf the G-diagonal/off-diagonal selected by bit t (elementwise in
    B), and the recombination only ever consuming *weighted sums* Σ_t w_t∘P_t
    / Σ_t w_t∘T_t. Flips run as sublane-axis swaps on the (R, C) super-block
    view — row bits directly, column bits through one batched transpose —
    never as tiny-lane reshapes. All weight tables are elementwise in S and
    B, so XLA hoists them out of training scans. Exactness vs the dense Gram
    is asserted in tests/test_stein.py.
    """
    n = num_vars
    if n == 0:
        return jnp.zeros_like(q)
    a = decay_factor(n, length_scale)
    A = np.array([[1.0, a], [a, 1.0]])
    inv = 1.0 / (1.0 - a * a)
    G00, G01, G10, G11 = -a * a * inv, a * inv, -a * inv, inv
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb

    St, Bt = S.T, B.T                       # (n, 2^n)
    V = jnp.concatenate([q[None, :], St * q], axis=0)  # (n+1, 2^n)
    if kron == "2d":
        Y = _kron_apply_2d(V, A, n)
    else:
        Y = kron_matvec_rows(V, A, n, group=group)
    P0, Q = Y[0], Y[1:]                     # (2^n,), (n, 2^n)

    cs = G00 + (G11 - G00) * Bt             # (n, 2^n): G[b, b]
    cf = G01 + (G10 - G01) * Bt             # (n, 2^n): G[b, 1-b]
    one2b = 1.0 - 2.0 * Bt

    # Weighted P/T sums the recombination needs (derivation: stein_gram_dense
    # docstring W):  y_T1 needs Σ S_t(1-2B_t)∘P_t;  y_D needs Σ (1-2B_t)∘P_t;
    # y_T1t needs Σ (1-2B_t)∘T_t (+ Σ B_t∘Q_t).
    wP1 = St * one2b                        # weights on P_t for y_T1
    wP2 = one2b                             # weights on P_t for y_D
    # "same-bit" parts are elementwise on P0 / Q:
    sum_wP1 = (wP1 * cs).sum(axis=0) * 1.0  # coefficient of P0 per state
    sum_wP2 = (wP2 * cs).sum(axis=0)
    sum_wT = ((one2b * cs) * Q).sum(axis=0)
    # "flipped-bit" parts: Σ_t v_t ∘ flip_t(source), sublane flips on the
    # (R, C) view; column bits ride one transpose each way.
    vP1 = wP1 * cf
    vP2 = wP2 * cf
    vT = one2b * cf

    X0 = P0.reshape(R, C)
    accP1 = jnp.zeros((R, C), dtype=q.dtype)
    accP2 = jnp.zeros((R, C), dtype=q.dtype)
    accT = jnp.zeros((R, C), dtype=q.dtype)
    for t in range(rb):
        Xf = _row_bit_flip(X0, t)
        accP1 = accP1 + vP1[t].reshape(R, C) * Xf
        accP2 = accP2 + vP2[t].reshape(R, C) * Xf
        accT = accT + vT[t].reshape(R, C) * _row_bit_flip(Q[t].reshape(R, C), t)
    if cb:
        X0t = X0.T                          # (C, R)
        # col-bit masks in transposed space: index (c, r) <- flat r*C + c
        vP1t = vP1[rb:].reshape(cb, R, C).transpose(0, 2, 1)
        vP2t = vP2[rb:].reshape(cb, R, C).transpose(0, 2, 1)
        vTt = vT[rb:].reshape(cb, R, C).transpose(0, 2, 1)
        Qt = Q[rb:].reshape(cb, R, C).transpose(0, 2, 1)
        accP1t = jnp.zeros((C, R), dtype=q.dtype)
        accP2t = jnp.zeros((C, R), dtype=q.dtype)
        accTt = jnp.zeros((C, R), dtype=q.dtype)
        for t in range(cb):
            Xf = _row_bit_flip(X0t, t)
            accP1t = accP1t + vP1t[t] * Xf
            accP2t = accP2t + vP2t[t] * Xf
            accTt = accTt + vTt[t] * _row_bit_flip(Qt[t], t)
        accP1 = accP1 + accP1t.T
        accP2 = accP2 + accP2t.T
        accT = accT + accTt.T
    sumP1 = sum_wP1 * P0 + accP1.reshape(-1)   # Σ_t S_t(1-2B_t)∘P_t
    sumP2 = sum_wP2 * P0 + accP2.reshape(-1)   # Σ_t (1-2B_t)∘P_t
    sumT = sum_wT + accT.reshape(-1)           # Σ_t (1-2B_t)∘T_t

    u = (St * Bt).sum(axis=0)
    Rv = St.sum(axis=0)
    h = Bt.sum(axis=0)
    c1 = 1.0 - 1.0 / a
    c2 = 1.0 - a
    term_G = (St * Q).sum(axis=0)
    y_T1 = u * P0 + sumP1
    y_T1t = sumT + (Bt * Q).sum(axis=0)
    y_Ri = Rv * P0
    y_Rj = Q.sum(axis=0)
    y_D = h * P0 + sumP2

    return (
        term_G
        - c1 * (y_T1 + y_T1t)
        - c2 * (y_Ri + y_Rj - y_T1 - y_T1t)
        + 2.0 * n * (1.0 - a) * P0
        - 2.0 * (1.0 / a - a) * y_D
    )


class GcorrTables(NamedTuple):
    """Precomputed tables for ``stein_matvec_gcorr_tables``.

    Round 3 slimmed these from eleven arrays (~420 MB at n = 20) to the score
    table in its row layout plus a bit-flipped copy and one row-sum:
    expanding the G-correction weights shows ``(1-2B_t)·cf_t ≡ a/(1-a²)``
    (a scalar), ``S_t(1-2B_t)·cf_t = a/(1-a²)·S_t``, and every same-bit
    weighted sum collapses because ``G00 + G11 = 1`` — the ``u``, ``h``,
    ``Σ B_t∘Q_t`` and all ``sum_w*`` terms cancel exactly (see
    ``stein_matvec_gcorr_tables``). ``Sf`` is the pre-flipped score table
    ``Sf_t = flip_t(S_t)`` that lets all three flip accumulators fold into
    ONE flip per bit at runtime. Everything is θ-independent and built ONCE
    per operator (XLA does not hoist large invariant expressions out of
    scan bodies)."""

    St: jnp.ndarray        # (n, 2^n) score rows (V build, term_G)
    Sfr: jnp.ndarray       # (rb, R, C) flip_t(S_t) for row bits
    Sfc: jnp.ndarray       # (cb, R, C) flip_t(S_t) for col bits, natural layout
    Rv: jnp.ndarray        # (2^n,) Σ_t S_t


def _make_gcorr_tables_impl(S: jnp.ndarray, num_vars: int) -> GcorrTables:
    n = num_vars
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    St = S.T
    Sfr = jnp.stack([_row_bit_flip(St[b].reshape(R, C), b)
                     for b in range(rb)])
    Sfc = (jnp.stack([_row_bit_flip(St[rb + j].reshape(R, C).T, j).T
                      for j in range(cb)])
           if cb else jnp.zeros((0, R, C), dtype=S.dtype))
    return GcorrTables(St=St, Sfr=Sfr, Sfc=Sfc, Rv=St.sum(axis=0))


def make_gcorr_tables(S: jnp.ndarray, num_vars: int,
                      length_scale: float = 1.0) -> GcorrTables:
    """Build the n+1-column decomposition's tables (see
    ``stein_matvec_gcorr`` for the derivation). The tables do not depend on
    the length scale. Built inside one jit program: operators are
    constructed in factory scope, where eager per-op dispatch on the
    tunneled TPU backend is slow and some ops are UNIMPLEMENTED."""
    del length_scale
    return jax.jit(_make_gcorr_tables_impl, static_argnums=1)(S, num_vars)


def stein_matvec_gcorr_tables(q: jnp.ndarray, t: GcorrTables, num_vars: int,
                              length_scale: float = 1.0, group: int = 7,
                              kron: str = "rows",
                              corr: str = "flips") -> jnp.ndarray:
    """y = K_p @ q from precomputed ``GcorrTables`` — the production large-n
    path (n+1 Kronecker columns + sublane-flip G-corrections, zero in-scan
    table recomputation).

    Correction algebra (from ``stein_matvec_gcorr``, fully expanded): with
    G = A·diag(0,1)·A⁻¹ per bit, cs_t = G[b,b], cf_t = G[b,1-b],

        cf_t = a/(1-a²)·(1-2B_t)          ⇒ (1-2B_t)·cf_t = a/(1-a²) =: aĩ
        (1-2B_t)·cs_t = G00·(1-B_t) - G11·B_t,  and G00 + G11 = 1

    collapse every bits-table term, leaving

        y_T1 + y_T1t = G00·(Rv∘P0 + ΣQ) + aĩ·Σ_t [S_t∘flip_t(P0) + flip_t(Q_t)]
        y_D          = G00·n·P0 + aĩ·Σ_t flip_t(P0).

    Since the final recombination consumes y_T1+y_T1t and y_D *linearly*,
    and ``S_t∘flip_t(P0) = flip_t(Sf_t∘P0)`` with the pre-flipped table
    ``Sf_t = flip_t(S_t)``, ALL flip work folds into one accumulator with
    one flip per bit:

        acc = Σ_t flip_t( α·(Sf_t∘P0 + Q_t) + γ·P0 ),
        α = -(c1-c2)·aĩ,   γ = -2(1/a-a)·aĩ,

    i.e. n sublane-axis swaps on the (R, C) super-block view (column bits
    through one batched transpose) — down from 3n in round 2 and 2n in the
    first round-3 form. Exactness vs ``stein_matvec`` /
    ``stein_matvec_gcorr`` is asserted in tests/test_stein.py up to n = 20.

    ``corr`` selects how the flip accumulator is evaluated:

    - ``"flips"``: the per-bit sublane swaps above (exact elementwise moves;
      the small-n production path).
    - ``"matmul"``: both flip sums as TWO batched 0/1-permutation einsums on
      the MXU — ``Σ_b P_b @ F_b`` for row bits and ``Σ_j F_j @ P_j`` for
      column bits, with the permutations generated in-program from iota
      (loop-invariant recomputation is cheap; tables would be (n/2)·R² each).
      No per-bit kernels and ZERO transposes (the natural-layout ``Sfc``
      feeds the right-multiplication directly). Measured at n=20 on v5e:
      2.68 ms vs 3.48 ms for flips (the 10-swap row loop alone was 1.5 ms at
      ~135 GB/s effective). On TPU the einsums run at the ambient matmul
      precision (HIGH in the engines: f32 operands split into bf16 passes),
      so results differ from the exact flips at ~1e-5·max rel — same error
      class as every other HIGH dot in the pipeline (quality-equal, see
      scripts/bench_precision.py); in f64 on CPU both are exact.
    - ``"folded"``: coarse bits (flip stride ≥ 128) as exact axis reverses,
      all finer bits batched into one (128, 128)-permutation einsum per side
      on the tile-folded view — cuts the permutation FLOPs from (rb+cb)·R²·C
      to ~n·R·128·C. Measured on the v5e: LOSES at n=20 (4.40 vs 2.68 ms)
      and n=22 (23.5 vs 22.2) — the extra per-op dispatch/relayout cost of
      the reverses outweighs the FLOP cut while the big einsum still fits the
      dot-stream budget — but the matmul form's FLOPs scale R²·C ∝ 8^(n/2)
      (~3.3 TFLOP at n=24, ~75 ms) while folded stays ∝ n·2^n, so folded is
      the production choice from n ≥ 24 (exact-KSD enablement).
    """
    n = num_vars
    if n == 0:
        return jnp.zeros_like(q)
    a = decay_factor(n, length_scale)
    A = np.array([[1.0, a], [a, 1.0]])
    inv = 1.0 / (1.0 - a * a)
    aI = a * inv            # a/(1-a²): the constant flip weight
    G00 = -a * a * inv
    c1 = 1.0 - 1.0 / a
    c2 = 1.0 - a
    alpha = -(c1 - c2) * aI
    gamma = -2.0 * (1.0 / a - a) * aI
    # Coefficients of the flip-free terms after substitution (docstring):
    w1 = -((c1 - c2) * G00 + c2)             # on (Rv∘P0 + ΣQ)
    w0 = 2.0 * n * (1.0 - a) - 2.0 * (1.0 / a - a) * G00 * n   # on P0
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb

    V = jnp.concatenate([q[None, :], t.St * q], axis=0)  # (n+1, 2^n)
    Y = _kron_apply_2d(V, A, n) if kron == "2d" else kron_matvec_rows(
        V, A, n, group=group)
    P0, Q = Y[0], Y[1:]

    X0 = P0.reshape(R, C)
    if corr == "matmul":
        F = alpha * (t.Sfr * X0[None] + Q[:rb].reshape(rb, R, C)) \
            + gamma * X0[None]
        xr = jnp.asarray([R >> (b + 1) for b in range(rb)],
                         dtype=jnp.int32)[:, None, None]
        ri = jax.lax.broadcasted_iota(jnp.int32, (rb, R, R), 1)
        si = jax.lax.broadcasted_iota(jnp.int32, (rb, R, R), 2)
        Pr = (si == (ri ^ xr)).astype(q.dtype)
        acc = jnp.einsum("brs,bsc->rc", Pr, F,
                         preferred_element_type=q.dtype)
        if cb:
            Fc = alpha * (t.Sfc * X0[None] + Q[rb:].reshape(cb, R, C)) \
                + gamma * X0[None]
            xc = jnp.asarray([C >> (j + 1) for j in range(cb)],
                             dtype=jnp.int32)[:, None, None]
            ci = jax.lax.broadcasted_iota(jnp.int32, (cb, C, C), 1)
            di = jax.lax.broadcasted_iota(jnp.int32, (cb, C, C), 2)
            Pc = (di == (ci ^ xc)).astype(q.dtype)
            acc = acc + jnp.einsum("brc,bcd->rd", Fc, Pc,
                                   preferred_element_type=q.dtype)
    elif corr == "flips":
        acc = jnp.zeros((R, C), dtype=q.dtype)
        for b in range(rb):
            F = alpha * (t.Sfr[b] * X0 + Q[b].reshape(R, C)) + gamma * X0
            acc = acc + _row_bit_flip(F, b)
        if cb:
            X0t = X0.T
            Qt = Q[rb:].reshape(cb, R, C).transpose(0, 2, 1)
            SfcT = jnp.transpose(t.Sfc, (0, 2, 1))
            accT = jnp.zeros((C, R), dtype=q.dtype)
            for j in range(cb):
                F = alpha * (SfcT[j] * X0t + Qt[j]) + gamma * X0t
                accT = accT + _row_bit_flip(F, j)
            acc = acc + accT.T
    elif corr == "folded":
        # Hybrid accumulator for large n. The batched full-permutation einsum
        # ("matmul") pays (rb+cb)·R²·C FLOPs — 189 GFLOP at n=22. But a flip
        # of bit b only permutes within aligned blocks of 2·stride: COARSE
        # bits (stride ≥ 128 rows/lanes) are whole-tile block swaps → plain
        # axis reverses (exact copies, zero FLOPs); everything finer lives
        # inside 128-wide tiles → ONE batched (128, 128) permutation einsum
        # per side on the (…, 128)-folded view, R·128·C FLOPs per bit instead
        # of R²·C. Exact in f64; on TPU the fine einsums run at the ambient
        # matmul precision like every other dot (coarse bits stay bit-exact).
        acc = jnp.zeros((R, C), dtype=q.dtype)
        Qr = Q[:rb].reshape(rb, R, C)
        m = min(128, R)
        b0 = next((b for b in range(rb) if (R >> (b + 1)) < m), rb)
        for b in range(b0):
            Fb = alpha * (t.Sfr[b] * X0 + Qr[b]) + gamma * X0
            acc = acc + _row_bit_flip(Fb, b)
        nf = rb - b0
        if nf:
            st = jnp.asarray([R >> (b + 1) for b in range(b0, rb)],
                             dtype=jnp.int32)[:, None, None]
            mi = jax.lax.broadcasted_iota(jnp.int32, (nf, m, m), 1)
            si = jax.lax.broadcasted_iota(jnp.int32, (nf, m, m), 2)
            Pf = (si == (mi ^ st)).astype(q.dtype)
            Ff = (alpha * (t.Sfr[b0:] * X0[None] + Qr[b0:])
                  + gamma * X0[None]).reshape(nf, R // m, m, C)
            y = jnp.einsum("bms,bgsc->gmc", Pf, Ff,
                           preferred_element_type=q.dtype)
            acc = acc + y.reshape(R, C)
        if cb:
            Qc = Q[rb:].reshape(cb, R, C)
            mc = min(128, C)
            j0 = next((j for j in range(cb) if (C >> (j + 1)) < mc), cb)
            for j in range(j0):
                Fj = alpha * (t.Sfc[j] * X0 + Qc[j]) + gamma * X0
                acc = acc + _col_bit_flip(Fj, j)
            nfc = cb - j0
            if nfc:
                st = jnp.asarray([C >> (j + 1) for j in range(j0, cb)],
                                 dtype=jnp.int32)[:, None, None]
                ci = jax.lax.broadcasted_iota(jnp.int32, (nfc, mc, mc), 1)
                di = jax.lax.broadcasted_iota(jnp.int32, (nfc, mc, mc), 2)
                Pc = (di == (ci ^ st)).astype(q.dtype)
                Fc = (alpha * (t.Sfc[j0:] * X0[None] + Qc[j0:])
                      + gamma * X0[None]).reshape(nfc, R, C // mc, mc)
                y = jnp.einsum("brgc,bcd->rgd", Fc, Pc,
                               preferred_element_type=q.dtype)
                acc = acc + y.reshape(R, C)
    else:
        raise ValueError(f"corr must be matmul|flips|folded, got {corr!r}")

    term_G = (t.St * Q).sum(axis=0)
    sumQ = Q.sum(axis=0)
    return (term_G + w1 * (t.Rv * P0 + sumQ) + w0 * P0 + acc.reshape(-1))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def ksd_quadform_gcorr(q, tables: GcorrTables, num_vars: int,
                       length_scale: float = 1.0, group: int = 7,
                       kron: str = "rows", corr: str = "flips"):
    """qᵀ K_p q via the gcorr-tables matvec; grad reuses the forward matvec
    (K_p symmetric), tables get zero cotangents."""
    y = stein_matvec_gcorr_tables(q, tables, num_vars, length_scale, group,
                                  kron, corr)
    return jnp.dot(q, y)


def _ksd_quadform_gcorr_fwd(q, tables, num_vars, length_scale, group, kron,
                            corr):
    y = stein_matvec_gcorr_tables(q, tables, num_vars, length_scale, group,
                                  kron, corr)
    return jnp.dot(q, y), (y, tables)


def _ksd_quadform_gcorr_bwd(num_vars, length_scale, group, kron, corr, res, g):
    y, tables = res
    return (2.0 * g * y, jax.tree.map(jnp.zeros_like, tables))


ksd_quadform_gcorr.defvjp(_ksd_quadform_gcorr_fwd, _ksd_quadform_gcorr_bwd)


def stein_matvec(q: jnp.ndarray, S: jnp.ndarray, B: jnp.ndarray, num_vars: int,
                 length_scale: float = 1.0, group: int = 7,
                 compute_dtype=None) -> jnp.ndarray:
    """y = K_p @ q without materializing K_p: O(n²·2^n).

    Batches 3n+1 weighted copies of q through the Kronecker base-kernel
    matvec (one fused multi-column pass), then recombines with closed-form
    row-wise weights. See module docstring for the derivation. (The
    production operator path precomputes the n+1-column decomposition's
    tables instead — ``make_gcorr_tables`` — which is ~4x faster at n = 20.
    The distributed shard_map executor uses the same n+1-column gcorr
    decomposition, derived in-place over sharded operands —
    ``parallel/distributed_train.make_distributed_stein_matvec``. This
    self-contained 3n+1 form remains as the reference implementation and
    the oracle the others are tested against.)
    """
    n = num_vars
    if n == 0:
        return jnp.zeros_like(q)
    a = decay_factor(n, length_scale)
    A = np.array([[1.0, a], [a, 1.0]])
    # Layout choice (measured on v5e): the column layout (2^n, 3n+1) wins at
    # small n; the two-sided Kronecker split Y_b = A^{⊗rb} @ X_b @ (A^{⊗cb})ᵀ
    # as TWO whole-batch dots wins in the 13..17 window (0.285 ms vs 0.617 ms
    # grouped and 0.350 ms fused-pallas at n = 16, in-scan); the row layout
    # (3n+1, 2^n) — state extent on the lane axis in every grouped pass —
    # wins from n ≥ 18, where the 2D split's (R + C) FLOP factor blows up
    # (~4x the grouped FLOPs at n = 18; measured slower at n = 20 and 22).
    use_2d = 13 <= n <= 17
    use_rows = n >= 18
    if use_rows or use_2d:
        St, Bt = S.T, B.T
        SBt = St * Bt
        V = jnp.concatenate([q[None, :], Bt * q, St * q, SBt * q], axis=0)
        if use_2d:
            Y = _kron_apply_2d(V, A, n)
        elif compute_dtype is not None:
            Y = kron_matvec_rows(V.astype(compute_dtype), A, n, group=group).astype(V.dtype)
        else:
            Y = kron_matvec_rows(V, A, n, group=group)
        P0, P = Y[0], Y[1 : n + 1]
        Q, T = Y[n + 1 : 2 * n + 1], Y[2 * n + 1 :]
        ax, Sm, Bm, SBm = 0, St, Bt, SBt
    else:
        SB = S * B
        V = jnp.concatenate(
            [q[:, None], B * q[:, None], S * q[:, None], SB * q[:, None]], axis=1
        )  # (2^n, 3n+1)
        Y = kron_matvec(V, A, n, group=group, compute_dtype=compute_dtype)
        P0, P = Y[:, 0], Y[:, 1 : n + 1]
        Q, T = Y[:, n + 1 : 2 * n + 1], Y[:, 2 * n + 1 :]
        ax, Sm, Bm, SBm = 1, S, B, SB

    u = SBm.sum(axis=ax)
    R = Sm.sum(axis=ax)
    h = Bm.sum(axis=ax)
    c1 = 1.0 - 1.0 / a
    c2 = 1.0 - a

    term_G = (Sm * Q).sum(axis=ax)
    y_T1 = u * P0 + (Sm * (1.0 - 2.0 * Bm) * P).sum(axis=ax)
    y_T1t = T.sum(axis=ax) + (Bm * (Q - 2.0 * T)).sum(axis=ax)
    y_Ri = R * P0
    y_Rj = Q.sum(axis=ax)
    y_D = h * P0 + P.sum(axis=ax) - 2.0 * (Bm * P).sum(axis=ax)

    return (
        term_G
        - c1 * (y_T1 + y_T1t)
        - c2 * (y_Ri + y_Rj - y_T1 - y_T1t)
        + 2.0 * n * (1.0 - a) * P0
        - 2.0 * (1.0 / a - a) * y_D
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def ksd_quadform(q, S, B, num_vars: int, length_scale: float = 1.0, group: int = 7,
                 compute_dtype=None):
    """qᵀ K_p q via the matvec path, with a custom VJP.

    K_p is symmetric, so ∂(qᵀKq)/∂q = 2·K_p q — the forward matvec is reused
    as the gradient, halving backward cost. S and B are treated as constants
    (their cotangents are zero): do **not** differentiate through them.
    """
    y = stein_matvec(q, S, B, num_vars, length_scale, group, compute_dtype)
    return jnp.dot(q, y)


def _ksd_quadform_fwd(q, S, B, num_vars, length_scale, group, compute_dtype):
    y = stein_matvec(q, S, B, num_vars, length_scale, group, compute_dtype)
    return jnp.dot(q, y), (y, S, B)


def _ksd_quadform_bwd(num_vars, length_scale, group, compute_dtype, res, g):
    y, S, B = res
    return (2.0 * g * y, jnp.zeros_like(S), jnp.zeros_like(B))


ksd_quadform.defvjp(_ksd_quadform_fwd, _ksd_quadform_bwd)


# ---------------------------------------------------------------- operator


class SteinOperator:
    """Precompiled Stein Gram operator for one (BN, observation, kernel).

    ``dense=True`` (default for n ≤ 12) materializes K_p once and evaluates
    the quadratic form as a matmul; otherwise the Kronecker matvec path is
    used. Both are jit-friendly; ``quadform`` is differentiable w.r.t. q.
    """

    DENSE_MAX_VARS = 12

    def __init__(self, score: np.ndarray, num_vars: int, length_scale: float = 1.0,
                 dtype=jnp.float32, dense: bool | None = None, group: int = 7,
                 compute_dtype=None, use_pallas: bool = False):
        self.num_vars = num_vars
        self.length_scale = float(length_scale)
        self.group = group
        self.compute_dtype = compute_dtype
        self._pallas_quadform = None
        if use_pallas:
            # Fused two-sided Kronecker matvec kernel (native TPU only).
            from .pallas.stein2d import make_pallas_stein2d_quadform

            self._pallas_quadform = make_pallas_stein2d_quadform(num_vars, length_scale)
        self.dense = dense if dense is not None else num_vars <= self.DENSE_MAX_VARS
        # S and B are only consumed by the dense Gram build and the generic
        # 3n+1 matvec fallback; the production gcorr path derives its own
        # tables and never touches them again. Build both lazily — at n = 24
        # each (2^n, n) float32 table is 1.6 GB of HBM that the exact-KSD
        # engine cannot spare. (The score is kept host-side as numpy.)
        self._score_np = np.asarray(score)
        self._S = None
        self._B = None
        self._B_dtype = dtype
        self.gram = (
            stein_gram_dense(self.S, num_vars, length_scale, dtype=dtype)
            if self.dense
            else None
        )
        # n+1-column decomposition tables (the production matvec): built once
        # here because XLA does not hoist their recomputation out of training
        # scans (measured +4.7 ms/epoch at n = 20). Two-sided-dense Kronecker
        # apply through n = 17; grouped rows beyond (FLOP factor). The device
        # score array used for the build is a temporary: it frees once the
        # tables exist unless .S is touched later.
        self.gcorr = (None if self.dense or self._pallas_quadform is not None
                      else make_gcorr_tables(jnp.asarray(score, dtype=dtype),
                                             num_vars, self.length_scale))
        self._gcorr_kron = "2d" if num_vars <= 17 else "rows"
        # Permutation-einsum corrections beat the sublane-flip loop once the
        # per-bit kernels dominate (measured n=20: 2.68 vs 3.48 ms); at small
        # n both are sub-ms and flips stay bit-exact at any precision. From
        # n >= 24 the full-perm einsum's R²·C FLOPs blow up (3.3 TFLOP at 24)
        # and the tile-folded hybrid takes over (see the matvec docstring).
        self._gcorr_corr = ("folded" if num_vars >= 24
                            else "matmul" if num_vars >= 18 else "flips")

    @property
    def S(self) -> jnp.ndarray:
        if self._S is None:
            self._S = jnp.asarray(self._score_np, dtype=self._B_dtype)
        return self._S

    @property
    def B(self) -> jnp.ndarray:
        if self._B is None:
            self._B = jnp.asarray(all_bitstrings(self.num_vars),
                                  dtype=self._B_dtype)
        return self._B

    def matvec(self, q: jnp.ndarray) -> jnp.ndarray:
        if self.dense:
            return self.gram @ q
        if self.gcorr is not None:
            return stein_matvec_gcorr_tables(q, self.gcorr, self.num_vars,
                                             self.length_scale, self.group,
                                             self._gcorr_kron,
                                             self._gcorr_corr)
        return stein_matvec(q, self.S, self.B, self.num_vars, self.length_scale,
                            self.group, self.compute_dtype)

    def quadform(self, q: jnp.ndarray) -> jnp.ndarray:
        """qᵀ K_p q (the squared KSD of the distribution q)."""
        if self.dense:
            return jnp.dot(q, self.gram @ q)
        if self.gcorr is not None:
            return ksd_quadform_gcorr(q, self.gcorr, self.num_vars,
                                      self.length_scale, self.group,
                                      self._gcorr_kron, self._gcorr_corr)
        return ksd_quadform(q, self.S, self.B, self.num_vars, self.length_scale,
                            self.group, self.compute_dtype)

    def ksd_loss(self, q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
        """sqrt(clamp(qᵀ K_p q, eps)) — reference loss at ``ksd_vi.py:133-134``."""
        return jnp.sqrt(jnp.clip(self.quadform(q), eps, None))

    # -- argument-passing variants ------------------------------------------
    # Closing over the concrete S/B/gram arrays inside jit embeds them as HLO
    # constants; at n ≥ 22 that makes the serialized program enormous (the
    # axon remote compiler rejects it outright). These variants take the
    # tables as jit ARGUMENTS instead — use `op.args()` at the call site.

    def args(self):
        """The operator's device tables, to pass through a jit boundary."""
        if self.dense:
            return (self.gram,)
        if self.gcorr is not None:
            return (self.gcorr,)
        return (self.S, self.B)

    def quadform_from(self, q: jnp.ndarray, *tables) -> jnp.ndarray:
        if self.dense:
            (gram,) = tables
            return jnp.dot(q, gram @ q)
        if self.gcorr is not None:
            (gtab,) = tables
            return ksd_quadform_gcorr(q, gtab, self.num_vars,
                                      self.length_scale, self.group,
                                      self._gcorr_kron, self._gcorr_corr)
        S, B = tables
        if self._pallas_quadform is not None:
            return self._pallas_quadform(q, S, B)
        return ksd_quadform(q, S, B, self.num_vars, self.length_scale,
                            self.group, self.compute_dtype)

    def ksd_loss_from(self, q: jnp.ndarray, *tables, eps: float = 1e-12) -> jnp.ndarray:
        return jnp.sqrt(jnp.clip(self.quadform_from(q, *tables), eps, None))

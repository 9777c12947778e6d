"""Fused Pallas Stein matvec — a tested, DOCUMENTED NEGATIVE RESULT at n=20.

``y = K_p @ q`` in ONE kernel launch, replacing the grouped-matmul XLA
pipeline (``ops.stein.stein_matvec_gcorr_tables``) for n ≥ 18 where that
path sits well above its HBM floor (round-2 roofline: 7% MXU).

**Measured outcome (v5e, round 3)**: n=16 0.278 ms (parity with the XLA 2D
path's 0.254), n=20 **7.68 ms vs 3.49 ms** for the production XLA tables
path. The matmul-free design eliminates nearly all HBM traffic
(q + S + y ≈ 92 MB vs ~550 MB), but Mosaic's VPU elementwise/roll
throughput on (1024, 1024) f32 blocks runs ~10x below the
back-of-envelope VPU rate — the same class of in-kernel handicap that
sank the circuit2d_grid kernel on MXU dots (RESULTS.md item 15). The
kernel stays tested (interpret-mode exactness at 1e-15 vs the dense Gram)
as the template if Mosaic's vector throughput improves; the production
``SteinOperator`` path remains the XLA gcorr-tables matvec. Group-size
sweeps of that XLA path are also measured negatives: contraction dims
below 128 pad on the MXU (g=4: 11.7 ms, g=6: 5.8 ms vs g=7's 3.49).

Two ideas (both validated for exactness, neither fast enough on this
Mosaic build):

1. **The Kronecker apply needs no matmuls.** ``K = A^{⊗n}`` with
   ``A = [[1, a], [a, 1]]`` factorizes into n commuting single-bit passes

       X ← X + a · flip_t(X),

   each a circular roll (±stride along the bit's axis) + an iota-bit select
   + one multiply-add — pure VPU work, zero MXU. The grouped XLA path
   spends 2·2^g flops/element/pass on 2^g-wide matmuls to move the same
   information; here it is ~5 VPU ops/element/pass, and — decisively — all
   n passes run back-to-back in VMEM instead of round-tripping 2^n·(n+1)
   floats through HBM per grouped pass. Row-axis (sublane) bits roll on
   axis 0, lane bits on axis 1 of the (R, C) super-block view; the circular
   wrap-around artifacts land only on positions the bit-select discards.

2. **Stream the score table, keep everything else resident.** The grid is
   the n+1 Kronecker columns of the gcorr decomposition (``ops.stein``
   docstrings): step 0 computes P0 = K q into a VMEM scratch; step t
   computes Q_t = K(S_t ∘ q) — the column built in-kernel from the
   resident q and the streamed S_t row — and immediately folds its
   term_G / w1 / flip G-correction contributions into a VMEM accumulator,
   recomputing ``flip_t(·)`` with the same roll trick (so the pre-flipped
   Sf tables of ``GcorrTables`` are not needed at all). HBM traffic:
   q + S + y ≈ (n+2)·2^n floats — within ~2x of the bandwidth floor of any
   method that must read the score table.

Exactness: identical algebra to ``stein_matvec_gcorr_tables``
(tests/test_pallas_stein_fused.py compares against the dense Gram and the
XLA paths; interpret mode covers CPU).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..hamming import decay_factor


def _flip_bit(X, axis_bits: int, t: int, axis: int, interpret: bool):
    """flip of (MSB-first) bit ``t`` of the index along ``axis`` of X.

    The partner index differs only in bit t (stride s = 2^(bits-1-t)):
    positions with bit 0 take the +s neighbor, positions with bit 1 the −s
    neighbor. Rolls are circular, but every wrapped lane is discarded by the
    bit select (a bit-0 position is never within s of the high wrap edge in
    the +s direction, and symmetrically for bit 1).
    """
    s = 1 << (axis_bits - 1 - t)
    size = X.shape[axis]
    roll = jnp.roll if interpret else pltpu.roll
    # pltpu.roll requires non-negative shifts; −s ≡ size−s (circular).
    down = roll(X, size - s, axis=axis)
    up = roll(X, s, axis=axis)
    ids = jax.lax.broadcasted_iota(jnp.int32, X.shape, axis)
    bit = (ids >> (axis_bits - 1 - t)) & 1
    return jnp.where(bit == 0, down, up)


def _kron_apply(X, a, rb: int, cb: int, interpret: bool):
    """(A^{⊗n}) X over the (R, C) super-block view: n single-bit passes."""
    for t in range(rb):
        X = X + a * _flip_bit(X, rb, t, 0, interpret)
    for t in range(cb):
        X = X + a * _flip_bit(X, cb, t, 1, interpret)
    return X


def make_stein_matvec_fused(num_vars: int, length_scale: float = 1.0,
                            rb: int = None, interpret: bool = False,
                            dtype=jnp.float32):
    """Build ``matvec(q2d, S3d) -> y2d``: ``q2d`` (R, C), ``S3d`` (n, R, C)
    (score-table rows in super-block layout), result (R, C) = K_p q.

    Recombination weights (derivation in ``stein_matvec_gcorr_tables``):

        y = Σ_t S_t∘Q_t + w1·(Σ_t S_t∘P0 + Σ_t Q_t) + w0·P0
            + Σ_t [ α·(S_t∘flip_t(P0) + flip_t(Q_t)) + γ·flip_t(P0) ]

    with P0 = K q, Q_t = K(S_t∘q). Every Σ_t folds into the per-step
    accumulator; each step's flip bit is static (one ``pl.when`` per bit).
    """
    n = num_vars
    if n < 2:
        raise ValueError("fused matvec needs n >= 2")
    rb = (n + 1) // 2 if rb is None else rb
    cb = n - rb
    R, C = 1 << rb, 1 << cb

    a = decay_factor(n, length_scale)
    inv = 1.0 / (1.0 - a * a)
    aI = a * inv
    G00 = -a * a * inv
    c1 = 1.0 - 1.0 / a
    c2 = 1.0 - a
    npdt = np.dtype(jnp.dtype(dtype).name)
    af = npdt.type(a)
    alpha = npdt.type(-(c1 - c2) * aI)
    gamma = npdt.type(-2.0 * (1.0 / a - a) * aI)
    w1 = npdt.type(-((c1 - c2) * G00 + c2))
    w0 = npdt.type(2.0 * n * (1.0 - a) - 2.0 * (1.0 / a - a) * G00 * n)

    def kernel(q_ref, s_ref, y_ref, p0_ref, acc_ref, q_scr):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            p0_ref[:] = _kron_apply(q_ref[:], af, rb, cb, interpret)
            acc_ref[:] = jnp.zeros((R, C), dtype=dtype)

        # Steps 1..n handle column b = t−1: the Kronecker apply and the
        # flip-free terms are bit-independent and trace ONCE (the kron apply
        # is the bulk of the kernel; one pl.when per bit would blow the
        # program up O(n²) and with it Mosaic compile time).
        @pl.when(t > 0)
        def _():
            St = s_ref[0]
            Q = _kron_apply(St * q_ref[:], af, rb, cb, interpret)
            q_scr[:] = Q
            acc_ref[:] = (acc_ref[:]
                          + St * Q + w1 * Q + w1 * St * p0_ref[:])

        # Per-bit flip corrections: only the two rolls + select live under
        # the per-bit branch (the flip stride must be static).
        for b in range(n):
            axis = 0 if b < rb else 1
            bits = rb if b < rb else cb
            bb = b if b < rb else b - rb

            @pl.when(t == b + 1)
            def _(axis=axis, bits=bits, bb=bb):
                St = s_ref[0]
                Pf = _flip_bit(p0_ref[:], bits, bb, axis, interpret)
                Qf = _flip_bit(q_scr[:], bits, bb, axis, interpret)
                acc_ref[:] = acc_ref[:] + alpha * (St * Pf + Qf) + gamma * Pf

        @pl.when(t == n)
        def _():
            y_ref[:] = acc_ref[:] + w0 * p0_ref[:]

    @jax.jit
    def matvec(q2d: jnp.ndarray, S3d: jnp.ndarray) -> jnp.ndarray:
        return pl.pallas_call(
            kernel,
            grid=(n + 1,),
            in_specs=[
                pl.BlockSpec((R, C), lambda t: (0, 0)),         # q resident
                pl.BlockSpec((1, R, C), lambda t: (jnp.maximum(t - 1, 0), 0, 0)),
            ],
            out_specs=pl.BlockSpec((R, C), lambda t: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((R, C), dtype),
            scratch_shapes=[pltpu.VMEM((R, C), dtype),
                            pltpu.VMEM((R, C), dtype),
                            pltpu.VMEM((R, C), dtype)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(q2d.astype(dtype), S3d.astype(dtype))

    return matvec

"""Pallas TPU kernel: Stein matvec via the two-sided Kronecker split.

``K = A^{⊗n} = A^{⊗rb} ⊗ A^{⊗cb}``, so applying K to a column ``v`` viewed
as an (R, C) matrix is ``Ar @ V @ Acᵀ`` — two dots on fixed shapes. This
kernel runs that for all 3n+1 Stein columns in one launch (``fori_loop`` over
columns with dynamic row slices — constructs verified to compile on this
Mosaic build), replacing the grouped multi-pass XLA pipeline's HBM round
trips. V build and the closed-form combine stay in XLA (pure elementwise,
fused by XLA); S/B pass through jit boundaries as arguments.

Forward-only: the KSD quadratic form's custom VJP reuses the forward matvec
(K_p symmetric ⇒ grad = 2·K_p q), so this kernel is never differentiated.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import _kernel_precision

from ..hamming import decay_factor
from ..kron import kron_power_np


def make_pallas_stein2d_matvec(num_vars: int, length_scale: float = 1.0,
                               interpret: bool = False):
    """Build ``matvec(q, S, B) -> y = K_p @ q`` with the Kronecker
    application fused into one Pallas kernel."""
    n = num_vars
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    cols = 3 * n + 1
    a = decay_factor(n, length_scale)
    A = np.array([[1.0, a], [a, 1.0]])
    Ar = jnp.asarray(kron_power_np(A, rb).astype(np.float32))
    Ac = jnp.asarray(kron_power_np(A, cb).astype(np.float32))
    c1 = np.float32(1.0 - 1.0 / a)
    c2 = np.float32(1.0 - a)

    def kernel(ar_ref, ac_ref, v_ref, y_ref):
        f32 = jnp.float32

        def body(i, _):
            x = v_ref[pl.ds(i * R, R), :]                      # (R, C)
            # HIGHEST precision: TPU default matmul precision runs f32
            # contractions through bf16 passes (~3e-3 relative error), which
            # is too lossy for KSD gradients near convergence.
            x = jnp.dot(ar_ref[:], x, preferred_element_type=f32,
                        precision=_kernel_precision())
            x = jnp.dot(x, ac_ref[:].T, preferred_element_type=f32,
                        precision=_kernel_precision())
            y_ref[pl.ds(i * R, R), :] = x
            return 0

        jax.lax.fori_loop(0, cols, body, 0)

    def kron_apply_all(V3_flat: jnp.ndarray) -> jnp.ndarray:
        """(cols*R, C) -> (cols*R, C), K applied per column block."""
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((cols * R, C), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(Ar, Ac, V3_flat)

    def matvec(q: jnp.ndarray, S: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
        St, Bt = S.T, B.T
        SBt = St * Bt
        V = jnp.concatenate([q[None, :], Bt * q, St * q, SBt * q], axis=0)
        Y = kron_apply_all(V.reshape(cols * R, C).astype(jnp.float32))
        Y = Y.reshape(cols, 1 << n).astype(q.dtype)
        P0, P = Y[0], Y[1 : n + 1]
        Q, T = Y[n + 1 : 2 * n + 1], Y[2 * n + 1 :]
        u = SBt.sum(axis=0)
        Rv = St.sum(axis=0)
        h = Bt.sum(axis=0)
        term_G = (St * Q).sum(axis=0)
        y_T1 = u * P0 + (St * (1.0 - 2.0 * Bt) * P).sum(axis=0)
        y_T1t = T.sum(axis=0) + (Bt * (Q - 2.0 * T)).sum(axis=0)
        y_Ri = Rv * P0
        y_Rj = Q.sum(axis=0)
        y_D = h * P0 + P.sum(axis=0) - 2.0 * (Bt * P).sum(axis=0)
        return (term_G
                - c1 * (y_T1 + y_T1t)
                - c2 * (y_Ri + y_Rj - y_T1 - y_T1t)
                + 2.0 * n * (1.0 - a) * P0
                - 2.0 * (1.0 / a - a) * y_D)

    return matvec


def make_pallas_stein2d_matvec_grid(num_vars: int, length_scale: float = 1.0,
                                    interpret: bool = False):
    """Grid-tiled variant for large n: one grid step per Stein column, each
    holding only its (R, C) block (plus the two Kronecker factors) in VMEM —
    the whole-V-resident kernel above caps at ~n=17.

    Measured note (v5e, n=20): compiles and is numerically exact, but the
    two-sided split costs ~5x the FLOPs of the grouped XLA path and loses
    (17.1 ms vs 6.8 ms at HIGHEST precision) — kept as the template for
    FLOP-cheaper tilings; production large-n matvec stays on XLA."""
    n = num_vars
    rb = (n + 1) // 2
    cb = n - rb
    R, C = 1 << rb, 1 << cb
    cols = 3 * n + 1
    a = decay_factor(n, length_scale)
    A = np.array([[1.0, a], [a, 1.0]])
    Ar = jnp.asarray(kron_power_np(A, rb).astype(np.float32))
    Ac = jnp.asarray(kron_power_np(A, cb).astype(np.float32))
    c1 = np.float32(1.0 - 1.0 / a)
    c2 = np.float32(1.0 - a)

    def kernel(ar_ref, ac_ref, v_ref, y_ref):
        f32 = jnp.float32
        x = jnp.dot(ar_ref[:], v_ref[:], preferred_element_type=f32,
                    precision=_kernel_precision())
        y_ref[:] = jnp.dot(x, ac_ref[:].T, preferred_element_type=f32,
                           precision=_kernel_precision())

    def kron_apply_all(V3_flat: jnp.ndarray) -> jnp.ndarray:
        return pl.pallas_call(
            kernel,
            grid=(cols,),
            out_shape=jax.ShapeDtypeStruct((cols * R, C), jnp.float32),
            in_specs=[
                pl.BlockSpec((R, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, C), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(Ar, Ac, V3_flat)

    def matvec(q: jnp.ndarray, S: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
        St, Bt = S.T, B.T
        SBt = St * Bt
        V = jnp.concatenate([q[None, :], Bt * q, St * q, SBt * q], axis=0)
        Y = kron_apply_all(V.reshape(cols * R, C).astype(jnp.float32))
        Y = Y.reshape(cols, 1 << n).astype(q.dtype)
        P0, P = Y[0], Y[1 : n + 1]
        Q, T = Y[n + 1 : 2 * n + 1], Y[2 * n + 1 :]
        u = SBt.sum(axis=0)
        Rv = St.sum(axis=0)
        h = Bt.sum(axis=0)
        term_G = (St * Q).sum(axis=0)
        y_T1 = u * P0 + (St * (1.0 - 2.0 * Bt) * P).sum(axis=0)
        y_T1t = T.sum(axis=0) + (Bt * (Q - 2.0 * T)).sum(axis=0)
        y_Ri = Rv * P0
        y_Rj = Q.sum(axis=0)
        y_D = h * P0 + P.sum(axis=0) - 2.0 * (Bt * P).sum(axis=0)
        return (term_G
                - c1 * (y_T1 + y_T1t)
                - c2 * (y_Ri + y_Rj - y_T1 - y_T1t)
                + 2.0 * n * (1.0 - a) * P0
                - 2.0 * (1.0 / a - a) * y_D)

    return matvec


def make_pallas_stein2d_quadform(num_vars: int, length_scale: float = 1.0,
                                 interpret: bool = False):
    """Differentiable ``quadform(q, S, B) = qᵀ K_p q`` reusing the forward
    matvec as the gradient (custom VJP; S/B cotangents are zero)."""
    mv = make_pallas_stein2d_matvec(num_vars, length_scale, interpret)

    @jax.custom_vjp
    def quadform(q, S, B):
        return jnp.dot(q, mv(q, S, B))

    def fwd(q, S, B):
        y = mv(q, S, B)
        return jnp.dot(q, y), (y, S, B)

    def bwd(res, g):
        y, S, B = res
        return (2.0 * g * y, jnp.zeros_like(S), jnp.zeros_like(B))

    quadform.defvjp(fwd, bwd)
    return quadform
